"""NIND dataset downloader (Wikimedia Commons).

Equivalent of /root/reference/src/nind_denoise/tools/dl_ds_1.py:1-236. The
reference pins a hardcoded manifest of 133 scenes (date-pinned revisions);
this tool instead queries the Commons category live (``--category``) or
consumes a YAML manifest (``--manifest``: {scene: [filenames]}). Shared
behavior: sha1 verification against the Commons API, bounded retries, error
accumulation with a nonzero exit, and the
``NIND/<scene>/NIND_<scene>_ISO<val>.<ext>`` output layout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.parse
import urllib.request
from typing import Dict, Iterator, List, Optional, Tuple

import yaml

from ..utils import utilities

API = "https://commons.wikimedia.org/w/api.php"
DEFAULT_CATEGORY = "Category:Natural_Image_Noise_Dataset"
MAX_ATTEMPTS = 3


def _api(params: Dict) -> Dict:
    params = dict(params, format="json")
    url = API + "?" + urllib.parse.urlencode(params)
    req = urllib.request.Request(url, headers={"User-Agent": "nind-denoise-tpu/0.1"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read().decode())


def list_category_files(category: str) -> Iterator[str]:
    cont = {}
    while True:
        res = _api({"action": "query", "list": "categorymembers",
                    "cmtitle": category, "cmtype": "file", "cmlimit": "500",
                    **cont})
        for m in res["query"]["categorymembers"]:
            yield m["title"]  # "File:NIND_<scene>_ISO<val>.<ext>"
        if "continue" not in res:
            return
        cont = res["continue"]


def file_info(title: str) -> Tuple[str, str]:
    """-> (download url, sha1)."""
    res = _api({"action": "query", "titles": title, "prop": "imageinfo",
                "iiprop": "url|sha1"})
    page = next(iter(res["query"]["pages"].values()))
    ii = page["imageinfo"][0]
    return ii["url"], ii["sha1"]


def scene_of(filename: str) -> Optional[str]:
    # NIND_<scene>_ISO<val>.<ext>
    stem = filename.rsplit(".", 1)[0]
    parts = stem.split("_")
    if len(parts) < 3 or parts[0] != "NIND":
        return None
    return "_".join(parts[1:-1])


def download_file(url: str, dest: str, sha1: Optional[str]) -> bool:
    for attempt in range(MAX_ATTEMPTS):
        try:
            req = urllib.request.Request(
                url, headers={"User-Agent": "nind-denoise-tpu/0.1"})
            with urllib.request.urlopen(req) as r, open(dest + ".part", "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            if sha1 and utilities.checksum(dest + ".part", "sha1") != sha1:
                print(f"sha1 mismatch for {dest} (attempt {attempt + 1})")
                os.unlink(dest + ".part")
                time.sleep(1)
                continue
            os.replace(dest + ".part", dest)
            return True
        except Exception as e:
            print(f"download failed for {url}: {e} (attempt {attempt + 1})")
            time.sleep(2)
    return False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target_dir", default=os.path.join("..", "..", "datasets", "NIND"))
    p.add_argument("--category", default=DEFAULT_CATEGORY)
    p.add_argument("--manifest", help="YAML {scene: [file titles]} instead of "
                                      "querying the category")
    p.add_argument("--use_wget", action="store_true",
                   help="shell out to wget instead of urllib")
    p.add_argument("--skip_existing", action="store_true", default=True)
    args = p.parse_args(argv)

    if args.manifest:
        with open(args.manifest) as fp:
            manifest = yaml.safe_load(fp)
        titles = [f for files in manifest.values() for f in files]
    else:
        titles = list(list_category_files(args.category))
    print(f"{len(titles)} files to download")

    errors: List[str] = []
    for title in titles:
        fn = title.split(":", 1)[-1].replace(" ", "_")
        scene = scene_of(fn)
        if scene is None:
            print(f"skipping unrecognized name {fn}")
            continue
        dest_dir = os.path.join(args.target_dir, scene)
        os.makedirs(dest_dir, exist_ok=True)
        dest = os.path.join(dest_dir, fn)
        try:
            url, sha1 = file_info(title if title.startswith("File:")
                                  else "File:" + title)
        except Exception as e:
            errors.append(f"{title}: info failed ({e})")
            continue
        if os.path.isfile(dest) and args.skip_existing \
                and utilities.checksum(dest, "sha1") == sha1:
            continue
        if args.use_wget:
            import subprocess

            ok = subprocess.run(["wget", "-q", "-O", dest, url]).returncode == 0
            ok = ok and (not sha1 or utilities.checksum(dest, "sha1") == sha1)
        else:
            ok = download_file(url, dest, sha1)
        if not ok:
            errors.append(f"{title}: download failed")
        else:
            print(f"ok: {dest}")
    if errors:
        print("\n".join(["ERRORS:"] + errors))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
