"""Direct unit coverage for the small host-side helpers that were only
exercised transitively (round-3 coverage audit): utilities file/JSON
helpers, the Printer tee, StageTimers, maybe_profile, jaxcache.enable,
conf path helpers, and the grapher's res-file parsing."""

import hashlib
import json
import os

import pytest

from nind_denoise_tpu.eval import grapher
from nind_denoise_tpu.utils import conf, jaxcache, log, utilities


# -- utilities ---------------------------------------------------------------

def test_checksum_matches_hashlib(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"nind" * 1000)
    assert utilities.checksum(str(p)) == hashlib.sha1(b"nind" * 1000).hexdigest()
    assert (utilities.checksum(str(p), "sha256")
            == hashlib.sha256(b"nind" * 1000).hexdigest())
    with pytest.raises(NotImplementedError):
        utilities.checksum(str(p), "not-a-hash")


def test_jsonfpath_load_int_keys_and_default(tmp_path):
    p = tmp_path / "res.json"
    # reference semantics: epoch keys serialize as strings, load back as int
    utilities.dict_to_json({"650": {"ssim": 0.9}, "best": 1}, str(p))
    back = utilities.jsonfpath_load(str(p))
    assert back == {650: {"ssim": 0.9}, "best": 1}
    assert utilities.jsonfpath_load(str(tmp_path / "missing.json")) == {}
    assert utilities.jsonfpath_load(str(tmp_path / "missing.json"),
                                    default=[1]) == [1]


def test_leaf_root_filesize(tmp_path):
    assert utilities.get_leaf("/a/b/c/") == "c"
    assert utilities.get_leaf("/a/b/c.txt") == "c.txt"
    assert utilities.get_root("/a/b/c.txt") == "/a/b"
    p = tmp_path / "f.bin"
    p.write_bytes(b"x" * 123)
    assert utilities.filesize(str(p)) == 123


def test_list_of_tuples_to_csv(tmp_path):
    p = tmp_path / "sub" / "res.csv"  # parent dir auto-created
    utilities.list_of_tuples_to_csv([("a_ISO200.png", 0.9, 1e-4)],
                                    ("filename", "ssim", "mse"), str(p))
    rows = p.read_text().strip().splitlines()
    assert rows[0] == "filename,ssim,mse"
    assert rows[1].startswith("a_ISO200.png,0.9,")


def test_cp_copies(tmp_path):
    src, dst = tmp_path / "a", tmp_path / "b"
    src.write_bytes(b"payload")
    utilities.cp(str(src), str(dst))
    assert dst.read_bytes() == b"payload"


# -- log ---------------------------------------------------------------------

def test_printer_tees_to_file(tmp_path, capsys):
    lp = str(tmp_path / "log")
    pr = log.Printer(file_path=lp)
    pr.print("hello")
    pr.print(42)
    assert capsys.readouterr().out == "hello\n42\n"
    assert open(lp).read() == "hello\n42\n"
    # unwritable log path degrades to a warning, not a raise
    bad = log.Printer(file_path=str(tmp_path / "nodir" / "log"))
    bad.print("x")  # must not raise


def test_stage_timers_accumulate():
    st = log.StageTimers()
    for _ in range(3):
        with st.stage("decode"):
            pass
    with st.stage("encode"):
        pass
    assert st.counts == {"decode": 3, "encode": 1}
    assert set(st.totals) == {"decode", "encode"}
    s = st.summary()
    assert "decode" in s and "/3x" in s


def test_maybe_profile_noop_and_trace(tmp_path):
    with log.maybe_profile(None):  # no-op path
        pass
    td = str(tmp_path / "trace")
    with log.maybe_profile(td):
        import jax
        import jax.numpy as jnp
        jax.jit(lambda a: a * 2)(jnp.ones(8)).block_until_ready()
    # jax.profiler.trace writes a plugins/ or .pb tree under the dir
    assert os.path.isdir(td) and os.listdir(td)


# -- jaxcache ----------------------------------------------------------------

def test_jaxcache_enable_respects_disable_env(tmp_path, monkeypatch):
    monkeypatch.setenv("NIND_JAX_CACHE", "0")
    assert jaxcache.enable(str(tmp_path / "c")) is None

    monkeypatch.delenv("NIND_JAX_CACHE", raising=False)
    d = str(tmp_path / "cache")
    got = jaxcache.enable(d)  # jax already imported: config-API fallback
    assert got == d and os.path.isdir(d)
    import jax
    assert jax.config.jax_compilation_cache_dir == d


def test_jaxcache_default_dir_is_host_keyed(tmp_path, monkeypatch):
    """The DEFAULT cache dir must be keyed by the host CPU fingerprint:
    a cache population outliving a container migration to a different
    machine serves XLA:CPU AOT executables tuned for the old CPU's
    features (which XLA's own cache key does not cover) — observed as a
    SIGILL'd pod worker on 2026-08-18. Explicit dirs stay verbatim (the
    caller owns their hygiene)."""
    monkeypatch.delenv("NIND_JAX_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setattr(jaxcache, "_BASE_DIR", str(tmp_path / "base"))
    got = jaxcache.enable()
    tag = jaxcache._host_tag()
    assert got == os.path.join(str(tmp_path / "base"), tag)
    assert os.path.isdir(got) and tag and tag != "unknown"
    # same-process idempotence: the env var now pins it for children
    assert os.environ["JAX_COMPILATION_CACHE_DIR"] == got
    assert jaxcache.enable() == got


# -- conf path helpers -------------------------------------------------------

def test_conf_path_helpers():
    pkg = conf.package_dir()
    assert os.path.isfile(os.path.join(pkg, "__init__.py"))
    cd = conf.default_configs_dir()
    assert os.path.isdir(cd) and cd.startswith(pkg)
    cc = conf.common_config_fpath()
    assert cc.startswith(cd)


# -- grapher -----------------------------------------------------------------

def test_grapher_parse_and_sort(tmp_path):
    res = tmp_path / "exp1" / "res.csv"
    res.parent.mkdir()
    res.write_text("filename,ssim,mse\n"
                   "img_ISO200.png,0.91,0.001\n"
                   "img_ISO6400.png,0.72,0.01\n"
                   "img_ISOH1.png,0.5,0.1\n"
                   "garbage_row\n"
                   "noiso.png,0.1,0.1\n")
    per_iso = grapher.parse_res_file(str(res))
    assert set(per_iso) == {"ISO200", "ISO6400", "ISOH1"}
    assert per_iso["ISO200"]["ssim"] == [0.91]
    # H-ISOs sort after numeric ISOs (reference graph_utils convention)
    isos = sorted(per_iso, key=grapher.iso_sort_key)
    assert isos == ["ISO200", "ISO6400", "ISOH1"]
    assert grapher.iso_of("x_ISO640-2.png") == "ISO640-2"
    assert grapher.iso_of("nothing.png") is None
    assert grapher.find_res_files(str(tmp_path)) == [str(res)]


def test_grapher_plot_writes_png(tmp_path):
    pytest.importorskip("matplotlib")
    res = tmp_path / "exp1" / "res.csv"
    res.parent.mkdir()
    res.write_text("filename,ssim,mse\nimg_ISO200.png,0.9,0.001\n"
                   "img_ISO800.png,0.8,0.004\n")
    out = str(tmp_path / "g.png")
    grapher.plot([str(tmp_path / "exp1")], metric="ssim", out_fpath=out)
    assert os.path.isfile(out) and os.path.getsize(out) > 0


def test_bench_wait_for_backend_paths(monkeypatch):
    """bench.wait_for_backend (the outage gate in front of the driver's
    scorecard run): retries failing probes on a 60s cadence until one
    succeeds, gives up once the budget is spent, and probes in a
    subprocess (stubbed here) rather than in-process."""
    import importlib.util
    import subprocess
    import time as _time

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    calls = {"n": 0}

    class _R:
        pass

    def probe_succeeds_third(cmd, capture_output=True):
        calls["n"] += 1
        r = _R()
        r.returncode = 0 if calls["n"] >= 3 else 1
        return r

    monkeypatch.setattr(subprocess, "run", probe_succeeds_third)
    monkeypatch.setattr(_time, "sleep", lambda s: None)
    assert bench.wait_for_backend(budget_s=9999) is True
    assert calls["n"] == 3

    def probe_never(cmd, capture_output=True):
        r = _R()
        r.returncode = 1
        return r

    monkeypatch.setattr(subprocess, "run", probe_never)
    assert bench.wait_for_backend(budget_s=0) is False


def test_bench_emits_parseable_scorecard_incrementally(tmp_path):
    """Round-3's driver bench run was timeout-killed before the single
    end-of-run JSON line printed, so BENCH_r03.json recorded NOTHING
    (rc=124, parsed=null). The fix: every mode boundary re-prints the
    cumulative scorecard as a complete JSON line and a budget skips (not
    loses) modes near the deadline. Run the real bench.py with an
    exhausted budget: every stdout line must parse, rows must say why
    they were skipped, and the write-through partial file must exist."""
    import json
    import subprocess
    import sys as _sys

    root = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ, PYTHONPATH=root + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [_sys.executable, os.path.join(root, "bench.py"), "--platform", "cpu",
         "--budget", "0", "--funit", "3"],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) >= 10  # one cumulative line per mode + the final line
    for ln in lines:
        parsed = json.loads(ln)  # every line is a complete scorecard
        assert "metric" in parsed and "scorecard" in parsed
    final = json.loads(lines[-1])
    assert "partial" not in final
    assert len(final["scorecard"]) == 10  # 9 r4 modes + whole_image (r5)
    assert all("skipped" in row["error"] for row in final["scorecard"])
    # non-final lines are marked partial
    assert all(json.loads(ln).get("partial") for ln in lines[:-1])
    partial = json.load(open(os.path.join(root, "BENCH_partial.json")))
    assert partial["scorecard"]


def test_layered_parser_marks_abbreviated_options_explicit(tmp_path):
    """argparse accepts unambiguous long-option abbreviations; the layered
    config must treat those as CLI-explicit too, or a yaml layer silently
    overrides a value the user typed (round-3 review)."""
    import yaml

    from nind_denoise_tpu.utils.conf import LayeredArgumentParser

    cfg = tmp_path / "c.yaml"
    cfg.write_text(yaml.safe_dump({"batch_size": 7}))
    p = LayeredArgumentParser()  # --config/--config2 are built in
    p.add_argument("--batch_size", type=int, default=1)
    ns = p.parse_args(["--batch", "3", "--config", str(cfg)])
    assert ns.batch_size == 3  # CLI abbreviation beats the config layer
    ns2 = p.parse_args(["--config", str(cfg)])
    assert ns2.batch_size == 7  # config still beats the default


def test_bench_baseline_cache_rejects_other_host(tmp_path, monkeypatch):
    """vs_baseline ratios must never be computed against another machine's
    torch-CPU numbers: a migrated container discards the cache and
    re-measures (same hazard class as utils/jaxcache._host_tag)."""
    import json

    import bench

    cache_file = tmp_path / "bench_baseline.json"
    monkeypatch.setattr(bench, "BASELINE_CACHE", str(cache_file))
    bench._save_baseline_cache({"cpu_mps": 1.23})
    assert bench._load_baseline_cache()["cpu_mps"] == 1.23
    blob = json.load(open(cache_file))
    blob["host"] = "someone-elses-cpu"
    json.dump(blob, open(cache_file, "w"))
    assert bench._load_baseline_cache() == {}
