"""Property-based XMP history-splitting invariants (hypothesis).

tests/test_pipeline.py pins the reference's K/K/R/K behavior on one
hand-built sidecar; here hypothesis generates arbitrary history stacks
(first-stage ops, second-stage ops, unknown ops, flip, colorin, duplicate
operation names, shuffled darktable:num) and asserts the structural rules
of parse_darktable_history_stack (/root/reference/src/denoise.py:153-220)
hold for all of them:

* s1 keeps exactly the first-stage entries; flip survives but disabled.
* s2 keeps second-stage + unknown entries, drops first-stage-only ones.
* colorin entries in s2 get the config override applied.
* s2 forces iop_order_version=5 and splices colorin next to demosaic.
"""

import pathlib

import pytest
from bs4 import BeautifulSoup
from hypothesis import given, settings
from hypothesis import strategies as st

from nind_denoise_tpu.pipeline import xmp

CFG = xmp.read_config()
FIRST = set(CFG["operations"]["first_stage"])
SECOND = set(CFG["operations"]["second_stage"])
OVERRIDES = CFG["operations"].get("overrides", {})

HEADER = """<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description rdf:about=""
    xmlns:darktable="http://darktable.sf.net/"
    darktable:iop_order_version="3"
    darktable:iop_order_list="rawprepare,0,temperature,0,demosaic,0,colorin,0,exposure,0,colorout,0">
   <darktable:history>
    <rdf:Seq>
{items}
    </rdf:Seq>
   </darktable:history>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>
"""

VOCAB = (sorted(FIRST - {"flip"})[:6] + sorted(SECOND - FIRST)[:6]
         + ["mystery_op", "another_unknown", "flip", "colorin"])


@st.composite
def history(draw):
    names = draw(st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12))
    order = draw(st.permutations(list(range(len(names)))))
    return [(names[i], order[i]) for i in range(len(names))]


def _split(tmp_path, ops):
    items = "\n".join(
        f'     <rdf:li darktable:num="{num}" darktable:operation="{name}" '
        f'darktable:enabled="1" darktable:params="p{num}"/>'
        for name, num in ops)
    sidecar = tmp_path / "img.xmp"
    sidecar.write_text(HEADER.format(items=items))
    xmp.split_history(sidecar, CFG)
    s1 = BeautifulSoup((tmp_path / "img.s1.xmp").read_text(), "xml")
    s2 = BeautifulSoup((tmp_path / "img.s2.xmp").read_text(), "xml")
    return s1, s2


def _entries(soup):
    return [(li["darktable:operation"], li)
            for li in soup.find("darktable:history").find_all("rdf:li")]


@settings(max_examples=30, deadline=None)
@given(history())
def test_split_history_kkrk_rules(tmp_path_factory, ops):
    tmp_path = tmp_path_factory.mktemp("xmp")
    s1, s2 = _split(tmp_path, ops)

    names = [n for n, _ in ops]
    s1_names = [n for n, _ in _entries(s1)]
    s2_names = [n for n, _ in _entries(s2)]

    # stage 1: exactly the first-stage entries (multiset), flip disabled
    assert sorted(s1_names) == sorted(n for n in names if n in FIRST)
    for n, li in _entries(s1):
        if n == "flip":
            assert li["darktable:enabled"] == "0"

    # stage 2: keep second-stage and unknown, drop first-stage-only
    expect_s2 = [n for n in names if n in SECOND or n not in FIRST]
    assert sorted(s2_names) == sorted(expect_s2)

    # overrides applied to matching s2 entries (colorin params blob)
    for n, li in _entries(s2):
        for key, val in OVERRIDES.get(n, {}).items():
            assert li[key] == str(val)

    # iop order rewrite
    desc = s2.find("rdf:Description")
    assert desc["darktable:iop_order_version"] == "5"
    iol = desc["darktable:iop_order_list"]
    assert "demosaic,0,colorin,0" in iol
    assert iol.count("colorin,0") == 1
