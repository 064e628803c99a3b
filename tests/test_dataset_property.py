"""Property-based invariants for the ISO sorter (hypothesis).

``sort_isos`` reproduces the reference's quirky parser exactly
(/root/reference/src/nind_denoise/dataset_torch_3.py:37-87) and the fixed
cases live in tests/test_train.py. Here hypothesis searches the input space
of canonical NIND directory listings for the structural invariants every
caller relies on: the split is a partition (nothing dropped or invented),
every base ISO carries the minimum value, and noisy ISOs come back sorted
with high-ISO (ISOH*) entries last.
"""

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from nind_denoise_tpu.train.dataset import sort_isos


@st.composite
def iso_listing(draw):
    """Canonical NIND scene listing: distinct ISO<value> dirs, optional
    '-<rep>' duplicates of the lowest value, optional ISOH<value> extras."""
    values = draw(st.lists(st.integers(50, 25600), min_size=1, max_size=8,
                           unique=True))
    names = [f"ISO{v}" for v in values]
    base = min(values)
    ndup = draw(st.integers(0, 2))
    names += [f"ISO{base}-{r + 1}" for r in range(ndup)]
    nh = draw(st.integers(0, 2))
    hvals = draw(st.lists(st.integers(1, 9), min_size=nh, max_size=nh,
                          unique=True))
    names += [f"ISOH{v}" for v in hvals]
    return names, base


@settings(max_examples=120, deadline=None)
@given(iso_listing())
def test_sort_isos_partition_and_order(case):
    names, base = case
    bisos, isos = sort_isos(list(names))
    # partition: every directory appears exactly once across the two halves
    assert sorted(bisos + isos) == sorted(names)
    # every base entry carries the minimum ISO value
    for b in bisos:
        val = b[3:].partition("-")[0]
        assert int(val) == base, (b, base)
    assert bisos, names
    # noisy numeric ISOs ascend; ISOH* high-ISO entries sort last
    numeric = [i for i in isos if not i.startswith("ISOH")]
    vals = [int(i[3:].partition("-")[0]) for i in numeric]
    assert vals == sorted(vals), isos
    ntail = len(isos) - len(numeric)
    assert all(i.startswith("ISOH") for i in isos[len(numeric):]), isos
    assert ntail == sum(1 for n in names if n.startswith("ISOH"))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(
    ["GT", "GTcanon", "noise_a", "noise_b", "x100", "field"]),
    min_size=1, max_size=6, unique=True))
def test_sort_isos_gt_branch_partition(names):
    """Non-ISO listings (whole-image scenes): GT* dirs become the base; a
    listing with no GT promotes the lexicographic first entry."""
    bisos, isos = sort_isos(list(names))
    assert sorted(bisos + isos) == sorted(names)
    gts = [n for n in names if "GT" in n]
    if gts:
        assert sorted(bisos) == sorted(gts)
    else:
        assert bisos == [sorted(names)[0]]
