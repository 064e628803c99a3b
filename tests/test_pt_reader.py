"""Torch-free .pt reader (models/pt_reader.py) vs torch.load.

The oracle is torch itself: state_dicts saved by the installed torch must
read back bit-exactly — across dtypes (fp16/32, bf16, int64, bool),
non-contiguous views, storage offsets, shared storages, scalars, and
Parameters. The restricted unpickler must REJECT anything beyond plain
tensor containers. And the full import chain
(params_io.load_generator on a .pt) must work with torch made
unimportable, since that is the module's whole point
(SURVEY.md §7 hard-part #3).
"""

import io
import pickle
import sys
import zipfile

import numpy as np
import pytest

import jax

from nind_denoise_tpu.models import params_io, torch_import
from nind_denoise_tpu.models.pt_reader import load_pt_state_dict

torch = pytest.importorskip("torch")


def _ref_np(t):
    t = t.detach()
    if t.dtype == torch.bfloat16:
        import ml_dtypes

        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


def test_reader_matches_torch_across_dtypes_and_layouts():
    torch.manual_seed(1)
    base = torch.randn(4, 6)
    sd = {
        "w": torch.randn(2, 3, 3, 3),
        "b": torch.arange(5),
        "nbt": torch.tensor(7, dtype=torch.int64),
        "half": torch.randn(3, 3).half(),
        "bf16": torch.randn(3, 3).bfloat16(),
        "bool": torch.tensor([True, False, True]),
        "noncontig": base.t(),       # transposed view (reversed strides)
        "slice": base[1:3, 2:5],     # storage offset + row stride
        "shared": base,              # shares one storage with the two above
        "scalar": torch.tensor(2.5),
        "param": torch.nn.Parameter(torch.randn(2, 2)),
    }
    buf = io.BytesIO()
    torch.save(sd, buf)
    got = load_pt_state_dict(buf.getvalue())
    assert set(got) == set(sd)
    for k, v in sd.items():
        ref = _ref_np(v)
        np.testing.assert_array_equal(got[k], ref, err_msg=k)
        assert got[k].dtype == ref.dtype, (k, got[k].dtype)
        assert got[k].shape == tuple(v.shape), k


def test_reader_rejects_non_tensor_globals():
    buf = io.BytesIO()
    torch.save({"layer": torch.nn.Linear(2, 2)}, buf)
    with pytest.raises(pickle.UnpicklingError, match="not allowed"):
        load_pt_state_dict(buf.getvalue())


def test_reader_rejects_legacy_nonzip():
    with pytest.raises((ValueError, zipfile.BadZipFile)):
        load_pt_state_dict(b"not a zip archive at all")


def test_load_generator_fully_torch_free(tmp_path, monkeypatch):
    """params_io.load_generator on a reference-layout UtNet .pt with torch
    UNIMPORTABLE: the pt_reader fallback must produce the identical param
    pytree the torch path produces."""
    from test_models_parity import build_torch_utnet

    twin = build_torch_utnet(funit=8)
    fp = str(tmp_path / "generator_650.pt")
    torch.save(twin.state_dict(), fp)

    with_torch, _ = params_io.load_generator(fp, "UtNet")

    # a None sys.modules entry makes `import torch` raise ImportError —
    # exactly the serving-host-without-torch condition
    monkeypatch.setitem(sys.modules, "torch", None)
    without_torch, state = params_io.load_generator(fp, "UtNet")
    assert state is None

    la = jax.tree_util.tree_leaves_with_path(with_torch)
    lb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(without_torch)}
    assert len(la) == len(lb) and la
    for k, v in la:
        np.testing.assert_array_equal(np.asarray(v),
                                      lb[jax.tree_util.keystr(k)])
