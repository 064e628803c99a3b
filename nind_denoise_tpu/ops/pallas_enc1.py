"""Fused UtNet encoder-level-1 Mosaic kernel: c0 + c1 + maxpool in VMEM.

Motivation (PERF.md round-3/4 enc1 analyses): the width-folded level-1
convs are individually near their rate limits, but the XLA graph writes
the c0 intermediate and the c1 output (l1f) to HBM and reads them back —
at batch 64 / 504² that is ~12.6 GB of HBM traffic whose only purpose is
crossing op boundaries (c0-out write+read ~8.4 GB, l1f pool re-read
~4.2 GB). This kernel runs the whole level per image in row bands that
stay in VMEM: the only HBM traffic is the xf read, the l1f write (still
a real output — it feeds decoder level 4's skip conv) and the pooled
l2_in write.

Semantics are EXACTLY apply_fast's enc1 block (models/utnet.py):
  t0  = folded_conv3(xf, w0f, b0, h_pad=(0,0)); PReLU; col_mask [1, W+3)
  l1f = folded_conv3(t0, w1f, b1, h_pad=(0,0)); PReLU; col_mask [2, W+2)
  pool = max over the folded 2x2 window; l2_in = pool[:, :, 1:1+W/2, :]
(reference math: networks/UtNet.py:97-101 convs1 + MaxPool2d in
/root/reference/src/nind_denoise; the folded formulation is
ops/fastconv.py's, parity-tested in tests/test_utnet_fast.py).

Mosaic layout discipline (everything 128-lane aligned; learned the hard
way — unaligned DMA minors and minor-dim shape casts are rejected):
* xf enters CHANNEL-PLANAR (B, 6, H+4, wbp_al) with wbp_al a multiple of
  128; each c0 tap is one full-width matmul contracting the size-6
  leading dim, with the W-block shift applied when ACCUMULATING the tap's
  output (a sublane-dim slice), not when slicing its input.
* t0 lives in a (rows, wbp_al, c2) scratch whose pad columns are zero;
  c1 taps are (rows*wbp_al, c2) @ (c2, c2) matmuls, shift-on-accumulate
  again.
* the pooled output leaves in folded-W layout (minor dim c2); the caller
  unfolds with a free XLA reshape.

Grid (B,), one program per image, in-kernel loop over bands of PB pooled
rows with double-buffered DMA (pallas_blur's pattern). PReLU only (the
production activation); callers fall back to the XLA path for other
activations, odd geometry, or under autodiff (no custom VJP — the
trainer keeps the XLA enc1).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 14 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_pb(hp: int, wbp_al: int, c2: int, cin2: int,
             itemsize: int = 2) -> int:
    """Largest band (in pooled rows) dividing hp whose buffers fit VMEM.

    ``itemsize`` = bytes per element of the input dtype: the xf/t0/out
    scratch buffers are allocated in xf.dtype, so a float32 caller has
    double the footprint of the usual bf16 one (ADVICE r4 — the estimate
    must match the allocation or the fits gate lies to Mosaic)."""
    def est(pb):
        lb = 2 * pb
        x = 2 * cin2 * (lb + 8) * wbp_al * itemsize  # planar xf dbl-buffer
        t0 = (lb + 2) * wbp_al * c2 * itemsize       # t0 scratch (xf.dtype)
        acc = (lb + 2) * wbp_al * c2 * 4             # f32 accum transient
        lo = 2 * lb * (wbp_al - 2) * c2 * itemsize   # l1f out dbl-buffer
        po = 2 * pb * (wbp_al - 2) * c2 * itemsize   # row-pair pool out
        return x + t0 + 2 * acc + lo + po
    best = 0
    # pb multiple of 4 => the xf band DMA offset (2*pb*i) and size
    # (2*pb+8) are both multiples of the sublane tiling (8)
    for pb in range(4, hp + 1, 4):
        if hp % pb == 0 and est(pb) <= _VMEM_LIMIT:
            best = pb
    return best


def _enc1_kernel(xf_hbm, w0_ref, w1_ref, b0_ref, b1_ref, a_ref,
                 l1f_hbm, l2_hbm,
                 xs, t0s, lo, po, sem_x, sem_l, sem_p, *,
                 pb: int, n_bands: int, wb: int, c2: int, cin2: int,
                 wbp_al: int):
    bi = pl.program_id(0)
    lb = 2 * pb
    cu = c2 // 2
    a0, a1 = a_ref[0], a_ref[1]

    def act0(v):
        return jnp.where(v >= 0, v, a0 * v)

    def act1(v):
        return jnp.where(v >= 0, v, a1 * v)

    def in_dma(slot, i):
        # fetch lb+8 rows (only lb+4 are used): DMA slices of the tiled
        # row dim must be 8-aligned in offset and size
        return pltpu.make_async_copy(
            xf_hbm.at[bi, :, pl.ds(i * lb, lb + 8), :],
            xs.at[slot], sem_x.at[slot])

    def l1f_dma(slot, i):
        return pltpu.make_async_copy(
            lo.at[slot], l1f_hbm.at[bi, pl.ds(i * lb, lb), :, :],
            sem_l.at[slot])

    def l2_dma(slot, i):
        return pltpu.make_async_copy(
            po.at[slot], l2_hbm.at[bi, pl.ds(i * pb, pb), :, :],
            sem_p.at[slot])

    in_dma(0, 0).start()

    def body(i, _):
        s = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_bands)
        def _():
            in_dma(1 - s, i + 1).start()

        @pl.when(i == 0)
        def _():
            # zero the t0 pad columns once per program: column 0 and
            # [wb+1, wbp_al) are never written by the band bodies
            t0s[:, 0:1, :] = jnp.zeros((lb + 2, 1, c2), t0s.dtype)
            t0s[:, wb + 1:, :] = jnp.zeros((lb + 2, wbp_al - wb - 1, c2),
                                           t0s.dtype)

        @pl.when(i < 2)
        def _():
            # zero the out buffers' pad columns [wb, wo) once per slot:
            # the out arrays are wo-wide (8-aligned DMA) with exact-zero
            # pad columns (they reproduce the SAME-padding zeros the
            # downstream folded conv would see)
            lo[s, :, wb:, :] = jnp.zeros((lb, lo.shape[2] - wb, c2),
                                         lo.dtype)
            po[s, :, wb:, :] = jnp.zeros((pb, po.shape[2] - wb, c2),
                                         po.dtype)

        in_dma(s, i).wait()
        x = xs[s]                                  # (cin2, lb+8, wbp_al)

        # c0: collapse (H-tap, cin) into one K=3*cin2 contraction — K=6
        # matmuls run the MXU at ~5% fill; K=18 is 3x better and leaves
        # only the 3 W-taps as separate dots (their shift must stay on
        # the OUTPUT slice — a lane shift on the input is unsupported)
        x18 = jnp.concatenate(
            [x[:, ah:ah + lb + 2, :] for ah in range(3)], axis=0
        ).reshape(3 * cin2, (lb + 2) * wbp_al)
        acc = jnp.zeros((lb + 2, wb, c2), jnp.float32)
        for db in range(3):
            y = jax.lax.dot_general(
                x18, w0_ref[db],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(lb + 2, wbp_al, c2)
            acc = acc + y[:, db:db + wb, :]
        t0 = act0(acc + b0_ref[0].astype(jnp.float32))  # (lb+2, wb, c2)
        # col_mask [1, W+3): kills column 0 (j=0, v=0 half) and column
        # W+3 (j=wb-1, v=1 half)
        jcol = jax.lax.broadcasted_iota(jnp.int32, (lb + 2, wb, c2), 1)
        ccol = jax.lax.broadcasted_iota(jnp.int32, (lb + 2, wb, c2), 2)
        t0 = jnp.where((jcol == 0) & (ccol < cu), 0.0, t0)
        t0 = jnp.where((jcol == wb - 1) & (ccol >= cu), 0.0, t0)
        t0s[:, 1:wb + 1, :] = t0.astype(t0s.dtype)

        # c1: same shift-on-accumulate, contracting c2
        acc = jnp.zeros((lb, wb, c2), jnp.float32)
        for ah in range(3):
            xa = t0s[ah:ah + lb, :, :].reshape(lb * wbp_al, c2)
            for db in range(3):
                y = jax.lax.dot_general(
                    xa, w1_ref[ah * 3 + db],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(lb, wbp_al, c2)
                acc = acc + y[:, db:db + wb, :]
        l1 = act1(acc + b1_ref[0].astype(jnp.float32))  # (lb, wb, c2)
        # col_mask [2, W+2): kills columns 0,1 (j=0 whole block) and
        # W+2, W+3 (j=wb-1 whole block)
        jcol = jax.lax.broadcasted_iota(jnp.int32, (lb, wb, c2), 1)
        l1 = jnp.where((jcol == 0) | (jcol == wb - 1), 0.0, l1)
        l1b = l1.astype(lo.dtype)

        @pl.when(i >= 2)
        def _():
            l1f_dma(s, i - 2).wait()
            l2_dma(s, i - 2).wait()

        lo[s, :, 0:wb, :] = l1b
        # maxpool, row-pair half: the channel-halves max + column window
        # happen in XLA (a minor-dim refold inside the kernel is an
        # unsupported Mosaic shape cast; the row-pair max alone already
        # removes the full-resolution l1f re-read the XLA pool paid)
        po[s, :, 0:wb, :] = jnp.maximum(l1b.reshape(pb, 2, wb, c2)[:, 0],
                                        l1b.reshape(pb, 2, wb, c2)[:, 1])
        l1f_dma(s, i).start()
        l2_dma(s, i).start()

    jax.lax.fori_loop(0, n_bands, body, None)
    for tail in (n_bands - 2, n_bands - 1):
        if tail >= 0:
            l1f_dma(jax.lax.rem(jnp.int32(tail), 2), tail).wait()
            l2_dma(jax.lax.rem(jnp.int32(tail), 2), tail).wait()


def enc1_fits(h: int, w: int, c2: int = 128, itemsize: int = 2) -> bool:
    """Whether the fused kernel supports this geometry (even dims, an
    integral band split, VMEM budget). ``c2`` = 2*funit; ``itemsize`` =
    bytes/elem of the compute dtype (pass 4 for float32 inputs)."""
    if h % 2 or w % 2:
        return False
    wbp_al = _round_up((w + 4) // 2 + 2, 128)
    return _pick_pb(h // 2, wbp_al, c2, 6, itemsize) >= 4


@functools.partial(jax.jit, static_argnames=("interpret",))
def enc1_pallas(xf: jnp.ndarray, w0f: jnp.ndarray, b0: jnp.ndarray,
                a0: jnp.ndarray, w1f: jnp.ndarray, b1: jnp.ndarray,
                a1: jnp.ndarray, interpret: bool = False
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H+4, wb, 6) folded reflect-padded input -> (l1f, l2_in).

    ``w0f``/``w1f``: folded kernels (3, 3, cin2, c2) from
    fastconv.fold_kernel; ``b0``/``b1``: UNtiled (c2/2,) biases;
    ``a0``/``a1``: PReLU scalars.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    bsz, hp4, wb, cin2 = xf.shape
    h = hp4 - 4
    c2 = w1f.shape[3]
    wbp_al = _round_up(wb + 2, 128)
    pb = _pick_pb(h // 2, wbp_al, c2, cin2, jnp.dtype(xf.dtype).itemsize)
    if pb < 1:
        raise ValueError(f"enc1_pallas: no valid band for H={h}")
    n_bands = (h // 2) // pb

    # channel-planar, W-padded (+1 left for the conv taps, right up to the
    # 128-aligned wbp_al), rows padded +4 for the 8-aligned band over-fetch
    # — the layout whose DMAs Mosaic accepts
    xfp = jnp.pad(jnp.transpose(xf, (0, 3, 1, 2)),
                  ((0, 0), (0, 0), (0, 4), (1, wbp_al - wb - 1)))
    # c0 weights grouped per W-tap with (H-tap, cin) merged as the
    # contraction dim: w0r[db][ah*cin2 + c] = w0f[ah, db, c]
    w0r = jnp.transpose(w0f, (1, 0, 2, 3)).reshape(3, 3 * cin2, c2
                                                   ).astype(xf.dtype)
    w1r = w1f.reshape(9, c2, c2).astype(xf.dtype)
    avec = jnp.stack([jnp.asarray(a0, jnp.float32),
                      jnp.asarray(a1, jnp.float32)])

    def kernel(xh, w0, w1, b0r, b1r, ar, l1o, l2o, xs, t0s, lo, po,
               sx, sl, sp):
        _enc1_kernel(xh, w0, w1, b0r, b1r, ar, l1o, l2o, xs, t0s, lo, po,
                     sx, sl, sp, pb=pb, n_bands=n_bands, wb=wb, c2=c2,
                     cin2=cin2, wbp_al=wbp_al)

    lb = 2 * pb
    wo = _round_up(wb, 8)  # out arrays' second-minor dim must be 8-aligned
    l1f, l2rows = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((bsz, h, wo, c2), xf.dtype),
                   jax.ShapeDtypeStruct((bsz, h // 2, wo, c2), xf.dtype)),
        grid=(bsz,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, cin2, lb + 8, wbp_al), xf.dtype),
            pltpu.VMEM((lb + 2, wbp_al, c2), xf.dtype),
            pltpu.VMEM((2, lb, wo, c2), xf.dtype),
            pltpu.VMEM((2, pb, wo, c2), xf.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xfp, w0r, w1r, jnp.tile(b0, 2)[None, :], jnp.tile(b1, 2)[None, :],
      avec)
    # channel-halves max + l2 column window in XLA (see kernel comment).
    # l1f keeps its zero pad columns [wb, wo): callers feed it to the
    # folded dec4 skip conv, where the zeros reproduce SAME padding
    # exactly and the output slice fuses (models/utnet.apply_fast).
    cu = c2 // 2
    l2 = jnp.maximum(l2rows[..., :cu], l2rows[..., cu:])[:, :, 1:wb - 1, :]
    return l1f, l2
