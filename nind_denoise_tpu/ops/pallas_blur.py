"""Pallas TPU kernel: separable Gaussian blur (the RL-deblur hot op).

The lax path (ops/rl_deblur._blur) runs two tap-unrolled slice-FMA sweeps
per blur; each materializes full-image intermediates in HBM. This kernel
fuses the vertical and horizontal passes in VMEM over row bands: one HBM
read + one write per blur.

Sublane-major layout (round-2 rewrite; the round-1 channel-interleaved lane
rolls compiled pathologically — PERF.md): channels are planar (the image is
(C, H, W) with W on the lane axis), and EVERY shifted access is a static
sublane-offset slice:

* vertical pass: ``x[off+k : off+k+band_h, :]`` slices of the halo'd band;
* horizontal pass: transpose the band in VMEM, slice along the (now
  sublane) W axis, transpose back.

No ``pltpu.roll``, no lane-offset slices, all lane dims 128-aligned.

* Grid over (channel, row band); each program DMAs its band plus a
  sublane-aligned row halo from ANY memory (bands overlap, which BlockSpec
  index maps cannot express), computes, writes its (band_h, W) block.
* The host wrapper pads with edge-replication (neumann, matching gmic/lax
  path), rounds H up to a band multiple and W up to lane multiples.

Falls back to interpret mode off-TPU (tests run it on CPU).

STATUS (measured on the target v5e chip, 6 MP, RL sigma=1 x10 iterations):
``rl_deblur_pallas_fused`` — one pallas_call per RL iteration, double-
buffered band DMA in/out, both blurs + ratio + multiply fused in VMEM,
the EXT-LAYOUT carry (round 3: the kernel reads AND writes the padded
layout with in-kernel edge replication, so the RL loop has zero XLA
pad/slice glue between iterations), and the round-5 launch/aliasing
rewrite (``_rl_iter_kernel2``): ONE program per image loops all
C x n_bands bands in-kernel and the output ALIASES the input (fully
in-place iteration). The r4 version paid a measured **9.6 ms of fixed
per-call cost** (program launches + per-iteration 78 MB output
allocation) on a 6.3 ms compute loop; v2 removes essentially all of it —
on-chip A/B 2026-08-20: **t(10 iters) 5.7-6.5 ms (917-1057 MP/s) vs
11.9-14.2 ms (422-504 MP/s) for v1, bit-identical output checksums**,
slope unchanged at ~0.6 ms/iter. ``NIND_RL_V1=1`` selects the old kernel
for A/Bs. Remaining gap to the ~0.26 ms/iter HBM floor (3 image
transfers/iter) is the 6 in-kernel VPU transposes per band; a
lane-roll horizontal pass probed 2.5x faster than the transpose pattern
on a toy band (r5) but replaces 6 transposes with ~28 rolls once edge
fixes and ext reassembly are counted — marginal on paper, untried in
the full kernel. ``rl_deblur(impl='auto')`` (the product default)
selects the fused kernel on TPU; first compile through the remote
service is slow but the persistent cache (utils/jaxcache.py) makes it
one-time.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _radius(sigma: float) -> int:
    from .rl_deblur import psf_radius

    return psf_radius(sigma)


def _taps(sigma: float) -> Tuple[float, ...]:
    """Static tap tuple of the ONE canonical PSF (rl_deblur.gaussian_taps_np)
    — the lax and pallas paths must blur with bit-identical kernels or
    impl='auto' would change pixels with image width/backend."""
    from .rl_deblur import gaussian_taps_np

    return tuple(float(t) for t in gaussian_taps_np(sigma))


# The fused kernel's VMEM use (double-buffered u/d/out scratch + Mosaic's
# own temporaries) scales with image WIDTH; the fixed round-2 band_h=120
# blew the 16 MB scoped-VMEM limit around w ~ 5000 px (full-res photos).
# Model calibrated on the v5e chip: at w=6000 / band_h=72 the compiler
# reported 16.04 MB total against 11.55 MB of scratch, i.e. temporaries
# ~ 2.13 x one (band_h + 2r, w_in) fp32 band buffer; budgeted at 2.5x with
# the total capped at 15 MB of the 16 MB limit. (The w=3000 bench shape
# keeps its round-2 band_h=120 under this model — no perf change there.)
_VMEM_LIMIT = 15 * 1024 * 1024
_TEMP_FACTOR = 2.5


def _fused_scratch_bytes(bh: int, r: int, w: int) -> int:
    halo2 = _round_up(2 * r, 8)
    w_in = _round_up(w, 128) + 128
    # double-buffered u/d in + out bands (all w_in wide since round 3's
    # ext-layout output) + the two single-shot halo-replicate buffers
    return (2 * ((bh + 2 * halo2) * w_in * 2 + bh * w_in)
            + 2 * halo2 * w_in) * 4


def _fused_vmem_estimate(bh: int, r: int, w: int) -> int:
    w_in = _round_up(w, 128) + 128
    temps = int(_TEMP_FACTOR * (bh + 2 * r) * w_in * 4)
    return _fused_scratch_bytes(bh, r, w) + temps


def _fused_band_h(w: int, r: int) -> int:
    """Largest band_h (multiple of 8, est_rows <= 128) whose fused-RL VMEM
    estimate fits ``_VMEM_LIMIT`` at image width ``w``. Returns 0 when no
    valid band exists (caller must fall back to the XLA path). band_h >= r
    is required so the in-kernel edge-replicate fixes only ever span the
    first/last two bands (their replicate sources are static slices)."""
    # horizontal slack: the two chained in-kernel blurs slice vt[k:k+est_cols]
    # with est_cols = w_out + 2r and k up to 2r, so w_in = w_out + 128 must
    # cover w_out + 4r — above r = 32 (sigma ~ 10.7) the kernel cannot be
    # built at ANY band height (pads go negative); the caller falls back
    if 4 * r > 128:
        return 0
    best = 0
    bh = 8
    while bh + 2 * r <= 128:
        if _fused_vmem_estimate(bh, r, w) > _VMEM_LIMIT:
            break
        best = bh
        bh += 8
    return best if best >= r else 0


def fused_fits(w: int, sigma: float = 1.0) -> bool:
    """Whether ``rl_deblur_pallas_fused`` can compile for width ``w`` within
    the VMEM budget. ``rl_deblur(impl='auto')`` gates on this so very wide
    images (> ~20k px at sigma=1) silently take the XLA path instead of
    failing to compile."""
    return _fused_band_h(w, _radius(sigma)) > 0


def _blur_band(scratch, taps: Tuple[float, ...], band_h: int, halo: int,
               w_out: int):
    """Separable blur of one halo'd VMEM band -> (band_h, w_out)."""
    x = scratch[:]                       # (band_h + 2*halo, Win)
    r = (len(taps) - 1) // 2
    # vertical: static sublane-offset slices of the halo'd band
    off = halo - r
    v = taps[0] * x[off:off + band_h, :]
    for k in range(1, len(taps)):
        v = v + taps[k] * x[off + k:off + k + band_h, :]
    # horizontal: transpose so the W axis is sublanes, slice, transpose back
    vt = v.T                             # (Win, band_h)
    o = taps[0] * vt[0:w_out, :]
    for k in range(1, len(taps)):
        o = o + taps[k] * vt[k:k + w_out, :]
    return o.T                           # (band_h, w_out)


def _start_dma(x_hbm, scratch, sem, band_h, halo):
    c = pl.program_id(0)
    i = pl.program_id(1)
    return pltpu.make_async_copy(
        x_hbm.at[c, pl.ds(i * band_h, band_h + 2 * halo), :], scratch, sem)


def _kernel(x_hbm, o_ref, scratch, sem, *, taps: Tuple[float, ...],
            band_h: int, halo: int, w_out: int):
    """Plain blur. x_hbm: (C, Hb + 2*halo, Win) in ANY; o_ref:
    (1, band_h, w_out) VMEM. Win = w_out + 128 so horizontal slices stay in
    range."""
    dma = _start_dma(x_hbm, scratch, sem, band_h, halo)
    dma.start()
    dma.wait()
    o_ref[0, :, :] = _blur_band(scratch, taps, band_h, halo, w_out)




@functools.partial(jax.jit, static_argnames=("sigma", "band_h", "interpret"))
def _gauss_blur_planar(img_chw: jnp.ndarray, sigma: float = 1.0,
                       band_h: int = 128, interpret: bool = False) -> jnp.ndarray:
    """(C, H, W) float32 -> same shape, Gaussian-blurred, edge-replicate
    boundary. Kernel radius = ceil(3*sigma) (matches ops/rl_deblur)."""
    c, h, w = img_chw.shape
    # Mosaic kernels only compile for TPU; run interpreted elsewhere so the
    # impl='pallas' path stays usable on CPU (tests, dev boxes).
    interpret = interpret or jax.default_backend() != "tpu"
    taps = _taps(sigma)
    r = (len(taps) - 1) // 2
    if 2 * r > 128:
        # the horizontal pass slices vt[k:k+w_out] with k up to 2r inside a
        # w_in = w_out + 128 buffer; beyond r = 64 (sigma ~ 21.4) the pads
        # go negative before any band-height shrink can help
        raise ValueError(
            f"gauss_blur_pallas: kernel radius {r} (sigma={sigma}) exceeds "
            f"the 128-lane horizontal slack; use the lax path "
            f"(ops/rl_deblur._blur)")
    halo = _round_up(r, 8)               # row halo on the sublane tiling
    w_out = _round_up(w, 128)
    w_in = w_out + 128                   # room for the 2r horizontal slack
    # shrink the band if the width-proportional scratch would blow VMEM
    est = lambda bh: ((bh + 2 * halo) * w_in + bh * w_out
                      + 3 * bh * w_in) * 4
    while band_h > 8 and est(band_h) > _VMEM_LIMIT:
        band_h = max(8, band_h // 2 // 8 * 8)
    if est(band_h) > _VMEM_LIMIT:
        raise ValueError(
            f"gauss_blur_pallas: width {w} exceeds the VMEM budget even at "
            f"the minimum band height; use the lax path (ops/rl_deblur._blur)")
    hb = _round_up(h, band_h)

    x = jnp.pad(img_chw.astype(jnp.float32),
                ((0, 0), (halo, halo + hb - h), (r, r)), mode="edge")
    x = jnp.pad(x, ((0, 0), (0, 0), (0, w_in - (w + 2 * r))))

    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, band_h=band_h, halo=halo,
                          w_out=w_out),
        out_shape=jax.ShapeDtypeStruct((c, hb, w_out), jnp.float32),
        grid=(c, hb // band_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, band_h, w_out), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band_h + 2 * halo, w_in), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    return out[:, :h, :w]


def _rl_iter_kernel(u_hbm, d_hbm, o_hbm, su, sd, so, st, sb,
                    sem_u, sem_d, sem_o, sem_t, sem_b, *,
                    taps: Tuple[float, ...], band_h: int, halo2: int,
                    h: int, w: int, w_out: int, n_bands: int):
    """One full RL iteration for one channel: u <- u * blur(d / blur(u)).

    Grid is (C,); each program loops its channel's row bands with
    double-buffered input and output DMAs, so per-program overhead is paid
    3x per iteration instead of 3 x n_bands x 2 (the blur-per-call layout).
    All shifted accesses are static sublane slices; the horizontal passes
    transpose in VMEM (sublane-major discipline of the band blur above).

    Round-3 ext-layout output: the kernel READS u in the padded ext layout
    (rows/cols edge-replicated, lanes rounded to w_in) and also WRITES its
    output in that same layout — main bands carry the left/right column
    replicas in-row, the tail band re-replicates rows past h-1, and two
    single-shot DMAs fill the top/bottom row halos. The RL loop therefore
    carries the ext array across iterations with NO XLA pad/slice between
    kernel calls, saving ~2 full-image HBM transfers per iteration that the
    round-2 layout spent re-padding in XLA.

    Exactness at the borders: the lax path (ops/rl_deblur._blur) edge-
    replicates the *intermediate* ratio, which differs from blurring a
    replicated input. The kernel therefore recomputes the replicate fix on
    the ratio itself: column fixes in transposed layout (cols = sublanes),
    row fixes in normal layout (rows = sublanes), with the bottom source
    row dynamically sliced at image row h-1.
    """
    c = pl.program_id(0)
    r = (len(taps) - 1) // 2
    est_rows = band_h + 2 * r
    est_cols = w_out + 2 * r
    eps = 1e-8

    def in_dma(buf, hbm, sem, slot, i):
        return pltpu.make_async_copy(
            hbm.at[c, pl.ds(i * band_h, band_h + 2 * halo2), :],
            buf.at[slot], sem.at[slot])

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            so.at[slot], o_hbm.at[c, pl.ds(halo2 + i * band_h, band_h), :],
            sem_o.at[slot])

    in_dma(su, u_hbm, sem_u, 0, 0).start()
    in_dma(sd, d_hbm, sem_d, 0, 0).start()

    def body(i, _):
        s = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_bands)
        def _():
            in_dma(su, u_hbm, sem_u, 1 - s, i + 1).start()
            in_dma(sd, d_hbm, sem_d, 1 - s, i + 1).start()

        in_dma(su, u_hbm, sem_u, s, i).wait()
        in_dma(sd, d_hbm, sem_d, s, i).wait()

        su_s, sd_s = su[s], sd[s]
        # est = blur(u) over the band + r halo rows / cols
        off = halo2 - 2 * r
        v = taps[0] * su_s[off:off + est_rows, :]
        for k in range(1, len(taps)):
            v = v + taps[k] * su_s[off + k:off + k + est_rows, :]
        vt = v.T                                     # (w_in, est_rows)
        est_t = taps[0] * vt[0:est_cols, :]
        for k in range(1, len(taps)):
            est_t = est_t + taps[k] * vt[k:k + est_cols, :]
        d_t = sd_s[halo2 - r:halo2 - r + est_rows, :].T[r:r + est_cols, :]
        ratio_t = d_t / jnp.maximum(est_t, eps)      # (est_cols, est_rows)
        # column replicate fix (cols are sublanes here): abs col = m - r
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (est_cols, est_rows), 0)
        ratio_t = jnp.where(iota_m < r, ratio_t[r:r + 1, :], ratio_t)
        ratio_t = jnp.where(iota_m >= w + r, ratio_t[w + r - 1:w + r, :],
                            ratio_t)
        ratio = ratio_t.T                            # (est_rows, est_cols)
        # row replicate fix (rows are sublanes here): abs row = i*band_h-r+e
        e0 = i * band_h - r
        iota_e = jax.lax.broadcasted_iota(jnp.int32, (est_rows, est_cols), 0)
        # TOP: abs row 0 sits at slot r (band 0 only: _fused_band_h
        # guarantees band_h >= r, so e0 = i*band_h - r >= 0 for every
        # later band and the (abs < 0) mask cannot fire there).
        ratio = jnp.where(iota_e + e0 < 0, ratio[r:r + 1, :], ratio)
        # BOTTOM: abs row h-1 sits at slot h-1 - (i*band_h - r) =
        # e_src + (n_bands-1-i)*band_h. The mask (abs > h-1) fires in the
        # LAST band and — when the tail band holds fewer than r real rows
        # (h mod band_h in [1, r-1]) — also in the SECOND-TO-LAST band,
        # where the source sits band_h rows lower in the frame. A single
        # last-band slice replicated from ~band_h rows too high there
        # (caught by review r3; h=361/362 vs the lax path).
        e_src = h - 1 - (n_bands - 1) * band_h + r
        bot_last = ratio[e_src:e_src + 1, :]
        b1 = e_src + band_h
        bot_prev = ratio[b1:b1 + 1, :] if b1 < est_rows else bot_last
        bot_src = jnp.where(i == n_bands - 1, bot_last, bot_prev)
        ratio = jnp.where(iota_e + e0 > h - 1, bot_src, ratio)
        # corr = blur(ratio)
        cv = taps[0] * ratio[0:band_h, :]
        for k in range(1, len(taps)):
            cv = cv + taps[k] * ratio[k:k + band_h, :]
        cvt = cv.T                                   # (est_cols, band_h)
        corr_t = taps[0] * cvt[0:w_out, :]
        for k in range(1, len(taps)):
            corr_t = corr_t + taps[k] * cvt[k:k + w_out, :]
        u_t = su_s[halo2:halo2 + band_h, :].T[2 * r:2 * r + w_out, :]
        newu_t = u_t * corr_t                        # (w_out, band_h); row j = abs col j
        # --- ext-layout reassembly, transposed (cols = sublanes) ---
        # garbage cols >= w -> replicate col w-1, then prepend/append the
        # 2r-left / (128-2r)-right replicate runs so the block is w_in wide
        # and the next iteration can read it with NO XLA re-pad.
        w_in = w_out + 128
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (w_out, band_h), 0)
        newu_t = jnp.where(iota_c >= w, newu_t[w - 1:w, :], newu_t)
        left = jnp.broadcast_to(newu_t[0:1, :], (2 * r, band_h))
        right = jnp.broadcast_to(newu_t[w - 1:w, :], (128 - 2 * r, band_h))
        blk = jnp.concatenate([left, newu_t, right], axis=0).T  # (band_h, w_in)
        # tail-band rows past h-1 -> replicate of abs row h-1. The mask can
        # only fire in the LAST band (i*band_h + band_h - 1 > h-1 implies
        # i == n_bands-1 since hb = ceil(h/band_h)*band_h), so the static
        # last-band source slot is safe for every band.
        src_last = h - 1 - (n_bands - 1) * band_h
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (band_h, w_in), 0)
        blk = jnp.where(iota_b + i * band_h > h - 1,
                        blk[src_last:src_last + 1, :], blk)

        @pl.when(i >= 2)
        def _():
            out_dma(s, i - 2).wait()                 # slot free to rewrite

        so[s] = blk                                  # (band_h, w_in)
        out_dma(s, i).start()

        # single-shot row-halo replicates (ext rows [0, halo2) and
        # [halo2 + hb, hb + 2*halo2)); exactly one start each per program,
        # matched by the unconditional waits after the loop
        @pl.when(i == 0)
        def _():
            st[:] = jnp.broadcast_to(blk[0:1, :], (halo2, w_in))
            pltpu.make_async_copy(
                st, o_hbm.at[c, pl.ds(0, halo2), :], sem_t).start()

        @pl.when(i == n_bands - 1)
        def _():
            sb[:] = jnp.broadcast_to(blk[src_last:src_last + 1, :],
                                     (halo2, w_in))
            pltpu.make_async_copy(
                sb, o_hbm.at[c, pl.ds(halo2 + n_bands * band_h, halo2), :],
                sem_b).start()

    jax.lax.fori_loop(0, n_bands, body, None)
    for tail in (n_bands - 2, n_bands - 1):
        if tail >= 0:
            out_dma(jax.lax.rem(jnp.int32(tail), 2), tail).wait()
    pltpu.make_async_copy(st, o_hbm.at[c, pl.ds(0, halo2), :], sem_t).wait()
    pltpu.make_async_copy(
        sb, o_hbm.at[c, pl.ds(halo2 + n_bands * band_h, halo2), :],
        sem_b).wait()


def _rl_iter_kernel2(u_hbm, d_hbm, o_hbm, su, sd, so, st, sb,
                     sem_u, sem_d, sem_o, sem_t, sem_b, *,
                     taps: Tuple[float, ...], band_h: int, halo2: int,
                     h: int, w: int, w_out: int, n_bands: int, c: int):
    """Round-5 launch-overhead rewrite of ``_rl_iter_kernel`` (identical
    band math — see its docstring for the blur/ratio/replicate semantics,
    which are copied verbatim):

    * ONE program per batch image loops ALL ``c * n_bands`` bands
      in-kernel (grid (N,) instead of (N*C,)): the r4 kernel paid ~3
      program launches per iteration; a 10-iteration call carried ~6.8 ms
      of launch overhead on a 6.3 ms compute loop (PERF.md r5
      decomposition).
    * The output ALIASES the input (in-place ext carry;
      ``input_output_aliases`` in the wrapper): the XLA loop body stops
      allocating a fresh 78 MB ext array per iteration. Correctness under
      aliasing needs one DMA-order guarantee: band i's output overlaps
      band i+1's input rows by ``2*halo2`` ext rows, so band i's out-DMA
      must not START until band i+1's in-DMA has COMPLETED. The loop
      below restructures the double buffering for exactly that: body i
      waits in(i), THEN starts out(i-1) (whose only conflict is in(i)),
      then prefetches in(i+1) (conflict-free vs out(i-1)), computes, and
      HOLDS its own out until body i+1. The per-channel halo writes are
      synchronous (μs-scale DMAs) and sit after the conflicting in-waits
      by the same argument.
    """
    pid = pl.program_id(0)
    r = (len(taps) - 1) // 2
    est_rows = band_h + 2 * r
    est_cols = w_out + 2 * r
    eps = 1e-8
    total = c * n_bands

    def in_dma(buf, hbm, sem, slot, t):
        ci = t // n_bands
        bi = t - ci * n_bands
        return pltpu.make_async_copy(
            hbm.at[pid * c + ci,
                   pl.ds(bi * band_h, band_h + 2 * halo2), :],
            buf.at[slot], sem.at[slot])

    def out_dma(slot, t):
        ci = t // n_bands
        bi = t - ci * n_bands
        return pltpu.make_async_copy(
            so.at[slot],
            o_hbm.at[pid * c + ci, pl.ds(halo2 + bi * band_h, band_h), :],
            sem_o.at[slot])

    in_dma(su, u_hbm, sem_u, 0, 0).start()
    in_dma(sd, d_hbm, sem_d, 0, 0).start()

    def body(t, _):
        s = jax.lax.rem(t, 2)
        i = jax.lax.rem(t, n_bands)  # band index within this channel

        in_dma(su, u_hbm, sem_u, s, t).wait()
        in_dma(sd, d_hbm, sem_d, s, t).wait()

        @pl.when(t >= 1)
        def _():
            out_dma(1 - s, t - 1).start()  # after in(t).wait: alias-safe

        @pl.when(t >= 2)
        def _():
            out_dma(s, t - 2).wait()       # slot s free to rewrite

        @pl.when(t + 1 < total)
        def _():
            in_dma(su, u_hbm, sem_u, 1 - s, t + 1).start()
            in_dma(sd, d_hbm, sem_d, 1 - s, t + 1).start()

        su_s, sd_s = su[s], sd[s]
        off = halo2 - 2 * r
        v = taps[0] * su_s[off:off + est_rows, :]
        for k in range(1, len(taps)):
            v = v + taps[k] * su_s[off + k:off + k + est_rows, :]
        vt = v.T
        est_t = taps[0] * vt[0:est_cols, :]
        for k in range(1, len(taps)):
            est_t = est_t + taps[k] * vt[k:k + est_cols, :]
        d_t = sd_s[halo2 - r:halo2 - r + est_rows, :].T[r:r + est_cols, :]
        ratio_t = d_t / jnp.maximum(est_t, eps)
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (est_cols, est_rows), 0)
        ratio_t = jnp.where(iota_m < r, ratio_t[r:r + 1, :], ratio_t)
        ratio_t = jnp.where(iota_m >= w + r, ratio_t[w + r - 1:w + r, :],
                            ratio_t)
        ratio = ratio_t.T
        e0 = i * band_h - r
        iota_e = jax.lax.broadcasted_iota(jnp.int32, (est_rows, est_cols), 0)
        ratio = jnp.where(iota_e + e0 < 0, ratio[r:r + 1, :], ratio)
        e_src = h - 1 - (n_bands - 1) * band_h + r
        bot_last = ratio[e_src:e_src + 1, :]
        b1 = e_src + band_h
        bot_prev = ratio[b1:b1 + 1, :] if b1 < est_rows else bot_last
        bot_src = jnp.where(i == n_bands - 1, bot_last, bot_prev)
        ratio = jnp.where(iota_e + e0 > h - 1, bot_src, ratio)
        cv = taps[0] * ratio[0:band_h, :]
        for k in range(1, len(taps)):
            cv = cv + taps[k] * ratio[k:k + band_h, :]
        cvt = cv.T
        corr_t = taps[0] * cvt[0:w_out, :]
        for k in range(1, len(taps)):
            corr_t = corr_t + taps[k] * cvt[k:k + w_out, :]
        u_t = su_s[halo2:halo2 + band_h, :].T[2 * r:2 * r + w_out, :]
        newu_t = u_t * corr_t
        w_in = w_out + 128
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (w_out, band_h), 0)
        newu_t = jnp.where(iota_c >= w, newu_t[w - 1:w, :], newu_t)
        left = jnp.broadcast_to(newu_t[0:1, :], (2 * r, band_h))
        right = jnp.broadcast_to(newu_t[w - 1:w, :], (128 - 2 * r, band_h))
        blk = jnp.concatenate([left, newu_t, right], axis=0).T
        src_last = h - 1 - (n_bands - 1) * band_h
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (band_h, w_in), 0)
        blk = jnp.where(iota_b + i * band_h > h - 1,
                        blk[src_last:src_last + 1, :], blk)

        so[s] = blk

        # per-channel halo rows, synchronous (both sit after this body's
        # in-waits, whose regions cover every row they write)
        @pl.when(i == 0)
        def _():
            ci = t // n_bands
            st[:] = jnp.broadcast_to(blk[0:1, :], (halo2, w_in))
            cp = pltpu.make_async_copy(
                st, o_hbm.at[pid * c + ci, pl.ds(0, halo2), :], sem_t)
            cp.start()
            cp.wait()

        @pl.when(i == n_bands - 1)
        def _():
            ci = t // n_bands
            sb[:] = jnp.broadcast_to(blk[src_last:src_last + 1, :],
                                     (halo2, w_in))
            cp = pltpu.make_async_copy(
                sb, o_hbm.at[pid * c + ci,
                             pl.ds(halo2 + n_bands * band_h, halo2), :],
                sem_b)
            cp.start()
            cp.wait()

    jax.lax.fori_loop(0, total, body, None)
    # drain: out(total-2) was started in body total-1 but never waited;
    # out(total-1) is still held (its start belongs to "body total")
    if total >= 2:
        out_dma(total % 2, total - 2).wait()
    last = out_dma((total - 1) % 2, total - 1)
    last.start()
    last.wait()


@functools.partial(jax.jit,
                   static_argnames=("sigma", "iterations", "interpret"))
def rl_deblur_pallas_fused(img_hwc: jnp.ndarray, sigma: float = 1.0,
                           iterations: int = 10,
                           interpret: bool = False) -> jnp.ndarray:
    """Richardson-Lucy with a fused per-iteration kernel: one pallas_call
    per iteration (grid = planes), both blurs + ratio + multiply in VMEM,
    double-buffered band DMA. Semantics of ops/rl_deblur.rl_deblur (dt=1,
    edge-replicate boundary, eps=1e-8); parity asserted in
    tests/test_pallas_blur.py.

    Accepts (H, W, C) or batched (N, H, W, C): every plane is an
    independent grid cell running the identical per-image program, so a
    batch member's result is BIT-IDENTICAL to its single-image run — the
    property serve's coalesced group post relies on (round 4). A batch
    pays ONE pallas dispatch per iteration for the whole group instead of
    N."""
    squeeze = img_hwc.ndim == 3
    x4 = img_hwc[None] if squeeze else img_hwc
    n, hh, ww, c = x4.shape
    interpret = interpret or jax.default_backend() != "tpu"
    taps = _taps(sigma)
    r = (len(taps) - 1) // 2
    # band_h adapts to width so the scratch + temporaries stay inside the
    # VMEM budget (ADVICE r2: a fixed band blew VMEM at w ~ 5-6k px)
    band_h = _fused_band_h(ww, r)
    if band_h == 0:
        raise ValueError(
            f"rl_deblur_pallas_fused: width {ww} exceeds the VMEM budget even "
            f"at the minimum band height; use rl_deblur(impl='xla')")
    halo2 = _round_up(2 * r, 8)
    hb = _round_up(hh, band_h)
    w_out = _round_up(ww, 128)
    w_in = w_out + 128
    n_bands = hb // band_h

    d0 = jnp.maximum(
        jnp.transpose(x4, (0, 3, 1, 2)).reshape(n * c, hh, ww
                                                ).astype(jnp.float32), 0.0)

    def pad_ext(x):
        x = jnp.pad(x, ((0, 0), (halo2, halo2 + hb - hh), (2 * r, 2 * r)),
                    mode="edge")
        return jnp.pad(x, ((0, 0), (0, 0), (0, w_in - (ww + 4 * r))))

    d_ext = pad_ext(d0)
    scratch = [
        pltpu.VMEM((2, band_h + 2 * halo2, w_in), jnp.float32),
        pltpu.VMEM((2, band_h + 2 * halo2, w_in), jnp.float32),
        pltpu.VMEM((2, band_h, w_in), jnp.float32),
        pltpu.VMEM((halo2, w_in), jnp.float32),
        pltpu.VMEM((halo2, w_in), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if os.environ.get("NIND_RL_V1"):  # r4 kernel, kept for A/B
        step = pl.pallas_call(
            functools.partial(_rl_iter_kernel, taps=taps, band_h=band_h,
                              halo2=halo2, h=hh, w=ww, w_out=w_out,
                              n_bands=n_bands),
            out_shape=jax.ShapeDtypeStruct((n * c, hb + 2 * halo2, w_in),
                                           jnp.float32),
            grid=(n * c,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            interpret=interpret,
        )
    else:
        # v2 (r5): one program per image loops all C*n_bands bands, and
        # the output ALIASES the input — the iteration is fully in-place
        # (see _rl_iter_kernel2 for the DMA-ordering argument)
        step = pl.pallas_call(
            functools.partial(_rl_iter_kernel2, taps=taps, band_h=band_h,
                              halo2=halo2, h=hh, w=ww, w_out=w_out,
                              n_bands=n_bands, c=c),
            out_shape=jax.ShapeDtypeStruct((n * c, hb + 2 * halo2, w_in),
                                           jnp.float32),
            grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            input_output_aliases={0: 0},
            interpret=interpret,
        )

    # the kernel both reads AND writes the ext layout, so the loop carries
    # the padded array with zero XLA glue between iterations (the round-2
    # body re-padded u in XLA every iteration: ~2 extra full-image HBM
    # transfers + a slice, now paid once at entry/exit)
    out = jax.lax.fori_loop(0, iterations, lambda _, u: step(u, d_ext),
                            pad_ext(d0))
    out = jnp.transpose(
        out[:, halo2:halo2 + hh, 2 * r:2 * r + ww].reshape(n, c, hh, ww),
        (0, 2, 3, 1))
    return out[0] if squeeze else out


def gauss_blur_pallas(img_hwc: jnp.ndarray, sigma: float = 1.0,
                      band_h: int = 128, interpret: bool = False) -> jnp.ndarray:
    """(H, W, C) float32 -> same shape. HWC wrapper over the planar kernel."""
    chw = jnp.transpose(img_hwc, (2, 0, 1))
    out = _gauss_blur_planar(chw, sigma=sigma, band_h=band_h,
                             interpret=interpret)
    return jnp.transpose(out, (1, 2, 0))


