"""Pallas TPU kernel: banded Catmull-Rom resampling.

The octaver's fractional delay-line taps are the framework's one
irreducibly data-dependent read (pitch_shift_kernel_cubic,
octaver.py:37-62).  A gather implementation costs ~46 cycles per
descriptor on TPU (PERF.md); this kernel reformulates the 4-tap Hermite
read as interpolation of the stream at real position q:

    out[n] = sum_j w(q[n] - j) * ext[j],   w = Catmull-Rom kernel

(the reference's cubic_interp coefficients ARE the Catmull-Rom weights,
verified term-by-term) and evaluates it as a dense banded weight matrix
times a small VMEM-resident window — VPU/MXU work instead of gathers.

Positions inside one tile of T outputs form at most two affine ramps (the
grain phasor wraps at most once per tile since the wrap period is
>= size/3 samples > T); the caller splits each tile into its low/high
position cluster, anchors a window per cluster (computed host-side,
scalar-prefetched), and blends the two kernel passes per lane.

All positions are tile-relative so float32 never sees absolute sample
indices (q_abs ~ 10^6 would cost 0.06 ulp of tap position).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cr_weights(ad):
    """Catmull-Rom kernel on |d| (zero outside |d| < 2)."""
    inner = ((1.5 * ad - 2.5) * ad) * ad + 1.0
    outer = ((-0.5 * ad + 2.5) * ad - 4.0) * ad + 2.0
    return jnp.where(ad <= 1.0, inner, jnp.where(ad < 2.0, outer, 0.0))


def _resample_kernel(anchors_ref, base_ref, ago_ref, ext_ref, out_ref, win_ref, sem):
    i = pl.program_id(0)
    # Window starts are pre-aligned to the 128-lane tiling (Mosaic requires
    # provably aligned HBM slice offsets for DMA).
    a = pl.multiple_of(anchors_ref[i], 128)

    dma = pltpu.make_async_copy(
        ext_ref.at[:, pl.ds(a, win_ref.shape[1])], win_ref, sem
    )
    dma.start()
    dma.wait()

    t = base_ref.shape[2]
    w = win_ref.shape[1]
    # Window-relative position: (base - anchor) is exact integer float32;
    # subtracting ago LAST keeps rounding at ulp(window) — the same
    # granularity as ago itself (subtracting in q-space first would round
    # at ulp(ring size) and cost ~1 bit of tap position).
    qw = base_ref[0, 0, :] - ago_ref[0, 0, :]
    j = lax.broadcasted_iota(jnp.int32, (t, w), 1).astype(jnp.float32)
    weights = _cr_weights(jnp.abs(qw[:, None] - j))
    out_ref[0, 0, :] = jnp.sum(weights * win_ref[0, :][None, :], axis=1)


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def _resample_call(ext2, base_tiles, ago_tiles, anchors, window: int, interpret: bool):
    m, t = base_tiles.shape
    # (M, 1, T) blocks of (1, 1, T): the trailing two dims equal the array
    # dims, satisfying the TPU (8, 128) tiling rule for any T.
    base3 = base_tiles[:, None, :]
    ago3 = ago_tiles[:, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, window), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _resample_kernel,
        out_shape=jax.ShapeDtypeStruct((m, 1, t), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(anchors, base3, ago3, ext2)
    return out[:, 0, :]


def _resample_xla(ext, base_tiles, ago_tiles, anchors, window: int):
    """Pure-XLA equivalent of the windowed band evaluation (used on CPU and
    by the kernel parity tests)."""

    def one(base, ago, a):
        win = lax.dynamic_slice_in_dim(ext, a, window)
        j = jnp.arange(window, dtype=jnp.float32)
        weights = _cr_weights(jnp.abs((base - ago)[:, None] - j[None, :]))
        return weights @ win

    return jax.vmap(one)(base_tiles, ago_tiles, anchors)


def catmull_rom_resample(ext, ago, hist_len: int, size: int, tile: int,
                         window: int, use_pallas=None):
    """Resample a delay line at fractional distances into the past.

    The read position of output n is q = hist_len + n - ago[n]; positions
    are evaluated window-relative with exact-integer bases so float32
    rounding stays at ulp(window) (~ago's own granularity).

    ext: (E,) float32 stream (hist_len history ++ block), right-padded by
      >= window zeros.
    ago: (N,) float32 distances in [0, size); N % tile == 0.
    size: ring size (cluster separation threshold for the <=1 phasor wrap
      per tile).
    window: static window length >= per-cluster position span + 134 (128
      of that pays for lane-aligning the window starts).

    Returns (N,) interpolated samples.
    """
    n = ago.shape[0]
    m = n // tile
    at = ago.reshape(m, tile)
    e = ext.shape[0]

    j_int = jnp.arange(tile, dtype=jnp.int32)[None, :]
    # q relative to the tile base, only used for clustering/anchors.
    q_rel = (hist_len + j_int).astype(jnp.float32) - at

    tile_base = jnp.arange(m, dtype=jnp.int32) * tile
    lo_min = jnp.min(q_rel, axis=1)
    hi_mask = q_rel > (lo_min[:, None] + size / 2.0)
    hi_min = jnp.min(jnp.where(hi_mask, q_rel, jnp.inf), axis=1)
    hi_min = jnp.where(jnp.isfinite(hi_min), hi_min, lo_min)

    def anchors_for(minv):
        a = tile_base + jnp.floor(minv).astype(jnp.int32) - 2
        a = (a // 128) * 128  # lane-aligned DMA starts (costs <=127 of window)
        return jnp.clip(a, 0, ((e - window) // 128) * 128)

    a_lo = anchors_for(lo_min)
    a_hi = anchors_for(hi_min)

    def bases_for(a):
        # (hist_len + global_n) - anchor: exact in int32, cast to f32.
        return (
            (hist_len + tile_base[:, None] + j_int) - a[:, None]
        ).astype(jnp.float32)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if use_pallas:
        ext2 = ext[None, :]
        out_lo = _resample_call(ext2, bases_for(a_lo), at, a_lo, window, False)
        out_hi = _resample_call(ext2, bases_for(a_hi), at, a_hi, window, False)
    else:
        out_lo = _resample_xla(ext, bases_for(a_lo), at, a_lo, window)
        out_hi = _resample_xla(ext, bases_for(a_hi), at, a_hi, window)

    out = jnp.where(hi_mask, out_hi, out_lo)
    return out.reshape(n)
