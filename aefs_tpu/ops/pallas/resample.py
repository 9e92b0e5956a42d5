"""Pallas TPU kernel: banded Catmull-Rom resampling.

The octaver's fractional delay-line taps are the framework's one
irreducibly data-dependent read (pitch_shift_kernel_cubic,
octaver.py:37-62).  A gather implementation costs ~46 cycles per
descriptor on TPU (PERF.md); this kernel reformulates the 4-tap Hermite
read as interpolation of the stream at real position q:

    out[n] = sum_j w(q[n] - j) * ext[j],   w = Catmull-Rom kernel

(the reference's cubic_interp coefficients ARE the Catmull-Rom weights,
verified term-by-term) and evaluates it as a dense banded weight matrix
times a small per-tile window — VPU work instead of gathers.

Positions inside one tile of T outputs form at most two affine ramps (the
grain phasor wraps at most once per tile since the wrap period is
>= size/3 samples > T); the caller splits each tile into its low/high
position cluster and anchors a window per cluster.  Window extraction is
one cheap M-descriptor sliced gather in XLA (M = N/T tiles); the kernel
itself is a plain blocked pallas_call, so Mosaic double-buffers the
window/position blocks automatically.

All positions are window-relative with exact-integer bases so float32
never sees absolute sample indices (q_abs ~ 10^6 would cost 0.06 ulp of
tap position).
"""

from __future__ import annotations

import functools

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


_ROWS = 8  # tiles per grid program — amortizes per-program overhead
# Window-anchor alignment: measured on TPU v5e, unaligned window slices
# (ALIGN=1) beat 128-aligned ones (26.0 vs 29.6 ms for the whole-file
# octaver) because the extra 128 samples of band width cost more VPU work
# than the unaligned copy does.
ALIGN = 1


def _resample_kernel(base_ref, ago_ref, win_ref, out_ref):
    r, t = base_ref.shape[0], base_ref.shape[2]
    w = win_ref.shape[2]
    # Window-relative position: (base - anchor) is exact integer float32;
    # subtracting ago LAST keeps rounding at ulp(window) — the same
    # granularity as ago itself (subtracting in q-space first would round
    # at ulp(ring size) and cost ~1 bit of tap position).
    qw = base_ref[:, 0, :] - ago_ref[:, 0, :]  # (R, T)
    j = lax.broadcasted_iota(jnp.int32, (r, t, w), 2).astype(jnp.float32)
    weights = _cr_weights(jnp.abs(qw[:, :, None] - j))
    win = win_ref[:, 0, :]  # (R, W); Ref indexing can't insert new axes
    out_ref[:, 0, :] = jnp.sum(weights * win[:, None, :], axis=2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _resample_call(base_tiles, ago_tiles, windows, interpret: bool):
    m, t = base_tiles.shape
    w = windows.shape[1]
    pad = (-m) % _ROWS
    if pad:
        base_tiles = jnp.pad(base_tiles, ((0, pad), (0, 0)))
        ago_tiles = jnp.pad(ago_tiles, ((0, pad), (0, 0)))
        windows = jnp.pad(windows, ((0, pad), (0, 0)))
    mp = m + pad
    spec_t = pl.BlockSpec((_ROWS, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((_ROWS, 1, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _resample_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, 1, t), jnp.float32),
        grid=(mp // _ROWS,),
        in_specs=[spec_t, spec_t, spec_w],
        out_specs=spec_t,
        interpret=interpret,
    )(base_tiles[:, None, :], ago_tiles[:, None, :], windows[:, None, :])
    return out[:m, 0, :]


def _resample_xla(base_tiles, ago_tiles, windows):
    """Pure-XLA equivalent of the windowed band evaluation (used on CPU and
    by the kernel parity tests)."""

    def one(base, ago, win):
        j = jnp.arange(win.shape[0], dtype=jnp.float32)
        weights = _cr_weights(jnp.abs((base - ago)[:, None] - j[None, :]))
        return weights @ win

    return jax.vmap(one)(base_tiles, ago_tiles, windows)


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
    window: static window length >= per-cluster position span + 6.

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
        if ALIGN > 1:  # lane-aligned slices (see PERF.md measurement)
            a = (a // ALIGN) * ALIGN
        return jnp.clip(a, 0, ((e - window) // ALIGN) * ALIGN)

    def bases_for(a):
        # (hist_len + global_n) - anchor: exact in int32, cast to f32.
        return (
            (hist_len + tile_base[:, None] + j_int) - a[:, None]
        ).astype(jnp.float32)

    a_lo = anchors_for(lo_min)
    a_hi = anchors_for(hi_min)

    # Window extraction: one M-descriptor sliced gather (cheap — M is the
    # tile count, not the sample count).  Explicit GatherDimensionNumbers
    # with slice_sizes=(window,) guarantees one descriptor per tile; a
    # vmapped dynamic_slice may decompose into per-element descriptors.
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def slice_w(a):
        return lax.gather(
            ext, a[:, None], dnums, slice_sizes=(window,),
            mode=lax.GatherScatterMode.CLIP,
        )

    win_lo = slice_w(a_lo)
    win_hi = slice_w(a_hi)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if use_pallas:
        out_lo = _resample_call(bases_for(a_lo), at, win_lo, False)
        out_hi = _resample_call(bases_for(a_hi), at, win_hi, False)
    else:
        out_lo = _resample_xla(bases_for(a_lo), at, win_lo)
        out_hi = _resample_xla(bases_for(a_hi), at, win_hi)

    out = jnp.where(hi_mask, out_hi, out_lo)
    return out.reshape(n)
