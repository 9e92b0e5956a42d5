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


def _cr_combine(frac, y0, y1, y2, y3):
    """4-point Hermite combine — the identical arithmetic to the gather
    path (ops/ringbuf.py:cubic_hermite / reference octaver.py:9-15)."""
    c0 = y1
    c1 = 0.5 * (y2 - y0)
    c2 = y0 - 2.5 * y1 + 2.0 * y2 - 0.5 * y3
    c3 = 0.5 * (y3 - y0) + 1.5 * (y1 - y2)
    return ((c3 * frac + c2) * frac + c1) * frac + c0


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

    # One-hot tap selection instead of a dense Catmull-Rom distance band:
    # building w(d) over the (T, W) grid costs ~12 VPU passes; a one-hot at
    # the first tap index costs ~3, the four taps become MXU matvecs
    # against lane-rolled windows, and the Hermite combine runs on (R, T)
    # vectors — also matching the gather path's arithmetic exactly.
    f = jnp.floor(qw)
    frac = qw - f
    i0 = f.astype(jnp.int32) - 1  # index of the oldest tap (y0)
    j = lax.broadcasted_iota(jnp.int32, (r, t, w), 2)
    oh = (j == i0[:, :, None]).astype(jnp.float32)  # (R, T, W)

    win = win_ref[:, 0, :]  # (R, W); Ref indexing can't insert new axes
    dn = (((2,), (1,)), ((0,), (0,)))  # contract W, batch R
    taps = []
    for k in range(4):
        wk = win if k == 0 else pltpu.roll(win, w - k, 1)  # win[j + k]
        taps.append(
            lax.dot_general(oh, wk, dn, preferred_element_type=jnp.float32)
        )
    out_ref[:, 0, :] = _cr_combine(frac, *taps)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _resample_call(base_tiles, ago_tiles, windows, interpret: bool):
    m, t = base_tiles.shape
    w = windows.shape[1]
    # Largest divisor of m up to _ROWS: no padded rows, ever (a vmapped
    # 256-sample stream brings only m = 2 tiles to its own grid).
    rows = _ROWS if m >= _ROWS else m
    while m % rows:
        rows -= 1
    spec_t = pl.BlockSpec((rows, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((rows, 1, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _resample_kernel,
        out_shape=jax.ShapeDtypeStruct((m, 1, t), jnp.float32),
        grid=(m // rows,),
        in_specs=[spec_t, spec_t, spec_w],
        out_specs=spec_t,
        interpret=interpret,
    )(base_tiles[:, None, :], ago_tiles[:, None, :], windows[:, None, :])
    return out[:, 0, :]


def _taps_onehot(qw, win, r, t, w):
    """Shared one-hot 4-tap extraction: (R, T) positions + (R, W) window
    -> Hermite-combined samples (R, T)."""
    f = jnp.floor(qw)
    frac = qw - f
    i0 = f.astype(jnp.int32) - 1
    j = lax.broadcasted_iota(jnp.int32, (r, t, w), 2)
    oh = (j == i0[:, :, None]).astype(jnp.float32)
    dn = (((2,), (1,)), ((0,), (0,)))
    taps = []
    for k in range(4):
        wk = win if k == 0 else pltpu.roll(win, w - k, 1)
        taps.append(lax.dot_general(oh, wk, dn, preferred_element_type=jnp.float32))
    return _cr_combine(frac, *taps)


def _fused_kernel(hist_len, tile, window, region_len,
                  a1_ref, a2_ref, anc_ref, m1_ref, m2_ref, reg_ref, out_ref):
    """Both octaver taps, both position clusters, in one program.

    The program's region block holds every sample its R tiles can read;
    per (tile, tap, cluster) the window is aligned with one dynamic lane
    rotation (Mosaic native) — no window gather anywhere.  Window-relative
    integer bases are derived in-kernel from the grid position, so the
    only per-lane inputs are the two ago streams and the cluster masks.
    """
    r, t = a1_ref.shape[0], a1_ref.shape[2]
    p_id = pl.program_id(0)
    region = reg_ref[0, 0:1, :]  # (1, region_len)

    def windows_and_bases(col):
        """Per-tile rolled windows (R, W) + integer bases (R, T) for the
        anchor column ``col`` (0=lo1, 1=hi1, 2=lo2, 3=hi2)."""
        wins = []
        for ri in range(r):
            a_loc = anc_ref[ri, 0, col]
            rolled = pltpu.roll(region, region_len - a_loc, 1)
            wins.append(rolled[:, :window])
        wins = jnp.concatenate(wins, axis=0)  # (R, W)
        # base[ri, j] = (hist + global_n) - a_abs
        #             = (hist + (p*R + ri)*T + j) - (p*R*T_region... ) with
        # a_abs = program_base + a_loc and global tile base folding exactly:
        gidx = p_id * r + lax.broadcasted_iota(jnp.int32, (r, t), 0)
        j = lax.broadcasted_iota(jnp.int32, (r, t), 1)
        a_loc_col = anc_ref[:, 0, col][:, None]
        prog_base = p_id * (r * tile)
        base = (hist_len + gidx * tile + j) - (prog_base + a_loc_col)
        return wins, base.astype(jnp.float32)

    def tap(ago_ref, m_ref, col_lo, col_hi, out_row):
        ago = ago_ref[:, 0, :]
        m = m_ref[:, 0, :]
        wl, bl = windows_and_bases(col_lo)
        s_lo = _taps_onehot(bl - ago, wl, r, t, window)
        out_ref[:, out_row, :] = s_lo

        # The hi position cluster exists only in programs where the grain
        # phasor wraps — once per ~ring-size output samples, so ~13% of
        # streaming programs at ratio 2.  Grid programs run sequentially
        # on the core, so a program-level predicate genuinely skips the
        # second band evaluation (unlike the round-1 per-tile predication
        # inside 8-row file programs, which measured slower — the skip
        # granularity must match the program, not the tile).
        @pl.when(jnp.max(m) > 0.0)
        def _hi():
            wh, bh = windows_and_bases(col_hi)
            s_hi = _taps_onehot(bh - ago, wh, r, t, window)
            out_ref[:, out_row, :] = m * s_hi + (1.0 - m) * s_lo

    tap(a1_ref, m1_ref, 0, 1, 0)
    tap(a2_ref, m2_ref, 2, 3, 1)


@functools.partial(
    jax.jit, static_argnames=("hist_len", "tile", "window", "rows", "interpret")
)
def _fused_call(a1, a2, anchors_loc, m1, m2, regions,
                hist_len: int, tile: int, window: int, rows: int,
                interpret: bool):
    m, t = a1.shape
    region_len = regions.shape[1]
    assert m % rows == 0  # rows is chosen as a divisor of the tile count
    spec_t = pl.BlockSpec((rows, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_a = pl.BlockSpec((rows, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_r = pl.BlockSpec(
        (1, 1, region_len), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_o = pl.BlockSpec((rows, 2, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_fused_kernel, hist_len, tile, window, region_len)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, 2, t), jnp.float32),
        grid=(m // rows,),
        in_specs=[spec_t, spec_t, spec_a, spec_t, spec_t, spec_r],
        out_specs=spec_o,
        interpret=interpret,
    )(
        a1[:, None, :],
        a2[:, None, :],
        anchors_loc[:, None, :],
        m1[:, None, :],
        m2[:, None, :],
        regions[:, None, :],
    )
    return out[:, 0, :], out[:, 1, :]


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
    at = ago.reshape(-1, tile)
    bl, bh, wl, wh, mask = _cluster_parts(ext, at, hist_len, size, tile, window)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if use_pallas:
        interp = use_pallas == "interpret"
        out_lo = _resample_call(bl, at, wl, interp)
        out_hi = _resample_call(bh, at, wh, interp)
    else:
        out_lo = _resample_xla(bl, at, wl)
        out_hi = _resample_xla(bh, at, wh)

    out = jnp.where(mask > 0.5, out_hi, out_lo)
    return out.reshape(ago.shape[0])


def _cluster_parts(ext, at, hist_len: int, size: int, tile: int, window: int):
    """Per-tile low/high cluster split: window-relative integer bases,
    sliced windows, and the per-lane high-cluster mask.

    at: (M, tile) ago values.  Returns (bases_lo, bases_hi (M, tile) f32,
    win_lo, win_hi (M, window) f32, mask (M, tile) f32)."""
    m = at.shape[0]
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

    a_lo = anchors_for(lo_min)
    a_hi = anchors_for(hi_min)
    return (
        bases_for(a_lo),
        bases_for(a_hi),
        slice_w(a_lo),
        slice_w(a_hi),
        hi_mask.astype(jnp.float32),
    )


def _cluster_anchors(at, hist_len: int, size: int, tile: int):
    """Anchors + cluster mask only (the region-mode kernel derives bases
    in-kernel and needs no pre-sliced windows)."""
    m = at.shape[0]
    j_int = jnp.arange(tile, dtype=jnp.int32)[None, :]
    q_rel = (hist_len + j_int).astype(jnp.float32) - at
    tile_base = jnp.arange(m, dtype=jnp.int32) * tile
    lo_min = jnp.min(q_rel, axis=1)
    hi_mask = q_rel > (lo_min[:, None] + size / 2.0)
    hi_min = jnp.min(jnp.where(hi_mask, q_rel, jnp.inf), axis=1)
    hi_min = jnp.where(jnp.isfinite(hi_min), hi_min, lo_min)
    a_lo = tile_base + jnp.floor(lo_min).astype(jnp.int32) - 2
    a_hi = tile_base + jnp.floor(hi_min).astype(jnp.int32) - 2
    return a_lo, a_hi, hi_mask.astype(jnp.float32)


def octaver_taps_fused(ext, ago1, ago2, hist_len: int, size: int, tile: int,
                       window: int, use_pallas=None):
    """Both octaver taps in one fused kernel invocation (2 taps x 2
    position clusters = 4 one-hot band evaluations).

    On TPU, each grid program loads one contiguous REGION of the stream
    (built by reshape+concat — no gather) covering everything its R tiles
    can read; windows are aligned in-kernel with dynamic lane rotations.

    Returns (s1, s2) each (N,) — the raw interpolated taps, before the
    Hann crossfade gains and the ring-boundary wrap patch."""
    n = ago1.shape[0]
    at1 = ago1.reshape(-1, tile)
    at2 = ago2.reshape(-1, tile)
    m = at1.shape[0]

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if not use_pallas:
        bl1, bh1, wl1, wh1, m1 = _cluster_parts(ext, at1, hist_len, size, tile, window)
        bl2, bh2, wl2, wh2, m2 = _cluster_parts(ext, at2, hist_len, size, tile, window)
        lo1 = _resample_xla(bl1, at1, wl1)
        hi1 = _resample_xla(bh1, at1, wh1)
        s1 = jnp.where(m1 > 0.5, hi1, lo1)
        lo2 = _resample_xla(bl2, at2, wl2)
        hi2 = _resample_xla(bh2, at2, wh2)
        s2 = jnp.where(m2 > 0.5, hi2, lo2)
        return s1.reshape(n), s2.reshape(n)

    # Tiles per program: _ROWS amortizes per-program overhead on long
    # signals, but a short block (the vmapped streaming path: each stream
    # contributes only N/tile tiles to its own pallas grid) must not pad
    # up to it — at N=256/tile=128 that would be 6 garbage tiles computed
    # for every 2 real ones.  The largest divisor of m up to _ROWS means
    # no padded rows exist anywhere downstream — EXCEPT when m is awkward
    # (prime, 2*prime): a divisor of 1-2 would turn the fused kernel into
    # ~m near-single-tile programs with per-program region rebuilds, so
    # below a floor of 4 rows we pad the tile axis up to a multiple of
    # _ROWS instead (padded tiles read ago=0 positions, outputs sliced
    # off below).
    rows = _ROWS if m >= _ROWS else m
    while m % rows:
        rows -= 1
    if rows < 4 and m > 4:
        rows = _ROWS
        pad = (-m) % rows
        at1 = jnp.pad(at1, ((0, pad), (0, 0)))
        at2 = jnp.pad(at2, ((0, pad), (0, 0)))
        m = at1.shape[0]

    a_lo1, a_hi1, m1 = _cluster_anchors(at1, hist_len, size, tile)
    a_lo2, a_hi2, m2 = _cluster_anchors(at2, hist_len, size, tile)

    # Region geometry: program p (R tiles) reads ext[p*S : p*S + region_len]
    # with S = R*tile; region_len covers the deepest read of the last tile
    # plus the window width.
    s_stride = rows * tile
    needed = (rows - 1) * tile + size + window + 8
    k = -(-needed // s_stride)
    region_len = k * s_stride

    n_prog = m // rows
    chunks_needed = (n_prog + k - 1) * s_stride
    ext_pad = jnp.pad(ext, (0, max(0, chunks_needed - ext.shape[0])))
    chunks = ext_pad[:chunks_needed].reshape(n_prog + k - 1, s_stride)
    regions = jnp.concatenate(
        [chunks[i : i + n_prog] for i in range(k)], axis=1
    )  # (n_prog, region_len)

    anchors = jnp.stack([a_lo1, a_hi1, a_lo2, a_hi2], axis=1)  # (M, 4)
    prog_base = (jnp.arange(m, dtype=jnp.int32) // rows) * s_stride
    anchors_loc = jnp.clip(anchors - prog_base[:, None], 0, region_len - window)

    s1, s2 = _fused_call(
        at1, at2, anchors_loc, m1, m2,
        regions, hist_len, tile, window, rows, use_pallas == "interpret",
    )
    return s1.reshape(-1)[:n], s2.reshape(-1)[:n]
