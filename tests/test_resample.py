"""Banded Catmull-Rom resampler vs the gather tap path and the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from aefs_tpu.ops.ringbuf import fractional_read_cubic, fractional_read_resample
from aefs_tpu.core.chain import build_chain
from aefs_tpu.engine.engine import _file_static_overrides

from helpers import tones, noise
from oracles import OracleOctaver, run_oracle_blocks, err_dbfs

FS = 48000
RNG = np.random.default_rng(21)


@pytest.mark.parametrize("step_scale", [-0.94, -0.5, 0.3, 3.0 / 1920 * 1920 * 0 + 0.9])
def test_resample_matches_gather_taps(step_scale):
    """Non-wrap lanes must match the 4-tap gather read to float rounding;
    wrap lanes are the identical patch, so whole blocks must agree."""
    size = 1920
    n = 1024
    hist = RNG.standard_normal(size).astype(np.float32) * 0.3
    x = RNG.standard_normal(n).astype(np.float32) * 0.3
    # phasor ramp like the octaver's: p = mod(p0 + i*step, 1), ago = p*size
    step = step_scale / size
    p = np.mod(0.37 + np.arange(n) * step, 1.0).astype(np.float32)
    ago = (p * size).astype(np.float32)

    ref = np.asarray(fractional_read_cubic(jnp.asarray(hist), jnp.asarray(x), jnp.asarray(ago)))
    got = np.asarray(
        fractional_read_resample(
            jnp.asarray(hist), jnp.asarray(x), jnp.asarray(ago), tile=128, window=640
        )
    )
    # Residual is weight-evaluation rounding (Horner-on-frac vs
    # piecewise-poly-on-d) at ulp(window): ~-95 dBFS.
    assert err_dbfs(got, ref) <= -90, err_dbfs(got, ref)


def test_octaver_model_uses_resample_and_matches_oracle():
    params = {"semitones": -12, "mix": 1.0}
    x = tones(40 * 256, fs=FS)
    cfg = [{"effect_id": "o", "type": "octaver", "params": params}]
    chain, state, tmap = build_chain(cfg, FS, 256, channels_in=2)
    assert chain.effects[0][1].use_resample
    _, got = chain.process_array(state, chain.targets(tmap), x)
    ref = run_oracle_blocks(OracleOctaver(FS, **params), x.astype(np.float64), 256)
    assert err_dbfs(got, ref) <= -60, err_dbfs(got, ref)


@pytest.mark.parametrize("semi", [-24, -12, 7, 24])
def test_octaver_file_fast_with_baked_ratio(semi):
    params = {"semitones": semi, "mix": 1.0}
    cfg = [{"effect_id": "o", "type": "octaver", "params": params}]
    x = noise(12 * 4096, amp=0.25, seed=31)
    outs = {}
    for fast in (False, True):
        chain, state, tmap = build_chain(
            cfg, FS, 4096, channels_in=2,
            static_overrides=_file_static_overrides(cfg),
        )
        assert chain.effects[0][1].use_resample
        _, outs[fast] = chain.process_array(state, chain.targets(tmap), x, fast=fast)
    # Whole-octave semis route the fast path through the EXACT integer-grid
    # closed form (ops/gridtaps.py): fast-vs-blockwise is then bounded by
    # the blockwise float32 phase floor, and the tight bar is fast-vs-oracle
    # (-80 dBFS, test_gridtaps.py).  Non-octave semis share the split-f32
    # phase machinery on both paths and agree to -90 dBFS.
    # (blockwise drift grows with |1 - ratio| * t: ~-55 dB at +-12,
    # ~-46 dB at +-24 over this 1 s signal)
    pair_tol = -40 if semi % 12 == 0 else -90
    assert err_dbfs(outs[True], outs[False]) <= pair_tol, (
        err_dbfs(outs[True], outs[False]))

    # Oracle comparison over ~1 s accumulates float32-vs-float64 phase
    # drift proportional to |1 - ratio| * t on the split-f32 path; the
    # exact grid path holds the full -80 dBFS bar.
    oracle_tol = -80 if semi % 12 == 0 else -45
    ref = run_oracle_blocks(OracleOctaver(FS, **params), x.astype(np.float64), 4096)
    assert err_dbfs(outs[True], ref) <= oracle_tol, err_dbfs(outs[True], ref)


@pytest.mark.parametrize("m_tiles", [7, 6, 14])  # prime / 2*3 / 2*7 tile counts
def test_fused_kernel_awkward_tile_counts(m_tiles):
    """Tile counts whose largest divisor under _ROWS is 1-2 must pad up
    to _ROWS-row programs (interpret-mode kernel) and still match the
    gather taps — the rows=1 per-program collapse is both slow and was
    only guarded by callers happening to pass round counts."""
    from aefs_tpu.ops.pallas.resample import octaver_taps_fused
    from aefs_tpu.ops.ringbuf import _wrap_patch

    size, tile, window = 1920, 128, 640
    n = m_tiles * tile
    hist = RNG.standard_normal(size).astype(np.float32) * 0.3
    x = RNG.standard_normal(n).astype(np.float32) * 0.3
    step = -0.5 / size
    p1 = np.mod(0.21 + np.arange(n) * step, 1.0).astype(np.float32)
    ago1 = (p1 * size).astype(np.float32)
    ago2 = ((np.mod(p1 + 0.5, 1.0)) * size).astype(np.float32)

    ext = jnp.concatenate([jnp.asarray(hist), jnp.asarray(x),
                           jnp.zeros((window,), jnp.float32)])
    s1, s2 = octaver_taps_fused(ext, jnp.asarray(ago1), jnp.asarray(ago2),
                                size, size, tile, window,
                                use_pallas="interpret")
    r1 = fractional_read_cubic(jnp.asarray(hist), jnp.asarray(x), jnp.asarray(ago1))
    r2 = fractional_read_cubic(jnp.asarray(hist), jnp.asarray(x), jnp.asarray(ago2))
    for got, ref, ago in ((s1, r1, ago1), (s2, r2, ago2)):
        ca = np.ceil(ago)
        bulk = (ca > 1) & (ca < size - 1)  # wrap lanes are patched elsewhere
        err = np.max(np.abs(np.asarray(got)[bulk] - np.asarray(ref)[bulk]))
        assert err < 5e-5, (m_tiles, err)
