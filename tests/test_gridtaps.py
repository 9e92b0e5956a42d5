"""Exact power-of-two octaver grid: closed form vs the float64 oracle.

At whole-octave settings the file-mode fast path evaluates tap positions
in exact integer arithmetic (ops/gridtaps.py), removing the float32
phase-accumulation floor: parity vs the float64 per-sample oracle reaches
the framework-wide -80 dBFS bar (the blockwise/streaming path keeps the
documented -60 dBFS float32 floor, test_effects_parity.py).
"""

import numpy as np
import pytest

from aefs_tpu.core.chain import build_chain
from aefs_tpu.core.fileopts import file_static_overrides
from aefs_tpu.ops.gridtaps import pow2_exponent, pow2_geometry_ok

from helpers import tones, noise
from oracles import OracleOctaver, run_oracle_blocks, err_dbfs

FS = 48000


def run_fast(cfgs, x):
    chain, state, tmap = build_chain(
        cfgs, FS, 4096, channels_in=x.shape[1],
        static_overrides=file_static_overrides(cfgs),
    )
    _, out = chain.process_array(state, chain.targets(tmap), x, fast=True)
    return out


@pytest.mark.parametrize("semitones", [-24, -12, 0, 12, 24])
def test_octaver_pow2_file_parity(semitones):
    x = (tones(8 * 4096, fs=FS) + noise(8 * 4096, amp=0.05, seed=3)).astype(
        np.float32
    )
    cfg = [{"effect_id": "o", "type": "octaver",
            "params": {"semitones": semitones, "mix": 1.0}}]
    got = run_fast(cfg, x)
    oracle = OracleOctaver(FS, semitones=semitones, mix=1.0)
    ref = run_oracle_blocks(oracle, x.astype(np.float64), 256)
    assert err_dbfs(got, ref) <= -80, err_dbfs(got, ref)


def test_pow2_gating():
    assert pow2_exponent(-12) == -1
    assert pow2_exponent(24) == 2
    assert pow2_exponent(0) == 0
    assert pow2_exponent(7) is None
    assert pow2_exponent(-12.5) is None
    assert pow2_exponent(36) is None  # outside the param range
    assert pow2_geometry_ok(1920, -2)
    assert not pow2_geometry_ok(1764, 2)  # 44.1 kHz ring fails stride checks


def test_non_octave_falls_back():
    """Arbitrary semitones keep the generic resampler path in file mode."""
    x = tones(4 * 4096, fs=FS).astype(np.float32)
    cfg = [{"effect_id": "o", "type": "octaver",
            "params": {"semitones": 7, "mix": 1.0}}]
    got = run_fast(cfg, x)
    oracle = OracleOctaver(FS, semitones=7, mix=1.0)
    ref = run_oracle_blocks(oracle, x.astype(np.float64), 256)
    assert err_dbfs(got, ref) <= -60, err_dbfs(got, ref)


# -- streaming exact grid (octaver_taps_pow2_stream) ----------------------

@pytest.mark.parametrize("e", [-2, -1, 0, 1, 2])
def test_stream_taps_match_cubic_read(e):
    """The class-decomposed streaming taps equal the trusted gather-based
    fractional read at the same exact positions (both share _wrap_patch),
    from several arbitrary carried phases."""
    import jax.numpy as jnp
    from aefs_tpu.ops.gridtaps import (
        octaver_taps_pow2_stream, pow2_stream_geometry_ok,
    )
    from aefs_tpu.ops.ringbuf import fractional_read_cubic

    s, n = 1920, 256
    assert pow2_stream_geometry_ok(s, e, n)
    rng = np.random.default_rng(11 + e)
    hist = jnp.asarray(rng.standard_normal(s), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    denom = (1 << -e) * s if e < 0 else s
    step = (1 << -e) - 1 if e < 0 else -((1 << e) - 1)
    for num0 in (0, 1, 7, denom // 3, denom - 1, denom - 3 * abs(step or 1)):
        s1, s2, p1, p2, new_num = octaver_taps_pow2_stream(
            hist, x, e, jnp.int32(num0)
        )
        i = np.arange(n)
        r1 = (num0 + i * step) % denom
        r2 = (r1 + denom // 2) % denom
        d = denom // s
        ref1 = fractional_read_cubic(hist, x, jnp.asarray(r1 / d, jnp.float32))
        ref2 = fractional_read_cubic(hist, x, jnp.asarray(r2 / d, jnp.float32))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(ref1),
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(ref2),
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(p1), (r1 / denom), atol=1e-6)
        assert int(new_num) == (num0 + n * step) % denom


@pytest.mark.parametrize("e", [-2, -1, 1])
def test_stream_taps_block_split_invariant(e):
    """Splitting the stream into different block sizes yields identical
    taps (the integer phase carry is exact)."""
    import jax.numpy as jnp
    from aefs_tpu.ops.gridtaps import octaver_taps_pow2_stream

    s = 1920
    rng = np.random.default_rng(5)
    total = 2048
    sig = rng.standard_normal(total).astype(np.float32)

    def run(bs):
        hist = jnp.zeros((s,), jnp.float32)
        num = jnp.int32(0)
        outs = []
        for k in range(0, total, bs):
            x = jnp.asarray(sig[k:k + bs])
            s1, s2, p1, p2, num = octaver_taps_pow2_stream(hist, x, e, num)
            outs.append(np.asarray(s1 * (0.5 - 0.5 * jnp.cos(2 * np.pi * p1))
                                   + s2 * (0.5 - 0.5 * jnp.cos(2 * np.pi * p2))))
            hist = jnp.concatenate([hist, x])[-s:]
        return np.concatenate(outs)

    np.testing.assert_array_equal(run(256), run(128))
    np.testing.assert_array_equal(run(256), run(512))


@pytest.mark.parametrize("fs,semitones", [(44100, -12), (44100, 12), (32000, -24)])
def test_stream_grid_parity_other_rates(fs, semitones):
    """Exact-grid streaming holds the -80 dBFS bar at non-48k rates
    (window size = fs * 40 ms changes every divisibility property)."""
    from aefs_tpu.ops.gridtaps import pow2_stream_geometry_ok, pow2_exponent

    size = max(int(fs * 40.0 / 1000.0), 16)
    e = pow2_exponent(semitones)
    assert pow2_stream_geometry_ok(size, e, 256), (size, e)

    frames = 40 * 256
    x = tones(frames, fs=fs)
    chain_cfg = {"effect_id": "o", "type": "octaver",
                 "params": {"semitones": semitones, "mix": 1.0}}
    chain, state, tmap = build_chain(
        [chain_cfg], fs, 256, channels_in=2,
        static_overrides={"o": {"grid_semitones": semitones}},
    )
    _, got = chain.process_array(state, chain.targets(tmap), x)
    oracle = OracleOctaver(fs, semitones=semitones, mix=1.0)
    ref = run_oracle_blocks(oracle, x.astype(np.float64), 256)
    assert err_dbfs(got, ref) <= -80, err_dbfs(got, ref)
