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
