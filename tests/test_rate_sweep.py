"""Non-48 kHz parity sweep (VERDICT r3 #7).

Every fs-derived quantity — comb/allpass lags, smoother coefficients,
LFO phase steps, the octaver grid/window, the spectral hop, delay-line
sizes — re-derives from the negotiated sample rate
(/root/reference/src/audioblocks/engine.py:177-181).  The main parity
suite pins FS = 48000; this file re-runs one representative oracle-parity
case per fs-sensitive effect at 44.1 kHz and 96 kHz, plus the five-effect
blocking-invariance check, so a rate-dependent constant baked anywhere in
the DSP trips a test instead of a user.

Waveshaper and stereowidth are memoryless/rate-free (their oracles take
no fs) and are covered by the 48 kHz suite alone.
"""

import numpy as np
import pytest

from aefs_tpu.core.chain import build_chain
from aefs_tpu.models import synthetic_ir

from helpers import noise, tones, bursts
from oracles import (
    OracleStereoDelay,
    OracleReverb,
    OracleBiquad,
    OracleCompressor,
    OracleGate,
    OracleOctaver,
    OracleSpectral,
    OracleBitcrusher,
    OracleChorus,
    OracleFlanger,
    OracleLimiter,
    OracleRingMod,
    OracleWah,
    OracleConvReverb,
    OraclePhaser,
    OracleTremolo,
    run_oracle_blocks,
    err_dbfs,
)

RATES = [44100, 96000]
N = 256
FRAMES = 40 * N


def run_chain(cfg, x, fs, blocksize=N, static_overrides=None):
    chain, state, tmap = build_chain(
        [cfg], fs, blocksize, channels_in=x.shape[1], channels_out=2,
        static_overrides=static_overrides,
    )
    targets = chain.targets(tmap)
    _, out = chain.process_array(state, targets, x)
    return out


# One representative case per fs-sensitive effect: (type, params, oracle,
# signal builder).  Params chosen from the 48 kHz suite's hardest passing
# draws, scaled where a literal is rate-relative (bitcrusher clock).
CASES = [
    ("delay",
     {"delay_ms": 100, "feedback": 0.6, "mix_dry": 0.7, "mix_wet": 0.5,
      "offset_ms": 30},
     OracleStereoDelay, lambda fs: noise(FRAMES)),
    ("reverb",
     {"rt60_s": 2.1, "damp": 0.05, "pre_delay_ms": 20, "mix_dry": 0.8,
      "mix_wet": 0.4},
     OracleReverb, lambda fs: noise(FRAMES, amp=0.2)),
    ("filter",
     {"filter_type": 3, "cutoff_hz": 1200, "q": 1.4, "gain_db": 9.0},
     OracleBiquad, lambda fs: tones(FRAMES, fs=fs)),
    ("gate",
     {"threshold_db": -45, "attack_ms": 5, "release_ms": 100},
     OracleGate, lambda fs: bursts(FRAMES, fs=fs)),
    ("compressor",
     {"threshold_db": -24, "ratio": 4.0, "attack_ms": 10, "release_ms": 120,
      "makeup_db": 3.0},
     OracleCompressor, lambda fs: bursts(FRAMES, fs=fs)),
    # off-grid semitones: the double-single 2^(s/12) + absolute-index
    # phase ramp must hold -80 at ANY rate (window size re-derives from fs)
    ("octaver",
     {"semitones": 11.73, "mix": 1.0},
     OracleOctaver, lambda fs: tones(FRAMES, fs=fs)),
    ("chorus",
     {"rate_hz": 0.8, "depth_ms": 3.0, "base_ms": 12.0, "mix": 0.5},
     OracleChorus, lambda fs: tones(FRAMES, fs=fs)),
    ("flanger",
     {"rate_hz": 0.3, "depth_ms": 2.0, "base_ms": 2.5, "feedback": 0.35,
      "mix": 0.7},
     OracleFlanger, lambda fs: tones(FRAMES, fs=fs)),
    ("phaser",
     {"rate_hz": 0.5, "min_hz": 200.0, "max_hz": 1600.0, "spread": 0.25,
      "mix": 0.5},
     OraclePhaser, lambda fs: tones(FRAMES, fs=fs)),
    ("tremolo",
     {"rate_hz": 5.0, "depth": 0.5, "spread": 0.25},
     OracleTremolo, lambda fs: tones(FRAMES, fs=fs)),
    ("wah",
     {"rate_hz": 1.5, "min_hz": 350.0, "max_hz": 2200.0, "res": 2.0,
      "mix": 1.0},
     OracleWah, lambda fs: tones(FRAMES, fs=fs)),
    ("ringmod",
     {"carrier_hz": 440.0, "mix": 1.0, "spread": 0.1},
     OracleRingMod, lambda fs: tones(FRAMES, fs=fs)),
    ("bitcrusher",
     {"bits": 6.0, "rate_hz": 8000.0, "mix": 1.0},
     OracleBitcrusher, lambda fs: bursts(FRAMES, fs=fs)),
    ("limiter",
     {"ceiling_db": -1.0, "release_ms": 80.0, "drive_db": 6.0},
     OracleLimiter, lambda fs: bursts(FRAMES, fs=fs, amp=0.9)),
    ("spectral",
     {"threshold_db": -45, "reduction": 0.2},
     OracleSpectral,
     lambda fs: (noise(FRAMES, amp=0.1)
                 + tones(FRAMES, fs=fs, amp=0.2)).astype(np.float32)),
]


@pytest.mark.parametrize("fs", RATES)
@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_effect_parity_at_rate(case, fs):
    etype, params, oracle_cls, mk = case
    x = mk(fs)
    got = run_chain({"effect_id": "e", "type": etype, "params": params},
                    x, fs)
    # Oracles mirror the f32 quantization of param VALUES the effect
    # actually receives (CLAUDE.md; test_effects_parity.py:9-10) — the
    # f64 literal vs the f32 target reads as fake drift (~-60 dBFS by
    # 8 s at the octaver's 2^(s/12)).
    okw = {k: (float(np.float32(v)) if isinstance(v, float) else v)
           for k, v in params.items()}
    if etype == "spectral":
        okw["hop"] = N
    oracle = oracle_cls(fs, **okw)
    ref = run_oracle_blocks(oracle, x.astype(np.float64), N)
    assert err_dbfs(got, ref) <= -80, (etype, fs, err_dbfs(got, ref))


@pytest.mark.parametrize("fs", RATES)
def test_convreverb_parity_at_rate(fs):
    ir = synthetic_ir(fs, 0.25, channels=2)
    x = noise(FRAMES, amp=0.2)
    got = run_chain(
        {"effect_id": "c", "type": "convreverb",
         "params": {"mix_dry": 0.7, "mix_wet": 0.4}},
        x, fs, static_overrides={"convreverb": {"ir": ir}},
    )
    oracle = OracleConvReverb(ir, mix_dry=0.7, mix_wet=0.4)
    ref = run_oracle_blocks(oracle, x.astype(np.float64), N)
    assert err_dbfs(got, ref) <= -80, err_dbfs(got, ref)


FIVE_FX = [
    {"effect_id": "g", "type": "gate",
     "params": {"threshold_db": -45, "attack_ms": 5, "release_ms": 100}},
    {"effect_id": "o", "type": "octaver",
     "params": {"semitones": -12, "mix": 0.4}},
    {"effect_id": "f", "type": "filter",
     "params": {"filter_type": 0, "cutoff_hz": 4000, "q": 0.8}},
    {"effect_id": "d", "type": "delay",
     "params": {"delay_ms": 375, "feedback": 0.2, "mix_dry": 1.0,
                "mix_wet": 0.6, "offset_ms": 10}},
    {"effect_id": "r", "type": "reverb",
     "params": {"rt60_s": 2.1, "damp": 0.05, "pre_delay_ms": 0,
                "mix_dry": 0.8, "mix_wet": 0.4}},
]


@pytest.mark.parametrize("fs", RATES)
def test_blocking_invariance_at_rate(fs):
    """256-sample blocks vs 2048-sample superblocks at non-48k rates:
    validates every fixed-point feedback solve and associative scan whose
    lag is re-derived from fs (test_chain.py holds the 48 kHz case)."""
    x = noise(8 * 2048, amp=0.25)
    outs = {}
    for bs in (256, 2048):
        chain, state, tmap = build_chain(
            FIVE_FX, fs, bs, channels_in=2,
            static_overrides={"delay": {"min_delay_ms": 375.0}},
        )
        _, outs[bs] = chain.process_array(state, chain.targets(tmap), x)
    assert err_dbfs(outs[256], outs[2048]) <= -80, \
        (fs, err_dbfs(outs[256], outs[2048]))
