"""Chain composition, blocking invariance, and smoothing semantics."""

import numpy as np
import jax.numpy as jnp

from aefs_tpu.core.chain import build_chain
from aefs_tpu.core.params import ParamSpec, smooth_step
from aefs_tpu.core.config import DEFAULT_PRESETS

from helpers import noise, bursts
from oracles import (
    OracleStereoDelay,
    OracleReverb,
    OracleGate,
    OracleBiquad,
    OracleOctaver,
    run_oracle_blocks,
    err_dbfs,
    OracleSmooth,
)

FS = 48000
N = 256

FIVE_FX = [
    {"effect_id": "g", "type": "gate",
     "params": {"threshold_db": -45, "attack_ms": 5, "release_ms": 100}},
    {"effect_id": "o", "type": "octaver", "params": {"semitones": -12, "mix": 0.4}},
    {"effect_id": "f", "type": "filter",
     "params": {"filter_type": 0, "cutoff_hz": 4000, "q": 0.8}},
    {"effect_id": "d", "type": "delay",
     "params": {"delay_ms": 375, "feedback": 0.2, "mix_dry": 1.0,
                "mix_wet": 0.6, "offset_ms": 10}},
    {"effect_id": "r", "type": "reverb",
     "params": {"rt60_s": 2.1, "damp": 0.05, "pre_delay_ms": 0,
                "mix_dry": 0.8, "mix_wet": 0.4}},
]


def test_rain_delay_preset_vs_composed_oracles():
    """The "Rain Delay" preset (app.py:67-70): delay into reverb."""
    x = noise(30 * N, amp=0.2)
    cfgs = DEFAULT_PRESETS["Rain Delay"]
    chain, state, tmap = build_chain(cfgs, FS, N, channels_in=2)
    _, got = chain.process_array(state, chain.targets(tmap), x)

    d = OracleStereoDelay(FS, **cfgs[0]["params"])
    r = OracleReverb(FS, **cfgs[1]["params"])
    mid = run_oracle_blocks(d, x.astype(np.float64), N)
    ref = run_oracle_blocks(r, mid, N)
    assert err_dbfs(got, ref) <= -80, err_dbfs(got, ref)


def test_five_effect_chain_vs_composed_oracles():
    x = bursts(30 * N, amp=0.4)
    chain, state, tmap = build_chain(FIVE_FX, FS, N, channels_in=2)
    _, got = chain.process_array(state, chain.targets(tmap), x)

    sig = x.astype(np.float64)
    sig = run_oracle_blocks(OracleGate(FS, **FIVE_FX[0]["params"]), sig, N)
    sig = run_oracle_blocks(OracleOctaver(FS, **FIVE_FX[1]["params"]), sig, N)
    sig = run_oracle_blocks(OracleBiquad(FS, **FIVE_FX[2]["params"]), sig, N)
    sig = run_oracle_blocks(OracleStereoDelay(FS, **FIVE_FX[3]["params"]), sig, N)
    sig = run_oracle_blocks(OracleReverb(FS, **FIVE_FX[4]["params"]), sig, N)
    # Octaver's float32 phase path sets the composite floor (see
    # test_effects_parity docstring); remaining effects are exact.
    assert err_dbfs(got, sig) <= -55, err_dbfs(got, sig)


def test_blocking_invariance_superblocks():
    """Per-sample semantics are independent of the processing block size:
    the same stream processed in 256-sample blocks and in 2048-sample
    superblocks must match to float32 rounding.  This validates every
    fixed-point feedback solver and associative scan at N far above the
    feedback lags (SURVEY.md §7 "hard part #1")."""
    x = noise(8 * 2048, amp=0.25)
    outs = {}
    for bs in (256, 2048):
        chain, state, tmap = build_chain(
            FIVE_FX, FS, bs, channels_in=2,
            static_overrides={"delay": {"min_delay_ms": 375.0}},
        )
        _, outs[bs] = chain.process_array(state, chain.targets(tmap), x)
    assert err_dbfs(outs[256], outs[2048]) <= -80, err_dbfs(outs[256], outs[2048])


def test_streaming_equals_file_mode():
    """Block-by-block jitted stepping == one scanned dispatch."""
    x = noise(16 * N, amp=0.25)
    chain, state, tmap = build_chain(FIVE_FX, FS, N, channels_in=2)
    targets = chain.targets(tmap)
    _, ref = chain.process_array(state, targets, x)

    state2 = chain.init_state(
        {c["effect_id"]: c["params"] for c in FIVE_FX}
    )
    step = chain.step()
    outs = []
    for i in range(16):
        xb = jnp.asarray(x[i * N : (i + 1) * N].T)
        state2, y = step(state2, targets, xb)
        outs.append(np.asarray(y).T)
    got = np.concatenate(outs)
    assert err_dbfs(got, ref) <= -100, err_dbfs(got, ref)


def test_smooth_step_matches_reference_semantics():
    spec = ParamSpec(0.0, 0.0, 1.0, smooth="step", step=0.02)
    oracle = OracleSmooth(0.1, 0.0, 1.0)
    oracle.set_target(0.9)
    cur = jnp.float32(0.1)
    for _ in range(50):
        ref = oracle.step(0.02)
        cur = smooth_step(cur, jnp.float32(0.9), spec.max_step(FS, cur))
        assert abs(float(cur) - ref) < 1e-6


def test_param_update_no_recompile_and_glide():
    """Targets are runtime args: changing them must not retrace, and the
    current value must glide (update_param path, engine.py:131-145)."""
    cfg = [{"effect_id": "d", "type": "delay",
            "params": {"delay_ms": 300, "feedback": 0.1, "mix_dry": 1.0,
                       "mix_wet": 1.0, "offset_ms": 0}}]
    chain, state, tmap = build_chain(cfg, FS, N, channels_in=2)
    step = chain.step()
    x = jnp.zeros((2, N), jnp.float32)

    t1 = chain.targets(tmap)
    state, _ = step(state, t1, x)
    compiles_before = step._cache_size()

    tmap["d"]["feedback"] = 0.9
    t2 = chain.targets(tmap)
    for _ in range(10):
        state, _ = step(state, t2, x)
    assert step._cache_size() == compiles_before  # no retrace

    fb_cur = float(state["params"][0]["feedback"])
    # 10 blocks * 0.02/block from 0.1 toward 0.9
    assert abs(fb_cur - (0.1 + 10 * 0.02)) < 1e-5


def test_unknown_effect_type_skipped():
    chain, state, tmap = build_chain(
        [{"effect_id": "z", "type": "nope", "params": {}}], FS, N)
    assert len(chain.effects) == 0
    x = noise(2 * N, channels=1)
    _, y = chain.process_array(state, chain.targets(tmap), x)
    assert np.allclose(y[:, 0], x[:, 0])  # passthrough fan-out


def test_registry_config_ui_consistency():
    """Every registered effect type is reachable from the product: it has
    EFFECT_DEFAULTS and UI_CONTROLS entries, every UI control maps to a
    live ParamSpec or a declared static, defaults are in-spec, and every
    factory preset builds against the registry."""
    from aefs_tpu.core.config import (
        DEFAULT_PRESETS, EFFECT_DEFAULTS, STATIC_UI_PARAMS, UI_CONTROLS,
    )
    from aefs_tpu.models import EFFECT_REGISTRY

    for etype, cls in EFFECT_REGISTRY.items():
        if etype == "parallel":  # container: configured per-branch
            continue
        assert etype in EFFECT_DEFAULTS, etype
        assert etype in UI_CONTROLS, etype
        statics = set(STATIC_UI_PARAMS.get(etype, []))
        for name, _label, lo, hi, _step in UI_CONTROLS[etype]:
            if name in statics:
                continue
            spec = cls.PARAMS.get(name)
            assert spec is not None, (etype, name)
            assert spec.lo <= lo <= hi <= spec.hi, (etype, name)
        for name, dflt in EFFECT_DEFAULTS[etype].items():
            if name in statics:
                continue
            spec = cls.PARAMS.get(name)
            assert spec is not None, (etype, name)
            assert spec.lo <= dflt <= spec.hi, (etype, name)

    for pname, cfgs in DEFAULT_PRESETS.items():
        for cfg in cfgs:
            assert cfg["type"] in EFFECT_REGISTRY, (pname, cfg["type"])
            chain, state, tmap = build_chain(
                [cfg], FS, N, channels_in=1)
            assert len(chain.effects) == 1, (pname, cfg["effect_id"])
