"""Parameter-glide parity: effects with *moving* targets vs oracles that
replay the reference's per-block SmoothParam stepping (core.py:72-77 with
the per-effect steps from delay.py:78-83 / filter.py:102-104).

This exercises the path the constant-param parity tests can't: coefficient
recomputation per block while the recurrence state carries across the
change (the no-zipper-noise property)."""

import numpy as np

from aefs_tpu.core.chain import build_chain

from helpers import noise, tones
from oracles import OracleSmooth, OracleStereoDelay, OracleBiquad, err_dbfs

FS = 48000
N = 256


def test_delay_feedback_glide_matches_oracle():
    x = noise(60 * N, amp=0.25)
    start = {"delay_ms": 300.0, "feedback": 0.1, "mix_dry": 1.0,
             "mix_wet": 1.0, "offset_ms": 0.0}
    cfg = [{"effect_id": "d", "type": "delay", "params": dict(start)}]
    chain, state, tmap = build_chain(cfg, FS, N, channels_in=2)
    step = chain.step()

    oracle = OracleStereoDelay(FS, **start)
    fb = OracleSmooth(0.1, 0.0, 0.95)
    dl = OracleSmooth(300.0, 1.0, 1499.0)

    # Retarget mid-stream (the update_param path).
    import jax.numpy as jnp

    outs = []
    refs = []
    for i in range(60):
        if i == 10:
            tmap["d"]["feedback"] = 0.8
            fb.set_target(0.8)
        if i == 30:
            tmap["d"]["delay_ms"] = 80.0
            dl.set_target(80.0)
        targets = chain.targets(tmap)
        state, y = step(state, targets, jnp.asarray(x[i * N:(i + 1) * N].T))
        outs.append(np.asarray(y).T)

        # Oracle block: step params exactly like the reference effect
        # (delay.py:82-83).  The implementation truncates fs*d/1000 in
        # float32; near integer boundaries that can differ by one sample
        # from the float64 oracle — feed the oracle a delay_ms that lands
        # on the implementation's integer so the test measures the glide
        # machinery, not truncation-boundary luck.
        dl.step(1000.0 * 2.0 / FS)
        cur = np.float32(dl.current)
        d_impl = int(np.float32(np.float32(FS) * cur / np.float32(1000.0)))
        oracle.p["delay_ms"] = (d_impl + 0.5) * 1000.0 / FS
        oracle.p["feedback"] = fb.step(0.02)
        refs.append(oracle.process(x[i * N:(i + 1) * N].astype(np.float64)))

    got = np.concatenate(outs)
    ref = np.concatenate(refs)
    assert err_dbfs(got, ref) <= -80, err_dbfs(got, ref)


def test_filter_cutoff_glide_matches_oracle():
    # Multiplicative 10%/block glide steps compound float32 parameter
    # rounding against the float64 oracle trajectory; measured floor is
    # ~ -79 dBFS, so the bar here is -75 (constant-param parity holds the
    # -80 bar in test_effects_parity).
    x = tones(40 * N, fs=FS)
    start = {"filter_type": 0, "cutoff_hz": 4000.0, "q": 0.707}
    cfg = [{"effect_id": "f", "type": "filter", "params": dict(start)}]
    chain, state, tmap = build_chain(cfg, FS, N, channels_in=2)
    step = chain.step()

    oracle = OracleBiquad(FS, **start)
    fc = OracleSmooth(4000.0, 20.0, 20000.0)

    import jax.numpy as jnp

    outs, refs = [], []
    for i in range(40):
        if i == 5:
            tmap["f"]["cutoff_hz"] = 400.0
            fc.set_target(400.0)
        targets = chain.targets(tmap)
        state, y = step(state, targets, jnp.asarray(x[i * N:(i + 1) * N].T))
        outs.append(np.asarray(y).T)

        # Multiplicative 10%/block glide (filter.py:103).
        oracle.p["cutoff_hz"] = fc.step(fc.current * 0.1)
        refs.append(oracle.process(x[i * N:(i + 1) * N].astype(np.float64)))

    got = np.concatenate(outs)
    ref = np.concatenate(refs)
    assert err_dbfs(got, ref) <= -75, err_dbfs(got, ref)
