"""Checkpoint/resume: a resumed session continues bit-exactly."""

import numpy as np
import jax.numpy as jnp

from aefs_tpu.core.chain import build_chain
from aefs_tpu.engine.checkpoint import save_session, load_session

from helpers import noise
from oracles import err_dbfs

FS = 48000
CFGS = [
    {"effect_id": "d", "type": "delay",
     "params": {"delay_ms": 200, "feedback": 0.5, "mix_dry": 1.0,
                "mix_wet": 0.8, "offset_ms": 10}},
    {"effect_id": "r", "type": "reverb",
     "params": {"rt60_s": 1.5, "damp": 0.3, "pre_delay_ms": 5,
                "mix_dry": 0.7, "mix_wet": 0.5}},
]


def test_save_load_resume_bit_exact(tmp_path):
    chain, state, tmap = build_chain(CFGS, FS, 256, channels_in=2)
    targets = chain.targets(tmap)
    step = chain.step()
    x = noise(40 * 256, amp=0.3)

    # Run 20 blocks, checkpoint, run 20 more (reference trajectory).
    for i in range(20):
        state, _ = step(state, targets, jnp.asarray(x[i * 256:(i + 1) * 256].T))
    save_session(str(tmp_path / "ckpt"), CFGS, tmap, state)
    ref_out = []
    for i in range(20, 40):
        state, y = step(state, targets, jnp.asarray(x[i * 256:(i + 1) * 256].T))
        ref_out.append(np.asarray(y))

    # Resume in a "new process": rebuild chain from the checkpoint.
    cfgs2, tmap2, rebuild = load_session(str(tmp_path / "ckpt"))
    assert cfgs2 == CFGS
    chain2, template, _ = build_chain(cfgs2, FS, 256, channels_in=2)
    state2 = rebuild(template)
    targets2 = chain2.targets(tmap2)
    step2 = chain2.step()
    for i in range(20, 40):
        state2, y = step2(state2, targets2, jnp.asarray(x[i * 256:(i + 1) * 256].T))
        assert err_dbfs(np.asarray(y), ref_out[i - 20]) <= -150


def test_leaf_mismatch_raises(tmp_path):
    chain, state, tmap = build_chain(CFGS, FS, 256, channels_in=2)
    save_session(str(tmp_path / "ckpt"), CFGS, tmap, state)
    _, _, rebuild = load_session(str(tmp_path / "ckpt"))
    other_chain, other_state, _ = build_chain(CFGS[:1], FS, 256, channels_in=2)
    import pytest

    with pytest.raises(ValueError):
        rebuild(other_state)
