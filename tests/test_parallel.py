"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from aefs_tpu.core.chain import build_chain
from aefs_tpu.parallel.mesh import make_mesh, ShardedStreams

from helpers import noise
from oracles import err_dbfs

FS = 48000


def _chain(blocksize=512):
    cfgs = [
        {"effect_id": "f", "type": "filter",
         "params": {"filter_type": 0, "cutoff_hz": 2000, "q": 0.707}},
        {"effect_id": "d", "type": "delay",
         "params": {"delay_ms": 375, "feedback": 0.3, "mix_dry": 1.0,
                    "mix_wet": 0.8, "offset_ms": 5}},
        {"effect_id": "r", "type": "reverb",
         "params": {"rt60_s": 1.5, "damp": 0.3, "pre_delay_ms": 10,
                    "mix_dry": 0.7, "mix_wet": 0.5}},
    ]
    return cfgs, build_chain(cfgs, FS, blocksize, channels_in=1)


def test_sharded_streams_match_single_stream():
    """8 sharded streams over a (4 data, 2 model) mesh must produce exactly
    what 8 independent single-stream chains produce."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, model_parallel=2)
    cfgs, (chain, state0, tmap) = _chain()
    targets = chain.targets(tmap)

    n_streams = 8
    runner = ShardedStreams(chain, mesh, n_streams)
    init_cfg = {c["effect_id"]: c["params"] for c in cfgs}
    state, _ = runner.init_state(init_cfg)

    rng = np.random.default_rng(5)
    xs = (0.2 * rng.standard_normal((n_streams, 1, 512))).astype(np.float32)

    state, y, peak = runner.run_block(state, targets, xs)
    state, y2, peak2 = runner.run_block(state, targets, xs)
    y, y2 = np.asarray(y), np.asarray(y2)
    assert np.isfinite(peak) and float(peak) > 0

    # Single-stream reference for stream 3, two blocks.
    sstate = chain.init_state(init_cfg)
    step = chain.step()
    sstate, r1 = step(sstate, targets, jnp.asarray(xs[3]))
    sstate, r2 = step(sstate, targets, jnp.asarray(xs[3]))
    assert err_dbfs(y[3], np.asarray(r1)) <= -120
    assert err_dbfs(y2[3], np.asarray(r2)) <= -120


def test_mesh_factors():
    mesh = make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh1 = make_mesh(4, model_parallel=1)
    assert dict(mesh1.shape) == {"data": 4, "model": 1}


def test_graft_entry_and_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(8)


def test_nested_lockstep_axes_and_graft():
    """Ring-row counters nested inside parallel containers must map to
    vmap axis None (shared across pool slots) exactly like top-level
    ones — a per-slot nested row re-triggers the documented ~12x
    batched-index DUS lowering trap (models/base.py:map_state recursion;
    ops/ringbuf.py:rowring_write rationale).  graft_slot_state must
    likewise keep the nested shared counter while resetting the slot's
    audio buffers."""
    cfg = [{"effect_id": "p", "type": "parallel", "branches": [
        [{"effect_id": "d", "type": "delay", "params": {"delay_ms": 90}}],
        [{"effect_id": "g", "type": "gate", "params": {}}],
    ], "params": {}}]
    chain, single, tmap = build_chain(cfg, 48000, 256, channels_in=1)
    ax = chain.state_axes()["fx"][0]
    dly_ax = ax["branches"][0][0]
    assert dly_ax["row"] is None, dly_ax
    assert dly_ax["lines"] == 0, dly_ax

    batched = chain.batch_state(single, 4)
    bfx = batched["fx"][0]["branches"][0][0]
    assert bfx["row"].ndim == 0  # shared scalar, not (4,)
    assert bfx["lines"].shape[0] == 4

    # Graft keeps the shared counter, resets the slot's buffers.
    rows_before = np.asarray(bfx["row"])
    dirty = jax.tree.map(lambda x: x + 1.0, batched)
    grafted = chain.graft_slot_state(dirty, single, 2)
    gfx = grafted["fx"][0]["branches"][0][0]
    assert np.asarray(gfx["row"]) == rows_before + 1  # untouched by graft
    assert np.allclose(np.asarray(gfx["lines"][2]),
                       np.asarray(single["fx"][0]["branches"][0][0]["lines"]))
