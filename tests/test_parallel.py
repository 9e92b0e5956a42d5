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


def test_sharded_convreverb_matches_single_stream():
    """ConvReverb's frequency-domain delay line shards its IR-partition
    axis over 'model' (parallel/mesh.py spec_hist rule + the k==1
    gather-free conv path): the sharded result must match an unsharded
    single-stream run.  The partition sum reassociates across devices,
    so the bar is float32 rounding (-100), not bitwise."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, model_parallel=2)
    cfgs = [
        {"effect_id": "c", "type": "convreverb",
         "params": {"mix_dry": 0.7, "mix_wet": 0.4},
         "ir_seconds": 0.4, "partition_multiple": 2},
    ]
    chain, state0, tmap = build_chain(cfgs, FS, 512, channels_in=1)
    targets = chain.targets(tmap)
    init_cfg = {c["effect_id"]: c["params"] for c in cfgs}

    n_streams = 8
    runner = ShardedStreams(chain, mesh, n_streams)
    state, shardings = runner.init_state(init_cfg)
    # The rule actually fired: spec_hist is partition-sharded over model.
    hist_spec = None
    for path, s in jax.tree_util.tree_leaves_with_path(shardings):
        if any(getattr(k, "key", None) == "spec_hist" for k in path):
            hist_spec = s.spec
    assert hist_spec is not None and "model" in hist_spec, hist_spec

    rng = np.random.default_rng(11)
    xs = (0.2 * rng.standard_normal((n_streams, 1, 512))).astype(np.float32)
    state, y, peak = runner.run_block(state, targets, xs)
    state, y2, _ = runner.run_block(state, targets, xs)
    y, y2 = np.asarray(y), np.asarray(y2)
    assert np.isfinite(peak)

    sstate = chain.init_state(init_cfg)
    step = chain.step()
    sstate, r1 = step(sstate, targets, jnp.asarray(xs[5]))
    sstate, r2 = step(sstate, targets, jnp.asarray(xs[5]))
    assert err_dbfs(y[5], np.asarray(r1)) <= -100
    assert err_dbfs(y2[5], np.asarray(r2)) <= -100


def test_sharded_per_stream_targets():
    """Divergent live params across the mesh: each stream gets its own
    targets pytree (leading S axis sharded over 'data') and must match
    an unsharded single-stream run with the same targets."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, model_parallel=2)
    cfgs, (chain, state0, tmap) = _chain()
    init_cfg = {c["effect_id"]: c["params"] for c in cfgs}

    n_streams = 8
    runner = ShardedStreams(chain, mesh, n_streams)
    state, _ = runner.init_state(init_cfg)
    maps = []
    for s in range(n_streams):
        m = {k: dict(v) for k, v in init_cfg.items()}
        m["f"]["cutoff_hz"] = 500.0 + 400.0 * s
        m["d"]["feedback"] = 0.1 + 0.05 * s
        maps.append(m)
    targets_b = runner.batch_targets(maps)

    rng = np.random.default_rng(7)
    xs = (0.2 * rng.standard_normal((n_streams, 1, 512))).astype(np.float32)
    state, y, peak = runner.run_block(state, targets_b, xs,
                                      per_stream_targets=True)
    y = np.asarray(y)
    assert np.isfinite(peak)

    for s in (0, 6):
        sstate = chain.init_state(init_cfg)
        step = chain.step()
        _, r = step(sstate, chain.targets(maps[s]), jnp.asarray(xs[s]))
        assert err_dbfs(y[s], np.asarray(r)) <= -120, s


def test_dft_matmul_matches_fft():
    """The AEFS_FFT_VIA_MATMUL fallback (XLA CPU sharded-layout bug
    workaround, ops/fftops.py) must agree with jnp.fft to f32 matmul
    accuracy for both transforms."""
    from aefs_tpu.ops.fftops import rfft_last, irfft_last

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((5, 1024)), jnp.float32)
    ref_spec = jnp.fft.rfft(x, axis=-1)
    ref_time = jnp.fft.irfft(ref_spec, axis=-1)
    import os

    os.environ["AEFS_FFT_VIA_MATMUL"] = "1"
    try:
        got_spec = rfft_last(x)
        got_time = irfft_last(ref_spec)
    finally:
        os.environ.pop("AEFS_FFT_VIA_MATMUL")
    # Spectrum error relative to the spectrum's own scale (bins carry
    # magnitudes ~sqrt(N); dBFS-vs-1.0 would overstate the error).
    scale = float(np.max(np.abs(np.asarray(ref_spec))))
    spec_err = float(np.max(np.abs(np.asarray(got_spec - ref_spec)))) / scale
    assert 20 * np.log10(spec_err) <= -100, spec_err
    # unit-variance noise peaks ~4x fullscale; -110 dBFS here is ~2e-6
    # relative — the chain-level acceptance bars sit at -100.
    assert err_dbfs(np.asarray(got_time), np.asarray(ref_time)) <= -110


def test_sharded_spectral_plus_convreverb(monkeypatch):
    """The spectral filter and a model-sharded conv reverb in ONE program:
    trips XLA CPU's fft layout RET_CHECK without the matmul-DFT fallback
    (ops/fftops.py comment); with it, sharded must match unsharded."""
    assert len(jax.devices()) >= 8
    monkeypatch.setenv("AEFS_FFT_VIA_MATMUL", "1")
    mesh = make_mesh(8, model_parallel=2)
    cfgs = [
        {"effect_id": "s", "type": "spectral",
         "params": {"threshold_db": -50, "reduction": 0.3}},
        {"effect_id": "c", "type": "convreverb",
         "params": {"mix_dry": 0.7, "mix_wet": 0.4},
         "ir_seconds": 0.4, "partition_multiple": 2},
    ]
    chain, _, tmap = build_chain(cfgs, FS, 512, channels_in=1)
    targets = chain.targets(tmap)
    init_cfg = {c["effect_id"]: c["params"] for c in cfgs}

    runner = ShardedStreams(chain, mesh, 8)
    state, _ = runner.init_state(init_cfg)
    rng = np.random.default_rng(13)
    xs = (0.2 * rng.standard_normal((8, 1, 512))).astype(np.float32)
    state, y, peak = runner.run_block(state, targets, xs)
    y = np.asarray(y)
    assert np.isfinite(peak)

    sstate = chain.init_state(init_cfg)
    _, r = chain.step()(sstate, targets, jnp.asarray(xs[2]))
    assert err_dbfs(y[2], np.asarray(r)) <= -100


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
