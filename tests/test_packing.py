"""Packed-dispatch parity: the per-dtype packed step must be bit-identical
to the plain pytree step (core/packing.py exists purely to cut dispatch
argument marshaling — it must not change a single sample)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aefs_tpu.core.chain import build_chain
from aefs_tpu.core.packing import Packer, PackedRunner

FS = 48000

FLAGSHIP = [
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


def test_packer_roundtrip_mixed_dtypes():
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": jnp.int32(7),
        "c": (jnp.float32(1.5), jnp.ones((4,), jnp.float32)),
    }
    p = Packer(tree)
    groups = p.pack(tree)
    assert len(groups) == 2  # f32 + i32
    out = p.unpack(groups)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        assert a.dtype == b.dtype
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_step_matches_plain_step():
    chain, state, tmap = build_chain(FLAGSHIP, FS, 256, channels_in=1)
    targets = chain.targets(tmap)
    runner = chain.packed_step()
    sg = runner.pack_state(chain.init_state())
    tg = runner.pack_targets(targets)

    step = jax.jit(chain.process_block)
    rng = np.random.default_rng(11)
    for i in range(6):
        x = jnp.asarray(0.3 * rng.standard_normal((1, 256)), jnp.float32)
        state, y_ref = step(state, targets, x)
        sg, y_pk = runner(sg, tg, x)
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_pk),
                                      err_msg=f"block {i}")
    # state continues identically too
    for a, b in zip(jax.tree.leaves(state),
                    jax.tree.leaves(runner.unpack_state(sg))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_batched_step_matches_vmap():
    S = 3
    chain, _, tmap = build_chain(FLAGSHIP, FS, 256, channels_in=1)
    targets = chain.targets(tmap)
    one = chain.init_state()
    batched = jax.tree.map(
        lambda l: jnp.broadcast_to(l[None], (S,) + l.shape).copy(), one
    )

    def batched_fn(st, tg, x):
        return jax.vmap(chain.process_block, in_axes=(0, None, 0))(st, tg, x)

    runner = PackedRunner(batched_fn, batched, targets)
    sg = runner.pack_state(batched)
    tg = runner.pack_targets(targets)

    ref_step = jax.jit(batched_fn)
    st = batched
    rng = np.random.default_rng(5)
    for _ in range(4):
        x = jnp.asarray(0.2 * rng.standard_normal((S, 1, 256)), jnp.float32)
        st, y_ref = ref_step(st, targets, x)
        sg, y_pk = runner(sg, tg, x)
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_pk))


def test_packed_fast_file_matches_plain():
    from aefs_tpu.core.fileopts import file_static_overrides

    chain, state, tmap = build_chain(
        FLAGSHIP, FS, 4096, channels_in=1,
        static_overrides=file_static_overrides(FLAGSHIP),
    )
    targets = chain.targets(tmap)
    x = jnp.asarray(
        0.25 * np.random.default_rng(2).standard_normal((1, 8192)), jnp.float32
    )
    _, y_ref = jax.jit(chain.process_whole)(chain.init_state(), targets, x)

    runner = chain.packed_fast_file_fn()
    sg = runner.pack_state(chain.init_state())
    _, y_pk = runner(sg, runner.pack_targets(targets), x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_pk))
