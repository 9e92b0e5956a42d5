"""Batched offline rendering (engine.render_batch): one vmapped dispatch
over many files must match per-file processing, including when the batch
axis is sharded over the virtual device mesh."""

import numpy as np
import pytest

from aefs_tpu.engine.engine import process_offline, render_batch
from tests.helpers import noise, tones, bursts

FS = 48000

CHAIN = [
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


def _files():
    # Different lengths exercise the common-pad + per-file trim path.
    return [
        noise(30000, channels=1, seed=1),
        tones(52000, channels=2),
        bursts(41000, channels=1, seed=4),
    ]


def test_batch_matches_per_file():
    files = _files()
    outs = render_batch(CHAIN, files, FS)
    assert [o.shape for o in outs] == [(30000, 2), (52000, 2), (41000, 2)]
    for i, (f, got) in enumerate(zip(files, outs)):
        _, ref = process_offline(CHAIN, f, FS)
        # The batch pads every file to the longest; the effects are causal
        # so the un-padded prefix matches up to scan-reassociation noise.
        err = np.abs(got - ref).max()
        assert err < 1e-5, f"file {i}: max diff {err}"


def test_batch_sharded_matches_unsharded():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    files = [noise(24000, channels=1, seed=s) for s in range(8)]
    plain = render_batch(CHAIN, files, FS, shard=False)
    sharded = render_batch(CHAIN, files, FS, shard=True)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_batch_shards_any_file_count():
    """A file count that doesn't divide the device count shards anyway:
    the batch is padded with silent entries (outputs dropped) and matches
    the unsharded render."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    files = [noise(8000, channels=1, seed=s) for s in range(3)]  # 3 % 8 != 0
    outs = render_batch(CHAIN, files, FS, shard=True)
    ref = render_batch(CHAIN, files, FS, shard=False)
    assert len(outs) == 3
    for o, r in zip(outs, ref):
        assert o.shape == r.shape
        assert np.max(np.abs(o - r)) < 1e-6
