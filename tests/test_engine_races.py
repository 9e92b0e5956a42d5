"""Engine concurrency regressions: the audio path, control plane, and
checkpointing race each other by design (reference engine.py:131-145's
lock-free param routing, backend.py's executor dispatch).  These tests
hammer the exact interleavings that broke in review:

- ``update_param`` must survive a concurrent ``build_chain`` to a
  DIFFERENT topology (it used to pack the old chain's targets with the
  new chain's packer — treedef mismatch dropped the update).
- ``save_session`` must not read state buffers the audio step's donated
  dispatch has already invalidated (the dispatch-lock contract).
"""

import tempfile
import threading

import numpy as np
import pytest

from aefs_tpu.engine.engine import AudioEngine

CHAIN_A = [
    {"effect_id": "d1", "type": "delay",
     "params": {"feedback": 0.2, "delay_ms": 375, "mix_dry": 1,
                "mix_wet": 1, "offset_ms": 0}},
]
CHAIN_B = CHAIN_A + [
    {"effect_id": "g1", "type": "gate", "params": {"threshold_db": -45}},
]


@pytest.fixture(scope="module")
def engine():
    eng = AudioEngine()
    eng.build_chain(CHAIN_A)
    return eng


def _block(seed=0):
    rng = np.random.default_rng(seed)
    return (0.25 * rng.standard_normal((256, 1))).astype(np.float32)


def test_update_param_survives_concurrent_rebuild(engine):
    errs = []

    def builder():
        try:
            for _ in range(4):
                engine.build_chain(CHAIN_A)
                engine.build_chain(CHAIN_B)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t = threading.Thread(target=builder)
    t.start()
    try:
        for _ in range(40):
            # Must never raise, even while the chain topology flips.
            engine.update_param("d1", "feedback", 0.35)
    finally:
        t.join()
    assert not errs, errs
    # Either the update won the race or a later rebuild legitimately
    # reset the target to the config seed (reference rebuild semantics) —
    # never anything else, and never an exception.
    assert engine._targets_map["d1"]["feedback"] in (
        pytest.approx(0.35), pytest.approx(0.2)
    )
    # An update issued with the topology settled must stick.
    engine.update_param("d1", "feedback", 0.4)
    assert engine._targets_map["d1"]["feedback"] == pytest.approx(0.4)


@pytest.mark.parametrize("path", ["sync", "pipelined"])
def test_save_session_while_streaming(engine, path):
    """Both stream paths donate the packed state on dispatch; the
    publish-before-release contract means save_session can never unpack
    donated groups.  The SYNC path's vulnerable window used to span the
    whole np.asarray readback (~the entire block period) — hammer it hard
    enough that the old ordering reliably threw 'Array has been
    deleted'."""
    engine.build_chain(CHAIN_A)
    step = (
        engine.process_stream_block
        if path == "sync"
        else engine.process_stream_block_pipelined
    )
    stop = threading.Event()
    errs = []
    blk = _block()

    def audio():
        try:
            while not stop.is_set():
                step(blk)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t = threading.Thread(target=audio)
    t.start()
    d = tempfile.mkdtemp()
    try:
        for i in range(12):
            engine.save_session(f"{d}/ck{i}")
    finally:
        stop.set()
        t.join()
    assert not errs, errs

    # The last checkpoint resumes into a working engine.
    eng2 = AudioEngine()
    cfg = eng2.resume_session(f"{d}/ck11")
    assert [c["effect_id"] for c in cfg] == ["d1"]


def test_save_session_while_streaming_resume_exact():
    eng = AudioEngine()
    eng.build_chain(CHAIN_A)
    blk = _block(3)
    for _ in range(3):
        eng.process_stream_block(blk)
    d = tempfile.mkdtemp()
    path = eng.save_session(d + "/ck")
    eng2 = AudioEngine()
    eng2.resume_session(path)
    o1 = eng.process_stream_block(blk)
    o2 = eng2.process_stream_block(blk)
    np.testing.assert_array_equal(o1, o2)
