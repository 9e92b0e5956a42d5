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


def test_randomized_concurrency_hammer():
    """Seeded multi-threaded monkey: four threads race the full control
    surface (param storms, topology rebuilds, session save/resume,
    reprocess-style file jobs) against a continuously streaming audio
    thread for a fixed op budget.  Any exception, non-finite audio, or a
    wedged thread fails; this generalizes the targeted interleavings
    above to arbitrary schedules (run under gc.disable like the server)."""
    import asyncio
    import base64
    import gc
    import tempfile

    from aefs_tpu.engine.wavio import encode_wav_int16

    rng = np.random.default_rng(1234)
    errors = []
    stop = threading.Event()

    was_enabled = gc.isenabled()
    gc.disable()
    try:
        eng = AudioEngine()
        eng.build_chain(CHAIN_A)
        tmp = tempfile.mkdtemp(prefix="aefs_hammer_")
        wav = encode_wav_int16(
            (0.2 * np.random.default_rng(0).standard_normal((2048, 1))
             ).astype(np.float32), 48000)
        url = "data:audio/wav;base64," + base64.b64encode(wav).decode()

        class NullWS:
            async def send(self, m):
                pass

        def audio_thread():
            x = 0.1 * rng.standard_normal((256, 1)).astype(np.float32)
            try:
                while not stop.is_set():
                    out = eng.process_stream_block(x)
                    if not np.all(np.isfinite(out)):
                        errors.append("non-finite audio")
                        return
            except Exception as e:  # pragma: no cover
                errors.append(f"audio: {type(e).__name__}: {e}")

        def control_thread(seed):
            r = np.random.default_rng(seed)
            try:
                for _ in range(40):
                    op = r.integers(0, 12)
                    if op == 10:
                        # live file stream: a SECOND concurrent caller of
                        # process_stream_block (the read-inside-dispatch
                        # contract keeps double-donation impossible)
                        eng.start_file_stream(url, realtime=False)
                    elif op == 11:
                        eng.stop_stream()
                    elif op <= 4:
                        eng.update_param(
                            str(r.choice(["d1", "g1", "zz"])),
                            str(r.choice(["feedback", "delay_ms",
                                          "threshold_db", "bogus"])),
                            float(r.uniform(-100, 2000)))
                    elif op <= 6:
                        eng.build_chain(CHAIN_A if r.random() < 0.5 else CHAIN_B)
                    elif op == 7:
                        eng.save_session(f"{tmp}/s{seed}")
                    elif op == 8:
                        try:
                            eng.resume_session(f"{tmp}/s{seed}")
                        except FileNotFoundError:
                            pass
                    else:
                        asyncio.run(eng.process_wav_file(url, NullWS()))
            except Exception as e:  # pragma: no cover
                errors.append(f"ctl{seed}: {type(e).__name__}: {e}")

        at = threading.Thread(target=audio_thread, daemon=True)
        cts = [threading.Thread(target=control_thread, args=(s,), daemon=True)
               for s in (1, 2, 3)]
        at.start()
        for t in cts:
            t.start()
        for t in cts:
            t.join(timeout=300)
            assert not t.is_alive(), "control thread wedged"
        stop.set()
        at.join(timeout=60)
        assert not at.is_alive(), "audio thread wedged"
        assert not errors, errors
        # still fully functional afterwards
        out = eng.process_stream_block(
            0.1 * rng.standard_normal((256, 1)).astype(np.float32))
        assert out.shape == (256, 2) and np.all(np.isfinite(out))
        eng.close()
    finally:
        if was_enabled:
            gc.enable()


def test_stop_during_file_stream_start(monkeypatch):
    """``stop_stream`` racing ``start_file_stream``'s thread creation.

    The file thread used to be published on ``self._file_thread`` BEFORE
    ``.start()``; a concurrent ``stop_stream`` landing in that two-line
    window joined a not-yet-started thread -> ``RuntimeError: cannot
    join thread before it is started`` (caught live by the randomized
    hammer).  The fix publishes only started threads, so a stop in the
    window sees the previous value and the start wins — same loose
    stop-vs-start semantics as the pre-create window.  This test holds
    the engine INSIDE ``Thread.start`` with a gate and fires
    ``stop_stream`` from the main thread while it's held.
    """
    import base64

    import aefs_tpu.engine.engine as E
    from aefs_tpu.engine.wavio import encode_wav_int16

    eng = AudioEngine()
    eng.build_chain(CHAIN_A)
    wav = encode_wav_int16(
        (0.2 * np.random.default_rng(0).standard_normal((1024, 1))
         ).astype(np.float32), 48000)
    url = "data:audio/wav;base64," + base64.b64encode(wav).decode()

    real_thread = threading.Thread
    in_start = threading.Event()   # the engine reached Thread.start
    gate = threading.Event()       # the test releases the start

    class GatedThread(real_thread):
        def start(self):
            in_start.set()
            gate.wait(timeout=30)
            real_thread.start(self)

    errs = []

    def starter():
        try:
            assert eng.start_file_stream(url, realtime=False)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    monkeypatch.setattr(E.threading, "Thread", GatedThread)
    try:
        w = real_thread(target=starter, daemon=True)
        w.start()
        assert in_start.wait(timeout=30), "engine never reached start()"
        # The window is open: the thread object exists but is unstarted.
        eng.stop_stream()  # used to raise RuntimeError here
    finally:
        gate.set()
        monkeypatch.undo()
    w.join(timeout=30)
    assert not w.is_alive() and not errs, errs
    # Drain to the terminator: the stream plays out (start won the race).
    seen = 0
    while True:
        item = eng.playback_queue.get(timeout=30)
        if item is None:
            break
        seen += 1
    assert seen == 1024 // 256
    eng.stop_stream()
    out = eng.process_stream_block(_block())
    assert out.shape == (256, 2) and np.all(np.isfinite(out))
    eng.close()
