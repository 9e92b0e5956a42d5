"""Native runtime library: correctness vs Python equivalents + perf sanity."""

import base64
import json
import threading
import time

import numpy as np
import pytest

from aefs_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build the native lib"
)

RNG = np.random.default_rng(9)


def test_json_f32_array_parses_and_matches():
    arr = RNG.standard_normal(5000).astype(np.float32) * 0.5
    arr[10] = np.nan
    text = native.json_f32_array(arr)
    parsed = np.asarray(json.loads(text), np.float64)
    assert parsed.shape == arr.shape
    assert parsed[10] == 0.0  # NaN scrubbed
    ok = np.isfinite(arr)
    assert np.max(np.abs(parsed[ok] - arr[ok].astype(np.float64))) < 1e-4


def test_json_f32_array_empty():
    """n=0 still writes '[' ']' NUL — 3 bytes; the buffer must cover it
    (was a 1-byte heap overflow with the n*16+2 sizing)."""
    assert native.json_f32_array(np.zeros(0, np.float32)) == "[]"
    assert json.loads(native.json_f32_array(np.zeros(0, np.float32))) == []


def test_interleave_matches_transpose():
    planes = RNG.standard_normal((2, 777)).astype(np.float32)
    out = native.interleave(planes)
    assert out.shape == (777, 2)
    np.testing.assert_array_equal(out, planes.T)
    with pytest.raises(ValueError):
        native.interleave(np.zeros(5, np.float32))


def test_spsc_ring_rejects_bad_sizes():
    """capacity<=0 would divide by zero inside ring_push (SIGFPE, hard
    process crash); the constructor must reject it cleanly instead."""
    with pytest.raises(ValueError):
        native.SpscRing(512, 0)
    with pytest.raises(ValueError):
        native.SpscRing(0, 4)
    with pytest.raises((ValueError, MemoryError)):
        native.SpscRing(2**40, 2**40)  # size overflow


def test_json_speed_beats_stdlib():
    arr = RNG.standard_normal(200_000).astype(np.float32)
    t0 = time.perf_counter()
    native.json_f32_array(arr)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    json.dumps(arr.tolist())
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)


def test_pcm_round_trip():
    arr = RNG.uniform(-1.2, 1.2, 10000).astype(np.float32)
    i16 = native.f32_to_i16(arr)
    ref = (np.clip(arr, -1, 1) * 32767.0).astype(np.int16)
    assert np.array_equal(i16, ref)
    back = native.i16_to_f32(i16)
    assert np.max(np.abs(back - i16.astype(np.float32) / 32768.0)) == 0


def test_base64_round_trip():
    for n in (0, 1, 2, 3, 4, 1000, 65537):
        data = RNG.integers(0, 256, n, dtype=np.uint8).tobytes()
        enc = native.b64encode(data)
        assert enc == base64.b64encode(data), n
        assert native.b64decode(enc) == data


def test_spsc_ring_threaded():
    ring = native.SpscRing(block_floats=512, capacity=64)
    # Tag each block with its index so FIFO order is checkable.
    blocks = RNG.standard_normal((500, 512)).astype(np.float32)
    blocks[:, 0] = np.arange(500)
    got = []
    done = threading.Event()

    def consumer():
        while not (done.is_set() and len(ring) == 0):
            out = ring.pop(16)
            got.extend(np.asarray(out))
            if not len(out):
                time.sleep(0.0002)

    t = threading.Thread(target=consumer, daemon=True)
    t.start()
    pushed = 0
    for b in blocks:
        pushed += ring.push(b)
        time.sleep(0.00005)
    done.set()
    t.join(timeout=10)
    assert pushed + ring.dropped == 500
    assert len(got) == pushed
    ids = [int(b[0]) for b in got]
    assert ids == sorted(ids)  # strict FIFO order of delivered blocks
    for b in got[:10]:
        assert np.array_equal(b, blocks[int(b[0])])


def test_ring_drop_on_full():
    ring = native.SpscRing(block_floats=4, capacity=2)
    b = np.zeros(4, np.float32)
    assert ring.push(b) and ring.push(b)
    assert not ring.push(b)  # full -> dropped, not blocked
    assert ring.dropped == 1
    assert len(ring) == 2


def test_block_queue_feeds_engine_plot_taps():
    """BlockQueue (SpscRing facade) as the engine's plot-tap channel: the
    production wiring in server/backend.py (audio thread produces, sender
    thread consumes, ragged blocks drop instead of corrupting the ring)."""
    import queue

    from aefs_tpu.core.config import BLOCKSIZE, CHANNELS_OUT
    from aefs_tpu.engine.engine import AudioEngine

    qs = {
        "input": native.BlockQueue((BLOCKSIZE, CHANNELS_OUT), 8),
        "output": native.BlockQueue((BLOCKSIZE, CHANNELS_OUT), 8),
    }
    eng = AudioEngine(qs)
    eng.build_chain([])
    rng = np.random.default_rng(0)
    for _ in range(3):
        eng.process_stream_block(
            rng.standard_normal((BLOCKSIZE, 1)).astype(np.float32) * 0.2
        )
    assert qs["input"].qsize() == 3 and qs["output"].qsize() == 3
    a = qs["input"].get_nowait()
    b = qs["output"].get_nowait()
    assert a.shape == (BLOCKSIZE, CHANNELS_OUT) == b.shape
    # empty chain: output == fanned input
    assert np.allclose(a, b)

    # ragged block (different blocksize) drops cleanly
    import pytest as _pytest
    with _pytest.raises(queue.Full):
        qs["input"].put_nowait(np.zeros((BLOCKSIZE // 2, CHANNELS_OUT), np.float32))

    # overflow drops and counts
    for _ in range(20):
        try:
            qs["output"].put_nowait(np.zeros((BLOCKSIZE, CHANNELS_OUT), np.float32))
        except queue.Full:
            pass
    assert qs["output"].dropped > 0
