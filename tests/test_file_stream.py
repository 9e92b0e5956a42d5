"""Live file streaming (reference wishlist todo:4 preferred design:
"MEJOR hacer streaming con el file para que el backend aplique los
efectos en vivo"): the uploaded file replaces the mic as the live block
source, so parameter changes apply audibly while it plays.

Engine level: the streamed output must be EXACTLY what the hot path
produces block-by-block (it IS the hot path — same process_stream_block),
trimmed to the file length.  Server level: the ``stream_file`` command
ships the processed audio as ``stream_audio`` messages ending in
``stream_audio_end``, and params update mid-stream without error.
"""

import asyncio
import base64
import json
import queue
import time

import numpy as np
import pytest

from aefs_tpu.engine.engine import AudioEngine
from aefs_tpu.engine.wavio import encode_wav_int16


def _data_url(x, fs=48000):
    wav = encode_wav_int16(x, fs)
    return "data:audio/wav;base64," + base64.b64encode(wav).decode()


def _drain(eng, timeout=120.0):
    """Collect (seq, block) pairs until the None sentinel."""
    blocks = []
    deadline = time.monotonic() + timeout
    while True:
        item = eng.playback_queue.get(timeout=max(0.1, deadline - time.monotonic()))
        if item is None:
            return blocks
        blocks.append(item)


def test_file_stream_empty_chain_exact_passthrough():
    """Empty chain: streamed output is the int16-quantized mono input
    fanned to two identical channels, sample-exact, trimmed to length."""
    rng = np.random.default_rng(0)
    n = 48000 // 2 + 100  # deliberately not a blocksize multiple
    x = (0.5 * rng.standard_normal((n, 1))).astype(np.float32)
    url = _data_url(x)

    eng = AudioEngine()
    eng.build_chain([])
    eng.start_file_stream(url, realtime=False)
    blocks = _drain(eng)
    assert not eng.is_running
    seqs = [s for s, _ in blocks]
    assert seqs == list(range(len(blocks)))
    y = np.concatenate([b for _, b in blocks])
    assert y.shape == (n, 2)
    # what the WAV codec actually delivered (int16 round trip)
    from aefs_tpu.engine.wavio import decode_wav

    decoded, _ = decode_wav(encode_wav_int16(x, 48000))
    np.testing.assert_array_equal(y[:, 0], decoded[:, 0])
    np.testing.assert_array_equal(y[:, 1], decoded[:, 0])
    eng.close()


def test_file_stream_matches_blockwise_hot_path():
    """With a real chain, the streamed result is bitwise the sequential
    process_stream_block output of a twin engine on the same blocks."""
    from aefs_tpu.core.config import BLOCKSIZE

    rng = np.random.default_rng(1)
    n = 8 * BLOCKSIZE
    x = (0.3 * rng.standard_normal((n, 1))).astype(np.float32)
    url = _data_url(x)
    cfg = [
        {"effect_id": "d1", "type": "delay",
         "params": {"delay_ms": 20, "feedback": 0.4,
                    "mix_dry": 1.0, "mix_wet": 0.8, "offset_ms": 0}},
    ]

    eng = AudioEngine()
    eng.build_chain(cfg)
    eng.start_file_stream(url, realtime=False)
    y = np.concatenate([b for _, b in _drain(eng)])
    eng.close()

    from aefs_tpu.engine.wavio import decode_wav

    decoded, _ = decode_wav(encode_wav_int16(x, 48000))
    twin = AudioEngine()
    twin.build_chain(cfg)
    ref = np.concatenate([
        twin.process_stream_block(decoded[i * BLOCKSIZE:(i + 1) * BLOCKSIZE])
        for i in range(n // BLOCKSIZE)
    ])
    twin.close()
    np.testing.assert_array_equal(y, ref)


def test_file_stream_stop_midway_and_renegotiation():
    """stop_stream() interrupts a paced stream promptly (sentinel lands,
    is_running drops); a 22050 Hz file renegotiates the chain rate."""
    rng = np.random.default_rng(2)
    fs = 22050
    x = (0.2 * rng.standard_normal((fs * 4, 1))).astype(np.float32)
    eng = AudioEngine()
    eng.build_chain([{"effect_id": "g", "type": "gate",
                      "params": {"threshold_db": -60,
                                 "attack_ms": 5, "release_ms": 50}}])
    assert eng.start_file_stream(_data_url(x, fs), realtime=True) is True
    assert eng.is_running
    assert eng.current_sample_rate == fs
    # a second start while running is refused (and must NOT be given a
    # playback pump by the serving layer — the False return is the gate)
    assert eng.start_file_stream(_data_url(x, fs)) is False
    # a couple of real-time paced blocks, then stop
    got = [eng.playback_queue.get(timeout=60)]
    eng.stop_stream()
    t0 = time.monotonic()
    while True:  # sentinel must arrive promptly after stop
        item = eng.playback_queue.get(timeout=30)
        if item is None:
            break
        got.append(item)
    assert time.monotonic() - t0 < 10
    assert not eng.is_running
    assert 1 <= len(got) < fs * 4 // 512
    # engine still serves the hot path afterwards
    out = eng.process_stream_block(np.zeros((256, 1), np.float32))
    assert out.shape == (256, 2)
    eng.close()


def test_ws_stream_file_command():
    """Server e2e: upload → stream_file → stream_audio messages with the
    full sample count → stream_audio_end; update_param mid-stream is
    accepted; a second stream_file after completion works (uses the
    retained upload)."""
    pytest.importorskip("websockets")

    async def scenario():
        import websockets as ws

        from aefs_tpu.server import backend

        server = await ws.serve(backend.handler, "127.0.0.1", 0, max_size=2**29)
        port = server.sockets[0].getsockname()[1]
        rng = np.random.default_rng(3)
        n = 48000 // 4
        x = (0.3 * rng.standard_normal((n, 1))).astype(np.float32)
        url = _data_url(x)
        try:
            async with ws.connect(f"ws://127.0.0.1:{port}", max_size=2**29) as client:
                await client.send(json.dumps({
                    "command": "build_chain",
                    "config": [{"effect_id": "f1", "type": "filter",
                                "params": {"filter_type": 0,
                                           "cutoff_hz": 2000, "q": 0.707}}],
                }))
                await client.send(json.dumps({
                    "command": "stream_file", "contents": url,
                    "realtime": False}))
                left = []
                poked = False
                for _ in range(500):
                    msg = json.loads(await asyncio.wait_for(client.recv(), 120))
                    if msg["type"] == "stream_audio":
                        left.extend(msg["left"])
                        assert len(msg["right"]) == len(msg["left"])
                        assert msg["sample_rate"] == 48000
                        if not poked:  # live param change mid-stream
                            poked = True
                            await client.send(json.dumps({
                                "command": "update_param", "effect_id": "f1",
                                "param": "cutoff_hz", "value": 500}))
                    elif msg["type"] == "stream_audio_end":
                        break
                else:
                    raise AssertionError("no stream_audio_end")
                assert len(left) == n
                assert np.all(np.isfinite(np.asarray(left, np.float32)))

                # restream the retained upload (no contents field)
                await client.send(json.dumps({
                    "command": "stream_file", "realtime": False}))
                total = 0
                for _ in range(500):
                    msg = json.loads(await asyncio.wait_for(client.recv(), 120))
                    if msg["type"] == "stream_audio":
                        total += len(msg["left"])
                    elif msg["type"] == "stream_audio_end":
                        break
                else:
                    raise AssertionError("no second stream_audio_end")
                assert total == n
        finally:
            server.close()
            await server.wait_closed()
            backend.connected_client = None

    asyncio.run(scenario())


def test_set_devices_leaves_file_stream_alone():
    """Changing the device pickers while a FILE stream plays must not
    kill the playback (the old code restarted into a MIC stream,
    silently replacing the user's file source; devices only bind at
    mic-stream open).  The selection still lands for the next start."""
    rng = np.random.default_rng(5)
    n = 48000  # 1 s
    x = (0.3 * rng.standard_normal((n, 1))).astype(np.float32)

    eng = AudioEngine()
    eng.build_chain([])
    assert eng.start_file_stream(_data_url(x), realtime=False)
    eng.set_devices(1, 2)  # mid-stream device change
    assert eng.devices == (1, 2)
    blocks = _drain(eng)
    y = np.concatenate([b for _, b in blocks])
    assert y.shape == (n, 2)  # the full file arrived — stream survived
    assert not eng.is_running
