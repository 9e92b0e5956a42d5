"""Protocol soak: seeded random command storms against live servers.

The per-command tests pin known sequences; these soaks drive the real
WebSocket surfaces with randomized op streams — valid, invalid and
malformed interleaved — and assert the servers stay fully functional
afterwards (the reference's resilience contract: per-command try/except
keeps the server alive on bad input, backend.py:110-113)."""

import asyncio
import base64
import json

import numpy as np
import pytest

from aefs_tpu.engine.wavio import encode_wav_int16


CHAINS = [
    [],
    [{"effect_id": "f", "type": "filter",
      "params": {"filter_type": 0, "cutoff_hz": 2000, "q": 0.8}}],
    [{"effect_id": "d", "type": "delay",
      "params": {"delay_ms": 120, "feedback": 0.4, "mix_dry": 1.0,
                 "mix_wet": 0.7, "offset_ms": 5}}],
    [{"effect_id": "w", "type": "waveshaper",
      "params": {"drive": 6.0, "shape": 1, "mix": 1.0, "out_gain": 0.8}},
     {"effect_id": "g", "type": "gate",
      "params": {"threshold_db": -50, "attack_ms": 5, "release_ms": 80}}],
]

JUNK = [
    "not json at all",
    '{"command": }',
    '{"no_command_key": 1}',
    '{"command": "definitely_not_a_command"}',
    '{"command": "process_file", "contents": "data:audio/wav;base64,!!!"}',
    '{"command": "process_file", "contents": 42}',
    '{"command": "update_param"}',
    '{"command": "set_ir", "effect_id": null, "contents": "xyz"}',
    '{"command": "stream_block", "audio": "nope"}',
    '{"command": "stream_file", "contents": "data:audio/wav;base64,%%%"}',
]


def _wav_url(n=2048, fs=48000, seed=0):
    rng = np.random.default_rng(seed)
    x = (0.3 * rng.standard_normal((n, 1))).astype(np.float32)
    return "data:audio/wav;base64," + base64.b64encode(
        encode_wav_int16(x, fs)
    ).decode()


def test_backend_protocol_soak(tmp_path):
    """~100 randomized ops against the single-session backend, then prove
    it still does real work (stats + a full file round trip)."""
    websockets = pytest.importorskip("websockets")

    async def scenario():
        import websockets as ws
        from aefs_tpu.server import backend

        server = await ws.serve(backend.handler, "127.0.0.1", 0, max_size=2**26)
        port = server.sockets[0].getsockname()[1]
        rng = np.random.default_rng(42)
        url = _wav_url()
        sess = str(tmp_path / "soak_sess")
        try:
            async with ws.connect(f"ws://127.0.0.1:{port}", max_size=2**26) as c:
                for i in range(100):
                    op = rng.integers(0, 12)
                    if op == 10:  # live file stream (flat-out) ...
                        await c.send(json.dumps({
                            "command": "stream_file", "contents": url,
                            "realtime": False}))
                    elif op == 11:  # ... raced against stop
                        await c.send(json.dumps({"command": "stop"}))
                    elif op <= 2:  # param storm (valid + invalid mixed)
                        await c.send(json.dumps({
                            "command": "update_param",
                            "effect_id": rng.choice(["f", "d", "w", "g", "zz"]),
                            "param": rng.choice(
                                ["cutoff_hz", "delay_ms", "drive", "bogus"]),
                            "value": float(rng.uniform(-1e6, 1e6)),
                        }))
                    elif op <= 4:  # junk
                        await c.send(str(JUNK[int(rng.integers(len(JUNK)))]))
                    elif op <= 6:  # chain churn
                        await c.send(json.dumps({
                            "command": "build_chain",
                            "config": CHAINS[int(rng.integers(len(CHAINS)))]}))
                    elif op == 7:
                        await c.send(json.dumps({"command": "get_stats"}))
                    elif op == 8:
                        await c.send(json.dumps(
                            {"command": "save_session", "path": sess}))
                    else:
                        await c.send(json.dumps(
                            {"command": "resume_session",
                             "path": rng.choice([sess, str(tmp_path / "no")])}))
                    if rng.random() < 0.1:  # drain opportunistically
                        try:
                            await asyncio.wait_for(c.recv(), 0.05)
                        except asyncio.TimeoutError:
                            pass

                # The server must still be fully functional: build a known
                # chain, upload a file, get a valid processed response.
                await c.send(json.dumps(
                    {"command": "build_chain", "config": CHAINS[1]}))
                await c.send(json.dumps(
                    {"command": "process_file", "contents": url}))
                for _ in range(200):
                    msg = json.loads(await asyncio.wait_for(c.recv(), 120))
                    if msg["type"] == "file_processed":
                        break
                else:
                    raise AssertionError("no file_processed after soak")
                out = np.asarray(msg["processed_samples"], np.float64)
                assert out.shape[0] == 2048 and np.all(np.isfinite(out))
                await c.send(json.dumps({"command": "get_stats"}))
                for _ in range(50):
                    msg = json.loads(await asyncio.wait_for(c.recv(), 60))
                    if msg["type"] == "stats":
                        break
                else:
                    raise AssertionError("no stats after soak")
        finally:
            server.close()
            await server.wait_closed()

    asyncio.run(scenario())


def test_pool_protocol_soak():
    """Three concurrent clients storm a 3-slot pool (streams, param
    churn, stats, a junk burst, session churn via reconnect); every
    stream_block must come back finite, and the pool must end healthy."""
    websockets = pytest.importorskip("websockets")

    async def scenario():
        import websockets as ws
        from aefs_tpu.server.pool import PoolServer, SessionPool

        pool = SessionPool(CHAINS[2], n_slots=3)
        srv = PoolServer(pool)
        server = await ws.serve(srv.handler, "127.0.0.1", 0, max_size=2**26)
        port = server.sockets[0].getsockname()[1]
        batcher = asyncio.create_task(srv.batcher())

        async def client_run(seed):
            rng = np.random.default_rng(seed)
            for _round in range(2):  # reconnect churn: claim -> release -> claim
                async with ws.connect(f"ws://127.0.0.1:{port}",
                                      max_size=2**26) as c:
                    ready = json.loads(await c.recv())
                    assert ready["type"] == "session_ready"
                    n = ready["blocksize"]
                    for _ in range(15):
                        op = rng.integers(0, 5)
                        if op <= 2:
                            await c.send(json.dumps({
                                "command": "stream_block",
                                "audio": (0.2 * rng.standard_normal(n))
                                .astype(np.float32).tolist()}))
                            while True:
                                msg = json.loads(
                                    await asyncio.wait_for(c.recv(), 60))
                                if msg["type"] == "processed_block":
                                    break
                            out = np.asarray(msg["output"], np.float64)
                            assert out.shape[0] == n and np.all(np.isfinite(out))
                        elif op == 3:
                            await c.send(json.dumps({
                                "command": "update_param", "effect_id": "d",
                                "param": rng.choice(["delay_ms", "feedback",
                                                     "nope"]),
                                "value": float(rng.uniform(-10, 2000))}))
                        else:
                            await c.send(str(JUNK[int(rng.integers(len(JUNK)))]))

        try:
            await asyncio.gather(*(client_run(100 + k) for k in range(3)))
            # pool healthy afterwards: all slots reclaimed, stats sane
            async with ws.connect(f"ws://127.0.0.1:{port}", max_size=2**26) as c:
                ready = json.loads(await c.recv())
                assert ready["type"] == "session_ready"
                await c.send(json.dumps({"command": "get_pool_stats"}))
                while True:
                    msg = json.loads(await asyncio.wait_for(c.recv(), 60))
                    if msg["type"] == "pool_stats":
                        break
                assert msg["slots"] == 3 and msg["active"] == 1
        finally:
            batcher.cancel()
            server.close()
            await server.wait_closed()

    asyncio.run(scenario())
