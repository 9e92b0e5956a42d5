"""Multi-session pool server: many clients, ONE batched TPU dispatch.

The reference serves exactly one client per backend process
(backend.py:73-75; the cloud deployment spins one service per user,
render.yaml).  On TPU the economics invert: a single chip sustains
150+ concurrent realtime chains (PERF.md density sweep), so this server
multiplexes many WebSocket sessions onto one vmapped chain step:

- the pool shares one chain TOPOLOGY (a preset or JSON config fixed at
  server start — vmap requires a common program);
- every session owns a SLOT: its own audio state and its own smoothed
  parameter targets (the targets pytree carries a leading slot axis and
  the step vmaps over it, so per-session ``update_param`` works exactly
  like the single-session engine);
- clients stream mono blocks; pending blocks are batched per dispatch
  (idle slots process silence, which keeps their reverb/delay tails
  alive between submissions — live-session semantics).

Protocol (additive; one connection per session):

    -> {"command": "stream_block", "audio": [N floats]}
    <- {"type": "processed_block", "seq": k, "output": [...],
        "output_r": [...]}
    -> {"command": "update_param", "effect_id": id, "param": p, "value": v}
    -> {"command": "get_pool_stats"}
    <- {"type": "pool_stats", "slots": S, "active": a, "blocksize": N,
        "step_ms": t, "chain": [...]}

Run: ``python -m aefs_tpu.server.pool --preset "Rain Delay" --slots 16``.
"""

from __future__ import annotations

import argparse
import asyncio
import gc
import json
import os
import threading
import time

import numpy as np

from aefs_tpu.core.config import (
    BLOCKSIZE,
    CHANNELS_IN,
    CHANNELS_OUT,
    DEFAULT_PRESETS,
    SAMPLE_RATE,
    WS_MAX_MESSAGE,
)
from aefs_tpu.core.chain import build_chain

try:
    import websockets as ws
except ImportError:  # pragma: no cover - baked into the image
    ws = None


class SessionPool:
    """Batched multi-session runtime: slot allocation, per-slot targets,
    one jitted vmapped step shared by every session."""

    def __init__(self, chain_config, n_slots: int = 16, fs: int = SAMPLE_RATE,
                 blocksize: int = BLOCKSIZE, shard: bool = False):
        """shard=True distributes the slot axis over every available
        device (GSPMD data-parallel serving: a pool of 4 chips hosts 4x
        the sessions of one; parallel/mesh.py's scaling axis applied to
        the product surface).  n_slots must divide the device count."""
        import jax
        import jax.numpy as jnp

        self.n_slots = int(n_slots)
        self.fs = int(fs)
        self.blocksize = int(blocksize)
        self.chain_config = chain_config
        self.chain, single_state, self._tmap0 = build_chain(
            chain_config, fs, blocksize,
            channels_in=CHANNELS_IN, channels_out=CHANNELS_OUT,
        )
        self._fresh_single = single_state
        self._sharding = None
        if shard and len(jax.devices()) > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            mesh = Mesh(np.asarray(jax.devices()), axis_names=("data",))
            if self.n_slots % mesh.shape["data"]:
                raise ValueError(
                    f"n_slots={n_slots} must divide over "
                    f"{mesh.shape['data']} devices"
                )
            self._sharding = lambda leaf: NamedSharding(
                mesh, P(*(("data",) + (None,) * (leaf.ndim - 1)))
            )
        self.state = self._fresh_batched_state()
        # Per-slot parameter targets: host-side maps + a batched pytree.
        self._targets_maps = [dict_copy(self._tmap0) for _ in range(self.n_slots)]
        self.targets = self._stack_targets()

        # Donation default OFF: donated dispatches serialize through
        # remote relays (PERF.md round-2 third pass — 27 vs 3.4 ms/step
        # on bad sessions), and the extra state copy is cheap next to
        # that.  On a host-attached TPU donation is strictly better (it
        # updates the ring buffers in place): AEFS_POOL_DONATE=1.
        self._donate = os.environ.get("AEFS_POOL_DONATE", "0") == "1"
        self._step = jax.jit(
            lambda st, tg, x: jax.vmap(
                self.chain.process_block, in_axes=(0, 0, 0)
            )(st, tg, x),
            donate_argnums=(0,) if self._donate else (),
        )
        self._lock = threading.Lock()
        self._free = list(range(self.n_slots))
        self.last_step_ms = 0.0
        # Warm up off the serving path.
        x = self._put(np.zeros((self.n_slots, CHANNELS_IN, self.blocksize),
                               np.float32))
        self.state, _ = self._step(self.state, self.targets, x)
        # Scalar readback: block_until_ready does not synchronize on the
        # remote axon backend.
        float(jnp.sum(jnp.ravel(jax.tree.leaves(self.state)[0])[:1]))

    def _put(self, x):
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(x)
        if self._sharding is not None:
            return jax.device_put(x, self._sharding(x))
        return x

    def _fresh_batched_state(self):
        """Fresh per-slot audio state for every slot (sharded if the pool
        is).  Also the recovery path when a donated dispatch dies mid-step
        and leaves ``self.state`` pointing at deleted buffers."""
        import jax
        import jax.numpy as jnp

        state = jax.tree.map(
            lambda leaf: jnp.broadcast_to(
                leaf[None], (self.n_slots,) + leaf.shape
            ).copy(),
            self._fresh_single,
        )
        if self._sharding is not None:
            state = jax.tree.map(
                lambda leaf: jax.device_put(leaf, self._sharding(leaf)), state
            )
        return state

    def _stack_targets(self):
        import jax.numpy as jnp

        per_slot = [self.chain.targets(m) for m in self._targets_maps]
        out = []
        for i in range(len(self.chain.effects)):
            out.append({
                name: jnp.stack([ps[i][name] for ps in per_slot])
                for name in per_slot[0][i]
            })
        return tuple(out)

    # -- slots ------------------------------------------------------------
    def claim(self):
        with self._lock:
            if not self._free:
                return None
            return self._free.pop(0)

    def release(self, slot: int):
        """Reset the slot to fresh state + default targets and return it
        to the pool."""
        import jax

        with self._lock:
            fresh = self._fresh_single
            self.state = jax.tree.map(
                lambda batched, single: batched.at[slot].set(single),
                self.state, fresh,
            )
            self._targets_maps[slot] = dict_copy(self._tmap0)
            self.targets = self._stack_targets()
            self._free.append(slot)

    def update_param(self, slot: int, effect_id: str, param: str, value):
        models = dict(self.chain.effects)
        if effect_id not in models:
            return f"Error: effect ID '{effect_id}' not found"
        if param not in models[effect_id].PARAMS:
            return (f"Warning: parameter '{param}' in effect "
                    f"'{effect_id}' could not be updated")
        with self._lock:
            self._targets_maps[slot].setdefault(effect_id, {})[param] = float(value)
            spec = models[effect_id].PARAMS[param]
            clamped = spec.clamp(float(value))
            eff_index = [eid for eid, _ in self.chain.effects].index(effect_id)
            self.targets = tuple(
                (
                    {**t, param: t[param].at[slot].set(clamped)}
                    if i == eff_index else t
                )
                for i, t in enumerate(self.targets)
            )
        return None

    # -- batched step ------------------------------------------------------
    def step_blocks(self, blocks: dict[int, np.ndarray]):
        """Run one batched dispatch: ``blocks`` maps slot -> (N,) mono
        float32; idle slots process silence.  Returns {slot: (N, co)}."""
        import jax.numpy as jnp

        x = np.zeros((self.n_slots, CHANNELS_IN, self.blocksize), np.float32)
        for slot, audio in blocks.items():
            x[slot, 0, : len(audio)] = audio[: self.blocksize]
        # The lock spans the whole dispatch: (self.state, self.targets)
        # must be read and replaced atomically against release() resets
        # and update_param() target rewrites on other threads.
        with self._lock:
            t0 = time.time()
            try:
                self.state, y = self._step(self.state, self.targets, self._put(x))
                out = np.asarray(y)  # sync + readback
            except Exception:
                if self._donate:
                    # The failed dispatch consumed the donated state
                    # buffers; without a reset every future step would
                    # raise 'Array has been deleted' — a transient error
                    # must not become a permanent outage.  Sessions keep
                    # their slots; their audio tails restart from silence.
                    print("Error: pool step failed; resetting slot state")
                    self.state = self._fresh_batched_state()
                raise
            self.last_step_ms = (time.time() - t0) * 1000.0
        return {slot: out[slot].T for slot in blocks}


def dict_copy(m):
    return {k: dict(v) for k, v in m.items()}


class PoolServer:
    def __init__(self, pool: SessionPool):
        self.pool = pool
        self._pending = {}  # slot -> (audio, future, seq)
        self._cv = asyncio.Condition()
        self._seqs = {}

    async def batcher(self):
        """Collect submissions arriving close together into one dispatch."""
        loop = asyncio.get_running_loop()
        while True:
            async with self._cv:
                while not self._pending:
                    await self._cv.wait()
            await asyncio.sleep(0.002)  # aggregation window (< block cadence)
            async with self._cv:
                batch, self._pending = self._pending, {}
            if not batch:
                continue
            blocks = {slot: audio for slot, (audio, _f) in batch.items()}
            try:
                outs = await loop.run_in_executor(
                    None, self.pool.step_blocks, blocks
                )
            except Exception as e:
                # A failed dispatch must kill neither the batcher task
                # (every later submission would hang on a dead queue) nor
                # the sessions: propagate to each waiter, whose handler
                # logs it and keeps the connection alive.
                for _slot, (_a, fut) in batch.items():
                    if not fut.done():
                        fut.set_exception(
                            RuntimeError(f"pool step failed: {e}")
                        )
                continue
            for slot, (_a, fut) in batch.items():
                if not fut.done():
                    fut.set_result(outs[slot])

    async def submit(self, slot: int, audio: np.ndarray):
        fut = asyncio.get_running_loop().create_future()
        async with self._cv:
            # one in-flight block per session: a second submission before
            # the first resolves replaces it (drop-late, realtime rules)
            self._pending[slot] = (audio, fut)
            self._cv.notify()
        return await fut

    async def handler(self, websocket):
        from aefs_tpu import native

        slot = self.pool.claim()
        if slot is None:
            await websocket.send(json.dumps(
                {"type": "error", "error": "pool full"}))
            return
        self._seqs[slot] = 0
        print(f"Session joined: slot {slot}")
        try:
            await websocket.send(json.dumps({
                "type": "session_ready", "slot": slot,
                "blocksize": self.pool.blocksize,
                "sample_rate": self.pool.fs,
                "chain": self.pool.chain_config,
            }))
            async for message in websocket:
                try:
                    cmd = json.loads(message)
                    command = cmd.get("command")
                    if command == "stream_block":
                        audio = np.asarray(cmd.get("audio", []), np.float32)
                        out = await self.submit(slot, audio)
                        seq = self._seqs[slot] = self._seqs[slot] + 1
                        head = json.dumps({"type": "processed_block", "seq": seq})
                        await websocket.send(
                            head[:-1]
                            + ',"output":' + native.json_f32_array(out[:, 0])
                            + ',"output_r":' + native.json_f32_array(out[:, 1])
                            + "}"
                        )
                    elif command == "update_param":
                        # Device work (per-slot target rewrite) — keep it
                        # off the event loop, where it would stall every
                        # other session's handshake/IO on remote backends.
                        err = await asyncio.get_running_loop().run_in_executor(
                            None, self.pool.update_param,
                            slot, cmd.get("effect_id"), cmd.get("param"),
                            cmd.get("value"),
                        )
                        if err:
                            print(err)
                    elif command == "get_pool_stats":
                        deadline_ms = (
                            self.pool.blocksize / self.pool.fs * 1000.0
                        )
                        await websocket.send(json.dumps({
                            "type": "pool_stats",
                            "slots": self.pool.n_slots,
                            "active": self.pool.n_slots - len(self.pool._free),
                            "blocksize": self.pool.blocksize,
                            "step_ms": round(self.pool.last_step_ms, 3),
                            # One batched step serves every slot, so the
                            # whole pool is realtime while step < block.
                            "deadline_ms": round(deadline_ms, 3),
                            "realtime_ok": self.pool.last_step_ms < deadline_ms,
                            "chain": self.pool.chain_config,
                        }))
                except json.JSONDecodeError:
                    print(f"Error: message is not valid JSON: {message!r}")
                except Exception as e:
                    print(f"Error processing pool command: {e}")
        finally:
            # Pop the seq counter BEFORE the slot can be re-claimed: the
            # executor hop below yields the event loop, and a new session
            # claiming the freed slot must not have its counter deleted
            # by this handler's continuation.
            self._seqs.pop(slot, None)
            # Slot reset touches device state — off the event loop.
            # Shielded so task cancellation (server teardown) cannot skip
            # the release and leak the slot.
            fut = asyncio.get_running_loop().run_in_executor(
                None, self.pool.release, slot
            )
            try:
                await asyncio.shield(fut)
            except asyncio.CancelledError:
                pass  # the release still runs in the worker thread
            print(f"Session left: slot {slot}")


async def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="Rain Delay")
    ap.add_argument("--config", help="JSON chain-config file (overrides --preset)")
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--shard", action="store_true",
                    help="distribute slots over all devices (multi-chip pool)")
    ap.add_argument("--port", type=int, default=int(os.environ.get("POOL_PORT", 8766)))
    args = ap.parse_args(argv)

    if args.config:
        with open(args.config) as f:
            chain_config = json.load(f)
    else:
        chain_config = DEFAULT_PRESETS[args.preset]

    # Health probes (TCP connect-and-close, e.g. pool_load's wait_port)
    # otherwise print a full handshake-EOF traceback per probe.  Filter
    # just those records — real websocket errors must stay visible.
    import logging

    class _ProbeNoise(logging.Filter):
        def filter(self, record):
            return "opening handshake failed" not in record.getMessage()

    logging.getLogger("websockets.server").addFilter(_ProbeNoise())

    gc.disable()
    from aefs_tpu.utils.platform import select_platform

    backend = select_platform()
    pool = SessionPool(chain_config, n_slots=args.slots, shard=args.shard)
    server = PoolServer(pool)
    print(f"Pool server: {args.slots} slots on port {args.port} "
          f"(jax backend: {backend})")
    asyncio.create_task(server.batcher())
    async with ws.serve(server.handler, "0.0.0.0", args.port,
                        max_size=WS_MAX_MESSAGE):
        await asyncio.Future()


if __name__ == "__main__":
    try:
        asyncio.run(main())
    except KeyboardInterrupt:
        print("\nClosing pool server")
        gc.enable()
