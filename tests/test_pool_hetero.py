"""Heterogeneous-topology pool serving (VERDICT r4 #1).

Sessions bucket by chain topology: one vmapped program per bucket, slots
migrate on per-session build_chain, and a migrated/joining session must be
BIT-IDENTICAL to the same session served by a dedicated single-topology
pool — the reference's per-client arbitrary chains (backend.py:99-100) at
pool density.
"""

import asyncio
import json

import numpy as np
import pytest


CFG_A = [{"effect_id": "f", "type": "filter",
          "params": {"filter_type": 0, "cutoff_hz": 8000, "q": 0.707}}]

CFG_B = [{"effect_id": "d", "type": "delay",
          "params": {"delay_ms": 120.0, "feedback": 0.4,
                     "mix_dry": 0.7, "mix_wet": 0.5}},
         {"effect_id": "g", "type": "gate",
          "params": {"threshold_db": -45.0, "attack_ms": 5.0,
                     "release_ms": 80.0}}]

# same topology as CFG_B, different ids and params (bucket-sharing case)
CFG_C = [{"effect_id": "del2", "type": "delay",
          "params": {"delay_ms": 250.0, "feedback": 0.2,
                     "mix_dry": 1.0, "mix_wet": 0.3}},
         {"effect_id": "gate2", "type": "gate",
          "params": {"threshold_db": -60.0, "attack_ms": 2.0,
                     "release_ms": 40.0}}]


def _noise(rng, n):
    return (0.3 * rng.standard_normal(n)).astype(np.float32)


def _tone(n, f, fs=48000, amp=0.3):
    return (amp * np.sin(2 * np.pi * f * np.arange(n) / fs)).astype(np.float32)


def test_canonical_topology_keys():
    from aefs_tpu.server.pool import canonical_topology

    k_a, canon_a, ids_a = canonical_topology(CFG_A)
    k_b, _, ids_b = canonical_topology(CFG_B)
    k_c, _, ids_c = canonical_topology(CFG_C)
    # live params and effect ids never split buckets
    assert k_b == k_c and ids_b == ["d", "g"] and ids_c == ["del2", "gate2"]
    assert k_a != k_b
    assert canon_a[0]["effect_id"] == "fx0"
    # static config DOES split buckets (distinct compiled programs)
    cfg_static = [dict(CFG_A[0], params=dict(CFG_A[0]["params"]))]
    cfg_static[0]["comb_times_ms"] = [10.0, 20.0]  # arbitrary static key
    k_s, _, _ = canonical_topology(cfg_static)
    assert k_s != k_a
    # grid pools bake whole-octave octaver ratios -> compile-relevant
    oct12 = [{"effect_id": "o", "type": "octaver",
              "params": {"semitones": -12.0}}]
    oct24 = [{"effect_id": "o", "type": "octaver",
              "params": {"semitones": -24.0}}]
    assert (canonical_topology(oct12, grid=True)[0]
            != canonical_topology(oct24, grid=True)[0])
    # ...but only on the grid: generic pools keep semitones live
    assert (canonical_topology(oct12, grid=False)[0]
            == canonical_topology(oct24, grid=False)[0])
    # parallel containers key on branch STRUCTURE, not branch param values
    par = lambda fb: [{"effect_id": "p", "type": "parallel",
                       "branches": [[{"effect_id": "x", "type": "delay",
                                      "params": {"feedback": fb}}],
                                    [{"effect_id": "y", "type": "gate",
                                      "params": {}}]],
                       "params": {"gain_0": 1.0}}]
    assert canonical_topology(par(0.2))[0] == canonical_topology(par(0.8))[0]
    par2 = [dict(par(0.2)[0], branches=[[{"type": "delay", "params": {}}]])]
    assert canonical_topology(par2)[0] != canonical_topology(par(0.2))[0]
    # The branch key mirrors ParallelChains.__init__ EXACTLY
    # (parallel_chain.py:44-59): entries the builder skips (unknown
    # types, nested parallel, un-expanded multiband) must not split
    # buckets against each other...
    brk = lambda branch: [dict(par(0.2)[0], branches=[branch])]
    skip_mb = brk([{"type": "multiband", "crossover_hz": [300.0]},
                   {"type": "delay", "params": {}}])
    skip_un = brk([{"type": "bogus"},
                   {"type": "delay", "params": {}}])
    skip_pp = brk([{"type": "parallel", "branches": []},
                   {"type": "delay", "params": {}}])
    assert (canonical_topology(skip_mb)[0] == canonical_topology(skip_un)[0]
            == canonical_topology(skip_pp)[0])
    # ...but a skipped entry DOES shift the kept entry's branch-config
    # index, which is baked into the lifted param names (b{bi}_{ei}_*)
    # and therefore into the bucket's target-row identity:
    assert (canonical_topology(skip_un)[0]
            != canonical_topology(brk([{"type": "delay", "params": {}}]))[0])
    # ...and extra top-level keys on branch entries are NOT forwarded to
    # branch constructors, so they must not split buckets either:
    extra = brk([{"type": "delay", "params": {}, "ignored_key": 7}])
    assert (canonical_topology(extra)[0]
            == canonical_topology(brk([{"type": "delay", "params": {}}]))[0])


def test_multipool_heterogeneous_bit_parity():
    """Two topologies live at once in one MultiPool; each session must
    bit-match the same session served by a dedicated single-topology
    pool, including a live update_param mid-stream routed through the
    session-id map, and a session that JOINS an already-running bucket
    with its own params."""
    from aefs_tpu.server.pool import MultiPool, SessionPool

    mp = MultiPool(CFG_A, n_slots=2)
    # the default bucket keeps the OPERATOR-configured effect ids, so
    # default-chain sessions (idmap None) address params by those ids
    assert [eid for eid, _ in mp.default_pool.chain.effects] == ["f"]
    sa = mp.default_pool.claim()

    key_b, pool_b, sb, tmap_b, single_b, idmap_b = mp.build_session(CFG_B)
    assert pool_b is not mp.default_pool
    assert sb is not None  # claimed inside build_session, under the map lock
    assert len(mp.buckets()) == 2

    # dedicated single-topology pools (the solo-serving oracle)
    pa = SessionPool(CFG_A, n_slots=2)
    ra = pa.claim()
    pb = SessionPool(CFG_B, n_slots=2)
    rb = pb.claim()

    rng = np.random.default_rng(3)
    sc = pc = rc = None
    for i in range(24):
        xa, xb = _noise(rng, mp.blocksize), _noise(rng, mp.blocksize)
        if i == 8:
            # live param change routed via the session-id -> bucket-id map
            assert set(idmap_b) == {"d", "g"}
            pool_b.update_param(sb, idmap_b["d"], "feedback", 0.7)
            pb.update_param(rb, "d", "feedback", 0.7)
        if i == 12:
            # session C joins B's RUNNING bucket with different params
            key_c, pool_c, sc, tmap_c, single_c, idmap_c = (
                mp.build_session(CFG_C))
            assert pool_c is pool_b and key_c == key_b
            assert sc is not None and sc != sb
            pc = SessionPool(CFG_C, n_slots=2)
            rc = pc.claim()
        blocks = {sb: xb}
        if sc is not None:
            xc = _noise(rng, mp.blocksize)
            blocks[sc] = xc
        oa = mp.default_pool.step_blocks({sa: xa})[sa]
        ob_all = pool_b.step_blocks(blocks)
        ora = pa.step_blocks({ra: xa})[ra]
        orb = pb.step_blocks({rb: xb})[rb]
        np.testing.assert_array_equal(
            oa, ora, err_msg=f"block {i}: default-bucket session != solo")
        np.testing.assert_array_equal(
            ob_all[sb], orb, err_msg=f"block {i}: migrated session != solo")
        if sc is not None:
            orc = pc.step_blocks({rc: xc})[rc]
            np.testing.assert_array_equal(
                ob_all[sc], orc,
                err_msg=f"block {i}: mid-stream joiner != solo")
    for p in (pa, pb, pc):
        p.close()
    for p in mp.buckets().values():
        p.close()


def test_multipool_same_topology_rebuild_and_limits():
    """Same-topology build_chain shares the bucket (rebuild-in-place);
    the bucket limit rejects new topologies when nothing is evictable and
    evicts sessionless buckets when something is."""
    from aefs_tpu.server.pool import MultiPool

    mp = MultiPool(CFG_A, n_slots=2, max_buckets=2)
    key_b, pool_b, sb, tmap_b, single_b, _ = mp.build_session(CFG_B)

    # bucket limit reached, bucket B occupied -> a third topology fails
    cfg_new = [{"effect_id": "w", "type": "waveshaper",
                "params": {"drive": 4.0}}]
    with pytest.raises(RuntimeError, match="bucket limit"):
        mp.build_session(cfg_new)
    assert len(mp.buckets()) == 2  # the failed build evicted nothing

    # same topology as B, same session -> rebuild in place (reference
    # rebuild semantics), no new bucket, no slot churn
    key_c, pool_c, sc, _, _, _ = mp.build_session(
        CFG_C, current=(pool_b, sb))
    assert pool_c is pool_b and sc == sb

    # release B's only session -> the bucket becomes evictable
    pool_b.release(sb)
    key_w, pool_w, sw, tmap_w, single_w, _ = mp.build_session(cfg_new)
    buckets = mp.buckets()
    assert key_b not in buckets and key_w in buckets
    assert mp.default_key in buckets  # the default bucket never evicts
    assert sw is not None
    out = pool_w.step_blocks({sw: _tone(mp.blocksize, 1000)})
    assert np.all(np.isfinite(out[sw]))
    for p in mp.buckets().values():
        p.close()


def test_multipool_concurrent_same_key_builds_one_bucket(monkeypatch):
    """N sessions requesting the SAME new topology at once must produce
    exactly ONE compiled bucket: the first builder reserves the key and
    compiles outside the map lock; the others wait on its event instead
    of compiling duplicates (or deadlocking the map)."""
    import threading
    from aefs_tpu.server import pool as poolmod

    mp = poolmod.MultiPool(CFG_A, n_slots=4)
    built = []
    real = poolmod.SessionPool

    class CountingPool(real):
        def __init__(self, *a, **k):
            built.append(1)
            super().__init__(*a, **k)

    monkeypatch.setattr(poolmod, "SessionPool", CountingPool)
    start = threading.Barrier(4)
    results, errors = [], []

    def worker():
        try:
            start.wait(30)
            results.append(mp.build_session(CFG_B))
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
        assert not t.is_alive(), "build_session deadlocked"
    assert not errors, errors
    assert len(built) == 1, f"{len(built)} duplicate bucket compiles"
    pools = {id(r[1]) for r in results}
    assert len(pools) == 1  # everyone landed in the one bucket
    slots = [r[2] for r in results]
    assert None not in slots and len(set(slots)) == 4  # all placed
    for p in mp.buckets().values():
        p.close()


def test_multipool_randomized_migration_hammer():
    """Concurrency hammer over the migration path: threads stream while
    randomly rebuilding to other topologies (handler semantics: claim-new
    -then-release-old), with max_buckets forcing eviction churn.  Checks
    no deadlock, no exception, finite audio, and a consistent final
    bucket map."""
    import threading
    from aefs_tpu.server.pool import MultiPool

    topologies = [
        CFG_A,
        CFG_B,
        [{"effect_id": "w", "type": "waveshaper",
          "params": {"drive": 4.0, "mix": 1.0}}],
        [{"effect_id": "g", "type": "gate",
          "params": {"threshold_db": -50.0, "attack_ms": 3.0,
                     "release_ms": 60.0}}],
    ]
    mp = MultiPool(CFG_A, n_slots=4, max_buckets=3)
    errors = []
    # One stepper per bucket, like the product: step_blocks is documented
    # single-caller (each bucket has exactly ONE _Batcher task driving
    # it); concurrent sync callers would interleave the depth-1 pipeline.
    steplocks, steplock_guard = {}, threading.Lock()

    def step(pool, slot, x):
        with steplock_guard:
            lk = steplocks.setdefault(id(pool), threading.Lock())
        with lk:
            return pool.step_blocks({slot: x})[slot]

    def worker(tid):
        rng = np.random.default_rng(100 + tid)
        pool, slot = mp.default_pool, mp.default_pool.claim()
        assert slot is not None
        try:
            for _ in range(6):
                cfg = topologies[rng.integers(len(topologies))]
                try:
                    _k, npool, nslot, _t, _s, _i = mp.build_session(
                        cfg, current=(pool, slot))
                except RuntimeError:
                    continue  # bucket limit: keep the current placement
                if nslot is None:
                    continue  # target bucket full: keep current placement
                if npool is not pool:
                    pool.release(slot)
                    pool, slot = npool, nslot
                for _ in range(int(rng.integers(1, 4))):
                    out = step(pool, slot, _noise(rng, mp.blocksize))
                    assert np.all(np.isfinite(out))
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append((tid, e))
        finally:
            pool.release(slot)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(600)
        assert not t.is_alive(), "migration hammer deadlocked"
    assert not errors, errors
    buckets = mp.buckets()
    assert mp.default_key in buckets
    assert len(buckets) <= 3
    assert all(p.active_count() == 0 for p in buckets.values())
    # the map is fully serviceable after the churn
    for p in buckets.values():
        s = p.claim()
        out = p.step_blocks({s: _tone(mp.blocksize, 440)})[s]
        assert np.all(np.isfinite(out))
        p.release(s)
        p.close()


def migration_fuzz_seed(seed, n_phases=3, blocks_per_phase=5):
    """One randomized migration-parity trial: a session migrates through
    ``n_phases`` random topologies (the differential fuzzer's generator,
    test_fuzz_topologies.random_chain) inside ONE MultiPool while a
    second session stays on the default bucket.  After EVERY migration
    both sessions must remain BITWISE identical to fresh dedicated
    single-topology pools — the hetero pool's core contract — which also
    pins neighbor isolation across other sessions' migrations.  Pinned
    seeds run in CI; scripts/pool_migration_fuzz.py sweeps ranges."""
    import test_fuzz_topologies as F
    from helpers import bursts
    from aefs_tpu.server.pool import MultiPool, SessionPool

    rng = np.random.default_rng(seed)
    topos = [F.random_chain(rng, allow_parallel=(seed % 4 == 3))[0]
             for _ in range(n_phases)]
    mp = MultiPool(topos[0], n_slots=2)
    bs = mp.blocksize
    # neighbor session: stays on the default bucket the whole trial
    s_n = mp.default_pool.claim()
    twin_n = SessionPool(topos[0], n_slots=2)
    r_n = twin_n.claim()
    # migrating session starts on the default bucket too
    pool, slot = mp.default_pool, mp.default_pool.claim()
    twin = SessionPool(topos[0], n_slots=2)
    r = twin.claim()
    audio = bursts(2 * n_phases * blocks_per_phase * bs, amp=0.3, seed=seed)
    pos = 0

    def next_block():
        nonlocal pos
        b = np.asarray(audio[pos:pos + bs], np.float32)
        pos += bs
        return b[:, 0] if b.ndim > 1 else b  # pool blocks are mono (N,)

    opened = [twin_n, twin]
    try:
        for phase, cfg in enumerate(topos):
            if phase:
                _k, npool, nslot, _t, _s, _i = mp.build_session(
                    cfg, current=(pool, slot))
                assert nslot is not None
                if npool is not pool:
                    pool.release(slot)
                    pool, slot = npool, nslot
                twin = SessionPool(cfg, n_slots=2)
                opened.append(twin)
                r = twin.claim()
            for b in range(blocks_per_phase):
                x_m, x_n = next_block(), next_block()
                if pool is mp.default_pool:
                    outs = pool.step_blocks({slot: x_m, s_n: x_n})
                    out_m, out_n = outs[slot], outs[s_n]
                else:
                    out_m = pool.step_blocks({slot: x_m})[slot]
                    out_n = mp.default_pool.step_blocks({s_n: x_n})[s_n]
                t_m = twin.step_blocks({r: x_m})[r]
                t_n = twin_n.step_blocks({r_n: x_n})[r_n]
                np.testing.assert_array_equal(
                    out_m, t_m, err_msg=f"seed {seed} phase {phase} "
                    f"block {b}: migrating session != solo")
                np.testing.assert_array_equal(
                    out_n, t_n, err_msg=f"seed {seed} phase {phase} "
                    f"block {b}: neighbor session != solo")
    finally:
        for p in opened:
            p.close()
        for p in mp.buckets().values():
            p.close()


@pytest.mark.parametrize("seed", [501, 503])  # 503 draws parallel containers
def test_migration_parity_fuzz_pinned(seed):
    migration_fuzz_seed(seed)


def test_pool_build_chain_migration_ws():
    """End-to-end over WebSockets: a session migrates itself to its own
    topology with build_chain, its parameters route through ITS effect
    ids, stats report both buckets, and the default bucket keeps serving
    other sessions untouched."""
    websockets = pytest.importorskip("websockets")

    async def scenario():
        import websockets as ws
        from aefs_tpu.server.pool import PoolServer, SessionPool

        pool = SessionPool(CFG_A, n_slots=2)
        srv = PoolServer(pool)
        server = await ws.serve(srv.handler, "127.0.0.1", 0, max_size=2**26)
        port = server.sockets[0].getsockname()[1]
        batcher = asyncio.create_task(srv.batcher())

        async def stream_rms(client, freq, n_blocks=8):
            rms = None
            for _ in range(n_blocks):
                await client.send(json.dumps({
                    "command": "stream_block",
                    "audio": _tone(pool.blocksize, freq).tolist()}))
                msg = json.loads(await asyncio.wait_for(client.recv(), 60))
                assert msg["type"] == "processed_block"
                rms = float(np.sqrt(np.mean(np.square(msg["output"]))))
            return rms

        try:
            async with ws.connect(f"ws://127.0.0.1:{port}",
                                  max_size=2**26) as a, \
                    ws.connect(f"ws://127.0.0.1:{port}",
                               max_size=2**26) as b:
                ra = json.loads(await a.recv())
                rb = json.loads(await b.recv())
                assert {ra["type"], rb["type"]} == {"session_ready"}

                # a malformed build_chain must ANSWER with an error (the
                # protocol promises chain_built-or-error), not swallow
                # the exception and leave the client hanging
                await a.send(json.dumps({
                    "command": "build_chain",
                    "effects_config": [{"type": "delay",
                                        "params": "oops"}]}))
                msg = json.loads(await asyncio.wait_for(a.recv(), 60))
                assert msg["type"] == "error", msg

                # A migrates to its own chain — a DIFFERENT topology
                # (filter+gate vs the default bare filter): a 300 Hz
                # low-pass with its own effect id (6 kHz tone crushed)
                # plus a wide-open gate.
                my_cfg = [{"effect_id": "my-lp", "type": "filter",
                           "params": {"filter_type": 0, "cutoff_hz": 300.0,
                                      "q": 0.707}},
                          {"effect_id": "my-gate", "type": "gate",
                           "params": {"threshold_db": -90.0,
                                      "attack_ms": 1.0,
                                      "release_ms": 100.0}}]
                await a.send(json.dumps({"command": "build_chain",
                                         "effects_config": my_cfg}))
                msg = json.loads(await asyncio.wait_for(a.recv(), 120))
                assert msg["type"] == "chain_built", msg
                rms_lp = await stream_rms(a, 6000)
                assert rms_lp < 0.02, rms_lp

                # B still on the default 8 kHz LP bucket: 6 kHz passes
                rms_b = await stream_rms(b, 6000)
                assert rms_b > 0.1, rms_b

                # A's params route through ITS id ("my-lp")
                await a.send(json.dumps({
                    "command": "update_param", "effect_id": "my-lp",
                    "param": "cutoff_hz", "value": 20000.0, "ack": True}))
                msg = json.loads(await asyncio.wait_for(a.recv(), 60))
                assert msg["type"] == "param_ack" and msg["ok"], msg
                rms_open = await stream_rms(a, 6000, n_blocks=40)
                assert rms_open > 0.1, rms_open

                # stats see both buckets, each with one active session
                await a.send(json.dumps({"command": "get_pool_stats"}))
                msg = json.loads(await asyncio.wait_for(a.recv(), 60))
                assert msg["type"] == "pool_stats"
                assert msg["n_buckets"] == 2
                assert sorted(bk["active"] for bk in msg["buckets"]) == [1, 1]
                assert isinstance(msg["realtime_ok"], bool)

                # unknown topology id on update_param -> warning, no crash
                await a.send(json.dumps({
                    "command": "update_param", "effect_id": "nope",
                    "param": "cutoff_hz", "value": 100.0, "ack": True}))
                msg = json.loads(await asyncio.wait_for(a.recv(), 60))
                assert msg["type"] == "param_ack" and not msg["ok"]

            # both gone: default bucket has both its slots back
            await asyncio.sleep(0.2)
            async with ws.connect(f"ws://127.0.0.1:{port}",
                                  max_size=2**26) as c:
                json.loads(await c.recv())
                await c.send(json.dumps({"command": "get_pool_stats"}))
                msg = json.loads(await asyncio.wait_for(c.recv(), 60))
                assert msg["slots"] == 2 and msg["active"] == 1
        finally:
            batcher.cancel()
            server.close()
            await server.wait_closed()

    asyncio.run(scenario())
