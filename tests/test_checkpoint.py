"""Checkpoint/resume: a resumed session continues bit-exactly."""

import numpy as np
import jax.numpy as jnp

from aefs_tpu.core.chain import build_chain
from aefs_tpu.engine.checkpoint import save_session, load_session

from helpers import noise
from oracles import err_dbfs

FS = 48000
CFGS = [
    {"effect_id": "d", "type": "delay",
     "params": {"delay_ms": 200, "feedback": 0.5, "mix_dry": 1.0,
                "mix_wet": 0.8, "offset_ms": 10}},
    {"effect_id": "r", "type": "reverb",
     "params": {"rt60_s": 1.5, "damp": 0.3, "pre_delay_ms": 5,
                "mix_dry": 0.7, "mix_wet": 0.5}},
]


def test_save_load_resume_bit_exact(tmp_path):
    chain, state, tmap = build_chain(CFGS, FS, 256, channels_in=2)
    targets = chain.targets(tmap)
    step = chain.step()
    x = noise(40 * 256, amp=0.3)

    # Run 20 blocks, checkpoint, run 20 more (reference trajectory).
    for i in range(20):
        state, _ = step(state, targets, jnp.asarray(x[i * 256:(i + 1) * 256].T))
    save_session(str(tmp_path / "ckpt"), CFGS, tmap, state)
    ref_out = []
    for i in range(20, 40):
        state, y = step(state, targets, jnp.asarray(x[i * 256:(i + 1) * 256].T))
        ref_out.append(np.asarray(y))

    # Resume in a "new process": rebuild chain from the checkpoint.
    cfgs2, tmap2, rebuild, _irs, _prof, _meta = load_session(str(tmp_path / "ckpt"))
    assert cfgs2 == CFGS
    chain2, template, _ = build_chain(cfgs2, FS, 256, channels_in=2)
    state2 = rebuild(template)
    targets2 = chain2.targets(tmap2)
    step2 = chain2.step()
    for i in range(20, 40):
        state2, y = step2(state2, targets2, jnp.asarray(x[i * 256:(i + 1) * 256].T))
        assert err_dbfs(np.asarray(y), ref_out[i - 20]) <= -150


def test_leaf_mismatch_raises(tmp_path):
    chain, state, tmap = build_chain(CFGS, FS, 256, channels_in=2)
    save_session(str(tmp_path / "ckpt"), CFGS, tmap, state)
    _, _, rebuild, _irs, _prof, _meta = load_session(str(tmp_path / "ckpt"))
    other_chain, other_state, _ = build_chain(CFGS[:1], FS, 256, channels_in=2)
    import pytest

    with pytest.raises(ValueError):
        rebuild(other_state)


def test_engine_save_resume_session(tmp_path):
    """Product surface: AudioEngine.save_session / resume_session resumes
    the streaming state bit-exact in a fresh engine (VERDICT: checkpoints
    must be reachable from the product, not just the library)."""
    from aefs_tpu.engine.engine import AudioEngine

    cfg = [{"effect_id": "d", "type": "delay",
            "params": {"delay_ms": 80, "feedback": 0.5, "mix_dry": 1.0,
                       "mix_wet": 1.0, "offset_ms": 5}}]
    rng = np.random.default_rng(9)
    blocks = [rng.standard_normal((256, 1)).astype(np.float32) * 0.3
              for _ in range(8)]

    eng = AudioEngine()
    eng.build_chain(cfg)
    for b in blocks[:4]:
        eng.process_stream_block(b)
    eng.update_param("d", "feedback", 0.6)
    path = eng.save_session(str(tmp_path / "sess"))
    tail_ref = [eng.process_stream_block(b) for b in blocks[4:]]

    eng2 = AudioEngine()
    restored = eng2.resume_session(path)
    assert restored == cfg
    tail_got = [eng2.process_stream_block(b) for b in blocks[4:]]
    for a, b in zip(tail_ref, tail_got):
        assert np.array_equal(a, b)


def test_engine_save_resume_with_uploaded_ir(tmp_path):
    """A session whose convreverb carries an UPLOADED IR must checkpoint
    and resume — in a fresh process the IR exists nowhere but the
    checkpoint, and the saved state's spectral-history leaves are shaped
    by the custom IR's length, so a rebuild on the synthetic IR could
    never accept them (the old resume_session failed here even
    in-process by omitting the IR overrides)."""
    import base64

    from aefs_tpu.engine.engine import AudioEngine
    from aefs_tpu.engine.wavio import encode_wav_int16

    cfg = [{"effect_id": "cv", "type": "convreverb",
            "params": {"ir_seconds": 0.5, "mix_dry": 0.7, "mix_wet": 0.5}}]
    rng = np.random.default_rng(17)
    # An IR whose length matches no synthetic_ir(fs, ir_seconds) output.
    ir = (rng.standard_normal((2, 13337)) *
          np.exp(-np.arange(13337) / 3000.0)).astype(np.float32) * 0.2
    url = "data:audio/wav;base64," + base64.b64encode(
        encode_wav_int16(ir.T, 48000)).decode()
    blocks = [rng.standard_normal((256, 1)).astype(np.float32) * 0.3
              for _ in range(6)]

    eng = AudioEngine()
    eng.build_chain(cfg)
    eng.set_ir("cv", url)
    for b in blocks[:3]:
        eng.process_stream_block(b)
    path = eng.save_session(str(tmp_path / "sess_ir"))
    tail_ref = [eng.process_stream_block(b) for b in blocks[3:]]

    eng2 = AudioEngine()  # fresh process analogue: no custom_irs in memory
    restored = eng2.resume_session(path)
    assert restored == cfg
    tail_got = [eng2.process_stream_block(b) for b in blocks[3:]]
    for a, b in zip(tail_ref, tail_got):
        assert np.array_equal(a, b)


def test_cli_resumable_file_job_bit_exact(tmp_path):
    """CLI --checkpoint/--resume: a job killed mid-file and resumed produces
    the identical WAV to an uninterrupted run."""
    import json as _json

    from aefs_tpu.cli import main as cli_main
    from aefs_tpu.engine.wavio import write_wav_file, read_wav_file

    fs = 48000
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(int(1.2 * fs)) * 0.2).astype(np.float32)
    in_wav = tmp_path / "in.wav"
    write_wav_file(str(in_wav), x[:, None], fs)
    cfg = [{"effect_id": "d", "type": "delay",
            "params": {"delay_ms": 150, "feedback": 0.5, "mix_dry": 1.0,
                       "mix_wet": 1.0, "offset_ms": 0}}]
    cfg_path = tmp_path / "chain.json"
    cfg_path.write_text(_json.dumps(cfg))

    out_ref = tmp_path / "ref.wav"
    assert cli_main([str(in_wav), str(out_ref), "--config", str(cfg_path),
                     "--checkpoint", str(tmp_path / "ck_ref"),
                     "--checkpoint-every", "0.4"]) == 0

    # "Kill" a second job mid-file: run it, then rewind its progress to the
    # first checkpoint boundary and resume from there.
    ck = tmp_path / "ck"
    out2 = tmp_path / "resumed.wav"
    assert cli_main([str(in_wav), str(out2), "--config", str(cfg_path),
                     "--checkpoint", str(ck),
                     "--checkpoint-every", "0.4"]) == 0
    # progress.json still points at the LAST mid-file checkpoint; resuming
    # must redo only the tail and reproduce the reference bytes.
    assert (ck / "progress.json").exists()
    # chunked persisted output: one O(chunk) file per checkpoint, no
    # whole-prefix partial.npy rewrite (quadratic I/O on long jobs)
    assert any(nm.startswith("chunk-") for nm in
               __import__("os").listdir(ck / "chunks"))
    import json as _json2
    gen = _json2.loads((ck / "progress.json").read_text())["dir"]
    assert not (ck / gen / "partial.npy").exists()
    assert cli_main([str(in_wav), str(out2), "--config", str(cfg_path),
                     "--checkpoint", str(ck), "--resume",
                     "--checkpoint-every", "0.4"]) == 0

    a, fsa = read_wav_file(str(out_ref))
    b, fsb = read_wav_file(str(out2))
    assert fsa == fsb and np.array_equal(a, b)


def test_concurrent_save_sessions_serialize(tmp_path):
    """The server runs save_session per WebSocket command on the executor
    (outside the dispatch lock): concurrent saves to one directory must
    serialize — not race the generation counter, tmp files, or the
    cleanup — and leave a loadable checkpoint with every generation
    accounted for."""
    import threading

    chain, state, tmap = build_chain(CFGS, FS, 256, channels_in=2)
    p = str(tmp_path / "ck")
    errs = []

    def worker():
        try:
            for _ in range(5):
                save_session(p, CFGS, tmap, state)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
        assert not t.is_alive()
    assert not errs, errs
    cfgs2, tmap2, rebuild, _irs, _prof, meta = load_session(p)
    assert meta["gen"] == 19  # 20 saves, strictly serialized generations
    chain2, template, _ = build_chain(cfgs2, FS, 256, channels_in=2)
    rebuild(template)


def test_remap_profiles_cross_rate():
    """Noise-profile bins name frequencies k*fs/window: a profile saved
    at 44100 and resumed at 48000 must re-bin so the gated FREQUENCIES
    are preserved (raw bins would shift every threshold up ~8.8%)."""
    from aefs_tpu.engine.checkpoint import remap_profiles

    bins = 257
    prof = np.zeros(bins, np.float32)
    prof[100] = 1.0
    out = remap_profiles({"s": prof}, 44100, 48000)["s"]
    assert out.shape == prof.shape and out.dtype == np.float32
    # the peak's frequency is bin 100 at 44100; at 48000 that frequency
    # sits at bin 100 * 44100/48000 ~= 91.9
    assert int(np.argmax(out)) in (91, 92)
    # same-rate and unknown-rate are identity
    assert np.array_equal(remap_profiles({"s": prof}, 48000, 48000)["s"],
                          prof)
    assert np.array_equal(remap_profiles({"s": prof}, None, 48000)["s"],
                          prof)


def test_cli_resume_rejects_different_input(tmp_path):
    """progress.json records the input's length and rate; --resume with a
    different file must be a clean error, never a silent splice of two
    inputs' audio."""
    import json as _json

    import pytest

    from aefs_tpu.cli import main as cli_main
    from aefs_tpu.engine.wavio import write_wav_file

    fs = 48000
    rng = np.random.default_rng(8)
    in_wav = tmp_path / "in.wav"
    write_wav_file(str(in_wav),
                   (rng.standard_normal(int(0.6 * fs)) * 0.2)
                   .astype(np.float32)[:, None], fs)
    cfg_path = tmp_path / "chain.json"
    cfg_path.write_text(_json.dumps(
        [{"effect_id": "d", "type": "delay",
          "params": {"delay_ms": 100, "feedback": 0.4, "mix_dry": 1.0,
                     "mix_wet": 1.0, "offset_ms": 0}}]))
    out = tmp_path / "out.wav"
    assert cli_main([str(in_wav), str(out), "--config", str(cfg_path),
                     "--checkpoint", str(tmp_path / "ck"),
                     "--checkpoint-every", "0.2"]) == 0
    # a different (longer) input against the same checkpoint dir
    other = tmp_path / "other.wav"
    write_wav_file(str(other),
                   (rng.standard_normal(int(0.9 * fs)) * 0.2)
                   .astype(np.float32)[:, None], fs)
    with pytest.raises(SystemExit, match="different input"):
        cli_main([str(other), str(out), "--config", str(cfg_path),
                  "--checkpoint", str(tmp_path / "ck"), "--resume",
                  "--checkpoint-every", "0.2"])


def test_cli_recheckpoint_keeps_irs_and_profiles(tmp_path):
    """A resumed job that checkpoints AGAIN must carry the session's
    custom IRs and noise profiles into the new generation — dropping
    them made the SECOND resume rebuild on the synthetic IR (leaf-shape
    failure: the job could never resume twice) and silently reverted the
    spectral gate."""
    import json as _json
    import os

    from aefs_tpu.cli import process_resumable
    from aefs_tpu.core.config import FILE_SUPERBLOCK
    from aefs_tpu.core.fileopts import file_static_overrides
    from aefs_tpu.engine.checkpoint import ir_static_overrides

    fs = 48000
    chunk = FILE_SUPERBLOCK
    n = 4 * chunk
    rng = np.random.default_rng(21)
    mono = (rng.standard_normal((n, 1)) * 0.25).astype(np.float32)
    ir = (rng.standard_normal((2, 9973)) *
          np.exp(-np.arange(9973) / 2500.0)).astype(np.float32) * 0.2
    cfg = [{"effect_id": "cv", "type": "convreverb",
            "params": {"ir_seconds": 0.5, "mix_dry": 0.7, "mix_wet": 0.5}}]
    irs = {"cv": (ir, fs)}
    overrides = file_static_overrides(cfg)
    for eid, ov in ir_static_overrides(irs, cfg, fs).items():
        overrides.setdefault(eid, {}).update(ov)

    # Construct the "killed after one chunk" checkpoint the CLI would
    # have written for a server-originated session carrying the IR.
    chain, state, tmap = build_chain(
        cfg, fs, FILE_SUPERBLOCK, channels_in=1, channels_out=2,
        static_overrides=overrides)
    targets = chain.targets(tmap)
    state, y = chain.process_array(state, targets, mono[:chunk], fast=False)
    ck = tmp_path / "ck"
    os.makedirs(ck / "chunks")
    np.save(str(ck / "chunks" / f"chunk-0-{chunk}.npy"),
            np.clip(np.asarray(y), -1.0, 1.0))
    save_session(str(ck / f"gen-{chunk}"), cfg,
                 {k: dict(v) for k, v in tmap.items()}, state,
                 custom_irs=irs, fs=fs)
    (ck / "progress.json").write_text(_json.dumps(
        {"done_samples": chunk, "n_samples": n, "fs": fs,
         "dir": f"gen-{chunk}"}))

    out = process_resumable(cfg, mono, fs, str(ck), resume=True,
                            every_s=chunk / fs)

    # the resume checkpointed again (2 mid-file chunks remained) and the
    # NEW generation still carries the IR
    with open(ck / "progress.json") as f:
        progress = _json.load(f)
    assert progress["dir"] != f"gen-{chunk}"
    with open(ck / progress["dir"] / "session.json") as f:
        meta = _json.load(f)
    assert meta["custom_irs"], "re-checkpoint dropped the custom IR"
    assert meta["fs"] == fs

    # and the stitched output equals an uninterrupted run (same chunking)
    chain2, st2, tmap2 = build_chain(
        cfg, fs, FILE_SUPERBLOCK, channels_in=1, channels_out=2,
        static_overrides=overrides)
    t2 = chain2.targets(tmap2)
    ref = []
    for i in range(0, n, chunk):
        st2, yy = chain2.process_array(st2, t2, mono[i:i + chunk],
                                       fast=False)
        ref.append(np.clip(np.asarray(yy), -1.0, 1.0))
    np.testing.assert_array_equal(out, np.concatenate(ref))


def test_save_session_atomic_generations(tmp_path):
    """Crash-safety of the checkpoint layout: session.json is the atomic
    commit point naming a generation state file, repeated saves prune
    superseded generations, stray orphan files never confuse the loader,
    and the legacy flat layout (fixed state.npz, no state_file key) still
    loads."""
    import json as _json
    import os

    chain, state, tmap = build_chain(CFGS, FS, 256, channels_in=2)
    p = str(tmp_path / "ckpt")
    save_session(p, CFGS, tmap, state)
    save_session(p, CFGS, tmap, state)  # second generation
    with open(os.path.join(p, "session.json")) as f:
        meta = _json.load(f)
    assert meta["gen"] == 1 and meta["state_file"] == "state-1.npz"
    npzs = [n for n in os.listdir(p) if n.endswith(".npz")]
    assert npzs == ["state-1.npz"]  # gen 0 pruned after the commit

    # An orphan next-generation file (kill between state write and the
    # manifest swap) must be ignored by the loader...
    with open(os.path.join(p, "state-2.npz"), "wb") as f:
        f.write(b"torn")
    cfgs2, tmap2, rebuild, _irs, _prof, _meta = load_session(p)
    chain2, template, _ = build_chain(cfgs2, FS, 256, channels_in=2)
    rebuild(template)  # loads gen 1, not the torn orphan
    # ...and the next save must clean it up and commit gen 2 on top.
    save_session(p, CFGS, tmap, state)
    npzs = sorted(n for n in os.listdir(p) if n.endswith(".npz"))
    assert npzs == ["state-2.npz"]

    # Legacy flat layout loads through the default state_file name.
    leg = str(tmp_path / "legacy")
    os.makedirs(leg)
    import jax

    leaves, _ = jax.tree.flatten(state)
    np.savez(os.path.join(leg, "state.npz"),
             **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})
    with open(os.path.join(leg, "session.json"), "w") as f:
        _json.dump({"format_version": 1, "chain_config": CFGS,
                    "targets": tmap, "n_leaves": len(leaves)}, f)
    cfgs3, _, rebuild3, _irs3, _prof3, _meta3 = load_session(leg)
    assert cfgs3 == CFGS
    rebuild3(template)


def test_cli_resume_ignores_uncommitted_generation(tmp_path):
    """The old-bug scenario: a kill AFTER the new state checkpoint was
    written but BEFORE the progress manifest swap.  progress.json still
    references the older generation; resume must continue from it (never
    from the newer orphan state, which would double-process a chunk) and
    reproduce the uninterrupted output bit-exactly."""
    import json as _json
    import shutil

    from aefs_tpu.cli import main as cli_main
    from aefs_tpu.engine.wavio import write_wav_file, read_wav_file

    fs = 48000
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(int(1.2 * fs)) * 0.2).astype(np.float32)
    in_wav = tmp_path / "in.wav"
    write_wav_file(str(in_wav), x[:, None], fs)
    cfg = [{"effect_id": "d", "type": "delay",
            "params": {"delay_ms": 150, "feedback": 0.5, "mix_dry": 1.0,
                       "mix_wet": 1.0, "offset_ms": 0}}]
    cfg_path = tmp_path / "chain.json"
    cfg_path.write_text(_json.dumps(cfg))

    out_ref = tmp_path / "ref.wav"
    assert cli_main([str(in_wav), str(out_ref), "--config", str(cfg_path)]) == 0

    ck = tmp_path / "ck"
    out2 = tmp_path / "resumed.wav"
    assert cli_main([str(in_wav), str(out2), "--config", str(cfg_path),
                     "--checkpoint", str(ck),
                     "--checkpoint-every", "0.4"]) == 0
    with open(ck / "progress.json") as f:
        progress = _json.load(f)
    committed = progress["dir"]
    # Simulate the crash window: a NEWER generation directory exists on
    # disk (state advanced past the manifest) but was never committed.
    orphan = ck / f"gen-{int(progress['done_samples']) + 19200}"
    shutil.copytree(ck / committed, orphan)
    assert cli_main([str(in_wav), str(out2), "--config", str(cfg_path),
                     "--checkpoint", str(ck), "--resume",
                     "--checkpoint-every", "0.4"]) == 0

    a, fsa = read_wav_file(str(out_ref))
    b, fsb = read_wav_file(str(out2))
    assert fsa == fsb and np.array_equal(a, b)


def test_save_resume_integer_state_effects_bit_exact(tmp_path):
    """uint32 phase accumulators (ringmod/bitcrusher), the flanger's
    delay-line history, and the limiter's gain state must round-trip a
    checkpoint BITWISE — integer phase drift would be audible as a
    carrier discontinuity."""
    cfgs = [
        {"effect_id": "b", "type": "bitcrusher",
         "params": {"bits": 6.0, "rate_hz": 11025.0, "mix": 1.0}},
        {"effect_id": "r", "type": "ringmod",
         "params": {"carrier_hz": 4321.0, "mix": 0.7, "spread": 0.25}},
        {"effect_id": "fl", "type": "flanger",
         "params": {"rate_hz": 0.4, "depth_ms": 1.5, "base_ms": 2.0,
                    "feedback": 0.55, "mix": 0.5, "spread": 0.0}},
        {"effect_id": "li", "type": "limiter",
         "params": {"ceiling_db": -3.0, "release_ms": 50.0,
                    "drive_db": 6.0, "lookahead_ms": 2.0}},
    ]
    chain, state, tmap = build_chain(cfgs, FS, 256, channels_in=2)
    targets = chain.targets(tmap)
    step = chain.step()
    x = noise(20 * 256, amp=0.4)
    for i in range(10):
        state, _ = step(state, targets, jnp.asarray(x[i * 256:(i + 1) * 256].T))
    save_session(str(tmp_path / "ck"), cfgs, tmap, state)
    ref = []
    for i in range(10, 20):
        state, y = step(state, targets, jnp.asarray(x[i * 256:(i + 1) * 256].T))
        ref.append(np.asarray(y))

    cfgs2, tmap2, rebuild, _irs, _prof, _meta = load_session(str(tmp_path / "ck"))
    chain2, template, _ = build_chain(cfgs2, FS, 256, channels_in=2)
    state2 = rebuild(template)
    step2 = chain2.step()
    targets2 = chain2.targets(tmap2)
    for i in range(10, 20):
        state2, y = step2(state2, targets2,
                          jnp.asarray(x[i * 256:(i + 1) * 256].T))
        np.testing.assert_array_equal(np.asarray(y), ref[i - 10])
