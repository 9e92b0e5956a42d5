"""Session checkpoint/resume.

The reference's only persistence is browser-side presets in localStorage
(app.py:188, SURVEY.md §5 "checkpoint/resume"); server state is rebuilt
from client commands.  This module adds durable server-side session
checkpoints: the chain config, the live parameter targets, and the full
audio-state pytree (ring buffers, filter taps, phasors) — so a long-running
session (or a long file job) can resume exactly where it stopped.

Format: a directory with ``session.json`` (config + targets + format
metadata) and ``state.npz`` (the flattened state pytree).  NumPy npz is
used rather than orbax because the state is small (a few MB) and the
layout must stay trivially inspectable; orbax remains the right tool once
states shard across hosts.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading

import numpy as np
import jax


FORMAT_VERSION = 1

# Per-directory save serialization: the engine runs save_session on the
# server's executor per WebSocket command (backend.py), OUTSIDE the
# dispatch lock — two concurrent saves to one directory would otherwise
# both read gen=N and race their generation files and the manifest swap.
# Process-local by design (concurrent saves from DIFFERENT processes to
# one directory are not a supported deployment).
_save_locks: dict[str, threading.Lock] = {}
_save_locks_guard = threading.Lock()


def _dir_lock(path: str) -> threading.Lock:
    key = os.path.abspath(path)
    with _save_locks_guard:
        return _save_locks.setdefault(key, threading.Lock())


def remap_profiles(noise_profiles, saved_fs, fs):
    """Re-bin learned spectral noise profiles from ``saved_fs`` onto the
    analysis grid of ``fs``.  Profile bin k names the frequency
    k*fs/window, so raw bins carried across a rate change would gate
    frequencies off by the rate ratio (~8.8% for 44100->48000) with no
    error — signal eaten in some bands, noise passed in others.  Linear
    interpolation in frequency, edge-clamped (bins above the saved
    Nyquist hold the saved top bin).  No-op when the rates match or
    either rate is unknown."""
    if (not noise_profiles or not saved_fs or not fs
            or int(saved_fs) == int(fs)):
        return dict(noise_profiles or {})
    out = {}
    for eid, prof in noise_profiles.items():
        prof = np.asarray(prof, np.float32)
        bins = prof.shape[-1]
        # target bin k sits at k*fs/W -> position k*fs/saved_fs in saved bins
        pos = np.arange(bins, dtype=np.float64) * (float(fs) / float(saved_fs))
        flat = prof.reshape(-1, bins)
        rem = np.stack(
            [np.interp(pos, np.arange(bins), row) for row in flat])
        out[eid] = rem.reshape(prof.shape).astype(np.float32)
    return out


def ir_static_overrides(custom_irs: dict, chain_config, fs: int) -> dict:
    """Static-override map carrying uploaded/saved convreverb IRs into a
    chain build, resampled when the IR WAV's rate differs from the build
    rate.  Shared by the live engine (set_ir / build_chain / resume) and
    the CLI's resumable jobs — a chain rebuilt WITHOUT the session's
    custom IR has differently-shaped spec_hist leaves and every resume
    would fail at the leaf-shape check."""
    ids = {c.get("effect_id") for c in chain_config}
    out = {}
    for eid, (ir, ir_fs) in custom_irs.items():
        if eid not in ids:
            continue
        if ir_fs != fs:
            from aefs_tpu.engine.wavio import resample_bandlimited

            n_out = max(8, int(round(ir.shape[1] * fs / ir_fs)))
            ir = resample_bandlimited(ir, n_out)
        out[eid] = {"ir": ir}
    return out


def profile_static_overrides(noise_profiles: dict, chain_config) -> dict:
    """Static-override map carrying learned spectral noise profiles
    (engine.learn_noise) into a chain build.  Unlike IRs a profile does
    not change any state leaf shape — it is a per-bin threshold constant —
    but a resume that dropped it would silently revert the effect to the
    scalar-threshold gate, so it rides rebuilds and checkpoints the same
    way.  Profile bins are rate-DEPENDENT (bin k names k*fs/window):
    callers resuming at a different sample rate than the checkpoint's
    ``meta["fs"]`` must pass the profiles through ``remap_profiles``
    first."""
    ids = {c.get("effect_id") for c in chain_config}
    return {
        eid: {"noise_profile": np.asarray(prof, np.float32)}
        for eid, prof in noise_profiles.items()
        if eid in ids
    }


def save_session(path: str, chain_config, targets_map: dict, state,
                 custom_irs: dict | None = None,
                 noise_profiles: dict | None = None,
                 fs: int | None = None) -> None:
    """Write a session checkpoint directory — CRASH-SAFE and serialized.

    The state lands in a fresh generation-named file and ``session.json``
    (the manifest naming it) is swapped in atomically LAST via
    ``os.replace``: a kill at ANY instant leaves the directory holding
    either the previous complete checkpoint or the new one, never a
    torn mix (the old in-place overwrite had a window where ``state.npz``
    was new while ``session.json`` was old — or half-written).  Saves to
    one directory serialize on a process-local lock (the server runs
    this per WebSocket command on the executor — concurrent saves would
    race the generation counter and the cleanup), and temp files are
    mkstemp-unique.  ``fs`` records the session sample rate so loads at
    a different rate can remap rate-dependent payloads
    (``remap_profiles``)."""
    with _dir_lock(path):
        _save_session_locked(path, chain_config, targets_map, state,
                             custom_irs, noise_profiles, fs)


def _save_session_locked(path, chain_config, targets_map, state,
                         custom_irs, noise_profiles, fs):
    os.makedirs(path, exist_ok=True)
    manifest = os.path.join(path, "session.json")
    gen = 0
    if os.path.exists(manifest):
        try:
            with open(manifest) as f:
                gen = int(json.load(f).get("gen", 0)) + 1
        except Exception:
            gen = 1
    leaves, treedef = jax.tree.flatten(state)
    state_file = f"state-{gen}.npz"
    # Uploaded IRs ride in the same npz (extra keys are invisible to the
    # leaf_{i} reader) so a checkpoint saved after set_ir resumes in a
    # FRESH process — without them the rebuilt chain's synthetic IR has
    # differently-shaped state leaves and the resume always fails.
    ir_meta, ir_arrays = [], {}
    for j, (eid, (ir, ir_fs)) in enumerate(sorted((custom_irs or {}).items())):
        ir_meta.append({"effect_id": eid, "fs": int(ir_fs), "key": f"ir_{j}"})
        ir_arrays[f"ir_{j}"] = np.asarray(ir, np.float32)
    # Learned spectral noise profiles ride the same way (learn_noise):
    # a resume without them silently reverts to the scalar threshold.
    prof_meta, prof_arrays = [], {}
    for j, (eid, prof) in enumerate(sorted((noise_profiles or {}).items())):
        prof_meta.append({"effect_id": eid, "key": f"profile_{j}"})
        prof_arrays[f"profile_{j}"] = np.asarray(prof, np.float32)
    fd, tmp = tempfile.mkstemp(dir=path, prefix=state_file + ".",
                               suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(
            f,
            **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
            **ir_arrays,
            **prof_arrays,
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, state_file))
    fd, tmp = tempfile.mkstemp(dir=path, prefix="session.json.",
                               suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(
            {
                "format_version": FORMAT_VERSION,
                "chain_config": chain_config,
                "targets": targets_map,
                "n_leaves": len(leaves),
                "gen": gen,
                "state_file": state_file,
                "fs": int(fs) if fs else None,
                "custom_irs": ir_meta,
                "noise_profiles": prof_meta,
            },
            f,
            indent=2,
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest)  # the commit point
    # Best-effort cleanup of superseded generations (and the legacy
    # fixed-name file) — only after the new manifest is durable.
    for name in os.listdir(path):
        if (
            name != state_file
            and name.startswith("state")
            and (name.endswith(".npz") or name.endswith(".tmp"))
        ):
            try:
                os.remove(os.path.join(path, name))
            except OSError:
                pass


def load_session(path: str):
    """Read a checkpoint -> (chain_config, targets_map, rebuild_state_fn,
    custom_irs, noise_profiles, meta).

    ``rebuild_state_fn(template_state)`` grafts the saved leaves onto a
    freshly built chain's state pytree (the treedef comes from the rebuilt
    chain, so checkpoints survive process restarts and code that changed
    leaf *values* but not the state structure).  ``custom_irs`` maps
    effect_id -> (ir, fs) for any uploaded convreverb IRs the session
    carried — the caller must rebuild with ``ir_static_overrides`` or the
    state leaves will not fit.  ``noise_profiles`` maps effect_id -> the
    learned per-bin noise floor (rebuild with
    ``profile_static_overrides``; remap with ``remap_profiles`` when the
    rebuild rate differs from ``meta["fs"]``).  ``meta`` is the raw
    manifest dict (``fs``, ``gen``, ``format_version``, ...)."""
    with open(os.path.join(path, "session.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta.get('format_version')}")
    # ``state_file`` names the committed generation; legacy checkpoints
    # (pre-atomic layout) used the fixed name.
    data = np.load(os.path.join(path, meta.get("state_file", "state.npz")))
    leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    custom_irs = {
        m["effect_id"]: (data[m["key"]], int(m["fs"]))
        for m in meta.get("custom_irs", [])
    }
    noise_profiles = {
        m["effect_id"]: data[m["key"]]
        for m in meta.get("noise_profiles", [])
    }

    def rebuild_state(template_state):
        t_leaves, treedef = jax.tree.flatten(template_state)
        if len(t_leaves) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves, chain expects {len(t_leaves)}"
            )
        import jax.numpy as jnp

        cast = []
        for i, (saved, t) in enumerate(zip(leaves, t_leaves)):
            if tuple(saved.shape) != tuple(t.shape):
                raise ValueError(
                    f"checkpoint leaf {i} has shape {tuple(saved.shape)}, "
                    f"chain expects {tuple(t.shape)} — the state structure "
                    "changed; rebuild instead of resuming"
                )
            cast.append(jnp.asarray(saved, t.dtype))
        return jax.tree.unflatten(treedef, cast)

    return (meta["chain_config"], meta["targets"], rebuild_state, custom_irs,
            noise_profiles, meta)
