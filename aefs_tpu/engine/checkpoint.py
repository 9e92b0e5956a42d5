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

import numpy as np
import jax


FORMAT_VERSION = 1


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
    way.  Profiles are bin-indexed (hop is pinned to 256 in every mode),
    so no rate resampling applies."""
    ids = {c.get("effect_id") for c in chain_config}
    return {
        eid: {"noise_profile": np.asarray(prof, np.float32)}
        for eid, prof in noise_profiles.items()
        if eid in ids
    }


def save_session(path: str, chain_config, targets_map: dict, state,
                 custom_irs: dict | None = None,
                 noise_profiles: dict | None = None) -> None:
    """Write a session checkpoint directory — CRASH-SAFE.

    The state lands in a fresh generation-named file and ``session.json``
    (the manifest naming it) is swapped in atomically LAST via
    ``os.replace``: a kill at ANY instant leaves the directory holding
    either the previous complete checkpoint or the new one, never a
    torn mix (the old in-place overwrite had a window where ``state.npz``
    was new while ``session.json`` was old — or half-written)."""
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
    tmp = os.path.join(path, state_file + ".tmp")
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
    with open(tmp, "wb") as f:
        np.savez(
            f,
            **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
            **ir_arrays,
            **prof_arrays,
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, state_file))
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "format_version": FORMAT_VERSION,
                "chain_config": chain_config,
                "targets": targets_map,
                "n_leaves": len(leaves),
                "gen": gen,
                "state_file": state_file,
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
    custom_irs, noise_profiles).

    ``rebuild_state_fn(template_state)`` grafts the saved leaves onto a
    freshly built chain's state pytree (the treedef comes from the rebuilt
    chain, so checkpoints survive process restarts and code that changed
    leaf *values* but not the state structure).  ``custom_irs`` maps
    effect_id -> (ir, fs) for any uploaded convreverb IRs the session
    carried — the caller must rebuild with ``ir_static_overrides`` or the
    state leaves will not fit.  ``noise_profiles`` maps effect_id -> the
    learned per-bin noise floor (rebuild with
    ``profile_static_overrides``)."""
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
            noise_profiles)
