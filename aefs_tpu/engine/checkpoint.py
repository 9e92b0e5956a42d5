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


def save_session(path: str, chain_config, targets_map: dict, state) -> None:
    """Write a session checkpoint directory."""
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    np.savez(
        os.path.join(path, "state.npz"),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )
    with open(os.path.join(path, "session.json"), "w") as f:
        json.dump(
            {
                "format_version": FORMAT_VERSION,
                "chain_config": chain_config,
                "targets": targets_map,
                "n_leaves": len(leaves),
            },
            f,
            indent=2,
        )


def load_session(path: str):
    """Read a checkpoint -> (chain_config, targets_map, rebuild_state_fn).

    ``rebuild_state_fn(template_state)`` grafts the saved leaves onto a
    freshly built chain's state pytree (the treedef comes from the rebuilt
    chain, so checkpoints survive process restarts and code that changed
    leaf *values* but not the state structure)."""
    with open(os.path.join(path, "session.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta.get('format_version')}")
    data = np.load(os.path.join(path, "state.npz"))
    leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]

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

    return meta["chain_config"], meta["targets"], rebuild_state
