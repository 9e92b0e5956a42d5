"""Parallel effect branches (the reference's #1 unimplemented wish,
/root/reference/todo:1 "parallel chains").

A ``parallel`` effect runs N sub-chains on the same input and mixes their
outputs with per-branch gains:

    {"effect_id": "p", "type": "parallel",
     "branches": [[{filter...}, {delay...}], [{reverb...}]],
     "params": {"gain_0": 1.0, "gain_1": 0.5}}

Functionally it is just another pure effect: branch states nest inside its
state pytree and every nested live parameter is lifted into the parallel
effect's param namespace as ``b<branch>_<index>_<name>`` (smoothed with its
original spec), so the existing target-routing, smoothing, and
no-recompile machinery apply unchanged:

    update_param("p", "b0_1_delay_ms", 250)
"""

from __future__ import annotations

import jax.numpy as jnp

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel


class ParallelChains(EffectModel):
    kind = "parallel"

    def __init__(self, fs, blocksize, channels=2, branches=(), file_mode=False,
                 **config):
        super().__init__(fs, blocksize, channels)
        from aefs_tpu.models import EFFECT_REGISTRY
        from aefs_tpu.core.fileopts import file_static_overrides

        self.branches = []  # list of list of (branch-config index, model)
        params: dict[str, ParamSpec] = {}
        self._initial: dict[str, float] = {}
        for bi, branch in enumerate(branches):
            file_ov = file_static_overrides(branch) if file_mode else {}
            models = []
            for ei, cfg in enumerate(branch):
                cls = EFFECT_REGISTRY.get(cfg.get("type"))
                if cls is None or cls is ParallelChains:  # no nesting
                    continue
                live, static = cls.split_config(dict(cfg.get("params", {})))
                static.update(file_ov.get(cfg.get("effect_id") or f"fx{ei}", {}))
                model = cls(fs, blocksize, channels=channels, **static)
                # Keep the branch-config index with the model: skipped
                # entries must not shift the lifted-param numbering.
                models.append((ei, model))
                for name, spec in model.PARAMS.items():
                    key = f"b{bi}_{ei}_{name}"
                    params[key] = spec
                    if name in live:
                        self._initial[key] = float(live[name])
            self.branches.append(models)
            params[f"gain_{bi}"] = ParamSpec(1.0, 0.0, 2.0, smooth="step", step=0.05)
        # Per-instance param table (class attr is the empty default).
        self.PARAMS = params

    def initial_params(self, config: dict) -> dict:
        merged = dict(self._initial)  # nested branch params seed the lifted keys
        merged.update(config)
        return EffectModel.initial_params(self, merged)

    def init_state(self):
        return {
            "branches": tuple(
                tuple(m.init_state() for _, m in models) for models in self.branches
            )
        }

    def map_state(self, f_batched, f_lockstep, st, *rest):
        """Recurse into the nested models so THEIR lockstep counters
        (e.g. a branch delay's ring row) stay batch-uniform under the
        pool's vmap — mapping the whole container with f_batched would
        silently re-batch them, re-triggering the per-slot ring-index
        lowering trap (ops/ringbuf.py:rowring_write rationale) for every
        parallel/multiband config."""
        return {
            "branches": tuple(
                tuple(
                    m.map_state(
                        f_batched, f_lockstep, s,
                        *(r["branches"][bi][si] for r in rest),
                    )
                    for si, ((_, m), s) in enumerate(zip(models, bst))
                )
                for bi, (models, bst) in enumerate(
                    zip(self.branches, st["branches"]))
            )
        }

    def _sub_params(self, p, bi, ei, model):
        return {name: p[f"b{bi}_{ei}_{name}"] for name in model.PARAMS}

    def _run(self, state, p, x, method):
        new_branches = []
        mix = jnp.zeros_like(x)
        for bi, models in enumerate(self.branches):
            buf = x
            new_states = []
            for slot, (ei, model) in enumerate(models):
                st, buf = getattr(model, method)(
                    state["branches"][bi][slot], self._sub_params(p, bi, ei, model), buf
                )
                new_states.append(st)
            new_branches.append(tuple(new_states))
            mix = mix + p[f"gain_{bi}"] * buf
        return {"branches": tuple(new_branches)}, jnp.clip(mix, -1.0, 1.0)

    def process(self, state, p, x):
        return self._run(state, p, x, "process")

    def process_file(self, state, p, x):
        return self._run(state, p, x, "process_file")
