"""Functional parameter smoothing.

The reference's ``SmoothParam`` (core.py:56-77) is a lock-guarded mutable
cell: the control plane sets a target, the audio thread steps the current
value toward it by a clamped per-block step.  Here the same semantics are a
pure function over (current, target) pairs carried in the chain state —
targets arrive as runtime arguments to the jitted step, so parameter changes
never trigger a recompile and need no locks.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    """Static description of one live parameter.

    smooth:
      "step"    — clamped linear step of ``step`` per block
                  (SmoothParam.step_towards, core.py:72-77)
      "step_ms" — step of ``step`` *samples* converted to ms via the sample
                  rate (the reference's ``_delay_step_ms``, delay.py:78)
      "mult"    — step proportional to the current value (the filter
                  cutoff's "log-ish feel", filter.py:103)
      "instant" — plain attribute set, no smoothing (mix_dry/mix_wet/offset,
                  delay.py:69-71)
    """

    default: float
    lo: float
    hi: float
    smooth: str = "instant"
    step: float = 0.0

    def max_step(self, fs: float, current):
        if self.smooth == "step":
            return self.step
        if self.smooth == "step_ms":
            return 1000.0 * self.step / fs
        if self.smooth == "mult":
            return current * self.step
        raise ValueError(self.smooth)

    def clamp(self, value: float) -> float:
        return min(max(float(value), self.lo), self.hi)


def smooth_step(current, target, max_step):
    """One clamped step of ``current`` toward ``target``
    (port of SmoothParam.step_towards, core.py:72-77)."""
    delta = jnp.clip(target - current, -max_step, max_step)
    return current + delta


def smooth_all(specs: dict, current: dict, targets: dict, fs: float) -> dict:
    """Advance every parameter one block toward its target."""
    out = {}
    for name, spec in specs.items():
        cur, tgt = current[name], targets[name]
        if spec.smooth == "instant":
            out[name] = tgt
        else:
            out[name] = smooth_step(cur, tgt, spec.max_step(fs, cur))
    return out


def init_params(specs: dict, config: dict) -> dict:
    """Initial current==target values: constructor defaults overridden by the
    chain-config params dict (engine.py:50-55), clamped to spec bounds."""
    out = {}
    for name, spec in specs.items():
        v = spec.clamp(config.get(name, spec.default))
        out[name] = jnp.float32(v)
    return out
