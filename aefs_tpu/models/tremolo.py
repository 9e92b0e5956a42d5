"""Tremolo / auto-pan: amplitude LFO (new in this build — completes the
modulation family next to the chorus; the reference has no amplitude
modulation).

Pure elementwise math: gain[n] = 1 - depth/2 * (1 + sin(2*pi*ph[n])),
so the block transform is exact to float32 rounding at any block size.
The LFO phase carries across blocks as the same compensated split-f32
TwoSum pair the chorus and octaver use (models/octaver.py:_two_sum) —
naive f32 accumulation drifts ~eps/block, visible to the -80 dBFS
blocking-invariance bar.  ``spread`` offsets the right channel's LFO
phase in cycles: 0.5 turns the tremolo into an auto-panner.

Parity: float64 per-sample oracle (tests/oracles.py:OracleTremolo)
<= -80 dBFS; depth=0 is exact passthrough.
"""

from __future__ import annotations

import jax.numpy as jnp

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel
from aefs_tpu.models.octaver import _two_sum


class Tremolo(EffectModel):
    kind = "tremolo"

    PARAMS = {
        "rate_hz": ParamSpec(5.0, 0.05, 20.0, smooth="mult", step=0.05),
        "depth": ParamSpec(0.5, 0.0, 1.0, smooth="step", step=0.02),
        "spread": ParamSpec(0.0, 0.0, 0.5, smooth="instant"),
    }

    def init_state(self):
        return {"ph_hi": jnp.float32(0.0), "ph_lo": jnp.float32(0.0)}

    def process(self, state, p, x):
        c, n = x.shape
        dph = p["rate_hz"] / jnp.float32(self.fs)
        idx = jnp.arange(n, dtype=jnp.float32)
        ph = state["ph_hi"] + (state["ph_lo"] + idx * dph)
        ph_c = ph[None, :] + p["spread"] * jnp.arange(c, dtype=jnp.float32)[:, None]
        gain = 1.0 - 0.5 * p["depth"] * (1.0 + jnp.sin(2.0 * jnp.pi * ph_c))
        hi, lo = _two_sum(state["ph_hi"],
                          state["ph_lo"] + jnp.float32(n) * dph)
        wrap = jnp.floor(hi)
        return {"ph_hi": hi - wrap, "ph_lo": lo}, x * gain
