"""RBJ-cookbook biquad EQ filter (parity target: reference filter.py).

The reference runs a per-sample Direct-Form-I loop (biquad_kernel,
filter.py:8-40); here the FIR half is a parallel shift-and-scale and the
IIR half a 2x2 companion-matrix associative scan (ops/scan.py:linrec2).
Coefficients are recomputed per block from the smoothed type/cutoff/Q
(filter.py:100-113); the type select is branchless so one compiled program
serves LP/HP/BP.
"""

from __future__ import annotations

import jax.numpy as jnp

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel
from aefs_tpu.ops.scan import biquad_block


class BiquadFilter(EffectModel):
    kind = "filter"

    # Bounds/steps from FilterEffect (filter.py:45-47, :102-104).
    PARAMS = {
        "filter_type": ParamSpec(0.0, 0.0, 2.0, smooth="step", step=1.0),
        "cutoff_hz": ParamSpec(1000.0, 20.0, 20000.0, smooth="mult", step=0.1),
        "q": ParamSpec(0.707, 0.1, 10.0, smooth="step", step=0.1),
    }

    def init_state(self):
        return {"df1": jnp.zeros((self.channels, 4), jnp.float32)}

    def coefficients(self, p):
        """RBJ formulas (filter.py:62-98), branchless over the type."""
        fs = jnp.float32(self.fs)
        fc = p["cutoff_hz"]
        q = p["q"]
        w0 = 2.0 * jnp.pi * fc / fs
        cw = jnp.cos(w0)
        sw = jnp.sin(w0)
        alpha = sw / (2.0 * q)

        t = jnp.round(p["filter_type"]).astype(jnp.int32)
        is_lp = (t == 0).astype(jnp.float32)
        is_hp = (t == 1).astype(jnp.float32)
        is_bp = 1.0 - is_lp - is_hp

        b0 = is_lp * (1 - cw) / 2 + is_hp * (1 + cw) / 2 + is_bp * alpha
        b1 = is_lp * (1 - cw) + is_hp * (-(1 + cw))
        b2 = is_lp * (1 - cw) / 2 + is_hp * (1 + cw) / 2 + is_bp * (-alpha)
        a0 = 1 + alpha
        a1 = -2 * cw
        a2 = 1 - alpha
        return b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0

    def process(self, state, p, x):
        b0, b1, b2, a1, a2 = self.coefficients(p)
        y, df1 = biquad_block(x, b0, b1, b2, a1, a2, state["df1"])
        return {"df1": df1}, y
