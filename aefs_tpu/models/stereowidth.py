"""Stereo width / balance: mid-side processing (new in this build — the
reference's only stereo control is the delay's L/R offset; this is the
standard mastering-chain image tool).

Pure elementwise math on the (2, N) block:

    M = (L + R)/2,  S = (L - R)/2 * width
    L' = (M + S) * bal_l,  R' = (M - S) * bal_r

``width`` 0 collapses to mono, 1 is unity, 2 doubles the side image;
``pan`` applies the balance law (attenuate the far channel, unity at
center: bal_l = min(1, 1-pan), bal_r = min(1, 1+pan)).  Stateless and
exactly blocking-invariant (no carries at all); width=1/pan=0 is
passthrough to f32 rounding of the M/S round trip (~1 ulp).

Parity: float64 per-sample oracle (tests/oracles.py:OracleStereoWidth)
<= -80 dBFS (measured ~-140).
"""

from __future__ import annotations

import jax.numpy as jnp

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel


class StereoWidth(EffectModel):
    kind = "stereowidth"

    PARAMS = {
        "width": ParamSpec(1.0, 0.0, 2.0, smooth="step", step=0.02),
        "pan": ParamSpec(0.0, -1.0, 1.0, smooth="step", step=0.02),
    }

    def process(self, state, p, x):
        if x.shape[0] != 2:  # mono branch context: nothing to widen
            return state, x
        m = 0.5 * (x[0] + x[1])
        s = 0.5 * (x[0] - x[1]) * p["width"]
        bal_l = jnp.minimum(1.0, 1.0 - p["pan"])
        bal_r = jnp.minimum(1.0, 1.0 + p["pan"])
        return state, jnp.stack([(m + s) * bal_l, (m - s) * bal_r])
