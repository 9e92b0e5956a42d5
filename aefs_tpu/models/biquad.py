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

    # Bounds/steps from FilterEffect (filter.py:45-47, :102-104); types
    # 3-5 (peaking EQ, low/high shelf) with gain_db, and type 6 (2nd-order
    # allpass — the phase-correction element a Linkwitz-Riley multiband
    # split needs, core/multiband.py) extend the reference's LP/HP/BP to
    # the full RBJ-cookbook family.  gain_db only shapes types 3-5; at
    # 0 dB those reduce to exact unity, so old configs are untouched.
    PARAMS = {
        "filter_type": ParamSpec(0.0, 0.0, 6.0, smooth="step", step=1.0),
        "cutoff_hz": ParamSpec(1000.0, 20.0, 20000.0, smooth="mult", step=0.1),
        "q": ParamSpec(0.707, 0.1, 10.0, smooth="step", step=0.1),
        "gain_db": ParamSpec(0.0, -24.0, 24.0, smooth="step", step=0.5),
    }

    def init_state(self):
        return {"df1": jnp.zeros((self.channels, 4), jnp.float32)}

    def coefficients(self, p):
        """RBJ formulas (filter.py:62-98 for LP/HP/BP; the cookbook's
        peaking/shelf rows for types 3-5), branchless over the type —
        one-hot masks keep a single compiled program for all six."""
        fs = jnp.float32(self.fs)
        # Nyquist clamp (the wah's low-fs lesson, wah.py): the engine
        # rebuilds the chain at the FILE's rate, and cutoff_hz > fs/2
        # flips sin(w0) negative -> alpha < 0 -> poles OUTSIDE the unit
        # circle — e.g. the 4.5 kHz presence shelf of a legal preset on
        # an 8 kHz WAV diverges to Inf.  (The reference inherits the
        # same instability: filter.py:62-98 has no clamp and
        # engine.py:88 rebuilds at the file rate — deliberate
        # robustness divergence.)  45% of fs rather than ~50%: at
        # 0.495*fs sin(w0) ~ 0.03 puts the poles near the unit circle
        # where the f32 conditioning floor eps/(1-r)^2 (CLAUDE.md) is
        # only ~-50 dB; 0.45 keeps the clamped corner at full -80
        # parity.  Mirrored in tests/oracles.py.
        fc = jnp.minimum(p["cutoff_hz"], 0.45 * fs)
        q = p["q"]
        w0 = 2.0 * jnp.pi * fc / fs
        cw = jnp.cos(w0)
        sw = jnp.sin(w0)
        alpha = sw / (2.0 * q)

        t = jnp.round(p["filter_type"]).astype(jnp.int32)
        one = [(t == k).astype(jnp.float32) for k in range(7)]

        big_a = jnp.power(10.0, p.get("gain_db", jnp.float32(0.0)) / 40.0)
        sq = jnp.sqrt(big_a)
        tsa = 2.0 * sq * alpha
        ap1, am1 = big_a + 1.0, big_a - 1.0

        rows = (
            # (b0, b1, b2, a0, a1, a2) per type
            ((1 - cw) / 2, 1 - cw, (1 - cw) / 2,
             1 + alpha, -2 * cw, 1 - alpha),                     # 0 LP
            ((1 + cw) / 2, -(1 + cw), (1 + cw) / 2,
             1 + alpha, -2 * cw, 1 - alpha),                     # 1 HP
            (alpha, jnp.float32(0.0), -alpha,
             1 + alpha, -2 * cw, 1 - alpha),                     # 2 BP
            (1 + alpha * big_a, -2 * cw, 1 - alpha * big_a,
             1 + alpha / big_a, -2 * cw, 1 - alpha / big_a),     # 3 peak
            (big_a * (ap1 - am1 * cw + tsa), 2 * big_a * (am1 - ap1 * cw),
             big_a * (ap1 - am1 * cw - tsa),
             ap1 + am1 * cw + tsa, -2 * (am1 + ap1 * cw),
             ap1 + am1 * cw - tsa),                              # 4 low shelf
            (big_a * (ap1 + am1 * cw + tsa), -2 * big_a * (am1 + ap1 * cw),
             big_a * (ap1 + am1 * cw - tsa),
             ap1 - am1 * cw + tsa, 2 * (am1 - ap1 * cw),
             ap1 - am1 * cw - tsa),                              # 5 high shelf
            (1 - alpha, -2 * cw, 1 + alpha,
             1 + alpha, -2 * cw, 1 - alpha),                     # 6 allpass
        )
        b0, b1, b2, a0, a1, a2 = (
            sum(one[k] * rows[k][j] for k in range(7)) for j in range(6)
        )
        return b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0

    def process(self, state, p, x):
        b0, b1, b2, a1, a2 = self.coefficients(p)
        y, df1 = biquad_block(x, b0, b1, b2, a1, a2, state["df1"])
        return {"df1": df1}, y
