"""Granular delay-line pitch shifter (parity target: reference octaver.py).

Two read taps driven by phasors offset 0.5 apart, Hann crossfade gains,
4-point Hermite interpolation (pitch_shift_kernel_cubic, octaver.py:17-82).

TPU mapping: the phasor is affine per sample — p[n] = (p0 + n*step) mod 1 —
so the whole kernel collapses into one parallel gather + interpolation
(SURVEY.md §7: "ideal TPU work").  The octaver writes *raw input* into its
ring, so there is no feedback recurrence at all.  The block-to-block phasor
carry uses a TwoSum-compensated accumulator to keep long-run drift at the
eps^2 level instead of a per-block eps random walk.
"""

from __future__ import annotations

import jax.numpy as jnp

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel
from aefs_tpu.ops.ringbuf import fractional_read_cubic, ring_push


def _two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth TwoSum)."""
    s = a + b
    bb = s - a
    e = (a - bb) + (b - (s - bb))
    return s, e


class Octaver(EffectModel):
    kind = "octaver"

    # Bounds/steps from OctaverEffect (octaver.py:87-88, :117-118).
    PARAMS = {
        "semitones": ParamSpec(-12.0, -24.0, 24.0, smooth="step", step=0.5),
        "mix": ParamSpec(0.5, 0.0, 1.0, smooth="step", step=0.05),
    }

    def __init__(self, fs, blocksize, channels=2, window_ms=40.0, **config):
        super().__init__(fs, blocksize, channels)
        # Grain window; minimum size guards tiny rates (octaver.py:106).
        self.size = max(int(fs * float(window_ms) / 1000.0), 16)

    def init_state(self):
        return {
            "hist": jnp.zeros((self.size,), jnp.float32),
            "phasor": jnp.float32(0.0),
            "comp": jnp.float32(0.0),
        }

    def process(self, state, p, x):
        size = self.size
        n = x.shape[-1]
        ratio = jnp.power(2.0, p["semitones"] / 12.0)
        step = (1.0 - ratio) / size  # octaver.py:121-122
        mix = p["mix"]

        mono = jnp.mean(x, axis=0)  # octaver.py:126-128

        # Phase path in split-float32 so the result is blocksize-invariant:
        # Veltkamp-split step into a 12-bit-mantissa high part (n * s_hi is
        # then exact for n < 4096, and its mod-1 residue exactly
        # representable) plus a small low part whose product rounding is
        # ~1e-11.  Without this, fl(n * step) at n ~ 2048 carries ~2^-15
        # absolute error -> 0.06-sample tap jitter.
        c = step * jnp.float32(4097.0)
        s_hi = c - (c - step)
        s_lo = step - s_hi
        n_idx = jnp.arange(n, dtype=jnp.float32)
        p1 = jnp.mod(
            jnp.mod(n_idx * s_hi, 1.0) + state["phasor"] + n_idx * s_lo + state["comp"],
            1.0,
        )
        p2 = jnp.mod(p1 + 0.5, 1.0)

        hist = state["hist"]
        s1 = fractional_read_cubic(hist, mono, p1 * size)
        s2 = fractional_read_cubic(hist, mono, p2 * size)

        two_pi = jnp.float32(2.0 * jnp.pi)
        g1 = 0.5 * (1.0 - jnp.cos(two_pi * p1))  # Hann crossfade (octaver.py:66-67)
        g2 = 0.5 * (1.0 - jnp.cos(two_pi * p2))
        wet = s1 * g1 + s2 * g2

        # Compensated phasor carry: advance by n*step (split form), fold all
        # rounding into the TwoSum compensation term so cross-block drift
        # stays at the eps^2 level.
        nf = jnp.float32(n)
        a = jnp.mod(nf * s_hi, 1.0)  # exact
        s1, e1 = _two_sum(a, state["phasor"])
        s2, e2 = _two_sum(s1, nf * s_lo)
        s3, e3 = _two_sum(s2, state["comp"])
        new_state = {
            "hist": ring_push(hist, mono),
            "phasor": jnp.mod(s3, 1.0),  # exact integer subtraction
            "comp": e1 + e2 + e3,
        }

        # Linear dry/wet blend preserving the dry stereo image
        # (octaver.py:143-150).
        y = x * (1.0 - mix) + wet[None, :] * mix
        return new_state, y
