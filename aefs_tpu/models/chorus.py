"""Chorus / vibrato: LFO-modulated fractional delay (new in this build —
the reference's only modulated-read effect is the octaver's grain phasor,
octaver.py:37-62; this reuses the same tap machinery for the classic
modulation family).

TPU decomposition: the read position p[n] = n - delay[n] is strictly
increasing (the LFO slews |d(delay)/dn| = 2*pi*rate*depth/fs << 1 at every
legal param draw), so the tap is the octaver's feedforward fractional read
(ops/ringbuf.py:fractional_read_cubic — one 4-wide sliced gather, no
recurrence).  The LFO phase is carried across blocks as a compensated
split-float32 pair (the octaver's TwoSum phasor, models/octaver.py:_two_sum)
so 256-sample streaming and 4096-superblock file processing accumulate
bit-near-identical phase — float32 naive accumulation drifts ~eps/block,
which a -80 dBFS blocking-invariance bar would see.

Stereo width comes from a per-channel LFO phase offset (``spread`` in
cycles, 0 = mono chorus, 0.25 = quadrature).

Parity: float64 per-sample oracle (tests/oracles.py:OracleChorus)
<= -80 dBFS on tonal program; mix=0 is exact passthrough.

Perf note: the tap is the per-descriptor gather path, so whole-file
mode runs ~hundreds-x realtime (vs thousands for the closed-form
effects) and pooled serving rides the generic per-slot-taps cost, like
the octaver's live-semitones mode.  The banded Pallas resampler
(ops/pallas/resample.py) is the known lever if the chorus ever lands
on a hot path — its per-tile position window fits the LFO's bounded
slew the same way it fits the grain phasor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel
from aefs_tpu.models.octaver import _two_sum
from aefs_tpu.ops.ringbuf import fractional_read_cubic

MAX_BASE_MS = 40.0
MAX_DEPTH_MS = 10.0


class Chorus(EffectModel):
    kind = "chorus"

    PARAMS = {
        "rate_hz": ParamSpec(0.8, 0.05, 10.0, smooth="mult", step=0.05),
        "depth_ms": ParamSpec(3.0, 0.0, MAX_DEPTH_MS, smooth="step", step=0.1),
        "base_ms": ParamSpec(12.0, 1.0, MAX_BASE_MS, smooth="step", step=0.5),
        "mix": ParamSpec(0.5, 0.0, 1.0, smooth="instant"),
        "spread": ParamSpec(0.25, 0.0, 0.5, smooth="instant"),
    }

    def __init__(self, fs, blocksize, channels=2, **config):
        super().__init__(fs, blocksize, channels, **config)
        # History covers the deepest legal tap plus the cubic kernel's
        # reach; static topology, so every (block, file) trace shares it.
        self.hist_len = int(
            (MAX_BASE_MS + MAX_DEPTH_MS) * fs / 1000.0
        ) + 8

    def init_state(self):
        return {
            "hist": jnp.zeros((self.channels, self.hist_len), jnp.float32),
            "ph_hi": jnp.float32(0.0),
            "ph_lo": jnp.float32(0.0),
        }

    def process(self, state, p, x):
        c, n = x.shape
        fs = jnp.float32(self.fs)
        dph = p["rate_hz"] / fs  # cycles per sample

        # Per-sample LFO phase from the compensated carry: n*dph stays
        # < ~1 at any block size the chain uses, so one f32 product per
        # sample loses nothing; the CARRY across blocks is where naive
        # f32 drifts, hence the TwoSum pair.
        idx = jnp.arange(n, dtype=jnp.float32)
        ph = state["ph_hi"] + (state["ph_lo"] + idx * dph)
        ph_c = ph[None, :] + p["spread"] * jnp.arange(c, dtype=jnp.float32)[:, None]

        delay_ms = p["base_ms"] + p["depth_ms"] * jnp.sin(
            2.0 * jnp.pi * ph_c
        )
        ago = jnp.clip(
            delay_ms * (fs / 1000.0), 2.0, jnp.float32(self.hist_len - 2)
        )

        tap = jax.vmap(fractional_read_cubic)(state["hist"], x, ago)
        y = (1.0 - p["mix"]) * x + p["mix"] * tap

        new_hist = jnp.concatenate([state["hist"], x], axis=1)[:, -self.hist_len:]
        hi, lo = _two_sum(state["ph_hi"],
                          state["ph_lo"] + jnp.float32(n) * dph)
        wrap = jnp.floor(hi)  # exact in f32; keeps hi in [0, 1)
        return (
            {"hist": new_hist, "ph_hi": hi - wrap, "ph_lo": lo},
            y,
        )
