"""Flanger with FEEDBACK: LFO-swept fractional-delay comb whose output
recirculates into the delay line (new in this build — the chorus covers
the feed-forward "Jet Flanger" sound; regeneration is what makes the
resonant jet).  No reference counterpart; the delay-line/tap semantics
follow the chorus (models/chorus.py) and the reference's echo recursion
shape (delay.py:7-22) with a time-varying lag.

Definition (per channel):
    d[n]  = clip((base_ms + depth_ms*sin(2*pi*ph[n])) * fs/1000, 24, Hmax)
    v[n]  = x[n] + feedback * s[n]          (delay-line signal)
    s[n]  = cubic tap of v at distance d[n]  (fractional_read_cubic)
    y[n]  = (1-mix) * x[n] + mix * s[n]

TPU decomposition — the recursion is through a tap at least D_MIN=24
samples in the past, so over a 256-sample chunk the within-chunk part
of the read operator T is NILPOTENT: each application reaches at least
D_MIN-2 = 22 samples further back (the cubic kernel reads 2 above its
floor).  The implicit equation v = x + fb*T(v) is therefore solved
EXACTLY by ceil(256/22) = 12 fixed-point sweeps v <- x + fb*T(v) —
a Neumann series that terminates, not an approximation.  Chunks run
under a lax.scan carrying (hist, LFO TwoSum pair); any block size is
processed as 256-sample chunks, so 256-sample streaming and
4096-superblock file processing execute the SAME op sequence and agree
bitwise (tests assert array_equal, stronger than the -80 bar).

The d >= 24-sample clamp (0.5 ms at 48 kHz) is what bounds the sweep
count; it is also the musical floor of the base_ms range, so only a
depth_ms > base_ms draw ever hits it (the negative half-cycle of the
LFO then sits at the clamp, exactly as the oracle does).

Perf: each sweep is the chorus's per-descriptor tap (vmapped
dynamic_slice — the documented gather-class cost, CLAUDE.md), x12 per
chunk, sequential across chunks: file mode runs hundreds-x realtime,
not thousands — the N/D_MIN dependency chain is the physics of a
half-millisecond feedback path, not an implementation artifact.  The
known lever if this lands on a hot path: materialize the in-chunk
operator as a banded 256x256 matrix and build (I - fb*T)^-1 by
log2(12) MXU squarings (sum A^k = prod (I + A^(2^j))).

Parity: float64 per-sample oracle (tests/oracles.py:OracleFlanger)
<= -80 dBFS on tonal program at |feedback| <= 0.7; the comb's resonant
gain 1/(1-|fb|) scales the f32 floor, covered in the fuzzer's
chain_tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel
from aefs_tpu.models.octaver import _two_sum
from aefs_tpu.ops.ringbuf import fractional_read_cubic

MAX_BASE_MS = 10.0
MAX_DEPTH_MS = 5.0
D_MIN = 24.0     # samples; bounds the nilpotency degree
_CHUNK = 256
_SWEEPS = 12     # ceil(_CHUNK / (D_MIN - 2))


class Flanger(EffectModel):
    kind = "flanger"

    PARAMS = {
        "rate_hz": ParamSpec(0.3, 0.05, 5.0, smooth="mult", step=0.05),
        "depth_ms": ParamSpec(2.0, 0.0, MAX_DEPTH_MS, smooth="step", step=0.1),
        "base_ms": ParamSpec(2.5, 0.5, MAX_BASE_MS, smooth="step", step=0.25),
        "feedback": ParamSpec(0.6, -0.9, 0.9, smooth="step", step=0.02),
        "mix": ParamSpec(0.5, 0.0, 1.0, smooth="instant"),
        "spread": ParamSpec(0.0, 0.0, 0.5, smooth="instant"),
    }

    def __init__(self, fs, blocksize, channels=2, **config):
        super().__init__(fs, blocksize, channels, **config)
        self.hist_len = int((MAX_BASE_MS + MAX_DEPTH_MS) * fs / 1000.0) + 8

    def init_state(self):
        return {
            "hist": jnp.zeros((self.channels, self.hist_len), jnp.float32),
            "ph_hi": jnp.float32(0.0),
            "ph_lo": jnp.float32(0.0),
        }

    def process(self, state, p, x):
        c, n = x.shape
        fs = jnp.float32(self.fs)
        dph = p["rate_hz"] / fs
        chan = jnp.arange(c, dtype=jnp.float32)[:, None]
        fb = p["feedback"]
        hmax = jnp.float32(self.hist_len - 2)

        pad = (-n) % _CHUNK
        xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        m = xp.shape[1] // _CHUNK
        xs = xp.reshape(c, m, _CHUNK).transpose(1, 0, 2)  # (m, C, CHUNK)

        def step(carry, xc):
            hist, hi, lo = carry
            idx = jnp.arange(_CHUNK, dtype=jnp.float32)
            ph = hi + (lo + idx * dph)
            ph_c = ph[None, :] + p["spread"] * chan
            delay_ms = p["base_ms"] + p["depth_ms"] * jnp.sin(
                2.0 * jnp.pi * ph_c
            )
            d = jnp.clip(delay_ms * (fs / 1000.0), D_MIN, hmax)

            v = jnp.zeros_like(xc)
            tap = v
            for _ in range(_SWEEPS):  # exact: T is nilpotent on the chunk
                tap = jax.vmap(fractional_read_cubic)(hist, v, d)
                v = xc + fb * tap
            y = (1.0 - p["mix"]) * xc + p["mix"] * tap

            new_hist = jnp.concatenate([hist, v], axis=1)[:, -self.hist_len:]
            nhi, nlo = _two_sum(hi, lo + jnp.float32(_CHUNK) * dph)
            wrap = jnp.floor(nhi)
            return (new_hist, nhi - wrap, nlo), (y, v)

        carry0 = (state["hist"], state["ph_hi"], state["ph_lo"])
        (hist_f, hi_f, lo_f), (ys, vs) = lax.scan(step, carry0, xs)
        y = ys.transpose(1, 0, 2).reshape(c, m * _CHUNK)[:, :n]

        if pad:
            # The scan's carry saw `pad` trailing zeros: rebuild the true
            # state from the unpadded delay-line signal and sample count.
            v = vs.transpose(1, 0, 2).reshape(c, m * _CHUNK)[:, :n]
            hist_f = jnp.concatenate(
                [state["hist"], v], axis=1
            )[:, -self.hist_len:]
            hi_f, lo_f = _two_sum(
                state["ph_hi"], state["ph_lo"] + jnp.float32(n) * dph
            )
            wrap = jnp.floor(hi_f)
            hi_f = hi_f - wrap
        return {"hist": hist_f, "ph_hi": hi_f, "ph_lo": lo_f}, y
