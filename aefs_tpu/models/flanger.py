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

Perf: the tap operator is materialized ONCE per chunk as a dense
one-hot cubic-weight matrix and each sweep is one MXU contraction —
the gather form (vmapped dynamic_slice with per-batch starts) measured
~23 us/sweep on the TPU and put an 18.6 s file at 19x realtime; dense
sweeps amortize the sequential N/D_MIN dependency chain (the physics
of a half-millisecond feedback path) back into the hundreds-to-
thousands-x range.  A further lever if ever needed: collapse the 12
sweeps to log2(12) matrix squarings of (I - fb*T_c)^-1
(sum A^k = prod (I + A^(2^j))).

Parity: float64 per-sample oracle (tests/oracles.py:OracleFlanger)
<= -80 dBFS on tonal program at |feedback| <= 0.7; the comb's resonant
gain 1/(1-|fb|) scales the f32 floor, covered in the fuzzer's
chain_tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel
from aefs_tpu.models.octaver import _two_sum
from aefs_tpu.ops.ringbuf import cubic_onehot_matrix

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

        ext_len = self.hist_len + _CHUNK

        def step(carry, xc):
            hist, hi, lo = carry
            idx = jnp.arange(_CHUNK, dtype=jnp.float32)
            ph = hi + (lo + idx * dph)
            ph_c = ph[None, :] + p["spread"] * chan
            delay_ms = p["base_ms"] + p["depth_ms"] * jnp.sin(
                2.0 * jnp.pi * ph_c
            )
            d = jnp.clip(delay_ms * (fs / 1000.0), D_MIN, hmax)

            # The tap operator is SWEEP-INVARIANT (d is fixed for the
            # chunk), so build it once as a dense (C, CHUNK, ext) weight
            # matrix — four one-hot int comparisons carrying the cubic
            # Hermite tap weights — and every sweep becomes one small
            # MXU contraction.  The gather form (vmapped dynamic_slice
            # with per-batch starts, fractional_read_cubic) measured
            # ~23 us per sweep on the TPU — the documented 12x
            # per-batch-starts cliff (CLAUDE.md) — which put the file
            # pass at 19x realtime; dense + the h/c split below measured
            # 452x (PERF.md late round 3).
            # No wrap patch needed: d in [24, hist-2] keeps all four
            # taps strictly inside ext.
            ca = jnp.ceil(d).astype(jnp.int32)  # (C, CHUNK)
            fr = (jnp.ceil(d) - d).astype(jnp.float32)
            base = self.hist_len + jnp.arange(_CHUNK, dtype=jnp.int32)
            weights = cubic_onehot_matrix(
                base[None, :] - ca - 1, fr, ext_len)
            # Split the operator at the history boundary: the history
            # half contracts ONCE (it never changes across sweeps); the
            # sweeps iterate only the strictly-lower in-chunk quarter.
            w_h = weights[:, :, : self.hist_len]
            w_c = weights[:, :, self.hist_len:]
            th = jnp.einsum("cns,cs->cn", w_h, hist)
            b = xc + fb * th

            v = jnp.zeros_like(xc)
            for _ in range(_SWEEPS):  # exact: T_c is nilpotent on the chunk
                v = b + fb * jnp.einsum("cns,cs->cn", w_c, v)
            tap = th + jnp.einsum("cns,cs->cn", w_c, v)
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
