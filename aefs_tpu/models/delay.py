"""Stereo feedback delay / echo (parity target: reference delay.py).

Independent L/R delay lines with the right channel offset for width
(delay.py:84); dry/wet mix and hard clip after the wet sum
(delay.py:94-96).  The per-sample ring-buffer loop (delay_kernel,
delay.py:7-22) becomes a blocked fixed-point feedback solve
(ops/ringbuf.py:feedback_delay_block).

``min_delay_ms`` is static and sets the fixed-point iteration count
K = ceil(N / min_delay_samples).  Streaming uses the spec lower bound
(1 ms, delay.py:54); file mode passes the configured delay since smoothed
params start at their targets there (engine.py builds a fresh chain per
file, engine.py:86-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel
from aefs_tpu.ops.ringbuf import feedback_delay_block_rows, rowring_rows


class StereoDelay(EffectModel):
    kind = "delay"

    # The block-row ring's row pointer advances once per block regardless
    # of params/audio — lockstep across pool slots (see EffectModel).
    LOCKSTEP_STATE = ("row",)

    # Bounds/steps from StereoDelayEffect (delay.py:48-58).
    PARAMS = {
        "delay_ms": ParamSpec(375.0, 1.0, 1499.0, smooth="step_ms", step=2.0),
        "feedback": ParamSpec(0.2, 0.0, 0.95, smooth="step", step=0.02),
        "mix_dry": ParamSpec(0.8, 0.0, 2.0),
        "mix_wet": ParamSpec(0.8, 0.0, 2.0),
        # Negative offsets (R earlier than L — reference wishlist todo:8)
        # clamp so the right lag never falls below the solver's min delay.
        "offset_ms": ParamSpec(30.0, -1499.0, 1500.0),
    }

    def __init__(self, fs, blocksize, channels=2, max_delay_ms=1500.0,
                 min_delay_ms=1.0, file_delay_ms=None, file_offset_ms=None,
                 **config):
        super().__init__(fs, blocksize, channels)
        self.max_delay_ms = float(max_delay_ms)
        self.min_delay_ms = float(min_delay_ms)
        # Ring size: int(fs * max_delay_ms / 1000) + 1 (delay.py:33).
        self.size = int(fs * self.max_delay_ms / 1000.0) + 1
        self.min_delay = max(1, int(fs * float(min_delay_ms) / 1000.0))
        # Static lags for the whole-file fast path (file mode builds fresh
        # chains whose smoothed params equal their config targets, so the
        # engine bakes the configured delay/offset in).
        self.file_lags = None
        if file_delay_ms is not None:
            # Mirror the BLOCKWISE path's float32 quantization EXACTLY
            # (process:to_samples): the smoothed runtime params are f32,
            # so the ms -> samples product must round through f32 here
            # too.  A float64 derivation disagrees by one sample when
            # the product sits on a truncation boundary (fuzz seed 363:
            # delay+offset = 494.3749872 ms -> f32 rounds to exactly
            # 494.375 -> lag 23730, f64 gives 23729.999 -> 23729; a
            # one-sample lag split between the file and blockwise paths
            # is a broadband +6 dB gap).
            f32 = np.float32
            d_l = f32(file_delay_ms)
            d_r = min(max(f32(d_l + f32(file_offset_ms or 0.0)),
                          f32(self.min_delay_ms)),
                      f32(self.max_delay_ms - 1.0))

            def lag(ms):
                d = int(f32(f32(f32(fs) * ms) / f32(1000.0)))
                return min(max(d, 1), self.size - 1)

            self.file_lags = (lag(d_l), lag(d_r))

    def init_state(self):
        # Block-row ring: one row per block, written in place — O(N) ring
        # maintenance per block instead of O(size) (the 1.5 s ring would
        # otherwise be fully rewritten every 5.3 ms block, the dominant
        # cost of batched multistream serving).
        r = rowring_rows(self.size, self.blocksize)
        return {
            "lines": jnp.zeros((2, r, self.blocksize), jnp.float32),
            "row": jnp.int32(0),
        }

    def process(self, state, p, x):
        d_l_ms = p["delay_ms"]
        d_r_ms = jnp.clip(d_l_ms + p["offset_ms"],
                          self.min_delay_ms, self.max_delay_ms - 1.0)
        fb = p["feedback"]

        def to_samples(ms):
            d = (jnp.float32(self.fs) * ms / 1000.0).astype(jnp.int32)
            return jnp.clip(d, 0, self.size - 1)  # delay.py:38-40

        d_samples = jnp.stack([to_samples(d_l_ms), to_samples(d_r_ms)])
        row = state["row"]

        # No data-dependent branching here: the smoothed delay is per-stream
        # state, so any lax.cond on it degrades to a both-branches select
        # under the multistream vmap (measured: the "fast path" cond made
        # batched steps strictly slower).  The worst-case unroll is cheap
        # at mic blocksizes (k = 6 one-hot shifts).
        wet, lines = jax.vmap(
            lambda h, xi, d: feedback_delay_block_rows(
                h, row, xi, d, fb, self.min_delay
            )
        )(state["lines"], x, d_samples)

        y = jnp.clip(p["mix_dry"] * x + p["mix_wet"] * wet, -1.0, 1.0)
        new_row = jnp.mod(row + 1, lines.shape[1])
        return {"lines": lines, "row": new_row}, y

    def process_file(self, state, p, x):
        """Whole-file fast path: with static lags the feedback echo is a
        pure lag-affine recurrence y[n] = x[n-d] + fb*y[n-d], solved by one
        residue-class associative scan per side — no fixed-point iteration,
        no per-block scan.  Requires fresh (zero) line state and the
        engine-baked static delays; falls back to the blockwise solver
        otherwise."""
        if self.file_lags is None:
            # Fall back to the blockwise fixed point only when its static
            # iteration count stays sane; otherwise the caller forgot the
            # engine's file-mode overrides (file_delay_ms/min_delay_ms).
            k = -(-x.shape[-1] // self.min_delay)
            if k > 64:
                raise ValueError(
                    "StereoDelay.process_file without baked file delays would "
                    f"unroll {k} fixed-point iterations; build the chain with "
                    "engine._file_static_overrides (file_delay_ms) for the "
                    "whole-file fast path"
                )
            return self.process(state, p, x)
        from aefs_tpu.ops.scan import lag_affine_scan

        fb = p["feedback"]
        n = x.shape[-1]
        wets = []
        writes = []
        for side, lag in enumerate(self.file_lags):
            base = jnp.concatenate(
                [jnp.zeros((lag,), x.dtype), x[side, : n - lag]]
            ) if lag < n else jnp.zeros((n,), x.dtype)
            y = lag_affine_scan(base, fb, lag)
            wets.append(y)
            writes.append(x[side] + fb * y)
        wet = jnp.stack(wets)
        w = jnp.stack(writes)
        # Reconstruct the block-row ring for the final state: slot of
        # absolute block b is b mod R; the last R blocks land rolled.
        nb = n // self.blocksize
        r = rowring_rows(self.size, self.blocksize)
        if n % self.blocksize:
            raise ValueError("file fast path requires blocksize-padded input")
        wpad = jnp.concatenate(
            [jnp.zeros((2, r * self.blocksize), x.dtype), w], axis=-1
        )[:, -r * self.blocksize :].reshape(2, r, self.blocksize)
        lines = jnp.roll(wpad, (nb - r) % r, axis=1)
        y = jnp.clip(p["mix_dry"] * x + p["mix_wet"] * wet, -1.0, 1.0)
        return {"lines": lines, "row": jnp.int32(nb % r)}, y
