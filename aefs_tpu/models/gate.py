"""Noise gate with stereo-linked detection (parity target: reference gate.py).

The reference's per-sample loop (gate_kernel, gate.py:6-42) selects the
attack or release coefficient by comparing the running gain to the binary
target.  Because the target is always 0 or 1 and the gain stays in [0, 1],
that branch is equivalent to selecting on the *target alone*:

    target = 1:  gain < 1 -> attack; gain == 1 -> either branch yields 1
    target = 0:  gain < 0 impossible -> always release

so the whole gate is a first-order affine recurrence with per-sample
coefficients that depend only on the input — an associative scan, not a
sequential loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aefs_tpu.core.params import ParamSpec
from aefs_tpu.models.base import EffectModel
from aefs_tpu.ops.scan import affine_hillis, affine_scan_long


class NoiseGate(EffectModel):
    kind = "gate"

    # Bounds/steps from NoiseGateEffect (gate.py:48-50, :73-75).
    PARAMS = {
        "threshold_db": ParamSpec(-40.0, -80.0, 0.0, smooth="step", step=1.0),
        "attack_ms": ParamSpec(10.0, 1.0, 500.0, smooth="step", step=5.0),
        "release_ms": ParamSpec(100.0, 10.0, 1000.0, smooth="step", step=10.0),
    }

    def init_state(self):
        # Gate starts closed (gate.py:53).
        return {"gain": jnp.float32(0.0)}

    def _coeff(self, time_ms):
        """1-pole coefficient 1 - exp(-2.2 / (t * fs)) (gate.py:63-69)."""
        t = jnp.maximum(1e-3, time_ms * 1e-3)
        return 1.0 - jnp.exp(-2.2 / (t * jnp.float32(self.fs)))

    def process(self, state, p, x):
        thresh = jnp.power(10.0, p["threshold_db"] / 20.0)
        att = self._coeff(p["attack_ms"])
        rel = self._coeff(p["release_ms"])

        level = jnp.max(jnp.abs(x), axis=0)  # stereo-linked (gate.py:21-25)
        open_ = level > thresh
        mult = jnp.where(open_, 1.0 - att, 1.0 - rel)
        add = jnp.where(open_, att, 0.0)
        # Mic blocks: hand-rolled Hillis over lanes (affine_hillis) — the
        # associative_scan Blelloch lowering's strided lane slices cost a
        # layout pass each, ~2.5x of this op on the batched serving step.
        long = x.shape[-1] >= 4096
        scan = affine_scan_long if long else affine_hillis
        gain = scan(mult, add, state["gain"])

        if long:
            # Materialize the gain curve before the stereo broadcast: XLA
            # otherwise duplicates the producer chain into each consumer
            # fusion of y (profiled on the flagship file pass; the barrier
            # trades one (N,) write for recomputing the scan tail twice).
            gain = jax.lax.optimization_barrier(gain)
        return {"gain": gain[-1]}, x * gain[None, :]
