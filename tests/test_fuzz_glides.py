"""Parameter-glide fuzz: random A -> B retargets while streaming.

The smoothing machinery (core/params.py) is the only path by which live
control reaches the audio; these checks drive it across every effect's
FULL ParamSpec range (UI sliders cover less):

- streaming with targets B from a chain built at A stays finite for the
  whole glide (every smoothing mode: step / step_ms / mult / instant),
- the carried current params LAND EXACTLY on clamp(B) within the block
  budget (smooth_step's clamped delta makes the final step exact),
- glide A -> A is a bitwise no-op (smoothing toward the current value
  must not perturb the audio).
"""

import numpy as np
import pytest

from aefs_tpu.core.chain import build_chain
from aefs_tpu.models import EFFECT_REGISTRY

from helpers import bursts

FS = 48000
N = 256
BLOCKS = 400  # covers the slowest legal glide (release_ms 10->1000 @ 10/blk)

GLIDE_TYPES = ["delay", "reverb", "gate", "compressor", "spectral",
               "octaver", "filter", "waveshaper", "convreverb", "chorus",
               "tremolo", "phaser", "ringmod", "bitcrusher", "flanger",
               "wah", "limiter", "stereowidth"]


def draw_params(cls, rng, near=None):
    """Random params from the full ParamSpec range; with ``near`` (an A
    draw), clamped-step params are drawn within the distance one BLOCKS
    budget can traverse (the delay's step_ms glide is deliberately slow —
    ~4 samples/block, reference delay.py:78 — so a full-range retarget
    takes tens of seconds by design)."""
    p = {}
    for name, spec in cls.PARAMS.items():
        lo, hi = spec.lo, spec.hi
        if near is not None and spec.smooth in ("step", "step_ms"):
            reach = 0.8 * BLOCKS * spec.max_step(FS, None if spec.smooth
                                                 != "mult" else near[name])
            lo = max(lo, near[name] - reach)
            hi = min(hi, near[name] + reach)
        v = float(rng.uniform(lo, hi))
        if name in ("filter_type", "shape"):
            v = float(int(round(v)))
        p[name] = v
    return p


@pytest.mark.parametrize("seed", range(len(GLIDE_TYPES)))
def test_random_glide_converges_and_stays_finite(seed):
    rng = np.random.default_rng(2000 + seed)
    etype = GLIDE_TYPES[seed % len(GLIDE_TYPES)]
    cls = EFFECT_REGISTRY[etype]
    a = draw_params(cls, rng)
    b = draw_params(cls, rng, near=a)
    static = {"ir_seconds": 0.4} if etype == "convreverb" else {}

    cfg = [{"effect_id": "e", "type": etype, "params": {**static, **a}}]
    chain, state, _ = build_chain(
        cfg, FS, N, channels_in=1,
        static_overrides={"e": static} if static else None,
    )
    targets_b = chain.targets({"e": b})
    x = bursts(BLOCKS * N, amp=0.3, seed=seed)

    state, out = chain.process_array(state, targets_b, x)
    label = f"{etype} {a} -> {b}"
    assert np.all(np.isfinite(out)), label

    # every live param landed exactly on its clamped target
    for name, spec in cls.PARAMS.items():
        got = float(state["params"][0][name])
        want = spec.clamp(b[name])
        assert abs(got - want) <= 1e-5 * max(1.0, abs(want)), (
            f"{label}: {name} stuck at {got}, target {want}")

    # A -> A is bitwise a no-op
    chain2, s2, tmap2 = build_chain(
        cfg, FS, N, channels_in=1,
        static_overrides={"e": static} if static else None,
    )
    xa = bursts(8 * N, amp=0.3, seed=seed + 1)
    _, ya = chain2.process_array(s2, chain2.targets(tmap2), xa)
    chain3, s3, _ = build_chain(
        cfg, FS, N, channels_in=1,
        static_overrides={"e": static} if static else None,
    )
    _, yb = chain3.process_array(s3, chain3.targets({"e": dict(a)}), xa)
    np.testing.assert_array_equal(ya, yb, err_msg=label)
    chain.release()
    chain2.release()
    chain3.release()
