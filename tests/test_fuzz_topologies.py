"""Differential fuzz over random chain topologies.

The fixed-chain suites pin known configurations; this fuzzer generates
seeded random chains (length, effect types, params drawn uniformly from
each model's own ParamSpec bounds) and checks the framework's two core
internal-consistency contracts on each:

- whole-file fast path == blockwise superblock scan (the fast path's
  closed forms are only trusted because the blockwise path is
  oracle-verified — test_fastpath.py rationale), and
- 256-sample streaming == 4096-superblock blockwise (blocking
  invariance: per-sample semantics never depend on the dispatch size).

No oracle is needed: both sides consume identical configs, so ANY
divergence is a real defect.  The bar is PEAK-RELATIVE (``relative_gap``:
error normalized by the blockwise output's own peak, floored at the
input amplitude) so chain amplitude amplification — a wet rt60-9s reverb
adds +24 dB — neither eats nor loosens the contract.  Tolerances come
from ``chain_tolerance``: -70 relative baseline (== the -80 dBFS
absolute bar at input-level outputs), relaxed only for documented
float32 floors — the octaver's generic phase path, the chorus's
absolute-delay quantization, and the biquad's recurrence conditioning
~eps/(1-pole_radius)^2 at high-Q draws; chains whose allowance passes
-22 assert finiteness only.  Downstream effects can still legitimately
amplify a floor (a driven waveshaper is a ×drive Lipschitz map; a
gate's binary threshold select can flip on eps-level diffs).

Defects this fuzzer has caught: (1) a scrambled TwoSum in the octaver's
phasor carry (models/octaver.py:_two_sum) drifting eps/2 per block —
-37 dBFS blocking invariance at some semitones; (2) catastrophic
float32 instability in the log-doubling AR(2) impulse used by the
biquad's file solve — NaN output at legal high-Q draws (now closed-form,
ops/scan.py:ar2_impulse).
"""

import numpy as np
import pytest

from aefs_tpu.core.chain import build_chain
from aefs_tpu.engine.engine import _file_static_overrides

from helpers import bursts
from oracles import err_dbfs

FS = 48000
N = 8 * 4096

# (type, static overrides for build) — statics keep the fuzz bounded
# (convreverb IR length is topology, not a live param).
FUZZ_TYPES = [
    ("delay", {}),
    ("reverb", {}),
    ("gate", {}),
    ("compressor", {}),
    ("chorus", {}),
    ("tremolo", {}),
    ("phaser", {}),
    ("spectral", {}),
    ("octaver", {}),
    ("filter", {}),
    ("waveshaper", {}),
    ("ringmod", {}),
    ("bitcrusher", {}),
    ("flanger", {}),
    ("wah", {}),
    ("limiter", {"lookahead_ms": 3.0}),
    ("stereowidth", {}),
    ("convreverb", {"ir_seconds": 0.4}),
]


def random_effect(rng, eid):
    from aefs_tpu.models import EFFECT_REGISTRY

    etype, static = FUZZ_TYPES[int(rng.integers(len(FUZZ_TYPES)))]
    cls = EFFECT_REGISTRY[etype]
    params = dict(static)
    for name, spec in cls.PARAMS.items():
        v = float(rng.uniform(spec.lo, spec.hi))
        if name in ("filter_type", "shape"):
            v = float(int(round(v)))
        if etype == "octaver" and name == "semitones" and rng.random() < 0.4:
            v = float(rng.choice([-24.0, -12.0, 0.0, 12.0, 24.0]))
        params[name] = v
    return {"effect_id": eid, "type": etype, "params": params}


def random_multiband(rng, eid):
    """A multiband container with random crossover(s) and 0-2 random
    effects per band (core/multiband.py expands it at build)."""
    f1 = float(np.exp(rng.uniform(np.log(100.0), np.log(4000.0))))
    xover = [f1]
    if rng.random() < 0.5:
        xover.append(f1 * float(rng.uniform(2.0, 6.0)))
    branches = [
        [random_effect(rng, f"{eid}b{bi}e{j}")
         for j in range(int(rng.integers(0, 3)))]
        for bi in range(len(xover) + 1)
    ]
    return {"effect_id": eid, "type": "multiband",
            "crossover_hz": xover, "branches": branches,
            "params": {f"gain_{bi}": float(rng.uniform(0.0, 2.0))
                       for bi in range(len(xover) + 1)}}


def random_chain(rng, allow_parallel=False):
    n_fx = int(rng.integers(1, 5))
    cfgs = []
    for i in range(n_fx):
        if allow_parallel and rng.random() < 0.5:
            if rng.random() < 0.4:
                cfgs.append(random_multiband(rng, f"fx{i}"))
                continue
            branches = [
                [random_effect(rng, f"fx{i}b{bi}e{j}")
                 for j in range(int(rng.integers(1, 3)))]
                for bi in range(2)
            ]
            cfgs.append({
                "effect_id": f"fx{i}", "type": "parallel",
                "params": {"gain_0": float(rng.uniform(0, 2)),
                           "gain_1": float(rng.uniform(0, 2))},
                "branches": branches,
            })
        else:
            cfgs.append(random_effect(rng, f"fx{i}"))
    flat = []
    for c in cfgs:
        flat.append(c)
        for b in c.get("branches", []):
            flat.extend(b)
    return cfgs, chain_tolerance(flat)


def _biquad_conditioning_tol(params, exponent=2):
    """Conditioning envelope of a biquad recurrence from the MODEL's own
    coefficient formulas: ~eps/(1-r)^exponent + 26 dB slack (all seven
    RBJ types — shelves/peak move the denominator with gain).  exponent
    2 models a single drawn filter; 3 models SAME-POLE cascades (each
    extra stage resonates the previous stage's error at its own pole —
    measured: HP110 x2 streaming gap -22 vs the single-stage envelope's
    -39, matching the cubed form's -25)."""
    from aefs_tpu.models import BiquadFilter

    mdl = BiquadFilter(FS, 4096)
    prm = {k: float(v) for k, v in params.items()}
    prm.setdefault("gain_db", 0.0)
    _, _, _, a1, a2 = (float(v) for v in mdl.coefficients(prm))
    r = float(np.max(np.abs(np.roots([1.0, a1, a2]))))
    est = 20.0 * np.log10(6e-8 / max(1.0 - r, 1e-9) ** exponent) + 26.0
    return min(est, 0.0)


def relative_gap(ref, other, floor_amp=0.3):
    """Consistency gap in dB RELATIVE to the reference decomposition's own
    peak (floored at the test-signal amplitude so near-silent outputs
    keep an absolute contract): amplitude amplification along the chain
    (a wet reverb at rt60 ~9 s can add +24 dB) must not eat the bar, and
    must not loosen it either."""
    pk = max(float(np.max(np.abs(np.asarray(ref)))), floor_amp)
    return err_dbfs(ref, other) - 20.0 * np.log10(pk)


def chain_tolerance(flat):
    """Consistency tolerance for a fuzzed chain, from the drawn params —
    or None for finiteness-only.  The bar is on the PEAK-RELATIVE gap
    (see relative_gap), so per-effect floors compose under amplitude
    amplification without bookkeeping chain gain.

    Relative floors (measured; typical chains peak near the 0.3 input):
    - base -70 (== the -80 dBFS absolute bar at input-level outputs);
    - octaver: generic phase path floor, -30 relative;
    - chorus: f32 absolute-delay quantization ~1e-4 samples at the 50 ms
      reach times full-band slope — isolated measurement -48 relative
      on noise; floor -42;
    - biquad at near-unit pole radius: the recurrence's own conditioning
      ~eps/(1-r)^2 (a relative quantity) plus 26 dB slack, validated
      against measured gaps (ops/scan.py ar2_impulse docstring).
    Chains whose allowance passes -22 carry no usable signal-level
    contract — assert finiteness only.
    """
    tol = -70.0
    lip_db_total = 0.0
    for c in flat:
        if c["type"] == "octaver":
            tol = max(tol, -30.0)
        elif c["type"] == "chorus":
            tol = max(tol, -42.0)
        elif c["type"] == "flanger":
            # The chorus's f32 absolute-delay tap floor, recirculated
            # with the comb's resonant gain 1/(1-|fb|).
            res = 1.0 / max(1.0 - abs(c["params"]["feedback"]), 1e-3)
            tol = max(tol, -42.0 + 20.0 * np.log10(res))
        elif c["type"] == "filter":
            tol = max(tol, _biquad_conditioning_tol(c["params"]))
        elif c["type"] == "multiband":
            # The expansion prepends LR4 splitter biquads (Q=1/sqrt 2)
            # at each crossover — SAME-POLE cascades (two stages per
            # side), so the cascade exponent applies; worst at the
            # lowest crossover.  Low crossovers (~<350 Hz) legitimately
            # drop to finiteness-only: DF1 float32 at those pole radii
            # is the conditioning reality, not a framework defect.
            for f in c["crossover_hz"]:
                tol = max(tol, _biquad_conditioning_tol(
                    {"filter_type": 0.0, "cutoff_hz": f, "q": 0.7071},
                    exponent=3))
        elif c["type"] == "bitcrusher" and c is not flat[0]:
            # round() is discontinuous: an eps-level upstream difference
            # (even plain f32 reassociation) landing on a tie boundary
            # flips one full quantization level — 2^(1-bits).  32k noise
            # samples hit a 1e-7-wide boundary often enough to matter at
            # low bit depths; a FIRST-position crusher sees bitwise
            # identical input in every decomposition, so no allowance.
            # +12 dB: the gap is normalized by the output peak (>= the
            # 0.3 floor), which sits below full scale where the flip
            # magnitude is defined.
            flip = 20.0 * np.log10(2.0 ** (1.0 - c["params"]["bits"]))
            tol = max(tol, flip + 12.0)
        elif c["type"] == "waveshaper":
            # A driven shaper is a x(drive*mix*out_gain) Lipschitz map
            # that COMPRESSES peaks — it amplifies an upstream floor
            # while shrinking the normalizer, so the allowance must carry
            # its gain explicitly.
            lip = max(
                1.0,
                c["params"]["drive"] * c["params"]["mix"]
                * c["params"]["out_gain"],
            )
            lip_db_total += 20.0 * np.log10(lip)
            if tol > -70.0:  # an effect floor is already in play
                tol += 20.0 * np.log10(lip)
    # Even with no per-effect floor upstream, stacked shaper gain
    # amplifies plain f32 reassociation noise (~-125 dB relative,
    # measured) past the -70 base: two ~90x drives are +85 dB (campaign
    # seeds 133/171, measured gaps -56/-67 against the old flat -70).
    tol = max(tol, -125.0 + lip_db_total)
    return None if tol > -22.0 else tol


def run(cfgs, x, fast, blocksize):
    chain, state, tmap = build_chain(
        cfgs, FS, blocksize, channels_in=x.shape[1],
        static_overrides=_file_static_overrides(cfgs),
    )
    _, out = chain.process_array(state, chain.targets(tmap), x, fast=fast)
    return out


@pytest.mark.parametrize("seed", range(8))
def test_random_topology_consistency(seed):
    # The last two seeds may wrap sub-effects in parallel containers
    # (branch params lifted as b<i>_<j>_<name> — models/parallel_chain.py).
    rng = np.random.default_rng(1000 + seed)
    cfgs, tol = random_chain(rng, allow_parallel=seed >= 6)
    label = " -> ".join(
        f"{c['type']}({', '.join(f'{k}={v:.3g}' for k, v in c['params'].items())})"
        for c in cfgs
    )
    x = bursts(N, amp=0.3, seed=seed)

    blockwise = run(cfgs, x, fast=False, blocksize=4096)
    assert np.all(np.isfinite(blockwise)), label

    fast = run(cfgs, x, fast=True, blocksize=4096)
    assert np.all(np.isfinite(fast)), label

    # Blocking invariance: the streaming blocksize must be semantically
    # invisible.
    streaming = run(cfgs, x, fast=False, blocksize=256)
    assert np.all(np.isfinite(streaming)), label

    if tol is not None:  # see chain_tolerance (peak-relative bar)
        gap = relative_gap(blockwise, fast)
        assert gap <= tol, f"fast-vs-blockwise {gap:.1f} dB > {tol:.1f}: {label}"
        gap = relative_gap(blockwise, streaming)
        assert gap <= tol, f"blocking invariance {gap:.1f} dB > {tol:.1f}: {label}"
