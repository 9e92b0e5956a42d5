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
divergence is a real defect.  Tolerances: -80 dBFS for octaver-free
chains (every other effect's solvers are exact to float32 rounding).
Chains holding an octaver carry its generic float32 phase floor
(~-70 dBFS between block decompositions — see
test_effects_parity.test_octaver_generic_blocksize_invariance for the
pinned single-effect bound), which downstream effects can legitimately
amplify (a driven waveshaper is a ×drive Lipschitz map; a gate's
binary threshold select can flip on eps-level diffs), so those chains
assert a -40 dBFS sanity bound plus finiteness.  This fuzzer caught a
real defect on its first run: a scrambled TwoSum in the octaver's
phasor carry (models/octaver.py:_two_sum) drifting eps/2 per block —
-37 dBFS blocking invariance at some semitones.
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
    ("spectral", {}),
    ("octaver", {}),
    ("filter", {}),
    ("waveshaper", {}),
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


def random_chain(rng, allow_parallel=False):
    n_fx = int(rng.integers(1, 5))
    cfgs = []
    for i in range(n_fx):
        if allow_parallel and rng.random() < 0.5:
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
    has_octaver = any(c["type"] == "octaver" for c in flat)
    return cfgs, has_octaver


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
    cfgs, has_octaver = random_chain(rng, allow_parallel=seed >= 6)
    label = " -> ".join(
        f"{c['type']}({', '.join(f'{k}={v:.3g}' for k, v in c['params'].items())})"
        for c in cfgs
    )
    x = bursts(N, amp=0.3, seed=seed)
    tol = -40 if has_octaver else -80  # see module docstring

    blockwise = run(cfgs, x, fast=False, blocksize=4096)
    assert np.all(np.isfinite(blockwise)), label

    fast = run(cfgs, x, fast=True, blocksize=4096)
    assert np.all(np.isfinite(fast)), label
    gap = err_dbfs(blockwise, fast)
    assert gap <= tol, f"fast-vs-blockwise {gap:.1f} dBFS: {label}"

    # Blocking invariance: the streaming blocksize must be semantically
    # invisible.
    streaming = run(cfgs, x, fast=False, blocksize=256)
    gap = err_dbfs(blockwise, streaming)
    assert gap <= tol, f"blocking invariance {gap:.1f} dBFS: {label}"
