"""Multiband processing: a Linkwitz-Riley crossover expressed as a
config expansion over the parallel container (new in this build — the
reference has neither; this is the mastering-chain band-split that
makes multiband compression possible).

A ``multiband`` config names 1 or 2 crossover frequencies and one
sub-chain per band:

    {"effect_id": "mb", "type": "multiband",
     "crossover_hz": [250.0, 2500.0],
     "branches": [[...low fx], [...mid fx], [...high fx]],
     "params": {"gain_0": 1.0, ...}}

``expand_multiband`` rewrites it into a standard ``parallel`` config
whose branches start with the splitter biquads, so EVERY existing
mechanism — build_chain, the whole-file fast path, lifted live params,
the pool, checkpoints, the SPA's parallel-branch cards — applies
unchanged.  The crossover points are live smoothed parameters, but the
LR4 flatness identity holds only while EVERY splitter stage at a split
moves in lockstep: to retune the 2-band split retarget all four of
``b0_0_cutoff_hz``/``b0_1_cutoff_hz``/``b1_0_cutoff_hz``/
``b1_1_cutoff_hz`` to the same value (3-band: the six f1 stages
``b0_0, b0_1, b1_0, b1_1, b2_0, b2_1``, or the f2 stages
``b0_2, b1_2, b1_3, b2_2, b2_3``).  Moving a single stage detunes one
branch's poles against its complement and ripples the summed magnitude
around the split.

Splitter topology (LR4 = two cascaded Butterworth Q=1/sqrt(2) biquads
per side; models/biquad.py types 0/1/6):

- 2-band at f1:   low = LP2(f1)x2;  high = HP2(f1)x2.
  LR4 low+high sum to the 2nd-order allpass A(f1) — flat magnitude.
- 3-band at f1<f2 (tree split):
  low  = LP2(f1)x2 + AP(f2)        (phase-matches the second split)
  mid  = HP2(f1)x2 + LP2(f2)x2
  high = HP2(f1)x2 + HP2(f2)x2
  Sum = A(f1)*A(f2) — flat magnitude, tested to ~1e-3 in float32
  (tests/test_multiband.py).

Reference for the LR identity: LP4_LR(s) + HP4_LR(s) = A2(s) with the
same Butterworth poles — standard crossover literature, re-derived in
the flatness test rather than cited.
"""

from __future__ import annotations

_BW_Q = 0.7071067811865476  # 1/sqrt(2): Butterworth halves of an LR4


def _stage(eid: str, ftype: int, fc: float) -> dict:
    return {
        "effect_id": eid,
        "type": "filter",
        "params": {"filter_type": float(ftype), "cutoff_hz": float(fc),
                   "q": _BW_Q, "gain_db": 0.0},
    }


def expand_multiband(cfg: dict) -> dict:
    """Rewrite a ``multiband`` config into a ``parallel`` config with
    LR4 splitter biquads prepended to each band's sub-chain."""
    xover = [float(f) for f in cfg.get("crossover_hz", [1000.0])]
    if not 1 <= len(xover) <= 2:
        raise ValueError(
            f"multiband supports 1 or 2 crossover_hz (2-3 bands), "
            f"got {xover!r}"
        )
    if len(xover) == 2 and not xover[0] < xover[1]:
        raise ValueError(f"crossover_hz must be ascending, got {xover!r}")
    n_bands = len(xover) + 1
    branches = list(cfg.get("branches", []))
    if len(branches) > n_bands:
        raise ValueError(
            f"{len(branches)} branches for {n_bands} bands "
            f"(crossover_hz={xover!r})"
        )
    branches += [[] for _ in range(n_bands - len(branches))]
    # Preserve the ABSENCE of effect_id: build_chain and fileopts both
    # fall back to the positional fx{i} for anonymous configs, and the
    # expansion must not desync them (an invented 'mb' id here made
    # fileopts key the file_mode override as fx{i} while build_chain
    # looked up 'mb' — anonymous multibands lost their file-mode statics
    # and failed whole-file renders).  The tag only names the internal
    # splitter stages.
    eid = cfg.get("effect_id")
    tag = eid or "mb"

    if n_bands == 2:
        f1 = xover[0]
        splits = [
            [_stage(f"{tag}_lp1", 0, f1), _stage(f"{tag}_lp2", 0, f1)],
            [_stage(f"{tag}_hp1", 1, f1), _stage(f"{tag}_hp2", 1, f1)],
        ]
    else:
        f1, f2 = xover
        splits = [
            [_stage(f"{tag}_l1", 0, f1), _stage(f"{tag}_l2", 0, f1),
             _stage(f"{tag}_lap", 6, f2)],
            [_stage(f"{tag}_m1", 1, f1), _stage(f"{tag}_m2", 1, f1),
             _stage(f"{tag}_m3", 0, f2), _stage(f"{tag}_m4", 0, f2)],
            [_stage(f"{tag}_h1", 1, f1), _stage(f"{tag}_h2", 1, f1),
             _stage(f"{tag}_h3", 1, f2), _stage(f"{tag}_h4", 1, f2)],
        ]

    out = {
        "type": "parallel",
        "branches": [sp + list(user) for sp, user in zip(splits, branches)],
        "params": dict(cfg.get("params", {})),
    }
    if eid is not None:
        out["effect_id"] = eid
    return out
