"""Parallel effect branches (todo:1 wishlist feature)."""

import numpy as np
import jax.numpy as jnp

from aefs_tpu.core.chain import build_chain

from helpers import noise
from oracles import err_dbfs

FS = 48000

FILTER = {"effect_id": "f", "type": "filter",
          "params": {"filter_type": 0, "cutoff_hz": 1500, "q": 0.707}}
DELAY = {"effect_id": "d", "type": "delay",
         "params": {"delay_ms": 120, "feedback": 0.3, "mix_dry": 0.0,
                    "mix_wet": 1.0, "offset_ms": 0}}
PARALLEL = {
    "effect_id": "p", "type": "parallel",
    "params": {"gain_0": 0.6, "gain_1": 0.4},
    "branches": [[dict(FILTER)], [dict(DELAY)]],
}


def run(cfgs, x, fast=False, blocksize=512, file_opts=False):
    from aefs_tpu.core.fileopts import file_static_overrides

    chain, state, tmap = build_chain(
        cfgs, FS, blocksize, channels_in=2,
        static_overrides=file_static_overrides(cfgs) if file_opts else None,
    )
    _, out = chain.process_array(state, chain.targets(tmap), x, fast=fast)
    return out


def test_parallel_equals_sum_of_branches():
    x = noise(16 * 512, amp=0.2)
    got = run([PARALLEL], x)
    a = run([FILTER], x)
    b = run([DELAY], x)
    expect = np.clip(0.6 * a + 0.4 * b, -1, 1)
    assert err_dbfs(got, expect) <= -110, err_dbfs(got, expect)


def test_parallel_fast_path_matches_blockwise():
    # min_delay_ms keeps the blockwise fixed point small on CPU; the fast
    # path gets its static lags via file_mode recursion (core/fileopts.py).
    par = {
        "effect_id": "p", "type": "parallel",
        "params": {"gain_0": 0.6, "gain_1": 0.4},
        "branches": [
            [dict(FILTER)],
            [{"effect_id": "d", "type": "delay",
              "params": {"delay_ms": 120, "feedback": 0.3, "mix_dry": 0.0,
                         "mix_wet": 1.0, "offset_ms": 0,
                         "min_delay_ms": 100.0}}],
        ],
    }
    x = noise(8 * 4096, amp=0.2)
    slow = run([par], x, fast=False, blocksize=4096, file_opts=True)
    fast = run([par], x, fast=True, blocksize=4096, file_opts=True)
    assert err_dbfs(slow, fast) <= -80, err_dbfs(slow, fast)


def test_nested_param_update_routes_and_glides():
    chain, state, tmap = build_chain([PARALLEL], FS, 512, channels_in=2)
    model = dict(chain.effects)["p"]
    assert "b0_0_cutoff_hz" in model.PARAMS
    assert "b1_0_delay_ms" in model.PARAMS

    tmap["p"]["b0_0_cutoff_hz"] = 500.0
    targets = chain.targets(tmap)
    step = chain.step()
    x = jnp.zeros((2, 512), jnp.float32)
    for _ in range(5):
        state, _ = step(state, targets, x)
    cur = float(state["params"][0]["b0_0_cutoff_hz"])
    assert 500.0 <= cur < 1500.0  # gliding down with the mult-step spec


def test_unknown_branch_type_skipped():
    cfg = {"effect_id": "p", "type": "parallel",
           "branches": [[{"type": "nope", "params": {}}], [dict(FILTER)]],
           "params": {}}
    x = noise(4 * 512, amp=0.2)
    got = run([cfg], x)
    # branch 0 is an empty passthrough chain, branch 1 the filter
    a = run([FILTER], x)
    expect = np.clip(x + a, -1, 1)
    assert err_dbfs(got, expect) <= -110
