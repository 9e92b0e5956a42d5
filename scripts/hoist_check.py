"""A/B check: does XLA:TPU hoist loop-invariant work out of the bench's
measuring ``fori_loop``?

The official device-time methodology (bench.py:bench_file_mode) times the
slope of a ``fori_loop`` whose body reprocesses the SAME input ``xd`` every
iteration.  Anything depending only on (targets, xd) — notably the whole-file
input FFT on the conv-reverb fast path — is loop-invariant, and if XLA's
while-loop invariant code motion hoisted it, the slope would under-count
per-run work and inflate the realtime headline.  On CPU the hoist does NOT
happen (invariant vs perturbed slopes equal within noise; see PERF.md round
5); this script runs the same A/B on the real chip for the two configs whose
roofline reads over 100% of the HBM roof (flagship, conv reverb):

  A) invariant:  body processes ``xd`` exactly as bench.py does today
  B) perturbed:  body processes ``xd + 1e-30 * acc`` — ``acc`` is
     loop-carried, so the input path is structurally non-invariant; the
     numeric effect is +-1e-30 (exact zero against any non-tiny sample),
     and the added elementwise add costs ~17 us of HBM traffic per run
     against measurements of 0.6-1.2 ms.

Equal slopes => the headline methodology is hoist-free and the >100%
rooflines are pure cost-model byte overcounting.  B >> A would mean the
bench loop needs the perturbation permanently.

Run standalone on the real TPU (ONE JAX process rule — stop pool/backends
first): ``python scripts/hoist_check.py``.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import bench as B


def slope_for(name, cfgs, x, superblock, perturb):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from aefs_tpu.core.chain import build_chain

    chain, state, tmap = build_chain(
        cfgs, B.FS, superblock, channels_in=1,
        static_overrides=B.file_static_overrides(cfgs),
    )
    targets = chain.targets(tmap)
    init_cfg = {c["effect_id"]: c["params"] for c in cfgs}
    pad = (-len(x)) % superblock
    xp = np.concatenate([x, np.zeros((pad, 1), np.float32)])
    xd = jnp.asarray(xp.T)
    float(jnp.sum(xd))

    def loop_fn(iters):
        def body(_, carry):
            cst, acc = carry
            xk = xd + jnp.float32(1e-30) * acc if perturb else xd
            cst, yy = chain.process_whole(cst, targets, xk)
            return cst, acc + yy[0, -1]

        return jax.jit(lambda st0: lax.fori_loop(0, iters, body,
                                                 (st0, jnp.float32(0.0))))

    st0 = chain.init_state(init_cfg)

    def measure(iters):
        lf = loop_fn(iters)
        _, acc = lf(st0)
        float(acc)
        ts = []
        for _ in range(4):
            t0 = time.time()
            _, acc = lf(st0)
            float(acc)
            ts.append(time.time() - t0)
        return ts

    # Contrasts sized for ~250 ms of delta device work at the rehearsal's
    # measured per-run times, identical for both arms.
    lo, hi = {"5_five_effect": (3, 225), "4_conv_reverb": (3, 389)}[name]
    dev, spread = B._adaptive_slope(measure, lo, hi, 1.0, f"{name}[{perturb}]")
    return dev, spread


def main():
    B.preflight_sweep()
    if not B.wait_for_device():
        print("device never became ready", file=sys.stderr)
        sys.exit(1)
    x = B.rain_like(channels=1)
    for name in ("4_conv_reverb", "5_five_effect"):
        res = {}
        for perturb in (False, True):
            dev, spread = slope_for(name, B.CONFIGS[name], x, 4096, perturb)
            res[perturb] = dev
            B.log(f"[hoist] {name} perturb={perturb}: "
                  f"{(dev or float('nan'))*1000:.3f} ms/run"
                  f" (spread {spread if spread is None else round(spread)}%)")
        if res[False] and res[True]:
            ratio = res[True] / res[False]
            verdict = ("NO HOIST (methodology sound)" if ratio < 1.15
                       else "HOIST DETECTED — bench loop needs perturbation")
            B.log(f"[hoist] {name}: perturbed/invariant = {ratio:.3f} -> "
                  f"{verdict}")


if __name__ == "__main__":
    main()
