"""Worker capture: FOUR distinct chain topologies live in one pool.

The bench's headline hetero number prices two buckets (generic + grid
flagship) stepped in one on-device loop.  This script extends the same
measured-interleaved methodology (bench.py:bench_multistream_hetero) to
four genuinely different topology buckets — the shape of a real mixed
fleet, where every client built their own chain (the reference's core
interaction, src/backend.py:99-100):

  A. 5-effect flagship, generic octaver (live semitones)
  B. 5-effect flagship, exact-grid octaver (pool --grid bucket)
  C. "space" chain: chorus -> phaser -> reverb
  D. "dynamics" chain: compressor -> peaking EQ -> limiter

One jitted fori_loop steps ALL FOUR compiled programs per iteration;
the slope between two loop lengths prices the quartet together,
including cross-program transitions.  Density = total sessions x block
deadline / combined step.  Run on the real TPU (no platform override):

    python scripts/hetero4_capture.py [S_per_bucket=128]

Results are recorded as a worker capture in PERF.md round 5.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402  (bench.py at repo root; import has no side effects)

SPACE = [
    {"effect_id": "c", "type": "chorus",
     "params": {"rate_hz": 0.8, "depth_ms": 6.0, "mix": 0.4}},
    {"effect_id": "p", "type": "phaser",
     "params": {"rate_hz": 0.4, "min_hz": 300, "max_hz": 1500, "mix": 0.5}},
    {"effect_id": "r", "type": "reverb",
     "params": {"rt60_s": 1.6, "damp": 0.1, "pre_delay_ms": 10,
                "mix_dry": 0.8, "mix_wet": 0.35}},
]
DYNAMICS = [
    {"effect_id": "co", "type": "compressor",
     "params": {"threshold_db": -24, "ratio": 4.0, "attack_ms": 8,
                "release_ms": 120, "makeup_db": 4.0}},
    {"effect_id": "eq", "type": "filter",
     "params": {"filter_type": 3, "cutoff_hz": 2500, "q": 1.0,
                "gain_db": 3.0}},
    {"effect_id": "li", "type": "limiter",
     "params": {"ceiling_db": -1.0, "release_ms": 80.0, "drive_db": 0.0}},
]


def main(argv):
    import jax

    smoke = "--cpu" in argv
    argv = [a for a in argv if a != "--cpu"]
    if smoke:  # correctness smoke on the host (tiny S, no TPU touched)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=1")
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax import lax

    from aefs_tpu.server.pool import grid_static_overrides

    s = int(argv[1]) if len(argv) > 1 else (4 if smoke else 128)
    blocksize = 256
    flagship = bench.CONFIGS["5_five_effect"]
    buckets = [
        ("generic", flagship, None),
        ("grid", flagship, grid_static_overrides(flagship)),
        ("space", SPACE, None),
        ("dynamics", DYNAMICS, None),
    ]

    if not smoke and not bench.wait_for_device():
        print("device never became ready", file=sys.stderr)
        return 1

    built = []
    for name, cfgs, ov in buckets:
        t0 = time.time()
        _, bat, st, tg, x = bench._build_batched_serving_step(
            cfgs, s, blocksize, ov)
        built.append((name, bat, st, tg, x))
        print(f"[hetero4] built bucket {name} S={s} "
              f"({time.time()-t0:.1f}s)", file=sys.stderr)

    def loop_fn(iters):
        def many(*flat):
            states = list(flat[: len(built)])
            def body(_, carry):
                states, acc = list(carry[0]), carry[1]
                for i, (name, bat, _, tg, x) in enumerate(built):
                    states[i], y = bat(states[i], tg, x)
                    acc = acc + y[0, 0, -1]
                return tuple(states), acc
            return lax.fori_loop(
                0, iters, body, (tuple(states), jnp.float32(0.0)))
        return jax.jit(many)

    def measure(iters):
        fn = loop_fn(iters)
        args = [st for _, _, st, _, _ in built]
        out = fn(*args)
        float(out[-1])
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = fn(*args)
            float(out[-1])
            ts.append(time.time() - t0)
        return ts

    # Solo slopes first (cross-check + est_step for the contrast sizing).
    deadline = blocksize / bench.FS
    est = 4 * 0.7e-3  # ballpark: four sub-ms steps
    lo = 8
    hi = int(min(max(0.25 / est + lo, 40), 320))
    t_all, spread = bench._adaptive_slope(
        measure, lo, hi, est * 4 + 0.05, f"hetero4 S=4x{s}")
    if t_all is None:
        print("slope implausible", file=sys.stderr)
        return 1
    sustained = 4 * s * deadline / t_all
    sp_txt = f"{spread:.1f}" if spread is not None else "n/a"
    print(f"[hetero4] 4 buckets x {s} slots MEASURED interleaved: "
          f"combined step {t_all*1000:.3f} ms vs {deadline*1000:.2f} ms "
          f"deadline -> {sustained:.0f} sustained streams "
          f"(spread {sp_txt}%)", file=sys.stderr)
    print(f'{{"hetero4_streams": {sustained:.0f}, '
          f'"t_all_ms": {t_all*1000:.3f}, "spread_pct": "{sp_txt}", '
          f'"s_per_bucket": {s}}}')
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
