"""Offline CLI: process a WAV through an effect chain on the TPU.

The "minimum end-to-end slice" surface (SURVEY.md §7): decode a WAV, build
a chain from a preset name or a JSON config file, scan it on-device, write
the result.

    python -m aefs_tpu.cli input.wav output.wav --preset "Rain Delay"
    python -m aefs_tpu.cli input.wav output.wav --config chain.json
    python -m aefs_tpu.cli --list-presets
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", nargs="?", help="input WAV path")
    ap.add_argument("output", nargs="?", help="output WAV path")
    ap.add_argument("--preset", help="factory preset name")
    ap.add_argument("--config", help="JSON chain-config file")
    ap.add_argument("--list-presets", action="store_true")
    ap.add_argument("--platform", default=None, help="jax platform override (cpu/axon)")
    args = ap.parse_args(argv)

    from aefs_tpu.core.config import DEFAULT_PRESETS

    if args.list_presets:
        for name, chain in DEFAULT_PRESETS.items():
            kinds = " -> ".join(c["type"] for c in chain)
            print(f"{name}: {kinds}")
        return 0

    if not args.input or not args.output:
        ap.error("input and output are required (or use --list-presets)")

    if args.platform:
        import os

        os.environ["AEFS_PLATFORM"] = args.platform
    from aefs_tpu.utils.platform import select_platform

    backend = select_platform()

    if args.config:
        with open(args.config) as f:
            chain_config = json.load(f)
    elif args.preset:
        if args.preset not in DEFAULT_PRESETS:
            ap.error(f"unknown preset {args.preset!r}; see --list-presets")
        chain_config = DEFAULT_PRESETS[args.preset]
    else:
        chain_config = []

    from aefs_tpu.engine.engine import process_offline
    from aefs_tpu.engine.wavio import read_wav_file, write_wav_file

    audio, fs = read_wav_file(args.input)
    print(f"{args.input}: {audio.shape[0]/fs:.2f} s @ {fs} Hz, "
          f"{audio.shape[1] if audio.ndim > 1 else 1} ch (backend: {backend})")

    t0 = time.time()
    _, out = process_offline(chain_config, audio, fs)
    dt = time.time() - t0
    write_wav_file(args.output, out, fs)
    rtf = (audio.shape[0] / fs) / dt
    print(f"{args.output}: processed in {dt*1000:.1f} ms ({rtf:.0f}x realtime)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
