"""Generate the demo asset: a rain-like WAV (stand-in for the reference's
music/rain-raw.wav demo recording — 18.6 s stereo 48 kHz, README.md:29-32).

    python scripts/make_demo.py [out.wav] [--seconds 18.6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="music/rain-demo.wav")
    ap.add_argument("--seconds", type=float, default=18.6)
    args = ap.parse_args()

    from bench import rain_like, FS
    from aefs_tpu.engine.wavio import write_wav_file

    audio = rain_like(args.seconds, channels=2)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_wav_file(args.out, audio, FS)
    print(f"{args.out}: {args.seconds} s stereo @ {FS} Hz")


if __name__ == "__main__":
    main()
