"""Generate the demo asset: a rain-like WAV (stand-in for the reference's
music/rain-raw.wav demo recording — 18.6 s stereo 48 kHz, README.md:29-32).

    python scripts/make_demo.py [out.wav] [--seconds 18.6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rain_scene(seconds: float, fs: int, seed: int = 11):
    """Stereo rain scene: pink-ish noise bed with slow ripple, stereo-
    panned resonant droplets, and two distant low-rumble swells — a much
    closer stand-in for the reference's 18.6 s field recording than
    plain broadband noise (and a better demo input: the droplets excite
    the delay/reverb tails audibly)."""
    import numpy as np

    n = int(seconds * fs)
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs

    # Pink-ish bed: one-pole lowpassed white mixed with the raw white,
    # decorrelated L/R, with a slow amplitude ripple.
    from scipy.signal import lfilter

    out = np.zeros((n, 2), np.float64)
    a = 0.12
    for ch in range(2):
        w = rng.standard_normal(n)
        y = lfilter([a], [1.0, -(1.0 - a)], w)
        ripple = 0.55 + 0.35 * np.sin(2 * np.pi * 0.23 * t + ch * 1.7)
        out[:, ch] = (0.5 * y + 0.05 * w) * ripple * 0.35

    # Droplets: short decaying sine pings, random freq/pan/level.
    ping_len = int(0.02 * fs)
    env = np.exp(-np.arange(ping_len) / (0.004 * fs))
    for _ in range(int(70 * seconds)):
        i = int(rng.uniform(0, n - ping_len))
        f = rng.uniform(1800, 9000)
        ping = np.sin(2 * np.pi * f * np.arange(ping_len) / fs) * env
        lvl = rng.uniform(0.02, 0.16)
        pan = rng.uniform(0.0, 1.0)
        out[i:i + ping_len, 0] += ping * lvl * (1.0 - pan)
        out[i:i + ping_len, 1] += ping * lvl * pan

    # Two distant rumbles: slow-attack lowpassed noise swells.
    for center, width, lvl in ((0.3 * seconds, 1.8, 0.25),
                               (0.72 * seconds, 2.4, 0.3)):
        g = np.exp(-0.5 * ((t - center) / width) ** 2)
        rum = rng.standard_normal(n)
        # crude lowpass: cascaded moving averages (~120 Hz corner)
        k = max(1, int(fs / 300))
        ker = np.ones(k) / k
        for _ in range(3):
            rum = np.convolve(rum, ker, mode="same")
        out[:, 0] += rum * g * lvl
        out[:, 1] += np.roll(rum, 97) * g * lvl  # decorrelated R

    peak = np.max(np.abs(out))
    return (out / peak * 0.7).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="music/rain-demo.wav")
    ap.add_argument("--seconds", type=float, default=18.6)
    args = ap.parse_args()

    from bench import FS
    from aefs_tpu.engine.wavio import write_wav_file

    audio = rain_scene(args.seconds, FS)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_wav_file(args.out, audio, FS)
    print(f"{args.out}: {args.seconds} s stereo @ {FS} Hz")


if __name__ == "__main__":
    main()
