"""Shared test signal generators."""

import numpy as np


def noise(frames, channels=2, amp=0.3, seed=0):
    rng = np.random.default_rng(seed)
    return (amp * rng.standard_normal((frames, channels))).astype(np.float32)


def tones(frames, channels=2, fs=48000, freqs=(220.0, 1340.0, 6100.0), amp=0.25):
    t = np.arange(frames) / fs
    sig = sum(np.sin(2 * np.pi * f * t + i) for i, f in enumerate(freqs))
    sig = (amp * sig / len(freqs)).astype(np.float32)
    return np.repeat(sig[:, None], channels, axis=1)


def bursts(frames, channels=2, fs=48000, period=4800, duty=0.4, amp=0.5, seed=3):
    """Noise bursts with silent gaps — exercises gate open/close."""
    x = noise(frames, channels, amp, seed)
    env = (np.arange(frames) % period) < int(period * duty)
    return (x * env[:, None]).astype(np.float32)


def mono(x):
    """(frames, C) -> (frames, 1) mean downmix."""
    return x.mean(axis=1, keepdims=True).astype(np.float32)
