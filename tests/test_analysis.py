"""On-device plot analysis: spectrum peaks and chroma folding."""

import numpy as np

from aefs_tpu.utils.analysis import PlotAnalyzer, FFT_SIZE


def test_spectrum_peak_at_tone():
    fs = 48000
    an = PlotAnalyzer(fs)
    t = np.arange(FFT_SIZE * 2) / fs
    tone = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    out = an.update(tone, tone * 0.1)

    freqs = np.asarray(out["freqs"])
    spec_in = np.asarray(out["input"]["spectrum_db"])
    spec_out = np.asarray(out["output"]["spectrum_db"])
    peak_f = freqs[int(np.argmax(spec_in))]
    assert 950 < peak_f < 1060, peak_f
    # output is 20 dB quieter
    assert abs((spec_in.max() - spec_out.max()) - 20.0) < 2.0


def test_chroma_picks_pitch_class():
    fs = 48000
    an = PlotAnalyzer(fs)
    t = np.arange(FFT_SIZE * 2) / fs
    # A440 + octaves -> pitch class A (index 9)
    tone = sum(np.sin(2 * np.pi * f * t) for f in (220.0, 440.0, 880.0))
    tone = (0.3 * tone / 3).astype(np.float32)
    out = an.update(tone, tone)
    chroma = np.asarray(out["input"]["chroma"])
    assert int(np.argmax(chroma)) == 9, chroma


def test_rolling_ring_keeps_window():
    an = PlotAnalyzer(48000)
    chunk = np.ones(1000, np.float32)
    an.update(chunk, chunk)
    an.update(chunk * 2, chunk * 2)
    assert an.rings["input"][-1] == 2.0
    assert an.rings["input"][-1001] == 1.0


def test_analyze_file_windows_track_content():
    """File-scrub analysis: windows are time-local — a file whose first
    half is a 440 Hz tone and second half is an 880 Hz tone must show the
    spectral peak moving between the corresponding windows."""
    fs = 48000
    t = np.arange(fs) / fs
    first = 0.4 * np.sin(2 * np.pi * 440 * t)
    second = 0.4 * np.sin(2 * np.pi * 880 * t)
    sig = np.concatenate([first, second]).astype(np.float32)

    an = PlotAnalyzer(fs)
    res = an.analyze_file(sig, sig, min_hop_s=0.25)
    freqs = np.asarray(res["freqs"])
    spec = np.asarray(res["original"]["spectrum_db"])
    n_win = spec.shape[0]
    assert n_win >= 6
    assert res["hop_s"] * n_win >= 1.9  # windows cover the file

    def peak_hz(w):
        return freqs[np.argmax(spec[w])]

    # early windows peak near 440 Hz, late ones near 880 Hz
    assert abs(peak_hz(2) - 440) < 40, peak_hz(2)
    assert abs(peak_hz(n_win - 1) - 880) < 80, peak_hz(n_win - 1)
    # chroma rows are per-window too
    assert np.asarray(res["processed"]["chroma"]).shape == (n_win, 12)
