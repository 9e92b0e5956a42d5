"""Multiband crossover (core/multiband.py): Linkwitz-Riley splits over
the parallel container.

The contract is the LR identity: with EMPTY band sub-chains the bands
must sum back to an allpass — flat magnitude — and with per-band
dynamics the bands must act independently.
"""

import numpy as np
import pytest

from aefs_tpu.core.chain import build_chain
from aefs_tpu.core.multiband import expand_multiband

from helpers import noise

FS = 48000
N = 256


def _run(cfgs, x, blocksize=4096, fast=False):
    chain, state, tmap = build_chain(cfgs, FS, blocksize,
                                     channels_in=x.shape[1])
    _, out = chain.process_array(state, chain.targets(tmap), x, fast=fast)
    return np.asarray(out)


def _impulse(n=65536):
    x = np.zeros((n, 2), np.float32)
    x[1024] = 1.0
    return x


@pytest.mark.parametrize("xover", [[1000.0], [250.0, 2500.0]])
def test_bare_crossover_sums_allpass_flat(xover):
    """Empty bands: |H(f)| == 1 across the band (the LR4 low+high sum is
    a pure allpass; 3-band adds the low-branch AP(f2) phase match)."""
    cfg = [{"effect_id": "mb", "type": "multiband",
            "crossover_hz": xover, "branches": []}]
    y = _run(cfg, _impulse())
    h = np.fft.rfft(y[:, 0], 65536)
    f = np.fft.rfftfreq(65536, 1.0 / FS)
    band = (f > 20.0) & (f < 20000.0)
    mag = np.abs(h[band])
    err = float(np.max(np.abs(mag - 1.0)))
    assert err < 2e-3, err  # float32 biquad cascades


def test_crossover_band_isolation():
    """A tone well inside one band leaves through that band's gain."""
    t = np.arange(4 * 4096) / FS
    lo = 0.4 * np.sin(2 * np.pi * 60 * t)
    hi = 0.4 * np.sin(2 * np.pi * 8000 * t)
    x = np.stack([lo + hi, lo + hi], 1).astype(np.float32)
    cfg = [{"effect_id": "mb", "type": "multiband",
            "crossover_hz": [1000.0], "branches": [],
            "params": {"gain_0": 0.0, "gain_1": 1.0}}]  # mute the low band
    y = _run(cfg, x)
    spec = np.abs(np.fft.rfft(y[4096:, 0]))
    f = np.fft.rfftfreq(len(y) - 4096, 1.0 / FS)
    lo_pk = spec[np.argmin(np.abs(f - 60))]
    hi_pk = spec[np.argmin(np.abs(f - 8000))]
    assert lo_pk < 0.02 * hi_pk, (lo_pk, hi_pk)


def test_multiband_compressor_acts_per_band():
    """Multiband compression: a loud low band is squashed while the
    quiet high band passes — the mastering use case."""
    t = np.arange(8 * 4096) / FS
    lo = 0.9 * np.sin(2 * np.pi * 80 * t)
    hi = 0.05 * np.sin(2 * np.pi * 6000 * t)
    x = np.stack([lo + hi, lo + hi], 1).astype(np.float32)
    comp = {"effect_id": "c", "type": "compressor",
            "params": {"threshold_db": -18.0, "ratio": 8.0, "attack_ms": 2.0,
                       "release_ms": 100.0, "knee_db": 2.0, "makeup_db": 0.0}}
    cfg = [{"effect_id": "mb", "type": "multiband",
            "crossover_hz": [1000.0], "branches": [[comp], []]}]
    y = _run(cfg, x)
    spec_in = np.abs(np.fft.rfft(x[4 * 4096:, 0]))
    spec_out = np.abs(np.fft.rfft(y[4 * 4096:, 0]))
    f = np.fft.rfftfreq(4 * 4096, 1.0 / FS)
    i_lo, i_hi = np.argmin(np.abs(f - 80)), np.argmin(np.abs(f - 6000))
    lo_gain = spec_out[i_lo] / spec_in[i_lo]
    hi_gain = spec_out[i_hi] / spec_in[i_hi]
    assert lo_gain < 0.5, lo_gain        # low band compressed hard
    assert 0.8 < hi_gain < 1.2, hi_gain  # high band untouched


def test_multiband_fast_path_and_streaming_consistent():
    """The expansion rides the parallel container, so the whole-file
    fast path and 256-sample streaming agree like any other chain.
    The bar is the biquad conditioning envelope the fuzzer uses
    (~eps/(1-r)^2 + 26 dB slack, test_fuzz_topologies.chain_tolerance):
    a 250 Hz Butterworth stage floors at ~-73, the 3-band tree
    cascades/sums several such stages -> envelope ~-47 (measured -47.9
    stream on the bare crossover), and the mid band's drive-4 shaper is
    a +12 dB Lipschitz map on that floor -> -35.9 measured."""
    x = noise(8 * 4096)
    cfg = [{"effect_id": "mb", "type": "multiband",
            "crossover_hz": [250.0, 2500.0],
            "branches": [[], [{"effect_id": "w", "type": "waveshaper",
                               "params": {"drive": 4.0, "shape": 1,
                                          "mix": 1.0, "out_gain": 1.0}}],
                         []]}]
    bw = _run(cfg, x, blocksize=4096)
    ft = _run(cfg, x, blocksize=4096, fast=True)
    st = _run(cfg, x, blocksize=256)
    pk = float(np.max(np.abs(bw)))
    for other, name in ((ft, "fast"), (st, "stream")):
        gap = float(np.max(np.abs(bw - other))) / max(pk, 0.3)
        assert gap < 10 ** (-30 / 20.0), (name, 20 * np.log10(gap))


def test_anonymous_multiband_gets_file_mode_overrides():
    """A multiband WITHOUT an effect_id must still receive its file-mode
    static overrides: build_chain and fileopts both fall back to the
    positional fx{i} id, and the expansion must not desync them (it
    previously invented the id 'mb', so the file_mode flag keyed as fx0
    never reached the container — a branch delay then failed whole-file
    renders outright).  With and without an id must render bitwise
    identically."""
    from aefs_tpu.core.fileopts import file_static_overrides

    x = noise(8 * 4096)

    def cfg(with_id):
        base = {"type": "multiband", "crossover_hz": [250.0],
                "branches": [[{"effect_id": "bd", "type": "delay",
                               "params": {"delay_ms": 120.0,
                                          "feedback": 0.4,
                                          "mix_dry": 1.0, "mix_wet": 0.6,
                                          "offset_ms": 0.0}}], []]}
        if with_id:
            base["effect_id"] = "m"
        return [base]

    outs = []
    for with_id in (True, False):
        c = cfg(with_id)
        chain, state, tmap = build_chain(
            c, FS, 4096, channels_in=x.shape[1],
            static_overrides=file_static_overrides(c))
        _, out = chain.process_array(state, chain.targets(tmap), x,
                                     fast=True)
        outs.append(np.asarray(out))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_expand_validation():
    with pytest.raises(ValueError):
        expand_multiband({"crossover_hz": [2500.0, 250.0]})  # descending
    with pytest.raises(ValueError):
        expand_multiband({"crossover_hz": [100.0, 200.0, 400.0]})
    with pytest.raises(ValueError):
        expand_multiband({"crossover_hz": [100.0],
                          "branches": [[], [], []]})  # 3 branches, 2 bands


def test_crossover_is_live_param():
    """The expanded splitter cutoffs are lifted live params — a
    crossover move is an update_param, no rebuild."""
    cfg = [{"effect_id": "mb", "type": "multiband",
            "crossover_hz": [1000.0], "branches": []}]
    chain, state, tmap = build_chain(cfg, FS, N, channels_in=2)
    assert "b0_0_cutoff_hz" in tmap["mb"]
    assert tmap["mb"]["b0_0_cutoff_hz"] == 1000.0
