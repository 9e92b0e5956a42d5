"""Learned spectral noise profiles (learn_noise — no reference
counterpart; the reference gates every bin against one global threshold,
spectral.py:68).  Covers: the zero-profile bitwise-identity guarantee,
float64-oracle parity with a learned profile installed, functional noise
suppression a scalar threshold cannot express, the engine's WAV and
live-capture learning paths, and checkpoint/resume carriage."""

import base64
import threading

import numpy as np
import pytest

from aefs_tpu.core.chain import build_chain
from aefs_tpu.models.spectral import measure_noise_profile

from helpers import noise, tones
from oracles import OracleSpectral, run_oracle_blocks, err_dbfs

FS = 48000
N = 256
FRAMES = 40 * N

SPECTRAL = {"effect_id": "s", "type": "spectral",
            "params": {"threshold_db": -80.0, "reduction": 0.0,
                       "profile_over_db": 6.0}}


def run_chain(cfg, x, static_overrides=None):
    chain, state, tmap = build_chain(
        [cfg], FS, N, channels_in=x.shape[1], channels_out=2,
        static_overrides=static_overrides,
    )
    targets = chain.targets(tmap)
    _, out = chain.process_array(state, targets, x)
    return out


def _room_tone(frames, seed=11, amp=0.02):
    """Stationary colored noise — the 'be quiet' capture."""
    x = noise(frames, channels=1, amp=amp, seed=seed)[:, 0]
    # Mild low-pass color so the profile is not flat across bins.
    return np.convolve(x, np.ones(4, np.float32) / 4.0, "same").astype(
        np.float32)


def test_zero_profile_is_bitwise_identity():
    """max(thresh, 0) == thresh exactly: installing an all-zero profile
    cannot change a single sample."""
    x = noise(FRAMES, amp=0.1) + tones(FRAMES, fs=FS, amp=0.2)
    x = x.astype(np.float32)
    base = run_chain(SPECTRAL, x)
    zeros = np.zeros(N + 1, np.float32)
    got = run_chain(SPECTRAL, x,
                    static_overrides={"s": {"noise_profile": zeros}})
    assert np.array_equal(base, got)


def test_profile_parity_vs_oracle():
    room = _room_tone(FS)
    profile = measure_noise_profile(room, hop=N)
    x = (noise(FRAMES, amp=0.02, seed=11)
         + tones(FRAMES, fs=FS, amp=0.25)).astype(np.float32)
    got = run_chain(SPECTRAL, x,
                    static_overrides={"s": {"noise_profile": profile}})
    oracle = OracleSpectral(FS, hop=N, noise_profile=profile,
                            **SPECTRAL["params"])
    ref = run_oracle_blocks(oracle, x.astype(np.float64), N)
    assert err_dbfs(got, ref) <= -80, err_dbfs(got, ref)


def test_profile_suppresses_noise_scalar_threshold_cannot():
    """Broadband room tone + one strong tone, with the global threshold
    BELOW the noise floor (so the scalar gate passes everything): the
    learned profile mutes the noise bins while the tone sails over the
    margin.  12 dB margin: per-frame bin magnitudes are Rayleigh-ish
    around the learned mean, so 6 dB lets tail frames through (measured
    ~-12 dB suppression); at 4x the mean the exceedance probability is
    ~4e-6 and the band collapses."""
    room = _room_tone(FS)
    profile = measure_noise_profile(room, hop=N)
    t = np.arange(FRAMES) / FS
    tone = (0.3 * np.sin(2 * np.pi * 1125.0 * t)).astype(np.float32)
    x = (_room_tone(FRAMES, seed=12)[:FRAMES] + tone)[:, None]

    cfg = {"effect_id": "s", "type": "spectral",
           "params": {**SPECTRAL["params"], "profile_over_db": 12.0}}
    flat = run_chain(cfg, x)  # threshold -80 dB: everything passes
    prof = run_chain(cfg, x,
                     static_overrides={"s": {"noise_profile": profile}})

    def band_energy(y, lo_hz, hi_hz):
        # Steady state only: the mask initializes at ones and decays as
        # alpha^k, so the first ~20 frames pass noise in BOTH builds.
        tail = y[FRAMES // 2:, 0].astype(np.float64)
        spec = np.abs(np.fft.rfft(tail))
        f = np.fft.rfftfreq(len(tail), 1.0 / FS)
        return float(np.sum(spec[(f >= lo_hz) & (f <= hi_hz)] ** 2))

    # Tone band survives (within 3 dB of the unprofiled output)...
    assert band_energy(prof, 1050, 1200) > 0.5 * band_energy(flat, 1050, 1200)
    # ...while the high-frequency noise floor drops by > 20 dB.
    assert band_energy(prof, 6000, 20000) < 0.01 * band_energy(flat, 6000, 20000)


def _wav_url(sig, fs=FS):
    from aefs_tpu.engine.wavio import encode_wav_int16

    wav = encode_wav_int16(np.asarray(sig, np.float32).reshape(-1, 1), fs)
    return "data:audio/wav;base64," + base64.b64encode(wav).decode()


def test_engine_learn_from_wav_and_checkpoint(tmp_path):
    from aefs_tpu.engine.engine import AudioEngine

    eng = AudioEngine()
    eng.build_chain([SPECTRAL])
    with pytest.raises(ValueError):
        eng.learn_noise("nope", contents=_wav_url(_room_tone(FS)))
    floor_db = eng.learn_noise("s", contents=_wav_url(_room_tone(FS)))
    assert floor_db < -20.0  # quiet capture -> low floor
    assert "s" in eng.noise_profiles

    # The learned profile mutes same-statistics noise on the live path
    # (it sits a full margin BELOW the per-bin threshold; the scalar
    # threshold of -80 dB alone would pass it untouched).
    x = _room_tone(24 * N, seed=12).reshape(-1, 1)[: 24 * N]
    blocks = [eng.process_stream_block(x[i: i + N]) for i in
              range(0, len(x), N)]
    y_prof = np.concatenate(blocks)

    def rms(a):
        return float(np.sqrt(np.mean(np.square(a, dtype=np.float64))))

    assert rms(y_prof[12 * N:]) < 0.2 * rms(x[12 * N:])

    # Checkpoint carries the profile; a FRESH engine resumes with it.
    path = eng.save_session(str(tmp_path / "sess_noise"))
    eng2 = AudioEngine()
    eng2.resume_session(path)
    assert "s" in eng2.noise_profiles
    np.testing.assert_array_equal(eng2.noise_profiles["s"],
                                  eng.noise_profiles["s"])
    eng.close()
    eng2.close()


def test_engine_learn_offrate_wav_resamples():
    """A noise WAV recorded at a different rate than the engine must be
    resampled before analysis — profile bins are indexed against the
    ENGINE rate, so raw analysis would map every per-bin threshold to the
    wrong frequency (ADVICE r3: set_ir resamples for exactly this
    reason)."""
    from aefs_tpu.engine.engine import AudioEngine

    eng = AudioEngine()
    eng.build_chain([SPECTRAL])
    room = _room_tone(FS)
    # Learn from the same signal shipped at 24 kHz: the engine must hear
    # it stretched 2x in time (same frequencies), not shifted one octave.
    eng.learn_noise("s", contents=_wav_url(room, fs=FS // 2))
    got = eng.noise_profiles["s"]

    from aefs_tpu.engine.wavio import resample_bandlimited

    up = resample_bandlimited(room, 2 * len(room))
    want = measure_noise_profile(up, hop=N)
    # Same resampler (band-limited), int16 WAV round trip in between.
    assert got.shape == want.shape
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.99, corr
    # And decisively different from the un-resampled (wrong) analysis.
    wrong = measure_noise_profile(room, hop=N)
    assert np.corrcoef(got, wrong)[0, 1] < corr
    eng.close()


def test_resume_prunes_profiles_absent_from_checkpoint(tmp_path):
    """A profile learned in-process for an effect id that IS in the
    restored config but NOT in the checkpoint must not survive the
    resume — the saved session never gated with it (ADVICE r3)."""
    from aefs_tpu.engine.engine import AudioEngine

    eng = AudioEngine()
    eng.build_chain([SPECTRAL])
    path = eng.save_session(str(tmp_path / "sess_noprofile"))  # no profile
    eng.learn_noise("s", contents=_wav_url(_room_tone(FS)))
    assert "s" in eng.noise_profiles
    eng.resume_session(path)
    assert "s" not in eng.noise_profiles
    eng.close()


def test_concurrent_learn_noise_rejected():
    """Only one live capture at a time: a second concurrent call must be
    rejected up front, not silently steal the first one's capture slot
    (ADVICE r3)."""
    from aefs_tpu.engine.engine import AudioEngine

    eng = AudioEngine()
    eng.build_chain([SPECTRAL])
    started = threading.Event()
    result = {}

    def learner():
        started.set()
        result["floor_db"] = eng.learn_noise("s", seconds=0.05)

    th = threading.Thread(target=learner)
    th.start()
    started.wait(5)
    # Give the first call time to install its capture slot.
    deadline = 50
    while eng._noise_capture is None and deadline:
        threading.Event().wait(0.01)
        deadline -= 1
    with pytest.raises(ValueError, match="already in progress"):
        eng.learn_noise("s", seconds=0.05)
    room = _room_tone(FS // 2)
    i = 0
    while th.is_alive() and i + N <= len(room):
        eng.process_stream_block(room[i: i + N].reshape(-1, 1))
        i += N
    th.join(timeout=30)
    assert not th.is_alive()
    assert "floor_db" in result  # the first call completed normally
    eng.close()


def test_engine_learn_live_capture():
    from aefs_tpu.engine.engine import AudioEngine

    eng = AudioEngine()
    eng.build_chain([SPECTRAL])
    result = {}

    def learner():
        result["floor_db"] = eng.learn_noise("s", seconds=0.05)

    th = threading.Thread(target=learner)
    th.start()
    room = _room_tone(FS // 2)
    i = 0
    while th.is_alive() and i + N <= len(room):
        eng.process_stream_block(room[i: i + N].reshape(-1, 1))
        i += N
    th.join(timeout=30)
    assert not th.is_alive()
    assert "floor_db" in result and result["floor_db"] < -20.0
    assert "s" in eng.noise_profiles
    eng.close()


def test_resample_bandlimited_antialias_down():
    """Band-limited resampler unit contract: downsampling must NOT fold
    above-target-Nyquist energy into in-band bins (bare np.interp does —
    a 30 kHz tone in a 96 kHz clip aliases to 18 kHz at 48 kHz, teaching
    the spectral gate a falsely high 18 kHz threshold), and an in-band
    tone must come through at amplitude."""
    from aefs_tpu.engine.wavio import resample_bandlimited

    fs_hi, n = 96000, 96000
    t = np.arange(n) / fs_hi
    sig = (0.5 * np.sin(2 * np.pi * 30000 * t)
           + 0.3 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    y = resample_bandlimited(sig, n // 2)  # -> 48 kHz
    spec = np.abs(np.fft.rfft(y)) / (len(y) / 2)
    freqs = np.fft.rfftfreq(len(y), 1 / 48000)
    b1k = np.argmin(np.abs(freqs - 1000))
    b18k = np.argmin(np.abs(freqs - 18000))
    assert spec[b1k] == pytest.approx(0.3, rel=1e-3)      # in-band kept
    assert spec[b18k] < 1e-6, spec[b18k]                  # no alias image
    # the naive decimation this replaces DOES alias (guards the rationale)
    naive = np.interp(np.linspace(0, n - 1, n // 2), np.arange(n), sig)
    nspec = np.abs(np.fft.rfft(naive)) / (len(naive) / 2)
    assert nspec[b18k] > 0.05, nspec[b18k]


def test_engine_learn_downrate_wav_does_not_alias():
    """Engine-level guard for the downsample direction: a 96 kHz noise
    WAV with strong energy near 30 kHz must not teach the 48 kHz engine
    an elevated threshold near 18 kHz (the naive-decimation alias bin)."""
    from aefs_tpu.engine.engine import AudioEngine

    eng = AudioEngine()
    eng.build_chain([SPECTRAL])
    fs_hi = 2 * FS
    t = np.arange(2 * FS) / fs_hi  # 1 s at 96 kHz
    sig = (_room_tone(2 * FS, amp=0.005)
           + 0.4 * np.sin(2 * np.pi * 30000 * t).astype(np.float32))
    eng.learn_noise("s", contents=_wav_url(sig, fs=fs_hi))
    got = eng.noise_profiles["s"]
    # Profile bins index a 2N-point rfft at the ENGINE rate.
    freqs = np.fft.rfftfreq(2 * N, 1 / FS)
    alias = np.argmin(np.abs(freqs - 18000))
    base = np.median(got[(freqs > 4000) & (freqs < 16000)])
    assert got[alias] < 4 * base, (got[alias], base)
    eng.close()
