"""Engine-level tests: WAV codec formats, mic-stream gating, offline core."""

import io
import struct
import sys
import types
import wave

import numpy as np
import pytest

from aefs_tpu.engine.wavio import decode_wav, encode_wav_int16
from aefs_tpu.engine.engine import AudioEngine, process_offline
from aefs_tpu.core.config import DEFAULT_PRESETS

from helpers import noise
from oracles import err_dbfs


def _pcm_wav(data_i, width, fs=48000, ch=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(fs)
        w.writeframes(data_i)
    return buf.getvalue()


def test_decode_16bit():
    x = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype(np.int16)
    audio, fs = decode_wav(_pcm_wav(x.tobytes(), 2))
    assert fs == 48000 and audio.shape == (1000, 1)
    assert err_dbfs(audio[:, 0], x / 32768.0) <= -90


def test_decode_24bit():
    vals = np.asarray([0, 1 << 22, -(1 << 22), (1 << 23) - 1], np.int32)
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    audio, fs = decode_wav(_pcm_wav(raw, 3))
    expect = vals / float(1 << 23)
    assert np.allclose(audio[:, 0], expect, atol=1e-6)


def test_decode_8bit_and_32bit():
    x8 = np.asarray([0, 128, 255], np.uint8)
    a8, _ = decode_wav(_pcm_wav(x8.tobytes(), 1))
    assert np.allclose(a8[:, 0], [-1.0, 0.0, 127 / 128])

    x32 = np.asarray([0, 1 << 30, -(1 << 30)], np.int32)
    a32, _ = decode_wav(_pcm_wav(x32.tobytes(), 4))
    assert np.allclose(a32[:, 0], [0.0, 0.5, -0.5])


def test_decode_ieee_float_riff():
    x = np.asarray([0.0, 0.25, -0.5, 1.0], np.float32)
    body = x.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 4, 4, 32)
    riff = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    audio, fs = decode_wav(riff)
    assert fs == 48000
    assert np.allclose(audio[:, 0], x)


def test_encode_decode_round_trip():
    x = np.clip(noise(4800, channels=2, amp=0.2), -1, 1).astype(np.float32)
    data = encode_wav_int16(x, 44100)
    audio, fs = decode_wav(data)
    assert fs == 44100 and audio.shape == x.shape
    assert err_dbfs(audio, x) <= -85  # 16-bit quantization floor ~ -90


def test_mic_stream_without_hardware():
    eng = AudioEngine()
    eng.start_mic_stream()  # no sounddevice -> "Server Mode" no-op
    assert not eng.is_running
    eng.stop_stream()  # no stream -> no-op


def test_mic_stream_with_fake_sounddevice(monkeypatch):
    """Exercise the PortAudio callback path with a fake Stream (the
    reference's sample-rate renegotiation included, engine.py:177-181)."""
    import aefs_tpu.engine.engine as eng_mod

    class FakeStream:
        def __init__(self, samplerate, blocksize, dtype, latency, channels,
                     callback, prime_output_buffers_using_stream_callback):
            self.samplerate = samplerate
            self.blocksize = blocksize
            self.callback = callback
            self.started = False

        def start(self):
            self.started = True

        def stop(self):
            self.started = False

        def close(self):
            pass

    fake_sd = types.SimpleNamespace(Stream=FakeStream)
    monkeypatch.setattr(eng_mod, "sd", fake_sd)

    eng = AudioEngine()
    eng.build_chain(DEFAULT_PRESETS["Slapback Echo"])
    eng.start_mic_stream()
    assert eng.is_running

    indata = noise(256, channels=1, amp=0.3)
    outdata = np.zeros((256, 2), np.float32)
    # The mic path defaults to the depth-1 pipeline: the first callback
    # primes (silent output), the second returns the first block's audio.
    eng.stream.callback(indata, outdata, 256, None, None)
    assert np.all(outdata == 0)
    eng.stream.callback(indata, outdata, 256, None, None)
    assert np.any(outdata != 0)
    assert eng.metrics.snapshot()["blocks"] >= 2
    # plot taps fed
    assert eng.data_queues["input"].qsize() == 2
    assert eng.data_queues["output"].qsize() == 2

    eng.stop_stream()
    assert not eng.is_running


def test_process_offline_short_odd_rate():
    out_mono, out = process_offline(
        DEFAULT_PRESETS["Cathedral"], noise(1000, channels=2), 22050
    )
    assert out.shape == (1000, 2)
    assert np.all(np.isfinite(out))


def test_pipelined_stream_one_block_latency():
    """Depth-1 pipelined hot path: block k's return value is block k-1's
    processed audio; the first block (and the first block after a chain
    swap) is silence while the pipeline primes."""
    cfg = [{"effect_id": "f", "type": "filter",
            "params": {"filter_type": 0, "cutoff_hz": 2000, "q": 0.707}}]
    rng = np.random.default_rng(5)
    blocks = [rng.standard_normal((256, 1)).astype(np.float32) * 0.2
              for _ in range(6)]

    ref_eng = AudioEngine()
    ref_eng.build_chain(cfg)
    ref = [ref_eng.process_stream_block(b) for b in blocks]

    eng = AudioEngine()
    eng.build_chain(cfg)
    got = [eng.process_stream_block_pipelined(b) for b in blocks]

    assert np.all(got[0] == 0.0)
    for k in range(1, len(blocks)):
        assert err_dbfs(got[k], ref[k - 1]) <= -100, k

    # chain swap mid-stream drops the in-flight block and re-primes
    eng.build_chain(cfg)
    out = eng.process_stream_block_pipelined(blocks[0])
    assert np.all(out == 0.0)
    out = eng.process_stream_block_pipelined(blocks[1])
    assert np.any(out != 0.0)


def test_rebuild_resets_state_but_param_updates_preserve_it():
    """SURVEY §7 hard part #4 (reference engine.py:38-65 semantics):
    chain REBUILD resets all effect state (delay tails die); live param
    updates glide without touching state (tails survive)."""
    from aefs_tpu.engine.engine import AudioEngine

    eng = AudioEngine()
    cfg = [{"effect_id": "d", "type": "delay",
            "params": {"delay_ms": 50, "feedback": 0.0, "mix_dry": 0.0,
                       "mix_wet": 1.0, "offset_ms": 0}}]
    eng.build_chain(cfg)
    imp = np.zeros((256, 1), np.float32)
    imp[0, 0] = 1.0
    sil = np.zeros((256, 1), np.float32)

    def tail_peak():
        return max(float(np.abs(eng.process_stream_block(sil)).max())
                   for _ in range(12))

    eng.process_stream_block(imp)
    assert tail_peak() > 0.4                      # echo emerges from state
    eng.update_param("d", "mix_wet", 0.9)         # update: state preserved
    eng.process_stream_block(imp)
    assert tail_peak() > 0.3
    eng.build_chain(cfg)                          # rebuild: state reset
    assert tail_peak() < 1e-6


def test_chain_rebuild_frees_under_gc_disable():
    """The serving processes run with gc.disable() (reference parity,
    backend.py:123), where reference CYCLES are never collected: a chain
    rebuild must free the superseded chain by refcounting alone.  Guards
    two past cycles: the PackedRunner closure capturing ``self``
    (core/packing.py) and the chain jit-cache holding bound-method jits
    (Chain.release) — before the fix, 30 rebuilds left 30/30 chains (and
    their compiled executables) alive."""
    import gc
    import weakref

    from aefs_tpu.engine.engine import AudioEngine

    cfg_a = [{"effect_id": "f", "type": "filter",
              "params": {"filter_type": 0, "cutoff_hz": 2000, "q": 0.8}}]
    cfg_b = [{"effect_id": "w", "type": "waveshaper",
              "params": {"drive": 4.0, "shape": 1, "mix": 1.0,
                         "out_gain": 1.0}}]
    x = 0.1 * np.random.default_rng(0).standard_normal((256, 1)).astype(
        np.float32)
    was_enabled = gc.isenabled()
    gc.disable()
    try:
        eng = AudioEngine()
        refs = []
        for i in range(6):
            eng.build_chain(cfg_a if i % 2 == 0 else cfg_b)
            refs.append(weakref.ref(eng.chain))
            eng.process_stream_block(x)
        alive = sum(1 for r in refs if r() is not None)
        assert alive == 1, f"{alive}/6 chains alive under gc.disable()"
        # End-of-session close() frees the FINAL chain too (per-connection
        # churn in the server would otherwise leak one chain per client).
        eng.close()
        assert all(r() is None for r in refs), "chain leaked past close()"
    finally:
        if was_enabled:
            gc.enable()


def test_update_param_reaches_file_mode():
    """A live update_param must be visible to file mode: the file chain is
    rebuilt fresh from last_chain_config (targets AND baked statics like
    the delay's file lag), so update_param syncs the config too — the
    reference's file path always reads current params (core.py:123-129)."""
    eng = AudioEngine()
    eng.build_chain([{"effect_id": "d", "type": "delay",
                      "params": {"delay_ms": 375, "feedback": 0.0,
                                 "mix_wet": 1.0, "mix_dry": 0.0,
                                 "offset_ms": 0}}])
    fs = 48000
    x = np.zeros((fs, 1), np.float32)
    x[0] = 1.0
    eng.update_param("d", "mix_wet", 0.0)
    eng.update_param("d", "mix_dry", 1.0)
    # Baked static path too: move the echo to 200 ms.
    eng.update_param("d", "delay_ms", 200.0)
    _, y = eng.process_file_array(x, fs)
    assert float(np.abs(y[0:2]).max()) > 0.9          # dry passes
    old = int(0.375 * fs)
    assert float(np.abs(y[old - 2:old + 4]).max()) == 0.0  # old echo gone
    # mix_wet 0 silences the (relocated) echo entirely.
    new = int(0.200 * fs)
    assert float(np.abs(y[new - 2:new + 4]).max()) == 0.0
    eng.close()


def test_update_param_reaches_file_mode_in_parallel_branch():
    """Branch params are lifted into the container's namespace
    (b<branch>_<index>_<name> on the container's effect_id,
    models/parallel_chain.py:53-61); the config sync must carry those
    lifted keys into file mode too."""
    eng = AudioEngine()
    eng.build_chain([{
        "effect_id": "par", "type": "parallel",
        "params": {},
        "branches": [
            [{"effect_id": "w", "type": "waveshaper",
              "params": {"drive": 1.0, "shape": 1, "mix": 1.0,
                         "out_gain": 1.0}}],
            [],
        ],
    }])
    fs = 48000
    x = 0.25 * np.ones((4096, 1), np.float32)
    _, y_before = eng.process_file_array(x, fs)
    eng.update_param("par", "b0_0_out_gain", 0.0)
    _, y_after = eng.process_file_array(x, fs)
    # Muting branch 1's waveshaper output must change the file render.
    assert float(np.abs(y_after[2048:]).max()) < float(
        np.abs(y_before[2048:]).max())
    eng.close()
