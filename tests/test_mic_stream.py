"""Mic-path coverage with a fake sounddevice: the image has no audio
hardware, so the PortAudio wiring (stream construction, callback
round-trip, sample-rate renegotiation, device selection + restart) is
exercised against a stub (reference engine.py:147-190 semantics)."""

import numpy as np
import pytest

from aefs_tpu.engine import engine as engine_mod
from aefs_tpu.engine.engine import AudioEngine


class FakeStream:
    created = []

    def __init__(self, samplerate, blocksize, dtype, latency, channels,
                 callback, prime_output_buffers_using_stream_callback,
                 device=None):
        self.samplerate = FakeStream.negotiate(samplerate)
        self.blocksize = blocksize
        self.channels = channels
        self.callback = callback
        self.device = device
        self.running = False
        FakeStream.created.append(self)

    negotiate = staticmethod(lambda sr: sr)

    def start(self):
        self.running = True

    def stop(self):
        self.running = False

    def close(self):
        pass

    def pump(self, n_blocks=3, amp=0.2, seed=0):
        rng = np.random.default_rng(seed)
        outs = []
        for _ in range(n_blocks):
            indata = (amp * rng.standard_normal(
                (self.blocksize, self.channels[0]))).astype(np.float32)
            outdata = np.zeros((self.blocksize, self.channels[1]), np.float32)
            self.callback(indata, outdata, self.blocksize, None, 0)
            outs.append(outdata.copy())
        return outs


class FakeSd:
    Stream = FakeStream


@pytest.fixture
def mic_engine(monkeypatch):
    monkeypatch.setattr(engine_mod, "sd", FakeSd)
    monkeypatch.setattr(FakeStream, "created", [])
    monkeypatch.setattr(FakeStream, "negotiate", staticmethod(lambda sr: sr))
    eng = AudioEngine()
    eng.build_chain([
        {"effect_id": "f", "type": "filter",
         "params": {"filter_type": 0, "cutoff_hz": 2000, "q": 0.7}},
    ])
    return eng


def test_mic_stream_callback_round_trip(mic_engine):
    mic_engine.start_mic_stream()
    assert mic_engine.is_running
    st = FakeStream.created[-1]
    assert st.blocksize == 256 and st.channels == (1, 2) and st.device is None
    outs = st.pump(4)
    assert all(o.shape == (256, 2) for o in outs)
    assert any(np.any(o) for o in outs[1:])  # audio flows (pipelined: 1 late)
    # double start warns, does not stack streams
    mic_engine.start_mic_stream()
    assert len(FakeStream.created) == 1
    mic_engine.stop_stream()
    assert not mic_engine.is_running and not st.running


def test_mic_samplerate_renegotiation(mic_engine):
    # device forces 44100: the chain and the metrics deadline must follow
    FakeStream.negotiate = staticmethod(lambda sr: 44100)
    mic_engine.start_mic_stream()
    assert mic_engine.current_sample_rate == 44100
    assert mic_engine.metrics.fs == 44100
    assert mic_engine.chain.fs == 44100
    out = FakeStream.created[-1].pump(2)[-1]
    assert out.shape == (256, 2)


def test_set_devices_restarts_running_stream(mic_engine):
    mic_engine.start_mic_stream()
    assert FakeStream.created[-1].device is None
    mic_engine.set_devices(3, 5)
    # restarted with the selected pair
    assert mic_engine.is_running
    assert FakeStream.created[-1].device == (3, 5)
    assert len(FakeStream.created) == 2
    # clearing back to defaults while stopped applies at next start
    mic_engine.stop_stream()
    mic_engine.set_devices(None, None)
    assert mic_engine.devices == (None, None)
    assert not mic_engine.is_running  # stopped stream stays stopped
