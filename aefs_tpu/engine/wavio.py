"""WAV decode/encode without external audio libraries.

The reference uses soundfile/libsndfile for decode and scipy for encode
(engine.py:79, :108); this build decodes with the stdlib ``wave`` module +
numpy (PCM 8/16/24/32-bit and IEEE float32) and encodes via scipy's wavfile
(present in the base image) with a stdlib fallback — no native audio stack
required on the host.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def decode_wav(data: bytes):
    """Decode WAV bytes -> (float32 array (frames, channels) in [-1, 1], fs)."""
    # Try stdlib wave first (PCM); fall back to a minimal RIFF parse for
    # IEEE-float WAVs which the wave module rejects on some versions.
    try:
        with wave.open(io.BytesIO(data)) as w:
            fs = w.getframerate()
            ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 1:
            x = np.frombuffer(raw, np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif width == 2:
            # The common case (every reference asset is 16-bit): the
            # native converter is ~10x the numpy path on multi-minute
            # uploads and falls back to exactly this scaling itself.
            from aefs_tpu.native import i16_to_f32

            x = i16_to_f32(np.frombuffer(raw, "<i2"))
        elif width == 3:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            i32 = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            i32 = np.where(i32 >= 1 << 23, i32 - (1 << 24), i32)
            x = i32.astype(np.float32) / float(1 << 23)
        elif width == 4:
            x = np.frombuffer(raw, "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"unsupported sample width {width}")
        return x.reshape(-1, ch), fs
    except wave.Error:
        return _decode_riff_float(data)


def _decode_riff_float(data: bytes):
    """Minimal RIFF walker for format-3 (IEEE float) WAVs."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, fs, _, _, bits = fmt
    if audio_fmt == 3 and bits == 32:
        x = np.frombuffer(payload, "<f4").astype(np.float32)
    elif audio_fmt == 3 and bits == 64:
        x = np.frombuffer(payload, "<f8").astype(np.float32)
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(payload, "<i2").astype(np.float32) / 32768.0
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}")
    return x.reshape(-1, ch), fs


def encode_wav_int16(audio, fs: int) -> bytes:
    """float array (frames, ch) in [-1, 1] -> 16-bit PCM WAV bytes
    (the reference's output format, engine.py:104-108)."""
    from aefs_tpu import native

    pcm = native.f32_to_i16(np.asarray(audio, np.float32))
    try:
        import scipy.io.wavfile

        buf = io.BytesIO()
        scipy.io.wavfile.write(buf, int(fs), pcm)
        return buf.getvalue()
    except Exception:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(pcm.shape[1] if pcm.ndim > 1 else 1)
            w.setsampwidth(2)
            w.setframerate(int(fs))
            w.writeframes(pcm.tobytes())
        return buf.getvalue()


def read_wav_file(path: str):
    with open(path, "rb") as f:
        return decode_wav(f.read())


def write_wav_file(path: str, audio, fs: int):
    with open(path, "wb") as f:
        f.write(encode_wav_int16(audio, fs))


def resample_bandlimited(x: np.ndarray, n_out: int) -> np.ndarray:
    """Band-limited whole-clip resample along the last axis (rfft bin
    truncation / zero-padding), for off-rate uploads whose content must
    land in the RIGHT frequency bins — IR WAVs (engine.set_ir) and noise
    profiles (engine.learn_noise).  Linear interpolation is wrong in the
    downsample direction: with no anti-alias low-pass, above-Nyquist
    energy folds into in-band bins, which is exactly the mis-mapping the
    resample exists to prevent.  Truncating the spectrum IS the brickwall
    low-pass; zero-padding is an exact band-limited upsample.  O(n log n)
    on the host, run once per upload."""
    x = np.asarray(x, np.float64)
    n_in = x.shape[-1]
    n_out = int(n_out)
    if n_out == n_in:
        return x.astype(np.float32)
    spec = np.fft.rfft(x, axis=-1)
    k_out = n_out // 2 + 1
    out_spec = np.zeros(x.shape[:-1] + (k_out,), np.complex128)
    k = min(spec.shape[-1], k_out)
    out_spec[..., :k] = spec[..., :k]
    # Nyquist-bin weight correction (scipy.signal.resample's rule): irfft
    # counts the Nyquist bin ONCE but every interior bin twice (conjugate
    # pair), so a bin that changes role must change weight — upsampling
    # from even n_in moves the input Nyquist bin to an interior slot
    # (halve it, else a Nyquist-rate component comes back at 2x), and
    # downsampling to even n_out folds an interior input bin onto the
    # output Nyquist (keep 2x its real part).
    if n_out > n_in and n_in % 2 == 0:
        out_spec[..., n_in // 2] *= 0.5
    elif n_out < n_in and n_out % 2 == 0:
        out_spec[..., -1] = 2.0 * out_spec[..., -1].real
    y = np.fft.irfft(out_spec, n_out, axis=-1) * (n_out / n_in)
    return y.astype(np.float32)
