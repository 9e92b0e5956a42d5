"""Float64 NumPy oracles: faithful per-sample ports of the reference DSP.

Each oracle replays the reference kernel's recurrence sample-by-sample in
float64 (the reference runs float32 fastmath Numba; these oracles are the
mathematical ground truth the BASELINE parity bar is measured against).
Citations point at the reference kernels being modeled:

  delay_kernel            /root/reference/src/audioblocks/delay.py:7-22
  pure_delay_kernel       reverb.py:11-31
  comb_damped_kernel      reverb.py:33-46
  allpass_kernel          reverb.py:48-67
  biquad_kernel           filter.py:8-40
  gate_kernel             gate.py:6-42
  pitch_shift_kernel      octaver.py:17-82
  SpectralFilter          spectral.py:44-100

They are deliberately simple (per-sample python loops over numpy scalars)
— clarity over speed.
"""

from __future__ import annotations

import numpy as np


class OracleSmooth:
    """SmoothParam.step_towards (core.py:56-77) in float64."""

    def __init__(self, value, lo=-np.inf, hi=np.inf):
        self.current = float(value)
        self.target = float(value)
        self.lo, self.hi = lo, hi

    def set_target(self, v):
        self.target = min(max(float(v), self.lo), self.hi)

    def step(self, max_step):
        d = self.target - self.current
        self.current += min(max(d, -max_step), max_step)
        return self.current


class OracleDelayLine:
    """Feedback echo line (delay_kernel semantics)."""

    def __init__(self, fs, max_delay_ms=1500.0):
        self.fs = fs
        self.size = int(fs * max_delay_ms / 1000.0) + 1
        self.buf = np.zeros(self.size)
        self.w = 0

    def process(self, x, delay_ms, feedback):
        # Mirror the model's float32 ms->samples quantization exactly
        # (delay.py:to_samples: f32 product, f32 divide, truncate) — a
        # float64 derivation disagrees by one sample on truncation
        # boundaries (fuzz finding #4, e.g. 494.3749872 ms).
        dq = np.float32(np.float32(self.fs) * np.float32(delay_ms)) \
            / np.float32(1000.0)
        d = min(int(dq), self.size - 1)
        y = np.zeros(len(x))
        for n in range(len(x)):
            r = (self.w - d) % self.size
            delayed = self.buf[r]
            y[n] = delayed
            self.buf[self.w] = x[n] + delayed * feedback
            self.w = (self.w + 1) % self.size
        return y


class OracleStereoDelay:
    """StereoDelayEffect (delay.py:43-96), constant params."""

    def __init__(self, fs, delay_ms=375.0, feedback=0.2, mix_dry=0.8,
                 mix_wet=0.8, offset_ms=30.0, max_delay_ms=1500.0):
        self.p = dict(delay_ms=delay_ms, feedback=feedback, mix_dry=mix_dry,
                      mix_wet=mix_wet, offset_ms=offset_ms)
        self.max_delay_ms = max_delay_ms
        self.L = OracleDelayLine(fs, max_delay_ms)
        self.R = OracleDelayLine(fs, max_delay_ms)

    def process(self, x):  # x: (N, 2)
        p = self.p
        d_l = p["delay_ms"]
        # negative offsets clamp at the solver's min delay (1 ms default)
        d_r = min(max(d_l + p["offset_ms"], 1.0), self.max_delay_ms - 1.0)
        wet_l = self.L.process(x[:, 0], d_l, p["feedback"])
        wet_r = self.R.process(x[:, 1], d_r, p["feedback"])
        out = np.stack(
            [p["mix_dry"] * x[:, 0] + p["mix_wet"] * wet_l,
             p["mix_dry"] * x[:, 1] + p["mix_wet"] * wet_r], axis=1)
        return np.clip(out, -1.0, 1.0)


class OraclePureDelay:
    def __init__(self, size):
        self.size = size
        self.buf = np.zeros(size)
        self.w = 0

    def process(self, x, d):
        y = np.zeros(len(x))
        for n in range(len(x)):
            if d == 0:
                y[n] = x[n]
            else:
                y[n] = self.buf[(self.w - d) % self.size]
            self.buf[self.w] = x[n]
            self.w = (self.w + 1) % self.size
        return y


class OracleComb:
    def __init__(self, lag):
        self.lag = lag
        self.size = lag + 1
        self.buf = np.zeros(self.size)
        self.w = 0
        self.lp = 0.0

    def process(self, x, g, h):
        y = np.zeros(len(x))
        for n in range(len(x)):
            r = (self.w - self.lag) % self.size
            v = self.buf[r]
            damped = (1.0 - h) * v + h * self.lp
            self.lp = damped
            y[n] = v
            self.buf[self.w] = x[n] + g * damped
            self.w = (self.w + 1) % self.size
        return y


class OracleAllpass:
    def __init__(self, lag):
        self.lag = lag
        self.size = lag + 1
        self.buf = np.zeros(self.size)
        self.w = 0

    def process(self, x, a):
        y = np.zeros(len(x))
        for n in range(len(x)):
            delayed = self.buf[(self.w - self.lag) % self.size]
            y[n] = delayed - a * x[n]
            self.buf[self.w] = x[n] + a * y[n]
            self.w = (self.w + 1) % self.size
        return y


class OracleReverb:
    """ReverbEffect (reverb.py:72-277), constant params."""

    COMB_MS = (29.7, 37.1, 41.1, 43.7)
    AP_MS = (5.0, 1.7)

    def __init__(self, fs, rt60_s=1.5, damp=0.3, pre_delay_ms=0.0,
                 mix_dry=0.7, mix_wet=0.5, jitter_ms=0.3, ap_gain=0.6,
                 max_delay_ms=200.0, max_pre_delay_ms=100.0):
        self.fs = fs
        self.p = dict(rt60_s=rt60_s, damp=damp, pre_delay_ms=pre_delay_ms,
                      mix_dry=mix_dry, mix_wet=mix_wet)
        self.ap_gain = ap_gain
        pre_size = max(1, int(fs * max_pre_delay_ms / 1000.0) + 1)
        self.pre = [OraclePureDelay(pre_size), OraclePureDelay(pre_size)]
        self.pre_size = pre_size

        def lags(times, jit, scale):
            return [max(1, int(fs * min(t + jit * scale, max_delay_ms - 1.0) / 1000.0))
                    for t in times]

        self.combs = [
            [OracleComb(l) for l in lags(self.COMB_MS, +jitter_ms, 1.0)],
            [OracleComb(l) for l in lags(self.COMB_MS, -jitter_ms, 1.0)],
        ]
        self.aps = [
            [OracleAllpass(l) for l in lags(self.AP_MS, +jitter_ms, 0.2)],
            [OracleAllpass(l) for l in lags(self.AP_MS, -jitter_ms, 0.2)],
        ]

    def process(self, x):  # (N, 2)
        p = self.p
        # f32 quantization mirror (reverb.py:108), as in OracleDelayLine.
        dq = np.float32(np.float32(self.fs) * np.float32(p["pre_delay_ms"])) \
            / np.float32(1000.0)
        d = min(int(dq), self.pre_size - 1)
        out = np.zeros_like(x)
        for side in range(2):
            pre = self.pre[side].process(x[:, side], d)
            acc = np.zeros(len(x))
            for comb in self.combs[side]:
                g = 10.0 ** (-3.0 * (comb.lag / self.fs) / max(1e-3, p["rt60_s"]))
                acc += comb.process(pre, g, p["damp"])
            for ap in self.aps[side]:
                acc = ap.process(acc, self.ap_gain)
            out[:, side] = p["mix_dry"] * x[:, side] + p["mix_wet"] * acc
        return np.clip(out, -1.0, 1.0)


class OracleBiquad:
    """FilterEffect (filter.py:42-113), constant params."""

    def __init__(self, fs, filter_type=0.0, cutoff_hz=1000.0, q=0.707,
                 gain_db=0.0, channels=2):
        self.fs = fs
        self.p = dict(filter_type=filter_type, cutoff_hz=cutoff_hz, q=q,
                      gain_db=gain_db)
        self.state = np.zeros((channels, 4))

    def coeffs(self):
        fc, q = self.p["cutoff_hz"], self.p["q"]
        # Nyquist clamp mirrored from models/biquad.py (f32 product).
        fc = min(fc, float(np.float32(0.45) * np.float32(self.fs)))
        w0 = 2.0 * np.pi * fc / self.fs
        cw, sw = np.cos(w0), np.sin(w0)
        alpha = sw / (2.0 * q)
        t = int(round(self.p["filter_type"]))
        A = 10.0 ** (self.p["gain_db"] / 40.0)
        sq = np.sqrt(A)
        tsa = 2.0 * sq * alpha
        if t == 0:
            b0, b1, b2 = (1 - cw) / 2, 1 - cw, (1 - cw) / 2
            a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
        elif t == 1:
            b0, b1, b2 = (1 + cw) / 2, -(1 + cw), (1 + cw) / 2
            a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
        elif t == 2:
            b0, b1, b2 = alpha, 0.0, -alpha
            a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
        elif t == 3:  # peaking EQ (RBJ cookbook)
            b0, b1, b2 = 1 + alpha * A, -2 * cw, 1 - alpha * A
            a0, a1, a2 = 1 + alpha / A, -2 * cw, 1 - alpha / A
        elif t == 4:  # low shelf
            b0 = A * ((A + 1) - (A - 1) * cw + tsa)
            b1 = 2 * A * ((A - 1) - (A + 1) * cw)
            b2 = A * ((A + 1) - (A - 1) * cw - tsa)
            a0 = (A + 1) + (A - 1) * cw + tsa
            a1 = -2 * ((A - 1) + (A + 1) * cw)
            a2 = (A + 1) + (A - 1) * cw - tsa
        elif t == 5:  # high shelf
            b0 = A * ((A + 1) + (A - 1) * cw + tsa)
            b1 = -2 * A * ((A - 1) + (A + 1) * cw)
            b2 = A * ((A + 1) + (A - 1) * cw - tsa)
            a0 = (A + 1) - (A - 1) * cw + tsa
            a1 = 2 * ((A - 1) - (A + 1) * cw)
            a2 = (A + 1) - (A - 1) * cw - tsa
        else:  # 6 allpass
            b0, b1, b2 = 1 - alpha, -2 * cw, 1 + alpha
            a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
        return b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0

    def process(self, x):  # (N, C)
        b0, b1, b2, a1, a2 = self.coeffs()
        y = np.zeros_like(x)
        for c in range(x.shape[1]):
            x1, x2, y1, y2 = self.state[c]
            for i in range(x.shape[0]):
                x0 = x[i, c]
                y0 = b0 * x0 + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
                y[i, c] = y0
                x2, x1, y2, y1 = x1, x0, y1, y0
            self.state[c] = [x1, x2, y1, y2]
        return y


class OracleGate:
    """NoiseGateEffect (gate.py:45-90), constant params."""

    def __init__(self, fs, threshold_db=-40.0, attack_ms=10.0, release_ms=100.0):
        self.fs = fs
        self.p = dict(threshold_db=threshold_db, attack_ms=attack_ms,
                      release_ms=release_ms)
        self.gain = 0.0

    def _coeff(self, ms):
        # f32 mirror (CLAUDE.md: mirror every f32 smoother coefficient —
        # the release recursion amplifies the oracle gap by 1/(1-a_r)):
        # the models compute 1 - exp(.) entirely in float32, and the
        # subtraction near 1.0 is where ~1e-3 RELATIVE coefficient error
        # appears at long release times.
        t = np.float32(max(1e-3, ms * 1e-3))
        return float(np.float32(1.0)
                     - np.exp(np.float32(-2.2) / (t * np.float32(self.fs))))

    def process(self, x):  # (N, C)
        thresh = 10.0 ** (self.p["threshold_db"] / 20.0)
        att = self._coeff(self.p["attack_ms"])
        rel = self._coeff(self.p["release_ms"])
        y = np.zeros_like(x)
        g = self.gain
        for i in range(x.shape[0]):
            lvl = np.max(np.abs(x[i]))
            target = 1.0 if lvl > thresh else 0.0
            if g < target:
                g = (1.0 - att) * g + att * target
            else:
                g = (1.0 - rel) * g + rel * target
            y[i] = x[i] * g
        self.gain = g
        return y


class OracleCompressor:
    """Soft-knee feed-forward compressor, float64 per-sample (decoupled
    peak detector + one-pole smoother + Giannoulis eq. 4 gain computer —
    the definition models/compressor.py decomposes into block scans)."""

    def __init__(self, fs, threshold_db=-24.0, ratio=4.0, attack_ms=10.0,
                 release_ms=100.0, knee_db=6.0, makeup_db=0.0):
        self.fs = fs
        self.p = dict(threshold_db=threshold_db, ratio=ratio,
                      attack_ms=attack_ms, release_ms=release_ms,
                      knee_db=knee_db, makeup_db=makeup_db)
        self.peak = 0.0
        self.env = 0.0

    def _coeff(self, ms):
        # f32 mirror (CLAUDE.md: mirror every f32 smoother coefficient —
        # the release recursion amplifies the oracle gap by 1/(1-a_r)):
        # the models compute 1 - exp(.) entirely in float32, and the
        # subtraction near 1.0 is where ~1e-3 RELATIVE coefficient error
        # appears at long release times.
        t = np.float32(max(1e-3, ms * 1e-3))
        return float(np.float32(1.0)
                     - np.exp(np.float32(-2.2) / (t * np.float32(self.fs))))

    def process(self, x):  # (N, C)
        p = self.p
        att = self._coeff(p["attack_ms"])
        rho = 1.0 - self._coeff(p["release_ms"])
        w = max(p["knee_db"], 1e-6)
        slope = 1.0 / max(p["ratio"], 1.0) - 1.0
        y = np.zeros_like(x)
        peak, env = self.peak, self.env
        for i in range(x.shape[0]):
            peak = max(np.max(np.abs(x[i])), rho * peak)
            env = (1.0 - att) * env + att * peak
            o = 20.0 * np.log10(max(env, 1e-10)) - p["threshold_db"]
            t = min(max(o + 0.5 * w, 0.0), w)
            g_db = slope * (t * t / (2.0 * w) + max(o - 0.5 * w, 0.0))
            y[i] = x[i] * 10.0 ** ((g_db + p["makeup_db"]) / 20.0)
        self.peak, self.env = peak, env
        return y


def _cubic(frac, y0, y1, y2, y3):
    c0 = y1
    c1 = 0.5 * (y2 - y0)
    c2 = y0 - 2.5 * y1 + 2.0 * y2 - 0.5 * y3
    c3 = 0.5 * (y3 - y0) + 1.5 * (y1 - y2)
    return ((c3 * frac + c2) * frac + c1) * frac + c0


class OracleOctaver:
    """OctaverEffect (octaver.py:84-150), constant params."""

    def __init__(self, fs, semitones=-12.0, mix=0.5, window_ms=40.0):
        self.fs = fs
        self.p = dict(semitones=semitones, mix=mix)
        self.size = max(int(fs * window_ms / 1000.0), 16)
        self.buf = np.zeros(self.size)
        self.w = 0
        self.phasor = 0.0

    def process(self, x):  # (N, C)
        size = self.size
        ratio = 2.0 ** (self.p["semitones"] / 12.0)
        step = (1.0 - ratio) / size
        mix = self.p["mix"]
        mono = x.mean(axis=1)
        wet = np.zeros(len(x))
        for i in range(len(x)):
            self.buf[self.w] = mono[i]
            p1 = self.phasor
            p2 = p1 + 0.5
            if p2 >= 1.0:
                p2 -= 1.0
            samples = []
            for p in (p1, p2):
                raw = self.w - p * size + size
                fl = int(raw)
                frac = raw - fl
                taps = [self.buf[(fl + k) % size] for k in (-1, 0, 1, 2)]
                samples.append(_cubic(frac, *taps))
            g1 = 0.5 * (1.0 - np.cos(2 * np.pi * p1))
            g2 = 0.5 * (1.0 - np.cos(2 * np.pi * p2))
            wet[i] = samples[0] * g1 + samples[1] * g2
            self.w = (self.w + 1) % size
            self.phasor += step
            if self.phasor >= 1.0:
                self.phasor -= 1.0
            elif self.phasor < 0.0:
                self.phasor += 1.0
        out = x * (1.0 - mix) + wet[:, None] * mix
        return out


class OracleChorus:
    """LFO-modulated fractional delay, float64 per-sample — the
    definition models/chorus.py evaluates blockwise.  Tap convention
    matches fractional_read_cubic: distance a into the past, taps at
    ceil(a)+{1,0,-1,-2}, frac = ceil(a) - a."""

    def __init__(self, fs, rate_hz=0.8, depth_ms=3.0, base_ms=12.0,
                 mix=0.5, spread=0.25, channels=2):
        self.fs = fs
        self.p = dict(rate_hz=rate_hz, depth_ms=depth_ms, base_ms=base_ms,
                      mix=mix, spread=spread)
        self.hist_len = int((40.0 + 10.0) * fs / 1000.0) + 8
        self.hist = np.zeros((channels, self.hist_len))
        self.phase = 0.0

    def process(self, x):  # (N, C)
        p = self.p
        dph = np.float32(p["rate_hz"]) / np.float32(self.fs)
        n, c = x.shape
        y = np.zeros_like(x)
        s = self.hist_len
        ext = np.concatenate([self.hist, x.T], axis=1)  # (C, S+N)
        for i in range(n):
            ph = self.phase + i * float(dph)
            for ch in range(c):
                pc = ph + p["spread"] * ch
                d_ms = p["base_ms"] + p["depth_ms"] * np.sin(2 * np.pi * pc)
                a = min(max(d_ms * self.fs / 1000.0, 2.0), s - 2.0)
                ca = int(np.ceil(a))
                frac = ca - a
                base = s + i
                taps = [ext[ch, base - ca - 1 + k] for k in range(4)]
                wet = _cubic(frac, *taps)
                y[i, ch] = (1 - p["mix"]) * x[i, ch] + p["mix"] * wet
        self.hist = ext[:, -s:]
        self.phase = (self.phase + n * float(dph)) % 1.0
        return y


class OraclePhaser:
    """4-stage LFO-swept first-order allpass cascade, float64 per-sample
    (models/phaser.py definition; dph quantized to f32 like the model)."""

    N_STAGES = 4

    def __init__(self, fs, rate_hz=0.5, min_hz=200.0, max_hz=1600.0,
                 mix=0.5, spread=0.25, channels=2):
        self.fs = fs
        self.p = dict(rate_hz=rate_hz, min_hz=min_hz, max_hz=max_hz,
                      mix=mix, spread=spread)
        self.phase = 0.0
        self.xprev = np.zeros((channels, self.N_STAGES))
        self.yprev = np.zeros((channels, self.N_STAGES))

    def process(self, x):  # (N, C)
        p = self.p
        dph = float(np.float32(p["rate_hz"]) / np.float32(self.fs))
        lo, hi = min(p["min_hz"], p["max_hz"]), max(p["min_hz"], p["max_hz"])
        y = np.zeros_like(x)
        for i in range(x.shape[0]):
            ph = self.phase + i * dph
            for c in range(x.shape[1]):
                sweep = 0.5 * (1.0 + np.sin(2 * np.pi * (ph + p["spread"] * c)))
                f = lo * (hi / lo) ** sweep
                t = np.tan(np.pi * f / self.fs)
                a = (t - 1.0) / (t + 1.0)
                v = x[i, c]
                for s in range(self.N_STAGES):
                    out = a * v + self.xprev[c, s] - a * self.yprev[c, s]
                    self.xprev[c, s] = v
                    self.yprev[c, s] = out
                    v = out
                y[i, c] = (1 - p["mix"]) * x[i, c] + p["mix"] * v
        self.phase = (self.phase + x.shape[0] * dph) % 1.0
        return y


class OracleTremolo:
    """Amplitude LFO, float64 per-sample (models/tremolo.py definition);
    the f32 model quantizes dph = rate/fs once, mirrored here."""

    def __init__(self, fs, rate_hz=5.0, depth=0.5, spread=0.0):
        self.fs = fs
        self.p = dict(rate_hz=rate_hz, depth=depth, spread=spread)
        self.phase = 0.0

    def process(self, x):  # (N, C)
        p = self.p
        dph = float(np.float32(p["rate_hz"]) / np.float32(self.fs))
        y = np.zeros_like(x)
        for i in range(x.shape[0]):
            ph = self.phase + i * dph
            for c in range(x.shape[1]):
                g = 1.0 - 0.5 * p["depth"] * (
                    1.0 + np.sin(2 * np.pi * (ph + p["spread"] * c))
                )
                y[i, c] = x[i, c] * g
        self.phase = (self.phase + x.shape[0] * dph) % 1.0
        return y


class OracleSpectral:
    """SpectralFilter (spectral.py:5-100), constant params, hop=blocksize."""

    def __init__(self, fs, threshold_db=-40.0, reduction=0.5, smoothing=0.8,
                 hop=256, noise_profile=None, profile_over_db=6.0):
        self.p = dict(threshold_db=threshold_db, reduction=reduction,
                      profile_over_db=profile_over_db)
        self.hop = hop
        self.n_fft = 2 * hop
        self.window = np.hanning(self.n_fft)
        self.in_buffer = np.zeros(self.n_fft)
        self.out_accum = np.zeros(self.n_fft)
        self.mask = np.ones(self.n_fft // 2 + 1)
        self.alpha = smoothing
        # f32 like the model's static config — the per-bin thresholds must
        # be BITWISE the model's or near-threshold bins flip the mask
        # (CLAUDE.md: mirror every f32 coefficient the compare depends on).
        self.noise_profile = (None if noise_profile is None
                              else np.asarray(noise_profile, np.float32))

    def process(self, x):  # (N, C), N == hop
        hop = self.hop
        thresh = 10.0 ** (self.p["threshold_db"] / 20.0)
        red = self.p["reduction"]
        if self.noise_profile is not None:
            # Mirror the model's f32 arithmetic exactly: f32 power, f32
            # product (the f64 scalar `thresh` only wins where the profile
            # is far below it, where the compare can't flip).
            over = np.power(np.float32(10.0),
                            np.float32(self.p["profile_over_db"])
                            / np.float32(20.0))
            thresh = np.maximum(thresh, self.noise_profile * over)
        self.in_buffer[:-hop] = self.in_buffer[hop:]
        self.in_buffer[-hop:] = x.mean(axis=1)
        spec = np.fft.rfft(self.in_buffer * self.window)
        mag = np.abs(spec)
        cur = np.where(mag > thresh, 1.0, red)
        self.mask = self.alpha * self.mask + (1.0 - self.alpha) * cur
        processed = np.fft.irfft(spec * self.mask)
        self.out_accum += processed
        valid = self.out_accum[:hop].copy()
        self.out_accum[:-hop] = self.out_accum[hop:]
        self.out_accum[-hop:] = 0.0
        return np.repeat(valid[:, None], x.shape[1], axis=1)


class OracleWaveshaper:
    def __init__(self, drive=4.0, shape=1, mix=1.0, out_gain=1.0):
        self.p = dict(drive=drive, shape=shape, mix=mix, out_gain=out_gain)

    def process(self, x):
        p = self.p
        u = p["drive"] * x
        t = int(round(p["shape"]))
        if t == 0:
            wet = np.clip(u, -1, 1)
        elif t == 1:
            wet = np.tanh(u)
        else:
            c = np.clip(u, -1, 1)
            wet = 1.5 * c - 0.5 * c**3
        y = p["out_gain"] * (p["mix"] * wet + (1 - p["mix"]) * x)
        return np.clip(y, -1, 1)


class OracleStereoWidth:
    """Mid-side width + balance, float64 per-sample
    (models/stereowidth.py definition)."""

    def __init__(self, fs, width=1.0, pan=0.0):
        self.p = dict(width=width, pan=pan)

    def process(self, x):  # (N, 2)
        p = self.p
        m = 0.5 * (x[:, 0] + x[:, 1])
        s = 0.5 * (x[:, 0] - x[:, 1]) * p["width"]
        bl = min(1.0, 1.0 - p["pan"])
        br = min(1.0, 1.0 + p["pan"])
        return np.stack([(m + s) * bl, (m - s) * br], axis=1)


class OracleLimiter:
    """Look-ahead brickwall limiter, float64 per-sample
    (models/limiter.py definition: window-min gain floor, capped-affine
    release, W-point moving-average attack ramp, D = W-1 delay).
    The f32 release coefficient is mirrored exactly — it drives a
    forgetting recursion whose gap would otherwise amplify by
    1/(1-a_r)."""

    def __init__(self, fs, ceiling_db=-1.0, release_ms=80.0, drive_db=0.0,
                 lookahead_ms=5.0, channels=2):
        self.fs = fs
        self.p = dict(ceiling_db=ceiling_db, release_ms=release_ms,
                      drive_db=drive_db)
        self.w = max(int(round(lookahead_ms * fs / 1000.0)), 1) + 1
        d = self.w - 1
        self.xh = np.zeros((channels, d))
        self.gth = np.ones(d)
        self.vh = np.ones(d)
        self.g = 1.0

    def process(self, x):  # (N, C)
        p = self.p
        w = self.w
        d = w - 1
        gain_in = float(np.exp2(np.float32(p["drive_db"])
                                * np.float32(1.0 / 6.0206)))
        ceiling = float(np.exp2(np.float32(p["ceiling_db"])
                                * np.float32(1.0 / 6.0206)))
        a_r = float(np.exp(np.float32(-1000.0)
                           / (np.float32(p["release_ms"])
                              * np.float32(self.fs))))
        n, c = x.shape
        y = np.zeros_like(x)
        xext = np.concatenate([self.xh, gain_in * x.T], axis=1)  # (C, D+N)
        gtext = np.concatenate([self.gth, np.zeros(n)])
        vext = np.concatenate([self.vh, np.zeros(n)])
        for i in range(n):
            j = d + i
            peak = np.max(np.abs(xext[:, j]))
            gtext[j] = min(1.0, ceiling / max(peak, 1e-30))
            u = np.min(gtext[j - d: j + 1])
            self.g = min(u, a_r * self.g + (1.0 - a_r) * u)
            vext[j] = self.g
            g = np.mean(vext[j - d: j + 1])
            y[i] = g * xext[:, j - d]
        self.xh = xext[:, -d:]
        self.gth = gtext[-d:]
        self.vh = vext[-d:]
        return y


class OracleWah:
    """LFO/envelope-swept Chamberlin SVF, float64 per-sample
    (models/wah.py definition; f32 dph/a_e quantization mirrored)."""

    def __init__(self, fs, rate_hz=1.5, min_hz=350.0, max_hz=2200.0,
                 res=3.0, mix=1.0, mode=0.0, sens=4.0, env_ms=30.0,
                 channels=2):
        self.fs = fs
        self.p = dict(rate_hz=rate_hz, min_hz=min_hz, max_hz=max_hz,
                      res=res, mix=mix, mode=mode, sens=sens, env_ms=env_ms)
        self.low = np.zeros(channels)
        self.band = np.zeros(channels)
        self.env = 0.0
        self.phase = 0.0

    def process(self, x):  # (N, C)
        p = self.p
        dph = float(np.float32(p["rate_hz"]) / np.float32(self.fs))
        a_e = float(np.exp(np.float32(-1000.0)
                           / (np.float32(p["env_ms"]) * np.float32(self.fs))))
        q1 = 1.0 / p["res"]
        lo = min(p["min_hz"], p["max_hz"])
        hi = max(p["min_hz"], p["max_hz"])
        y = np.zeros_like(x)
        for i in range(x.shape[0]):
            ph = self.phase + i * dph
            lfo = 0.5 * (1.0 + np.sin(2 * np.pi * ph))
            self.env = a_e * self.env + (1 - a_e) * np.mean(np.abs(x[i]))
            esw = min(max(p["sens"] * self.env, 0.0), 1.0)
            sweep = (1 - p["mode"]) * lfo + p["mode"] * esw
            fc = lo * (hi / lo) ** sweep
            f = 2.0 * np.sin(np.pi * fc / self.fs)
            # stability clamp at low fs (models/wah.py)
            f = min(f, 0.95 * (np.sqrt(q1 * q1 + 4.0) - q1))
            for c in range(x.shape[1]):
                self.low[c] = self.low[c] + f * self.band[c]
                high = x[i, c] - self.low[c] - q1 * self.band[c]
                self.band[c] = self.band[c] + f * high
                y[i, c] = (1 - p["mix"]) * x[i, c] + p["mix"] * q1 * self.band[c]
        self.phase = (self.phase + x.shape[0] * dph) % 1.0
        return y


class OracleFlanger:
    """Feedback flanger, float64 per-sample (models/flanger.py
    definition): v[n] = x[n] + fb * s[n] with s[n] the cubic tap of v at
    the LFO-swept distance, y = (1-mix)x + mix*s.  Tap convention
    matches fractional_read_cubic (taps at ceil(a)+{1,0,-1,-2}, frac =
    ceil(a) - a); the d >= 24-sample clamp and the f32 dph quantization
    mirror the model."""

    D_MIN = 24.0

    def __init__(self, fs, rate_hz=0.3, depth_ms=2.0, base_ms=2.5,
                 feedback=0.6, mix=0.5, spread=0.0, channels=2):
        self.fs = fs
        self.p = dict(rate_hz=rate_hz, depth_ms=depth_ms, base_ms=base_ms,
                      feedback=feedback, mix=mix, spread=spread)
        self.hist_len = int((10.0 + 5.0) * fs / 1000.0) + 8
        self.hist = np.zeros((channels, self.hist_len))
        self.phase = 0.0

    def process(self, x):  # (N, C)
        p = self.p
        dph = float(np.float32(p["rate_hz"]) / np.float32(self.fs))
        n, c = x.shape
        y = np.zeros_like(x)
        s = self.hist_len
        ext = np.concatenate([self.hist, np.zeros((c, n))], axis=1)
        for i in range(n):
            ph = self.phase + i * dph
            for ch in range(c):
                pc = ph + p["spread"] * ch
                d_ms = p["base_ms"] + p["depth_ms"] * np.sin(2 * np.pi * pc)
                a = min(max(d_ms * self.fs / 1000.0, self.D_MIN), s - 2.0)
                ca = int(np.ceil(a))
                frac = ca - a
                base = s + i
                taps = [ext[ch, base - ca - 1 + k] for k in range(4)]
                tap = _cubic(frac, *taps)
                ext[ch, base] = x[i, ch] + p["feedback"] * tap
                y[i, ch] = (1 - p["mix"]) * x[i, ch] + p["mix"] * tap
        self.hist = ext[:, -s:]
        self.phase = (self.phase + n * dph) % 1.0
        return y


def _phase_step_u32(freq_hz, fs):
    """Mirror models/ringmod.py:phase_step_u32 exactly (f32 multiply by
    the host-f64 scale, top-of-range clamp) so the integer phase math is
    bitwise shared.  The multiply-by-scale form exists because an
    on-device f32 DIVISION is not correctly rounded on XLA CPU (1 ulp low
    for e.g. 8000/44100) — see the model docstring."""
    prod = np.float32(np.float32(freq_hz) * np.float32(2.0**32 / float(fs)))
    return int(min(float(np.round(prod)), 2.0**32 - 256.0))


class OracleRingMod:
    """Carrier multiplication, float64 per-sample on the model's exact
    uint32 modular phase (models/ringmod.py definition)."""

    def __init__(self, fs, carrier_hz=440.0, mix=1.0, spread=0.0):
        self.fs = fs
        self.p = dict(carrier_hz=carrier_hz, mix=mix, spread=spread)
        self.acc = 0

    def process(self, x):  # (N, C)
        p = self.p
        num = _phase_step_u32(p["carrier_hz"], self.fs)
        y = np.zeros_like(x)
        for i in range(x.shape[0]):
            ph = ((self.acc + i * num) % 2**32) / 2.0**32
            for c in range(x.shape[1]):
                carrier = np.sin(2 * np.pi * (ph + p["spread"] * c))
                y[i, c] = (1 - p["mix"]) * x[i, c] + p["mix"] * x[i, c] * carrier
        self.acc = (self.acc + x.shape[0] * num) % 2**32
        return y


class OracleBitcrusher:
    """Sample-and-hold + bit quantization, float64 per-sample on the
    model's exact uint32 decimation clock (models/bitcrusher.py)."""

    def __init__(self, fs, bits=8.0, rate_hz=8000.0, mix=1.0, channels=2):
        self.fs = fs
        self.p = dict(bits=bits, rate_hz=rate_hz, mix=mix)
        self.acc = 0
        self.held = np.zeros(channels)

    def process(self, x):  # (N, C)
        p = self.p
        num = _phase_step_u32(p["rate_hz"], self.fs)
        levels = float(np.exp2(np.float32(p["bits"]) - 1.0))
        y = np.zeros_like(x)
        for i in range(x.shape[0]):
            if (self.acc + i * num) % 2**32 < num:
                self.held = np.round(x[i] * levels) / levels
            y[i] = (1 - p["mix"]) * x[i] + p["mix"] * self.held
        self.acc = (self.acc + x.shape[0] * num) % 2**32
        return y


class OracleConvReverb:
    """Exact streaming FIR convolution with the same IR."""

    def __init__(self, ir, mix_dry=0.7, mix_wet=0.4):
        self.ir = np.asarray(ir, np.float64)  # (C, L)
        self.p = dict(mix_dry=mix_dry, mix_wet=mix_wet)
        self.tail = np.zeros((self.ir.shape[0], self.ir.shape[1] - 1))

    def process(self, x):  # (N, C)
        n = x.shape[0]
        out = np.zeros_like(x)
        for c in range(x.shape[1]):
            full = np.convolve(x[:, c], self.ir[c])
            full[: self.tail.shape[1]] += self.tail[c]
            out[:, c] = full[:n]
            new_tail = np.zeros(self.ir.shape[1] - 1)
            new_tail[: len(full) - n] = full[n:]
            self.tail[c] = new_tail
        wet = out
        y = self.p["mix_dry"] * x + self.p["mix_wet"] * wet
        return np.clip(y, -1, 1)


def run_oracle_blocks(oracle, x, blocksize):
    """Feed (frames, C) float audio through an oracle in fixed blocks."""
    frames = x.shape[0]
    pad = (-frames) % blocksize
    if pad:
        x = np.concatenate([x, np.zeros((pad, x.shape[1]))])
    out = np.zeros_like(x)
    for i in range(0, len(x), blocksize):
        out[i : i + blocksize] = oracle.process(x[i : i + blocksize])
    return out[:frames]


def err_dbfs(a, b):
    """Peak error in dB relative to full scale (1.0)."""
    e = float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))
    return -np.inf if e == 0 else 20.0 * np.log10(e)
