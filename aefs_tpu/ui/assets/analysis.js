/* Client-side spectrum + chroma fallback.
 *
 * The reference computes ALL plot analysis in the browser — a vendored
 * radix-4 FFT (reference assets/01_fft.js:3-224) and a pitch-class chroma
 * fold (assets/02_custom.js:65-106).  This build normally ships reduced
 * spectra computed by the on-device STFT (utils/analysis.py), but the raw
 * sample lists are already in every plot_data / file_processed payload for
 * wire parity — so when the server analysis is absent (AEFS_SERVER_ANALYSIS=0
 * or PlotAnalyzer init failure), these functions reproduce the SAME
 * analysis locally: identical window, normalization, log-spaced bins, and
 * chroma fold as utils/analysis.py, so the panels render either way and the
 * two paths agree on a shared fixture (tests/test_ui_js.py).
 *
 * Kept dependency-free and in a deliberately plain JS subset: the test
 * suite executes this file under tests/jsmini.py (the image has no node).
 */
"use strict";

const AEFS_FFT_SIZE = 16384;       // utils/analysis.py FFT_SIZE
const AEFS_SPECTRUM_POINTS = 480;  // utils/analysis.py SPECTRUM_POINTS
const AEFS_CHROMA_BINS = 12;

function aefsBlackmanHarris(n) {
  const w = new Array(n);
  for (let k = 0; k < n; k++) {
    const t = (2 * Math.PI * k) / (n - 1);
    w[k] = 0.35875 - 0.48829 * Math.cos(t) + 0.14128 * Math.cos(2 * t)
         - 0.01168 * Math.cos(3 * t);
  }
  return w;
}

/* In-place iterative radix-2 complex FFT (decimation in time).  re/im are
 * equal-length arrays whose length is a power of two.  Same role as the
 * reference's vendored FFT (assets/01_fft.js) — rewritten, not copied. */
function aefsFft(re, im) {
  const n = re.length;
  // Bit-reversal permutation.
  for (let i = 1, j = 0; i < n; i++) {
    let bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      let tr = re[i]; re[i] = re[j]; re[j] = tr;
      let ti = im[i]; im[i] = im[j]; im[j] = ti;
    }
  }
  for (let len = 2; len <= n; len <<= 1) {
    const ang = (-2 * Math.PI) / len;
    const wr = Math.cos(ang), wi = Math.sin(ang);
    for (let i = 0; i < n; i += len) {
      let cr = 1.0, ci = 0.0;
      const half = len >> 1;
      for (let k = 0; k < half; k++) {
        const a = i + k, b = i + k + half;
        const vr = re[b] * cr - im[b] * ci;
        const vi = re[b] * ci + im[b] * cr;
        re[b] = re[a] - vr; im[b] = im[a] - vi;
        re[a] = re[a] + vr; im[a] = im[a] + vi;
        const nr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = nr;
      }
    }
  }
}

/* Magnitudes of the one-sided transform of a real signal (length must be a
 * power of two): |rfft(x)|, bins 0..n/2 inclusive — jnp.abs(jnp.fft.rfft)
 * parity for the analysis path. */
function aefsRfftMag(signal) {
  const n = signal.length;
  const re = new Array(n), im = new Array(n);
  for (let i = 0; i < n; i++) { re[i] = signal[i]; im[i] = 0.0; }
  aefsFft(re, im);
  const out = new Array(n / 2 + 1);
  for (let k = 0; k <= n / 2; k++) out[k] = Math.hypot(re[k], im[k]);
  return out;
}

/* fs-dependent lookup tables, mirroring PlotAnalyzer.__init__
 * (utils/analysis.py): log-spaced display bins, pitch-class map, and the
 * audible-band frequency weighting. */
function aefsAnalysisTables(fs) {
  const nb = AEFS_FFT_SIZE / 2 + 1;
  const df = fs / AEFS_FFT_SIZE;
  const lo = 20.0, hi = Math.min(20000.0, fs / 2);
  const freqs = new Array(AEFS_SPECTRUM_POINTS);
  const logIdx = new Array(AEFS_SPECTRUM_POINTS);
  for (let i = 0; i < AEFS_SPECTRUM_POINTS; i++) {
    const t = lo * Math.pow(hi / lo, i / (AEFS_SPECTRUM_POINTS - 1));
    freqs[i] = t;
    // np.searchsorted(binFreqs, t) with binFreqs[k] = k*df: first k with
    // k*df >= t, clipped into range.
    let k = Math.ceil(t / df);
    if (k * df < t) k++;          // guard FP underestimation of ceil
    if ((k - 1) * df >= t) k--;   // guard FP overestimation
    logIdx[i] = Math.min(Math.max(k, 0), nb - 1);
  }
  const pcMap = new Array(nb), pcWeight = new Array(nb);
  for (let k = 0; k < nb; k++) {
    const f = k * df;
    const audible = f >= 55.0 && f <= 5000.0;
    if (audible) {
      const midi = 12.0 * Math.log2(Math.max(f, 1e-9) / 440.0) + 69.0;
      pcMap[k] = ((Math.round(midi) % 12) + 12) % 12;
      pcWeight[k] = 1.0 / Math.sqrt(Math.max(f, 55.0) / 55.0);
    } else {
      pcMap[k] = AEFS_CHROMA_BINS;  // discard bucket
      pcWeight[k] = 0.0;
    }
  }
  return { fs: fs, freqs: freqs, logIdx: logIdx, pcMap: pcMap,
           pcWeight: pcWeight, window: aefsBlackmanHarris(AEFS_FFT_SIZE) };
}

/* One analysis frame: the FFT_SIZE most recent samples -> log-spectrum (dB
 * at the log-spaced display bins) + 12-bin chroma.  Mirrors _analyze in
 * utils/analysis.py: mag = |rfft(tail*win)| / (N/4); dB floor 1e-7;
 * chroma = cube of the max-normalized weighted-energy pitch-class fold. */
function aefsAnalyzeTail(tail, tables) {
  const n = AEFS_FFT_SIZE;
  const x = new Array(n);
  const off = tail.length - n;
  for (let i = 0; i < n; i++) {
    const s = off + i >= 0 ? tail[off + i] : 0.0;
    x[i] = s * tables.window[i];
  }
  const spec = aefsRfftMag(x);
  const scale = 4.0 / n;
  const specDb = new Array(tables.logIdx.length);
  for (let i = 0; i < tables.logIdx.length; i++) {
    const mag = spec[tables.logIdx[i]] * scale;
    specDb[i] = 20.0 * Math.log10(Math.max(mag, 1e-7));
  }
  const chroma = new Array(AEFS_CHROMA_BINS);
  for (let c = 0; c < AEFS_CHROMA_BINS; c++) chroma[c] = 0.0;
  for (let k = 0; k < spec.length; k++) {
    const c = tables.pcMap[k];
    if (c < AEFS_CHROMA_BINS) {
      const e = spec[k] * scale * tables.pcWeight[k];
      chroma[c] += e * e;
    }
  }
  let mx = 1e-12;
  for (let c = 0; c < AEFS_CHROMA_BINS; c++) mx = Math.max(mx, chroma[c]);
  for (let c = 0; c < AEFS_CHROMA_BINS; c++) {
    const v = chroma[c] / mx;
    chroma[c] = v * v * v;
  }
  return { spectrum_db: specDb, chroma: chroma };
}

/* Full fallback payload in the server's shape ({freqs, input:{spectrum_db,
 * chroma}, output:{...}}) from the live rings. */
function aefsAnalyzeRings(ringIn, ringOut, tables) {
  return {
    freqs: tables.freqs,
    input: aefsAnalyzeTail(ringIn, tables),
    output: aefsAnalyzeTail(ringOut, tables),
  };
}

/* tests/jsmini.py reads these from the module scope; browsers ignore it. */
if (typeof module !== "undefined" && module.exports) {
  module.exports = {
    aefsBlackmanHarris, aefsFft, aefsRfftMag, aefsAnalysisTables,
    aefsAnalyzeTail, aefsAnalyzeRings,
  };
}
