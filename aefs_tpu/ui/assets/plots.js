/* Minimal canvas plotting for the before/after views.
 * Replaces the reference's Plotly rendering (assets/02_custom.js:161-280);
 * spectra and chroma arrive pre-computed from the server's on-device STFT,
 * so the client only draws. */
"use strict";

const Palette = { input: "#7aa2f7", output: "#9ece6a", grid: "#2a2f36", text: "#8a93a0" };

function prepCanvas(canvas) {
  const dpr = window.devicePixelRatio || 1;
  const w = canvas.clientWidth, h = canvas.clientHeight;
  if (canvas.width !== w * dpr || canvas.height !== h * dpr) {
    canvas.width = w * dpr; canvas.height = h * dpr;
  }
  const ctx = canvas.getContext("2d");
  ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
  ctx.clearRect(0, 0, w, h);
  return { ctx, w, h };
}

function drawGrid(ctx, w, h, rows = 4, cols = 8) {
  ctx.strokeStyle = Palette.grid; ctx.lineWidth = 1; ctx.beginPath();
  for (let i = 1; i < rows; i++) { const y = (h * i) / rows; ctx.moveTo(0, y); ctx.lineTo(w, y); }
  for (let i = 1; i < cols; i++) { const x = (w * i) / cols; ctx.moveTo(x, 0); ctx.lineTo(x, h); }
  ctx.stroke();
}

function drawSeries(ctx, w, h, data, color, yMin, yMax, decimate) {
  if (!data || !data.length) return;
  const step = Math.max(1, Math.floor(data.length / (decimate || w * 2)));
  ctx.strokeStyle = color; ctx.lineWidth = 1.2; ctx.beginPath();
  for (let i = 0, px = 0; i < data.length; i += step, px++) {
    const x = (i / (data.length - 1)) * w;
    const v = Math.max(yMin, Math.min(yMax, data[i]));
    const y = h - ((v - yMin) / (yMax - yMin)) * h;
    if (i === 0) ctx.moveTo(x, y); else ctx.lineTo(x, y);
  }
  ctx.stroke();
}

function drawTime(canvas, input, output) {
  const { ctx, w, h } = prepCanvas(canvas);
  drawGrid(ctx, w, h);
  drawSeries(ctx, w, h, input, Palette.input, -1, 1, 1600);
  drawSeries(ctx, w, h, output, Palette.output, -1, 1, 1600);
}

/* Interactive spectrum: wheel-zoom around the cursor, drag-pan,
 * hover readout (freq + in/out dB), double-click reset.  The view is a
 * fraction [lo, hi] of the log-spaced bin axis; the bins ship from the
 * server with their frequency axis (utils/analysis.py plot_freqs), so
 * both live and file-scrub modes share the same interactions
 * (reference analogue: Plotly zoom/pan/hover, 02_custom.js:178-250). */
const SpecView = { lo: 0, hi: 1 };
let specState = null;   // {canvas, inDb, outDb, freqs}
let specHover = null;   // cursor x in CSS px, or null

function fmtHz(f) {
  return f >= 1000 ? (f / 1000).toFixed(f >= 10000 ? 0 : 1) + " kHz"
                   : Math.round(f) + " Hz";
}

/* Optional temporal smoothing (EMA across frames — reference wishlist
 * todo:9 "opcion para smooth spectrum"), toggled by #smooth-spectrum. */
let specSmooth = { on: false, in: null, out: null };

function smoothSeries(prev, cur) {
  if (!prev || prev.length !== cur.length) return Array.from(cur);
  const a = 0.7, out = new Array(cur.length);
  for (let i = 0; i < cur.length; i++) out[i] = a * prev[i] + (1 - a) * cur[i];
  return out;
}

function drawSpectrum(canvas, inDb, outDb, freqs) {
  if (specSmooth.on && inDb) {
    specSmooth.in = smoothSeries(specSmooth.in, inDb);
    specSmooth.out = outDb ? smoothSeries(specSmooth.out, outDb) : null;
    inDb = specSmooth.in; outDb = specSmooth.out;
  } else {
    specSmooth.in = specSmooth.out = null;
  }
  specState = { canvas, inDb, outDb, freqs: freqs || null };
  renderSpectrum();
}

function renderSpectrum() {
  if (!specState) return;
  const { canvas, inDb, outDb, freqs } = specState;
  const { ctx, w, h } = prepCanvas(canvas);
  drawGrid(ctx, w, h);
  const n = inDb ? inDb.length : 0;
  if (!n) return;
  const i0 = Math.max(0, Math.floor(SpecView.lo * (n - 1)));
  const i1 = Math.min(n - 1, Math.max(i0 + 1, Math.ceil(SpecView.hi * (n - 1))));
  const slice = (d) => Array.prototype.slice.call(d, i0, i1 + 1);
  drawSeries(ctx, w, h, slice(inDb), Palette.input, -100, 0);
  if (outDb) drawSeries(ctx, w, h, slice(outDb), Palette.output, -100, 0);
  ctx.fillStyle = Palette.text; ctx.font = "10px sans-serif";
  const fLo = freqs ? freqs[i0] : null, fHi = freqs ? freqs[i1] : null;
  ctx.fillText(fLo != null ? fmtHz(fLo) : "20 Hz", 4, h - 4);
  const hiTxt = fHi != null ? fmtHz(fHi) : "20 kHz";
  ctx.fillText(hiTxt, w - ctx.measureText(hiTxt).width - 4, h - 4);

  if (specHover != null) {
    const frac = Math.max(0, Math.min(1, specHover / w));
    const idx = i0 + Math.round(frac * (i1 - i0));
    const x = ((idx - i0) / (i1 - i0)) * w;
    ctx.strokeStyle = Palette.text; ctx.lineWidth = 1;
    ctx.setLineDash([3, 3]);
    ctx.beginPath(); ctx.moveTo(x, 0); ctx.lineTo(x, h); ctx.stroke();
    ctx.setLineDash([]);
    const fv = freqs ? fmtHz(freqs[idx]) : `bin ${idx}`;
    const iv = inDb[idx] != null ? inDb[idx].toFixed(1) : "—";
    const ov = outDb && outDb[idx] != null ? outDb[idx].toFixed(1) : "—";
    const txt = `${fv}   in ${iv} dB   out ${ov} dB`;
    ctx.font = "11px sans-serif";
    const tw = ctx.measureText(txt).width + 10;
    const tx = Math.min(Math.max(2, x + 8), w - tw - 2);
    ctx.fillStyle = "rgba(18,21,26,0.85)";
    ctx.fillRect(tx, 4, tw, 16);
    ctx.fillStyle = "#e0e6ee";
    ctx.fillText(txt, tx + 5, 16);
  }
}

function attachSpectrumInteractions(canvas) {
  let dragging = false, dragX = 0, dragLo = 0, dragHi = 1;
  canvas.addEventListener("wheel", (e) => {
    e.preventDefault();
    const w = canvas.clientWidth || 1;
    const frac = e.offsetX / w;
    const span = SpecView.hi - SpecView.lo;
    const c = SpecView.lo + frac * span;
    const ns = Math.min(1, Math.max(0.01, span * (e.deltaY > 0 ? 1.25 : 0.8)));
    SpecView.lo = Math.max(0, Math.min(c - frac * ns, 1 - ns));
    SpecView.hi = SpecView.lo + ns;
    renderSpectrum();
  }, { passive: false });
  canvas.addEventListener("mousedown", (e) => {
    dragging = true; dragX = e.offsetX;
    dragLo = SpecView.lo; dragHi = SpecView.hi;
  });
  window.addEventListener("mouseup", () => { dragging = false; });
  canvas.addEventListener("mousemove", (e) => {
    if (dragging) {
      const w = canvas.clientWidth || 1;
      const span = dragHi - dragLo;
      const d = ((dragX - e.offsetX) / w) * span;
      SpecView.lo = Math.max(0, Math.min(dragLo + d, 1 - span));
      SpecView.hi = SpecView.lo + span;
    }
    specHover = e.offsetX;
    renderSpectrum();
  });
  canvas.addEventListener("mouseleave", () => { specHover = null; renderSpectrum(); });
  canvas.addEventListener("dblclick", () => {
    SpecView.lo = 0; SpecView.hi = 1; renderSpectrum();
  });
}

const NOTE_NAMES = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"];

function drawChroma(canvas, inChroma, outChroma) {
  const { ctx, w, h } = prepCanvas(canvas);
  const n = 12, bw = w / n;
  for (let i = 0; i < n; i++) {
    const vi = (inChroma && inChroma[i]) || 0, vo = (outChroma && outChroma[i]) || 0;
    ctx.fillStyle = Palette.input;
    ctx.fillRect(i * bw + 2, h - 14 - vi * (h - 18), bw / 2 - 3, vi * (h - 18));
    ctx.fillStyle = Palette.output;
    ctx.fillRect(i * bw + bw / 2, h - 14 - vo * (h - 18), bw / 2 - 3, vo * (h - 18));
    ctx.fillStyle = Palette.text; ctx.font = "10px sans-serif";
    ctx.fillText(NOTE_NAMES[i], i * bw + bw / 2 - 6, h - 3);
  }
}
