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

/* Legend chips + PNG export, drawn into the canvas top-right corner.
 * Click a series chip to toggle its visibility (reference analogue:
 * Plotly legend toggling, 02_custom.js:165-280); the ⤓ chip downloads
 * the current canvas as a PNG (Plotly's toImage toolbar button). */
function drawLegend(ctx, w, canvas, entries) {
  ctx.font = "10px sans-serif";
  const rects = [];
  let x = w - 6;
  for (let i = entries.length - 1; i >= 0; i--) {
    const en = entries[i];
    const tw = ctx.measureText(en.label).width + (en.color ? 14 : 8);
    x -= tw + 6;
    const r = { x, y: 4, w: tw, h: 14, key: en.key };
    ctx.fillStyle = "rgba(18,21,26,0.75)";
    ctx.fillRect(r.x, r.y, r.w, r.h);
    if (en.color) {
      ctx.fillStyle = en.on ? en.color : Palette.grid;
      ctx.fillRect(r.x + 4, r.y + 5, 6, 4);
      ctx.fillStyle = en.on ? "#e0e6ee" : Palette.text;
      ctx.fillText(en.label, r.x + 12, r.y + 11);
    } else {
      ctx.fillStyle = Palette.text;
      ctx.fillText(en.label, r.x + 4, r.y + 11);
    }
    rects.push(r);
  }
  canvas._legendRects = rects;
}

function legendHit(canvas, px, py) {
  const rects = canvas._legendRects || [];
  for (const r of rects) {
    if (px >= r.x && px <= r.x + r.w && py >= r.y && py <= r.y + r.h) return r.key;
  }
  return null;
}

function exportCanvasPNG(canvas, name) {
  const a = document.createElement("a");
  a.href = canvas.toDataURL("image/png");
  a.download = name + ".png";
  a.click();
}

/* Shared pan/zoom/hover plumbing: each interactive plot owns a view
 * window [lo, hi] (a fraction of its x-axis) plus a y value range
 * [yLo, yHi] and a hover cursor, and re-renders on wheel-zoom around
 * the cursor, drag-pan, shift-drag box zoom (x AND y range, like
 * Plotly's default dragmode), legend clicks, mouse move and
 * double-click reset (reference analogue: Plotly's zoom/pan/hover on
 * all three plots, 02_custom.js:165-280). */
function attachPanZoom(canvas, view, render, setHover, vis, exportName) {
  let dragging = false, boxing = false, dragX = 0, dragY = 0, dragLo = 0, dragHi = 1;
  let moved = false;
  canvas.addEventListener("wheel", (e) => {
    e.preventDefault();
    const w = canvas.clientWidth || 1;
    const frac = e.offsetX / w;
    const span = view.hi - view.lo;
    const c = view.lo + frac * span;
    const ns = Math.min(1, Math.max(0.01, span * (e.deltaY > 0 ? 1.25 : 0.8)));
    view.lo = Math.max(0, Math.min(c - frac * ns, 1 - ns));
    view.hi = view.lo + ns;
    render();
  }, { passive: false });
  canvas.addEventListener("mousedown", (e) => {
    dragX = e.offsetX; dragY = e.offsetY; moved = false;
    if (e.shiftKey) { boxing = true; view._box = { x0: dragX, y0: dragY, x1: dragX, y1: dragY }; }
    else { dragging = true; dragLo = view.lo; dragHi = view.hi; }
  });
  window.addEventListener("mouseup", (e) => {
    if (boxing) {
      boxing = false;
      const b = view._box; view._box = null;
      if (b && Math.abs(b.x1 - b.x0) > 8) {
        const w = canvas.clientWidth || 1, h = canvas.clientHeight || 1;
        const span = view.hi - view.lo;
        const f0 = Math.max(0, Math.min(b.x0, b.x1) / w);
        const f1 = Math.min(1, Math.max(b.x0, b.x1) / w);
        const nlo = view.lo + f0 * span, nhi = view.lo + f1 * span;
        view.lo = nlo; view.hi = Math.max(nhi, nlo + 0.001);
        if (Math.abs(b.y1 - b.y0) > 8 && view.yLo != null) {
          const ySpan = view.yHi - view.yLo;
          const top = Math.min(b.y0, b.y1) / h, bot = Math.max(b.y0, b.y1) / h;
          const nyHi = view.yHi - top * ySpan, nyLo = view.yHi - bot * ySpan;
          view.yLo = nyLo; view.yHi = Math.max(nyHi, nyLo + 1e-6);
        }
      }
      render();
    }
    dragging = false;
  });
  canvas.addEventListener("mousemove", (e) => {
    if (boxing && view._box) {
      view._box.x1 = e.offsetX; view._box.y1 = e.offsetY; moved = true;
    } else if (dragging) {
      moved = moved || Math.abs(e.offsetX - dragX) > 3;
      const w = canvas.clientWidth || 1;
      const span = dragHi - dragLo;
      const d = ((dragX - e.offsetX) / w) * span;
      view.lo = Math.max(0, Math.min(dragLo + d, 1 - span));
      view.hi = view.lo + span;
    }
    setHover(e.offsetX);
    render();
  });
  canvas.addEventListener("click", (e) => {
    if (moved) return;  // end of a pan, not a click
    const key = legendHit(canvas, e.offsetX, e.offsetY);
    if (key === "__export__") exportCanvasPNG(canvas, exportName || "plot");
    else if (key && vis) { vis[key] = !vis[key]; render(); }
  });
  canvas.addEventListener("mouseleave", () => { setHover(null); render(); });
  canvas.addEventListener("dblclick", () => {
    view.lo = 0; view.hi = 1;
    if (view.yLo != null) { view.yLo = view.yDefLo; view.yHi = view.yDefHi; }
    render();
  });
}

function drawBoxOverlay(ctx, view) {
  const b = view._box;
  if (!b) return;
  ctx.fillStyle = "rgba(122,162,247,0.12)";
  ctx.strokeStyle = Palette.input;
  ctx.lineWidth = 1;
  const x = Math.min(b.x0, b.x1), y = Math.min(b.y0, b.y1);
  const w = Math.abs(b.x1 - b.x0), h = Math.abs(b.y1 - b.y0);
  ctx.fillRect(x, y, w, h);
  ctx.strokeRect(x, y, w, h);
}

function drawHoverTip(ctx, w, x, txt) {
  const hFull = ctx.canvas.clientHeight || 0;
  ctx.strokeStyle = Palette.text; ctx.lineWidth = 1;
  ctx.setLineDash([3, 3]);
  ctx.beginPath(); ctx.moveTo(x, 0); ctx.lineTo(x, hFull); ctx.stroke();
  ctx.setLineDash([]);
  ctx.font = "11px sans-serif";
  const tw = ctx.measureText(txt).width + 10;
  const tx = Math.min(Math.max(2, x + 8), w - tw - 2);
  ctx.fillStyle = "rgba(18,21,26,0.85)";
  ctx.fillRect(tx, 4, tw, 16);
  ctx.fillStyle = "#e0e6ee";
  ctx.fillText(txt, tx + 5, 16);
}

/* Interactive time plot: same view mechanics over the sample axis;
 * the hover readout converts to milliseconds via the page's sampleRate
 * when it is known. */
const TimeView = { lo: 0, hi: 1, yLo: -1, yHi: 1, yDefLo: -1, yDefHi: 1 };
const TimeVis = { input: true, output: true };
let timeState = null;   // {canvas, input, output}
let timeHover = null;

function drawTime(canvas, input, output) {
  timeState = { canvas, input, output };
  renderTime();
}

function renderTime() {
  if (!timeState) return;
  const { canvas, input, output } = timeState;
  const { ctx, w, h } = prepCanvas(canvas);
  drawGrid(ctx, w, h);
  const n = input ? input.length : (output ? output.length : 0);
  if (!n) return;
  const i0 = Math.max(0, Math.floor(TimeView.lo * (n - 1)));
  const i1 = Math.min(n - 1, Math.max(i0 + 1, Math.ceil(TimeView.hi * (n - 1))));
  const slice = (d) => (d ? Array.prototype.slice.call(d, i0, i1 + 1) : null);
  if (TimeVis.input)
    drawSeries(ctx, w, h, slice(input), Palette.input, TimeView.yLo, TimeView.yHi, 1600);
  if (TimeVis.output)
    drawSeries(ctx, w, h, slice(output), Palette.output, TimeView.yLo, TimeView.yHi, 1600);

  if (timeHover != null) {
    const frac = Math.max(0, Math.min(1, timeHover / w));
    const idx = i0 + Math.round(frac * (i1 - i0));
    const x = ((idx - i0) / Math.max(1, i1 - i0)) * w;
    const fs = (typeof sampleRate !== "undefined" && sampleRate) || 0;
    const at = fs ? `${(idx / fs * 1000).toFixed(1)} ms` : `n ${idx}`;
    const iv = TimeVis.input && input && input[idx] != null ? input[idx].toFixed(3) : "—";
    const ov = TimeVis.output && output && output[idx] != null ? output[idx].toFixed(3) : "—";
    drawHoverTip(ctx, w, x, `${at}   in ${iv}   out ${ov}`);
  }
  drawLegend(ctx, w, canvas, [
    { label: "in", color: Palette.input, on: TimeVis.input, key: "input" },
    { label: "out", color: Palette.output, on: TimeVis.output, key: "output" },
    { label: "⤓", key: "__export__" },
  ]);
  drawBoxOverlay(ctx, TimeView);
}

function attachTimeInteractions(canvas) {
  attachPanZoom(canvas, TimeView, renderTime, (v) => { timeHover = v; },
                TimeVis, "waveform");
}

/* Interactive spectrum: wheel-zoom around the cursor, drag-pan,
 * hover readout (freq + in/out dB), double-click reset.  The view is a
 * fraction [lo, hi] of the log-spaced bin axis; the bins ship from the
 * server with their frequency axis (utils/analysis.py plot_freqs), so
 * both live and file-scrub modes share the same interactions
 * (reference analogue: Plotly zoom/pan/hover, 02_custom.js:178-250). */
const SpecView = { lo: 0, hi: 1, yLo: -100, yHi: 0, yDefLo: -100, yDefHi: 0 };
const SpecVis = { input: true, output: true };
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
  if (SpecVis.input)
    drawSeries(ctx, w, h, slice(inDb), Palette.input, SpecView.yLo, SpecView.yHi);
  if (outDb && SpecVis.output)
    drawSeries(ctx, w, h, slice(outDb), Palette.output, SpecView.yLo, SpecView.yHi);
  ctx.fillStyle = Palette.text; ctx.font = "10px sans-serif";
  const fLo = freqs ? freqs[i0] : null, fHi = freqs ? freqs[i1] : null;
  ctx.fillText(fLo != null ? fmtHz(fLo) : "20 Hz", 4, h - 4);
  const hiTxt = fHi != null ? fmtHz(fHi) : "20 kHz";
  ctx.fillText(hiTxt, w - ctx.measureText(hiTxt).width - 4, h - 4);

  if (specHover != null) {
    const frac = Math.max(0, Math.min(1, specHover / w));
    const idx = i0 + Math.round(frac * (i1 - i0));
    const x = ((idx - i0) / (i1 - i0)) * w;
    const fv = freqs ? fmtHz(freqs[idx]) : `bin ${idx}`;
    const iv = SpecVis.input && inDb[idx] != null ? inDb[idx].toFixed(1) : "—";
    const ov = SpecVis.output && outDb && outDb[idx] != null ? outDb[idx].toFixed(1) : "—";
    drawHoverTip(ctx, w, x, `${fv}   in ${iv} dB   out ${ov} dB`);
  }
  drawLegend(ctx, w, canvas, [
    { label: "in", color: Palette.input, on: SpecVis.input, key: "input" },
    { label: "out", color: Palette.output, on: SpecVis.output, key: "output" },
    { label: "⤓", key: "__export__" },
  ]);
  drawBoxOverlay(ctx, SpecView);
}

function attachSpectrumInteractions(canvas) {
  attachPanZoom(canvas, SpecView, renderSpectrum, (v) => { specHover = v; },
                SpecVis, "spectrum");
}

const NOTE_NAMES = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"];

/* Chroma hover: highlight the pitch class under the cursor and show its
 * in/out energies (12 bars — no zoom needed, hover readout only). */
const ChromaVis = { input: true, output: true };
let chromaState = null;  // {canvas, inChroma, outChroma}
let chromaHover = null;

function drawChroma(canvas, inChroma, outChroma) {
  chromaState = { canvas, inChroma, outChroma };
  renderChroma();
}

function renderChroma() {
  if (!chromaState) return;
  const { canvas, inChroma, outChroma } = chromaState;
  const { ctx, w, h } = prepCanvas(canvas);
  const n = 12, bw = w / n;
  const hi = chromaHover != null
    ? Math.max(0, Math.min(n - 1, Math.floor(chromaHover / bw))) : -1;
  for (let i = 0; i < n; i++) {
    const vi = (inChroma && inChroma[i]) || 0, vo = (outChroma && outChroma[i]) || 0;
    if (i === hi) {
      ctx.fillStyle = "rgba(255,255,255,0.06)";
      ctx.fillRect(i * bw, 0, bw, h);
    }
    if (ChromaVis.input) {
      ctx.fillStyle = Palette.input;
      ctx.fillRect(i * bw + 2, h - 14 - vi * (h - 18), bw / 2 - 3, vi * (h - 18));
    }
    if (ChromaVis.output) {
      ctx.fillStyle = Palette.output;
      ctx.fillRect(i * bw + bw / 2, h - 14 - vo * (h - 18), bw / 2 - 3, vo * (h - 18));
    }
    ctx.fillStyle = Palette.text; ctx.font = "10px sans-serif";
    ctx.fillText(NOTE_NAMES[i], i * bw + bw / 2 - 6, h - 3);
  }
  if (hi >= 0) {
    const vi = (inChroma && inChroma[hi]) || 0, vo = (outChroma && outChroma[hi]) || 0;
    drawHoverTip(ctx, w, hi * bw + bw / 2,
                 `${NOTE_NAMES[hi]}   in ${vi.toFixed(2)}   out ${vo.toFixed(2)}`);
  }
  drawLegend(ctx, w, canvas, [
    { label: "in", color: Palette.input, on: ChromaVis.input, key: "input" },
    { label: "out", color: Palette.output, on: ChromaVis.output, key: "output" },
    { label: "⤓", key: "__export__" },
  ]);
}

function attachChromaInteractions(canvas) {
  canvas.addEventListener("mousemove", (e) => { chromaHover = e.offsetX; renderChroma(); });
  canvas.addEventListener("mouseleave", () => { chromaHover = null; renderChroma(); });
  canvas.addEventListener("click", (e) => {
    const key = legendHit(canvas, e.offsetX, e.offsetY);
    if (key === "__export__") exportCanvasPNG(canvas, "chroma");
    else if (key) { ChromaVis[key] = !ChromaVis[key]; renderChroma(); }
  });
}
