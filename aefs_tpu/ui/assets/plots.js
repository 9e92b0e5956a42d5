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

function drawSpectrum(canvas, inDb, outDb) {
  const { ctx, w, h } = prepCanvas(canvas);
  drawGrid(ctx, w, h);
  drawSeries(ctx, w, h, inDb, Palette.input, -100, 0);
  drawSeries(ctx, w, h, outDb, Palette.output, -100, 0);
  ctx.fillStyle = Palette.text; ctx.font = "10px sans-serif";
  ctx.fillText("20 Hz", 4, h - 4); ctx.fillText("20 kHz", w - 38, h - 4);
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
