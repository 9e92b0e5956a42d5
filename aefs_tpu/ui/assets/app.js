/* Control-plane SPA: WebSocket client, chain CRUD, presets, file mode.
 * Speaks the same wire protocol as the reference backend
 * (src/backend.py:95-108 commands; plot_data / file_processed responses;
 * 3 s auto-reconnect like assets/02_custom.js:357-394). */
"use strict";

let CONFIG = null;
let socket = null;
let chain = [];            // [{effect_id, type, params}]
const WINDOW_SAMPLES = 131072;
const ringIn = new Float32Array(WINDOW_SAMPLES);
const ringOut = new Float32Array(WINDOW_SAMPLES);
let lastAnalysis = null;
let fileData = null;       // {original, processed, fs}
let sampleRate = 48000;
// Client-side analysis fallback (analysis.js): used whenever the backend
// ships no precomputed spectra (AEFS_SERVER_ANALYSIS=0 or PlotAnalyzer
// failure) — the reference always renders these panels browser-side
// (assets/01_fft.js, 02_custom.js:65-106), so must we.
let analysisTablesCache = {};  // fs -> aefsAnalysisTables(fs)
let liveFallback = null;       // {at, analysis}
let fileFallback = null;       // {which, w, original, processed}

function tablesFor(fs) {
  if (!analysisTablesCache[fs]) analysisTablesCache[fs] = aefsAnalysisTables(fs);
  return analysisTablesCache[fs];
}

const $ = (id) => document.getElementById(id);

/* ---------------- WebSocket ---------------- */

function wsUrl() {
  const host = window.location.hostname || "localhost";
  return `ws://${host}:${CONFIG.ws_port}`;
}

function connect() {
  socket = new WebSocket(wsUrl());
  socket.onopen = () => $("status-dot").classList.add("connected");
  socket.onclose = () => {
    $("status-dot").classList.remove("connected");
    setTimeout(connect, 3000);
  };
  socket.onmessage = (ev) => {
    const msg = JSON.parse(ev.data);
    if (msg.type === "plot_data") onPlotData(msg);
    else if (msg.type === "file_processed") onFileProcessed(msg);
    else if (msg.type === "stream_audio") onStreamAudio(msg);
    else if (msg.type === "stream_started") onStreamStarted(msg.ok);
    else if (msg.type === "stream_audio_end") onStreamAudioEnd();
    else if (msg.type === "stats") onStats(msg);
    else if (msg.type === "session_saved")
      sessionStatus(msg.ok === false ? `save failed: ${msg.error}`
                                     : `saved → ${msg.path}`);
    else if (msg.type === "session_resumed") {
      if (msg.ok === false) {
        sessionStatus(`resume failed: ${msg.error}`);
      } else {
        chain = msg.config || [];
        renderChain();
        sessionStatus(`resumed ← ${msg.path} (${chain.length} effects)`);
      }
    } else if (msg.type === "ir_set")
      sessionStatus(msg.ok ? `IR set (${msg.ir_seconds} s)`
                           : `IR failed: ${msg.error}`);
    else if (msg.type === "noise_learned")
      sessionStatus(msg.ok ? `noise profile learned (floor ${msg.floor_db} dBFS)`
                           : `noise learn failed: ${msg.error}`);
    else if (msg.type === "devices") renderDevices(msg);
  };
  socket.addEventListener("open", () => {
    send({ command: "list_devices" });
    // Each connection gets a FRESH empty-chain engine server-side; after
    // a reconnect the UI's effect cards would otherwise silently diverge
    // (dry audio, every slider landing on "could not be updated").
    if (chain.length) send({ command: "build_chain", config: chain });
    if (streaming) onStreamAudioEnd();  // old stream died with the socket
  });
}

function renderDevices(msg) {
  // Input/output pickers (reference wishlist todo:2); hidden in server
  // mode (no audio hardware -> empty device list).
  const devs = msg.devices || [];
  $("device-pickers").classList.toggle("hidden", !devs.length);
  if (!devs.length) return;
  const fill = (sel, key, selected) => {
    sel.innerHTML = "<option value=''>default</option>";
    devs.filter((d) => d[key]).forEach((d) => {
      const o = document.createElement("option");
      o.value = d.index; o.textContent = `${d.index}: ${d.name}`;
      sel.appendChild(o);
    });
    if (selected != null) sel.value = String(selected);
  };
  fill($("device-in"), "usable_input", msg.selected && msg.selected[0]);
  fill($("device-out"), "usable_output", msg.selected && msg.selected[1]);
  const apply = () => send({
    command: "set_devices",
    input: $("device-in").value === "" ? null : parseInt($("device-in").value),
    output: $("device-out").value === "" ? null : parseInt($("device-out").value),
  });
  $("device-in").onchange = apply;
  $("device-out").onchange = apply;
}

function sessionStatus(text) {
  $("session-status").textContent = text;
}

setInterval(() => send({ command: "get_stats" }), 2000);

function send(cmd) {
  if (socket && socket.readyState === WebSocket.OPEN) socket.send(JSON.stringify(cmd));
}

/* ---------------- live plots ---------------- */

function pushRing(ring, data) {
  const n = Math.min(data.length, WINDOW_SAMPLES);
  ring.copyWithin(0, n);
  for (let i = 0; i < n; i++) ring[WINDOW_SAMPLES - n + i] = data[data.length - n + i];
}

function onStats(msg) {
  const e = msg.engine || {};
  $("stats").textContent = e.blocks
    ? `${e.blocks} blocks · p50 ${e.p50_ms} ms · p99 ${e.p99_ms} ms · ` +
      `xruns ${e.xruns} · ${e.realtime_factor}x realtime`
    : `idle · fs ${msg.sample_rate}`;
}

function onPlotData(msg) {
  sampleRate = msg.sample_rate || sampleRate;
  pushRing(ringIn, msg.input);
  pushRing(ringOut, msg.output);
  if (msg.analysis) lastAnalysis = msg.analysis;
  renderLive();
}

function liveFallbackAnalysis() {
  // Throttled local recompute (16k-point FFT ~1 ms; the plot pump runs
  // faster than panels need to update).
  const now = Date.now();
  if (liveFallback && now - liveFallback.at < 150) return liveFallback.analysis;
  const a = aefsAnalyzeRings(ringIn, ringOut, tablesFor(sampleRate));
  liveFallback = { at: now, analysis: a };
  return a;
}

function renderLive() {
  drawTime($("plot-time"), ringIn, ringOut);
  const a = lastAnalysis || liveFallbackAnalysis();
  if (a) {
    drawSpectrum($("plot-spectrum"), a.input.spectrum_db,
                 a.output.spectrum_db, a.freqs);
    drawChroma($("plot-chroma"), a.input.chroma, a.output.chroma);
  }
}

/* ---------------- chain CRUD ---------------- */

function uuid() {
  return crypto.randomUUID ? crypto.randomUUID() :
    "xxxx-xxxx".replace(/x/g, () => Math.random().toString(16).slice(2, 6));
}

function sendChain() {
  send({ command: "build_chain", config: chain });
  renderChain();
}

function addEffect(type) {
  if (type === "parallel") {
    // Default two-branch container: filtered path + delayed path.
    chain.push({
      effect_id: uuid(), type,
      params: { gain_0: 0.7, gain_1: 0.7 },
      branches: [
        [{ effect_id: uuid(), type: "filter",
           params: Object.assign({}, CONFIG.effect_defaults.filter) }],
        [{ effect_id: uuid(), type: "delay",
           params: Object.assign({}, CONFIG.effect_defaults.delay) }],
      ],
    });
  } else {
    const params = Object.assign({}, CONFIG.effect_defaults[type]);
    chain.push({ effect_id: uuid(), type, params });
  }
  sendChain();
}

function deleteEffect(id) {
  chain = chain.filter((e) => e.effect_id !== id);
  sendChain();
}

function moveEffect(idx, delta) {
  const j = idx + delta;
  if (j < 0 || j >= chain.length) return;
  [chain[idx], chain[j]] = [chain[j], chain[idx]];
  sendChain();
}

function paramChanged(id, param, value) {
  const fx = chain.find((e) => e.effect_id === id);
  if (!fx) return;
  fx.params[param] = value;
  const staticParams = (CONFIG.static_params || {})[fx.type] || [];
  if (staticParams.includes(param)) {
    // Static topology (e.g. convreverb IR length): rebuild the chain.
    send({ command: "build_chain", config: chain });
  } else {
    send({ command: "update_param", effect_id: id, param, value });
  }
}

function controlRow(label, min, max, step, value, onchange) {
  const row = document.createElement("div");
  row.className = "row";
  const lab = document.createElement("label");
  lab.textContent = label;
  const slider = document.createElement("input");
  slider.type = "range"; slider.min = min; slider.max = max; slider.step = step;
  slider.value = value ?? min;
  const num = document.createElement("input");
  num.type = "number"; num.min = min; num.max = max; num.step = step;
  num.value = value ?? min;
  slider.oninput = () => { num.value = slider.value; onchange(parseFloat(slider.value)); };
  num.onchange = () => { slider.value = num.value; onchange(parseFloat(num.value)); };
  row.append(lab, slider, num);
  return row;
}

function effectControls(card, fx, onParam) {
  (CONFIG.ui_controls[fx.type] || []).forEach(([param, label, min, max, step]) => {
    card.appendChild(controlRow(label, min, max, step, fx.params[param],
      (v) => onParam(param, v)));
  });
  if (fx.type === "convreverb") {
    // User IR upload: WAV -> data URL -> set_ir (server decodes, rebuilds
    // the chain with the custom IR; ir_set response lands in the session
    // status line).
    const row = document.createElement("div");
    row.className = "row";
    const lab = document.createElement("label");
    lab.textContent = "IR WAV";
    const inp = document.createElement("input");
    inp.type = "file"; inp.accept = ".wav,audio/wav";
    inp.onchange = () => {
      const f = inp.files[0];
      if (!f) return;
      const reader = new FileReader();
      reader.onload = () => {
        sessionStatus("uploading IR…");
        send({ command: "set_ir", effect_id: fx.effect_id, contents: reader.result });
      };
      reader.readAsDataURL(f);
    };
    row.append(lab, inp);
    card.appendChild(row);
  }
  if (fx.type === "spectral") {
    // Noise-profile learning: live capture ("be quiet, press learn") or
    // a noise-only WAV upload; noise_learned response lands in the
    // session status line.
    const row = document.createElement("div");
    row.className = "row";
    const btn = document.createElement("button");
    btn.textContent = "Learn noise (2 s)";
    btn.onclick = () => {
      sessionStatus("learning noise profile from live input…");
      send({ command: "learn_noise", effect_id: fx.effect_id, seconds: 2.0 });
    };
    const inp = document.createElement("input");
    inp.type = "file"; inp.accept = ".wav,audio/wav";
    inp.title = "Learn from a noise-only WAV";
    inp.onchange = () => {
      const f = inp.files[0];
      if (!f) return;
      const reader = new FileReader();
      reader.onload = () => {
        sessionStatus("learning noise profile from WAV…");
        send({ command: "learn_noise", effect_id: fx.effect_id, contents: reader.result });
      };
      reader.readAsDataURL(f);
    };
    row.append(btn, inp);
    card.appendChild(row);
  }
}

function renderParallelCard(card, fx) {
  // Branch gains + nested sub-effect controls; nested live params route
  // through the container's lifted names (b<i>_<j>_<name>, PROTOCOL.md).
  (fx.branches || []).forEach((branch, bi) => {
    const gkey = `gain_${bi}`;
    card.appendChild(controlRow(`Branch ${bi} gain`, 0, 2, 0.01,
      fx.params[gkey] ?? 1.0, (v) => paramChanged(fx.effect_id, gkey, v)));
    branch.forEach((sub, ei) => {
      const subCard = document.createElement("div");
      subCard.className = "effect-card branch-card";
      const h = document.createElement("h3");
      h.textContent = `↳ ${sub.type}`;
      subCard.appendChild(h);
      (CONFIG.ui_controls[sub.type] || []).forEach(([param, label, min, max, step]) => {
        subCard.appendChild(controlRow(label, min, max, step, sub.params[param],
          (v) => {
            sub.params[param] = v;
            paramChanged(fx.effect_id, `b${bi}_${ei}_${param}`, v);
          }));
      });
      card.appendChild(subCard);
    });
  });
}

function renderChain() {
  const root = $("chain");
  root.innerHTML = "";
  chain.forEach((fx, idx) => {
    const card = document.createElement("div");
    card.className = "effect-card";
    const title = document.createElement("h3");
    title.textContent = fx.type[0].toUpperCase() + fx.type.slice(1) + " effect";
    card.appendChild(title);

    const mk = (txt, cls, fn, hidden) => {
      const b = document.createElement("button");
      b.textContent = txt; b.className = "card-btn " + (cls || "");
      b.onclick = fn;
      if (hidden) b.style.visibility = "hidden";
      card.appendChild(b);
    };
    mk("↑", "", () => moveEffect(idx, -1), idx === 0);
    mk("↓", "", () => moveEffect(idx, +1), idx === chain.length - 1);
    mk("X", "delete", () => deleteEffect(fx.effect_id));

    if (fx.type === "parallel") {
      renderParallelCard(card, fx);
    } else {
      effectControls(card, fx, (param, v) => paramChanged(fx.effect_id, param, v));
    }
    root.appendChild(card);
  });
}

/* ---------------- presets (localStorage) ---------------- */

function getPresets() {
  const stored = localStorage.getItem("aefs-presets");
  if (stored) return JSON.parse(stored);
  const seed = CONFIG.default_presets;
  localStorage.setItem("aefs-presets", JSON.stringify(seed));
  return seed;
}

function setPresets(p) {
  localStorage.setItem("aefs-presets", JSON.stringify(p));
  renderPresets();
}

function renderPresets() {
  const sel = $("preset-select");
  sel.innerHTML = "";
  Object.keys(getPresets()).forEach((name) => {
    const o = document.createElement("option");
    o.value = o.textContent = name;
    sel.appendChild(o);
  });
}

function freshIds(fx) {
  // Deep-copy an effect config with regenerated ids — recursing into a
  // parallel container's branches so their sub-effects get fresh ids too.
  const copy = JSON.parse(JSON.stringify(fx));
  copy.effect_id = uuid();
  if (copy.branches) copy.branches = copy.branches.map((b) => b.map(freshIds));
  return copy;
}

function loadPreset(name) {
  const p = getPresets()[name];
  if (!p) return;
  // Regenerate ids so live updates route to the fresh instances (app.py:644-647).
  chain = p.map(freshIds);
  sendChain();
}

/* ---------------- file mode ---------------- */

/* Live file streaming (stream_file command): the backend plays the
 * uploaded file through the LIVE path — param changes apply audibly in
 * real time — and ships processed stereo blocks here for Web Audio
 * playback. Blocks are scheduled on a running time cursor with a small
 * lead so network jitter doesn't underrun. */
let streamCtx = null;      // lazy AudioContext (user-gesture constraint)
let streamT = 0;           // next-buffer start time in ctx clock
let streaming = false;

function onStreamAudio(msg) {
  if (!streaming) return;
  if (!streamCtx) streamCtx = new (window.AudioContext || window.webkitAudioContext)();
  const n = msg.left.length;
  const buf = streamCtx.createBuffer(2, n, msg.sample_rate);
  buf.getChannelData(0).set(msg.left);
  buf.getChannelData(1).set(msg.right);
  const src = streamCtx.createBufferSource();
  src.buffer = buf;
  src.connect(streamCtx.destination);
  const at = Math.max(streamCtx.currentTime + 0.08, streamT);
  src.start(at);
  streamT = at + n / msg.sample_rate;
}

function onStreamStarted(ok) {
  // The UI flips into streaming state only on the backend's confirm —
  // an optimistic flip on click had no way back when the engine refused
  // (e.g. nothing uploaded on a fresh post-reconnect engine): no
  // stream_audio_end ever arrives for a stream that never started.
  if (!ok) {
    sessionStatus("stream refused (no file uploaded or already running)");
    return;
  }
  streaming = true;
  streamT = 0;
  $("stream-file").classList.add("hidden");
  $("stop-file-stream").classList.remove("hidden");
}

function onStreamAudioEnd() {
  streaming = false;
  $("stream-file").classList.remove("hidden");
  $("stop-file-stream").classList.add("hidden");
}

function onFileProcessed(msg) {
  $("busy-spinner").classList.add("hidden");
  $("players").classList.remove("hidden");
  $("reprocess-file").classList.remove("hidden");
  $("stream-file").classList.remove("hidden");
  const dl = $("download-processed");
  dl.classList.remove("hidden");
  dl.href = msg.processed_b64;
  fileData = {
    original: msg.original_samples,
    processed: msg.processed_samples,
    fs: msg.sample_rate,
    analysis: msg.analysis || null,
  };
  // New render: drop the fallback-analysis cache — it is keyed only on
  // (window, length), so a re-process of the same file would otherwise
  // keep showing the PREVIOUS render's spectrum/chroma.
  fileFallback = null;
  $("audio-original").src = msg.original_b64;
  $("audio-processed").src = msg.processed_b64;
  drawFileWindow(0);
}

function drawFileWindow(tSec) {
  if (!fileData) return;
  const fs = fileData.fs, half = Math.floor(WINDOW_SAMPLES / 2);
  const c = Math.floor(tSec * fs);
  const lo = Math.max(0, c - half), hi = Math.min(fileData.original.length, c + half);
  drawTime($("plot-time"), fileData.original.slice(lo, hi), fileData.processed.slice(lo, hi));
  // Spectrum + chroma scrub with the playhead (reference
  // 02_custom.js:282-355): pick the server-computed analysis window for t,
  // or recompute the trailing window locally when the server shipped none.
  const a = fileData.analysis;
  if (a && a.original && a.original.spectrum_db.length) {
    const w = Math.max(0, Math.min(a.original.spectrum_db.length - 1,
      Math.floor(tSec / a.hop_s)));
    drawSpectrum($("plot-spectrum"), a.original.spectrum_db[w],
                 a.processed.spectrum_db[w], a.freqs);
    drawChroma($("plot-chroma"), a.original.chroma[w], a.processed.chroma[w]);
  } else {
    const f = fileFallbackAnalysis(tSec);
    drawSpectrum($("plot-spectrum"), f.original.spectrum_db,
                 f.processed.spectrum_db, f.freqs);
    drawChroma($("plot-chroma"), f.original.chroma, f.processed.chroma);
  }
}

function fileFallbackAnalysis(tSec) {
  // Same trailing-window semantics as PlotAnalyzer.analyze_file (window w
  // analyzes the AEFS_FFT_SIZE samples ending at (w+1)*hop), recomputed
  // client-side from the sample lists already in the payload.  Cached per
  // window index — playbackLoop calls every animation frame.
  const fs = fileData.fs, hop = 0.25;
  const w = Math.max(0, Math.floor(tSec / hop));
  if (fileFallback && fileFallback.w === w && fileFallback.n === fileData.original.length)
    return fileFallback;
  const tables = tablesFor(fs);
  const end = Math.max(1, Math.min(fileData.original.length,
    Math.floor((w + 1) * hop * fs)));
  const lo = Math.max(0, end - AEFS_FFT_SIZE);
  fileFallback = {
    w: w, n: fileData.original.length, freqs: tables.freqs,
    original: aefsAnalyzeTail(fileData.original.slice(lo, end), tables),
    processed: aefsAnalyzeTail(fileData.processed.slice(lo, end), tables),
  };
  return fileFallback;
}

function activePlayer() {
  return $("player-select").value === "original" ? $("audio-original") : $("audio-processed");
}

function playbackLoop() {
  const p = activePlayer();
  if (fileData && p && !p.paused) drawFileWindow(p.currentTime + 0.12);
  requestAnimationFrame(playbackLoop);
}

/* ---------------- wiring ---------------- */

async function init() {
  CONFIG = await (await fetch("/config.json")).json();

  const typeSel = $("effect-type");
  Object.keys(CONFIG.effect_defaults).concat(["parallel"]).forEach((t) => {
    const o = document.createElement("option");
    o.value = t; o.textContent = t;
    typeSel.appendChild(o);
  });

  $("add-effect").onclick = () => addEffect(typeSel.value);
  $("start-mic").onclick = () => send({ command: "start_mic" });
  $("stop-mic").onclick = () => send({ command: "stop" });
  $("save-session").onclick = () => {
    sessionStatus("saving…");
    send({ command: "save_session" });
  };
  $("resume-session").onclick = () => {
    sessionStatus("resuming…");
    send({ command: "resume_session" });
  };
  attachSpectrumInteractions($("plot-spectrum"));
  attachTimeInteractions($("plot-time"));
  attachChromaInteractions($("plot-chroma"));
  $("smooth-spectrum").onchange = () => {
    specSmooth.on = $("smooth-spectrum").checked;
  };
  $("reprocess-file").onclick = () => {
    $("busy-spinner").classList.remove("hidden");
    send({ command: "reprocess_file" });
  };
  $("stream-file").onclick = () => {
    if (streamCtx) streamCtx.resume();
    send({ command: "stream_file" });  // UI flips on stream_started
  };
  $("stop-file-stream").onclick = () => {
    send({ command: "stop" });
    onStreamAudioEnd();
  };
  $("load-preset").onclick = () => loadPreset($("preset-select").value);
  $("delete-preset").onclick = () => {
    const p = getPresets(); delete p[$("preset-select").value]; setPresets(p);
  };
  $("save-preset").onclick = () => {
    const name = $("preset-name").value.trim();
    if (!name) return;
    const p = getPresets();
    p[name] = JSON.parse(JSON.stringify(chain));
    setPresets(p);
    $("preset-name").value = "";
  };

  document.querySelectorAll('input[name="mode"]').forEach((r) => {
    r.onchange = () => {
      const file = document.querySelector('input[name="mode"]:checked').value === "file";
      $("file-controls").classList.toggle("hidden", !file);
      $("mic-controls").classList.toggle("hidden", file);
      if (file) send({ command: "stop" });
    };
  });

  $("file-input").onchange = () => {
    const f = $("file-input").files[0];
    if (!f) return;
    const reader = new FileReader();
    reader.onload = () => {
      $("busy-spinner").classList.remove("hidden");
      send({ command: "process_file", contents: reader.result });
    };
    reader.readAsDataURL(f);
  };

  $("player-select").onchange = () => {
    const orig = $("player-select").value === "original";
    const a = $("audio-original"), b = $("audio-processed");
    const from = orig ? b : a, to = orig ? a : b;
    to.currentTime = from.currentTime;
    const wasPlaying = !from.paused;
    from.pause();
    a.classList.toggle("hidden", !orig);
    b.classList.toggle("hidden", orig);
    if (wasPlaying) to.play();
  };

  // Seeking while paused must scrub all three plots too.
  ["audio-original", "audio-processed"].forEach((id) => {
    $(id).addEventListener("seeked", () => drawFileWindow($(id).currentTime));
  });

  renderPresets();
  renderChain();
  connect();
  playbackLoop();
}

window.addEventListener("load", init);
