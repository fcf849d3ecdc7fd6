/* phantomsdr-tpu built-in frontend.

   Wire protocol (same as the reference's svelte frontend consumes,
   reference src/websocket.cpp / client.cpp):
     /audio      basic_info JSON, then CBOR {data, frame_num, l, m,
                 pwr, r} packets carrying a FLAC stream; JSON commands
                 window/demodulation/mute (+ server extensions
                 nr/rds/am_sync); {"type":"rds"} text frames.
     /waterfall  basic_info JSON, then compressed CBOR rows decoded by
                 the built-in RFC 8878 decoder (zstd.js) -- the STOCK
                 zstd stream, same as the reference's browsers
                 (jsdsp/src/libzstd.js); no protocol extension needed.
                 (The server's deflate extension remains available to
                 other clients.)
     /events     cluster state JSON (listener count in the footer). */
"use strict";

const $ = (id) => document.getElementById(id);
const statusEl = $("status");

let info = null;          // basic_info from the server
let mode = "USB";         // UI mode (WBFM = wide FM window)
let mBin = 0;             // tuned center, full-resolution bins
let viewL = 0, viewR = 0; // waterfall view window, full-res bins
let audioWs = null, wfWs = null;
let actx = null, gain = null, playCursor = 0;
let flac = null, flacOk = true;
let audioAlive = false;  // /audio ws connected + handshake seen
let opusDec = null, opusTs = 0;  // WebCodecs AudioDecoder (opus mode)
let muted = false;
const others = new Map(); // uid -> mid bin of other listeners (/events)
let stations = [];        // shortwavestations.json rows {f,d,m}, by f

// ------------------------------------------------------------ helpers

function wsUrl(path) {
  const proto = location.protocol === "https:" ? "wss:" : "ws:";
  return `${proto}//${location.host}${path}`;
}

function offBins(hz) {
  // bins span total_bandwidth (= sps for IQ, sps/2 for real input),
  // matching binToHz/drawScale below.
  return Math.floor(hz * info.fft_result_size / info.total_bandwidth);
}

function windowFor(m, md) {
  const R = info.fft_result_size;
  const mi = Math.floor(m);
  let l, r;
  if (md === "USB") { l = mi; r = mi + offBins(3000); }
  else if (md === "LSB") { l = mi - offBins(3000); r = mi; }
  else if (md === "WBFM") { l = mi - offBins(96000); r = mi + offBins(96000); }
  else { l = mi - offBins(5000); r = mi + offBins(5000); } // AM / FM
  // the server rejects l >= R or r >= R (registry.retune, matching
  // src/signal.cpp:305-308) -- clamp INCLUSIVE of R-1, not R, or
  // tuning near the top band edge is silently ignored
  l = Math.max(0, Math.min(R - 1, l));
  r = Math.max(0, Math.min(R - 1, r));
  const a = info.audio_max_fft;   // audio slice capacity (basic_info)
  if (r - l > a) {
    // clamp toward the tuned bin so the side carrying the signal
    // survives: LSB's passband is entirely left of m, USB's right;
    // symmetric modes shrink around m.
    if (md === "LSB") l = r - a;
    else if (md === "USB") r = l + a;
    else { l = Math.max(0, Math.min(R - 1 - a, mi - Math.floor(a / 2))); r = l + a; }
  }
  return { l, m, r };
}

function binToHz(bin) {
  return info.basefreq
    + bin * (info.total_bandwidth / info.fft_result_size);
}

function hzToBin(hz) {
  return (hz - info.basefreq) * info.fft_result_size
    / info.total_bandwidth;
}

// stations within the current view, with label election: a label is
// drawn only if it sits >= minPx from the previously elected one
// (ticks always draw).  Mirrored by tests/test_frontend.py.
function stationsInView(minPx, widthPx) {
  const out = [];
  if (!info || viewR <= viewL) return out;
  const sx = widthPx / (viewR - viewL);
  let lastX = -1e9;
  for (const s of stations) {
    const b = hzToBin(s.f);
    if (b < viewL || b > viewR) continue;
    const x = (b - viewL) * sx;
    const labeled = x - lastX >= minPx;
    if (labeled) lastX = x;
    out.push({ x, labeled, name: String(s.d).split("\n")[0].slice(0, 18) });
  }
  return out;
}

function updateReadout() {
  $("freq-mhz").textContent = (binToHz(mBin) / 1e6).toFixed(4);
  drawPassband();
}

function sendTune() {
  if (!audioWs || audioWs.readyState !== 1) return;
  const w = windowFor(mBin, mode);
  audioWs.send(JSON.stringify({ cmd: "window", l: w.l, m: w.m, r: w.r }));
  const demod = mode === "WBFM" ? "FM" : mode;
  audioWs.send(JSON.stringify({ cmd: "demodulation", demodulation: demod }));
  $("amsync-wrap").hidden = !(info.am_sync && mode === "AM");
  updateReadout();
}

// --------------------------------------------------------------- audio

function startAudioCtx() {
  if (actx || !info) return;  // handshake not in yet: ignore the click
  const rate = info.audio_max_sps;
  try { actx = new AudioContext({ sampleRate: rate }); }
  catch (e) { actx = new AudioContext(); }
  gain = actx.createGain();
  gain.gain.value = $("vol").value / 100;
  gain.connect(actx.destination);
  actx.resume();
  $("power").setAttribute("aria-pressed", "true");
}

function resample(f32, from, to) {
  if (from === to) return f32;
  const n = Math.floor(f32.length * to / from);
  const out = new Float32Array(n);
  for (let i = 0; i < n; i++) {
    const x = i * from / to, i0 = Math.floor(x), fr = x - i0;
    const a = f32[Math.min(i0, f32.length - 1)];
    const b = f32[Math.min(i0 + 1, f32.length - 1)];
    out[i] = a + (b - a) * fr;
  }
  return out;
}

function scheduleBuf(buf) {
  const src = actx.createBufferSource();
  src.buffer = buf;
  src.connect(gain);
  const now = actx.currentTime;
  if (playCursor < now + 0.04) playCursor = now + 0.12;  // resync
  src.start(playCursor);
  playCursor += buf.duration;
}

function enqueuePcm(int32, channels) {
  if (!actx) return;
  const n = int32.length / channels;
  if (!n) return;
  const chans = [];
  for (let c = 0; c < channels; c++) {
    let f = new Float32Array(n);
    for (let i = 0; i < n; i++) f[i] = int32[i * channels + c] / 32768;
    f = resample(f, info.audio_max_sps, actx.sampleRate);
    chans.push(f);
  }
  const buf = actx.createBuffer(channels, chans[0].length, actx.sampleRate);
  for (let c = 0; c < channels; c++) buf.copyToChannel(chans[c], c);
  scheduleBuf(buf);
}

function enqueueAudioData(ad) {
  // a decoded WebCodecs AudioData (opus mode): planar f32 per channel
  if (!actx) { ad.close(); return; }
  const n = ad.numberOfFrames, ch = ad.numberOfChannels;
  if (!n) { ad.close(); return; }
  const chans = [];
  for (let c = 0; c < ch; c++) {
    let f = new Float32Array(n);
    ad.copyTo(f, { planeIndex: c, format: "f32-planar" });
    f = resample(f, ad.sampleRate, actx.sampleRate);
    chans.push(f);
  }
  ad.close();
  const buf = actx.createBuffer(ch, chans[0].length, actx.sampleRate);
  for (let c = 0; c < ch; c++) buf.copyToChannel(chans[c], c);
  scheduleBuf(buf);
}

function updateSmeter(pwr) {
  const db = 10 * Math.log10(pwr + 1e-12);
  $("smeter-db").textContent = db.toFixed(1) + " dB";
  const pct = Math.max(0, Math.min(100, (db + 60) * (100 / 90)));
  $("smeter-fill").style.width = pct + "%";
}

function connectAudio() {
  audioWs = new WebSocket(wsUrl("/audio"));
  audioWs.binaryType = "arraybuffer";
  let gotInfo = false;
  audioWs.onmessage = (ev) => {
    if (typeof ev.data === "string") {
      const d = JSON.parse(ev.data);
      if (!gotInfo) {
        gotInfo = true;
        onInfo(d);
      } else if (d.type === "rds") {
        $("rds-panel").hidden = false;
        $("rds-pi").textContent = d.pi ? "PI " + d.pi : "";
        $("rds-ps").textContent = d.ps || "";
        $("rds-rt").textContent = d.rt || "";
      }
      return;
    }
    const pkt = cborDecode(ev.data);
    if (typeof pkt.pwr === "number") updateSmeter(pkt.pwr);
    if (!pkt.data || !pkt.data.length) return;  // muted keep-alive
    if (flacOk) {
      try {
        for (const pcm of flac.push(pkt.data))
          enqueuePcm(pcm, flac.channels);
      } catch (e) {
        // FLAC is stateful -- after a hard decode error (lost sync,
        // reserved subframe) the buffered bytes would rethrow forever.
        // Stop decoding with a visible cause; S-meter/tuning stay live.
        flacOk = false;
        statusEl.textContent =
          "audio decode error: " + ((e && e.message) || e) +
          " — reload to resume";
      }
    } else if (opusDec && opusDec.state === "configured") {
      // one raw opus packet per CBOR data field (20 ms frames);
      // every opus packet is independently decodable -> type "key"
      opusDec.decode(new EncodedAudioChunk(
        { type: "key", timestamp: opusTs, data: pkt.data }));
      opusTs += 20000;  // µs
    }
  };
  audioWs.onclose = () => {
    audioAlive = false;  // gates the /events status overwrite
    statusEl.textContent = "audio disconnected";
  };
}

function onInfo(d) {
  info = d;
  flac = new FlacStream();
  flacOk = d.audio_compression === "flac";
  opusDec = null;
  opusTs = 0;
  if (!flacOk && d.audio_compression === "opus"
      && typeof AudioDecoder === "function") {
    opusDec = new AudioDecoder({
      output: (ad) => enqueueAudioData(ad),
      error: (e) => {
        statusEl.textContent = "opus decode error: " + e.message;
        opusDec = null;
      },
    });
    // raw opus packets, no description: 48 kHz output per WebCodecs
    opusDec.configure({ codec: "opus", sampleRate: 48000,
                        numberOfChannels: d.audio_channels || 1 });
  }
  if (!flacOk && !opusDec)
    statusEl.textContent =
      `audio is ${d.audio_compression}; no built-in decoder for it ` +
      "in this browser (S-meter/tuning still live)";
  viewL = 0;
  viewR = d.fft_result_size;
  mBin = d.defaults.m !== undefined ? d.defaults.m  // 0 is a valid bin
    : d.fft_result_size / 2;
  // only modes this UI implements; an unknown server default (e.g. a
  // future config string) must not NaN the tune-step table
  mode = TUNE_STEP_HZ[d.defaults.modulation] !== undefined
    ? d.defaults.modulation : "USB";
  document.querySelectorAll("#modes button").forEach((b) =>
    b.setAttribute("aria-pressed", String(b.dataset.mode === mode)));
  $("nr-wrap").hidden = !d.nr_available;
  $("rds-wrap").hidden = !d.rds_available;
  audioAlive = true;
  if (flacOk || opusDec) statusEl.textContent = "connected";
  $("info-line").textContent =
    `${(d.sps / 1e6).toFixed(2)} MSPS · fft ${d.fft_size} · ` +
    `audio ${d.audio_max_sps} Hz ${d.audio_channels === 2 ? "stereo" : "mono"}` +
    ` (${d.audio_compression})` +
    (d.deemphasis ? ` · de-emphasis ${d.deemphasis} µs` : "");
  drawScale();
  sendTune();
  connectWaterfall();
  connectEvents();
}

// ----------------------------------------------------------- waterfall

// viridis: perceptually uniform, monotonic lightness (the sequential-
// ramp rule for magnitude data); anchors interpolated to a 256 LUT
const VIRIDIS = [
  [68, 1, 84], [71, 44, 122], [59, 81, 139], [44, 113, 142],
  [33, 144, 141], [39, 173, 129], [92, 200, 99], [170, 220, 50],
  [253, 231, 37],
];
const LUT = (() => {
  const lut = new Uint8Array(256 * 3);
  for (let i = 0; i < 256; i++) {
    const x = i / 255 * (VIRIDIS.length - 1);
    const i0 = Math.min(Math.floor(x), VIRIDIS.length - 2), fr = x - i0;
    for (let c = 0; c < 3; c++)
      lut[i * 3 + c] = Math.round(
        VIRIDIS[i0][c] + (VIRIDIS[i0 + 1][c] - VIRIDIS[i0][c]) * fr);
  }
  return lut;
})();

let wfCanvas, wfCtx, specCtx, rowLen = 0;
let vMin = -100, vMax = 40;   // int8-dB autoscale, decaying

function setupCanvases(len) {
  rowLen = len;
  wfCanvas = $("waterfall");
  wfCanvas.width = len;
  wfCanvas.height = 260;
  wfCtx = wfCanvas.getContext("2d", { willReadFrequently: false });
  wfCtx.fillStyle = "#1b1e23";
  wfCtx.fillRect(0, 0, len, wfCanvas.height);
  const sc = $("spectrum");
  sc.width = len;
  specCtx = sc.getContext("2d");
  const pb = $("passband");
  pb.width = len;
  drawPassband();
}

function drawRow(row) {
  if (rowLen !== row.length) setupCanvases(row.length);
  // autoscale: follow the row's 5th/99th-ish extremes with decay
  let lo = 127, hi = -128;
  for (let i = 0; i < row.length; i++) {
    const v = row[i];
    if (v < lo) lo = v;
    if (v > hi) hi = v;
  }
  vMin += (lo - vMin) * 0.05;
  vMax += (hi - vMax) * 0.05;
  const span = Math.max(10, vMax - vMin);

  wfCtx.drawImage(wfCanvas, 0, 0, rowLen, wfCanvas.height - 1,
                  0, 1, rowLen, wfCanvas.height - 1);
  const img = wfCtx.createImageData(rowLen, 1);
  for (let i = 0; i < rowLen; i++) {
    let t = (row[i] - vMin) / span;
    t = Math.max(0, Math.min(1, t));
    const j = Math.round(t * 255) * 3;
    img.data[i * 4] = LUT[j];
    img.data[i * 4 + 1] = LUT[j + 1];
    img.data[i * 4 + 2] = LUT[j + 2];
    img.data[i * 4 + 3] = 255;
  }
  wfCtx.putImageData(img, 0, 0);

  // spectrum line over the latest row
  const sc = specCtx, H = $("spectrum").height;
  sc.fillStyle = "#1b1e23";
  sc.fillRect(0, 0, rowLen, H);
  sc.strokeStyle = "#7cacf8";
  sc.lineWidth = 1;
  sc.beginPath();
  for (let i = 0; i < rowLen; i++) {
    let t = (row[i] - vMin) / span;
    t = Math.max(0, Math.min(1, t));
    const y = H - 4 - t * (H - 10);
    if (i === 0) sc.moveTo(i, y); else sc.lineTo(i, y);
  }
  sc.stroke();
}

function drawPassband() {
  if (!info || !rowLen) return;
  const pb = $("passband"), c = pb.getContext("2d");
  c.fillStyle = "#1b1e23";
  c.fillRect(0, 0, pb.width, pb.height);
  const span = viewR - viewL;
  const sx = rowLen / span;
  // other listeners (otherusers/events): muted ticks, identity is
  // position only -- no per-user colors
  c.fillStyle = "rgba(154,162,173,0.6)";
  for (const mid of others.values()) {
    if (mid >= viewL && mid <= viewR)
      c.fillRect((mid - viewL) * sx - 1, pb.height - 8, 2, 8);
  }
  const w = windowFor(mBin, mode);
  c.fillStyle = "rgba(124,172,248,0.25)";
  c.fillRect((w.l - viewL) * sx, 0,
             Math.max(1, (w.r - w.l) * sx), pb.height);
  c.fillStyle = "#7cacf8";
  c.fillRect((mBin - viewL) * sx - 1, 0, 2, pb.height);
  // station labels (shortwavestations.json, when present): ticks for
  // every station in view, names where they fit
  const sv = stationsInView(70, rowLen);
  c.font = "10px system-ui, sans-serif";
  for (const s of sv) {
    c.fillStyle = "rgba(236,200,120,0.8)";
    c.fillRect(s.x, 0, 1, 6);
    if (s.labeled) c.fillText(s.name, s.x + 3, 10);
  }
}

function loadStations() {
  fetch("shortwavestations.json")
    .then((r) => (r.ok ? r.json() : []))
    .then((rows) => {
      if (Array.isArray(rows)) {
        stations = rows;
        drawPassband();
      }
    })
    .catch(() => {});  // absent DB: no labels (air-gapped default)
}

function setView(l, r) {
  const R = info.fft_result_size;
  const minSpan = Math.min(256, R);
  l = Math.max(0, Math.floor(l));
  r = Math.min(R, Math.ceil(r));
  if (r - l < minSpan) {
    const mid = (l + r) / 2;
    l = Math.max(0, Math.floor(mid - minSpan / 2));
    r = Math.min(R, l + minSpan);
  }
  viewL = l; viewR = r;
  if (wfWs && wfWs.readyState === 1)
    wfWs.send(JSON.stringify({ cmd: "window", l: viewL, r: viewR }));
  if (wfCtx) {            // history is spatially stale after a re-view
    wfCtx.fillStyle = "#1b1e23";
    wfCtx.fillRect(0, 0, rowLen, wfCanvas.height);
  }
  drawScale();
  drawPassband();
}

let av1Feed = null;  // set by startAv1Waterfall (av1.js + WebCodecs)

function startAv1Waterfall() {
  let rowL = null, rowR = null;  // same stale-view guard as drainCbor
  av1Feed = av1MakeFeed(
    (row, h) => {
      if (h && (h.l !== rowL || h.r !== rowR)) {
        rowL = h.l; rowR = h.r;
        if (wfCtx) {
          wfCtx.fillStyle = "#1b1e23";
          wfCtx.fillRect(0, 0, rowLen, wfCanvas.height);
        }
      }
      drawRow(row);
    },
    (e) => {
      av1Feed = null;  // decoder is closed; stop feeding it
      statusEl.textContent =
        "av1 decode error: " + ((e && e.message) || e) +
        " — reload to resume";
    });
  if (!av1Feed)
    statusEl.textContent =
      "av1 waterfall needs WebCodecs; unavailable in this browser";
}

function connectWaterfall() {
  wfWs = new WebSocket(wsUrl("/waterfall"));
  wfWs.binaryType = "arraybuffer";
  let zstd = null;              // zstd.js ZstdStream (stock protocol)
  let acc = new Uint8Array(0);  // CBOR packet reassembly

  let rowL = null, rowR = null;  // real coords of the last-drawn row

  function drainCbor(dec) {
    const merged = new Uint8Array(acc.length + dec.length);
    merged.set(acc); merged.set(dec, acc.length);
    acc = merged;
    for (;;) {
      const r = cborTryDecode(acc);
      if (!r) break;
      acc = acc.slice(r.used);
      // each packet carries its slice's REAL coordinates (l<<level);
      // when they change (server re-viewed after a zoom/pan) clear the
      // history so in-flight rows for the old view are never mixed
      // into the new view's canvas at the wrong scale
      if (r.value.l !== rowL || r.value.r !== rowR) {
        rowL = r.value.l; rowR = r.value.r;
        if (wfCtx) {
          wfCtx.fillStyle = "#1b1e23";
          wfCtx.fillRect(0, 0, rowLen, wfCanvas.height);
        }
      }
      drawRow(new Int8Array(r.value.data.buffer,
                            r.value.data.byteOffset,
                            r.value.data.length));
    }
  }

  wfWs.onmessage = (ev) => {
    if (typeof ev.data === "string") {
      const d = JSON.parse(ev.data);
      if (d.sps) {           // its own basic_info handshake
        if (d.waterfall_compression === "zstd") {
          zstd = new ZstdStream();
        } else if (d.waterfall_compression === "av1") {
          startAv1Waterfall();
        } else {
          statusEl.textContent =
            `waterfall is ${d.waterfall_compression}; no built-in decoder`;
        }
        // current view (full band on connect); the server picks the
        // pyramid level for the span
        wfWs.send(JSON.stringify(
          { cmd: "window", l: viewL, r: viewR || d.fft_result_size }));
      }
      return;
    }
    if (zstd) {
      try {
        const dec = zstd.push(new Uint8Array(ev.data));
        if (dec.length) drainCbor(dec);
      } catch (e) {
        // a corrupt stateful stream cannot be resynced mid-flight:
        // stop decoding with a visible cause instead of rethrowing
        // the same buffered error on every subsequent packet
        zstd = null;
        statusEl.textContent =
          "waterfall decode error: " + ((e && e.message) || e) +
          " — reload to resume";
      }
    } else if (av1Feed) {
      try {
        av1Feed(new Uint8Array(ev.data));
      } catch (e) {  // corrupt TU (parse throw): contain like zstd
        av1Feed = null;
        statusEl.textContent =
          "av1 decode error: " + ((e && e.message) || e) +
          " — reload to resume";
      }
    }
  };
}

function connectEvents() {
  const ws = new WebSocket(wsUrl("/events"));
  ws.onmessage = (ev) => {
    try {
      const d = JSON.parse(ev.data);
      // audioAlive: a dead audio connection's "audio disconnected"
      // status must not be overwritten by the 1 Hz listener count
      if (typeof d.signal_clients === "number" && audioAlive
          && (flacOk || opusDec))
        statusEl.textContent =
          `connected · ${d.signal_clients} listener` +
          (d.signal_clients === 1 ? "" : "s");
      if (d.signal_changes) {
        for (const [uid, lmr] of Object.entries(d.signal_changes)) {
          if (lmr[1] < 0) others.delete(uid);
          else others.set(uid, lmr[1]);
        }
        drawPassband();
      }
    } catch (e) { /* malformed frame: ignore */ }
  };
}

// ------------------------------------------------------------------ UI

function bindUI() {
  document.querySelectorAll("#modes button").forEach((b) => {
    b.addEventListener("click", () => {
      mode = b.dataset.mode;
      document.querySelectorAll("#modes button").forEach((x) =>
        x.setAttribute("aria-pressed", String(x === b)));
      sendTune();
    });
  });

  const binAt = (el, ev) => {
    const rect = el.getBoundingClientRect();
    const x = (ev.clientX - rect.left) / rect.width;
    return viewL + x * (viewR - viewL);
  };
  let dragFrom = null, dragged = false;
  ["waterfall", "passband", "spectrum"].forEach((id) => {
    const el = $(id);
    el.addEventListener("mousedown", (ev) => {
      dragFrom = { x: ev.clientX, l: viewL, r: viewR };
      dragged = false;
    });
    el.addEventListener("mousemove", (ev) => {
      if (!dragFrom || !info) return;
      const rect = el.getBoundingClientRect();
      const dBins = (ev.clientX - dragFrom.x) / rect.width
        * (dragFrom.r - dragFrom.l);
      if (Math.abs(ev.clientX - dragFrom.x) > 3) dragged = true;
      if (dragged) {
        let l = dragFrom.l - dBins, r = dragFrom.r - dBins;
        const R = info.fft_result_size;
        if (l < 0) { r -= l; l = 0; }
        if (r > R) { l -= r - R; r = R; }
        setView(l, r);
      }
    });
    el.addEventListener("mouseup", (ev) => {
      if (!dragFrom) return;
      if (!dragged && info) {
        mBin = Math.max(0, Math.min(info.fft_result_size, binAt(el, ev)));
        sendTune();
      }
      dragFrom = null;
    });
    el.addEventListener("mouseleave", () => { dragFrom = null; });
    el.addEventListener("wheel", (ev) => {
      if (!info) return;
      ev.preventDefault();
      const center = binAt(el, ev);
      const f = ev.deltaY > 0 ? 1.25 : 0.8;   // out / in
      const span = (viewR - viewL) * f;
      const frac = (center - viewL) / (viewR - viewL);
      setView(center - span * frac, center + span * (1 - frac));
    }, { passive: false });
  });

  $("power").addEventListener("click", () => startAudioCtx());
  $("mute").addEventListener("click", () => {
    muted = !muted;
    $("mute").setAttribute("aria-pressed", String(muted));
    if (audioWs && audioWs.readyState === 1)
      audioWs.send(JSON.stringify({ cmd: "mute", mute: muted }));
  });
  $("vol").addEventListener("input", () => {
    if (gain) gain.gain.value = $("vol").value / 100;
  });
  const sendCmd = (obj) => {
    if (audioWs && audioWs.readyState === 1)
      audioWs.send(JSON.stringify(obj));
  };
  $("nr").addEventListener("change", () =>
    sendCmd({ cmd: "nr", enabled: $("nr").checked }));
  $("rds").addEventListener("change", () => {
    sendCmd({ cmd: "rds", enabled: $("rds").checked });
    if (!$("rds").checked) $("rds-panel").hidden = true;
  });
  $("amsync").addEventListener("change", () =>
    sendCmd({ cmd: "am_sync", enabled: $("amsync").checked }));

  window.addEventListener("keydown", onKeyTune);
}

// ------------------------------------------------------ keyboard tuning

// Hz per arrow-key press, by mode (x10 with Shift).  Mirrored by
// tests/test_frontend.py.
const TUNE_STEP_HZ = { USB: 100, LSB: 100, AM: 1000, FM: 2500,
                       WBFM: 100000 };

function tuneStepBins(md, shift) {
  return Math.max(1, offBins(TUNE_STEP_HZ[md] * (shift ? 10 : 1)));
}

function ensureInView() {
  if (mBin >= viewL && mBin <= viewR) return;
  const span = viewR - viewL;
  setView(mBin - span / 2, mBin + span / 2);
}

// next (dir=+1) / previous (dir=-1) station bin after mBin, or null
function nextStationBin(dir) {
  let best = null;
  for (const s of stations) {
    const b = hzToBin(s.f);
    if (b < 0 || b > info.fft_result_size) continue;
    if (dir > 0 ? b > mBin + 1 : b < mBin - 1) {
      if (best === null || (dir > 0 ? b < best : b > best)) best = b;
    }
  }
  return best;
}

function onKeyTune(ev) {
  if (!info) return;
  const t = ev.target;
  if (t && (t.tagName === "INPUT" || t.tagName === "TEXTAREA")) return;
  const R = info.fft_result_size;
  if (ev.key === "ArrowLeft" || ev.key === "ArrowRight") {
    const d = (ev.key === "ArrowRight" ? 1 : -1)
      * tuneStepBins(mode, ev.shiftKey);
    mBin = Math.max(0, Math.min(R, mBin + d));
    sendTune();
    ensureInView();
    drawPassband();
  } else if (ev.key === "PageDown" || ev.key === "PageUp"
             || "[]".indexOf(ev.key) >= 0) {
    const dir = (ev.key === "PageDown" || "[]".indexOf(ev.key) === 1)
      ? 1 : -1;
    const b = nextStationBin(dir);
    if (b !== null) {
      mBin = b;
      sendTune();
      ensureInView();
      drawPassband();
    }
  } else if (ev.key === "+" || ev.key === "=" || ev.key === "-") {
    const f = ev.key === "-" ? 1.6 : 0.625;
    const span = (viewR - viewL) * f;
    setView(mBin - span / 2, mBin + span / 2);
  } else {
    return;
  }
  ev.preventDefault();
}

function drawScale() {
  const el = $("freq-scale");
  el.innerHTML = "";
  const spanHz = (viewR - viewL) * info.total_bandwidth
    / info.fft_result_size;
  const digits = spanHz > 2e6 ? 2 : spanHz > 2e5 ? 3 : 4;
  for (let i = 0; i <= 8; i++) {
    const s = document.createElement("span");
    s.textContent =
      (binToHz(viewL + i / 8 * (viewR - viewL)) / 1e6).toFixed(digits);
    el.appendChild(s);
  }
}

bindUI();
loadStations();
connectAudio();
