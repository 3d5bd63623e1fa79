// Main viewer app: track rows, zoom/pan state, controls, playback.
// State model follows the reference MainViewer (startSec, pxPerSec per-view;
// cursor-anchored zoom; follow-playhead) — src/prototypes/MainViewer/.

import { api, jsonNumber } from "./api.js";
import { TrackViewport } from "./viewport.js";
import { updateAmpAxis, updateFreqAxis, updateTimeAxis } from "./axes.js";
import { Overview, drawColorbar } from "./overview.js";

const MAX_PX_PER_SEC = 384000; // reference: constants/tracks.ts:189

const state = {
  trackIds: [],
  nextId: 0,
  viewports: new Map(), // idChStr -> TrackViewport
  startSec: 0,
  pxPerSec: 100,
  blend: 0.5,
  maxSec: 0,
  maxTrackHz: 0,
  freqScale: "Mel",
  playing: false,
  playerAnchor: { positionSec: 0, at: performance.now(), isPlaying: false },
  selectedTrack: null,
  needsRedraw: true,
};

const $ = (sel) => document.querySelector(sel);
const rowsEl = $("#rows");
let overview = null;
let colormapRgba = null;

// ---------------------------------------------------------------------------
// track management

async function addPaths(paths) {
  const ids = paths.map(() => state.nextId++);
  const added = await api.addTracks(ids, paths);
  if (added.length < paths.length) {
    const failed = paths.filter((_, i) => !added.includes(ids[i]));
    alert(`Could not open:\n${failed.join("\n")}`);
  }
  await refreshAll();
  for (const id of added) await buildRow(id);
  fitIfFirst();
  redraw();
}

async function refreshAll() {
  await api.applyTrackListChanges();
  state.maxSec = await api.getLongestSec();
  state.maxTrackHz = await api.getMaxTrackHz();
  for (const vp of state.viewports.values()) await vp.refreshMetadata();
  if (overview && state.selectedTrack !== null) {
    await overview.setTrack(state.selectedTrack);
  }
  updateColorbar();
  state.needsRedraw = true;
}

async function updateColorbar() {
  if (!colormapRgba) return;
  const [minDb, maxDb] = await Promise.all([
    fetch("/api/get_min_dB", { method: "POST" }).then((r) => r.json())
      .then((j) => jsonNumber(j.result)),
    fetch("/api/get_max_dB", { method: "POST" }).then((r) => r.json())
      .then((j) => jsonNumber(j.result)),
  ]);
  drawColorbar($("#colorbar"), colormapRgba, minDb, maxDb);
}

async function buildRow(trackId) {
  const nCh = await api.getChannelCounts(trackId);
  const tpl = document.querySelector("#row-template");
  for (let ch = 0; ch < Math.min(nCh, 2); ch++) {
    const idChStr = `${trackId}_${ch}`;
    if (state.viewports.has(idChStr)) continue;
    const row = tpl.content.cloneNode(true).firstElementChild;
    row.dataset.idCh = idChStr;
    row.dataset.trackId = trackId;
    rowsEl.appendChild(row);
    const vp = new TrackViewport(row.querySelector(".viewport"), idChStr);
    vp.onNeedsRedraw = () => { state.needsRedraw = true; };
    await vp.refreshMetadata();
    state.viewports.set(idChStr, vp);
    row.querySelector(".track-remove").onclick = () => removeTrack(trackId);
    row.querySelector(".track-reload").onclick = async () => {
      const ok = await api.reloadTracks([trackId]);
      if (!ok.includes(trackId)) alert(`Could not reload track ${trackId}`);
      await refreshAll();
      await rebuildAllRowInfo();
      redraw();
    };
    const vpc = row.querySelector(".viewport");
    vpc.addEventListener("mousemove", (e) => showTooltip(e, vp, row));
    vpc.addEventListener("mouseleave", hideTooltip);
    vpc.addEventListener("click", async (e) => {
      const sec = state.startSec + e.offsetX / state.pxPerSec;
      const prevSelected = state.selectedTrack;
      state.selectedTrack = trackId;
      await api.setTrackPlayer(trackId, sec);
      if (state.playing) await api.resumePlayer();
      if (overview && prevSelected !== trackId) await overview.setTrack(trackId);
      redraw();
      pollPlayer();
    });
    await updateRowInfo(row, trackId, ch, nCh);
  }
  if (!state.trackIds.includes(trackId)) state.trackIds.push(trackId);
}

async function updateRowInfo(row, trackId, ch, nCh) {
  const [name, fmt, sec, sr, lufs, guard] = await Promise.all([
    api.getFileName(trackId), api.getFormatInfo(trackId),
    api.getLengthSec(trackId), api.getSampleRate(trackId),
    api.getGlobalLufs(trackId), api.getGuardClipStats(trackId),
  ]);
  row.querySelector(".track-name").textContent =
    nCh > 1 ? `${name} [ch${ch}]` : name;
  const lufsTxt = isFinite(lufs) ? `${lufs.toFixed(1)} LUFS` : "-∞ LUFS";
  row.querySelector(".track-meta").textContent =
    `${fmt.name} · ${(sr / 1000).toFixed(sr % 1000 ? 1 : 0)} kHz · ${sec.toFixed(2)} s`;
  const guardTxt = guard.filter(([c]) => c === -1 || c === ch)
    .map(([, s]) => s).join("; ");
  row.querySelector(".track-stats").textContent =
    guardTxt ? `${lufsTxt} · ${guardTxt}` : lufsTxt;
}

async function removeTrack(trackId) {
  await api.removeTracks([trackId]);
  state.trackIds = state.trackIds.filter((x) => x !== trackId);
  for (const [key, _] of [...state.viewports]) {
    if (key.startsWith(`${trackId}_`)) {
      rowsEl.querySelector(`[data-id-ch="${key}"]`)?.remove();
      state.viewports.delete(key);
    }
  }
  await refreshAll();
  redraw();
}

function fitIfFirst() {
  if (state.trackIds.length >= 1 && state.maxSec > 0) {
    const w = rowsEl.clientWidth - 290;
    if (state.startSec === 0 && Math.abs(state.pxPerSec - 100) < 1e-9) {
      state.pxPerSec = Math.max(w / state.maxSec, 0.01);
    }
  }
}

// ---------------------------------------------------------------------------
// rendering loop

function redraw() { state.needsRedraw = true; }

function renderFrame() {
  // playhead extrapolation (reference: usePlayer.ts:44-52)
  const a = state.playerAnchor;
  const pos = a.isPlaying
    ? a.positionSec + (performance.now() - a.at) / 1000
    : a.positionSec;
  $("#time-display").textContent = fmtTime(pos);

  if (state.needsRedraw) {
    state.needsRedraw = false;
    const view = {
      startSec: state.startSec,
      pxPerSec: state.pxPerSec,
      blend: state.blend,
    };
    for (const vp of state.viewports.values()) vp.draw(view);
    if (overview) {
      const viewW = rowsEl.clientWidth - 290;
      overview.draw(state.startSec, [state.startSec, viewW / state.pxPerSec]);
    }
    updateTimeAxis($("#time-axis"), state.startSec, state.pxPerSec, state.maxSec);
    for (const row of rowsEl.children) {
      const vp = state.viewports.get(row.dataset.idCh);
      if (!vp || !vp.metadata) continue;
      updateAmpAxis(row.querySelector(".amp-axis"));
      updateFreqAxis(
        row.querySelector(".freq-axis"),
        [0, state.maxTrackHz || vp.metadata.sampleRate / 2],
        state.freqScale,
        state.maxTrackHz || vp.metadata.sampleRate / 2
      );
    }
  }
  // playhead line overlay
  for (const row of rowsEl.children) {
    const vp = state.viewports.get(row.dataset.idCh);
    if (!vp) continue;
    if (Number(row.dataset.trackId) === state.selectedTrack) {
      const x = (pos - state.startSec) * state.pxPerSec;
      const ctx = vp.canvas.getContext("2d");
      const dpr = window.devicePixelRatio || 1;
      if (a.isPlaying || state.playheadX !== x) {
        state.needsRedraw = state.needsRedraw || a.isPlaying;
        if (x >= 0 && x <= vp.canvas.clientWidth) {
          ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
          ctx.strokeStyle = "#f59149";
          ctx.beginPath();
          ctx.moveTo(x, 0);
          ctx.lineTo(x, vp.canvas.clientHeight);
          ctx.stroke();
        }
      }
    }
  }
  requestAnimationFrame(renderFrame);
}

function fmtTime(sec) {
  if (!isFinite(sec) || sec < 0) sec = 0;
  const h = Math.floor(sec / 3600), m = Math.floor(sec / 60) % 60;
  const s = Math.floor(sec) % 60, ms = Math.floor((sec % 1) * 1000);
  return `${String(h).padStart(2, "0")}:${String(m).padStart(2, "0")}:` +
    `${String(s).padStart(2, "0")}.${String(ms).padStart(3, "0")}`;
}

// ---------------------------------------------------------------------------
// tooltip (reference: formatTimeAxisTooltip / formatFrequencyAxisTooltip
// via AudioTrackViewport hover)

let tooltipEl = null;
let tooltipPending = false;

function showTooltip(e, vp, row) {
  if (!vp.metadata) return;
  if (!tooltipEl) {
    tooltipEl = document.createElement("div");
    tooltipEl.style.cssText =
      "position:fixed;pointer-events:none;background:#000a;color:#dde;" +
      "padding:2px 6px;border-radius:3px;font:11px system-ui;z-index:9";
    document.body.appendChild(tooltipEl);
  }
  tooltipEl.style.left = `${e.clientX + 12}px`;
  tooltipEl.style.top = `${e.clientY + 12}px`;
  tooltipEl.style.display = "block";
  if (tooltipPending) return;
  tooltipPending = true;
  setTimeout(async () => {
    tooltipPending = false;
    if (!tooltipEl || tooltipEl.style.display === "none") return;
    const sec = state.startSec + e.offsetX / state.pxPerSec;
    const h = e.target.clientHeight;
    const maxHz = state.maxTrackHz || vp.metadata.sampleRate / 2;
    try {
      const [t, hz] = await Promise.all([
        fetch("/api/format_time_axis_tooltip", {
          method: "POST", headers: { "Content-Type": "application/json" },
          body: JSON.stringify({ sec, formatDisplay: "mm:ss.xxx" }),
        }).then((r) => r.json()).then((j) => j.result),
        fetch("/api/freq_pos_to_hz", {
          method: "POST", headers: { "Content-Type": "application/json" },
          body: JSON.stringify({
            freqScale: state.freqScale, y: e.offsetY, height: h,
            hzRangeMin: 0, hzRangeMax: maxHz, maxTrackHz: maxHz,
          }),
        }).then((r) => r.json()).then((j) => j.result),
      ]);
      const hzLabel = await fetch("/api/format_frequency_axis_tooltip", {
        method: "POST", headers: { "Content-Type": "application/json" },
        body: JSON.stringify({ hz, resolutionHz: maxHz / Math.max(h, 1) }),
      }).then((r) => r.json()).then((j) => j.result);
      if (tooltipEl) tooltipEl.textContent = `${t} · ${hzLabel}Hz`;
    } catch { /* transient */ }
  }, 100);
}

function hideTooltip() {
  if (tooltipEl) tooltipEl.style.display = "none";
}

// ---------------------------------------------------------------------------
// zoom / pan (reference: MainViewer.tsx:538-595 wheel gestures)

rowsEl.addEventListener("wheel", (e) => {
  e.preventDefault();
  const rect = rowsEl.getBoundingClientRect();
  const xInView = e.clientX - rect.left - 290;
  if (e.ctrlKey || e.metaKey) {
    const anchorSec = state.startSec + xInView / state.pxPerSec;
    const factor = Math.exp(-e.deltaY * 0.002);
    state.pxPerSec = Math.min(Math.max(state.pxPerSec * factor, 0.01), MAX_PX_PER_SEC);
    state.startSec = anchorSec - xInView / state.pxPerSec;
  } else {
    state.startSec += (e.deltaY + e.deltaX) / state.pxPerSec * 0.5;
  }
  state.startSec = Math.max(state.startSec, -1);
  redraw();
}, { passive: false });

// ---------------------------------------------------------------------------
// player polling

let pollTimer = null;
async function pollPlayer() {
  const st = await api.playerState();
  state.playerAnchor = {
    positionSec: st.positionSec, at: performance.now(), isPlaying: st.isPlaying,
  };
  state.playing = st.isPlaying;
  $("#btn-play").textContent = st.isPlaying ? "❚❚" : "▶";
  clearTimeout(pollTimer);
  pollTimer = setTimeout(pollPlayer, st.isPlaying ? 250 : 1500);
}

function connectEvents() {
  try {
    const ws = new WebSocket(`ws://${location.host}/events`);
    ws.onmessage = (m) => {
      const { event, payload } = JSON.parse(m.data);
      if (event === "player-state-changed") {
        state.playerAnchor = {
          positionSec: payload.positionSec, at: performance.now(),
          isPlaying: payload.isPlaying,
        };
        state.playing = payload.isPlaying;
        $("#btn-play").textContent = payload.isPlaying ? "❚❚" : "▶";
      }
    };
  } catch { /* polling fallback is always active */ }
}

// ---------------------------------------------------------------------------
// controls

async function setupControls() {
  $("#btn-add").onclick = () => $("#file-input").click();
  $("#file-input").onchange = async (e) => {
    const paths = [];
    for (const f of e.target.files) paths.push(await api.upload(f));
    if (paths.length) await addPaths(paths);
    e.target.value = "";
  };
  const media = await api.listMedia().catch(() => []);
  const sel = $("#media-list");
  for (const p of media) {
    const o = document.createElement("option");
    o.value = p;
    o.textContent = p.split("/").pop();
    sel.appendChild(o);
  }
  sel.onchange = () => {
    if (sel.value) addPaths([sel.value]);
    sel.value = "";
  };

  $("#btn-play").onclick = togglePlay;
  // hotkeys mirror the reference's menu-emitted events (menu.rs:427-445:
  // toggle-play, jump-player, rewind-to-front, time-zoom, remove-selected)
  document.addEventListener("keydown", async (e) => {
    if (e.target.tagName === "INPUT" || e.target.tagName === "SELECT") return;
    const jump = e.shiftKey ? 5.0 : 1.0; // PLAY_BIG_JUMP_SEC / PLAY_JUMP_SEC
    if (e.code === "Space") {
      e.preventDefault();
      togglePlay();
    } else if (e.code === "ArrowLeft" || e.code === "ArrowRight") {
      e.preventDefault();
      const a = state.playerAnchor;
      const pos = a.isPlaying
        ? a.positionSec + (performance.now() - a.at) / 1000 : a.positionSec;
      await api.seekPlayer(pos + (e.code === "ArrowRight" ? jump : -jump));
      pollPlayer();
    } else if (e.code === "Home") {
      e.preventDefault();
      await api.seekPlayer(0);
      state.startSec = 0;
      redraw();
      pollPlayer();
    } else if (e.key === "+" || e.key === "=") {
      state.pxPerSec = Math.min(state.pxPerSec * 1.5, MAX_PX_PER_SEC);
      redraw();
    } else if (e.key === "-") {
      state.pxPerSec = Math.max(state.pxPerSec / 1.5, 0.01);
      redraw();
    } else if (e.code === "Delete" || e.code === "Backspace") {
      if (state.selectedTrack !== null) {
        const t = state.selectedTrack;
        state.selectedTrack = null;
        await removeTrack(t);
      }
    }
  });
  $("#volume").oninput = (e) => api.setVolumeDb(Number(e.target.value));

  const applySpec = async () => {
    await api.setSpecSetting({
      winMillisec: Number($("#win-ms").value),
      tOverlap: Number($("#t-overlap").value),
      fOverlap: 1,
      freqScale: $("#freq-scale").value,
    });
    state.freqScale = $("#freq-scale").value;
    await refreshAll();
    redraw();
  };
  $("#win-ms").onchange = applySpec;
  $("#t-overlap").onchange = applySpec;
  $("#freq-scale").onchange = applySpec;

  $("#db-range").oninput = (e) => {
    $("#db-range-val").textContent = e.target.value;
  };
  $("#db-range").onchange = async (e) => {
    await api.setDbRange(Number(e.target.value));
    await refreshAll();
    redraw();
  };
  $("#blend").oninput = (e) => {
    state.blend = Number(e.target.value);
    redraw();
  };

  const applyNormalize = async () => {
    const type = $("#norm-type").value;
    $("#norm-target").disabled = type === "Off";
    const target = type === "Off" ? { type: "Off" }
      : { type, target: Number($("#norm-target").value) };
    await api.setCommonNormalize(target);
    await refreshAll();
    await rebuildAllRowInfo();
    redraw();
  };
  $("#norm-type").onchange = applyNormalize;
  $("#norm-target").onchange = applyNormalize;
  $("#guard-mode").onchange = async (e) => {
    await api.setCommonGuardClipping(e.target.value);
    await refreshAll();
    await rebuildAllRowInfo();
    redraw();
  };
}

async function rebuildAllRowInfo() {
  for (const row of rowsEl.children) {
    const trackId = Number(row.dataset.trackId);
    const ch = Number(row.dataset.idCh.split("_")[1]);
    const nCh = await api.getChannelCounts(trackId);
    await updateRowInfo(row, trackId, ch, nCh);
  }
}

async function togglePlay() {
  if (state.playing) {
    await api.pausePlayer();
  } else {
    if (state.selectedTrack === null && state.trackIds.length) {
      state.selectedTrack = state.trackIds[0];
      await api.setTrackPlayer(state.selectedTrack, state.startSec > 0 ? state.startSec : 0);
    }
    await api.resumePlayer();
  }
  pollPlayer();
}

// ---------------------------------------------------------------------------
// boot

(async function boot() {
  const colormap = await fetch("/api/get_default_colormap", { method: "POST" })
    .then((r) => r.json()).then((j) => j.result);
  colormapRgba = colormap;
  await api.init(colormap);
  overview = new Overview($("#overview"));
  overview.onSeekView = (centerSec) => {
    const viewW = rowsEl.clientWidth - 290;
    state.startSec = centerSec - viewW / state.pxPerSec / 2;
    redraw();
  };
  await setupControls();
  connectEvents();
  pollPlayer();
  window.addEventListener("resize", redraw);
  requestAnimationFrame(renderFrame);
})();
