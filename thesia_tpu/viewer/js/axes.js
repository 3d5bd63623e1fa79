// Axis canvases: time axis (top) and per-track frequency axes.
// Marker computation is served by the backend axis API (the reference
// computes these client-side in WASM; same functions, same outputs).

import { api } from "./api.js";

// px/sec -> time tick unit + label interval (condensed from the reference's
// scale table, src/prototypes/constants/tracks.ts:39-211)
const TIME_TICK_TABLE = [
  [0.0009765625, 3600, 1], [0.001953125, 1800, 2], [0.00390625, 600, 3],
  [0.015625, 300, 2], [0.0625, 60, 5], [0.25, 30, 2], [0.5, 10, 3],
  [2, 5, 2], [5, 1, 5], [20, 0.5, 2], [40, 0.1, 5], [150, 0.05, 2],
  [400, 0.01, 5], [1500, 0.005, 2], [4000, 0.001, 5], [15000, 0.0005, 2],
  [40000, 0.0001, 5], [150000, 0.00005, 2], [Infinity, 0.00001, 5],
];

export function timeTickParams(pxPerSec) {
  for (const [maxPps, unit, interval] of TIME_TICK_TABLE) {
    if (pxPerSec <= maxPps) return { tickUnit: unit, labelInterval: interval };
  }
  return { tickUnit: 0.00001, labelInterval: 5 };
}

export function drawMarkersH(canvas, markers, startFrac = 0) {
  // horizontal axis: marker position is 0..1 fraction of visible range
  const dpr = window.devicePixelRatio || 1;
  const w = canvas.clientWidth, h = canvas.clientHeight;
  canvas.width = w * dpr;
  canvas.height = h * dpr;
  const ctx = canvas.getContext("2d");
  ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
  ctx.clearRect(0, 0, w, h);
  ctx.strokeStyle = "#4a4f5a";
  ctx.fillStyle = "#9aa0ac";
  ctx.font = "10px system-ui";
  ctx.textBaseline = "top";
  for (const [pos, label] of markers) {
    if (pos < -1e6) continue; // sentinel element
    const x = pos * w;
    if (x < -40 || x > w + 40) continue;
    ctx.beginPath();
    ctx.moveTo(x, h - (label ? 8 : 4));
    ctx.lineTo(x, h);
    ctx.stroke();
    if (label) ctx.fillText(label, x + 2, 2);
  }
}

export function drawMarkersV(canvas, markers) {
  // vertical axis: position 0 = top, 1 = bottom
  const dpr = window.devicePixelRatio || 1;
  const w = canvas.clientWidth, h = canvas.clientHeight;
  canvas.width = w * dpr;
  canvas.height = h * dpr;
  const ctx = canvas.getContext("2d");
  ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
  ctx.clearRect(0, 0, w, h);
  ctx.strokeStyle = "#4a4f5a";
  ctx.fillStyle = "#9aa0ac";
  ctx.font = "9px system-ui";
  ctx.textBaseline = "middle";
  ctx.textAlign = "right";
  for (const [pos, label] of markers) {
    const y = Math.min(Math.max(pos * h, 1), h - 1);
    ctx.beginPath();
    ctx.moveTo(w - (label ? 6 : 3), y);
    ctx.lineTo(w, y);
    ctx.stroke();
    if (label) ctx.fillText(label, w - 8, y);
  }
}

export async function updateTimeAxis(canvas, startSec, pxPerSec, maxSec) {
  const w = canvas.clientWidth;
  const endSec = startSec + w / pxPerSec;
  const { tickUnit, labelInterval } = timeTickParams(pxPerSec);
  const markers = await api.calcTimeAxisMarkers(
    startSec, endSec, tickUnit, labelInterval, maxSec
  );
  drawMarkersH(canvas, markers);
}

export async function updateAmpAxis(canvas, ampRange = [-1, 1]) {
  const h = canvas.clientHeight;
  let maxTicks = Math.max(3, Math.min(Math.floor(h / 24), 25));
  if (maxTicks % 2 === 0) maxTicks -= 1; // amp axis needs odd tick count
  const markers = await api.calcAmpAxisMarkers(
    maxTicks, Math.max(Math.ceil(maxTicks / 2), 2), ampRange[0], ampRange[1]
  );
  drawMarkersV(canvas, markers);
}

export async function updateFreqAxis(canvas, hzRange, freqScale, maxTrackHz) {
  const h = canvas.clientHeight;
  const maxTicks = Math.max(3, Math.min(Math.floor(h / 28) | 1, 25));
  const markers = await api.calcFreqAxisMarkers(
    hzRange[0], hzRange[1], freqScale, maxTicks, maxTicks, maxTrackHz
  );
  drawMarkersV(canvas, markers);
}
