// Overview strip: whole-track waveform of the selected track, limiter gain
// envelope band, and a draggable lens showing the visible range.
// reference: src/prototypes/Overview/OverviewWaveformViewport.tsx.

import { api } from "./api.js";
import * as L from "./applogic.js";
import { setLastAxisMarkers } from "./axes.js";

const GAIN_COLOR = "rgba(245,145,73,0.55)";
const WAVE_COLOR = "#2d92e5";
const LENS_FILL = "rgba(255,255,255,0.08)";
const LENS_EDGE = "rgba(255,255,255,0.35)";

export class Overview {
  constructor(canvas) {
    this.canvas = canvas;
    this.ctx = canvas.getContext("2d");
    this.trackId = null;
    this.idChStr = null;
    this.metadata = null;
    this.bins = null; // [Float32Array of (min,max,mean)*N] per channel lane
    this.gain = null;
    // reference Overview.tsx handler trio: inside/outside the lens moves it
    // (anchored at the grab fraction), edges resize through the
    // MainViewer's normalize pipeline (resizeLensLeft/Right)
    this.onMoveLens = () => {}; // (sec, anchorRatio)
    this.onResizeLensLeft = () => {}; // (sec)
    this.onResizeLensRight = () => {}; // (sec)
    this._drag = null; // {state, anchorRatio}
    this._lens = { startSec: 0, durationSec: 0 }; // set each draw()
    canvas.addEventListener("mousemove", (e) => {
      if (this._drag) return;
      const s = this._cursorState(e);
      canvas.style.cursor =
        s === "left" || s === "right" ? "col-resize" : "ew-resize";
    });
    canvas.addEventListener("mousedown", (e) => {
      if (!this.metadata) return;
      const rect = this.canvas.getBoundingClientRect();
      const cursorState = this._cursorState(e);
      const anchorRatio = L.overviewDragAnchor(
        cursorState, e.clientX - rect.left, rect.width || 1,
        this.metadata.trackSec, this._lens.startSec, this._lens.durationSec
      );
      this._drag = { state: cursorState, anchorRatio };
      this._applyDrag(e);
    });
    window.addEventListener("mousemove", (e) => {
      if (this._drag) this._applyDrag(e);
    });
    window.addEventListener("mouseup", () => (this._drag = null));
  }

  _cursorState(e) {
    // reference: Overview.tsx:158-173 (left | inlens | right | outlens)
    const rect = this.canvas.getBoundingClientRect();
    const pxPerSec = (rect.width || 1) / Math.max(this.metadata?.trackSec ?? 1, 1e-8);
    return L.overviewCursorState(
      e.clientX - rect.left, this._lens.startSec, this._lens.durationSec, pxPerSec
    );
  }

  _applyDrag(e) {
    if (!this.metadata || !this._drag) return;
    const rect = this.canvas.getBoundingClientRect();
    const sec = L.overviewSecFromX(
      e.clientX - rect.left, rect.width || 1, this.metadata.trackSec
    );
    if (this._drag.state === "left") this.onResizeLensLeft(sec);
    else if (this._drag.state === "right") this.onResizeLensRight(sec);
    else this.onMoveLens(sec, this._drag.anchorRatio);
  }

  async setTrack(trackId, force = false) {
    if (trackId === this.trackId && !force && this.bins) return; // no refetch
    const gen = (this._gen = (this._gen || 0) + 1); // kill in-flight races
    this.trackId = trackId;
    if (trackId === null) {
      this.metadata = this.bins = this.gain = null;
      return;
    }
    this.idChStr = `${trackId}_0`;
    const metadata = await api.getMetadata(this.idChStr);
    if (gen !== this._gen) return;
    this.metadata = metadata;
    if (!this.metadata) return;
    // up to OVERVIEW_MAX_CH stacked channel lanes
    // (reference: OverviewWaveformViewport.tsx:18-143)
    const nCh = Math.min(await api.getChannelCounts(trackId).catch(() => 1), 4);
    const width = this.canvas.clientWidth || 600;
    const level = L.overviewWaveLevel(this.metadata.sampleCount, width);
    const spb = 1 << level;
    const tileSamples = 1024 * spb;
    const nTiles = Math.ceil(this.metadata.sampleCount / tileSamples);
    const bins = await Promise.all(
      Array.from({ length: nCh }, async (_, ch) => {
        const parts = await Promise.all(
          Array.from({ length: nTiles }, (_x, i) =>
            api.getWaveformTile(`${trackId}_${ch}`, level, i)
          )
        );
        const total = parts.reduce((a, p) => a + p.binCount, 0);
        const chBins = new Float32Array(total * 3);
        let off = 0;
        for (const p of parts) {
          chBins.set(p.bins, off);
          off += p.binCount * 3;
        }
        return chBins;
      })
    );
    const gain = await api.getLimiterGain(trackId).catch(() => null);
    if (gen !== this._gen) return;
    this.bins = bins;
    this.gain = gain;
  }

  draw(startSec, pxPerSecViewWidthSec) {
    const { canvas, ctx } = this;
    const dpr = window.devicePixelRatio || 1;
    const w = canvas.clientWidth, h = canvas.clientHeight;
    if (canvas.width !== w * dpr || canvas.height !== h * dpr) {
      canvas.width = w * dpr;
      canvas.height = h * dpr;
    }
    ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
    ctx.fillStyle = "#111317";
    ctx.fillRect(0, 0, w, h);
    if (!this.metadata || !this.bins || !this.bins.length) return;
    // stacked channel lanes
    const nCh = this.bins.length;
    const laneH = h / nCh;
    ctx.fillStyle = WAVE_COLOR;
    ctx.globalAlpha = 0.8;
    for (let ch = 0; ch < nCh; ch++) {
      const bins = this.bins[ch];
      const n = bins.length / 3;
      if (!n) continue;
      const mid = laneH * (ch + 0.5), amp = (laneH / 2) * 0.9;
      ctx.beginPath();
      for (let i = 0; i < n; i++) {
        const x = (i / n) * w;
        const y = mid - bins[i * 3 + 1] * amp;
        if (i === 0) ctx.moveTo(x, y);
        else ctx.lineTo(x, y);
      }
      for (let i = n - 1; i >= 0; i--) {
        const x = (i / n) * w;
        ctx.lineTo(x, mid - bins[i * 3] * amp);
      }
      ctx.closePath();
      ctx.fill();
    }
    ctx.globalAlpha = 1;
    if (nCh > 1) {
      ctx.strokeStyle = "#2c3039";
      for (let ch = 1; ch < nCh; ch++) {
        ctx.beginPath();
        ctx.moveTo(0, laneH * ch + 0.5);
        ctx.lineTo(w, laneH * ch + 0.5);
        ctx.stroke();
      }
    }
    // limiter gain envelope band (gain < 1 regions), orange from top
    if (this.gain && this.gain.length > 1) {
      ctx.fillStyle = GAIN_COLOR;
      const g = this.gain;
      ctx.beginPath();
      ctx.moveTo(0, 0);
      for (let i = 0; i < g.length; i++) {
        const x = (i / g.length) * w;
        ctx.lineTo(x, (1 - g[i]) * h * 0.5);
      }
      ctx.lineTo(w, 0);
      ctx.closePath();
      ctx.fill();
    }
    // lens
    const [vs, vw] = pxPerSecViewWidthSec;
    this._lens = { startSec: vs, durationSec: vw };
    const x0 = (vs / this.metadata.trackSec) * w;
    const x1 = ((vs + vw) / this.metadata.trackSec) * w;
    ctx.fillStyle = LENS_FILL;
    ctx.fillRect(x0, 0, Math.max(x1 - x0, 2), h);
    ctx.strokeStyle = LENS_EDGE;
    ctx.strokeRect(x0 + 0.5, 0.5, Math.max(x1 - x0, 2) - 1, h - 1);
  }
}

// dB colorbar: vertical colormap gradient + dB axis labels.
// reference: src/prototypes/MainViewer/ColorBarCanvas.tsx.
export async function drawColorbar(canvas, colormap, minDb, maxDb) {
  const dpr = window.devicePixelRatio || 1;
  const w = canvas.clientWidth, h = canvas.clientHeight;
  canvas.width = w * dpr;
  canvas.height = h * dpr;
  const ctx = canvas.getContext("2d");
  ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
  const barW = 12;
  const n = colormap.length / 4;
  for (let y = 0; y < h; y++) {
    // top = max dB = end of colormap (skipping the reserved black at 0)
    const idx = L.colorbarColorIndex(y, h, n);
    ctx.fillStyle = `rgb(${colormap[idx * 4]},${colormap[idx * 4 + 1]},${colormap[idx * 4 + 2]})`;
    ctx.fillRect(0, y, barW, 1);
  }
  if (isFinite(minDb) && isFinite(maxDb) && maxDb > minDb) {
    const { DB_TICK_NUM, tickScale } = await import("./axes.js");
    const scale = tickScale(DB_TICK_NUM, h) || [4, 4];
    const markers = await fetch("/api/calc_dB_axis_markers", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({
        maxNumTicks: scale[0], maxNumLabels: scale[1],
        dBRangeMin: minDb, dBRangeMax: maxDb,
      }),
    }).then((r) => r.json()).then((j) => j.result);
    setLastAxisMarkers(canvas, markers); // dB tooltip reads the drawn ticks
    ctx.fillStyle = "#9aa0ac";
    ctx.font = "9px system-ui";
    ctx.textBaseline = "middle";
    for (const [pos, label] of markers) {
      const y = Math.min(Math.max(pos * h, 5), h - 5);
      ctx.strokeStyle = "#4a4f5a";
      ctx.beginPath();
      ctx.moveTo(barW, y);
      ctx.lineTo(barW + 4, y);
      ctx.stroke();
      if (label) ctx.fillText(label, barW + 6, y);
    }
  } else {
    setLastAxisMarkers(canvas, []); // no ticks drawn -> no tooltip tick unit
  }
}
