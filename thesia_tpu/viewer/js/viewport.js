// Per-track viewport rendering: spectrogram tile compositing + waveform
// envelope, LOD selection and client caches.
// Design follows the reference compositor (src/modules/AudioTrackViewport.tsx:
// LOD math :385-476; waveform mesh src/lib/waveform-renderer.ts:227-407) with
// a 2D-canvas backend instead of PixiJS.

import { api } from "./api.js";

const TILE = 512;
const WAVE_BINS = 1024;
const WAVE_COLOR = "#2d92e5";
const CLIP_COLOR = "#e05252";

export class TrackViewport {
  constructor(canvas, idChStr) {
    this.canvas = canvas;
    this.ctx = canvas.getContext("2d");
    this.idChStr = idChStr;
    this.metadata = null;
    this.specTiles = new Map(); // key -> {bitmap|null(pending), originX, originY, w, h}
    this.waveTiles = new Map(); // key -> decoded tile | null(pending)
    this.onNeedsRedraw = () => {};
  }

  async refreshMetadata() {
    // retry while spectrogram is still computing (reference retries 20x100ms)
    for (let i = 0; i < 20; i++) {
      this.metadata = await api.getMetadata(this.idChStr);
      if (!this.metadata) return;
      if (this.metadata.spectrogramWidth > 0) break;
      await new Promise((r) => setTimeout(r, 100));
    }
    this.specTiles.clear();
    this.waveTiles.clear();
  }

  // ---- LOD math (reference: AudioTrackViewport.tsx:385-476) ----
  specLevels(pxPerSec, viewH) {
    const md = this.metadata;
    const basePxPerSec = md.spectrogramWidth / md.trackSec;
    const levelX = Math.max(0, Math.floor(Math.log2(basePxPerSec / pxPerSec)));
    const levelY = Math.max(
      0, Math.ceil(Math.log2(md.spectrogramHeight / Math.max(viewH, 1)))
    );
    return { levelX, levelY, basePxPerSec };
  }

  waveLevel(pxPerSec, dpr) {
    const md = this.metadata;
    const samplesPerPx = md.sampleRate / (pxPerSec * dpr);
    if (samplesPerPx <= 2) return 0;
    return Math.max(0, Math.ceil(Math.log2(samplesPerPx)));
  }

  async fetchSpecTile(levelX, levelY, tileX, tileY) {
    const md = this.metadata;
    const key = `${md.spectrogramRevision}:${levelX}:${levelY}:${tileX}:${tileY}`;
    if (this.specTiles.has(key)) return this.specTiles.get(key);
    this.specTiles.set(key, null); // pending
    try {
      const t = await api.getSpectrogramTile(this.idChStr, levelX, levelY, tileX, tileY);
      if (t.width === 0 || t.height === 0 || t.revision !== BigInt(md.spectrogramRevision)) {
        this.specTiles.delete(key);
        return null;
      }
      const img = new ImageData(t.rgba.slice(0, t.width * t.height * 4), t.width, t.height);
      t.bitmap = await createImageBitmap(img);
      this.specTiles.set(key, t);
      this.onNeedsRedraw();
      return t;
    } catch {
      this.specTiles.delete(key);
      return null;
    }
  }

  async fetchWaveTile(level, tileIndex) {
    const md = this.metadata;
    const key = `${md.waveformRevision}:${level}:${tileIndex}`;
    if (this.waveTiles.has(key)) return this.waveTiles.get(key);
    this.waveTiles.set(key, null);
    try {
      const t = await api.getWaveformTile(this.idChStr, level, tileIndex);
      if (t.binCount === 0) return t;
      this.waveTiles.set(key, t);
      this.onNeedsRedraw();
      return t;
    } catch {
      this.waveTiles.delete(key);
      return null;
    }
  }

  // ---- drawing ----
  draw(view) {
    // view: {startSec, pxPerSec, blend, isClipped}
    const { canvas, ctx } = this;
    const dpr = window.devicePixelRatio || 1;
    const w = canvas.clientWidth, h = canvas.clientHeight;
    if (canvas.width !== w * dpr || canvas.height !== h * dpr) {
      canvas.width = w * dpr;
      canvas.height = h * dpr;
    }
    ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
    ctx.fillStyle = "#0c0d10";
    ctx.fillRect(0, 0, w, h);
    if (!this.metadata || this.metadata.trackSec === 0) return;

    this.drawWaveform(view, w, h, dpr);
    if (view.blend > 0.02 && this.metadata.spectrogramWidth > 0) {
      ctx.globalAlpha = Math.min(view.blend, 1);
      this.drawSpectrogram(view, w, h);
      ctx.globalAlpha = 1;
    }
  }

  drawSpectrogram(view, w, h) {
    const md = this.metadata;
    const { levelX, levelY, basePxPerSec } = this.specLevels(view.pxPerSec, h);
    const lodPxPerSec = basePxPerSec / (1 << levelX);
    const lodWidth = Math.ceil(md.spectrogramWidth / (1 << levelX));
    const lodHeight = Math.ceil(md.spectrogramHeight / (1 << levelY));
    const secToLodX = (sec) => sec * lodPxPerSec;
    const xStart = secToLodX(view.startSec);
    const xEnd = secToLodX(view.startSec + w / view.pxPerSec);
    const t0 = Math.max(0, Math.floor(xStart / TILE));
    const t1 = Math.min(Math.ceil(lodWidth / TILE) - 1, Math.floor(xEnd / TILE));
    const nTileRows = Math.ceil(lodHeight / TILE);
    const scaleX = view.pxPerSec / lodPxPerSec;
    const scaleY = h / lodHeight;
    for (let ty = 0; ty < nTileRows; ty++) {
      for (let tx = t0; tx <= t1; tx++) {
        const tile = this.specTiles.get(
          `${md.spectrogramRevision}:${levelX}:${levelY}:${tx}:${ty}`
        );
        if (tile === undefined) this.fetchSpecTile(levelX, levelY, tx, ty);
        if (!tile || !tile.bitmap) continue;
        // tile rows are high-freq-first; destination y = top of view
        const dx = (tile.originX - xStart) * scaleX;
        const dy = (lodHeight - (tile.originY + tile.height)) * scaleY;
        this.ctx.drawImage(
          tile.bitmap, dx, dy, tile.width * scaleX, tile.height * scaleY
        );
      }
    }
  }

  drawWaveform(view, w, h, dpr) {
    const md = this.metadata;
    const ctx = this.ctx;
    const level = this.waveLevel(view.pxPerSec, dpr);
    const spb = 1 << level;
    const tileSamples = WAVE_BINS * spb;
    const sr = md.sampleRate;
    const s0 = view.startSec * sr;
    const s1 = (view.startSec + w / view.pxPerSec) * sr;
    const ti0 = Math.max(0, Math.floor(s0 / tileSamples));
    const ti1 = Math.min(
      Math.ceil(md.sampleCount / tileSamples) - 1, Math.floor(s1 / tileSamples)
    );
    const mid = h / 2;
    const ampScale = h / 2 * 0.95;
    ctx.lineWidth = 1;
    for (let ti = ti0; ti <= ti1; ti++) {
      const tile = this.waveTiles.get(`${md.waveformRevision}:${level}:${ti}`);
      if (tile === undefined) this.fetchWaveTile(level, ti);
      if (!tile || tile.binCount === 0) continue;
      const xOf = (b) =>
        ((ti * tileSamples + b * spb) / sr - view.startSec) * view.pxPerSec;
      // clipped tracks: tiles carry the PRE-clip waveform; draw it red
      // underneath, then the +/-1-clamped waveform blue on top
      // (reference: waveform-renderer.ts clipped two-layer draw)
      if (md.isClipped) {
        this._envelope(ctx, tile, xOf, mid, ampScale, CLIP_COLOR, null);
      }
      const clamp = md.isClipped ? 1.0 : Infinity;
      this._envelope(ctx, tile, xOf, mid, ampScale, WAVE_COLOR, clamp);
    }
  }

  _envelope(ctx, tile, xOf, mid, ampScale, color, clampAbs) {
    const cl = (v) =>
      clampAbs === null || clampAbs === Infinity
        ? v
        : Math.min(Math.max(v, -clampAbs), clampAbs);
    const bins = tile.bins;
    ctx.strokeStyle = color;
    ctx.fillStyle = color;
    ctx.beginPath();
    for (let b = 0; b < tile.binCount; b++) {
      const y = mid - cl(bins[b * 3 + 1]) * ampScale;
      if (b === 0) ctx.moveTo(xOf(b), y);
      else ctx.lineTo(xOf(b), y);
    }
    for (let b = tile.binCount - 1; b >= 0; b--) {
      ctx.lineTo(xOf(b), mid - cl(bins[b * 3]) * ampScale);
    }
    ctx.closePath();
    ctx.globalAlpha = 0.85;
    ctx.fill();
    ctx.globalAlpha = 1;
    ctx.beginPath();
    for (let b = 0; b < tile.binCount; b++) {
      const y = mid - cl(bins[b * 3 + 2]) * ampScale;
      if (b === 0) ctx.moveTo(xOf(b), y);
      else ctx.lineTo(xOf(b), y);
    }
    ctx.stroke();
  }
}
