// Web Audio playback of the engine's PCM stream — the deployable last hop
// of the player.  The reference's cpal output callback runs in-process on
// the user's machine (reference: src-tauri/src/player/stream.rs:501-639);
// in the service deployment the user's machine is the browser, so this
// module attaches the AudioContext as the player's output device
// (/player/attach_pcm), pulls fixed-size PCM chunks (/player/pcm — each
// pull runs the engine's exact mix->volume->clamp fill), and schedules
// them on the AudioContext clock.  All scheduling MATH lives in
// applogic.js (audioChunkStartTime / audioPullCount / audioCursorReset /
// deinterleavePcm) with executed Python twins; this file only wires it to
// Web Audio + fetch.
//
// Policies:
//  * buffer-ahead target AUDIO_BUFFER_AHEAD_SEC, pump every
//    AUDIO_PUMP_INTERVAL_MS and after state changes;
//  * underrun: restart the scheduled frontier at ctx.currentTime +
//    AUDIO_MIN_LEAD_SEC (gap, never overlap);
//  * seek/track switch: the wire chunk carries cursor_version
//    (reference: stream.rs:110 reset_for_cursor) — on a bump, everything
//    scheduled is pre-seek audio: stop it and restart the frontier;
//  * pause/end: the server flags isPlaying/ended in each chunk; pulling
//    stops immediately (a paused server returns silence and does not
//    advance the position, so a late pull is harmless).

import { api } from "./api.js";
import * as L from "./applogic.js";

export function createAudioPlayer(opts = {}) {
  const makeContext =
    opts.createContext ||
    (() => {
      const Ctor = window.AudioContext || window.webkitAudioContext;
      return Ctor ? new Ctor() : null;
    });
  const timer = opts.setTimeout || ((fn, ms) => setTimeout(fn, ms));

  const st = {
    ctx: null,
    attached: false,
    running: false, // pump loop live
    pumping: false, // re-entrancy guard (pump is async)
    unsupported: false,
    nextStartTime: 0,
    seenVersion: null,
    scheduled: [], // live AudioBufferSourceNodes, flushed on seek/pause
    pulls: 0, // diagnostics / tests
  };

  function flushScheduled() {
    for (const src of st.scheduled) {
      try {
        src.stop();
      } catch (_e) { /* already ended */ }
    }
    st.scheduled = [];
    st.nextStartTime = 0; // frontier restarts at ctxTime + min lead
  }

  function scheduleChunk(chunk) {
    const ctx = st.ctx;
    const buf = ctx.createBuffer(chunk.channels, chunk.nFrames, ctx.sampleRate);
    for (let c = 0; c < chunk.channels; c++) {
      buf.copyToChannel(L.deinterleavePcm(chunk.pcm, chunk.channels, chunk.nFrames, c), c);
    }
    const src = ctx.createBufferSource();
    src.buffer = buf;
    src.connect(ctx.destination);
    const startAt = L.audioChunkStartTime(
      st.nextStartTime, ctx.currentTime, L.AUDIO_MIN_LEAD_SEC
    );
    src.start(startAt);
    st.nextStartTime = startAt + chunk.nFrames / ctx.sampleRate;
    st.scheduled.push(src);
    src.onended = () => {
      st.scheduled = st.scheduled.filter((s) => s !== src);
    };
  }

  async function pump() {
    if (st.pumping || !st.running || !st.attached) return;
    st.pumping = true;
    try {
      const ctx = st.ctx;
      const chunkDur = L.AUDIO_CHUNK_FRAMES / ctx.sampleRate;
      let n = L.audioPullCount(
        st.nextStartTime, ctx.currentTime,
        L.AUDIO_BUFFER_AHEAD_SEC, chunkDur, L.AUDIO_MAX_PULLS_PER_TICK
      );
      while (n > 0 && st.running) {
        const chunk = await api.pullPcm(L.AUDIO_CHUNK_FRAMES);
        st.pulls += 1;
        if (L.audioCursorReset(chunk.cursorVersion, st.seenVersion)) {
          flushScheduled(); // pre-seek audio must not play (stream.rs:110)
        }
        st.seenVersion = chunk.cursorVersion;
        if (!chunk.isPlaying) {
          st.running = false; // paused or ended server-side
          break;
        }
        scheduleChunk(chunk);
        n -= 1;
        if (chunk.ended) {
          st.running = false;
          break;
        }
      }
    } catch (_e) {
      // transient fetch failure / detach race: stop pumping, the next
      // play-state change restarts the loop (and re-attaches if needed)
      st.running = false;
      st.attached = false;
    } finally {
      st.pumping = false;
    }
    if (st.running) timer(pump, L.AUDIO_PUMP_INTERVAL_MS);
  }

  async function ensureStarted() {
    // NEVER throws: remote audio is an enhancement over the server-side
    // output path — an attach failure (service mid-restart, proxy hiccup)
    // must not break the play command it piggybacks on.
    if (st.unsupported) return false;
    try {
      if (!st.ctx) {
        st.ctx = makeContext(); // needs a user gesture; callers are handlers
        if (!st.ctx) {
          st.unsupported = true;
          return false;
        }
      }
      if (st.ctx.resume) await st.ctx.resume();
      if (!st.attached) {
        await api.attachPcm(st.ctx.sampleRate, 2);
        st.attached = true;
        st.seenVersion = null;
        st.nextStartTime = 0;
      }
      if (!st.running) {
        st.running = true;
        await pump();
      }
      return true;
    } catch (_e) {
      return false; // transient: the next play state change retries
    }
  }

  function setPlaying(isPlaying) {
    if (!st.ctx || st.unsupported) return;
    if (isPlaying) {
      if (!st.attached) {
        // a pump failure detached us (transient fetch error / server
        // restart); re-attaching needs no user gesture — the context
        // already exists from the original play gesture
        ensureStarted();
      } else if (!st.running) {
        st.running = true;
        pump();
      }
    } else {
      st.running = false;
      flushScheduled(); // pause silences immediately, like a device stream
    }
  }

  return { ensureStarted, setPlaying, _state: st };
}
