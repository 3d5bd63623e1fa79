"""The headless app PLAYS a track: Web Audio scheduling end-to-end.

VERDICT r4 next #3 'Done' criterion: the real app.js boots against a real
EngineSession, Space starts playback, audioplayer.js attaches the (fake)
AudioContext as the player's output device and schedules PCM chunks — and
every scheduled chunk equals the engine path's mix/volume/clamp fill output
BYTE-FOR-BYTE (reference parity: src-tauri/src/player/stream.rs:501-639;
cursor-version flushes :110).
"""

import pathlib
import struct

import numpy as np
import pytest

from tests.fakedom import FakeBrowser
from tests.jsinterp import Interp

VIEWER = pathlib.Path(__file__).resolve().parent.parent / "thesia_tpu" / "viewer"

SR = 48000  # track sr == fake AudioContext sr -> the equal-rate fill path


@pytest.fixture(scope="module")
def booted_audio(tmp_path_factory):
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_f32

    td = tmp_path_factory.mktemp("audio_boot")
    rng = np.random.default_rng(11)
    wav = rng.uniform(-0.8, 0.8, (2, SR * 2)).astype(np.float32)
    media = td / "audio_track.wav"
    media.write_bytes(encode_wav_f32(wav, SR))

    session = EngineSession(settings_dir=td / "cfg")
    browser = FakeBrowser(
        session, (VIEWER / "index.html").read_text(), media_paths=[media]
    )
    interp = Interp()
    browser.install(interp)
    for name in ("api.js", "freqscale.js", "caches.js", "axes.js",
                 "viewport.js", "applogic.js", "audioplayer.js", "overview.js",
                 "app.js"):
        interp.load((VIEWER / "js" / name).read_text())
    # add the track through the app's own media dropdown
    sel = browser.doc["querySelector"]("#media-list")
    sel["value"] = str(media)
    browser.dispatch_event(sel, "change")
    assert session.settings_settled(timeout=180)
    session.tm.images.drain()
    yield interp, browser, session, wav
    session.tm.images.shutdown()


def _space(browser):
    browser.dispatch_event(browser.doc, "keydown", {
        "code": "Space", "key": " ", "target": {"tagName": "DIV"},
        "shiftKey": False, "metaKey": False, "ctrlKey": False,
    })


def _decode(chunk: bytes) -> dict:
    n, ch, sr, flags, pos, ver, _pad = struct.unpack_from("<IIIIdII", chunk, 0)
    return {
        "n": n, "ch": ch, "sr": sr,
        "playing": bool(flags & 1), "ended": bool(flags & 2),
        "pos": pos, "ver": ver,
        "data": np.frombuffer(chunk, np.float32, offset=32).reshape(n, ch),
    }


def _lanes_to_array(rec) -> np.ndarray:
    lanes = rec["lanes"]
    return np.stack(
        [np.asarray(lanes[c], np.float32) for c in sorted(lanes)], axis=1
    )


def test_play_schedules_engine_exact_pcm(booted_audio, monkeypatch):
    interp, browser, session, wav = booted_audio
    from thesia_tpu.player.player import Player

    pulled = []
    orig = Player.pull_pcm

    def recording_pull(self, n):
        out = orig(self, n)
        pulled.append(out)
        return out

    monkeypatch.setattr(Player, "pull_pcm", recording_pull)

    _space(browser)  # togglePlay: seek to cursor, attach AudioContext, resume
    assert session.player.state()["isPlaying"] is True
    assert session.player.remote_attached()
    assert browser.audio_contexts, "no AudioContext was created"
    ctx = browser.audio_contexts[-1]
    assert ctx["sampleRate"] == float(SR)

    browser.advance(1000)  # pump timers fire; the context clock advances

    sched = ctx["_scheduled"]
    playing = [d for d in map(_decode, pulled) if d["playing"]]
    assert len(sched) >= 4, "pump never scheduled audio"
    assert len(sched) == len(playing)

    # 1) BYTE-FOR-BYTE: every scheduled buffer == the engine fill's output
    for rec, chunk in zip(sched, playing):
        got = _lanes_to_array(rec)
        assert got.tobytes() == chunk["data"].tobytes()

    # 2) the frontier is gapless while healthy: each chunk starts exactly
    # where the previous ends (no overlap, no drift)
    for a, b in zip(sched, sched[1:]):
        end_a = a["startTime"] + a["frames"] / SR
        assert b["startTime"] == pytest.approx(end_a, abs=1e-9)

    # 3) independent semantic check vs the RAW track samples (the engine
    # path itself is mix->volume->clamp per stream.rs:501-639): playback
    # started from the select cursor (0), stereo track at the context rate
    first = playing[0]
    start_frame = int(round((first["pos"] * SR))) - first["n"]
    interleaved = wav.T.reshape(-1)
    from thesia_tpu.player.mixing import render_block

    expected = render_block(
        interleaved, 2, start_frame, first["n"], 2, session.player.playback.volume
    )
    assert first["data"].tobytes() == expected.tobytes()

    # 4) pause flushes: Space again stops every scheduled source
    _space(browser)
    assert session.player.state()["isPlaying"] is False
    browser.advance(300)
    assert all(rec["stoppedAt"] is not None for rec in ctx["_scheduled"])


def test_seek_flushes_scheduled_audio(booted_audio):
    """A server-side seek bumps cursor_version; the next pulled chunk makes
    the client stop all pre-seek scheduled audio (stream.rs:110 parity)."""
    interp, browser, session, wav = booted_audio
    ctx = browser.audio_contexts[-1]

    _space(browser)  # resume (fixture state: paused at the cursor)
    assert session.player.state()["isPlaying"] is True
    browser.advance(500)
    before = [r for r in ctx["_scheduled"] if r["stoppedAt"] is None]
    assert before, "nothing scheduled before the seek"
    ver_before = session.player.playback.cursor_version

    session.seek_player(0.8)  # the engine-side seek (bumps cursor_version)
    assert session.player.playback.cursor_version == ver_before + 1
    browser.advance(500)

    # every pre-seek chunk was stopped the moment the version bump arrived
    assert all(r["stoppedAt"] is not None for r in before)
    # and fresh post-seek audio got scheduled
    fresh = [r for r in ctx["_scheduled"] if r not in before]
    assert fresh
    _space(browser)  # leave the module paused
    browser.advance(200)


def test_attach_failure_never_breaks_play(booted_audio, monkeypatch):
    """A failing /player/attach_pcm (service mid-restart) must not break the
    play command it piggybacks on — playback proceeds server-side and the
    next play state change retries the attach."""
    interp, browser, session, wav = booted_audio
    from thesia_tpu.player.player import Player

    def boom(self, sr, ch):
        raise ValueError("synthetic attach outage")

    monkeypatch.setattr(Player, "attach_remote_audio", boom)
    session.player.detach_remote_audio()  # prior flows attached already
    _space(browser)
    assert session.player.state()["isPlaying"] is True  # play survived
    assert not session.player.remote_attached()
    monkeypatch.undo()
    # next state change re-attaches without a new gesture (ctx exists)
    browser.advance(300)  # pollPlayer fires -> setPlaying(true) -> retry
    assert session.player.remote_attached()
    _space(browser)
    browser.advance(200)


def test_audio_unsupported_context_is_graceful(tmp_path):
    """No AudioContext (old browser / non-secure context): play still works
    through the server-side path; the audio player flags unsupported and
    never throws."""
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_f32

    rng = np.random.default_rng(3)
    media = tmp_path / "t.wav"
    media.write_bytes(
        encode_wav_f32(rng.uniform(-0.5, 0.5, (1, 8000)).astype(np.float32), 8000)
    )
    session = EngineSession(settings_dir=tmp_path / "cfg")
    browser = FakeBrowser(
        session, (VIEWER / "index.html").read_text(), media_paths=[media]
    )
    interp = Interp()
    browser.install(interp)
    # strip the Web Audio ctor: audioplayer must degrade, not die
    del interp.global_env.vars["window"]["AudioContext"]
    for name in ("api.js", "freqscale.js", "caches.js", "axes.js",
                 "viewport.js", "applogic.js", "audioplayer.js", "overview.js",
                 "app.js"):
        interp.load((VIEWER / "js" / name).read_text())
    sel = browser.doc["querySelector"]("#media-list")
    sel["value"] = str(media)
    browser.dispatch_event(sel, "change")
    assert session.settings_settled(timeout=180)
    session.tm.images.drain()

    _space(browser)
    assert session.player.state()["isPlaying"] is True
    assert not session.player.remote_attached()  # server-side path kept
    assert not browser.audio_contexts
    _space(browser)
    session.tm.images.shutdown()

def test_track_end_schedules_final_chunk_and_drains_tail(tmp_path):
    """End-of-track parity with the device callback's end-drain
    (stream.rs fill: ending at reached_end truncates audibly): the chunk
    flagged ended carries the LAST real frames and must be (a) scheduled
    and (b) left to play out — the poll-driven setPlaying(false) must not
    flush the scheduled tail (review finding: the old pump dropped the
    final chunk, then flushed ~0.35 s of tail)."""
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_f32

    rng = np.random.default_rng(7)
    n = int(SR * 0.3)  # 0.3 s: ends within a few pump bursts
    wav = rng.uniform(-0.5, 0.5, (1, n)).astype(np.float32)
    media = tmp_path / "short.wav"
    media.write_bytes(encode_wav_f32(wav, SR))
    session = EngineSession(settings_dir=tmp_path / "cfg")
    browser = FakeBrowser(
        session, (VIEWER / "index.html").read_text(), media_paths=[media]
    )
    interp = Interp()
    browser.install(interp)
    for name in ("api.js", "freqscale.js", "caches.js", "axes.js",
                 "viewport.js", "applogic.js", "audioplayer.js", "overview.js",
                 "app.js"):
        interp.load((VIEWER / "js" / name).read_text())
    sel = browser.doc["querySelector"]("#media-list")
    sel["value"] = str(media)
    browser.dispatch_event(sel, "change")
    assert session.settings_settled(timeout=180)
    session.tm.images.drain()

    _space(browser)
    # the first pump burst (4 pulls x 4096 frames) can consume the whole
    # 0.3 s track synchronously — isPlaying may already be false here
    assert browser.audio_contexts, "no AudioContext was created"
    ctx = browser.audio_contexts[-1]
    browser.advance(2000)  # pump to the end; polls deliver isPlaying=false

    assert session.player.state()["isPlaying"] is False  # track ran out
    sched = ctx["_scheduled"]
    assert sched, "nothing scheduled"
    # (a) every track frame was scheduled — the final (ended) chunk too;
    # the server zero-pads the final fill to the pull size, so scheduled
    # audio is the FULL track followed by silence
    total = int(sum(rec["frames"] for rec in sched))
    assert total >= n, f"scheduled {total} frames of {n}"
    mono = np.concatenate([_lanes_to_array(rec)[:, 0] for rec in sched])
    vol = np.float32(session.player.playback.volume)
    np.testing.assert_array_equal(mono[:n], np.clip(wav[0] * vol, -1.0, 1.0))
    assert not mono[n:].any(), "post-end padding must be silence"
    # (b) nothing was stop()ed: the tail drains, onended reaps naturally
    assert all(rec["stoppedAt"] is None for rec in sched)
    # and the pump stopped pulling (no busy-loop against an ended server)
    st = interp.global_env.vars["audio"]["_state"]
    assert st["running"] is False
    session.tm.images.shutdown()
