"""app.js boots and runs HEADLESSLY against a real EngineSession.

The final never-executed viewer layer: tests/fakedom.py provides the DOM +
a synchronous fetch bridge into the actual engine command registry, and
tests/jsinterp.py executes the real app.js/overview.js.  The flows driven
here are the reference's own core interactions (SURVEY §3.2/§3.3/§3.5):
add a track from the media list -> rows build -> metadata lands; wheel
gestures zoom/pan through the normalize pipeline; clicking a viewport sets
the player track; Space toggles playback; the control panel's win-ms knob
recomputes through set_spec_setting; animation frames drive the compositor
and fetch/draw REAL spectrogram tiles end-to-end.
"""

import pathlib

import numpy as np
import pytest

from tests.fakedom import FakeBrowser
from tests.jsinterp import Interp, UNDEF

VIEWER = pathlib.Path(__file__).resolve().parent.parent / "thesia_tpu" / "viewer"


@pytest.fixture(scope="module")
def booted(tmp_path_factory):
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_f32

    td = tmp_path_factory.mktemp("app_boot")
    rng = np.random.default_rng(5)
    wav = (rng.uniform(-0.7, 0.7, (2, 8000 * 2))).astype(np.float32)
    media = td / "boot_track.wav"
    media.write_bytes(encode_wav_f32(wav, 8000))

    session = EngineSession(settings_dir=td / "cfg")
    browser = FakeBrowser(
        session, (VIEWER / "index.html").read_text(), media_paths=[media]
    )
    interp = Interp()
    browser.install(interp)
    for name in ("api.js", "freqscale.js", "caches.js", "axes.js",
                 "viewport.js", "overview.js", "applogic.js", "app.js"):
        interp.load((VIEWER / "js" / name).read_text())
    yield interp, browser, session, str(media)
    session.tm.images.shutdown()


def g(interp):
    return interp.global_env.vars


def test_boot_initialized_engine_and_controls(booted):
    interp, browser, session, _media = booted
    state = g(interp)["state"]
    # boot ran: init() applied, controls restored, media list populated
    assert state["freqScale"] in ("Mel", "Linear")
    sel = browser.doc["querySelector"]("#media-list")
    assert len(sel["children"]) == 2  # placeholder + the server media file
    assert session.tile_cache.colormap_rgba is not None


def test_add_track_via_media_select(booted):
    interp, browser, session, media = booted
    sel = browser.doc["querySelector"]("#media-list")
    sel["value"] = media
    browser.dispatch_event(sel, "change")  # sel.onchange -> addPaths (real add)
    session.tm.images.drain()

    state = g(interp)["state"]
    rows = browser.doc["querySelector"]("#rows")["children"]
    assert len(rows) == 2  # stereo -> one row per channel
    assert rows[0]["dataset"]["idCh"] == "0_0"
    assert rows[1]["dataset"]["idCh"] == "0_1"
    # TrackSummary info rendered from real engine getters
    name_el = rows[0]["querySelector"](".track-name")
    assert "boot_track.wav" in name_el["textContent"]
    meta_el = rows[0]["querySelector"](".track-meta")
    assert "8 kHz" in meta_el["textContent"]
    stats_el = rows[0]["querySelector"](".track-stats")
    assert "LUFS" in stats_el["textContent"]
    # selection followed the add (useSelectedTracks.ts:77-80 semantics)
    assert state["selected"] == [0.0]
    assert rows[0]["classList"]["contains"]("selected")
    # viewport metadata landed from the real engine
    vp = interp._call_method(state["viewports"], "get", ["0_0"])
    assert vp["metadata"]["spectrogramWidth"] > 0
    assert state["maxSec"] == pytest.approx(2.0)


def test_wheel_gestures_zoom_and_pan(booted):
    interp, browser, _session, _media = booted
    state = g(interp)["state"]
    rows_el = browser.doc["querySelector"]("#rows")
    pps0, start0 = state["pxPerSec"], state["startSec"]
    # ctrl+shift+wheel = horizontal (time) zoom through the normalize
    # pipeline (classifyWheel: non-apple zoom, horizontal=shift)
    browser.dispatch_event(rows_el, "wheel", {
        "deltaX": 0.0, "deltaY": -120.0, "ctrlKey": True, "shiftKey": True,
        "clientX": 500.0, "clientY": 50.0,
    })
    assert state["pxPerSec"] != pps0
    # dx-dominant plain wheel = horizontal scroll (0.5*delta/pxPerSec),
    # clamped >= 0 by normalizeStartSec
    browser.dispatch_event(rows_el, "wheel", {
        "deltaX": 80.0, "deltaY": 1.0, "clientX": 500.0, "clientY": 50.0,
    })
    assert state["startSec"] >= 0.0
    # ctrl+wheel (no shift) = row-height zoom with scroll correction
    h0 = state["rowHeight"]
    browser.dispatch_event(rows_el, "wheel", {
        "deltaX": 0.0, "deltaY": -200.0, "ctrlKey": True,
        "clientX": 500.0, "clientY": 50.0,
    })
    assert state["rowHeight"] != h0
    assert "--row-h" in browser.doc["documentElement"]["style"]
    # restore a sane zoom for later tests
    g(interp)["setLens"]({"startSec": 0.0, "pxPerSec": 500.0})
    assert start0 >= 0.0


def test_viewport_click_selects_and_arms_player(booted):
    interp, browser, session, _media = booted
    rows = browser.doc["querySelector"]("#rows")["children"]
    vpc = rows[0]["querySelector"](".viewport")
    browser.dispatch_event(vpc, "click", {
        "offsetX": 50.0, "offsetY": 40.0, "target": vpc,
    })
    state = g(interp)["state"]
    assert state["selectedTrack"] == 0.0
    assert state["selectCursorSec"] is not UNDEF
    assert session.player.state()["trackId"] == 0


def test_space_toggles_playback(booted):
    interp, browser, session, _media = booted
    doc = browser.doc
    browser.dispatch_event(doc, "keydown", {
        "code": "Space", "key": " ", "target": {"tagName": "DIV"},
        "shiftKey": False, "metaKey": False, "ctrlKey": False,
    })
    assert session.player.state()["isPlaying"] is True
    browser.dispatch_event(doc, "keydown", {
        "code": "Space", "key": " ", "target": {"tagName": "DIV"},
        "shiftKey": False, "metaKey": False, "ctrlKey": False,
    })
    assert session.player.state()["isPlaying"] is False


def test_render_frames_fetch_and_draw_real_tiles(booted):
    interp, browser, _session, _media = booted
    state = g(interp)["state"]
    state["needsRedraw"] = True
    # frame 1 kicks tile fetches (synchronous through the bridge: decoded,
    # ImageData built, bitmap cached); frame 2 draws them
    browser.step_frames(2)
    spec_cache = g(interp)["specTileCache"]
    cached = interp._call_method(spec_cache["map"], "keys", [])
    assert cached, "no spectrogram tiles were fetched+cached"
    comp_ctx = browser.doc["querySelector"]("#compositor")["_ctx"]
    ops = [name for name, _ in comp_ctx["_ops"]]
    assert "clearRect" in ops and "clip" in ops
    assert "drawImage" in ops  # real tile bitmaps composited
    # time display rendered by the player extrapolation path
    td = browser.doc["querySelector"]("#time-display")
    assert len(td["textContent"]) == len("00:00:00.000")


def test_win_ms_knob_recomputes_through_engine(booted):
    interp, browser, session, _media = booted
    el = browser.doc["querySelector"]("#win-ms")
    el["value"] = "20"
    rev0 = session.tile_cache.spectrogram_revision
    browser.dispatch_event(el, "change")  # applySpec -> set_spec_setting
    session.tm.images.drain()
    assert session.tm.setting.win_ms == 20.0
    assert session.tile_cache.spectrogram_revision > rev0
    # the viewer refetched metadata for the new shape
    state = g(interp)["state"]
    vp = interp._call_method(state["viewports"], "get", ["0_0"])
    md = vp["metadata"]
    assert md["spectrogramWidth"] == session.tm.images.geometry(0)[1]


def test_remove_track_clears_rows(booted):
    interp, browser, session, _media = booted
    rows_el = browser.doc["querySelector"]("#rows")
    btn = rows_el["children"][0]["querySelector"](".track-remove")
    browser.dispatch_event(btn, "click", {"target": btn})
    assert rows_el["children"] == []
    assert g(interp)["state"]["selected"] == []
    assert session.tracklist.get(0) is None
