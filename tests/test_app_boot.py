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

import math
import pathlib

import numpy as np
import pytest

from tests.fakedom import FakeBrowser
from tests.jsinterp import Interp, UNDEF

VIEWER = pathlib.Path(__file__).resolve().parent.parent / "thesia_tpu" / "viewer"


@pytest.fixture(scope="module", params=["sync", "deferred"])
def booted(request, tmp_path_factory):
    """The whole interaction sweep runs TWICE: synchronous settings (the
    test default) and the production deferred default."""
    import os

    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_f32

    prev = os.environ.get("THESIA_DEFER_SETTINGS")
    os.environ["THESIA_DEFER_SETTINGS"] = "1" if request.param == "deferred" else "0"
    request.addfinalizer(
        lambda: os.environ.update({"THESIA_DEFER_SETTINGS": prev})
        if prev is not None else os.environ.pop("THESIA_DEFER_SETTINGS", None)
    )
    td = tmp_path_factory.mktemp(f"app_boot_{request.param}")
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
                 "viewport.js", "applogic.js", "audioplayer.js", "overview.js",
                 "app.js"):
        interp.load((VIEWER / "js" / name).read_text())
    yield interp, browser, session, str(media)
    session.tm.images.shutdown()


def g(interp):
    return interp.global_env.vars


def settle(session):
    """Both-mode synchronization: wait out any deferred settings switch,
    then drain the image streamer (no-ops in sync mode)."""
    assert session.settings_settled(timeout=180)
    session.tm.images.drain()


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
    settle(session)

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
    assert len(td["value"]) == len("00:00:00.000")


def test_win_ms_knob_recomputes_through_engine(booted):
    interp, browser, session, _media = booted
    el = browser.doc["querySelector"]("#win-ms")
    el["value"] = "20"
    rev0 = session.tile_cache.spectrogram_revision
    browser.dispatch_event(el, "change")  # applySpec -> set_spec_setting
    settle(session)
    assert session.tm.setting.win_ms == 20.0
    assert session.tile_cache.spectrogram_revision > rev0
    # the viewer adopts the new shape (deferred mode: via the computing
    # watchdog driven by the manual clock)
    state = g(interp)["state"]
    md = None
    for _ in range(12):
        vp = interp._call_method(state["viewports"], "get", ["0_0"])
        md = vp["metadata"]
        if md["spectrogramWidth"] == session.tm.images.geometry(0)[1]:
            break
        browser.advance(500)
    assert md["spectrogramWidth"] == session.tm.images.geometry(0)[1]


def test_remove_track_clears_rows(booted):
    interp, browser, session, _media = booted
    rows_el = browser.doc["querySelector"]("#rows")
    btn = rows_el["children"][0]["querySelector"](".track-remove")
    browser.dispatch_event(btn, "click", {"target": btn})
    assert rows_el["children"] == []
    assert g(interp)["state"]["selected"] == []
    assert session.tracklist.get(0) is None


def test_freq_axis_three_zone_drag(booted):
    """FreqAxis.tsx:30-168 semantics through the real DOM handlers: middle
    drag shifts the hz window; the shared window drag dispatcher routes
    mousemove/mouseup."""
    interp, browser, session, media = booted
    # ensure a track exists (suite order independence)
    if not browser.doc["querySelector"]("#rows")["children"]:
        sel = browser.doc["querySelector"]("#media-list")
        sel["value"] = media
        browser.dispatch_event(sel, "change")
    state = g(interp)["state"]
    state["hzRange"] = None
    row = browser.doc["querySelector"]("#rows")["children"][0]
    axis = row["querySelector"](".freq-axis")
    # middle third = shift zone (clientHeight 160 -> y 80)
    browser.dispatch_event(axis, "mousedown", {"offsetY": 80.0, "clientY": 80.0})
    browser.dispatch_event(browser.doc, "mousemove", {"clientY": 60.0})
    browser.dispatch_event(browser.doc, "mouseup", {})
    r1 = state["hzRange"]
    assert r1 is None or (isinstance(r1, list) and r1[0] >= 0.0)
    # top third rescales the UPPER limit
    state["hzRange"] = [0.0, 3000.0]
    browser.dispatch_event(axis, "mousedown", {"offsetY": 20.0, "clientY": 20.0})
    browser.dispatch_event(browser.doc, "mousemove", {"clientY": 60.0})
    browser.dispatch_event(browser.doc, "mouseup", {})
    r2 = state["hzRange"]
    assert r2 is None or r2[1] != 3000.0  # upper limit moved (or reset full)
    # right-click resets to the full range
    browser.dispatch_event(axis, "contextmenu", {})
    assert state["hzRange"] is None


def test_amp_axis_drag_rescales_interval(booted):
    interp, browser, _session, _media = booted
    state = g(interp)["state"]
    row = browser.doc["querySelector"]("#rows")["children"][0]
    tid = float(row["dataset"]["trackId"])
    axis = row["querySelector"](".amp-axis")
    # grab in the positive half and pull toward the top: interval shrinks
    browser.dispatch_event(axis, "mousedown", {"offsetY": 40.0, "clientY": 40.0})
    browser.dispatch_event(browser.doc, "mousemove", {"clientY": 20.0})
    browser.dispatch_event(browser.doc, "mouseup", {})
    rng = interp._call_method(state["ampRanges"], "get", [tid])
    assert isinstance(rng, list) and rng[0] == -rng[1]  # symmetric, rescaled
    assert rng[1] != 1.0
    browser.dispatch_event(axis, "contextmenu", {})  # reset
    assert interp._call_method(state["ampRanges"], "has", [tid]) is False


def test_multi_track_selection_pivot_flow(booted):
    """The ordered-pivot selection algorithm through the real track-info
    mousedown handlers (useSelectedTracks.ts semantics end-to-end)."""
    interp, browser, session, media = booted
    state = g(interp)["state"]
    # add the same file again via the media select: app dedupes by path ->
    # reload; so write a SECOND file instead
    import pathlib

    second = pathlib.Path(media).parent / "second.wav"
    if not second.exists():
        from thesia_tpu.io.wav import encode_wav_s16
        import numpy as np

        second.write_bytes(encode_wav_s16(
            np.zeros((1, 8000), np.float32) + 0.1, 8000))
    browser.media_paths.append(str(second))
    sel = browser.doc["querySelector"]("#media-list")
    sel["value"] = str(second)
    browser.dispatch_event(sel, "change")
    settle(session)
    rows = browser.doc["querySelector"]("#rows")["children"]
    tids = sorted({float(r["dataset"]["trackId"]) for r in rows})
    assert len(tids) == 2
    # the new add selected exactly the new track
    assert state["selected"] == [tids[1]]
    # plain click first track's info -> single select + pivot
    info0 = rows[0]["querySelector"](".track-info")
    browser.dispatch_event(info0, "mousedown", {
        "target": info0, "metaKey": False, "ctrlKey": False, "shiftKey": False,
    })
    assert state["selected"] == [tids[0]]
    # shift-click the other track extends from the pivot in display order
    last_info = [r for r in rows if float(r["dataset"]["trackId"]) == tids[1]][0][
        "querySelector"](".track-info")
    browser.dispatch_event(last_info, "mousedown", {
        "target": last_info, "metaKey": False, "ctrlKey": False, "shiftKey": True,
    })
    assert state["selected"] == [tids[0], tids[1]]
    # ctrl-click the first deselects it, pivot rules keep the other
    browser.dispatch_event(info0, "mousedown", {
        "target": info0, "metaKey": False, "ctrlKey": True, "shiftKey": False,
    })
    assert state["selected"] == [tids[1]]


def test_overview_lens_drag_moves_view(booted):
    interp, browser, _session, _media = booted
    state = g(interp)["state"]
    browser.step_frames(1)  # draw() records the lens geometry
    ov = browser.doc["querySelector"]("#overview")
    start0 = state["startSec"]
    # grab outside the lens -> centers the lens on the cursor
    browser.dispatch_event(ov, "mousedown", {"clientX": 800.0, "clientY": 20.0})
    browser.dispatch_event(browser.doc, "mouseup", {})
    assert state["startSec"] != start0 or state["startSec"] >= 0.0


def test_deferred_switch_watchdog_adopts_new_revision(booted, monkeypatch):
    """Production deferred mode end-to-end in the headless app: the knob
    returns immediately, the viewport's computing poll (driven by the
    manual clock) adopts the new revision when the switch lands."""
    interp, browser, session, media = booted
    monkeypatch.setenv("THESIA_DEFER_SETTINGS", "1")
    state = g(interp)["state"]
    rows_el = browser.doc["querySelector"]("#rows")
    if not rows_el["children"]:  # the remove test may have run before us
        sel = browser.doc["querySelector"]("#media-list")
        sel["value"] = media
        browser.dispatch_event(sel, "change")
        settle(session)
    id_ch = rows_el["children"][0]["dataset"]["idCh"]
    vp = interp._call_method(state["viewports"], "get", [id_ch])
    rev0 = vp["metadata"]["spectrogramRevision"]
    el = browser.doc["querySelector"]("#win-ms")
    el["value"] = "80"
    browser.dispatch_event(el, "change")  # deferred: returns at dispatch
    assert session.settings_settled(timeout=120)
    settle(session)
    # drive the watchdog timers until the row adopts the new revision
    for _ in range(12):
        browser.advance(500)
        vp = interp._call_method(state["viewports"], "get", [id_ch])
        if vp["metadata"]["spectrogramRevision"] > rev0 and not vp["metadata"]["isComputing"]:
            break
    assert vp["metadata"]["spectrogramRevision"] > rev0
    assert vp["metadata"]["isComputing"] is False
    assert session.tm.setting.win_ms == 80.0


def _ensure_two_tracks(booted):
    interp, browser, session, media = booted
    rows_el = browser.doc["querySelector"]("#rows")
    import pathlib

    second = pathlib.Path(media).parent / "second.wav"
    if not second.exists():
        from thesia_tpu.io.wav import encode_wav_s16

        second.write_bytes(encode_wav_s16(
            np.zeros((1, 8000), np.float32) + 0.1, 8000))
    for path in (media, str(second)):
        if not any(
            r["querySelector"](".track-name")["textContent"].startswith(
                pathlib.Path(path).name.split(".")[0][:5])
            for r in rows_el["children"]
        ):
            if path not in browser.media_paths:
                browser.media_paths.append(path)
            sel = browser.doc["querySelector"]("#media-list")
            sel["value"] = path
            browser.dispatch_event(sel, "change")
    settle(session)
    return rows_el


def test_dnd_reorder_permutes_display_order(booted):
    """Track DnD through the real dragstart/dragover/drop handlers
    (reference: MainViewer track DnD): all of a track's channel rows move
    together and state.trackIds re-derives from the DOM order."""
    interp, browser, _session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    order0 = [r["dataset"]["trackId"] for r in rows_el["children"]]
    first_tid = order0[0]
    last_row = rows_el["children"][-1]
    handle = rows_el["children"][0]["querySelector"](".track-info")
    dt = {"effectAllowed": "", "setData": lambda *a: None, "types": [], "files": []}
    browser.dispatch_event(handle, "dragstart", {"dataTransfer": dt})
    # drop BELOW the last row (clientY under its midpoint)
    rect = last_row["getBoundingClientRect"]()
    browser.dispatch_event(last_row, "dragover", {
        "clientY": rect["top"] + 150.0, "dataTransfer": dt,
    })
    browser.dispatch_event(last_row, "drop", {
        "clientY": rect["top"] + 150.0, "dataTransfer": dt,
    })
    browser.dispatch_event(handle, "dragend", {})
    order1 = [r["dataset"]["trackId"] for r in rows_el["children"]]
    assert order1 != order0
    assert order1[-1] == first_tid  # dragged track's rows moved to the end
    # channel rows stayed adjacent and trackIds re-derived from DOM order
    tids = [int(t) for t in g(interp)["state"]["trackIds"]]
    seen = []
    for t in order1:
        if int(float(t)) not in seen:
            seen.append(int(float(t)))
    assert tids == seen
    assert state["trackIds"][-1] == float(int(float(first_tid)))


def _ensure_third_track(booted):
    interp, browser, session, media = booted
    rows_el = _ensure_two_tracks(booted)
    import pathlib

    third = pathlib.Path(media).parent / "third.wav"
    if not third.exists():
        from thesia_tpu.io.wav import encode_wav_s16
        import numpy as np

        third.write_bytes(encode_wav_s16(
            np.zeros((1, 8000), np.float32) + 0.2, 8000))
    if not any(
        "third" in r["querySelector"](".track-name")["textContent"]
        for r in rows_el["children"]
    ):
        browser.media_paths.append(str(third))
        sel = browser.doc["querySelector"]("#media-list")
        sel["value"] = str(third)
        browser.dispatch_event(sel, "change")
        settle(session)
    return rows_el


def _track_order(rows_el):
    seen = []
    for r in rows_el["children"]:
        t = int(float(r["dataset"]["trackId"]))
        if t not in seen:
            seen.append(t)
    return seen


def _row_of(rows_el, tid):
    return [
        r for r in rows_el["children"]
        if int(float(r["dataset"]["trackId"])) == tid
    ][0]


def test_group_drag_moves_whole_selection(booted):
    """Dragging a row of a multi-selection moves the WHOLE selection: the
    other selected rows collapse during the drag and re-emerge right below
    the dragged track on release, in selection order (reference
    TrackInfo.tsx:161-185 hideTracks/showHiddenTracks + useTracks.ts:166-192);
    dragging a non-selected row first resets the selection to it
    (TrackInfo.tsx:168)."""
    interp, browser, session, _media = booted
    rows_el = _ensure_third_track(booted)
    state = g(interp)["state"]
    a, b, c = _track_order(rows_el)  # a = stereo boot track (2 rows)

    # select b then ctrl-click a -> ordered selection [b, a]
    info_b = _row_of(rows_el, b)["querySelector"](".track-info")
    browser.dispatch_event(info_b, "mousedown", {
        "target": info_b, "metaKey": False, "ctrlKey": False, "shiftKey": False,
    })
    info_a = _row_of(rows_el, a)["querySelector"](".track-info")
    browser.dispatch_event(info_a, "mousedown", {
        "target": info_a, "metaKey": False, "ctrlKey": True, "shiftKey": False,
    })
    assert [int(x) for x in state["selected"]] == [b, a]

    # drag a's first row: b's row collapses and the badge counts 2
    row_a = _row_of(rows_el, a)
    handle = row_a["querySelector"](".track-info")
    dt = {"effectAllowed": "", "setData": lambda *x: None, "types": [], "files": []}
    browser.dispatch_event(handle, "dragstart", {"dataTransfer": dt})
    row_b = _row_of(rows_el, b)
    assert "drag-hidden" in row_b["_classes"]
    assert row_a["dataset"]["dragCount"] == "2"

    # drop BELOW c's row, then dragend: a's rows land after c, b follows a
    row_c = _row_of(rows_el, c)
    rect = row_c["getBoundingClientRect"]()
    browser.dispatch_event(row_c, "dragover", {
        "clientY": rect["top"] + 150.0, "dataTransfer": dt,
    })
    browser.dispatch_event(row_c, "drop", {
        "clientY": rect["top"] + 150.0, "dataTransfer": dt,
    })
    browser.dispatch_event(handle, "dragend", {})
    assert _track_order(rows_el) == [c, a, b]
    assert [int(x) for x in state["trackIds"]] == [c, a, b]
    assert "dragCount" not in row_a["dataset"]
    assert not any("drag-hidden" in r["_classes"] for r in rows_el["children"])
    # a's channel rows stayed adjacent
    tids_seq = [int(float(r["dataset"]["trackId"])) for r in rows_el["children"]]
    first_a = tids_seq.index(a)
    assert tids_seq[first_a:first_a + tids_seq.count(a)] == [a] * tids_seq.count(a)

    # a CANCELLED group drag still reinserts the hidden rows right below the
    # dragged track (useDrag end() always runs showHiddenTracks)
    browser.dispatch_event(
        _row_of(rows_el, c)["querySelector"](".track-info"), "mousedown", {
            "target": _row_of(rows_el, c)["querySelector"](".track-info"),
            "metaKey": False, "ctrlKey": False, "shiftKey": False,
        })
    info_a2 = _row_of(rows_el, a)["querySelector"](".track-info")
    browser.dispatch_event(info_a2, "mousedown", {
        "target": info_a2, "metaKey": False, "ctrlKey": True, "shiftKey": False,
    })  # selection [c, a]
    handle_a = _row_of(rows_el, a)["querySelector"](".track-info")
    browser.dispatch_event(handle_a, "dragstart", {"dataTransfer": dt})
    browser.dispatch_event(handle_a, "dragend", {})
    assert _track_order(rows_el) == [a, c, b]

    # dragging a NON-selected row resets the selection to that track
    handle_b = _row_of(rows_el, b)["querySelector"](".track-info")
    browser.dispatch_event(handle_b, "dragstart", {"dataTransfer": dt})
    assert [int(x) for x in state["selected"]] == [b]
    browser.dispatch_event(handle_b, "dragend", {})
    assert _track_order(rows_el) == [a, c, b]  # nothing moved


def test_freq_axis_floating_input_commits_via_axis_api(booted):
    """Double-click the freq axis top third -> floating input -> Enter:
    the committed label parses through the real freq_label_to_hz command
    (axis.rs freqLabelToHz semantics: '1k5' = 1500 Hz)."""
    interp, browser, _session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    state["hzRange"] = None
    axis = rows_el["children"][0]["querySelector"](".freq-axis")
    browser.dispatch_event(axis, "dblclick", {
        "offsetY": 10.0, "clientX": 30.0, "clientY": 10.0,
    })
    body = browser.doc["body"]
    inp = body["children"][-1]
    assert inp["tagName"] == "INPUT"
    inp["value"] = "1k5"
    browser.dispatch_event(inp, "keydown", {"key": "Enter"})
    assert state["hzRange"] is not None
    assert state["hzRange"][1] == pytest.approx(1500.0)
    state["hzRange"] = None


def test_locator_drags_select_paused_scrub_playing(booted):
    """reference MainViewer.tsx:491-513,635-667: a paused drag grabs the
    dashed SELECT locator (the real player does not move); a playing drag
    grabs the playhead and scrub-seeks the real player.  The click the
    browser fires after mouseup is suppressed in both cases."""
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    # scrub on the 2-second stereo track (the 1 s track would clamp the
    # 1.4 s seek target to its end)
    row = [
        r for r in rows_el["children"]
        if "boot_track" in r["querySelector"](".track-name")["textContent"]
    ][0]
    tid = int(float(row["dataset"]["trackId"]))
    vpc = row["querySelector"](".viewport")
    # select + place the select cursor on this track at a known position
    browser.dispatch_event(vpc, "click", {"offsetX": 10.0, "offsetY": 40.0, "target": vpc})
    g(interp)["setLens"]({"startSec": 0.0, "pxPerSec": 100.0})
    # setLens NORMALIZES (can't zoom out past fit): read back the real zoom
    pps = state["pxPerSec"]
    start = state["startSec"]
    state["selectCursorSec"] = 1.0
    p0 = session.player.state()["positionSec"]
    x = (1.0 - start) * pps  # the select locator's pixel position
    browser.dispatch_event(vpc, "mousedown", {
        "offsetX": x, "clientX": x, "clientY": 40.0, "target": vpc,
    })
    target_x = x + 0.4 * pps  # drag the cursor +0.4 s
    browser.dispatch_event(browser.doc, "mousemove", {"clientX": target_x})
    browser.dispatch_event(browser.doc, "mouseup", {"clientX": target_x})
    assert state["selectCursorSec"] == pytest.approx(1.4, abs=0.01)
    # paused drags never seek the real player
    assert session.player.state()["positionSec"] == pytest.approx(p0, abs=1e-6)
    # the click the browser fires after mouseup is suppressed (the cursor
    # stays where the drag left it)
    browser.dispatch_event(vpc, "click", {"offsetX": 700.0, "offsetY": 40.0, "target": vpc})
    assert state["selectCursorSec"] == pytest.approx(1.4, abs=0.01)
    assert state["selectedTrack"] == float(tid)

    # playing: grab the playhead and scrub — the REAL player seeks
    _key(browser, "Space", key=" ")  # plays from the select cursor (1.4 s)
    assert session.player.state()["isPlaying"] is True
    pos = float(session.player.state()["positionSec"])
    state["playerAnchor"] = {
        "positionSec": pos, "at": browser.now_ms, "isPlaying": True,
    }
    x = (pos - start) * pps
    browser.dispatch_event(vpc, "mousedown", {
        "offsetX": x, "clientX": x, "clientY": 40.0, "target": vpc,
    })
    # drag the playhead BACK to 0.5 s (scrubbing toward the end would race
    # the real-time playback into end-of-track before the assertions run)
    target_x = (0.5 - start) * pps
    browser.dispatch_event(browser.doc, "mousemove", {"clientX": target_x})
    browser.dispatch_event(browser.doc, "mouseup", {"clientX": target_x})
    assert session.player.state()["positionSec"] == pytest.approx(0.5, abs=0.1)
    browser.dispatch_event(vpc, "click", {"offsetX": 700.0, "offsetY": 40.0, "target": vpc})
    assert session.player.state()["positionSec"] == pytest.approx(0.5, abs=0.2)
    _key(browser, "Space", key=" ")  # back to paused for later module tests
    assert session.player.state()["isPlaying"] is False


def test_normalize_and_guard_controls_update_row_stats(booted):
    """Control-panel normalize + guard flow end-to-end: the real engine
    applies gain + limiter, and rebuildAllRowInfo re-renders the
    TrackSummary guard string (reference Control.tsx -> useTracks setters
    -> TrackSummary.tsx)."""
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    stats0 = [
        r["querySelector"](".track-stats")["textContent"]
        for r in rows_el["children"]
    ]
    norm_type = browser.doc["querySelector"]("#norm-type")
    norm_type["value"] = "LUFS"
    browser.dispatch_event(norm_type, "change")  # restores the -18 memory
    target = browser.doc["querySelector"]("#norm-target")
    # +6 LUFS guarantees gain > 1 for any fixture mix, so the limiter
    # engages regardless of which earlier module tests added tracks.
    # Reference order: pick the family first, then move the slider.
    target["value"] = "6"
    browser.dispatch_event(target, "change")
    guard = browser.doc["querySelector"]("#guard-mode")
    guard["value"] = "Limiter"
    browser.dispatch_event(guard, "change")
    browser.advance(300)  # fire the 250 ms normalize/guard debounces
    settle(session)
    # the engine really normalized + limited
    assert session.tracklist.common_normalize.to_json()["type"] == "LUFS"
    assert session.tracklist.common_guard_clipping.value == "Limiter"
    stats1 = [
        r["querySelector"](".track-stats")["textContent"]
        for r in rows_el["children"]
    ]
    assert stats1 != stats0
    assert any("reduced by" in s for s in stats1)  # limiter guard string
    # back off: normalize Off restores clean stats
    norm_type["value"] = "Off"
    browser.dispatch_event(norm_type, "change")
    browser.advance(300)
    settle(session)
    assert session.tracklist.common_normalize.to_json()["type"] == "Off"


def test_db_range_and_blend_sliders(booted):
    interp, browser, session, _media = booted
    _ensure_two_tracks(booted)
    el = browser.doc["querySelector"]("#db-range")
    el["value"] = "70"
    browser.dispatch_event(el, "input")
    assert browser.doc["querySelector"]("#db-range-val")["value"] == "70"
    browser.dispatch_event(el, "change")
    browser.advance(50)  # flush the per-frame throttle's trailing call
    settle(session)
    assert session.tm.db_range == 70.0
    blend = browser.doc["querySelector"]("#blend")
    blend["value"] = "0.8"
    browser.dispatch_event(blend, "input")
    assert g(interp)["state"]["blend"] == 0.8
    # the debounced persist timer fires on the manual clock
    browser.advance(600)
    stored = session._load_store("settings.json")
    assert stored.get("blend") == 0.8
    # restore
    el["value"] = "100"
    browser.dispatch_event(el, "change")
    browser.advance(50)
    settle(session)


def test_db_range_drag_is_light_until_drag_end(booted):
    """During a slider drag (input events) only the throttled setDbRange +
    metadata/colorbar refresh runs — the reference throttles just
    setdBRange (Control.tsx:95); the expensive persist + full refreshAll
    (apply_track_list_changes, forced overview waveform refetch) lands
    exactly once at drag end (change event).  Overlapping full refresh
    chains at 70 Hz flooded the engine (review finding)."""
    interp, browser, session, _media = booted
    _ensure_two_tracks(booted)
    el = browser.doc["querySelector"]("#db-range")
    browser.fetch_log.clear()
    # a drag burst: input events across several throttle windows
    for v in ("118", "112", "104", "98", "92", "85"):
        el["value"] = v
        browser.dispatch_event(el, "input")
        browser.advance(20)
    browser.advance(100)  # flush the throttle's trailing call
    settle(session)
    drag_log = list(browser.fetch_log)
    assert "/api/set_dB_range" in drag_log
    assert session.tm.db_range == 85.0  # latest drag value won
    # the heavy path stayed out of the drag
    assert "/api/apply_track_list_changes" not in drag_log
    assert "/api/set_user_settings" not in drag_log
    assert not any(u.startswith("/api/get_waveform_tile") for u in drag_log)
    # the light refresh DID keep the viewer current
    assert any(u.startswith("/api/get_audio_render_metadata") for u in drag_log)
    # drag end: one full commit (persist + refreshAll)
    browser.fetch_log.clear()
    el["value"] = "100"
    browser.dispatch_event(el, "change")
    browser.advance(100)
    settle(session)
    end_log = list(browser.fetch_log)
    assert session.tm.db_range == 100.0
    assert end_log.count("/api/apply_track_list_changes") == 1
    assert "/api/set_user_settings" in end_log


def _key(browser, code, key=None, **mods):
    ev = {"code": code, "key": key or code, "target": {"tagName": "DIV"},
          "shiftKey": False, "metaKey": False, "ctrlKey": False}
    ev.update(mods)
    browser.dispatch_event(browser.doc, "keydown", ev)


def test_hotkeys_zoom_jump_and_rewind(booted):
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    pps0 = state["pxPerSec"]
    _key(browser, "Equal", key="+")
    zoomed = state["pxPerSec"]
    assert zoomed >= pps0  # x1.5 through the normalize pipeline
    _key(browser, "Minus", key="-")
    assert state["pxPerSec"] <= zoomed
    # paused, comma/period move the SELECT cursor — the real player must not
    # move (usePlayer.ts:141-147 select-vs-playback cursor); use the
    # 2-second track so +1 s isn't clamped
    row = [
        r for r in rows_el["children"]
        if "boot_track" in r["querySelector"](".track-name")["textContent"]
    ][0]
    vpc = row["querySelector"](".viewport")
    browser.dispatch_event(vpc, "click", {"offsetX": 0.0, "offsetY": 40.0, "target": vpc})
    p0 = session.player.state()["positionSec"]
    sel0 = state["selectCursorSec"]
    _key(browser, "Period", key=".")
    assert state["selectCursorSec"] == pytest.approx(
        min(sel0 + 1.0, state["maxSec"])
    )
    assert session.player.state()["positionSec"] == pytest.approx(p0, abs=1e-6)
    _key(browser, "Comma", key=",")
    assert state["selectCursorSec"] == pytest.approx(sel0)
    # Enter rewinds the select cursor to the front (usePlayer.ts:181-185)
    _key(browser, "Enter", key="Enter")
    assert state["selectCursorSec"] == 0.0
    # playing: space starts from the select cursor, period seeks the REAL
    # player by +1 s (usePlayer.ts:112-118,141-147)
    _key(browser, "Space", key=" ")
    assert session.player.state()["isPlaying"] is True
    _key(browser, "Period", key=".")
    _key(browser, "Space", key=" ")
    pos = session.player.state()["positionSec"]
    sec = session.tracklist[int(state["selectedTrack"])].sec
    assert 0.95 <= pos <= min(1.5, sec) + 1e-6
    # rewind-to-front while stopped leaves the player where it is but the
    # cursor at 0, so the next play restarts from the front
    _key(browser, "Enter", key="Enter")
    assert state["selectCursorSec"] == 0.0


def test_failed_add_shows_error_box(booted):
    interp, browser, _session, _media = booted
    browser.media_paths.append("/nonexistent/missing.wav")
    sel = browser.doc["querySelector"]("#media-list")
    sel["value"] = "/nonexistent/missing.wav"
    browser.dispatch_event(sel, "change")
    box = browser.doc["querySelector"]("#error-box")
    msgs = [c["textContent"] for c in box["children"]]
    assert any("Could not open" in m for m in msgs)
    # no ghost row appeared
    rows = browser.doc["querySelector"]("#rows")["children"]
    assert all(r["dataset"].get("idCh") for r in rows)


def test_context_menu_select_all_and_remove(booted):
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    row = rows_el["children"][0]
    browser.dispatch_event(row, "contextmenu", {
        "clientX": 100.0, "clientY": 100.0, "target": row,
    })
    menu = [c for c in browser.doc["body"]["children"]
            if c.get("className") == "context-menu"]
    assert menu, "context menu did not open"
    items = {c["textContent"]: c for c in menu[0]["children"]
             if c.get("className") == "context-item"}
    assert "Select all" in items
    browser.dispatch_event(items["Select all"], "mousedown", {"target": items["Select all"]})
    assert len(state["selected"]) == len({
        r["dataset"]["trackId"] for r in rows_el["children"]
    })
    # delete-key removes the whole selection through the real engine
    _key(browser, "Delete", key="Delete")
    assert rows_el["children"] == []
    assert session.tracklist.all_ids() == []
    assert state["selected"] == []


def test_reload_button_paths(booted):
    """Reload-from-disk: unchanged file -> clean no-op; unreadable file ->
    per-row errored overlay (reference useTracks.ts:122-133 erroredTrackIds,
    MainViewer.tsx:1149-1163 ErrorBox overlay)."""
    interp, browser, session, media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    row = rows_el["children"][0]
    btn = row["querySelector"](".track-reload")
    tid = int(float(row["dataset"]["trackId"]))
    # unchanged file: reload is a clean no-op (track.rs:75-89 detect)
    browser.dispatch_event(btn, "click", {"target": btn})
    assert not row["querySelector"](".track-error")
    assert float(tid) not in list(state["erroredTracks"])
    # unreadable file: the per-row errored overlay appears
    import pathlib

    path = pathlib.Path(session.get_path(tid))
    original = path.read_bytes()
    try:
        path.write_bytes(b"garbage")
        browser.dispatch_event(btn, "click", {"target": btn})
        assert row["querySelector"](".track-error")
        assert float(tid) in list(state["erroredTracks"])
    finally:
        path.write_bytes(original)
    # with the file restored, reload clears the errored state
    browser.dispatch_event(btn, "click", {"target": btn})
    assert not row["querySelector"](".track-error")
    assert float(tid) not in list(state["erroredTracks"])
    settle(session)


def test_fit_follow_volume_and_metrics_panel(booted):
    interp, browser, session, _media = booted
    _ensure_two_tracks(booted)
    state = g(interp)["state"]
    fit = browser.doc["querySelector"]("#btn-fit")
    browser.dispatch_event(fit, "click", {"target": fit})
    assert state["fitMode"] is True
    assert state["startSec"] == 0.0
    # a zoom leaves fit mode
    browser.dispatch_event(browser.doc["querySelector"]("#rows"), "wheel", {
        "deltaX": 0.0, "deltaY": -120.0, "ctrlKey": True, "shiftKey": True,
        "clientX": 500.0, "clientY": 50.0,
    })
    assert state["fitMode"] is False
    follow = browser.doc["querySelector"]("#btn-follow")
    was = state["followPlayhead"]
    browser.dispatch_event(follow, "click", {"target": follow})
    assert state["followPlayhead"] is not was
    browser.dispatch_event(follow, "click", {"target": follow})
    vol = browser.doc["querySelector"]("#volume")
    vol["value"] = "-12"
    browser.dispatch_event(vol, "input")
    assert session.player.playback.volume == pytest.approx(10 ** (-12 / 20))
    # metrics panel toggles and renders /debug/metrics through the bridge
    toggle = browser.doc["querySelector"]("#metrics-toggle")
    panel = browser.doc["querySelector"]("#metrics-panel")
    browser.dispatch_event(toggle, "click", {"target": toggle})
    assert panel["hidden"] is False
    # the REAL /debug/metrics render (Object.entries + template newlines +
    # JSON.stringify all execute): the missing Object builtin previously
    # dropped this whole path into the catch's placeholder and the test
    # passed vacuously (harness review finding)
    text = panel["textContent"]
    assert text and text != "(metrics unavailable)"
    assert "shape_warmer" in text and "compiled" in text
    assert "\n" in text  # template `\n` is a real newline
    browser.dispatch_event(toggle, "click", {"target": toggle})
    assert panel["hidden"] is True


def test_viewport_tooltip_renders_time_and_freq(booted):
    """The hover tooltip's throttled fetch chain runs the REAL axis-api
    formatters (format_time_axis_tooltip, freq_pos_to_hz,
    format_frequency_axis_tooltip)."""
    interp, browser, _session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    row = rows_el["children"][0]
    vpc = row["querySelector"](".viewport")
    browser.dispatch_event(vpc, "mousemove", {
        "offsetX": 100.0, "offsetY": 40.0, "clientX": 100.0, "clientY": 40.0,
        "target": vpc,
    })
    browser.advance(150)  # fire the 100 ms tooltip throttle
    tips = [c for c in browser.doc["body"]["children"]
            if ":" in (c["textContent"] or "") and "Hz" in (c["textContent"] or "")]
    assert tips, "tooltip content did not render"
    # leaving the viewport hides it
    browser.dispatch_event(vpc, "mouseleave", {"target": vpc})
    assert tips[0]["style"].get("display") == "none"


def test_overview_lens_edge_resize_zooms(booted):
    """Lens edge drag through the real Overview handlers -> the
    resizeLensLeft/Right normalize pipeline (Overview.tsx:158-183 +
    MainViewer.tsx:399-412)."""
    interp, browser, _session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    # pin the overview onto the 2 s boot_track: the strip's hit-test scale is
    # the SELECTED track's length (Overview.tsx pxPerSec = width/trackSec),
    # so the lens math below must not depend on module selection history
    info = [
        r for r in rows_el["children"]
        if "boot_track" in r["querySelector"](".track-name")["textContent"]
    ][0]["querySelector"](".track-info")
    browser.dispatch_event(info, "mousedown", {
        "target": info, "metaKey": False, "ctrlKey": False, "shiftKey": False,
    })
    g(interp)["setLens"]({"startSec": 0.2, "pxPerSec": 1000.0})
    # pin the select cursor inside the new view with no pending delta —
    # otherwise the frame step below runs the paused select-cursor
    # auto-scroll (MainViewer.tsx:864-871) and moves the lens under the test
    state["selectCursorSec"] = 0.25
    state["prevSelectSec"] = 0.25
    state["needsRedraw"] = True
    browser.step_frames(1)  # draw() records lens geometry for hit testing
    ov_el = browser.doc["querySelector"]("#overview")
    ov = g(interp)["overview"]
    lens = ov["_lens"]
    px_per_sec = 1000.0 / max(ov["metadata"]["trackSec"], 1e-8)  # strip scale
    left_x = round(lens["startSec"] * px_per_sec)
    pps0 = state["pxPerSec"]
    browser.dispatch_event(ov_el, "mousedown", {
        "clientX": float(left_x), "clientY": 20.0,
    })
    browser.dispatch_event(browser.doc, "mousemove", {"clientX": float(left_x) + 60.0})
    browser.dispatch_event(browser.doc, "mouseup", {})
    assert state["pxPerSec"] != pps0  # left-edge drag rezoomed the view


def test_amp_axis_floating_input_and_alt_interactions(booted):
    interp, browser, _session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    row = rows_el["children"][0]
    tid = float(int(float(row["dataset"]["trackId"])))
    axis = row["querySelector"](".amp-axis")
    # double-click -> floating input -> commit 0.5 => symmetric [-0.5, 0.5]
    browser.dispatch_event(axis, "dblclick", {
        "offsetY": 40.0, "clientX": 20.0, "clientY": 40.0,
    })
    inp = browser.doc["body"]["children"][-1]
    assert inp["tagName"] == "INPUT"
    inp["value"] = "0.5"
    browser.dispatch_event(inp, "keydown", {"key": "Enter"})
    rng = interp._call_method(state["ampRanges"], "get", [tid])
    assert rng == [-0.5, 0.5]
    # alt+wheel zooms the interval around zero (AmpAxis.tsx:98-108)
    browser.dispatch_event(axis, "wheel", {
        "altKey": True, "deltaX": 0.0, "deltaY": -500.0,
    })
    rng2 = interp._call_method(state["ampRanges"], "get", [tid])
    assert rng2 == [-1.0, 1.0]  # interval doubled
    # alt+click resets
    browser.dispatch_event(axis, "click", {"altKey": True})
    assert interp._call_method(state["ampRanges"], "has", [tid]) is False
    # freq axis alt+wheel rescales the upper limit (FreqAxis.tsx:178-195)
    state["hzRange"] = None
    faxis = row["querySelector"](".freq-axis")
    browser.dispatch_event(faxis, "wheel", {
        "altKey": True, "deltaX": 0.0, "deltaY": 250.0,
    })
    assert state["hzRange"] is not None and state["hzRange"][1] < state["maxTrackHz"]
    browser.dispatch_event(faxis, "click", {"altKey": True})
    assert state["hzRange"] is None


def test_follow_playhead_scrolls_during_playback(booted):
    """MainViewer.tsx:853-862 through the live frame loop: while playing
    with follow on, a playhead outside the view snaps startSec to it."""
    interp, browser, session, _media = booted
    _ensure_two_tracks(booted)
    state = g(interp)["state"]
    g(interp)["setLens"]({"startSec": 0.0, "pxPerSec": 5000.0})  # tiny view
    # order matters: setLens while playing clears needFollowCursor (the
    # user-pan override), so arm the follow state AFTER zooming
    state["followPlayhead"] = True
    state["needFollowCursor"] = True
    state["playing"] = True
    view_sec = 1000.0 / state["pxPerSec"]
    state["playerAnchor"] = {
        "positionSec": 1.5, "at": browser.now_ms, "isPlaying": True,
    }
    browser.step_frames(1)
    # playhead (1.5 s) was outside [0, view_sec] -> view snapped to it
    assert state["startSec"] == pytest.approx(1.5, abs=view_sec)
    state["playing"] = False
    state["playerAnchor"] = {"positionSec": 0.0, "at": browser.now_ms, "isPlaying": False}


def test_window_file_drop_uploads_and_adds(booted):
    """The window drop flow end-to-end: fake File -> FormData -> the upload
    bridge stores it server-side -> addPaths opens it through the real
    engine (reference: App.tsx addDroppedFile + /upload round trip)."""
    import numpy as np

    from thesia_tpu.io.wav import encode_wav_s16

    interp, browser, session, _media = booted
    data = encode_wav_s16(
        0.2 * np.ones((1, 4000), np.float32), 8000
    )
    fake_file = {"name": "dropped.wav", "bytes": data}
    n_before = len(session.tracklist.all_ids())
    browser.dispatch_event(browser.doc, "drop", {
        "dataTransfer": {"files": [fake_file], "types": ["Files"]},
    })
    settle(session)
    ids = session.tracklist.all_ids()
    assert len(ids) == n_before + 1
    new_id = ids[-1]
    assert "dropped" in session.get_file_name(new_id)
    rows = browser.doc["querySelector"]("#rows")["children"]
    assert any(
        "dropped" in r["querySelector"](".track-name")["textContent"]
        for r in rows
    )


def test_streaming_track_serves_tiles_through_the_app(tmp_path, monkeypatch):
    """The round-3/4 streaming UX headlessly: while a track's image is
    still streaming (gated), the app's draw loop fetches tiles that are
    served from device regions (viewport-priority path), metadata reports
    isComputing, and after the stream lands the SAME keys serve from host
    with the app none the wiser."""
    import threading

    import numpy as np

    from tests.fakedom import FakeBrowser
    from tests.jsinterp import Interp
    from thesia_tpu.engine import images as I
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.io.wav import encode_wav_s16

    monkeypatch.setattr(I, "STREAM_CHUNK_BYTES", 1024 * 64)
    gate = threading.Event()
    entered = threading.Event()
    orig_yield = I.SpecImageStore._yield_to_interactive

    def gated_yield(self):
        entered.set()
        assert gate.wait(30)
        orig_yield(self)

    monkeypatch.setattr(I.SpecImageStore, "_yield_to_interactive", gated_yield)

    media = tmp_path / "long_stream.wav"
    wav = (0.3 * np.sin(
        2 * np.pi * 440.0 * np.arange(8000 * 30) / 8000
    )).astype(np.float32)[None, :]
    media.write_bytes(encode_wav_s16(wav, 8000))
    session = EngineSession(settings_dir=tmp_path / "cfg")
    browser = FakeBrowser(
        session, (VIEWER / "index.html").read_text(), media_paths=[media]
    )
    interp = Interp()
    browser.install(interp)
    try:
        for name in ("api.js", "freqscale.js", "caches.js", "axes.js",
                     "viewport.js", "applogic.js", "audioplayer.js", "overview.js",
                     "app.js"):
            interp.load((VIEWER / "js" / name).read_text())
        sel = browser.doc["querySelector"]("#media-list")
        sel["value"] = str(media)
        browser.dispatch_event(sel, "change")
        assert entered.wait(30)  # streamer mid-flight, gated
        state = g(interp)["state"]
        vp = interp._call_method(state["viewports"], "get", ["0_0"])
        assert vp["metadata"]["isComputing"] is True
        # the app draws NOW: tiles come from device regions
        state["needsRedraw"] = True
        browser.step_frames(2)
        spec_cache = g(interp)["specTileCache"]
        keys_mid = list(interp._call_method(spec_cache["map"], "keys", []))
        assert keys_mid, "no tiles served mid-stream"
        comp_ctx = browser.doc["querySelector"]("#compositor")["_ctx"]
        assert any(name == "drawImage" for name, _ in comp_ctx["_ops"])
        # release the stream; the watchdog flips isComputing off
        gate.set()
        assert session.settings_settled(timeout=60)
        session.tm.images.drain()
        for _ in range(12):
            browser.advance(500)
            vp = interp._call_method(state["viewports"], "get", ["0_0"])
            if vp["metadata"]["isComputing"] is False:
                break
        assert vp["metadata"]["isComputing"] is False
        # settled frames keep drawing under the SAME revision keys
        state["needsRedraw"] = True
        browser.step_frames(1)
        keys_after = list(interp._call_method(spec_cache["map"], "keys", []))
        assert set(keys_mid) <= set(keys_after)
    finally:
        gate.set()
        session.tm.images.shutdown()


def test_file_input_add_and_freq_scale_toggle(booted):
    """The Add-file button path (input.files -> upload bridge -> real add)
    and the freq-scale select toggling Linear through applySpec."""
    import numpy as np

    from thesia_tpu.io.wav import encode_wav_s16

    interp, browser, session, _media = booted
    data = encode_wav_s16(0.1 * np.ones((1, 4000), np.float32), 8000)
    inp = browser.doc["querySelector"]("#file-input")
    inp["files"] = [{"name": "picked.wav", "bytes": data}]
    n_before = len(session.tracklist.all_ids())
    browser.dispatch_event(inp, "change", {"target": inp})
    settle(session)
    assert len(session.tracklist.all_ids()) == n_before + 1
    assert inp["value"] == ""  # reset so re-picking the same file re-fires

    fs = browser.doc["querySelector"]("#freq-scale")
    fs["value"] = "Linear"
    browser.dispatch_event(fs, "change")
    settle(session)
    state = g(interp)["state"]
    assert state["freqScale"] == "Linear"
    assert session.tm.setting.freq_scale.value == "Linear"
    fs["value"] = "Mel"
    browser.dispatch_event(fs, "change")
    settle(session)
    assert session.tm.setting.freq_scale.value == "Mel"


def test_deferred_normalize_settle_poll_repaints_stale_rows(booted, monkeypatch):
    """Deferred-mode race the settle poll exists for: the knob handler's
    refreshAll/rebuildAllRowInfo can complete BEFORE the background switch
    lands (the switch worker hasn't reached the write lock yet), leaving the
    row LUFS/guard text stale.  Gate the apply to force that ordering, then
    drive the app's settle poll and assert it repaints the landed state."""
    import os

    deferred = os.environ.get("THESIA_DEFER_SETTINGS") == "1"
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)

    def set_ui(sel_id, value):
        el = browser.doc["querySelector"](sel_id)
        el["value"] = value
        browser.dispatch_event(el, "change")
        browser.advance(300)  # fire the 250 ms control debounce

    # known baseline: limiter armed, normalize off (module fixture is shared)
    set_ui("#guard-mode", "Limiter")
    set_ui("#norm-type", "Off")
    assert session.settings_settled(timeout=120)
    for _ in range(8):
        browser.advance(500)  # flush earlier settle polls
    stats0 = [
        r["querySelector"](".track-stats")["textContent"]
        for r in rows_el["children"]
    ]
    assert not any("reduced by" in s for s in stats0)

    if not deferred:
        # Sync mode: the change handler blocks until the switch lands, so the
        # rebuilt row text is already fresh when the handler chain returns —
        # the race the settle poll exists for CANNOT occur.  Assert that
        # complementary property instead of gating the apply (which would
        # deadlock a synchronous dispatch).
        set_ui("#norm-type", "LUFS")  # restores the -18 family memory
        set_ui("#norm-target", "6")  # then the slider moves to +6
        stats1 = [
            r["querySelector"](".track-stats")["textContent"]
            for r in rows_el["children"]
        ]
        assert any("reduced by" in s for s in stats1)
        set_ui("#norm-type", "Off")
        set_ui("#guard-mode", "ReduceGlobalLevel")
        assert session.settings_settled(timeout=120)
        return

    import threading

    orig = session._apply_common_switch
    release = threading.Event()

    def gated(kind, gen, value, deferred):
        # deterministic ordering: the apply waits until the test has read
        # the stale DOM (no sleep race under CI load)
        assert release.wait(30)
        return orig(kind, gen, value, deferred)

    monkeypatch.setattr(session, "_apply_common_switch", gated)
    # +6 LUFS target: gain > 1 engages the limiter, so the landed state is
    # visibly different from the stale text ("reduced by ..." appears).
    # Reference order: family select first, then the target slider.
    set_ui("#norm-type", "LUFS")
    set_ui("#norm-target", "6")
    # handler chain already ran — against the PRE-switch engine state
    stale = [
        r["querySelector"](".track-stats")["textContent"]
        for r in rows_el["children"]
    ]
    assert stale == stats0
    release.set()
    assert session.settings_settled(timeout=120)
    # the landed switch restarts the image stream; drain it so the poll's
    # next metadata fetch sees isComputing false (the poll keeps backing
    # off while the stream runs — correct, but the manual clock outpaces
    # the real background stream here)
    session.tm.images.drain()
    # the app's settle poll re-fetches row info once isComputing flips off
    for _ in range(12):
        browser.advance(500)
        stats1 = [
            r["querySelector"](".track-stats")["textContent"]
            for r in rows_el["children"]
        ]
        if stats1 != stats0 and any("reduced by" in s for s in stats1):
            break
    assert stats1 != stats0
    assert any("reduced by" in s for s in stats1)
    # restore for later module tests
    monkeypatch.setattr(session, "_apply_common_switch", orig)
    set_ui("#norm-type", "Off")
    set_ui("#guard-mode", "ReduceGlobalLevel")
    assert session.settings_settled(timeout=120)


def test_overview_limiter_band_renders(booted):
    """Limiter-engaging normalize -> the overview strip fetches the REAL
    limiter gain sequence (get_limiter_gain, reference lib.rs:400-406) and
    paints the orange gain band (Overview.tsx limiter envelope)."""
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)

    def set_ui(sel_id, value):
        el = browser.doc["querySelector"](sel_id)
        el["value"] = value
        browser.dispatch_event(el, "change")
        browser.advance(300)  # fire the 250 ms control debounce

    set_ui("#guard-mode", "Limiter")
    set_ui("#norm-type", "LUFS")
    set_ui("#norm-target", "6")
    settle(session)
    # select a row so the overview tracks it (refreshAll -> overview.setTrack)
    info = rows_el["children"][0]["querySelector"](".track-info")
    browser.dispatch_event(info, "mousedown", {
        "target": info, "metaKey": False, "ctrlKey": False, "shiftKey": False,
    })
    for _ in range(6):
        browser.advance(500)  # flush settle polls / metadata watchers
    ov = g(interp)["overview"]
    state = g(interp)["state"]
    tid = int(state["selectedTrack"])
    # force a fresh fetch+draw through the bridge
    interp._call_method(ov, "setTrack", [float(tid), True])
    interp._call_method(
        ov, "draw", [state["startSec"], 2.0, state["maxSec"]])
    gain = ov["gain"]
    assert gain is not None and gain is not UNDEF
    # the engine really limited: a sub-unity gain region exists
    assert len(gain) > 1 and min(gain) < 1.0
    assert min(gain) == pytest.approx(
        min(session.get_limiter_gain(tid)), abs=1e-6
    )
    # the band was painted with the gain color (top + bottom bands per lane,
    # OverviewWaveformViewport.tsx:123-143)
    ctx = browser.doc["querySelector"]("#overview")["_ctx"]
    fills = [v for name, v in ctx["_ops"] if name == "set:fillStyle"]
    assert "#da972e" in fills
    # back off for later module tests
    set_ui("#norm-type", "Off")
    set_ui("#guard-mode", "ReduceGlobalLevel")
    settle(session)


def test_overview_short_track_level_spans_track_share(booted):
    """A short track on a longer timeline occupies only its share of the
    overview canvas, so the whole-track waveform level derives from that
    narrower span, not the full canvas width (reference derives the level
    from pxPerSec = width / maxTrackSec,
    OverviewWaveformViewport.tsx:384,396)."""
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    from thesia_tpu.viewer.twin_app import overview_wave_level

    # the 1 s second.wav vs the 2 s boot track ruling the timeline
    short_row = next(
        r for r in rows_el["children"]
        if r["querySelector"](".track-name")["textContent"].startswith("secon")
    )
    info = short_row["querySelector"](".track-info")
    browser.dispatch_event(info, "mousedown", {
        "target": info, "metaKey": False, "ctrlKey": False, "shiftKey": False,
    })
    for _ in range(4):
        browser.advance(500)
    ov = g(interp)["overview"]
    state = g(interp)["state"]
    tid = int(state["selectedTrack"])
    assert tid == int(short_row["dataset"]["trackId"])
    interp._call_method(ov, "setTrack", [float(tid), True, state["maxSec"]])
    md = ov["metadata"]
    assert md["trackSec"] < state["maxSec"]  # genuinely the short track
    width = 1000.0  # fakedom clientWidth
    track_width = max(1.0, width * md["trackSec"] / state["maxSec"])
    level = overview_wave_level(md["sampleCount"], track_width)
    full_width_level = overview_wave_level(md["sampleCount"], width)
    assert level != full_width_level  # the regression this test guards
    # the bins actually fetched used the track-share level
    spb = 1 << level
    n_bins = len(ov["bins"][0]) // 3
    assert n_bins == math.ceil(md["sampleCount"] / spb)


def test_overview_refetch_only_when_waveform_revision_bumps(booted):
    """refreshAll force-refreshes the overview after EVERY settings change,
    but the waveform bins + per-sample limiter gain only change when the
    waveform revision bumps (normalize/guard/reload) — a spec-setting
    change must not re-download them (review finding: the gain JSON is the
    overview's biggest wire cost)."""
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    # select a row so the overview is active
    info = rows_el["children"][0]["querySelector"](".track-info")
    browser.dispatch_event(info, "mousedown", {
        "target": info, "metaKey": False, "ctrlKey": False, "shiftKey": False,
    })
    for _ in range(4):
        browser.advance(500)
    settle(session)
    ov = g(interp)["overview"]
    assert ov["bins"] is not None and ov["bins"] is not UNDEF

    def set_ui(sel_id, value):
        el = browser.doc["querySelector"](sel_id)
        el["value"] = value
        browser.dispatch_event(el, "change")
        browser.advance(300)

    # spec change: overview must NOT refetch waveform tiles or gain
    browser.fetch_log.clear()
    tov = browser.doc["querySelector"]("#t-overlap")
    tov["value"] = "2"
    browser.dispatch_event(tov, "change")
    for _ in range(4):
        browser.advance(500)
    settle(session)
    spec_log = list(browser.fetch_log)
    assert not any(u.startswith("/api/get_waveform_tile") for u in spec_log)
    assert "/api/get_limiter_gain" not in spec_log
    tov["value"] = "4"
    browser.dispatch_event(tov, "change")
    settle(session)
    # normalize change: the waveform revision bumps -> a real refetch
    browser.fetch_log.clear()
    set_ui("#norm-type", "LUFS")
    for _ in range(6):
        browser.advance(500)
    settle(session)
    for _ in range(6):
        browser.advance(500)
    norm_log = list(browser.fetch_log)
    assert any(u.startswith("/api/get_waveform_tile") for u in norm_log), norm_log
    set_ui("#norm-type", "Off")
    settle(session)
    for _ in range(6):
        browser.advance(500)  # flush the settled re-read before the next test


def test_overview_and_colorbar_refetch_after_deferred_switch_lands(booted, monkeypatch):
    """Deferred-mode race (found by a flake of the test above): the knob
    handler's refreshAll runs BEFORE the background normalize lands, so
    overview.setTrack(force) reads the OLD waveformRevision, concludes the
    bins are unchanged, and skips the download — and updateColorbar reads
    the pre-switch min/max dB.  Without a settled re-read the overview and
    colorbar would stay stale forever (only the tile watchdogs re-adopt).
    Gate the apply to force that ordering deterministically, then assert
    refreshAll's settle watcher re-fetches bins, gain and colorbar."""
    import os

    deferred = os.environ.get("THESIA_DEFER_SETTINGS") == "1"
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    # select a row so the overview is active
    info = rows_el["children"][0]["querySelector"](".track-info")
    browser.dispatch_event(info, "mousedown", {
        "target": info, "metaKey": False, "ctrlKey": False, "shiftKey": False,
    })
    for _ in range(4):
        browser.advance(500)
    settle(session)
    for _ in range(8):
        browser.advance(500)  # flush earlier settle watchers

    def set_ui(sel_id, value):
        el = browser.doc["querySelector"](sel_id)
        el["value"] = value
        browser.dispatch_event(el, "change")
        browser.advance(300)  # fire the 250 ms control debounce

    if not deferred:
        # sync mode: the handler chain blocks until the switch lands, so
        # the refetch happens inline — the race cannot occur
        browser.fetch_log.clear()
        set_ui("#norm-type", "LUFS")
        assert any(
            u.startswith("/api/get_waveform_tile") for u in browser.fetch_log
        ), list(browser.fetch_log)
        set_ui("#norm-type", "Off")
        settle(session)
        return

    import threading

    orig = session._apply_common_switch
    release = threading.Event()

    def gated(kind, gen, value, deferred_flag):
        assert release.wait(30)
        return orig(kind, gen, value, deferred_flag)

    monkeypatch.setattr(session, "_apply_common_switch", gated)
    browser.fetch_log.clear()
    set_ui("#norm-type", "LUFS")
    # the handler chain ran against the PRE-switch engine state: the
    # overview skipped the bins download (old revision) — the exact race
    pre_log = list(browser.fetch_log)
    assert not any(u.startswith("/api/get_waveform_tile") for u in pre_log)
    monkeypatch.undo()
    release.set()
    assert session.settings_settled(timeout=120)
    session.tm.images.drain()
    browser.fetch_log.clear()
    for _ in range(12):
        browser.advance(500)
    post_log = list(browser.fetch_log)
    # the settle watcher re-fetched the overview bins + limiter gain and
    # the colorbar's min/max dB once the switch landed
    assert any(u.startswith("/api/get_waveform_tile") for u in post_log), post_log
    assert "/api/get_limiter_gain" in post_log, post_log
    assert "/api/get_min_dB" in post_log and "/api/get_max_dB" in post_log
    # the overview's revision key now matches the engine's applied state
    ov = g(interp)["overview"]
    eng_rev = session.get_audio_render_metadata(ov["idChStr"])["waveformRevision"]
    assert ov["_binsKey"]["revision"] == eng_rev
    set_ui("#norm-type", "Off")
    settle(session)
    for _ in range(6):
        browser.advance(500)


def test_hotkeys_select_all_freq_zoom_and_escape(booted):
    """The remaining hotkey branches: ctrl+A select-all, ]/[ freq zoom
    around the range center (menu.rs freq-zoom events), shift+arrow big
    jump, and Escape cancelling a floating axis input."""
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    # ctrl+A selects every track
    _key(browser, "KeyA", key="a", ctrlKey=True)
    assert len(state["selected"]) == len({
        r["dataset"]["trackId"] for r in rows_el["children"]
    })
    # ] zooms the freq range in around the center; [ zooms back out
    assert state["hzRange"] in (None, UNDEF)
    _key(browser, "BracketRight", key="]")
    zoomed = state["hzRange"]
    assert zoomed is not None and zoomed is not UNDEF
    span_zoomed = zoomed[1] - zoomed[0]
    _key(browser, "BracketLeft", key="[")
    after = state["hzRange"]
    span_after = (
        after[1] - after[0]
        if after not in (None, UNDEF)
        else session.tm.max_sr / 2.0
    )
    assert span_after > span_zoomed
    # shift+Period = big jump (PLAY_BIG_JUMP_SEC=5): paused it moves the
    # select cursor, clamped to the corpus length (usePlayer.ts:148-157)
    vpc = rows_el["children"][0]["querySelector"](".viewport")
    browser.dispatch_event(vpc, "click", {"offsetX": 0.0, "offsetY": 40.0, "target": vpc})
    _key(browser, "Home", key="Home")
    _key(browser, "Period", key=".", shiftKey=True)
    assert state["selectCursorSec"] == pytest.approx(min(5.0, state["maxSec"]))
    # arrows pan the LENS by 40/200 css px without touching the player
    # (MainViewer.tsx:680-690 + constants/tracks.ts:14-15)
    g(interp)["setLens"]({"startSec": 0.0, "pxPerSec": 100000.0})
    pps = state["pxPerSec"]
    start0 = state["startSec"]
    p0 = session.player.state()["positionSec"]
    _key(browser, "ArrowRight", key="ArrowRight", shiftKey=True)
    assert state["startSec"] == pytest.approx(start0 + 200.0 / pps)
    _key(browser, "ArrowLeft", key="ArrowLeft")
    assert state["startSec"] == pytest.approx(start0 + 160.0 / pps)
    assert session.player.state()["positionSec"] == pytest.approx(p0, abs=1e-6)
    # Escape closes a floating axis input without committing
    row = rows_el["children"][0]
    axis = row["querySelector"](".freq-axis")
    hz0 = state["hzRange"]
    browser.dispatch_event(axis, "dblclick", {
        "target": axis, "offsetY": 10.0, "clientX": 40.0, "clientY": 40.0,
    })
    inp = [c for c in browser.doc["body"]["children"]
           if c.get("className") == "floating-input"]
    assert inp, "floating input did not open"
    inp[0]["value"] = "1234"
    browser.dispatch_event(inp[0], "keydown", {"key": "Escape"})
    assert not [c for c in browser.doc["body"]["children"]
                if c.get("className") == "floating-input"]
    assert state["hzRange"] == hz0  # not committed


def test_play_with_no_selection_autoselects_first_track(booted):
    """Space with nothing selected auto-selects the first display-order
    track and arms the player on it (reference: toggle-play menu event +
    useSelectedTracks default).  Click-paths can never empty a non-empty
    selection (selectTrack keeps the last one, useSelectedTracks.ts:13-63),
    so produce the empty-selection state selectAfterRemoveTracks would
    return and drive the defensive branch from there."""
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    g(interp)["applySelection"]({"selected": [], "pivotId": -1.0})
    assert list(state["selected"]) == []
    assert state["selectedTrack"] is None
    _key(browser, "Space", key=" ")
    assert session.player.state()["isPlaying"] is True
    assert state["selectedTrack"] == state["trackIds"][0]
    assert session.player.state()["trackId"] == int(state["trackIds"][0])
    _key(browser, "Space", key=" ")
    assert session.player.state()["isPlaying"] is False


def test_selection_switch_retargets_player_with_seek_ttl(booted):
    """The player follows the last-selected track (App.tsx:71-73 ->
    usePlayer.ts:92-110): paused switches start at the select cursor; an
    explicit seek within the 1 s TTL survives a playing switch; an expired
    pending seek is ignored."""
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    by_tid = {}
    for r in rows_el["children"]:
        by_tid.setdefault(r["dataset"]["trackId"], r)
    (tid_a, row_a), = [
        (t, r) for t, r in by_tid.items()
        if "boot_track" in r["querySelector"](".track-name")["textContent"]
    ]
    # earlier module tests may have added more files — prefer the known-1 s
    # second.wav (positions used below stay inside it), else any other track
    others = [(t, r) for t, r in by_tid.items() if t != tid_a]
    tid_b, row_b = next(
        ((t, r) for t, r in others
         if "second" in r["querySelector"](".track-name")["textContent"]),
        others[0],
    )
    # start from a known state: B selected and loaded, everything paused
    g(interp)["applySelection"](
        {"selected": [float(tid_b)], "pivotId": float(tid_b)}
    )
    assert session.player.state()["trackId"] == int(float(tid_b))
    assert session.player.state()["isPlaying"] is False
    g(interp)["setLens"]({"startSec": 0.0, "pxPerSec": 100.0})
    pps = state["pxPerSec"]
    start = state["startSec"]
    # paused click on A's viewport: cursor moves, selection switches, and
    # the player starts on A AT the select cursor (no pending seek involved)
    vpc_a = row_a["querySelector"](".viewport")
    x = (0.8 - start) * pps
    browser.dispatch_event(
        vpc_a, "click", {"offsetX": x, "offsetY": 40.0, "target": vpc_a}
    )
    assert state["selectedTrack"] == float(tid_a)
    st = session.player.state()
    assert st["trackId"] == int(float(tid_a))
    assert st["positionSec"] == pytest.approx(0.8, abs=0.02)
    assert st["isPlaying"] is False
    # paused info-pane switch back to B: starts at the (unchanged) cursor
    info_b = row_b["querySelector"](".track-info")
    browser.dispatch_event(info_b, "mousedown", {
        "target": info_b, "metaKey": False, "ctrlKey": False,
        "shiftKey": False,
    })
    st = session.player.state()
    assert st["trackId"] == int(float(tid_b))
    assert st["positionSec"] == pytest.approx(0.8, abs=0.02)
    # playing click on A's viewport at 0.3 s: the seek lands as a pending
    # seek, and the selection-driven switch keeps it (within the 1 s TTL)
    _key(browser, "Space", key=" ")  # plays B from the cursor
    assert session.player.state()["isPlaying"] is True
    x = (0.3 - start) * pps
    browser.dispatch_event(
        vpc_a, "click", {"offsetX": x, "offsetY": 40.0, "target": vpc_a}
    )
    st = session.player.state()
    assert st["trackId"] == int(float(tid_a))
    assert 0.3 - 1e-6 <= st["positionSec"] <= 0.6  # kept playing from 0.3
    assert st["isPlaying"] is True
    _key(browser, "Space", key=" ")
    assert session.player.state()["isPlaying"] is False
    # an EXPIRED pending seek is ignored: the switch falls back to the
    # select cursor (usePlayer.ts:98-100 TTL check)
    state["selectCursorSec"] = 0.6
    state["pendingSeek"] = {"sec": 1.5, "atMs": browser.now_ms - 2000.0}
    browser.dispatch_event(info_b, "mousedown", {
        "target": info_b, "metaKey": False, "ctrlKey": False,
        "shiftKey": False,
    })
    st = session.player.state()
    assert st["trackId"] == int(float(tid_b))
    assert st["positionSec"] == pytest.approx(0.6, abs=0.02)


def test_time_axis_drag_pan_click_cursor_and_alt_fit(booted):
    """TimeAxis parity: anchored drag pans the lens so the grabbed second
    stays under the cursor (TimeAxis.tsx:43-63 + MainViewer.tsx:394-397); a
    plain click moves the select cursor while paused
    (changeLocatorByMouseNotAllowOutside, MainViewer.tsx:670-672); alt+click
    resets to fit (resetTimeAxis, MainViewer.tsx:76,799)."""
    interp, browser, _session, _media = booted
    _ensure_two_tracks(booted)
    state = g(interp)["state"]
    axis = browser.doc["querySelector"]("#time-axis")
    state["fitMode"] = False
    state["startSec"] = 1.0
    state["pxPerSec"] = 400.0
    # grab at x=200 (sec 1.5), drag to x=600: 1.5 must now sit at x=600
    browser.dispatch_event(axis, "mousedown", {"clientX": 200.0, "altKey": False})
    browser.dispatch_event(browser.doc, "mousemove", {"clientX": 600.0})
    browser.dispatch_event(browser.doc, "mouseup", {"clientX": 600.0})
    assert state["startSec"] == pytest.approx(1.5 - 600.0 / 400.0, abs=1e-9)

    # plain click (no movement) while paused: the select cursor moves there
    state["selectCursorSec"] = 0.0
    browser.dispatch_event(axis, "mousedown", {"clientX": 400.0, "altKey": False})
    browser.dispatch_event(browser.doc, "mouseup", {"clientX": 400.0})
    assert state["selectCursorSec"] == pytest.approx(
        state["startSec"] + 400.0 / 400.0, abs=1e-9)

    # alt+click resets to fit: whole track in view from 0
    browser.dispatch_event(axis, "mousedown", {"clientX": 100.0, "altKey": True})
    assert state["fitMode"] is True
    assert state["startSec"] == 0.0


def test_transport_buttons_and_editable_position_readout(booted):
    """PlayerControl parity: skip-to-beginning / jump buttons move the select
    cursor while paused (usePlayer.ts:141-147,181-185); the position readout
    is an editable input whose committed label parses through the real
    time_label_to_seconds command — Enter commits, Escape cancels, and the
    rAF updater never overwrites an in-progress edit
    (PlayerControl.tsx:30-77, FloatingUserInput.tsx)."""
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    # select the first track (paused)
    info = rows_el["children"][0]["querySelector"](".track-info")
    browser.dispatch_event(info, "mousedown", {
        "target": info, "metaKey": False, "ctrlKey": False, "shiftKey": False,
    })
    doc = browser.doc
    fwd = doc["querySelector"]("#btn-jump-fwd")
    back = doc["querySelector"]("#btn-jump-back")
    skip = doc["querySelector"]("#btn-skip-start")
    td = doc["querySelector"]("#time-display")

    state["selectCursorSec"] = 0.0
    browser.dispatch_event(fwd, "click", {"target": fwd})
    assert state["selectCursorSec"] == pytest.approx(1.0)  # PLAY_JUMP_SEC
    browser.dispatch_event(back, "click", {"target": back})
    assert state["selectCursorSec"] == pytest.approx(0.0)  # clamped at 0
    browser.dispatch_event(fwd, "click", {"target": fwd})
    browser.dispatch_event(skip, "click", {"target": skip})
    assert state["selectCursorSec"] == pytest.approx(0.0)

    # paused readout follows the select cursor, not the player position
    state["selectCursorSec"] = 1.25
    browser.step_frames(1)
    assert td["value"] == "00:00:01.250"

    # edit: type a label, Enter commits -> select cursor moves (paused)
    td["focus"]()
    td["value"] = "00:00:01.500"
    browser.dispatch_event(td, "input", {"target": td})
    # the rAF updater must NOT clobber the in-progress edit
    browser.step_frames(1)
    assert td["value"] == "00:00:01.500"
    browser.dispatch_event(td, "keydown", {"target": td, "key": "Enter"})
    assert state["selectCursorSec"] == pytest.approx(1.5)

    # Escape cancels: no cursor move, readout resumes tracking
    td["focus"]()
    td["value"] = "00:00:09.000"
    browser.dispatch_event(td, "input", {"target": td})
    browser.dispatch_event(td, "keydown", {"target": td, "key": "Escape"})
    assert state["selectCursorSec"] == pytest.approx(1.5)
    browser.step_frames(1)
    assert td["value"] == "00:00:01.500"

    # an unparsable label is ignored (time_label_to_seconds -> null)
    td["focus"]()
    td["value"] = "not a time"
    browser.dispatch_event(td, "input", {"target": td})
    browser.dispatch_event(td, "keydown", {"target": td, "key": "Enter"})
    assert state["selectCursorSec"] == pytest.approx(1.5)

    # while playing, a committed label SEEKS the real player
    browser.dispatch_event(doc["querySelector"]("#btn-play"), "click",
                           {"target": doc["querySelector"]("#btn-play")})
    assert session.player.state()["isPlaying"] is True
    td["focus"]()
    td["value"] = "00:00:00.800"
    browser.dispatch_event(td, "input", {"target": td})
    browser.dispatch_event(td, "keydown", {"target": td, "key": "Enter"})
    assert session.player.state()["positionSec"] == pytest.approx(0.8, abs=0.05)
    browser.dispatch_event(doc["querySelector"]("#btn-play"), "click",
                           {"target": doc["querySelector"]("#btn-play")})
    assert session.player.state()["isPlaying"] is False

    # volume double-click resets to 0 dB through the engine
    vol = doc["querySelector"]("#volume")
    vol["value"] = "-12"
    browser.dispatch_event(vol, "input", {"target": vol})
    browser.dispatch_event(vol, "dblclick", {"target": vol})
    assert vol["value"] == "0"
    assert session.player.playback.volume == pytest.approx(1.0)  # 0 dB


def test_reload_failure_marks_row_errored_with_actions(booted):
    """reference: useTracks.ts:122-148 (erroredTrackIds on reload failure,
    ignoreError) + MainViewer.tsx:1149-1163 (per-row ErrorBox with
    Reload/Ignore/Close) + App.tsx:71-73 (the player refuses to follow an
    errored selection)."""
    import pathlib

    import numpy as np

    from thesia_tpu.io.wav import encode_wav_s16

    interp, browser, session, media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    td = pathlib.Path(media).parent
    victim = td / "fragile.wav"
    payload = encode_wav_s16(np.zeros((1, 4000), np.float32) + 0.05, 8000)
    victim.write_bytes(payload)
    browser.media_paths.append(str(victim))
    sel = browser.doc["querySelector"]("#media-list")
    sel["value"] = str(victim)
    browser.dispatch_event(sel, "change")
    settle(session)
    row = [
        r for r in rows_el["children"]
        if "fragile" in r["querySelector"](".track-name")["textContent"]
    ][0]
    tid = float(int(float(row["dataset"]["trackId"])))

    # break the file on disk; the row reload button must mark it errored
    victim.unlink()
    btn = row["querySelector"](".track-reload")
    browser.dispatch_event(btn, "click", {"target": btn})
    box = row["querySelector"](".track-error")
    assert box
    labels = [
        c["textContent"] for c in box["children"] if c["tagName"] == "BUTTON"
    ]
    assert labels == ["Reload", "Ignore", "Close"]
    assert tid in list(state["erroredTracks"])

    # selecting the errored track parks the player (selectedTrackId -> -1)
    info = row["querySelector"](".track-info")
    browser.dispatch_event(info, "mousedown", {
        "target": info, "metaKey": False, "ctrlKey": False, "shiftKey": False,
    })
    st = session.player.state()
    assert st["isPlaying"] is False
    assert st["positionSec"] == pytest.approx(0.0, abs=1e-6)
    # Space refuses to start playback on an errored selection
    # (usePlayer.ts:112-118 with selectedTrackId == -1)
    _key(browser, "Space", key=" ")
    assert session.player.state()["isPlaying"] is False

    # Ignore forgives (useTracks.ts:146-148): the overlay clears and the
    # still-selected track immediately becomes the playing track again
    ignore = [
        c for c in box["children"]
        if c["tagName"] == "BUTTON" and c["textContent"] == "Ignore"
    ][0]
    browser.dispatch_event(ignore, "click", {"target": ignore})
    assert not row["querySelector"](".track-error")
    assert list(state["erroredTracks"]) == []
    assert session.player.state()["trackId"] == int(tid)

    # restore the file: the in-box Reload action clears the errored state
    victim.unlink() if victim.exists() else None
    browser.dispatch_event(btn, "click", {"target": btn})  # errored again
    box = row["querySelector"](".track-error")
    assert box
    victim.write_bytes(payload)
    reload_btn = [
        c for c in box["children"]
        if c["tagName"] == "BUTTON" and c["textContent"] == "Reload"
    ][0]
    browser.dispatch_event(reload_btn, "click", {"target": reload_btn})
    assert not row["querySelector"](".track-error")

    # Close removes the track entirely (ErrorBox handleClose)
    victim.unlink()
    browser.dispatch_event(btn, "click", {"target": btn})
    box = row["querySelector"](".track-error")
    close_btn = [
        c for c in box["children"]
        if c["tagName"] == "BUTTON" and c["textContent"] == "Close"
    ][0]
    browser.dispatch_event(close_btn, "click", {"target": close_btn})
    settle(session)
    assert not [
        r for r in rows_el["children"]
        if "fragile" in r["querySelector"](".track-name")["textContent"]
    ]
    assert tid not in list(state["erroredTracks"])


def test_axis_hover_tooltips_reference_exact(booted):
    """Hovering each axis renders the reference's per-axis tooltip through
    the REAL formatters: time (TimeAxis.tsx:79-90 — axis format + one digit,
    " s" suffix for plain-seconds), freq (FreqAxis.tsx:214-221 — kHz/Hz
    label), amp (AmpAxis.tsx:123-130 — linear, maxFractionDigits 9), and the
    dB colorbar (ColorMap.tsx:53-63 — maxFractionDigits 6, " dB" suffix).
    Expected strings are computed independently from the twins + engine
    formatters."""
    from thesia_tpu.axis import (
        format_frequency_axis_tooltip,
        format_linear_axis_tooltip,
        format_time_axis_tooltip,
    )
    from thesia_tpu.viewer import twin_app as TA

    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    st = g(interp)["state"]
    st["needsRedraw"] = True
    browser.step_frames(1)  # renderFrame -> scheduleAxisUpdate
    browser.advance(20)  # fire the ~14 ms axis-update debounce

    def tooltip_text():
        for c in browser.doc["body"]["children"]:
            style = c.get("style") or {}
            if "position:fixed" in (style.get("cssText") or "") and \
                    style.get("display") != "none":
                return c["textContent"]
        return None

    def hover(el, off_x, off_y):
        browser.dispatch_event(el, "mousemove", {
            "offsetX": off_x, "offsetY": off_y,
            "clientX": off_x, "clientY": off_y, "target": el,
        })
        browser.advance(150)  # fire the 100 ms throttle
        return tooltip_text()

    # --- time axis -----------------------------------------------------
    ta = browser.doc["querySelector"]("#time-axis")
    markers = g(interp)["lastAxisMarkers"](ta)
    assert markers, "time axis never stashed its markers"
    fd = markers[-1][1]
    disp = TA.time_tooltip_display(fd)
    sec = st["startSec"] + 250.0 / st["pxPerSec"]
    want = format_time_axis_tooltip(sec, disp["display"])
    if disp["appendSeconds"]:
        want = f"{want} s"
    assert hover(ta, 250.0, 10.0) == want

    # --- freq axis (row 0) ----------------------------------------------
    row = rows_el["children"][0]
    fx = row["querySelector"](".freq-axis")
    max_hz = st["maxTrackHz"]
    lo, hi = (st["hzRange"] or [0.0, max_hz])
    a = TA.freq_tooltip_args(st["freqScale"], 40.0, 160.0, lo, hi, max_hz)
    want = TA.freq_tooltip_label(
        format_frequency_axis_tooltip(a["hz"], a["resolutionHz"])
    )
    assert hover(fx, 7.0, 40.0) == want
    assert want.endswith(" kHz") or want.endswith(" Hz")

    # --- amp axis (row 0) -----------------------------------------------
    ax_el = row["querySelector"](".amp-axis")
    track_id = int(row["dataset"]["trackId"])
    r = g(interp)["ampRangeOf"](float(track_id))
    amp_markers = g(interp)["lastAxisMarkers"](ax_el)
    assert amp_markers, "amp axis never stashed its markers"
    args = TA.linear_tooltip_args(40.0, 160.0, r[1], r[0], amp_markers)
    want = format_linear_axis_tooltip(
        args["value"], args["resolution"], args["tickUnit"], 9
    )
    assert hover(ax_el, 7.0, 40.0) == want

    # --- dB colorbar ------------------------------------------------------
    cb = browser.doc["querySelector"]("#colorbar")
    assert st["dbRange"], "updateColorbar never recorded the dB range"
    min_db, max_db = st["dbRange"]
    cb_markers = g(interp)["lastAxisMarkers"](cb)
    args = TA.linear_tooltip_args(40.0, 160.0, max_db, min_db, cb_markers)
    want = format_linear_axis_tooltip(
        args["value"], args["resolution"], args["tickUnit"], 6
    ) + " dB"
    assert hover(cb, 7.0, 40.0) == want

    # NaN tick unit survives the JSON bridge (null -> NaN server-side):
    # a single-marker axis has no positive tick gap
    args = TA.linear_tooltip_args(40.0, 160.0, 1.0, -1.0, [[0.0, "1"]])
    assert math.isnan(args["tickUnit"])
    via_js = g(interp)["api"]["formatLinearAxisTooltip"](
        args["value"], args["resolution"], args["tickUnit"], 9
    )
    want = format_linear_axis_tooltip(
        args["value"], args["resolution"], args["tickUnit"], 9
    )
    assert via_js == want

    browser.dispatch_event(cb, "mouseleave", {"target": cb})
    assert tooltip_text() is None  # hidden again


def test_control_float_range_input_semantics(booted):
    """FloatRangeInput parity through the real controls (reference
    modules/FloatRangeInput.tsx + Control.tsx): text commit with
    slider-then-previous fallback and clamping, Escape cancel, slider
    double-click reset to 100 dB, free-text window size with the 1 ms
    floor (Control.tsx:97-110), and per-family normalize target memory
    (Control.tsx:66-71,118-143)."""
    interp, browser, session, _media = booted
    _ensure_two_tracks(booted)
    browser.advance(2000)  # flush stray debounced/throttled work

    rng = browser.doc["querySelector"]("#db-range")
    txt = browser.doc["querySelector"]("#db-range-val")

    # text commit: type 73, Enter -> engine applies, slider follows
    browser.dispatch_event(txt, "focus", {"target": txt})
    txt["value"] = "73"
    browser.dispatch_event(txt, "keydown", {"key": "Enter", "target": txt})
    browser.advance(50)
    settle(session)
    assert session.tm.db_range == 73.0
    assert rng["value"] == "73"

    # garbage text falls back to the slider value -> no engine change
    browser.dispatch_event(txt, "focus", {"target": txt})
    txt["value"] = "not a number"
    browser.dispatch_event(txt, "blur", {"target": txt})
    browser.advance(50)
    assert txt["value"] == "73"
    assert session.tm.db_range == 73.0

    # out-of-range clamps to the bound (FloatRangeInput.tsx:110)
    browser.dispatch_event(txt, "focus", {"target": txt})
    txt["value"] = "999"
    browser.dispatch_event(txt, "blur", {"target": txt})
    browser.advance(50)
    settle(session)
    assert session.tm.db_range == 120.0

    # Escape restores the pre-focus value without committing
    browser.dispatch_event(txt, "focus", {"target": txt})
    txt["value"] = "55"
    browser.dispatch_event(txt, "keydown", {"key": "Escape", "target": txt})
    browser.advance(50)
    assert txt["value"] == "120"
    assert session.tm.db_range == 120.0

    # slider double-click resets to DB_RANGE_DETENTS[len-2] = 100
    browser.dispatch_event(rng, "click", {
        "target": rng, "button": 0.0, "detail": 2.0, "altKey": False,
        "preventDefault": lambda: None,
    })
    browser.advance(50)
    settle(session)
    assert session.tm.db_range == 100.0
    assert txt["value"] == "100"

    # window size: free text, < 1 ms clamps to MIN_WIN_MILLISEC
    win = browser.doc["querySelector"]("#win-ms")
    win["value"] = "0.25"
    browser.dispatch_event(win, "change")
    settle(session)
    assert session.tm.setting.win_ms == 1.0
    assert win["value"] == "1.0"
    # FULL precision reaches the engine; only the display rounds
    # (reference applies 12.345 and shows 12.3, Control.tsx:97-110)
    win["value"] = "12.345"
    browser.dispatch_event(win, "change")
    settle(session)
    assert session.tm.setting.win_ms == 12.345
    assert win["value"] == "12.3"
    # ...and an unrelated knob change must NOT quantize it to the display
    tov = browser.doc["querySelector"]("#t-overlap")
    tov["value"] = "2"
    browser.dispatch_event(tov, "change")
    settle(session)
    assert session.tm.setting.win_ms == 12.345
    assert session.tm.setting.t_overlap == 2
    tov["value"] = "4"
    browser.dispatch_event(tov, "change")
    settle(session)
    # real browsers fire `change` BEFORE `blur` for a user-edited input
    # whose value differs from its focus-time value; Escape must restore
    # the display synchronously in keydown so no change can fire at all
    browser.dispatch_event(win, "input", {"target": win})
    win["value"] = "80"
    browser.dispatch_event(win, "keydown", {"key": "Escape", "target": win})
    assert win["value"] == "12.3"  # restored BEFORE blur ran
    settle(session)
    assert session.tm.setting.win_ms == 12.345
    # garbage restores the display, engine untouched
    win["value"] = "garbage"
    browser.dispatch_event(win, "change")
    settle(session)
    assert win["value"] == "12.3"
    assert session.tm.setting.win_ms == 12.345
    # edited-then-Escape cancels (FloatingUserInput: changed flag cleared)
    browser.dispatch_event(win, "input", {"target": win})
    win["value"] = "80"
    browser.dispatch_event(win, "keydown", {"key": "Escape", "target": win})
    settle(session)
    assert win["value"] == "12.3"
    assert session.tm.setting.win_ms == 12.345
    # restore the module default
    win["value"] = "40"
    browser.dispatch_event(win, "change")
    settle(session)
    assert session.tm.setting.win_ms == 40.0

    # normalize per-family memory.  The fixture is module-shared, so
    # earlier tests may already have moved the family memories; establish
    # them in-test and assert recall, not boot defaults (the default
    # constants 0.0 / -18.0 are pinned by test_viewer_applogic.py).
    ntype = browser.doc["querySelector"]("#norm-type")
    ntgt = browser.doc["querySelector"]("#norm-target")
    ntxt = browser.doc["querySelector"]("#norm-target-text")
    ntype["value"] = "LUFS"
    browser.dispatch_event(ntype, "change")
    browser.advance(300)
    settle(session)
    # whatever the shared memory held, the engine now matches the display
    assert session.tracklist.common_normalize.to_json() == {
        "type": "LUFS", "target": float(ntxt["value"]),
    }
    ntgt["value"] = "-23"
    browser.dispatch_event(ntgt, "change")
    browser.advance(300)
    settle(session)
    assert session.tracklist.common_normalize.to_json() == {
        "type": "LUFS", "target": -23.0,
    }
    ntype["value"] = "PeakdB"
    browser.dispatch_event(ntype, "change")
    browser.advance(300)
    settle(session)
    peak_mem = float(ntxt["value"])  # family's remembered (or default) target
    assert session.tracklist.common_normalize.to_json() == {
        "type": "PeakdB", "target": peak_mem,
    }
    ntgt["value"] = "-1.5"
    browser.dispatch_event(ntgt, "change")
    browser.advance(300)
    settle(session)
    assert session.tracklist.common_normalize.to_json() == {
        "type": "PeakdB", "target": -1.5,
    }
    # RMSdB shares the LUFS memory -> -23 comes back
    ntype["value"] = "RMSdB"
    browser.dispatch_event(ntype, "change")
    browser.advance(300)
    settle(session)
    assert ntxt["value"] == "-23.00"
    assert session.tracklist.common_normalize.to_json() == {
        "type": "RMSdB", "target": -23.0,
    }
    # ...and PeakdB kept its own
    ntype["value"] = "PeakdB"
    browser.dispatch_event(ntype, "change")
    browser.advance(300)
    settle(session)
    assert ntxt["value"] == "-1.50"
    # Off disables the pair and parks the display at the floor
    ntype["value"] = "Off"
    browser.dispatch_event(ntype, "change")
    browser.advance(300)
    settle(session)
    assert ntgt["disabled"] and ntxt["disabled"]
    assert ntxt["value"] == "-40.00"
    assert session.tracklist.common_normalize.to_json()["type"] == "Off"

    # blend double-click resets to 0.5 (Control.tsx:80-87)
    blend = browser.doc["querySelector"]("#blend")
    blend["value"] = "0.85"
    browser.dispatch_event(blend, "input")
    assert g(interp)["state"]["blend"] == 0.85
    browser.dispatch_event(blend, "click", {
        "target": blend, "button": 0.0, "detail": 1.0, "altKey": True,
        "preventDefault": lambda: None,
    })
    assert g(interp)["state"]["blend"] == 0.5
    browser.advance(600)  # flush the blend persist timer


def test_multichannel_rows_and_channel_labels(booted):
    """Every channel gets a row (reference track.rs:359-366 id_ch_tuples
    spans 0..n_ch) labeled from the CHANNEL table (tracks.ts:8-12 via
    TrackInfo.tsx:85-88): mono M, stereo L/R, numbered past the table."""
    import pathlib

    interp, browser, session, media = booted
    _ensure_two_tracks(booted)  # track 0 = stereo boot_track.wav
    rows_el = browser.doc["querySelector"]("#rows")

    def rows_for(track_id):
        return [
            r for r in rows_el["children"]
            if int(float(r["dataset"]["trackId"])) == track_id
        ]

    def rows_named(prefix):
        return [
            r for r in rows_el["children"]
            if r["querySelector"](".track-name")["textContent"]
            .startswith(prefix)
        ]

    # the fixture's boot_track.wav is stereo (id may have shifted if an
    # earlier module test removed/re-added it — find it by name)
    stereo = rows_named("boot_track")
    assert [r["querySelector"](".ch-label")["textContent"] for r in stereo] \
        == ["L", "R"]
    assert "[L]" in stereo[0]["querySelector"](".track-name")["textContent"]
    assert "[R]" in stereo[1]["querySelector"](".track-name")["textContent"]
    # ...and second.wav is mono: M label, unsuffixed name
    mono = rows_named("second")
    assert len(mono) == 1
    assert mono[0]["querySelector"](".ch-label")["textContent"] == "M"
    assert "[" not in mono[0]["querySelector"](".track-name")["textContent"]

    from thesia_tpu.io.wav import encode_wav_s16

    quad = pathlib.Path(media).parent / "quad.wav"
    if not quad.exists():
        sig = np.stack([
            0.2 * np.sin(2 * np.pi * (220.0 * (ch + 1)) *
                         np.arange(8000) / 8000.0)
            for ch in range(4)
        ]).astype(np.float32)
        quad.write_bytes(encode_wav_s16(sig, 8000))
    sel = browser.doc["querySelector"]("#media-list")
    sel["value"] = str(quad)
    browser.dispatch_event(sel, "change")
    settle(session)

    state = g(interp)["state"]
    quad_id = int(max(state["trackIds"]))
    qrows = rows_for(quad_id)
    assert len(qrows) == 4  # no 2-channel cap
    assert [r["dataset"]["idCh"] for r in qrows] == [
        f"{quad_id}_{ch}" for ch in range(4)
    ]
    # past the CHANNEL table: numbered fallback labels, distinguishable names
    assert [r["querySelector"](".ch-label")["textContent"] for r in qrows] \
        == ["ch0", "ch1", "ch2", "ch3"]
    # all four viewports got real metadata from the engine
    for ch in range(4):
        vp = interp._call_method(
            state["viewports"], "get", [f"{quad_id}_{ch}"])
        assert vp["metadata"]["spectrogramWidth"] > 0

    # overview draws all four channel lanes (OVERVIEW_MAX_CH=4,
    # overviewLaneLayout geometry) through real waveform tiles
    ov = g(interp)["overview"]
    interp._call_method(ov, "setTrack", [float(quad_id), True])
    ctx = browser.doc["querySelector"]("#overview")["_ctx"]
    ctx["_ops"].clear()
    interp._call_method(ov, "draw", [0.0, 0.5, state["maxSec"]])
    assert len(ov["bins"]) == 4
    fills = [v for name, v in ctx["_ops"] if name == "set:fillStyle"]
    # one wave fill per lane (no clipping/gain on this quiet fixture)
    assert fills.count("#1389eb") == 4

    # clean up so later module tests keep their expected track set
    g(interp)["removeTracks"]([float(quad_id)])
    settle(session)
    assert not rows_for(quad_id)


def test_hotkeys_mod_zooms_and_arrow_selection(booted):
    """Reference hotkeys ported this round: mod+left/right time zoom
    anchored at the select cursor (MainViewer.tsx:735-773), mod+up/down
    row-height zoom keeping the content middle (691-733), and up/down
    (shift extends) moving the selection from the most recent pick
    (783-795)."""
    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]

    # place the select cursor somewhere nonzero
    vpc = rows_el["children"][0]["querySelector"](".viewport")
    g(interp)["setLens"]({"startSec": 0.0, "pxPerSec": 500.0})
    browser.dispatch_event(vpc, "click", {
        "offsetX": 250.0, "offsetY": 40.0, "target": vpc,
    })
    sel_sec = state["selectCursorSec"]
    assert sel_sec == pytest.approx(0.5)

    # mod+right zooms IN keeping the select cursor's pixel position
    pps0, start0 = state["pxPerSec"], state["startSec"]
    px_before = (sel_sec - start0) * pps0
    _key(browser, "ArrowRight", key="ArrowRight", ctrlKey=True)
    assert state["pxPerSec"] > pps0
    assert (sel_sec - state["startSec"]) * state["pxPerSec"] == pytest.approx(
        px_before, rel=1e-6)
    # mod+left zooms back OUT
    pps1 = state["pxPerSec"]
    _key(browser, "ArrowLeft", key="ArrowLeft", ctrlKey=True)
    assert state["pxPerSec"] < pps1

    # mod+down/up = row-height zoom through --row-h
    h0 = state["rowHeight"]
    _key(browser, "ArrowDown", key="ArrowDown", ctrlKey=True)
    h1 = state["rowHeight"]
    assert h1 > h0
    assert browser.doc["documentElement"]["style"]["--row-h"] \
        == f"{int(h1)}px"
    _key(browser, "ArrowUp", key="ArrowUp", ctrlKey=True)
    assert state["rowHeight"] < h1

    # up/down move the selection; shift+down extends the range
    order = [
        int(float(r["dataset"]["trackId"])) for r in rows_el["children"]
    ]
    uniq = list(dict.fromkeys(order))
    assert len(uniq) >= 2
    info0 = rows_el["children"][0]["querySelector"](".track-info")
    browser.dispatch_event(info0, "mousedown", {
        "target": info0, "metaKey": False, "ctrlKey": False, "shiftKey": False,
    })
    assert [int(x) for x in state["selected"]] == [uniq[0]]
    _key(browser, "ArrowDown", key="ArrowDown")
    assert [int(x) for x in state["selected"]] == [uniq[1]]
    _key(browser, "ArrowUp", key="ArrowUp")
    assert [int(x) for x in state["selected"]] == [uniq[0]]
    _key(browser, "ArrowUp", key="ArrowUp")  # clamped at the first track
    assert [int(x) for x in state["selected"]] == [uniq[0]]
    _key(browser, "ArrowDown", key="ArrowDown", shiftKey=True)
    assert sorted(int(x) for x in state["selected"]) == sorted(uniq[:2])


def test_file_drop_at_index_inserts_and_filters_unsupported(booted):
    """Dropped files insert at the cursor's track index (App.tsx
    addDroppedFile + useTracks.ts:92-100 splice; MainViewer.tsx:175-189
    calculateDropIndex) and unsupported extensions are rejected before
    upload with the file-open error message (App.tsx:85-101)."""
    import numpy as np

    from thesia_tpu.io.wav import encode_wav_s16

    interp, browser, session, _media = booted
    rows_el = _ensure_two_tracks(booted)
    state = g(interp)["state"]
    order_before = [
        int(float(r["dataset"]["trackId"])) for r in rows_el["children"]
    ]
    uniq_before = list(dict.fromkeys(order_before))
    assert len(uniq_before) >= 2

    data = encode_wav_s16(0.15 * np.ones((1, 4000), np.float32), 8000)
    # drop BETWEEN the first and second track: clientY past track 0's
    # midpoint -> index 1 (fakedom rows are 160 px bands)
    first_rows = sum(1 for t in order_before if t == uniq_before[0])
    drop_y = first_rows * 160.0 + 10.0
    browser.dispatch_event(browser.doc, "drop", {
        "clientY": drop_y,
        "dataTransfer": {
            "files": [
                {"name": "insert_mid.wav", "bytes": data},
                {"name": "rejected.txt", "bytes": b"nope"},
            ],
            "types": ["Files"],
        },
    })
    settle(session)
    # the unsupported file never reached the engine and raised the error box
    assert all(
        "rejected" not in session.get_file_name(i)
        for i in session.tracklist.all_ids()
    )
    errs = browser.doc["querySelector"]("#error-box")["children"]
    assert any("rejected.txt" in (e["textContent"] or "") for e in errs)
    # the wav landed AT index 1 in display order (between the two tracks)
    order_after = list(dict.fromkeys(
        int(float(r["dataset"]["trackId"])) for r in rows_el["children"]
    ))
    new_id = next(i for i in order_after if i not in uniq_before)
    assert "insert_mid" in session.get_file_name(new_id)
    assert order_after.index(new_id) == 1
    assert order_after[0] == uniq_before[0]
    # state.trackIds re-derived from the DOM order
    assert [int(x) for x in state["trackIds"]] == order_after
    # clean up for later module tests
    g(interp)["removeTracks"]([float(new_id)])
    settle(session)
