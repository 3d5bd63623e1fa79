"""Golden tests for the app-layer interaction math twins (VERDICT r3 #1).

Every function in thesia_tpu/viewer/twin_app.py (the executed twin of
viewer/js/applogic.js) is exercised here against expectations derived from
the reference formulas — cited per test:

  src/prototypes/MainViewer/MainViewer.tsx:359-595  lens normalize, wheel,
      cursor-anchored horizontal + height zoom w/ scroll correction
  src/hooks/useSelectedTracks.ts:5-126              selection pivot
  src/prototypes/MainViewer/AmpAxis.tsx             amp range drag/wheel
  src/prototypes/MainViewer/FreqAxis.tsx            hz range 3-zone drag
  src/prototypes/Overview/Overview.tsx              overview lens
  src/hooks/usePlayer.ts:44-52                      position extrapolation
"""

import math

import pytest

from thesia_tpu.viewer import twin_app as T

W = 1000.0  # viewport width used throughout
INF = float("inf")


# ---------------------------------------------------------------------------
# lens normalization — MainViewer.tsx:359-392


def test_normalize_start_sec_clamps_to_track():
    # view can't start before 0 or extend past the longest track's end
    assert T.normalize_start_sec(-5, 100, 60, W) == 0
    assert T.normalize_start_sec(55, 100, 60, W) == 50  # 60 - 1000/100
    assert T.normalize_start_sec(20, 100, 60, W) == 20
    # track shorter than the view -> pinned at 0
    assert T.normalize_start_sec(3, 10, 5, W) == 0


def test_normalize_px_per_sec_bounds():
    # lower bound: can't zoom out past fit-from-startSec
    assert T.normalize_px_per_sec(5, 0, 100, W) == 10  # width/maxTrackSec
    assert T.normalize_px_per_sec(50, 0, 100, W) == 50
    # upper bound: MAX_PX_PER_SEC
    assert T.normalize_px_per_sec(1e9, 0, 100, W) == T.MAX_PX_PER_SEC
    # when fit itself needs more than MAX (tiny remaining track), the fit
    # value wins the upper clamp (reference Math.max(MAX, fit))
    start = 100 - 1e-3
    assert T.normalize_px_per_sec(1e9, start, 100, W) == W / (100 - start)
    # degenerate: view starts at/after the end -> the reference returns
    # min(pxPerSec, MAX, 1e-8) (MainViewer.tsx:364-366)
    assert T.normalize_px_per_sec(100, 100, 100, W) == 1e-8


def test_update_lens_params_normalizes_start_against_new_zoom():
    # reference order (MainViewer.tsx:378-383): startSec is clamped with the
    # NEW pxPerSec — zooming out while near the end pulls startSec back
    cur = {"startSec": 50.0, "pxPerSec": 100.0}
    out = T.update_lens_params(cur, {"startSec": 55.0, "pxPerSec": 20.0}, 60.0, W)
    assert out["startSec"] == 10.0  # 60 - 1000/20
    assert out["pxPerSec"] == pytest.approx(20.0)


def test_update_lens_params_fit_flag():
    out = T.update_lens_params(
        {"startSec": 0.0, "pxPerSec": 1.0}, {"pxPerSec": W / 100}, 100.0, W
    )
    assert out["isFit"] is True
    out = T.update_lens_params(
        {"startSec": 0.0, "pxPerSec": 1.0}, {"pxPerSec": 3 * W / 100}, 100.0, W
    )
    assert out["isFit"] is False


def test_resize_lens_preserves_opposite_edge():
    # MainViewer.tsx:399-412: dragging one lens edge keeps the other fixed
    cur = {"startSec": 10.0, "pxPerSec": 100.0}  # view [10, 20]
    out = T.resize_lens_left(cur, 14.0, 100.0, W)
    assert out["startSec"] == pytest.approx(14.0)
    assert out["startSec"] + W / out["pxPerSec"] == pytest.approx(20.0)

    out = T.resize_lens_right(cur, 14.0, 100.0, W)
    assert out["startSec"] == pytest.approx(10.0)
    assert out["startSec"] + W / out["pxPerSec"] == pytest.approx(14.0)


def test_resize_lens_right_through_start_clamps_to_max_zoom():
    cur = {"startSec": 10.0, "pxPerSec": 100.0}
    out = T.resize_lens_right(cur, 10.0, 100.0, W)  # width/0 -> inf
    assert out["pxPerSec"] == T.MAX_PX_PER_SEC


def test_move_lens_anchor_property():
    # Overview drag: the grabbed fraction of the lens stays under the cursor
    start = T.move_lens_start_sec(30.0, 0.25, 100.0, W)
    lens = W / 100.0
    assert start + 0.25 * lens == pytest.approx(30.0)


def test_time_axis_drag_keeps_grabbed_second_under_cursor():
    # TimeAxis.tsx:43-63: grab at x0, move to x1 — the second that was under
    # the cursor at grab time is now under the new cursor position
    pps = 50.0
    anchor = T.time_axis_drag_anchor(200.0, W, 10.0, pps)
    assert anchor["sec"] == pytest.approx(10.0 + 200.0 / pps)
    for x1 in (0.0, 200.0, 730.0, W):
        start = T.time_axis_drag_start_sec(anchor, x1, W, pps)
        assert start + x1 / pps == pytest.approx(anchor["sec"])
    # zero movement is the identity pan
    same = T.time_axis_drag_start_sec(anchor, 200.0, W, pps)
    assert same == pytest.approx(10.0)


# ---------------------------------------------------------------------------
# wheel gestures — MainViewer.tsx:538-576


@pytest.mark.parametrize(
    "e,is_apple,kind,delta",
    [
        # apple pinch (ctrl) -> horizontal zoom, delta scaled -12x
        ({"deltaX": 0, "deltaY": 5, "ctrlKey": True}, True, "hzoom", -60),
        # apple pinch + shift -> vertical (height) zoom, -6x
        ({"deltaX": 0, "deltaY": 5, "ctrlKey": True, "shiftKey": True}, True, "vzoom", -30),
        # apple alt+vertical wheel -> vertical zoom (horizontal=shift=false)
        ({"deltaX": 0, "deltaY": 5, "altKey": True}, True, "vzoom", 5),
        # apple alt + dx-dominant -> horizontal zoom with deltaX
        ({"deltaX": 7, "deltaY": 1, "altKey": True}, True, "hzoom", 7),
        # non-apple ctrl+vertical -> vertical zoom, inverted delta
        ({"deltaX": 0, "deltaY": 5, "ctrlKey": True}, False, "vzoom", -5),
        # non-apple ctrl+shift+vertical -> horizontal zoom, inverted
        ({"deltaX": 0, "deltaY": 5, "ctrlKey": True, "shiftKey": True}, False, "hzoom", -5),
        # plain vertical -> native scroll (not consumed)
        ({"deltaX": 0, "deltaY": 5}, False, "native", 5),
        # plain dx-dominant -> horizontal scroll
        ({"deltaX": 7, "deltaY": 1}, False, "hscroll", 7),
        # shift+vertical -> horizontal scroll with deltaY
        ({"deltaX": 0, "deltaY": 5, "shiftKey": True}, False, "hscroll", 5),
        # shift + dx-dominant -> horizontal=false -> native
        ({"deltaX": 7, "deltaY": 1, "shiftKey": True}, False, "native", 7),
    ],
)
def test_classify_wheel(e, is_apple, kind, delta):
    out = T.classify_wheel(e, is_apple)
    assert out["kind"] == kind
    assert out["delta"] == delta


def test_horizontal_zoom_keeps_cursor_time_fixed():
    # MainViewer.tsx:577-588: the second under the cursor is invariant
    cur = {"startSec": 10.0, "pxPerSec": 100.0}
    out = T.horizontal_zoom(cur, 300.0, 500.0, 1000.0, W)
    assert out["pxPerSec"] == pytest.approx(150.0)
    anchor_before = cur["startSec"] + 300.0 / cur["pxPerSec"]
    anchor_after = out["startSec"] + 300.0 / out["pxPerSec"]
    assert anchor_after == pytest.approx(anchor_before)


def test_horizontal_scroll_half_delta():
    cur = {"startSec": 10.0, "pxPerSec": 100.0}
    out = T.horizontal_scroll(cur, 40.0, 1000.0, W)
    assert out["startSec"] == pytest.approx(10.0 + 0.5 * 40.0 / 100.0)


# ---------------------------------------------------------------------------
# height zoom + scroll correction — MainViewer.tsx:414-489


def test_calc_zoomed_height_clamps_and_rounds():
    assert T.calc_zoomed_height(160, 20.4) == 180
    assert T.calc_zoomed_height(160, 20.5) == 181  # JS Math.round half-up
    assert T.calc_zoomed_height(160, -2000) == T.MIN_HEIGHT
    assert T.calc_zoomed_height(4990, 2000) == T.MAX_HEIGHT


def test_scroll_correction_keeps_cursor_row_point_fixed():
    # rows at 160px pitch; cursor inside row 1; the row-relative fraction
    # under the cursor must be identical at the new height
    rows = [0.0, 160.0, 320.0]
    cur_h = base_h = 160.0
    new_h = 200.0
    cursor_y, scroll_top, header = 250.0, 40.0, 24.0
    st = T.calc_scroll_top_at_cursor(rows, cur_h, base_h, new_h, cursor_y, scroll_top, header)
    content_before = scroll_top + cursor_y - header
    row = 1
    frac_before = (content_before - rows[row] ) / base_h
    content_after = st + cursor_y - header
    new_row_top = rows[row] + row * (new_h - cur_h)
    frac_after = (content_after - new_row_top) / new_h
    assert frac_after == pytest.approx(frac_before)


def test_scroll_correction_identity_when_height_unchanged():
    rows = [0.0, 160.0, 320.0]
    st = T.calc_scroll_top_at_cursor(rows, 160.0, 160.0, 160.0, 123.0, 77.0, 24.0)
    assert st == pytest.approx(77.0)


def test_scroll_correction_below_last_row():
    # cursor past the last row bottom: distance below the content end is
    # preserved (MainViewer.tsx:470-476)
    rows = [0.0, 160.0]
    cur_h = base_h = 160.0
    new_h = 320.0
    cursor_y, scroll_top, header = 900.0, 0.0, 0.0
    st = T.calc_scroll_top_at_cursor(rows, cur_h, base_h, new_h, cursor_y, scroll_top, header)
    content_before = scroll_top + cursor_y - header
    below_before = content_before - (rows[1] + base_h)
    new_last_top = rows[1] + 1 * (new_h - cur_h)
    content_after = st + cursor_y - header
    below_after = content_after - (new_last_top + new_h)
    assert below_after == pytest.approx(below_before)


def test_zoom_height_at_cursor_empty_rows():
    assert T.zoom_height_at_cursor([], 160, 160, 100, 50, 0, 0) is None


# ---------------------------------------------------------------------------
# follow-playhead / select-cursor — MainViewer.tsx:853-871


def test_follow_playhead_only_outside_view():
    assert T.follow_playhead_start_sec(5.0, 0.0, 10.0) is None  # inside
    assert T.follow_playhead_start_sec(12.0, 0.0, 10.0) == 12.0  # past end
    assert T.follow_playhead_start_sec(1.0, 3.0, 10.0) == 1.0  # before view
    assert T.follow_playhead_start_sec(None, 0.0, 10.0) is None


def test_select_sec_auto_scroll_shift_and_recenter():
    # paused cursor moved by +2s while off-screen right: view shifts by diff
    out = T.select_sec_auto_scroll(12.0, 10.0, 0.0, 10.0, W, 100.0)
    assert out == pytest.approx(2.0)
    # inside the view -> no scroll
    assert T.select_sec_auto_scroll(5.0, 4.0, 0.0, 10.0, W, 100.0) is None
    # big jump where the shifted view's END lands exactly on the cursor:
    # newEndSec < selectSec is FALSE (strict), so the shift stands
    out = T.select_sec_auto_scroll(100.0, 10.0, 0.0, 10.0, W, 100.0)
    assert out == pytest.approx(90.0)
    # shifted view still misses the cursor -> recenter on it
    out = T.select_sec_auto_scroll(100.0, 10.0, 20.0, 30.0, W, 100.0)
    assert out == pytest.approx(100.0 - W / 100.0 / 2)
    # no movement -> no scroll
    assert T.select_sec_auto_scroll(12.0, 12.0, 0.0, 10.0, W, 100.0) is None


def test_player_position_extrapolation():
    anchor = {"positionSec": 3.0, "at": 1000.0, "isPlaying": True}
    assert T.player_position(anchor, 3500.0) == pytest.approx(5.5)
    anchor = {"positionSec": 3.0, "at": 1000.0, "isPlaying": False}
    assert T.player_position(anchor, 99999.0) == 3.0


def test_playing_track_start_sec_pending_seek_ttl():
    """reference: usePlayer.ts:26,92-110 — a seek within the 1 s TTL wins the
    track switch; otherwise live playing position; otherwise select cursor."""
    paused = {"positionSec": 6.0, "at": 1000.0, "isPlaying": False}
    playing = {"positionSec": 6.0, "at": 1000.0, "isPlaying": True}
    pend = {"sec": 4.0, "atMs": 1000.0}
    assert T.TRACK_SWITCH_SEEK_TTL_MS == 1000
    # fresh pending seek wins regardless of play state
    assert T.playing_track_start_sec(pend, 1500.0, paused, 2.0, 10.0) == 4.0
    assert T.playing_track_start_sec(pend, 1500.0, playing, 2.0, 10.0) == 4.0
    # TTL boundary is inclusive (<=), one ms past it expires
    assert T.playing_track_start_sec(pend, 2000.0, paused, 2.0, 10.0) == 4.0
    assert T.playing_track_start_sec(pend, 2001.0, paused, 2.0, 10.0) == 2.0
    # expired while playing -> anchor position + elapsed
    assert T.playing_track_start_sec(pend, 3000.0, playing, 2.0, 10.0) == \
        pytest.approx(8.0)
    # no pending: paused -> select cursor; playing -> extrapolated position
    assert T.playing_track_start_sec(None, 1500.0, paused, 2.0, 10.0) == 2.0
    assert T.playing_track_start_sec(None, 1500.0, playing, 2.0, 10.0) == \
        pytest.approx(6.5)
    # elapsed clamps at 0 for a stale clock (usePlayer.ts:102 Math.max)
    assert T.playing_track_start_sec(None, 500.0, playing, 2.0, 10.0) == 6.0
    # clamped into [0, maxSec]
    assert T.playing_track_start_sec({"sec": 40.0, "atMs": 0.0}, 100.0,
                                     paused, 2.0, 10.0) == 10.0
    assert T.playing_track_start_sec(None, 0.0, paused, -3.0, 10.0) == 0.0


def test_jump_target_sec_select_vs_seek():
    """reference: usePlayer.ts:141-147 — playing jumps seek the player,
    paused jumps move the select cursor; both clamp to [0, maxSec]."""
    assert T.jump_target_sec(True, 3.0, 7.0, 1.0, 10.0) == \
        {"seekSec": 4.0, "selectSec": None}
    assert T.jump_target_sec(True, 9.5, 7.0, 1.0, 10.0) == \
        {"seekSec": 10.0, "selectSec": None}
    assert T.jump_target_sec(False, 3.0, 7.0, 5.0, 10.0) == \
        {"seekSec": None, "selectSec": 10.0}
    assert T.jump_target_sec(False, 3.0, 0.5, -1.0, 10.0) == \
        {"seekSec": None, "selectSec": 0.0}


def test_arrow_pan_start_sec():
    """reference: MainViewer.tsx:680-690 + constants/tracks.ts:14-15 —
    SHIFT_PX=40, BIG_SHIFT_PX=200 css px converted at the current zoom."""
    assert T.arrow_pan_start_sec(5.0, 100.0, True, False) == pytest.approx(5.4)
    assert T.arrow_pan_start_sec(5.0, 100.0, True, True) == pytest.approx(7.0)
    assert T.arrow_pan_start_sec(5.0, 100.0, False, False) == pytest.approx(4.6)
    assert T.arrow_pan_start_sec(5.0, 100.0, False, True) == pytest.approx(3.0)


# ---------------------------------------------------------------------------
# selection pivot semantics — useSelectedTracks.ts:13-113


def test_select_plain_click():
    out = T.select_track([3, 5], 5, 7, [3, 5, 7], {})
    assert out == {"selected": [7], "pivotId": 7, "isAdded": True}
    # clicking the only-selected id is a no-op
    out = T.select_track([7], 7, 7, [3, 5, 7], {})
    assert out["selected"] == [7] and out["isAdded"] is False


def test_select_command_click_add_and_remove():
    # add: id appended, becomes pivot (useSelectedTracks.ts:15-22)
    out = T.select_track([3], 3, 5, [3, 5, 7], {"command": True})
    assert out == {"selected": [3, 5], "pivotId": 5, "isAdded": True}
    # remove non-pivot: pivot kept (:24-31)
    out = T.select_track([3, 5], 5, 3, [3, 5, 7], {"command": True})
    assert out == {"selected": [5], "pivotId": 5, "isAdded": False}
    # remove the pivot: pivot moves to the LAST remaining in insertion order
    out = T.select_track([3, 7, 5], 5, 5, [3, 5, 7], {"command": True})
    assert out == {"selected": [3, 7], "pivotId": 7, "isAdded": False}
    # removing the only selected id is refused (:23)
    out = T.select_track([3], 3, 3, [3, 5, 7], {"command": True})
    assert out["selected"] == [3] and out["isAdded"] is False


def test_select_shift_click_extends_down_from_pivot():
    # pivot 3, shift-click 9 in display order [3,5,7,9]:
    # adds (pivot,id] in display order (useSelectedTracks.ts:33-50)
    out = T.select_track([3], 3, 9, [3, 5, 7, 9], {"shift": True})
    assert out == {"selected": [3, 5, 7, 9], "pivotId": 3, "isAdded": True}


def test_select_shift_click_extends_up_reversed():
    # selecting upward adds [id, pivot) REVERSED — nearest-to-pivot first
    out = T.select_track([7], 7, 3, [3, 5, 7, 9], {"shift": True})
    assert out == {"selected": [7, 5, 3], "pivotId": 7, "isAdded": True}


def test_select_shift_click_drops_after_pivot_adds():
    # after pivot-anchored run [5, 7, 9] (pivot 5), shift-click 3 drops the
    # old after-pivot adds and extends upward
    out = T.select_track([5, 7, 9], 5, 3, [3, 5, 7, 9], {"shift": True})
    assert out == {"selected": [5, 3], "pivotId": 5, "isAdded": True}


def test_select_shift_click_on_last_selected_noop():
    out = T.select_track([5, 7], 5, 7, [3, 5, 7, 9], {"shift": True})
    assert out["selected"] == [5, 7] and out["isAdded"] is False


def test_select_shift_dedupes_command_added():
    # cmd-added 9 sits before the pivot run; shift range re-adds it ->
    # the filter removes the stale entry first (useSelectedTracks.ts:44-47)
    out = T.select_track([9, 5], 5, 9, [3, 5, 7, 9], {"shift": True})
    assert out == {"selected": [5, 7, 9], "pivotId": 5, "isAdded": True}


def test_select_all_tracks():
    assert T.select_all_tracks([3, 5, 7], [3, 5, 7]) is None  # already all
    out = T.select_all_tracks([5], [3, 5, 7])
    assert out == {"selected": [3, 5, 7], "pivotId": 7}


def test_select_after_add_tracks():
    out = T.select_after_add_tracks([3, 5], [3, 5, 8, 9])
    assert out == {"selected": [8, 9], "pivotId": 9}
    assert T.select_after_add_tracks([3, 5], [3, 5]) is None


def test_select_after_remove_keeps_survivors():
    out = T.select_after_remove_tracks([3, 5, 7], [3, 7], [5, 7], 5)
    assert out == {"selected": [7], "pivotId": 7}  # pivot gone -> last survivor
    out = T.select_after_remove_tracks([3, 5, 7], [3, 7], [3, 7], 7)
    assert out == {"selected": [3, 7], "pivotId": 7}


def test_select_after_remove_walks_outward_from_pivot():
    # whole selection removed: nearest survivor from the previous pivot's
    # position, checking above first (useSelectedTracks.ts:99-110)
    # pivot was 3 (prev index 2); walk i=1: 2, 4 gone; i=2: 1 survives
    out = T.select_after_remove_tracks([1, 2, 3, 4, 5], [1, 5], [2, 3, 4], 3)
    assert out == {"selected": [1], "pivotId": 1}
    out = T.select_after_remove_tracks([1, 2, 3, 4, 5], [5], [1, 2, 3], 2)
    assert out == {"selected": [5], "pivotId": 5}
    assert T.select_after_remove_tracks([1], [], [1], 1) == {"selected": [], "pivotId": -1}


# ---------------------------------------------------------------------------
# freq axis — axis.rs pos<->hz + FreqAxis.tsx:30-195


def test_freq_pos_hz_roundtrip_and_f32_twin_agreement():
    from thesia_tpu.axis import markers as M
    from thesia_tpu.common.freqscale import FreqScale

    for scale in ("Linear", "Mel"):
        for pos in (0.0, 37.5, 150.0, 300.0):
            hz = T.freq_pos_to_hz(scale, pos, 300, 100.0, 8000.0, 12000.0)
            back = T.freq_hz_to_pos(scale, hz, 300, 100.0, 8000.0, 12000.0)
            assert back == pytest.approx(pos, abs=1e-6)
            # the backend axis twin (f32 WASM emulation) agrees to f32 eps
            ref = M.freq_pos_to_hz(FreqScale(scale), pos, 300, (100.0, 8000.0), 12000.0)
            assert hz == pytest.approx(ref, rel=2e-5)


def test_freq_axis_zones():
    assert T.freq_axis_cursor_state(10, 300) == "control-max-hz"
    assert T.freq_axis_cursor_state(150, 300) == "shift-hz-range"
    assert T.freq_axis_cursor_state(250, 300) == "control-min-hz"


def test_clamp_hz_bounds():
    assert T.clamp_max_hz(20000, 0, 12000) == INF  # above track max = full
    assert T.clamp_max_hz(50, 0, 12000) == T.MIN_HZ_RANGE
    assert T.clamp_min_hz(-5, 8000) == 0
    assert T.clamp_min_hz(7950, 8000) == 7900  # max - MIN_HZ_RANGE


def test_freq_max_drag_identity_and_direction():
    anchor = {"cursorAxisPos": 100.0, "hzRange": [0.0, 8000.0]}
    # no cursor movement -> top of range unchanged
    out = T.freq_max_drag(anchor, 100.0, 300.0, "Linear", 12000.0)
    assert out[1] == pytest.approx(8000.0)
    # dragging DOWN (pos increases) shrinks the relative freq under the
    # cursor less than the anchor -> max Hz grows
    out_down = T.freq_max_drag(anchor, 200.0, 300.0, "Linear", 12000.0)
    assert out_down[1] > 8000.0 or out_down[1] == INF
    out_up = T.freq_max_drag(anchor, 50.0, 300.0, "Linear", 12000.0)
    assert out_up[1] < 8000.0


def test_freq_min_drag_identity():
    anchor = {"cursorAxisPos": 250.0, "hzRange": [500.0, 8000.0]}
    out = T.freq_min_drag(anchor, 300.0, "Linear", 12000.0)
    # reference formula: anchor pos re-read against a cursor-tall axis
    expect = T.freq_pos_to_hz("Linear", 250.0, 300, 500.0, 8000.0, 12000.0)
    assert out[0] == pytest.approx(T.clamp_min_hz(expect, 8000.0))
    assert out[1] == 8000.0


def test_freq_shift_drag_translates_in_pos_space():
    # mid-range shift: both endpoints move through pos space (Mel-nonlinear)
    anchor = {
        "cursorAxisPos": 150.0, "hzRange": [1000.0, 6000.0],
        "zeroHzPos": T.freq_hz_to_pos("Mel", 0.0, 300, 1000.0, 6000.0, 12000.0),
        "maxTrackHzPos": T.freq_hz_to_pos("Mel", 12000.0, 300, 1000.0, 6000.0, 12000.0),
    }
    out = T.freq_shift_drag(anchor, 140.0, 300.0, "Mel", 12000.0)  # drag up 10px
    # shift=+10: window slides DOWN in relative-pos space by 10px -> lower Hz
    assert out[0] < 1000.0 and out[1] < 6000.0
    # sliding down past 0 Hz clamps at the zero position (tiny negative
    # float residue from the pos<->hz roundtrip is the JS behavior too)
    far = T.freq_shift_drag(anchor, 150.0 - 1e4, 300.0, "Mel", 12000.0)
    assert far[0] == pytest.approx(0.0, abs=1e-9)


def test_freq_shift_drag_full_range_is_identity():
    # at the full range both clamps engage exactly and cancel: any shift is
    # a no-op (the [0, inf] reset branch is defensive, below)
    anchor = {
        "cursorAxisPos": 150.0, "hzRange": [0.0, 12000.0],
        "zeroHzPos": 300.0, "maxTrackHzPos": 0.0,
    }
    out = T.freq_shift_drag(anchor, 100.0, 300.0, "Linear", 12000.0)
    assert out[0] == pytest.approx(0.0) and out[1] == pytest.approx(12000.0)


def test_freq_shift_drag_defensive_reset_branch():
    # FreqAxis.tsx:157-159: when both clamps leave minHzPos above the zero
    # position (window wider than the clampable span), reset to full
    anchor = {
        "cursorAxisPos": 150.0, "hzRange": [0.0, 12000.0],
        "zeroHzPos": 100.0, "maxTrackHzPos": 50.0,
    }
    out = T.freq_shift_drag(anchor, 150.0, 300.0, "Linear", 12000.0)
    assert out == [0, INF]


def test_freq_wheel_max_hz():
    out = T.freq_wheel_max_hz([0.0, 8000.0], 0.0, "Linear", 12000.0)
    assert out[1] == pytest.approx(8000.0)  # deltaY 0 = top of 500px axis
    out = T.freq_wheel_max_hz([0.0, 8000.0], 250.0, "Linear", 12000.0)
    assert out[1] == pytest.approx(4000.0)  # halfway down the virtual axis


def test_zoom_freq_range_at_anchor_and_reset():
    r = T.zoom_freq_range_at(None, 8000.0, "Linear", 0.5, 0.5)
    assert r is not None
    assert r[0] == pytest.approx(2000.0) and r[1] == pytest.approx(6000.0)
    # zooming out from full stays full (returns None)
    assert T.zoom_freq_range_at(None, 8000.0, "Linear", 1.3, 0.5) is None
    # anchored at the bottom: lower edge fixed
    r = T.zoom_freq_range_at([2000.0, 6000.0], 8000.0, "Linear", 0.5, 0.0)
    assert r[0] == pytest.approx(2000.0) and r[1] == pytest.approx(4000.0)


# ---------------------------------------------------------------------------
# amp axis — AmpAxis.tsx:31-108


def test_amp_drag_grabbed_value_follows_cursor():
    # invariant of the reference formula: the amp value grabbed at the
    # anchor ratio appears at the cursor ratio after the drag
    anchor = {"cursorRatio": 0.2, "ampRange": [-1.0, 1.0]}
    out = T.amp_drag("positive", 0.1, anchor)
    interval0, zero0 = T.calc_interval_zero_ratio([-1.0, 1.0])
    grabbed = interval0 * (zero0 - 0.2)
    interval1, zero1 = T.calc_interval_zero_ratio(out)
    at_cursor = interval1 * (zero1 - 0.1)
    assert at_cursor == pytest.approx(grabbed)
    assert out[0] == pytest.approx(-out[1])  # symmetric stays symmetric


def test_amp_drag_cursor_limited_near_zero():
    anchor = {"cursorRatio": 0.2, "ampRange": [-1.0, 1.0]}
    # cursor crossing the zero line is pinned 0.01 away (tracks.ts:203)
    out = T.amp_drag("positive", 0.6, anchor)
    limited = 0.5 - T.MIN_DIST_FROM_0_FOR_DRAG
    expect_interval = (2.0 * (0.2 - 0.5)) / (limited - 0.5)
    assert out[1] == pytest.approx(min(expect_interval * 0.5, T.MAX_ABS_AMP_RANGE))


def test_amp_range_clamped():
    assert T.clamp_amp_range([-50, 50]) == [-5, 5]
    assert T.clamp_amp_range([-1e-9, 1e-9]) == [-1e-5, 1e-5]


def test_amp_wheel_zoom():
    out = T.amp_wheel([-1.0, 1.0], -500.0)  # wheel up doubles the interval
    assert out == [-2.0, 2.0]
    out = T.amp_wheel([-1.0, 1.0], 250.0)
    assert out == [-0.5, 0.5]
    out = T.amp_wheel([-1.0, 1.0], 1e9)  # interval floor at 0 -> min clamp
    assert out == [-1e-5, 1e-5]


def test_amp_axis_cursor_state():
    assert T.amp_axis_cursor_state(10, 160) == "positive"
    assert T.amp_axis_cursor_state(90, 160) == "negative"


# ---------------------------------------------------------------------------
# overview lens — Overview.tsx:109-183


def test_overview_cursor_states():
    # lens [100, 200] px: THICKNESS=3 zones on either edge
    args = (1.0, 1.0, 100.0)  # startSec=1s, lens=1s, pxPerSec=100 -> [100,200]
    assert T.overview_cursor_state(97, *args) == "left"
    assert T.overview_cursor_state(103, *args) == "left"
    assert T.overview_cursor_state(104, *args) == "inlens"
    assert T.overview_cursor_state(196, *args) == "inlens"
    assert T.overview_cursor_state(197, *args) == "right"
    assert T.overview_cursor_state(204, *args) == "outlens"
    assert T.overview_cursor_state(50, *args) == "outlens"


def test_overview_drag_anchor():
    # inside the lens: anchored at the grab fraction
    a = T.overview_drag_anchor("inlens", 150.0, 1000.0, 100.0, 10.0, 10.0)
    # sec at x=150 of 1000px/100s = 15s; (15-10)/10 = 0.5
    assert a == pytest.approx(0.5)
    assert T.overview_drag_anchor("outlens", 150.0, 1000.0, 100.0, 10.0, 10.0) == 0.5
    assert T.overview_drag_anchor("left", 0.0, 1000.0, 100.0, 10.0, 10.0) == 0.5


def test_overview_wave_level():
    assert T.overview_wave_level(600_000, 600) == 10  # 1024 spb -> 586 bins
    assert T.overview_wave_level(500, 600) == 0


def test_colorbar_color_index_endpoints():
    n = 258
    assert T.colorbar_color_index(0, 48, n) == n - 1  # top = max dB = white
    assert T.colorbar_color_index(47, 48, n) == 1  # bottom = first real color
    for y in range(48):
        idx = T.colorbar_color_index(y, 48, n)
        assert 1 <= idx <= n - 1  # index 0 (reserved black) never used


# ---------------------------------------------------------------------------
# misc formulas + JS numeric semantics


def test_fit_and_splitter_and_scrub():
    assert T.fit_px_per_sec(W, 100.0) == 10.0
    assert T.splitter_width(200, -500) == 90
    assert T.splitter_width(200, 500) == 480
    assert T.scrub_sec_at(500.0, 100.0, 10.0, 100.0) == pytest.approx(14.0)
    assert T.scrub_sec_at(0.0, 100.0, 0.5, 100.0) == 0.0  # clamped at 0


def test_jump_amounts():
    assert T.jump_amount_sec(False) == 1.0
    assert T.jump_amount_sec(True) == 5.0


def test_fmt_time_goldens():
    assert T.fmt_time(0) == "00:00:00.000"
    # 3725.678 % 1 = 0.67799999... in binary; JS floors to 677 the same way
    assert T.fmt_time(3725.678) == "01:02:05.677"
    assert T.fmt_time(3725.5) == "01:02:05.500"
    assert T.fmt_time(59.9999) == "00:00:59.999"  # floor-to-ms, no rounding up
    assert T.fmt_time(-5) == "00:00:00.000"
    assert T.fmt_time(float("nan")) == "00:00:00.000"


def test_sr_khz_label():
    # TrackSummary.tsx:19 `${sampleRate / 1000}` — plain JS number→string
    assert T.sr_khz_label(16000) == "16"
    assert T.sr_khz_label(44100) == "44.1"
    assert T.sr_khz_label(22050) == "22.05"
    assert T.sr_khz_label(8000) == "8"
    assert T.sr_khz_label(192000) == "192"


def test_track_meta_line():
    # TrackSummary.tsx:159-165: conditional " | " segments
    assert T.track_meta_line("wav", "16 bit", "", 16000) == "wav | 16 bit | 16 kHz"
    assert T.track_meta_line("mp3", "", "257 kbps", 44100) \
        == "mp3 | 257 kbps | 44.1 kHz"
    assert T.track_meta_line("flac", "24 bit", "", 22050) \
        == "flac | 24 bit | 22.05 kHz"
    assert T.track_meta_line("ogg - vorbis", "", "", 48000) \
        == "ogg - vorbis | 48 kHz"


def test_lufs_label():
    # TrackSummary.tsx:12,20: formatNumberLabel(lufs, 2) + " LUFS"; the
    # number formatting itself is the backend axis command, golden-tested
    # in tests/test_axis.py — here the unit join and non-finite branch
    from thesia_tpu.axis import format_number_label

    assert T.lufs_label(format_number_label(-26.203317050290, 2)) \
        == "-26.20 LUFS"
    assert T.lufs_label(T.non_finite_number_label(float("-inf"))) \
        == "-∞ LUFS"
    assert T.non_finite_number_label(float("inf")) == "+∞"
    assert T.non_finite_number_label(float("nan")) == "nan"


def test_js_to_fixed_tie_semantics():
    # ECMA-262 21.1.3.3: the sign splits off FIRST (step 6a), THEN exact
    # decimal ties on the magnitude pick the larger n — so -0.25 rounds to
    # "-0.3", NOT "-0.2" (engines format the unsigned significand and
    # prepend the sign).  Cross-pinned in tests/test_jsinterp_spec.py.
    assert T._js_to_fixed(0.25, 1) == "0.3"
    assert T._js_to_fixed(-0.25, 1) == "-0.3"
    assert T._js_to_fixed(-2.5, 0) == "-3"  # diverges from Math.round(-2.5) == -2
    assert T._js_to_fixed(1.005, 2) == "1.00"  # 1.005 is below the tie in binary
    assert T._js_to_fixed(2.5, 0) == "3"
    assert T._js_to_fixed(-0.04, 1) == "-0.0"  # negative dust keeps the sign
    assert T._js_to_fixed(-0.0, 1) == "0.0"  # -0 itself does not


def test_js_round_semantics():
    assert T._js_round(0.5) == 1
    assert T._js_round(1.5) == 2
    assert T._js_round(-0.5) == 0  # JS Math.round(-0.5) === -0
    assert T._js_round(-1.5) == -1


# ---------------------------------------------------------------------------
# axis hover tooltips — wasm-wrapper.ts:120-148 (getValueAndResolution +
# formatLinearAxisTooltip args), TimeAxis.tsx:79-90, FreqAxis.tsx:214-221,
# AmpAxis.tsx:123-130


def test_adjacent_axis_position_steps_inward_at_edges():
    # lower half steps +1, clamped at axisLength; upper half steps -1,
    # clamped at 0 (wasm-wrapper.ts:125-128)
    assert T.adjacent_axis_position(10.0, 100.0) == 11.0
    assert T.adjacent_axis_position(50.0, 100.0) == 51.0  # <= length/2 -> +1
    assert T.adjacent_axis_position(51.0, 100.0) == 50.0
    assert T.adjacent_axis_position(100.0, 100.0) == 99.0
    assert T.adjacent_axis_position(0.0, 100.0) == 1.0
    # degenerate 0-length axis: both clamps collapse to the same pixel
    assert T.adjacent_axis_position(0.0, 0.0) == 0.0


def test_linear_pos_to_value_top_down():
    # AmpAxis.tsx:124 — ampRange[1] at pos 0, ampRange[0] at pos L
    assert T.linear_pos_to_value(0.0, 200.0, 1.0, -1.0) == 1.0
    assert T.linear_pos_to_value(200.0, 200.0, 1.0, -1.0) == -1.0
    assert T.linear_pos_to_value(50.0, 200.0, 1.0, -1.0) == pytest.approx(0.5)


def test_tick_unit_first_positive_gap():
    # wasm-wrapper.ts:143-147 — first |adjacent difference| > 0 of the
    # finite-filtered tick values; NaN if none
    assert T.tick_unit_from_values([0.0, 0.25, 0.5]) == pytest.approx(0.25)
    assert T.tick_unit_from_values([0.5, 0.5, 0.25]) == pytest.approx(0.25)
    inf = float("inf")
    assert T.tick_unit_from_values([inf, 0.5, 0.25]) == pytest.approx(0.25)
    assert math.isnan(T.tick_unit_from_values([0.5, 0.5]))
    assert math.isnan(T.tick_unit_from_values([]))


def test_linear_tooltip_args_amp_axis_example():
    # amp axis, range [-1, 1], 200 px, cursor at 50 px (value 0.5): the
    # resolution is one pixel of travel = 2/200 = 0.01
    markers = [[0.0, "1"], [0.5, "0"], [1.0, "-1"]]
    got = T.linear_tooltip_args(50.0, 200.0, 1.0, -1.0, markers)
    assert got["value"] == pytest.approx(0.5)
    assert got["resolution"] == pytest.approx(0.01)
    assert got["tickUnit"] == pytest.approx(1.0)
    # ratios outside [0,1] are clamped to the axis before evaluating
    # (wasm-wrapper.ts:141)
    got = T.linear_tooltip_args(50.0, 200.0, 1.0, -1.0, [[-0.5, ""], [2.0, ""]])
    assert got["tickUnit"] == pytest.approx(2.0)


def test_linear_tooltip_args_feed_engine_formatter():
    # end-to-end: the twin's args through the real formatter reproduce the
    # reference AmpAxis hover string (formatLinearAxisTooltip default
    # maxFractionDigits=9)
    from thesia_tpu import axis as ax

    markers = [[0.0, "1"], [0.25, "0.5"], [0.5, "0"], [0.75, "-0.5"], [1.0, "-1"]]
    got = T.linear_tooltip_args(50.0, 200.0, 1.0, -1.0, markers)
    s = ax.format_linear_axis_tooltip(
        got["value"], got["resolution"], got["tickUnit"], 9
    )
    # resolution 0.01 -> 2 fraction digits (axis.rs:563-592)
    assert s == "0.50"


def test_time_tooltip_display_extension():
    # TimeAxis.tsx:82-90 — one extra fractional digit; plain-seconds formats
    # carry a " s" suffix on the label
    assert T.time_tooltip_display("mm:ss.xx") == {
        "display": "mm:ss.xxx", "appendSeconds": False,
    }
    assert T.time_tooltip_display("mm:ss") == {
        "display": "mm:ss.x", "appendSeconds": False,
    }
    assert T.time_tooltip_display("ss.x") == {
        "display": "ss.xx", "appendSeconds": True,
    }
    assert T.time_tooltip_display("ss") == {
        "display": "ss.x", "appendSeconds": True,
    }


def test_freq_tooltip_label():
    # FreqAxis.tsx:221
    assert T.freq_tooltip_label("12.3k") == "12.3 kHz"
    assert T.freq_tooltip_label("440") == "440 Hz"
    assert T.freq_tooltip_label("1k5") == "1k5 Hz"  # only a trailing k splits


def test_freq_tooltip_args_matches_engine_scale():
    # wasm-wrapper.ts:150-158 — hz at the cursor plus a 1-px resolution,
    # both through the same freq-scale mapping the axis draws with
    from thesia_tpu import axis as ax
    from thesia_tpu.common.freqscale import FreqScale

    got = T.freq_tooltip_args("Mel", 40.0, 300.0, 0.0, 8000.0, 8000.0)
    want = ax.freq_pos_to_hz(FreqScale("Mel"), 40.0, 300.0, (0.0, 8000.0), 8000.0)
    # the client twin runs in f64 while the engine emulates the reference's
    # f32 wasm — agreement to f32 precision, not bit-exact
    assert got["hz"] == pytest.approx(want, rel=1e-6)
    adj = ax.freq_pos_to_hz(FreqScale("Mel"), 41.0, 300.0, (0.0, 8000.0), 8000.0)
    assert got["resolutionHz"] == pytest.approx(abs(adj - want), rel=1e-4)
    # upper half steps -1 px instead
    hi = T.freq_tooltip_args("Linear", 300.0, 300.0, 0.0, 8000.0, 8000.0)
    assert hi["hz"] == pytest.approx(0.0, abs=1e-9)
    assert hi["resolutionHz"] == pytest.approx(8000.0 / 300.0, rel=1e-9)


# ---------------------------------------------------------------------------
# control panel — FloatRangeInput.tsx + Control.tsx


def test_float_range_text_commit_fallback_chain():
    # FloatRangeInput.tsx:104-121: text -> slider -> pre-focus value
    assert T.float_range_text_commit("70", "100", 100.0, 40, 120) == {
        "value": 70.0, "changed": True,
    }
    assert T.float_range_text_commit("abc", "85", 100.0, 40, 120) == {
        "value": 85.0, "changed": True,
    }
    assert T.float_range_text_commit("abc", "junk", 100.0, 40, 120) == {
        "value": 100.0, "changed": False,
    }
    # clamp to [min, max] before the changed comparison
    assert T.float_range_text_commit("999", "100", 120.0, 40, 120) == {
        "value": 120.0, "changed": False,
    }
    assert T.float_range_text_commit("-999", "100", 100.0, 40, 120) == {
        "value": 40.0, "changed": True,
    }


def test_float_range_reset_click():
    # FloatRangeInput.tsx:83-87: dblclick or alt+click, primary button only
    assert T.float_range_reset_click(0, 2, False)
    assert T.float_range_reset_click(0, 1, True)
    assert not T.float_range_reset_click(0, 1, False)
    assert not T.float_range_reset_click(1, 2, False)
    assert not T.float_range_reset_click(0, 3, False)


def test_win_millisec_commit():
    # Control.tsx:97-110: <1 clamps to MIN_WIN_MILLISEC=1.0, null restores
    assert T.win_millisec_commit("20", 40.0) == {"set": 20.0, "display": "20.0"}
    assert T.win_millisec_commit("0.25", 40.0) == {"set": 1.0, "display": "1.0"}
    assert T.win_millisec_commit("-5", 40.0) == {"set": 1.0, "display": "1.0"}
    assert T.win_millisec_commit(None, 40.0) == {"set": None, "display": "40.0"}
    assert T.win_millisec_commit("garbage", 42.5) == {
        "set": None, "display": "42.5",
    }
    assert T.win_millisec_commit("12.345", 40.0) == {
        "set": 12.345, "display": "12.3",
    }


def test_normalize_select_target_per_type_memory():
    # Control.tsx:66-71,118-143: PeakdB keeps its own target; LUFS/RMSdB
    # share one; Off carries no target
    assert T.normalize_select_target("Off", -1.5, -23.0) == {"type": "Off"}
    assert T.normalize_select_target("PeakdB", -1.5, -23.0) == {
        "type": "PeakdB", "target": -1.5,
    }
    assert T.normalize_select_target("LUFS", -1.5, -23.0) == {
        "type": "LUFS", "target": -23.0,
    }
    assert T.normalize_select_target("RMSdB", -1.5, -23.0) == {
        "type": "RMSdB", "target": -23.0,
    }


def test_split_supported_paths():
    # App.tsx:85-92 + tracks.ts:5: raw case-sensitive extension check
    out = T.split_supported_paths(
        ["a.wav", "b.mp3", "c.txt", "noext", "e.WAV", "tail."])
    assert out["supported"] == ["a.wav", "b.mp3"]
    assert out["unsupported"] == ["c.txt", "noext", "e.WAV", "tail."]
    assert T.SUPPORTED_TYPES == [
        "aac", "flac", "m4a", "mp3", "oga", "ogg", "opus", "wav",
    ]


def test_file_drop_index():
    # MainViewer.tsx:175-189: first track whose midpoint is below the cursor
    tops, heights = [0.0, 160.0, 320.0], [160.0, 160.0, 160.0]
    assert T.file_drop_index(50, tops, heights) == 0  # above row 0 midpoint
    assert T.file_drop_index(100, tops, heights) == 1  # past row 0 midpoint
    assert T.file_drop_index(250, tops, heights) == 2
    assert T.file_drop_index(1000, tops, heights) == 3  # past every midpoint
    assert T.file_drop_index(10, [], []) == 0


def test_zoom_step_delta_golden():
    # MainViewer.tsx:714-717: 2^(floor(log2(base)) - 1.2)
    assert T.zoom_step_delta(160, False) == pytest.approx(2 ** 5.8)
    assert T.zoom_step_delta(160, True) == pytest.approx(-(2 ** 5.8))
    assert T.zoom_step_delta(1.0, False) == pytest.approx(2 ** -1.2)


def test_zoom_lens_at_select_anchors_select_cursor():
    # MainViewer.tsx:735-748: the select cursor keeps its pixel position
    cur = {"startSec": 2.0, "pxPerSec": 500.0}
    sel = 3.0
    out = T.zoom_lens_at_select(cur, sel, False, 44.0, 800.0)
    assert out["pxPerSec"] > cur["pxPerSec"]
    px_before = (sel - cur["startSec"]) * cur["pxPerSec"]
    px_after = (sel - out["startSec"]) * out["pxPerSec"]
    assert px_after == pytest.approx(px_before, rel=1e-9)
    # zoom-out shrinks pxPerSec and still anchors (no clamp in range)
    out2 = T.zoom_lens_at_select(cur, sel, True, 44.0, 800.0)
    assert out2["pxPerSec"] < cur["pxPerSec"]
    assert (sel - out2["startSec"]) * out2["pxPerSec"] == pytest.approx(
        px_before, rel=1e-9)


def test_freq_zoom_scroll_top_keeps_content_middle():
    # MainViewer.tsx:691-721: the row under the view middle keeps its
    # fractional offset after the height change
    base, new, st, view, rows = 160.0, 200.0, 300.0, 600.0, 10
    out = T.freq_zoom_scroll_top(base, new, st, view, rows)
    mid_before = st + view / 2
    mid_after = out + view / 2
    row = int(mid_before // base)
    assert mid_after == pytest.approx(
        row * new + (mid_before - row * base) / base * new)
    # no rows -> None (reference returns early)
    assert T.freq_zoom_scroll_top(base, new, st, view, 0) is None
    # middle beyond the last row clamps to it (findIndex -1 branch)
    out2 = T.freq_zoom_scroll_top(base, new, 5000.0, view, 3)
    assert out2 == pytest.approx(2 * new + (5300.0 - 2 * base) / base * new - 300.0)


def test_next_track_on_arrow():
    # MainViewer.tsx:783-795
    ids = [3, 1, 4]
    assert T.next_track_on_arrow(ids, [3], True) == 1
    assert T.next_track_on_arrow(ids, [4], True) == 4  # clamped at end
    assert T.next_track_on_arrow(ids, [1, 4], False) == 1  # from RECENT (4)
    assert T.next_track_on_arrow(ids, [], True) == 3  # -1 + 1 = first
    assert T.next_track_on_arrow(ids, [], False) == 3  # clamped at start
    assert T.next_track_on_arrow([], [1], True) is None


def test_overview_lane_layout_golden():
    # OverviewWaveformViewport.tsx:385-389,407-417: gap 1, gain ratio 0.2
    lanes = T.overview_lane_layout(2, 61, True)
    assert lanes == [
        {"y": 6.0, "height": 18.0, "gainHeight": 6.0},
        {"y": 37.0, "height": 18.0, "gainHeight": 6.0},
    ]
    lanes = T.overview_lane_layout(1, 50, False)
    assert lanes == [{"y": 0.0, "height": 50.0, "gainHeight": 0}]


def test_amp_range_from_bins_seeded():
    # calcAmpRange seeds [-1, 1] and only widens (:43-55)
    assert T.amp_range_from_bins([[-0.5, 0.5, 0.0]]) == [-1.0, 1.0]
    assert T.amp_range_from_bins([[-0.5, 0.5, 0.0], [-2.0, 3.0, 0.1]]) \
        == [-2.0, 3.0]
    assert T.amp_range_from_bins([]) == [-1.0, 1.0]


def test_limiter_gain_envelopes_reference_exact():
    """Hand-executed goldens of OverviewWaveformViewport.tsx:57-111 over
    gainRange [0.5, 1]: gainToY(g) = 20 - 20 g at height 10."""
    # unity everywhere -> no envelopes
    assert T.calc_limiter_gain_envelopes([1, 1, 1, 1], 8, 10, [0.5, 1]) == []
    # one dip: opens at the first sub-unity column's xFloor, per-column
    # midpoints at min-gain depth, closes back at unity
    assert T.calc_limiter_gain_envelopes(
        [1.0, 0.8, 0.6, 1.0], 8, 10, [0.5, 1]
    ) == [[[2.0, 0.0], [2.5, 4.0], [4.5, 8.0], [6.0, 0.0]]]
    # trailing sub-unity region closes at floor(lastX)+1 at the LAST
    # sample's gain depth (:104-108)
    assert T.calc_limiter_gain_envelopes(
        [1.0, 0.5], 4, 10, [0.5, 1]
    ) == [[[2.0, 0.0], [2.5, 10.0], [3.0, 10.0]]]
    # two separate dips -> two envelopes
    envs = T.calc_limiter_gain_envelopes(
        [0.9, 1.0, 1.0, 1.0, 0.9, 1.0, 1.0, 1.0], 8, 10, [0.5, 1]
    )
    assert len(envs) == 2
    # degenerate inputs
    assert T.calc_limiter_gain_envelopes([], 10, 10, [0.5, 1]) == []
    assert T.calc_limiter_gain_envelopes([0.9], 0, 10, [0.5, 1]) == []


def test_channel_label_matches_reference_table():
    # constants/tracks.ts:8-12 via TrackInfo.tsx:85-88
    assert T.channel_label(1, 0) == "M"
    assert T.channel_label(2, 0) == "L"
    assert T.channel_label(2, 1) == "R"
    # past the table the reference's `CHANNEL[nCh][ch] || ""` has no row
    # (it would throw there); every out-of-table channel is ""
    assert T.channel_label(4, 0) == ""
    assert T.channel_label(4, 3) == ""
    assert T.channel_label(1, 1) == ""


def test_control_constants_match_reference():
    # constants/tracks.ts:196,205; Control.tsx:302 (detents[len-2]);
    # Control.tsx:63-68 (per-family memory seeds)
    assert T.MIN_WIN_MILLISEC == 1.0
    assert T.MIN_COMMON_NORMALIZE_DB == -40.0
    assert T.DB_RANGE_DBLCLICK == 100.0
    assert T.NORMALIZE_PEAK_DEFAULT_DB == 0.0
    assert T.NORMALIZE_DB_DEFAULT == -18.0
