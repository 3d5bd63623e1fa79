"""Differential execution: the ACTUAL viewer JavaScript (applogic.js +
freqscale.js, run through tests/jsinterp.py's ES-subset interpreter) versus
the Python twins (thesia_tpu/viewer/twin_app.py) on case batteries per
function.

twin_app is golden-tested against the reference formulas
(test_viewer_applogic.py); this module closes the remaining gap — a sign
flip or dropped clamp in the .js that the hand-written mirror didn't copy
now FAILS the suite, instead of shipping silently (no JS runtime exists in
this image otherwise).  Every TWINNED export must have a case battery here;
the completeness test enforces it.
"""

import math

import pytest

from tests.jsinterp import UNDEF, load_viewer_logic
from thesia_tpu.viewer import twin_app as T

RNG_SEED = 20260817


@pytest.fixture(scope="module")
def js():
    return load_viewer_logic().global_env.vars


def _to_js(v):
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, (list, tuple)):
        return [_to_js(x) for x in v]
    if isinstance(v, dict):
        return {k: _to_js(x) for k, x in v.items()}
    return v


def _norm(v):
    """Normalize twin/JS results for comparison."""
    if v is UNDEF:
        return None
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return f
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    return v


def _eq(a, b, path=""):
    if isinstance(a, list) and isinstance(b, list):
        assert len(a) == len(b), f"{path}: len {len(a)} != {len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            _eq(x, y, f"{path}[{i}]")
        return
    if isinstance(a, dict) and isinstance(b, dict):
        assert set(a) == set(b), f"{path}: keys {set(a)} != {set(b)}"
        for k in a:
            _eq(a[k], b[k], f"{path}.{k}")
        return
    if isinstance(a, float) and isinstance(b, float):
        if math.isinf(a) or math.isinf(b):
            assert a == b, f"{path}: {a} != {b}"
            return
        assert a == pytest.approx(b, rel=1e-12, abs=1e-12), f"{path}: {a} != {b}"
        return
    assert a == b, f"{path}: {a!r} != {b!r}"


def check(js_env, name, *args):
    twin = T.TWINNED[name]
    js_args = [_to_js(a) for a in args]
    got_js = _norm(js_env[name](*js_args))
    got_py = _norm(twin(*args))
    _eq(got_py, got_js, name)


import numpy as _np

_rng = _np.random.default_rng(RNG_SEED)


def _floats(n, lo, hi):
    return [float(x) for x in _rng.uniform(lo, hi, n)]


# ---------------------------------------------------------------------------
# case batteries.  Each entry: list of args tuples passed to both sides.

def _lens_cases():
    cases = []
    for s in (-5.0, 0.0, 20.0, 55.0, 99.999, 120.0):
        for pps in (1e-9, 0.5, 10.0, 100.0, 5e5):
            cases.append((s, pps, 100.0, 1000.0))
    cases.append((3.0, 10.0, 5.0, 1000.0))
    return cases


def _cur(s, p):
    return {"startSec": s, "pxPerSec": p}


_ANCHOR_PAUSED = {"positionSec": 6.0, "at": 1000.0, "isPlaying": False}
_ANCHOR_PLAYING = {"positionSec": 6.0, "at": 1000.0, "isPlaying": True}

CASES = {
    "normalizeStartSec": _lens_cases(),
    "normalizePxPerSec": [
        (p, s, 100.0, 1000.0)
        for p in (1e-12, 5.0, 50.0, 1e9)
        for s in (0.0, 50.0, 100.0 - 1e-3, 100.0, 120.0)
    ],
    "updateLensParams": [
        (_cur(50.0, 100.0), {"startSec": 55.0, "pxPerSec": 20.0}, 60.0, 1000.0),
        (_cur(0.0, 1.0), {"pxPerSec": 10.0}, 100.0, 1000.0),
        (_cur(10.0, 100.0), {}, 100.0, 1000.0),
        (_cur(10.0, 100.0), {"startSec": -3.0}, 100.0, 1000.0),
        (_cur(0.0, 10.0), {"pxPerSec": 1e9}, 100.0, 1000.0),
    ],
    "moveLensStartSec": [
        (30.0, a, 100.0, 1000.0) for a in (0.0, 0.25, 0.5, 1.0)
    ],
    "timeAxisDragAnchor": [
        (x, 1000.0, s, p)
        for x in (0.0, 120.0, 999.0)
        for s in (0.0, 33.5)
        for p in (0.5, 100.0)
    ],
    "timeAxisDragStartSec": [
        ({"cursorRatio": r, "sec": s}, x, 1000.0, p)
        for r in (0.0, 0.4, 1.0)
        for s in (0.0, 42.0)
        for x in (0.0, 250.0, 1000.0)
        for p in (0.5, 100.0)
    ],
    "resizeLensLeft": [
        (_cur(10.0, 100.0), s, 100.0, 1000.0) for s in (-2.0, 5.0, 14.0, 19.99, 25.0)
    ],
    "resizeLensRight": [
        (_cur(10.0, 100.0), s, 100.0, 1000.0) for s in (9.0, 10.0, 14.0, 200.0)
    ],
    "classifyWheel": [
        ({"deltaX": dx, "deltaY": dy, "shiftKey": sk, "ctrlKey": ck, "altKey": ak}, ap)
        for dx in (0.0, 7.0)
        for dy in (5.0, 1.0, -3.0)
        for sk in (False, True)
        for ck in (False, True)
        for ak in (False, True)
        for ap in (False, True)
    ],
    "horizontalZoom": [
        (_cur(10.0, 100.0), x, d, 1000.0, 1000.0)
        for x in (0.0, 300.0, 999.0)
        for d in (-900.0, -100.0, 100.0, 500.0, 5000.0)
    ],
    "horizontalScroll": [
        (_cur(10.0, 100.0), d, 1000.0, 1000.0) for d in (-500.0, -40.0, 0.0, 40.0, 9999.0)
    ],
    "calcZoomedHeight": [
        (160.0, d) for d in (-2000.0, -20.5, -20.4, 0.0, 20.4, 20.5, 6000.0)
    ],
    "calcScrollTopAtCursor": [
        ([0.0, 160.0, 320.0], 160.0, 160.0, nh, cy, st, hh)
        for nh in (120.0, 160.0, 200.0, 480.0)
        for cy in (10.0, 250.0, 900.0)
        for st in (0.0, 40.0, 300.0)
        for hh in (0.0, 24.0)
    ] + [([], 160.0, 160.0, 200.0, 50.0, 0.0, 0.0)],
    "zoomHeightAtCursor": [
        ([0.0, 160.0], 160.0, 160.0, d, 100.0, 20.0, 0.0)
        for d in (-500.0, -50.0, 50.0, 500.0)
    ] + [([], 160.0, 160.0, 100.0, 50.0, 0.0, 0.0)],
    "followPlayheadStartSec": [
        (p, 0.0, 10.0) for p in (None, -1.0, 0.0, 5.0, 10.0, 10.1, 12.0)
    ] + [(1.0, 3.0, 10.0)],
    "selectSecAutoScroll": [
        (sel, prev, 0.0, 10.0, 1000.0, 100.0)
        for sel in (5.0, 10.0, 12.0, 100.0)
        for prev in (4.0, 10.0, 12.0)
    ] + [(100.0, 10.0, 20.0, 30.0, 1000.0, 100.0)],
    "playerPosition": [
        ({"positionSec": 3.0, "at": 1000.0, "isPlaying": True}, 3500.0),
        ({"positionSec": 3.0, "at": 1000.0, "isPlaying": False}, 99999.0),
    ],
    "clampSelectSec": [(5.0, 10.0), (-1.0, 10.0), (12.0, 10.0), (0.0, 0.0)],
    # usePlayer.ts:92-110: pending-seek TTL (fresh, boundary-exact, expired,
    # absent) x paused/playing anchors, plus clamping
    "playingTrackStartSec": [
        ({"sec": 4.0, "atMs": 1000.0}, 1500.0, _ANCHOR_PAUSED, 2.0, 10.0),
        ({"sec": 4.0, "atMs": 1000.0}, 2000.0, _ANCHOR_PAUSED, 2.0, 10.0),
        ({"sec": 4.0, "atMs": 1000.0}, 2000.1, _ANCHOR_PAUSED, 2.0, 10.0),
        ({"sec": 4.0, "atMs": 1000.0}, 1500.0, _ANCHOR_PLAYING, 2.0, 10.0),
        ({"sec": 40.0, "atMs": 1000.0}, 1500.0, _ANCHOR_PAUSED, 2.0, 10.0),
        (None, 1500.0, _ANCHOR_PAUSED, 2.0, 10.0),
        (None, 1500.0, _ANCHOR_PLAYING, 2.0, 10.0),
        (None, 500.0, _ANCHOR_PLAYING, 2.0, 10.0),
        (None, 99999.0, _ANCHOR_PLAYING, 2.0, 10.0),
        (None, 1500.0, _ANCHOR_PAUSED, -3.0, 10.0),
    ],
    "jumpTargetSec": [
        (True, 3.0, 7.0, 1.0, 10.0),
        (True, 9.5, 7.0, 1.0, 10.0),
        (True, 0.5, 7.0, -1.0, 10.0),
        (False, 3.0, 7.0, 5.0, 10.0),
        (False, 3.0, 9.5, 5.0, 10.0),
        (False, 3.0, 0.5, -1.0, 10.0),
    ],
    "arrowPanStartSec": [
        (5.0, 100.0, True, False),
        (5.0, 100.0, True, True),
        (5.0, 100.0, False, False),
        (5.0, 100.0, False, True),
        (0.0, 384000.0, True, False),
    ],
    "selectTrack": [
        ([3, 5], 5, 7, [3, 5, 7], {}),
        ([7], 7, 7, [3, 5, 7], {}),
        ([3], 3, 5, [3, 5, 7], {"command": True}),
        ([3, 5], 5, 3, [3, 5, 7], {"command": True}),
        ([3, 7, 5], 5, 5, [3, 5, 7], {"command": True}),
        ([3], 3, 3, [3, 5, 7], {"command": True}),
        ([3], 3, 9, [3, 5, 7, 9], {"shift": True}),
        ([7], 7, 3, [3, 5, 7, 9], {"shift": True}),
        ([5, 7, 9], 5, 3, [3, 5, 7, 9], {"shift": True}),
        ([5, 7], 5, 7, [3, 5, 7, 9], {"shift": True}),
        ([9, 5], 5, 9, [3, 5, 7, 9], {"shift": True}),
        ([5, 7], 5, 5, [3, 5, 7, 9], {"shift": True}),
    ],
    "selectAllTracks": [
        ([3, 5, 7], [3, 5, 7]),
        ([5], [3, 5, 7]),
        ([5, 3, 7], [3, 5, 7]),
    ],
    "selectAfterAddTracks": [
        ([3, 5], [3, 5, 8, 9]),
        ([3, 5], [3, 5]),
        ([], [1, 2]),
    ],
    "selectAfterRemoveTracks": [
        ([3, 5, 7], [3, 7], [5, 7], 5),
        ([3, 5, 7], [3, 7], [3, 7], 7),
        ([1, 2, 3, 4, 5], [1, 5], [2, 3, 4], 3),
        ([1, 2, 3, 4, 5], [5], [1, 2, 3], 2),
        ([1], [], [1], 1),
    ],
    "freqPosToHz": [
        (sc, pos, 300, 100.0, 8000.0, 12000.0)
        for sc in ("Linear", "Mel")
        for pos in (0.0, 37.5, 150.0, 300.0, -10.0)
    ],
    "freqHzToPos": [
        (sc, hz, 300, 100.0, 8000.0, 12000.0)
        for sc in ("Linear", "Mel")
        for hz in (100.0, 440.0, 4000.0, 8000.0)
    ],
    "freqAxisCursorState": [(p, 300.0) for p in (0.0, 99.0, 100.0, 199.0, 200.0, 299.0)],
    "clampMaxHz": [(20000.0, 0.0, 12000.0), (50.0, 0.0, 12000.0), (8000.0, 7950.0, 12000.0)],
    "clampMinHz": [(-5.0, 8000.0), (7950.0, 8000.0), (500.0, 8000.0)],
    "freqMaxDrag": [
        ({"cursorAxisPos": 100.0, "hzRange": [0.0, 8000.0]}, p, 300.0, sc, 12000.0)
        for p in (50.0, 100.0, 200.0, 299.0)
        for sc in ("Linear", "Mel")
    ],
    "freqMinDrag": [
        ({"cursorAxisPos": 250.0, "hzRange": [500.0, 8000.0]}, p, sc, 12000.0)
        for p in (0.5, 100.0, 300.0)
        for sc in ("Linear", "Mel")
    ],
    "freqShiftDrag": [
        (
            {"cursorAxisPos": 150.0, "hzRange": [1000.0, 6000.0],
             "zeroHzPos": z, "maxTrackHzPos": m},
            p, 300.0, sc, 12000.0,
        )
        for (z, m) in ((420.0, -80.0), (300.0, 0.0), (100.0, 50.0), (None, None))
        for p in (150.0, 140.0, 260.0, -800.0)
        for sc in ("Linear", "Mel")
    ],
    "freqWheelMaxHz": [
        ([0.0, 8000.0], d, sc, 12000.0)
        for d in (-200.0, 0.0, 250.0, 600.0)
        for sc in ("Linear", "Mel")
    ],
    "zoomFreqRangeAt": [
        (rng_, 8000.0, sc, f, a)
        for rng_ in (None, [2000.0, 6000.0], [0.0, 100.0])
        for sc in ("Linear", "Mel")
        for f in (0.5, 1.3, 100.0)
        for a in (0.0, 0.5, 1.0)
    ],
    "calcIntervalZeroRatio": [([-1.0, 1.0],), ([-0.5, 2.0],), ([-3.0, 0.25],)],
    "clampAmpRange": [([-50.0, 50.0],), ([-1e-9, 1e-9],), ([-0.5, 0.7],)],
    "limitAmpCursorRatio": [
        (st, r, [-1.0, 1.0])
        for st in ("positive", "negative")
        for r in (0.0, 0.3, 0.49, 0.5, 0.51, 0.9)
    ],
    "ampAxisCursorState": [(10.0, 160.0), (80.0, 160.0), (90.0, 160.0)],
    "ampDrag": [
        (st, r, {"cursorRatio": a, "ampRange": [-1.0, 1.0]})
        for st in ("positive", "negative")
        for r in (0.05, 0.3, 0.6, 0.95)
        for a in (0.2, 0.8)
    ],
    "ampWheel": [
        ([-1.0, 1.0], d) for d in (-500.0, -100.0, 0.0, 250.0, 499.0, 1e9)
    ],
    "adjacentAxisPosition": [
        (p, 100.0) for p in (0.0, 10.0, 50.0, 51.0, 99.0, 100.0)
    ] + [(0.0, 0.0)],
    "linearPosToValue": [
        (0.0, 200.0, 1.0, -1.0), (50.0, 200.0, 1.0, -1.0),
        (200.0, 200.0, 1.0, -1.0), (130.0, 260.0, 0.0, -120.0),
    ],
    "tickUnitFromValues": [
        ([0.0, 0.25, 0.5],), ([0.5, 0.5, 0.25],),
        ([float("inf"), 0.5, 0.25],), ([0.5, 0.5],), ([],),
        ([float("nan"), 3.0, 3.0, 7.0],),
    ],
    "linearTooltipArgs": [
        (50.0, 200.0, 1.0, -1.0, [[0.0, "1"], [0.5, "0"], [1.0, "-1"]]),
        (150.0, 200.0, 1.0, -1.0, [[-0.5, ""], [2.0, ""]]),
        (0.0, 260.0, 0.0, -120.0, [[r / 6, ""] for r in range(7)]),
        (260.0, 260.0, 0.0, -120.0, []),
    ],
    "timeTooltipDisplay": [
        ("mm:ss.xx",), ("mm:ss",), ("ss.x",), ("ss",), ("hh:mm:ss",),
    ],
    "freqTooltipLabel": [("12.3k",), ("440",), ("1k5",), ("2k",)],
    "freqTooltipArgs": [
        (sc, p, 300.0, 0.0, 8000.0, 8000.0)
        for sc in ("Linear", "Mel")
        for p in (0.0, 10.0, 150.0, 151.0, 300.0)
    ] + [("Mel", 40.0, 300.0, 200.0, 5000.0, 12000.0)],
    "overviewSecFromX": [(150.0, 1000.0, 100.0), (0.0, 600.0, 44.03)],
    "overviewCursorState": [
        (x, 1.0, 1.0, 100.0)
        for x in (50.0, 96.9, 97.0, 103.0, 104.0, 150.0, 196.0, 197.0, 203.0, 204.0)
    ],
    "overviewDragAnchor": [
        (st, 150.0, 1000.0, 100.0, 10.0, 10.0)
        for st in ("inlens", "outlens", "left", "right")
    ],
    "overviewWaveLevel": [(600000.0, 600.0), (500.0, 600.0), (57600000.0, 800.0), (1024.0, 0.0)],
    "overviewLaneLayout": [
        (1.0, 60.0, False), (2.0, 60.0, True), (4.0, 63.0, True),
        (3.0, 100.0, True), (2.0, 61.0, False),
    ],
    "ampRangeFromBins": [
        ([[-0.5, 0.5, 0.0, -1.2, 0.9, 0.1]],),
        ([[0.0, 0.0, 0.0], [-2.0, 3.0, 0.5]],),
        ([],),
        ([[-0.25, 0.25, 0.0]],),
    ],
    "overviewWavePoints": [
        ([-0.5, 0.5, 0.0, -1.5, 1.5, 0.1],
         {"y": 6.0, "height": 18.0, "gainHeight": 6.0},
         300.0, [-1.5, 1.5], False),
        ([-0.5, 0.5, 0.0, -1.5, 1.5, 0.1],
         {"y": 6.0, "height": 18.0, "gainHeight": 6.0},
         300.0, [-1.5, 1.5], True),
        ([], {"y": 0.0, "height": 50.0, "gainHeight": 0.0},
         300.0, [-1.0, 1.0], False),
        ([-1.0, 1.0, 0.0], {"y": 0.0, "height": 50.0, "gainHeight": 0.0},
         250.0, [-1.0, 1.0], False),
    ],
    "calcLimiterGainEnvelopes": [
        ([1.0, 1.0, 1.0, 1.0], 8.0, 10.0, [0.5, 1.0]),
        ([1.0, 0.8, 0.6, 1.0], 8.0, 10.0, [0.5, 1.0]),
        ([0.7] * 10, 4.0, 6.0, [0.5, 1.0]),
        ([1.0, 0.9, 1.0, 0.9, 1.0, 1.0, 0.5], 14.0, 5.0, [0.5, 1.0]),
        ([], 10.0, 10.0, [0.5, 1.0]),
        ([0.9], 10.0, 10.0, [0.5, 1.0]),
        ([1.0, 0.95], 0.0, 10.0, [0.5, 1.0]),
        ([0.4, 1.0, 0.4, 1.0], 400.0, 12.0, [0.5, 1.0]),
        ([1.0, 0.5], 4.0, 10.0, [0.5, 1.0]),
    ],
    "colorbarColorIndex": [
        (y, 48.0, 258.0) for y in (0.0, 1.0, 24.0, 46.0, 47.0)
    ] + [(0.0, 1.0, 258.0)],
    "floatRangeTextCommit": [
        ("70", "100", 100.0, 40.0, 120.0),
        ("abc", "85", 100.0, 40.0, 120.0),
        ("abc", "junk", 100.0, 40.0, 120.0),
        ("999", "100", 100.0, 40.0, 120.0),
        ("-999", "100", 100.0, 40.0, 120.0),
        ("100.0", "100", 100.0, 40.0, 120.0),
        ("  55.5e0 stuff", "100", 100.0, 40.0, 120.0),
        ("-18.25", "-18", -18.0, -40.0, 0.0),
        ("Infinity", "100", 100.0, 40.0, 120.0),
        ("-Infinity", "100", 100.0, 40.0, 120.0),
        ("+Infinity junk", "100", 100.0, 40.0, 120.0),
    ],
    "floatRangeResetClick": [
        (b, d, a)
        for b in (0.0, 1.0, 2.0)
        for d in (1.0, 2.0, 3.0)
        for a in (False, True)
    ],
    "winMillisecCommit": [
        ("20", 40.0), ("0.25", 40.0), ("-5", 40.0), ("1", 40.0),
        ("garbage", 40.0), ("", 40.0), (None, 40.0), ("12.345", 40.0),
        ("Infinity", 40.0), ("-Infinity", 40.0),
        ("3000", 40.0), ("2000", 40.0), ("2000.5", 40.0),
    ],
    "normalizeSelectTarget": [
        ("Off", 0.0, -18.0), ("PeakdB", -1.5, -18.0),
        ("LUFS", -1.5, -23.0), ("RMSdB", -1.5, -23.0),
    ],
    "channelLabel": [
        (n, c) for n in (1.0, 2.0, 4.0, 6.0) for c in (0.0, 1.0, 3.0)
    ],
    "splitSupportedPaths": [
        (["a.wav", "b.mp3", "c.txt", "d", "e.WAV", "f."],),
        (["x.aac", "y.flac", "z.m4a", "w.oga", "v.ogg", "u.opus"],),
        ([],),
        (["noext", "tail.", "dir.name/file.wav"],),
    ],
    "fileDropIndex": [
        (50.0, [0.0, 160.0, 320.0], [160.0, 160.0, 160.0]),
        (100.0, [0.0, 160.0, 320.0], [160.0, 160.0, 160.0]),
        (250.0, [0.0, 160.0, 320.0], [160.0, 160.0, 160.0]),
        (1000.0, [0.0, 160.0, 320.0], [160.0, 160.0, 160.0]),
        (80.0, [0.0, 160.0, 320.0], [160.0, 160.0, 160.0]),
        (10.0, [], []),
        (50.0, [0.0, 320.0], [320.0, 160.0]),
    ],
    "zoomStepDelta": [
        (160.0, False), (160.0, True), (37.5, False), (1000.0, True),
        (1.0, False), (500.0, True),
    ],
    "zoomLensAtSelect": [
        ({"startSec": 2.0, "pxPerSec": 500.0}, 3.0, False, 44.0, 800.0),
        ({"startSec": 2.0, "pxPerSec": 500.0}, 3.0, True, 44.0, 800.0),
        ({"startSec": 0.0, "pxPerSec": 10.0}, 0.0, False, 7200.0, 1000.0),
        ({"startSec": 5.0, "pxPerSec": 100000.0}, 5.5, False, 10.0, 500.0),
        ({"startSec": 0.5, "pxPerSec": 50.0}, 1.0, True, 2.0, 640.0),
    ],
    "freqZoomScrollTop": [
        (160.0, 200.0, 0.0, 600.0, 4.0),
        (160.0, 120.0, 300.0, 600.0, 10.0),
        (160.0, 200.0, 0.0, 600.0, 0.0),
        (160.0, 200.0, 5000.0, 600.0, 3.0),
        (24.0, 4096.0, 100.0, 480.0, 6.0),
    ],
    "nextTrackOnArrow": [
        ([0.0, 1.0, 2.0], [0.0], True), ([0.0, 1.0, 2.0], [2.0], True),
        ([0.0, 1.0, 2.0], [1.0, 2.0], False), ([0.0, 1.0, 2.0], [], True),
        ([0.0, 1.0, 2.0], [], False), ([], [1.0], True),
        ([0.0, 1.0, 2.0], [5.0], True), ([0.0, 1.0, 2.0], [0.0], False),
    ],
    "fitPxPerSec": [(1000.0, 100.0), (1000.0, 0.0), (50.0, 7200.0)],
    "splitterWidth": [(200.0, -500.0), (200.0, 500.0), (200.0, 13.0)],
    "scrubSecAt": [(500.0, 100.0, 10.0, 100.0), (0.0, 100.0, 0.5, 100.0)],
    "jumpAmountSec": [(False,), (True,)],
    "srKhzLabel": [(16000,), (44100,), (22050,), (8000,), (192000,)],
    "trackMetaLine": [
        ("wav", "16 bit", "", 16000.0),
        ("mp3", "", "257 kbps", 44100.0),
        ("flac", "24 bit", "", 22050.0),
        ("ogg - vorbis", "", "", 48000.0),
    ],
    "nonFiniteNumberLabel": [
        (float("inf"),), (float("-inf"),), (float("nan"),),
    ],
    "lufsLabel": [("-26.20",), ("-∞",), ("0.00",)],
    "fmtTime": [
        (0.0,), (3725.678,), (3725.5,), (59.9999,), (-5.0,), (float("nan"),),
        (86399.999,),
    ],
    # remote-audio Web Audio scheduling (audioplayer.js wiring)
    "audioChunkStartTime": [
        (0.0, 0.0, 0.06),       # cold start: frontier at ctx+lead
        (1.5, 1.0, 0.06),       # healthy: frontier ahead, keep it
        (1.0, 1.5, 0.06),       # underrun: restart at ctx+lead
        (2.06, 2.0, 0.06),      # exactly at the lead boundary
        (0.0, 10.0, 0.0),
    ],
    "audioPullCount": [
        (0.0, 0.0, 0.35, 4096.0 / 48000.0, 4.0),   # cold: ceil -> capped
        (0.5, 0.2, 0.35, 4096.0 / 48000.0, 4.0),   # ahead of target: 0
        (0.4, 0.2, 0.35, 4096.0 / 48000.0, 4.0),   # small deficit: >=1
        (0.2, 0.2, 0.35, 4096.0 / 48000.0, 4.0),
        (0.55, 0.2, 0.35, 4096.0 / 48000.0, 4.0),  # at target (fp dust): 0
        (0.35, 0.0, 0.35, 4096.0 / 48000.0, 4.0),  # deficit EXACTLY 0: 0
        (0.0, 5.0, 0.35, 4096.0 / 48000.0, 2.0),   # long stall: cap wins
        (0.0, 0.0, 0.35, 0.0, 4.0),                # degenerate chunk: 0
        (0.0, 0.0, 0.35, 4096.0 / 8000.0, 4.0),    # big chunks: 1
    ],
    "audioCursorReset": [
        (3.0, None),            # first chunk: never a reset
        (3.0, 3.0),
        (4.0, 3.0),             # seek bumped the version
        (0.0, 0.0),
        (0.0, 1.0),
    ],
    "deinterleavePcm": [
        ([1.0, -1.0, 0.5, -0.5, 0.25, -0.25], 2.0, 3.0, 0.0),
        ([1.0, -1.0, 0.5, -0.5, 0.25, -0.25], 2.0, 3.0, 1.0),
        ([0.1, 0.2, 0.3], 1.0, 3.0, 0.0),
        ([], 2.0, 0.0, 1.0),
    ],
}

# Boundary/epsilon cases targeting measured mutation-battery survivors
# (tests/goldens/js_mutants.json): each kills a specific mutant class that
# the base batteries missed — exact-equality boundaries, epsilon guards
# exercised below the nudged value, round-half fractions, asymmetric
# neighborhoods.  The 20 survivors that remain after three passes (96.5%
# kill) are all EQUIVALENT mutants, verified by hand:
#   - loop bounds `i < arr.length` -> `<=`: the extra iteration reads
#     undefined, every comparison against it is false, behavior unchanged;
#   - clamp-at-boundary no-ops (`lo < 0 {hi -= lo; lo = 0}` at lo === 0,
#     winMillisec/sec floors at their exact limits, freqShiftDrag's slide
#     clamps at equality);
#   - dead code: calcLimiterGainEnvelopes' `i2 === i` recovery (the inner
#     scan always advances), waveLevel's `samplesPerPx <= 2` (the
#     near-per-sample >= gate already fired for everything <= 4), the lens
#     strict-< zone bounds shadowed by the preceding <= zone;
#   - calcScrollTopAtCursor's row-bottom `<=`: at exact equality the
#     next-row gap branch lands on the algebraically identical value
#     (newContentY = contentY + (i+1)(nh - bh) either way).
CASES["overviewCursorState"] += [
    (4.0, 0.005, 1.0, 100.0),    # lensStartX=round(0.5): floor-flip changes zone
    (97.0, 0.005, 1.0, 100.0),   # lensEndX=round(100.5): right-edge boundary
]
CASES["ampRangeFromBins"] += [
    # 3 triplets: index arithmetic i*3+1 vs i/3+1 diverges past i=0
    ([[-0.5, 0.5, 0.0, -1.2, 2.5, 0.1, -3.0, 0.9, 0.0]],),
]
CASES["overviewWavePoints"] += [
    # amp span far below the 1e-2 nudge but above 1e-8
    ([-0.5, 0.5, 0.0, -0.2, 0.3, 0.1],
     {"y": 6.0, "height": 18.0, "gainHeight": 6.0}, 300.0, [0.0, 0.001], False),
]
CASES["calcLimiterGainEnvelopes"] += [
    ([0.9, 0.8, 0.7, 1.0], 8.0, 10.0, [0.999, 1.0]),  # tiny gain span
    ([0.5], 4.0, 10.0, [0.5, 1.0]),                    # single-point i2==i
    ([0.9, 0.8], 1.0, 10.0, [0.5, 1.0]),               # width < len aliasing
    ([0.7, 0.6, 0.9, 0.5, 0.4, 0.8, 0.3, 0.95], 3.0, 10.0, [0.3, 1.0]),
]
CASES["freqZoomScrollTop"] += [
    (160.0, 200.0, 100.0, 600.0, 4.0),   # contentMiddle/base = 2.5: floor vs ceil
    (0.004, 0.01, 0.05, 0.1, 4.0),       # baseHeight below the 1e-2 nudge
    (160.0, 200.0, 5000.0, 600.0, 2.0),  # rowIndex clamps: min/max flips differ
]
CASES["calcScrollTopAtCursor"] += [
    # gap between rows: contentY < rowTop branch (its +/- arithmetic)
    ([0.0, 400.0, 800.0], 160.0, 160.0, 120.0, 300.0, 0.0, 0.0),
    # baseHeight below the 1e-2 nudge: offsetRatio guard
    ([0.0], 1.0, 0.004, 120.0, 0.002, 0.0, 0.0),
]
CASES["selectSecAutoScroll"] += [
    (1e-6, 0.0, 5.0, 10.0, 1000.0, 100.0),  # |diff| EXACTLY the 1e-6 deadband
    (6.0, 5.0, 5.0, 5.5, 1000.0, 100.0),    # newStartSec lands EXACTLY on selectSec
]
CASES["selectTrack"] += [
    ([3, 5], 5, 3, [3, 5, 7], {}),  # multi-selection plain click on a member
]
CASES["selectAllTracks"] += [
    ([5, 7, 9], [3, 5, 7]),  # same length, different membership
]
CASES["selectAfterRemoveTracks"] += [
    ([3, 5, 7, 9], [3, 9], [5], 5),  # asymmetric neighbors: +i vs -i differ
]
CASES["normalizePxPerSec"] += [
    (1e-5, 0.0, 1e6, 0.001),      # floor guard below the 1e-2 nudge
    (10.0, 0.0, 1e-6, 1000.0),    # maxTrackSec - startSec EXACTLY 1e-6
]
CASES["normalizeStartSec"] += [
    (95.0, 1e-5, 100.0, 1e-4),    # pxPerSec below the 1e-2 nudge moves the bound
]
CASES["updateLensParams"] += [
    # startSec EXACTLY at FIT_TOLERANCE_SEC: <= boundary decides isFit
    ({"startSec": 1e-6, "pxPerSec": 1.0}, {}, 100.0, 1000.0),
    # width EXACTLY (maxTrackSec - FIT_TOLERANCE)*pxPerSec: >= boundary
    ({"startSec": 0.0, "pxPerSec": 4.0}, {}, 2.0, (2.0 - 1e-6) * 4.0),
]
CASES["classifyWheel"] += [
    ({"deltaX": 5.0, "deltaY": 5.0, "shiftKey": False, "ctrlKey": False,
      "altKey": False}, False),  # equal magnitudes: strict < decides the axis
]
CASES["overviewDragAnchor"] += [
    # asymmetric grab: anchor fraction 2.0 != the 0.5 both old cases produced
    ("inlens", 300.0, 1000.0, 100.0, 10.0, 10.0),
]
CASES["clampMaxHz"] += [
    (12000.0, 0.0, 12000.0),  # maxHz EXACTLY maxTrackHz: strict > decides
]
CASES["freqHzToPos"] += [
    # hz EXACTLY at the mel knee (1000 Hz): the log branch yields 15.0,
    # the linear branch 14.999999999999998 — a >= flip at the knee is a
    # 2-ulp error this case pins
    ("Mel", 1000.0, 300, 100.0, 8000.0, 12000.0),
]
CASES["zoomFreqRangeAt"] += [
    # lo lands EXACTLY on the 1e-9 full-range epsilon (1/1e9 == float 1e-9,
    # and 1e-9 + (1 - 1e-9) == 1.0 so the hi>1 clamp stays out of the way):
    # the <= at the null-reset gate decides
    ([1.0, 1e9], 1e9, "Linear", 1.0, 0.0),
    # hi lands EXACTLY on 1 - 1e-9 (power-of-2 maxHz keeps hz/maxHz exact):
    # the >= side of the same gate
    ([0.0, (1.0 - 1e-9) * 2.0**30], 2.0**30, "Linear", 1.0, 0.0),
]
CASES["selectAfterRemoveTracks"] += [
    # nearest survivor is strictly FORWARD of the pivot and differs from
    # newTrackIds[0]: a backward-only walk (the +i -> -i mutant) falls
    # through to the wrong fallback
    ([2, 1, 4], [4, 1], [2], 2),
]
CASES["ampRangeFromBins"] += [
    # ragged tail (len % 3 != 0): floor(n/3) is the spec; ceil reads past
    # the final triplet (undefined -> NaN poisons the range)
    ([[0.0, 0.0, 0.0, -2.5]],),
]
CASES["overviewWavePoints"] += [
    # ragged tail again, through the polygon path (point count = 2*floor(n/3))
    ([-0.5, 0.5, 0.0, -1.5, 1.5, 0.1, 0.7],
     {"y": 6.0, "height": 18.0, "gainHeight": 6.0}, 300.0, [-1.5, 1.5], False),
]
CASES["overviewCursorState"] += [
    # lensEndX = round(100.5) with an EXACT .5 (201 * 0.5; the earlier
    # 1.005*100 case rounded to 100.49999999999999 and killed nothing):
    # JS round-half-up vs floor moves the right-edge hit zone by 1px
    (97.5, 0.0, 201.0, 0.5),
]
CASES["freqZoomScrollTop"] += [
    # baseHeight BELOW the 1e-8 epsilon: the rowIndex divisor (max guard)
    # and the offset divisor finally differ, breaking the algebraic
    # cancellation (result == newHeight*contentMiddle/baseHeight for ANY
    # rowIndex when they match) that hides every rowIndex mutant at
    # ordinary heights
    (1e-9, 0.1, 5e-9, 1e-7, 10.0),
    # same regime with the rowCount-1 clamp biting (rowIndex 20 -> 9)
    (1e-9, 0.1, 1.5e-7, 1e-7, 10.0),
]
CASES["colorbarColorIndex"] += [
    # negative cursor y (drag above the bar): the only input region where
    # the defensive Math.min(colormapLength - 1, ...) clamp actually bites
    (-47.0, 48.0, 258.0),
]
CASES["selectSecAutoScroll"] += [
    # selectSec EXACTLY at the view edges: both in-view <=/>= bounds decide
    (5.0, 0.0, 5.0, 10.0, 1000.0, 100.0),
    (5.0, 0.0, 1.0, 5.0, 1000.0, 100.0),
]

_CONSTANTS = [
    name for name, v in T.TWINNED.items() if isinstance(v, (int, float))
]


def test_every_twinned_function_has_js_execution_cases():
    funcs = {n for n, v in T.TWINNED.items() if callable(v)}
    missing = funcs - set(CASES)
    assert not missing, f"no differential cases for: {sorted(missing)}"


def test_constants_equal(js):
    for name in _CONSTANTS:
        assert float(js[name]) == float(T.TWINNED[name]), name


@pytest.mark.parametrize("name", sorted(CASES))
def test_js_matches_twin(js, name):
    for args in CASES[name]:
        check(js, name, *args)


def test_js_matches_twin_randomized(js):
    """Random sweeps over the numeric-heavy functions."""
    for _ in range(200):
        s, p = _floats(1, -10, 120)[0], 10 ** _rng.uniform(-8, 6)
        w, m = _floats(1, 50, 2000)[0], _floats(1, 0.5, 7200)[0]
        check(js, "normalizeStartSec", s, p, m, w)
        check(js, "normalizePxPerSec", p, s, m, w)
        check(js, "updateLensParams", _cur(s, p),
              {"startSec": _floats(1, -10, 200)[0]}, m, w)
        check(js, "horizontalZoom", _cur(abs(s), max(p, 1e-6)),
              _floats(1, 0, 1000)[0], _floats(1, -999, 5000)[0], m, w)
        d = _floats(1, -600, 600)[0]
        check(js, "calcZoomedHeight", _floats(1, 100, 5000)[0], d)
        check(js, "ampWheel", [-abs(_floats(1, 0.1, 4)[0])] + _floats(1, 0.1, 4), d)
        lo = _floats(1, 0, 4000)[0]
        hi = lo + _floats(1, 200, 8000)[0]
        sc = "Mel" if _rng.integers(2) else "Linear"
        check(js, "freqPosToHz", sc, _floats(1, -20, 320)[0], 300, lo, hi, 12000.0)
        check(js, "freqHzToPos", sc, _floats(1, 0, 12000)[0], 300, lo, hi, 12000.0)
        check(js, "zoomFreqRangeAt", [lo, hi], 12000.0, sc,
              10 ** _rng.uniform(-1.5, 1.5), _floats(1, 0, 1)[0])
        check(js, "fmtTime", _floats(1, 0, 90000)[0])
    # selection fuzz: random ordered ids + random ops
    for _ in range(300):
        n = int(_rng.integers(1, 8))
        ids = [int(x) for x in _rng.permutation(100)[:n]]
        sel_n = int(_rng.integers(1, n + 1))
        selected = [int(x) for x in _rng.permutation(ids)[:sel_n]]
        pivot = int(selected[_rng.integers(len(selected))])
        tid = int(ids[_rng.integers(len(ids))])
        mods = {}
        r = _rng.integers(3)
        if r == 1:
            mods = {"command": True}
        elif r == 2:
            mods = {"shift": True}
        check(js, "selectTrack", selected, pivot, tid, ids, mods)
        survivors = [i for i in ids if _rng.random() > 0.4]
        check(js, "selectAfterRemoveTracks", ids, survivors, selected, pivot)


# ---------------------------------------------------------------------------
# Round-2 twin surfaces (viewer/twin.py), now ALSO executed as real JS:
# tick tables/lookup (axes.js), LOD selection + cache keys (viewport.js),
# byte-budgeted LRU (caches.js).

from thesia_tpu.viewer import twin


@pytest.fixture(scope="module")
def interp():
    return load_viewer_logic()


def _method(interp, obj, name, *args):
    return interp._call_method(obj, name, [_to_js(a) for a in args])


def test_js_delete_operator_semantics():
    """`delete obj.key` / `delete obj[key]` remove the property; reading it
    back yields undefined (used by app.js group-drag badge cleanup)."""
    from tests.jsinterp import Interp

    i = Interp()
    i.load(
        "export function probe() {\n"
        "  const o = { a: 1, b: 2, c: 3 };\n"
        "  const r1 = delete o.a;\n"
        "  const k = 'b';\n"
        "  delete o[k];\n"
        "  delete o.missing;\n"
        "  return [r1, o.a === undefined, o.b === undefined, o.c];\n"
        "}\n"
    )
    assert _norm(i.global_env.vars["probe"]()) == [True, True, True, 3.0]


# The three module batteries are plain functions over an interp so the
# mutation kill-check (tests/js_mutation.battery_kills) can run the exact
# same differentials against mutated axes.js/viewport.js/caches.js.

def freqscale_battery(interp):
    """freqscale.js mel<->hz vs the twin_app twins, pinning the EXACT knee:
    melFromHz(1000.0) must take the log branch (15.0, not the linear
    14.999999999999998) and melToHz(15.0) the exp branch (1000.0, not
    1000.0000000000001) — a >= flip at either knee is otherwise invisible
    through the downstream (1-rel) position math."""
    g = interp.global_env.vars
    for hz in (0.0, 1.0, 500.0, 999.999, 1000.0, 1000.001, 4000.0, 24000.0):
        assert float(g["melFromHz"](hz)) == float(T.mel_from_hz(hz)), hz
    for mel in (0.0, 7.5, 14.999, 15.0, 15.001, 40.0):
        assert float(g["melToHz"](mel)) == float(T.mel_to_hz(mel)), mel
    for hz, mx in ((0.0, 8000.0), (1000.0, 8000.0), (440.0, 440.0), (5.0, 0.0)):
        for scale in ("Mel", "Linear"):
            assert float(g["relativeFreqPos"](hz, mx, scale)) == float(
                T.relative_freq_pos(hz, mx, scale)
            ), (hz, mx, scale)


def test_js_freqscale_knee(interp):
    freqscale_battery(interp)


def axes_battery(interp):
    """Tick tables + tickScale lookup + timeTickParams vs the twins."""
    g = interp.global_env.vars
    for js_name, table in [
        ("TIME_TICK_SIZE", twin.TIME_TICK_SIZE),
        ("AMP_TICK_NUM", twin.AMP_TICK_NUM),
        ("FREQ_TICK_NUM", twin.FREQ_TICK_NUM),
        ("DB_TICK_NUM", twin.DB_TICK_NUM),
    ]:
        js_table = _norm(g[js_name])
        assert js_table == [[float(x) for x in row] for row in table], js_name
        values = [row[0] for row in table] + [
            row[0] - 1e-6 for row in table
        ] + [row[0] + 0.5 for row in table] + [0.0, 1e9]
        for v in values:
            got = g["tickScale"](g[js_name], float(v))
            exp = twin.tick_scale(table, v)
            if exp is None:
                assert got is None or got is UNDEF
            else:
                assert _norm(got) == [float(exp[0]), float(exp[1])], (js_name, v)
    for pps in (0.0001, 0.001, 0.5, 5.7, 100.0, 384000.0, 1e6):
        got = g["timeTickParams"](float(pps))
        exp = twin.tick_scale(twin.TIME_TICK_SIZE, pps)
        if exp is None:
            assert got is None or got is UNDEF
        else:
            assert _norm(got) == {"tickUnit": float(exp[0]),
                                  "labelInterval": float(exp[1])}


def viewport_battery(interp, n=120, seed=7701):
    """LOD selection + wave level vs the twins on a seeded random sweep."""
    rng = _np.random.default_rng(seed)
    g = interp.global_env.vars
    vp = g["TrackViewport"].construct(["0_0"])
    for _ in range(n):
        w = float(rng.integers(100, 500000))
        sec = float(rng.uniform(1, 4000))
        h = float(rng.integers(64, 1024))
        sr = float(rng.choice([8000, 16000, 22050, 44100, 48000]))
        pps = float(10 ** rng.uniform(-2, 5.6))
        dpr = float(rng.choice([1.0, 1.5, 2.0]))
        frac = float(rng.uniform(0.1, 1.0))
        view_h = float(rng.integers(40, 400))
        vp["metadata"] = {"spectrogramWidth": w, "trackSec": sec,
                          "spectrogramHeight": h, "sampleRate": sr}
        js_lv = _norm(_method(interp, vp, "specLevels", pps, view_h, frac))
        lx, ly = twin.spec_levels(w, sec, h, pps, view_h, frac)
        assert js_lv["levelX"] == float(lx) and js_lv["levelY"] == float(ly), (
            w, sec, h, pps, view_h, frac, js_lv, (lx, ly))
        js_wl = _method(interp, vp, "waveLevel", pps, dpr)
        assert float(js_wl) == float(twin.wave_level(sr, pps, dpr)), (sr, pps, dpr)
        # pxPerSec*2*dpr EXACTLY sr/2: the >= near-per-sample gate decides
        vp["metadata"] = {"spectrogramWidth": w, "trackSec": sec,
                          "spectrogramHeight": h, "sampleRate": 48000.0}
        js_b = _method(interp, vp, "waveLevel", 12000.0, 1.0)
        assert float(js_b) == float(twin.wave_level(48000.0, 12000.0, 1.0))
        # revision-scoped cache keys (a wrong key serves stale tiles)
        srev = int(rng.integers(0, 50))
        wrev = int(rng.integers(0, 50))
        md = {"spectrogramRevision": float(srev), "waveformRevision": float(wrev)}
        lx, ly = int(rng.integers(0, 6)), int(rng.integers(0, 4))
        tx, ty = int(rng.integers(0, 9)), int(rng.integers(0, 3))
        got_sk = _method(interp, vp, "_specKey", md,
                         float(lx), float(ly), float(tx), float(ty))
        assert got_sk == twin.spec_key("0_0", srev, lx, ly, tx, ty), got_sk
        lvl, ti = int(rng.integers(0, 12)), int(rng.integers(0, 20))
        got_wk = _method(interp, vp, "_waveKey", md, float(lvl), float(ti))
        assert got_wk == twin.wave_key("0_0", wrev, lvl, ti), got_wk


def caches_battery(interp, steps=400, seed=7702):
    """Seeded op tape through the REAL caches.js LruByteCache and the twin:
    identical hit/miss answers, byte accounting, and eviction order."""
    rng = _np.random.default_rng(seed)
    g = interp.global_env.vars
    # shared budget constants feed the real app caches (caches.js exports)
    assert float(g["SPEC_TILE_CACHE_BYTES"]) == float(twin.SPEC_TILE_CACHE_BYTES)
    assert float(g["WAVE_TILE_CACHE_BYTES"]) == float(twin.WAVE_TILE_CACHE_BYTES)
    js_cache = g["LruByteCache"].construct([500.0])
    py_cache = twin.LruByteCache(500)
    keys = [f"k{i}" for i in range(12)]
    for step in range(steps):
        op = rng.integers(6)
        if op == 5:
            if step % 97 == 0:  # rare full invalidation, like a reload
                _method(interp, js_cache, "clear")
                py_cache.clear()
            continue
        k = keys[int(rng.integers(len(keys)))]
        if op == 0:
            nbytes = float(rng.integers(1, 200))
            _method(interp, js_cache, "set", k, f"v{step}", nbytes)
            py_cache.set(k, f"v{step}", int(nbytes))
        elif op == 1:
            a = _method(interp, js_cache, "get", k)
            b = py_cache.get(k)
            a = None if a is UNDEF or a is None else a
            assert a == b, (step, k, a, b)
        elif op == 2:
            assert bool(_method(interp, js_cache, "has", k)) == py_cache.has(k)
        elif op == 3:
            _method(interp, js_cache, "delete", k)
            py_cache.delete(k)
        else:
            pred_keep = f"k{int(rng.integers(len(keys)))}"
            _method(interp, js_cache, "retain",
                    lambda key, _i=None: key != pred_keep)
            py_cache.retain(lambda key: key != pred_keep)
        assert float(js_cache["bytes"]) == float(py_cache.bytes), step
        js_keys = interp._call_method(js_cache["map"], "keys", [])
        assert js_keys == py_cache.keys(), (step, js_keys, py_cache.keys())
    _method(interp, js_cache, "clear")
    py_cache.clear()
    assert float(js_cache["bytes"]) == 0.0 and py_cache.bytes == 0
    # bytes EXACTLY at budget: the <= eviction gate must keep both entries
    _method(interp, js_cache, "set", "xa", "va", 300.0)
    _method(interp, js_cache, "set", "xb", "vb", 200.0)
    py_cache.set("xa", "va", 300)
    py_cache.set("xb", "vb", 200)
    assert float(js_cache["bytes"]) == float(py_cache.bytes) == 500.0
    js_keys = interp._call_method(js_cache["map"], "keys", [])
    assert js_keys == py_cache.keys() == ["xa", "xb"]
    # disposal guards: a falsy value must short-circuit (an &&->|| flip
    # reads .bitmap off null in the if CONDITION, outside the try), and a
    # present bitmap.close must be invoked exactly once (an ===->!== flip
    # silently leaks the ImageBitmap)
    _method(interp, js_cache, "set", "nul", None, 10.0)
    _method(interp, js_cache, "delete", "nul")
    py_cache.set("nul", None, 10)
    py_cache.delete("nul")
    closed = []
    _method(interp, js_cache, "set", "bm",
            {"bitmap": {"close": lambda: closed.append(1)}}, 10.0)
    _method(interp, js_cache, "delete", "bm")
    py_cache.set("bm", object(), 10)
    py_cache.delete("bm")
    assert closed == [1], f"bitmap.close not invoked on disposal: {closed}"
    # the 510-byte excursion evicted oldest-first (xa) on BOTH sides
    assert float(js_cache["bytes"]) == float(py_cache.bytes) == 200.0
    assert interp._call_method(js_cache["map"], "keys", []) == py_cache.keys() == ["xb"]


def test_js_tick_tables_and_lookup(interp):
    axes_battery(interp)


def test_js_viewport_lod_math(interp):
    viewport_battery(interp)


def test_js_lru_cache_differential(interp):
    caches_battery(interp)


def test_js_cache_key_formats(interp):
    g = interp.global_env.vars
    vp = g["TrackViewport"].construct(["3_1"])
    md = {"spectrogramRevision": 7.0, "waveformRevision": 4.0}
    assert _method(interp, vp, "_specKey", md, 1.0, 0.0, 3.0, 0.0) == "3_1:7:1:0:3:0"
    assert _method(interp, vp, "_waveKey", md, 5.0, 2.0) == "3_1:4:5:2"


# ---------------------------------------------------------------------------
# Binary wire format end-to-end: Python tile ENCODERS -> the REAL api.js
# DECODERS (DataView/TypedArray via the interpreter) -> field-for-field and
# byte-for-byte vs the Python decoders (reference layouts:
# render_tiles.rs:232-393, decoded at backend-wrapper.ts:34-68).

from tests.jsinterp import JSArrayBuffer


def test_js_waveform_tile_decoder_bit_exact(interp):
    from thesia_tpu.render import decode_waveform_tile
    from thesia_tpu.render.tiles import encode_waveform_tile

    g = interp.global_env.vars
    rng = _np.random.default_rng(6)
    for n, level, ti, rev in [(5000, 2, 1, 7), (120000, 6, 1, 123), (900, 0, 0, 1)]:
        wav = rng.uniform(-1, 1, n).astype(_np.float32)
        data = encode_waveform_tile(wav, rev, level, ti)
        py = decode_waveform_tile(data)
        js = g["decodeWaveformTile"](JSArrayBuffer(data))
        assert js["revision"] == float(rev)
        assert js["binCount"] == float(py["binCount"])
        assert js["samplesPerBin"] == float(py["samplesPerBin"])
        assert js["tileIndex"] == float(ti)
        _np.testing.assert_array_equal(
            _np.array(js["bins"], _np.float32),
            _np.asarray(py["bins"], _np.float32).reshape(-1),
        )


def test_js_spectrogram_tile_decoder_bit_exact(interp):
    from thesia_tpu.render import decode_spectrogram_tile, default_colormap_rgba8
    from thesia_tpu.render.tiles import encode_spectrogram_tile

    g = interp.global_env.vars
    rng = _np.random.default_rng(7)
    img = rng.integers(0, 65536, (300, 900)).astype(_np.uint16)
    cmap = default_colormap_rgba8()
    for lx, ly, tx, ty in [(0, 0, 0, 0), (0, 0, 1, 0), (1, 1, 0, 0)]:
        data = encode_spectrogram_tile(img, cmap, 42, lx, ly, tx, ty)
        py = decode_spectrogram_tile(data)
        js = g["decodeSpectrogramTile"](JSArrayBuffer(data))
        assert js["revision"] == 42.0
        for key in ("width", "height", "levelX", "levelY", "tileX", "tileY",
                    "originX", "originY"):
            assert js[key] == float(py[key]), (key, lx, ly, tx, ty)
        _np.testing.assert_array_equal(
            _np.array(js["rgba"], _np.uint8),
            _np.asarray(py["rgba"], _np.uint8).reshape(-1),
        )


def test_js_json_number_decoder(interp):
    g = interp.global_env.vars
    assert g["jsonNumber"]({"type": "Finite", "value": -26.1}) == -26.1
    assert g["jsonNumber"]({"type": "Infinity"}) == math.inf
    assert g["jsonNumber"]({"type": "NegInfinity"}) == -math.inf
    assert math.isnan(g["jsonNumber"]({"type": "NaN"}))
    assert g["jsonNumber"](3.0) == 3.0  # plain numbers pass through
