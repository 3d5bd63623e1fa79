"""Deferred apply_track_list_changes (round 5).

The reference's apply recomputes the global dB range synchronously on the
write worker (lib.rs:229-248 / mod.rs:168-230) — cheap there because specs
are host-resident.  Here the incremental did-the-range-move comparison
needs a device->host fetch that blocks until the freshly added track's
async spec compute finishes (seconds for an hour track).  The deferred
apply (THESIA_DEFER_SETTINGS default) composes the new range on device,
quantizes the new tracks under it at dispatch, and reconciles the
pre-existing tracks on the switch pool only if the range actually moved.

Contract under test:
  * bit-exact final images vs the synchronous path, for range-moved,
    range-unchanged and remove-shrinks-range cases;
  * no requantize churn (no extra revision bump) when the range held;
  * isComputing/settings_settled cover the reconcile window;
  * an intervening synchronous range pass supersedes the reconcile.
"""

import threading

import numpy as np
import pytest

from thesia_tpu.engine.session import EngineSession
from thesia_tpu.io.wav import encode_wav_s16
from thesia_tpu.render import default_colormap_rgba8


def _write_tone(path, peak: float, sr: int = 16000, sec: float = 0.6, hz: float = 440.0):
    n = int(sr * sec)
    t = np.arange(n, dtype=np.float64) / sr
    w = (peak * np.sin(2 * np.pi * hz * t)).astype(np.float32)[None, :]
    with open(str(path), "wb") as f:
        f.write(encode_wav_s16(w, sr))


@pytest.fixture()
def corpus(tmp_path):
    quiet = tmp_path / "quiet.wav"
    loud = tmp_path / "loud.wav"
    quiet2 = tmp_path / "quiet2.wav"  # same content as quiet, distinct file
    _write_tone(quiet, 0.1)
    _write_tone(loud, 0.98, hz=1337.0)
    _write_tone(quiet2, 0.1)
    return {"quiet": str(quiet), "loud": str(loud), "quiet2": str(quiet2)}


def _session(tmp_path, name):
    d = tmp_path / name
    d.mkdir()
    s = EngineSession(settings_dir=d)
    s.init(default_colormap_rgba8())
    return s


def _images(s):
    s.tm.images.drain()
    return {k: np.asarray(v) for k, v in s.tm.spec_imgs.items()}


def _assert_images_equal(a, b):
    assert set(a) == set(b)
    for k in a:
        assert a[k].shape == b[k].shape, k
        assert np.array_equal(a[k], b[k]), k


def test_deferred_apply_range_moved_bitexact_vs_sync(tmp_path, corpus):
    """Adding a louder track moves gmax: the background reconcile must
    requantize the pre-existing track to images bit-identical to the
    synchronous path's."""
    d = _session(tmp_path, "deferred")
    s = _session(tmp_path, "sync")
    for sess in (d, s):
        sess.add_tracks([0], [corpus["quiet"]])
        sess.apply_track_list_changes(defer=False)
        sess.add_tracks([1], [corpus["loud"]])

    refreshed = d.apply_track_list_changes(defer=True)
    # dispatch returns the FRESH rows only; the old row follows via the
    # reconcile's revision bump
    assert refreshed == ["1_0"]
    assert d.settings_settled(timeout=60)

    assert s.apply_track_list_changes(defer=False) == ["0_0", "1_0"]

    assert d.get_max_db() == s.get_max_db()
    assert d.get_min_db() == s.get_min_db()
    _assert_images_equal(_images(d), _images(s))


def test_deferred_apply_unmoved_range_skips_requantize(tmp_path, corpus):
    """A track that does not move the global range must not requantize (or
    revision-bump) the existing rows when the reconcile lands."""
    d = _session(tmp_path, "deferred")
    d.add_tracks([0], [corpus["quiet"]])
    d.apply_track_list_changes(defer=False)
    d.add_tracks([1], [corpus["quiet2"]])

    assert d.apply_track_list_changes(defer=True) == ["1_0"]
    rev_at_dispatch = d.get_audio_render_metadata("0_0")["spectrogramRevision"]
    assert d.settings_settled(timeout=60)
    assert (
        d.get_audio_render_metadata("0_0")["spectrogramRevision"] == rev_at_dispatch
    ), "reconcile requantized despite an unchanged range"

    s = _session(tmp_path, "sync")
    s.add_tracks([0], [corpus["quiet"]])
    s.apply_track_list_changes(defer=False)
    s.add_tracks([1], [corpus["quiet2"]])
    s.apply_track_list_changes(defer=False)
    assert d.get_max_db() == s.get_max_db()
    _assert_images_equal(_images(d), _images(s))


def test_deferred_apply_remove_shrinks_range(tmp_path, corpus):
    """Removing the loud track shrinks the range: the reconcile requantizes
    the survivor to the sync path's exact images."""
    d = _session(tmp_path, "deferred")
    s = _session(tmp_path, "sync")
    for sess in (d, s):
        sess.add_tracks([0, 1], [corpus["quiet"], corpus["loud"]])
        sess.apply_track_list_changes(defer=False)
        sess.remove_tracks([1])

    assert d.apply_track_list_changes(defer=True) == []
    assert d.settings_settled(timeout=60)
    s.apply_track_list_changes(defer=False)

    assert d.get_max_db() == s.get_max_db()
    assert d.get_min_db() == s.get_min_db()
    _assert_images_equal(_images(d), _images(s))


def test_deferred_apply_pending_reports_is_computing(tmp_path, corpus):
    """While the reconcile is queued, metadata must report isComputing so
    the viewer keeps polling and picks up the revision bump when it lands
    (same contract as the deferred settings switches)."""
    d = _session(tmp_path, "deferred")
    d.add_tracks([0], [corpus["quiet"]])
    d.apply_track_list_changes(defer=False)
    d.tm.images.drain()
    d.add_tracks([1], [corpus["loud"]])

    gate = threading.Event()
    d._spec_switch_pool.submit(gate.wait)  # hold the pool: reconcile queues
    try:
        d.apply_track_list_changes(defer=True)
        assert d.spec_switch_pending()
        assert d.get_audio_render_metadata("0_0")["isComputing"]
    finally:
        gate.set()
    assert d.settings_settled(timeout=60)
    assert not d.spec_switch_pending()
    d.tm.images.drain()
    assert not d.get_audio_render_metadata("0_0")["isComputing"]


def test_deferred_apply_superseded_by_sync_range_pass(tmp_path, corpus):
    """A synchronous range pass (set_db_range) landing between the deferred
    apply's dispatch and its reconcile supersedes it by epoch: the already
    correct images must not be requantized (no extra revision bump), and
    the final state matches the synchronous ordering."""
    d = _session(tmp_path, "deferred")
    d.add_tracks([0], [corpus["quiet"]])
    d.apply_track_list_changes(defer=False)
    d.add_tracks([1], [corpus["loud"]])

    gate = threading.Event()
    d._spec_switch_pool.submit(gate.wait)
    try:
        d.apply_track_list_changes(defer=True)
        d.set_db_range(90.0)  # force pass: requantizes ALL under the new range
        rev = d.get_audio_render_metadata("0_0")["spectrogramRevision"]
    finally:
        gate.set()
    assert d.settings_settled(timeout=60)
    assert (
        d.get_audio_render_metadata("0_0")["spectrogramRevision"] == rev
    ), "superseded reconcile still requantized"

    s = _session(tmp_path, "sync")
    s.add_tracks([0], [corpus["quiet"]])
    s.apply_track_list_changes(defer=False)
    s.add_tracks([1], [corpus["loud"]])
    s.apply_track_list_changes(defer=False)
    s.set_db_range(90.0)
    assert d.get_max_db() == s.get_max_db()
    assert d.get_min_db() == s.get_min_db()
    _assert_images_equal(_images(d), _images(s))


def test_rapid_double_deferred_apply_keeps_old_rows_fresh(tmp_path, corpus):
    """Two deferred applies before either reconcile runs: the first (range
    MOVES: loud track) is latest-wins-superseded by the second (range
    holds: quiet track).  The second probe must compare against the range
    the original row's image was actually quantized under — comparing
    against the first apply's range value would report 'unmoved' and leave
    the original row stale forever."""
    d = _session(tmp_path, "deferred")
    d.add_tracks([0], [corpus["quiet"]])
    d.apply_track_list_changes(defer=False)
    d.tm.images.drain()

    gate = threading.Event()
    d._spec_switch_pool.submit(gate.wait)  # both reconciles queue behind this
    try:
        d.add_tracks([1], [corpus["loud"]])
        d.apply_track_list_changes(defer=True)
        d.add_tracks([2], [corpus["quiet2"]])
        d.apply_track_list_changes(defer=True)
    finally:
        gate.set()
    assert d.settings_settled(timeout=60)

    s = _session(tmp_path, "sync")
    s.add_tracks([0], [corpus["quiet"]])
    s.apply_track_list_changes(defer=False)
    s.add_tracks([1], [corpus["loud"]])
    s.apply_track_list_changes(defer=False)
    s.add_tracks([2], [corpus["quiet2"]])
    s.apply_track_list_changes(defer=False)

    assert d.get_max_db() == s.get_max_db()
    assert d.get_min_db() == s.get_min_db()
    _assert_images_equal(_images(d), _images(s))


def test_deferred_apply_first_apply_is_forcelike(tmp_path, corpus):
    """The very first apply changes max_sr -> force route, nothing to
    reconcile: deferred and sync are the same pass, and settled is
    immediate."""
    d = _session(tmp_path, "deferred")
    d.add_tracks([0, 1], [corpus["quiet"], corpus["loud"]])
    assert d.apply_track_list_changes(defer=True) == ["0_0", "1_0"]
    assert d.settings_settled(timeout=0.5), "force route must settle at dispatch"

    s = _session(tmp_path, "sync")
    s.add_tracks([0, 1], [corpus["quiet"], corpus["loud"]])
    s.apply_track_list_changes(defer=False)
    _assert_images_equal(_images(d), _images(s))
