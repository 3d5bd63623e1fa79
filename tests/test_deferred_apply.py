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
    loud2 = tmp_path / "loud2.wav"  # same content as loud, distinct file
    medium = tmp_path / "medium.wav"
    _write_tone(quiet, 0.1)
    _write_tone(loud, 0.98, hz=1337.0)
    _write_tone(quiet2, 0.1)
    _write_tone(loud2, 0.98, hz=1337.0)
    _write_tone(medium, 0.5, hz=777.0)
    return {
        "quiet": str(quiet),
        "loud": str(loud),
        "quiet2": str(quiet2),
        "loud2": str(loud2),
        "medium": str(medium),
    }


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


def test_fresh_only_reconcile_records_applied_range(tmp_path, corpus):
    """A deferred apply whose reconcile finds NO pre-existing rows (remove
    the only track + add a new one in the same apply) must still record
    that the fresh rows were quantized under the new range.  Otherwise a
    later apply whose new range equals the STALE applied value reports
    'unmoved' and leaves the first add's rows at a range that was never
    applied (review finding r5)."""
    d = _session(tmp_path, "deferred")
    s = _session(tmp_path, "sync")
    for sess, defer in ((d, True), (s, False)):
        sess.add_tracks([0], [corpus["loud"]])
        sess.apply_track_list_changes(defer=False)  # first apply: force route
        # same-apply remove+add keeps max_sr unchanged -> incremental route
        sess.remove_tracks([0])
        sess.add_tracks([1], [corpus["quiet"]])
        sess.apply_track_list_changes(defer=defer)  # R0 -> R1, no old rows
        if defer:
            assert sess.settings_settled(timeout=60)
        sess.add_tracks([2], [corpus["loud2"]])  # range back to exactly R0
        sess.apply_track_list_changes(defer=defer)  # stale probe: "unmoved"
        if defer:
            assert sess.settings_settled(timeout=60)
    assert d.get_max_db() == s.get_max_db()
    assert d.get_min_db() == s.get_min_db()
    _assert_images_equal(_images(d), _images(s))


def test_superseded_reconcile_chain_requantizes_mixed_rows(tmp_path, corpus):
    """Apply1 (remove loud, add medium: range R0->R1) quantizes its fresh
    row under R1 at dispatch; its reconcile is latest-wins-superseded by
    apply2 (add loud2: range back to exactly R0) before ever running.
    Apply2's probe sees its new range EQUAL the applied one — but apply1's
    fresh row still sits at R1, so value-equality proves nothing and the
    reconcile must run anyway (the _range_mixed invariant, review finding
    r5)."""
    d = _session(tmp_path, "deferred")
    s = _session(tmp_path, "sync")
    for sess in (d, s):
        sess.add_tracks([0, 1], [corpus["quiet"], corpus["loud"]])
        sess.apply_track_list_changes(defer=False)

    gate = threading.Event()
    d._spec_switch_pool.submit(gate.wait)  # both reconciles queue behind this
    try:
        d.remove_tracks([1])
        d.add_tracks([2], [corpus["medium"]])
        d.apply_track_list_changes(defer=True)  # R0 -> R1 (medium's range)
        d.add_tracks([3], [corpus["loud2"]])
        d.apply_track_list_changes(defer=True)  # back to R0 == applied value
    finally:
        gate.set()
    assert d.settings_settled(timeout=60)

    s.remove_tracks([1])
    s.add_tracks([2], [corpus["medium"]])
    s.apply_track_list_changes(defer=False)
    s.add_tracks([3], [corpus["loud2"]])
    s.apply_track_list_changes(defer=False)

    assert d.get_max_db() == s.get_max_db()
    assert d.get_min_db() == s.get_min_db()
    _assert_images_equal(_images(d), _images(s))


def test_reconcile_skips_rows_added_after_dispatch(tmp_path, corpus):
    """A track added AFTER the deferred apply's dispatch (awaiting its own
    apply) must not be quantized by the background reconcile: it would get
    an image under the pre-its-add geometry where sync semantics show the
    computing placeholder until its own apply."""
    d = _session(tmp_path, "deferred")
    d.add_tracks([0], [corpus["quiet"]])
    d.apply_track_list_changes(defer=False)

    gate = threading.Event()
    d._spec_switch_pool.submit(gate.wait)
    try:
        d.add_tracks([1], [corpus["loud"]])
        d.apply_track_list_changes(defer=True)  # reconcile queued (moved)
        d.add_tracks([2], [corpus["quiet2"]])  # NO apply yet
    finally:
        gate.set()
    assert d.settings_settled(timeout=60)
    # the un-applied add has no image (sync semantics), the applied rows do
    imgs = _images(d)
    assert {k[0] for k in imgs} == {0, 1}, sorted(imgs)

    d.apply_track_list_changes(defer=True)
    assert d.settings_settled(timeout=60)
    s = _session(tmp_path, "sync")
    s.add_tracks([0], [corpus["quiet"]])
    s.apply_track_list_changes(defer=False)
    s.add_tracks([1], [corpus["loud"]])
    s.apply_track_list_changes(defer=False)
    s.add_tracks([2], [corpus["quiet2"]])
    s.apply_track_list_changes(defer=False)
    assert d.get_max_db() == s.get_max_db()
    _assert_images_equal(_images(d), _images(s))


def test_concurrent_deferred_applies_end_uniform(tmp_path, corpus):
    """Two threads race add+apply (the service dispatches commands on a
    thread pool): whatever the interleaving, once settled every image must
    sit at the final applied range — gen order is assigned in WRITE order
    (a pre-write gen with a later write could otherwise carry a superseded
    epoch and no-op the surviving reconcile).  Oracle: a forced requantize
    under the same range must not change a byte."""
    import concurrent.futures

    d = _session(tmp_path, "deferred")
    d.add_tracks([0], [corpus["quiet"]])
    d.apply_track_list_changes(defer=False)

    sources = ["loud", "quiet2", "medium", "loud2"]
    next_id = 1
    for rnd in range(2):
        pair = [(next_id + i, corpus[sources[(2 * rnd + i) % 4]]) for i in range(2)]
        next_id += 2

        def add_apply(arg):
            tid, path = arg
            d.add_tracks([tid], [path])
            d.apply_track_list_changes(defer=True)

        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            list(ex.map(add_apply, pair))
        assert d.settings_settled(timeout=120)
        imgs_settled = _images(d)
        d.set_db_range(d.tm.db_range)  # forced same-range requantize
        imgs_forced = _images(d)
        assert set(imgs_forced) == set(imgs_settled)
        for k in imgs_settled:
            assert np.array_equal(imgs_settled[k], imgs_forced[k]), (rnd, k)


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
