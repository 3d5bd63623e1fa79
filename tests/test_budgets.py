"""Residency budgets: spec (device f32) and host-image LRU with
recompute-on-miss (VERDICT r2 #5)."""

import numpy as np
import pytest

from thesia_tpu.engine.manager import TrackManager
from thesia_tpu.engine.track import TrackList
from thesia_tpu.io.wav import encode_wav_f32
from thesia_tpu.render.colormap import default_colormap_rgba8


def _build(tmp_path, n_tracks=4, sec=12.0, sr=8000):
    rng = np.random.default_rng(3)
    paths = []
    for i in range(n_tracks):
        w = rng.uniform(-0.7, 0.7, (1, int(sr * sec))).astype(np.float32)
        p = tmp_path / f"b{i}.wav"
        p.write_bytes(encode_wav_f32(w, sr))
        paths.append(str(p))
    tl = TrackList()
    tm = TrackManager()
    ids = tl.add_tracks(list(range(n_tracks)), paths)
    tm.add_tracks(tl, ids)
    tm.apply_track_list_changes(tl)
    return tl, tm


def test_spec_budget_evicts_and_recomputes(tmp_path, monkeypatch):
    tl, tm = _build(tmp_path)
    tm.images.drain()
    # shrink the budget to roughly one spec and force a pass
    one = int(np.prod(tm.specs[0].db_padded.shape)) * 4
    tm._spec_budget = one + 1
    tm._evict_specs(keep=set())
    assert len(tm.specs) < 4 and len(tm.specs) >= 1
    # a dB-range change must still requantize EVERY track (recompute-on-miss)
    tm.set_db_range(tl, 90.0)
    tm.images.drain()
    for tid in range(4):
        assert tm.images.host_image(tid, 0) is not None
    # bounds survived eviction: global range consistent
    assert tm.max_db <= 0.0 and np.isfinite(tm.min_db)


def test_host_image_budget_evicts_and_reloads(tmp_path):
    tl, tm = _build(tmp_path)
    tm.images.drain()
    total = sum(
        t.host_bytes() for t in tm.images._tracks.values() if t.complete
    )
    # budget for ~2 of 4 images
    tm.images._host_budget = total // 2
    tm.images._evict_host()
    evicted = [t for t in tm.images._tracks.values() if t.evicted]
    kept = [t for t in tm.images._tracks.values() if t.complete]
    assert evicted and kept
    # tiles from an evicted track must transparently requantize + serve
    cm = default_colormap_rgba8()
    tid = evicted[0].track_id
    body = tm.images.tile_body(tid, 0, cm, 0, 0, 0, 0)
    assert body is not None and len(body) > 0
    tm.images.drain()
    # byte-identical to the settled result
    assert body == tm.images.tile_body(tid, 0, cm, 0, 0, 0, 0)


def test_eviction_respects_lru_order(tmp_path):
    tl, tm = _build(tmp_path)
    tm.images.drain()
    cm = default_colormap_rgba8()
    # touch track 0 so it is most-recent
    tm.images.tile_body(0, 0, cm, 0, 0, 0, 0)
    per = tm.images._tracks[0].host_bytes()
    tm.images._host_budget = per * 2 + per // 2
    tm.images._evict_host()
    assert not tm.images._tracks[0].evicted  # most recent survives
    assert tm.images._tracks[1].evicted  # oldest evicted
