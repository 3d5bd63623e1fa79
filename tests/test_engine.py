"""Engine integration tests over the bundled samples corpus.

Mirrors reference: src-tauri/src/core/track.rs:460-500 and mod.rs:237-274.
"""

import numpy as np
import pytest

from thesia_tpu.dynamics import GuardClippingMode, NormalizeTarget
from thesia_tpu.engine import AudioTrack, TrackList, TrackManager, unique_filenames


@pytest.fixture()
def corpus(samples_dir):
    paths = {
        "tone": samples_dir / "1kHz_1sec_sr24kHz.wav",
        "8k": samples_dir / "sample_8k.wav",
        "16k": samples_dir / "sample_16k.wav",
    }
    for p in paths.values():
        if not p.exists():
            pytest.skip("sample corpus incomplete")
    return paths


def test_tracklist_add_remove(corpus):
    tl = TrackList()
    added = tl.add_tracks([0, 2], [str(corpus["tone"]), str(corpus["8k"])])
    assert sorted(added) == [0, 2]
    assert tl.all_ids() == [0, 2]
    assert tl.id_ch_tuples() == [(0, 0), (2, 0)]
    assert tl.find_id_by_path(str(corpus["tone"])) == 0
    assert tl.find_id_by_path(str(corpus["8k"])) == 2
    assert tl.filename(0) == "1kHz_1sec_sr24kHz.wav"
    assert tl.filename(2) == "sample_8k.wav"
    assert tl.max_sr() == 24000
    sec0, sec2 = tl[0].sec, tl[2].sec
    assert abs(tl.max_sec - max(sec0, sec2)) < 1e-12

    max_id, other_id = (0, 2) if sec0 >= sec2 else (2, 0)
    removed = tl.remove_tracks([max_id])
    assert removed == [(max_id, 0)]
    assert not tl.has(max_id) and tl.has(other_id)
    assert abs(tl.max_sec - tl[other_id].sec) < 1e-12
    assert tl.max_sr() == tl[other_id].sr

    removed = tl.remove_tracks([other_id])
    assert removed == [(other_id, 0)]
    assert tl.is_empty and tl.max_sec == 0.0 and tl.max_sr() == 0


def test_add_invalid_path_skipped(corpus, samples_dir):
    tl = TrackList()
    added = tl.add_tracks(
        [0, 1], [str(samples_dir / "invalid_audio.wav"), str(corpus["16k"])]
    )
    assert added == [1]


def test_track_manager_pipeline(corpus):
    tl = TrackList()
    tm = TrackManager()
    added = tl.add_tracks([0, 1], [str(corpus["tone"]), str(corpus["16k"])])
    tm.add_tracks(tl, added)
    assert len(tm.spec_imgs) == 0
    updated, max_sr = tm.apply_track_list_changes(tl)
    assert sorted(updated) == [0, 1]
    assert max_sr == 24000
    # the 1 kHz tone image must have energy (nonzero quantized pixels)
    img = tm.get_spectrogram((0, 0))
    assert img is not None and img.dtype == np.uint16
    assert (img > 0).any()
    assert tm.max_db <= 0.0 and tm.min_db >= tm.max_db - tm.db_range

    removed = tl.remove_tracks([0])
    tm.remove_tracks(tl, removed)
    updated, _ = tm.apply_track_list_changes(tl)
    assert updated == set() or updated == {1}  # only re-quantize if range moved


def test_track_normalize_changes_peak(corpus):
    track = AudioTrack(str(corpus["16k"]))
    orig_peak = track.stats.max_peak
    track.normalize(NormalizeTarget("PeakdB", -3.0), GuardClippingMode.Clip)
    new_peak = track.audio.stats.max_peak
    assert abs(new_peak - 10 ** (-3 / 20)) < 1e-3
    # original untouched
    assert track.original.stats.max_peak == orig_peak
    # normalize off restores original
    track.normalize(NormalizeTarget(), GuardClippingMode.Clip)
    assert track.audio is track.original


def test_common_normalize_applied_to_all(corpus):
    tl = TrackList()
    tl.add_tracks([0, 1], [str(corpus["tone"]), str(corpus["16k"])])
    tl.set_common_normalize(NormalizeTarget("PeakdB", -6.0))
    for track_id in tl.all_ids():
        assert abs(tl[track_id].stats.max_peak - 10 ** (-6 / 20)) < 1e-3
    tl.set_common_normalize(NormalizeTarget())
    for track_id in tl.all_ids():
        assert tl[track_id].audio is tl[track_id].original


def test_unique_filenames():
    paths = {
        0: "/a/b/x.wav",
        1: "/a/c/x.wav",
        2: "/a/b/y.wav",
    }
    names = unique_filenames(paths)
    assert names[2] == "y.wav"
    assert names[0] == "b/x.wav"
    assert names[1] == "c/x.wav"


def test_spec_setting_recompute(corpus):
    from thesia_tpu.dsp import SpecSetting
    from thesia_tpu.common.freqscale import FreqScale

    tl = TrackList()
    tm = TrackManager()
    added = tl.add_tracks([0], [str(corpus["tone"])])
    tm.add_tracks(tl, added)
    tm.apply_track_list_changes(tl)
    h_mel = tm.get_spectrogram((0, 0)).shape

    tm.set_setting(tl, SpecSetting(freq_scale=FreqScale.Linear))
    h_lin = tm.get_spectrogram((0, 0)).shape
    assert h_lin[0] > h_mel[0]  # linear has n_fft//2+1 rows >> n_mel rows
    assert h_lin[1] == h_mel[1]  # same frame count


def test_device_quantizer_matches_host(corpus):
    """TrackManager's batched device quantization == the host reference
    quantizer (drawing.rs semantics) on real audio."""
    import jax.numpy as jnp

    from thesia_tpu.dsp.spectrogram import frame_cap
    from thesia_tpu.engine.images import _quantize_and_mips, mip_plan
    from thesia_tpu.render.mips import build_mip_chain
    from thesia_tpu.render.visualize import convert_spectrogram_to_img

    tl = TrackList()
    tm = TrackManager()
    added = tl.add_tracks([0], [str(corpus["16k"])])
    tm.add_tracks(tl, added)
    tm.apply_track_list_changes(tl)
    res = tm.specs[0]
    i_start, i_end = tm.setting.freq_scale.hz_range_to_idx(
        (0.0, tm.max_sr / 2.0), tl[0].sr, res.n_freq
    )
    levels = tuple(mip_plan(res.n_frames))
    outs = _quantize_and_mips(
        res.db_padded,
        jnp.float32(tm.min_db),
        jnp.float32(tm.max_db - tm.min_db),
        jnp.int32(res.n_frames),
        i_start=i_start,
        n_rows=max(min(i_end, res.n_freq) - i_start, 0),
        height=i_end - i_start,
        min_value=max(int(np.round(65535.0 / tm.colormap_length)), 1),
        mip_levels=levels,
        t_valid_static=frame_cap(res.n_frames),
    )
    dev = np.asarray(outs[0])[0, :, : res.n_frames]
    host = convert_spectrogram_to_img(
        np.asarray(res.db_padded)[0, : res.n_frames],
        (i_start, i_end),
        (tm.min_db, tm.max_db),
        tm.colormap_length,
    )
    assert dev.shape == host.shape
    # identical semantics; allow <=1 count on rounding-boundary pixels
    diff = np.abs(dev.astype(int) - host.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999
    # device mip chain == host chain built on the exactly-sliced image
    # (garbage-column clamping makes odd-width tails match the host's
    # copy-through at every level)
    host_chain = build_mip_chain(dev, min_width=1)
    for lvl, mip_dev in zip(levels, outs[1:]):
        want_w = -(-res.n_frames // (1 << lvl))
        got = np.asarray(mip_dev)[0, :, :want_w]
        np.testing.assert_array_equal(got, host_chain[lvl - 1][:, :want_w])


def test_many_tracks_mixed_sr_batched_scale(tmp_path):
    """12 mixed-(sr, n_ch, length) tracks through the full TrackManager:
    batched groups reproduce per-track computes, removals keep state
    coherent, and a settings change reuses the device group cache."""
    from tests.synth import synth_stereo_write
    from thesia_tpu.dsp.framing import SpecSetting
    from thesia_tpu.engine.manager import TrackManager
    from thesia_tpu.engine.track import TrackList

    configs = [
        (8000, 1, 0.9), (8000, 2, 0.9), (8000, 1, 0.5), (8000, 2, 1.4),
        (16000, 2, 0.8), (16000, 1, 0.8), (16000, 2, 0.4),
        (22050, 1, 1.0), (22050, 2, 1.0),
        (44100, 1, 0.3), (44100, 2, 0.3), (11025, 1, 0.7),
    ]
    paths = []
    for i, (sr, ch, sec) in enumerate(configs):
        p = tmp_path / f"t{i}.wav"
        synth_stereo_write(p, sr=sr, sec=sec)
        paths.append(str(p))
    # synth_stereo_write always writes stereo; mono configs use ch count from
    # the decode (2) — the point is scale + mixed sr, not channel shapes

    tl = TrackList()
    tm = TrackManager()
    ids = tl.add_tracks(list(range(len(paths))), paths)
    assert ids == list(range(12))
    tm.add_tracks(tl, ids)
    tm.apply_track_list_changes(tl)
    assert set(tm.specs) == set(ids)
    assert len(tm.spec_imgs) == sum(tl[i].n_ch for i in ids)

    # batched results == a fresh per-track compute
    from thesia_tpu.dsp.spectrogram import SpectrogramAnalyzer

    fresh = SpectrogramAnalyzer()
    for tid in [0, 4, 8, 11]:
        solo = fresh.calc_spec_multi(tl[tid].audio.wavs, tl[tid].sr, tm.setting)
        batched = tm.specs[tid]
        np.testing.assert_array_equal(
            np.asarray(batched.db_padded)[:, : batched.n_frames],
            np.asarray(solo.db_padded)[:, : solo.n_frames],
        )

    # settings change: group buffers hit the device cache (no re-upload)
    cache_before = dict(tm.spec_analyzer._wav_cache)
    tm.set_setting(tl, SpecSetting(win_ms=20.0, t_overlap=4, f_overlap=1))
    for k, v in cache_before.items():
        assert tm.spec_analyzer._wav_cache.get(k) is v  # same device buffers

    # removal keeps the remaining state coherent
    removed = tl.remove_tracks([0, 5, 11])
    tm.remove_tracks(tl, removed)
    tm.apply_track_list_changes(tl)
    assert set(tm.specs) == set(ids) - {0, 5, 11}
    assert all(k[0] not in {0, 5, 11} for k in tm.spec_imgs)


def test_multichannel_5ch_track(tmp_path):
    """5-channel track: decode keeps all channels, per-channel specs/images
    exist, LUFS applies the surround weight to ch>=3 (BS.1770 / stats.rs)."""
    from thesia_tpu.dynamics.loudness import integrated_lufs
    from thesia_tpu.engine.manager import TrackManager
    from thesia_tpu.engine.track import TrackList
    from thesia_tpu.io.wav import encode_wav_s16

    sr = 8000
    rng = np.random.default_rng(11)
    w = (rng.uniform(-0.5, 0.5, (5, 6000))).astype(np.float32)
    p = tmp_path / "five.wav"
    p.write_bytes(encode_wav_s16(w, sr))

    tl = TrackList()
    tm = TrackManager()
    ids = tl.add_tracks([0], [str(p)])
    assert ids == [0] and tl[0].n_ch == 5
    tm.add_tracks(tl, ids)
    tm.apply_track_list_changes(tl)
    assert {(0, ch) for ch in range(5)} <= set(tm.spec_imgs)
    # surround weighting: zeroing a surround channel changes LUFS more than
    # the same-energy front channel would if weights were equal
    decoded = tl[0].original.wavs
    full = integrated_lufs(decoded, sr)
    no_surround = decoded.copy()
    no_surround[4] = 0.0
    assert integrated_lufs(no_surround, sr) < full


def test_concurrent_tile_fetch_storm(tmp_path):
    """48 threads hammering waveform+spectrogram tiles while a write runs:
    no errors, every response well-formed (RwLock + LRU lock soak)."""
    import concurrent.futures

    from tests.synth import synth_stereo_write
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.render import decode_spectrogram_tile, decode_waveform_tile, default_colormap_rgba8

    p = tmp_path / "t.wav"
    synth_stereo_write(p, sr=8000, sec=2.0)
    s = EngineSession(settings_dir=tmp_path / "cfg")
    s.init(default_colormap_rgba8())
    s.add_tracks([0], [str(p)])
    s.apply_track_list_changes()

    def fetch(i):
        with s.rw.read():
            if i % 2:
                t = decode_waveform_tile(s.get_waveform_tile("0_0", i % 6, 0))
                return t["binCount"] >= 0
            t = decode_spectrogram_tile(
                s.get_spectrogram_tile("0_0", i % 3, 0, (i // 3) % 2, 0)
            )
            return t["width"] >= 0

    with concurrent.futures.ThreadPoolExecutor(16) as pool:
        futs = [pool.submit(fetch, i) for i in range(48)]
        s.set_db_range(90.0)  # concurrent write
        results = [f.result() for f in futs]
    assert all(results)
    assert s.tm.db_range == 90.0


def test_device_scalar_gain_bitexact_and_no_reupload(tmp_path):
    """Device-side gain (VERDICT-r3 follow-on): when the guard is a no-op,
    normalize uploads NOTHING — the spec path reuses the ORIGINAL device wav
    and applies the scalar on device, producing u16 images IDENTICAL to the
    host-gain path (f32 multiply is bit-deterministic either side)."""
    from thesia_tpu.engine.track import AudioTrack as AT
    from thesia_tpu.io.wav import encode_wav_s16

    rng = np.random.default_rng(21)
    paths = []
    for i, (sr, c) in enumerate([(8000, 2), (8000, 1), (16000, 1)]):
        w = (0.05 * rng.uniform(-1, 1, (c, sr))).astype(np.float32)  # quiet
        p = tmp_path / f"g{i}.wav"
        p.write_bytes(encode_wav_s16(w, sr))
        paths.append(str(p))

    def run(force_host_path: bool):
        tl = TrackList()
        tm = TrackManager()
        ids = tl.add_tracks(list(range(len(paths))), paths)
        if force_host_path:
            for tid in ids:
                tl[tid].device_scalar_gain = lambda: None  # legacy upload path
        tm.add_tracks(tl, ids)
        tm.apply_track_list_changes(tl)
        tm.images.drain()
        tl.set_common_normalize(NormalizeTarget("LUFS", -30.0))
        tm.update_all_specs_imgs(tl)
        tm.images.drain()
        # quiet tracks normalized DOWN to -30 LUFS: guard must be a no-op
        gains = [tl[tid].device_scalar_gain() for tid in ids]
        if not force_host_path:
            assert all(g is not None for g in gains)
        return dict(tm.spec_imgs), tm

    imgs_dev, tm_dev = run(force_host_path=False)
    imgs_host, _ = run(force_host_path=True)
    assert set(imgs_dev) == set(imgs_host) and imgs_dev
    for k in imgs_host:
        np.testing.assert_array_equal(np.asarray(imgs_dev[k]), np.asarray(imgs_host[k]))

    # and the device wav cache still holds the ORIGINAL-version uploads:
    # a second normalize change reuses the same device buffers (no h2d)
    tl2 = TrackList()
    tm2 = TrackManager()
    ids = tl2.add_tracks(list(range(len(paths))), paths)
    tm2.add_tracks(tl2, ids)
    tm2.apply_track_list_changes(tl2)
    tm2.images.drain()
    cache = tm2.spec_analyzer._wav_cache
    before = {k: id(v[0]) for k, v in cache.items()}
    tokens_before = {k: v[2] for k, v in cache.items()}
    tl2.set_common_normalize(NormalizeTarget("LUFS", -25.0))
    tm2.update_all_specs_imgs(tl2)
    tm2.images.drain()
    after = {k: id(v[0]) for k, v in tm2.spec_analyzer._wav_cache.items()}
    tokens_after = {k: v[2] for k, v in tm2.spec_analyzer._wav_cache.items()}
    assert before and after == before  # same device buffers, zero re-upload
    assert tokens_after == tokens_before  # keyed on ORIGINAL versions


def test_evicted_spec_recompute_keeps_original_token(tmp_path, monkeypatch):
    """_ensure_spec must source through _spec_source: recomputing a
    budget-evicted spec for a normalized (guard no-op) track reuses the
    ORIGINAL-version device wav instead of re-uploading post-gain samples
    (review finding: the old path clobbered the cache token)."""
    from thesia_tpu.io.wav import encode_wav_s16

    rng = np.random.default_rng(41)
    p = tmp_path / "t.wav"
    p.write_bytes(encode_wav_s16((0.05 * rng.uniform(-1, 1, (1, 8000))).astype(np.float32), 8000))
    tl = TrackList()
    tm = TrackManager()
    ids = tl.add_tracks([0], [str(p)])
    tm.add_tracks(tl, ids)
    tm.apply_track_list_changes(tl)
    tl.set_common_normalize(NormalizeTarget("LUFS", -30.0))
    tm.update_all_specs_imgs(tl)
    tm.images.drain()
    assert tl[0].device_scalar_gain() not in (None, 1.0)
    cache = tm.spec_analyzer._wav_cache
    dev_id = id(cache[0][0])
    token = cache[0][2]
    assert token == tl[0].original.version
    tm.specs.pop(0)  # simulate budget eviction
    res = tm._ensure_spec(tl, 0)
    assert res is not None
    assert id(cache[0][0]) == dev_id and cache[0][2] == token  # no re-upload
