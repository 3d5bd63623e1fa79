"""Output-stream layer tests: callback fill, mixing, resampling, device
select, error capture + rebuild — driven through the sink path, not just
the pure functions (VERDICT r1 item 4).

reference behavior: src-tauri/src/player/stream.rs:242-660, device.rs:15-103,
player.rs:130-164.
"""

import threading
import time

import numpy as np
import pytest

from thesia_tpu.player.player import PlaybackData, Player
from thesia_tpu.player.resampler import StreamResampler
from thesia_tpu.player.stream import (
    NullOutputDevice,
    OutputDevice,
    OutputEngine,
    PlaybackStreamSource,
    StreamConfig,
    SupportedConfigRange,
    convert_sample_format,
    mix_frames,
    select_output_config,
)


def make_playback(samples, n_ch, sr, playing=True, volume=1.0):
    p = PlaybackData()
    p.track_id = 0
    p.samples = np.asarray(samples, np.float32)
    p.input_channels = n_ch
    p.sample_rate = sr
    p.volume = volume
    p.is_playing = playing
    return p


# ---------------------------------------------------------------------------
# callback fill


def test_fill_stereo_identity_and_position_advance():
    frames = np.arange(400, dtype=np.float32) / 400.0
    inter = np.stack([frames, -frames], 1).reshape(-1)
    p = make_playback(inter, 2, 48000)
    src = PlaybackStreamSource(p, threading.Lock())
    out = src.fill(128, 2, 48000)
    np.testing.assert_array_equal(out[:, 0], frames[:128])
    np.testing.assert_array_equal(out[:, 1], -frames[:128])
    assert p.position_frame == 128.0
    out2 = src.fill(128, 2, 48000)
    np.testing.assert_array_equal(out2[:, 0], frames[128:256])
    assert p.position_frame == 256.0


def test_fill_mono_broadcast_and_volume_clamp():
    mono = np.full(1000, 0.8, np.float32)
    p = make_playback(mono, 1, 48000, volume=2.0)
    src = PlaybackStreamSource(p, threading.Lock())
    out = src.fill(64, 2, 48000)
    assert out.shape == (64, 2)
    np.testing.assert_array_equal(out, np.full((64, 2), 1.0, np.float32))  # clamped


def test_fill_track_end_pauses_and_flags():
    p = make_playback(np.ones(100, np.float32) * 0.5, 1, 8000)
    src = PlaybackStreamSource(p, threading.Lock())
    out = src.fill(256, 2, 8000)
    np.testing.assert_array_equal(out[:100], np.full((100, 2), 0.5, np.float32))
    np.testing.assert_array_equal(out[100:], 0.0)  # silence past the end
    assert src.reached_end and not p.is_playing
    assert p.position_frame == 100.0


def test_fill_paused_renders_silence_without_advancing():
    p = make_playback(np.ones(1000, np.float32), 1, 8000, playing=False)
    src = PlaybackStreamSource(p, threading.Lock())
    out = src.fill(64, 2, 8000)
    np.testing.assert_array_equal(out, 0.0)
    assert p.position_frame == 0.0


def test_fill_resampled_matches_stream_resampler():
    """sr-mismatch path == feeding the StreamResampler directly."""
    sr_in, sr_out = 44100, 48000
    rng = np.random.default_rng(0)
    wav = (rng.uniform(-0.5, 0.5, 8000)).astype(np.float32)
    p = make_playback(wav, 1, sr_in)
    src = PlaybackStreamSource(p, threading.Lock())
    got = np.concatenate([src.fill(512, 1, sr_out)[:, 0] for _ in range(6)])

    rs = StreamResampler(sr_in, sr_out, 1)
    expect = []
    fed = 0
    while len(np.concatenate(expect) if expect else []) < len(got) and fed < len(wav) + 8192:
        chunk = np.zeros(1024, np.float32)
        avail = max(min(1024, len(wav) - fed), 0)
        if avail:
            chunk[:avail] = wav[fed : fed + avail]
        expect.append(rs.process(chunk[None, :])[0])
        fed += 1024
    expect = np.concatenate(expect)[: len(got)]
    np.testing.assert_allclose(got, np.clip(expect, -1, 1), atol=1e-6)
    # position advanced at the exact rate ratio
    assert p.position_frame == pytest.approx(6 * 512 * sr_in / sr_out)


def test_fill_seek_resets_resampler_via_cursor_version():
    sr_in, sr_out = 44100, 48000
    wav = np.sin(np.arange(20000) * 0.01).astype(np.float32)
    p = make_playback(wav, 1, sr_in)
    src = PlaybackStreamSource(p, threading.Lock())
    src.fill(512, 1, sr_out)
    p.position_frame = 10000.0
    p.cursor_version += 1  # seek
    out = src.fill(512, 1, sr_out)
    # compare to a fresh source started at the same position
    p2 = make_playback(wav, 1, sr_in)
    p2.position_frame = 10000.0
    fresh = PlaybackStreamSource(p2, threading.Lock()).fill(512, 1, sr_out)
    np.testing.assert_array_equal(out, fresh)


# ---------------------------------------------------------------------------
# mixing / formats


def test_mix_frames_rules():
    src = np.array([[0.1, 0.3]], np.float32)
    np.testing.assert_allclose(mix_frames(src, 1)[0, 0], 0.2, atol=1e-7)
    np.testing.assert_array_equal(
        mix_frames(src, 4)[0], np.array([0.1, 0.3, 0.1, 0.3], np.float32)
    )
    mono = np.array([[0.7]], np.float32)
    np.testing.assert_array_equal(
        mix_frames(mono, 2)[0], np.array([0.7, 0.7], np.float32)
    )
    five = np.array([[0.1, 0.2, 0.3, 0.4, 0.5]], np.float32)
    np.testing.assert_array_equal(
        mix_frames(five, 2)[0], np.array([0.1, 0.2], np.float32)
    )


def test_convert_sample_format():
    block = np.array([[-1.0, 0.0, 1.0]], np.float32)
    i16 = convert_sample_format(block, "i16")
    assert i16.dtype == np.int16 and list(i16[0]) == [-32768, 0, 32767]
    u16 = convert_sample_format(block, "u16")
    assert u16.dtype == np.uint16 and list(u16[0]) == [0, 32768, 65535]
    i24 = convert_sample_format(block, "i24")
    assert list(i24[0]) == [-8388608, 0, 8388607]


# ---------------------------------------------------------------------------
# device select (reference device.rs:15-103)


class FakeDevice(OutputDevice):
    name = "fake"

    def __init__(self, ranges, default):
        self._ranges = ranges
        self._default = default
        self.alive = True
        self.open_count = 0
        self.fail_next_open = False

    def supported_configs(self):
        return self._ranges

    def default_config(self):
        return self._default

    def is_alive(self):
        return self.alive

    def open_stream(self, config, callback):
        self.open_count += 1
        if self.fail_next_open:
            self.fail_next_open = False
            raise RuntimeError("device busy")

        class _H:
            error = None
            closed = False

            def close(self_h):
                self_h.closed = True

        h = _H()
        if not hasattr(self, "handles"):
            self.handles = []
        self.handles.append(h)
        return h


def test_select_output_config_nearest_with_at_least_tiebreak():
    dflt = StreamConfig(2, 44100, 512, "f32")
    dev = FakeDevice(
        [
            SupportedConfigRange(2, 8000, 48000, "f32"),
            SupportedConfigRange(2, 88200, 96000, "f32"),
            SupportedConfigRange(1, 8000, 192000, "f32"),  # wrong channels
        ],
        dflt,
    )
    assert select_output_config(dev, 44100).sample_rate == 44100
    assert select_output_config(dev, 96000).sample_rate == 96000
    # 60000: candidates give 48000 (dist 12000) vs 88200 (dist 28200) -> 48000
    assert select_output_config(dev, 60000).sample_rate == 48000
    # tie at equal distance prefers >= requested: 68100 -> 48000 dist 20100,
    # 88200 dist 20100 -> prefer 88200 (>= target)
    assert select_output_config(dev, 68100).sample_rate == 88200
    assert select_output_config(dev, 0) == dflt
    # channel filter ignores the mono range
    assert select_output_config(dev, 192000).sample_rate == 96000


def test_select_output_config_fallback_tiers():
    """reference device.rs:69-81: default channels+format first, then
    format-only, then any range — a device without the default layout must
    still serve the nearest supported rate (review finding)."""
    dflt = StreamConfig(2, 48000, 512, "f32")
    # tier 2: no 2ch f32 range, but a 6ch f32 one
    dev = FakeDevice([SupportedConfigRange(6, 8000, 96000, "f32")], dflt)
    cfg = select_output_config(dev, 44100)
    assert (cfg.sample_rate, cfg.channels, cfg.sample_format) == (44100, 6, "f32")
    # tier 3: nothing in the default format at all
    dev = FakeDevice([SupportedConfigRange(2, 8000, 96000, "i16")], dflt)
    cfg = select_output_config(dev, 44100)
    assert (cfg.sample_rate, cfg.sample_format) == (44100, "i16")
    # no ranges: the default passes through
    assert select_output_config(FakeDevice([], dflt), 44100) == dflt


def test_fill_resampled_plays_full_tail_before_end():
    """The resampler out-queue holds the real track tail when the display
    position hits the end; ending there truncated it audibly.  End must
    fire only once the queue cannot fill the buffer anymore (reference
    drains rubato before mark_track_end; review finding)."""
    sr_in, sr_out, n = 44100, 48000, 44100 // 5  # 200 ms tone
    t = np.arange(n) / sr_in
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = make_playback(wav, 1, sr_in)
    src = PlaybackStreamSource(p, threading.Lock())
    frames, out_frames, ended_at = 256, 0, None
    for i in range(200):
        out = src.fill(frames, 2, sr_out)
        out_frames += int((np.abs(out).max(axis=1) > 0).sum())
        if src.reached_end:
            ended_at = i
            break
    assert ended_at is not None
    expected = int(n * sr_out / sr_in)
    # the full resampled tail made it out (allow the sinc edge fade)
    assert out_frames >= expected - 64
    assert not p.is_playing


def test_resume_at_end_reemits_ended():
    """Pressing play at the track end must emit a fresh 'ended' state
    (reference fires mark_track_end every reached_end && is_playing pass,
    stream.rs:433-439) — resume re-arms the end latch (review finding)."""
    import time

    from thesia_tpu.player.player import Player

    sr = 100000
    samples = np.zeros(sr // 100, np.float32)  # 10 ms track
    store = {0: (samples, 1, sr, 0.01)}
    events = []
    p = Player(lambda tid: store.get(tid), lambda e: events.append(dict(e)))
    p.max_sec = 0.01
    p.set_track(0, 0.0)
    p.resume()
    deadline = time.monotonic() + 2.0
    while time.monotonic() < deadline:
        p.tick()
        if not p.playback.is_playing:
            break
        time.sleep(0.02)
    assert not p.playback.is_playing  # first end reached
    events.clear()
    p.resume()  # play again AT the end, without seeking
    ended = False
    deadline = time.monotonic() + 2.0
    while time.monotonic() < deadline:
        p.tick()
        if any(not e["isPlaying"] for e in events):
            ended = True
            break
        time.sleep(0.02)
    assert ended, "no second 'ended' state event after resume-at-end"


def test_output_engine_rebuilds_on_error_and_device_loss():
    p = make_playback(np.ones(100, np.float32), 1, 8000)
    dev = FakeDevice(
        [SupportedConfigRange(2, 8000, 192000, "f32")], StreamConfig(2, 48000, 256, "f32")
    )
    eng = OutputEngine(p, threading.Lock(), device=dev)
    eng.ensure_stream(44100)
    assert eng.config.sample_rate == 44100 and dev.open_count == 1
    # stream open failure surfaces the error; next poll rebuilds
    dev.fail_next_open = True
    eng.ensure_stream(48000)
    assert "device busy" in eng.error
    eng._last_poll = 0.0
    eng.poll()
    assert eng.error == "" and eng.config.sample_rate == 48000
    assert dev.open_count == 3


def test_null_device_paced_stream_consumes_in_real_time():
    calls = []

    dev = NullOutputDevice(default_sr=8000)
    cfg = StreamConfig(2, 8000, 160, "f32")  # 20 ms buffers

    def cb(n, ch, sr):
        calls.append((n, ch, sr))
        return np.zeros((n, ch), np.float32)

    h = dev.open_stream(cfg, cb)
    time.sleep(0.12)
    h.close()
    assert h.error is None
    # ~6 buffers in 120 ms of 20 ms periods (allow generous jitter)
    assert 3 <= len(calls) <= 10
    assert calls[0] == (160, 2, 8000)


def test_player_with_stream_sink_end_to_end():
    """Player + OutputEngine on the null device: resume plays through the
    callback, position advances in real time, end-of-track pauses."""
    sr = 8000
    wav = np.sin(np.arange(int(sr * 0.3)) * 0.1).astype(np.float32)

    def get_track(track_id):
        return (wav, 1, sr, len(wav) / sr) if track_id == 0 else None

    events = []
    player = Player(get_track, emit=events.append, output="auto")
    assert player.output_engine is not None
    player.max_sec = len(wav) / sr
    player.set_sr(sr)
    player.set_track(0, 0.0)
    player.resume()
    deadline = time.monotonic() + 3.0
    while time.monotonic() < deadline and not player.output_engine.source.reached_end:
        player.tick()
        time.sleep(0.02)
    player.tick()  # deliver the end-of-track emit
    assert player.output_engine.source.reached_end
    assert not player.playback.is_playing
    assert player.playback.position_sec() == pytest.approx(0.3, abs=0.01)
    assert any(not e["isPlaying"] and e["positionSec"] > 0.29 for e in events)


def test_fill_output_rate_change_reanchors_feed_cursor():
    """A set_sr round trip (resampled -> equal-rate -> resampled) must
    re-anchor the resampler feed cursor to the CURRENT position; before the
    fix the stale cursor resumed audio from wherever the resampled branch
    last fed (review finding)."""
    sr = 32000
    n = sr * 4
    ramp = (np.arange(n, dtype=np.float32) / n).astype(np.float32)  # position-coded
    p = make_playback(ramp, 1, sr)
    src = PlaybackStreamSource(p, threading.Lock())
    # resampled branch feeds and queues from position 0
    src.fill(256, 1, 48000)
    assert src._feed_pos is not None and src._feed_pos > 0
    # equal-rate branch for a while: position advances far ahead
    for _ in range(20):
        src.fill(1024, 1, sr)
    pos_now = p.position_frame
    assert pos_now > 20_000
    # back to the resampled rate: output must reflect the CURRENT position
    out = src.fill(256, 1, 48000)
    # the sinc filter has a half-width warmup of near-zero output; compare a
    # settled sample: its value encodes the source position (ramp)
    settled = float(out[200, 0])
    expected = (pos_now + 200 * sr / 48000) / n
    assert abs(settled - expected) < 0.02, (settled, expected)


def test_engine_rebuild_serialized_under_lock():
    """Concurrent ensure_stream/poll must never leak a second live stream
    (rebuild is serialized)."""
    import itertools

    from thesia_tpu.player.stream import OutputEngine

    p = make_playback(np.zeros(1000, np.float32), 1, 8000)
    dev = FakeDevice(
        [SupportedConfigRange(2, 8000, 48000, "f32")],
        StreamConfig(2, 48000, 256, "f32"),
    )
    eng = OutputEngine(p, threading.Lock(), device=dev)
    stop = threading.Event()

    def churn(fn):
        for i in itertools.count():
            if stop.is_set():
                return
            fn(8000 + (i % 3) * 8000)

    threads = [
        threading.Thread(target=churn, args=(eng.ensure_stream,)),
        threading.Thread(target=churn, args=(lambda _sr: eng.poll(),)),
    ]
    for t in threads:
        t.start()
    time.sleep(0.5)
    stop.set()
    for t in threads:
        t.join(timeout=5)
    # every opened stream except the live one must have been closed
    assert dev.open_count >= 1
    live = [h for h in getattr(dev, "handles", []) if not h.closed]
    if hasattr(dev, "handles"):
        assert len(live) <= 1
    eng.close()
