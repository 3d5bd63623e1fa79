"""Player subsystem tests: mixing rules, resampler quality, state machine.

Mixing goldens mirror reference: src-tauri/src/player/stream.rs:662-746,
state machine reference: player/state.rs:268-326.
"""

import numpy as np
import pytest

from thesia_tpu.player.mixing import render_block, source_sample_for_output
from thesia_tpu.player.player import PlaybackData, Player
from thesia_tpu.player.resampler import StreamResampler


def test_mono_to_stereo():
    samples = np.array([0.1, 0.2, 0.3], np.float32)  # mono
    assert source_sample_for_output(samples, 1, 1, 0, 2) == np.float32(0.2)
    assert source_sample_for_output(samples, 1, 1, 1, 2) == np.float32(0.2)


def test_stereo_to_mono_averages():
    samples = np.array([0.2, 0.4, 0.6, 0.8], np.float32)  # 2 frames stereo
    out = source_sample_for_output(samples, 2, 0, 0, 1)
    assert abs(out - 0.3) < 1e-7


def test_stereo_to_multichannel_wraps():
    samples = np.array([0.1, 0.9], np.float32)
    assert source_sample_for_output(samples, 2, 0, 0, 4) == np.float32(0.1)
    assert source_sample_for_output(samples, 2, 1 - 1, 1, 4) == np.float32(0.9)
    assert source_sample_for_output(samples, 2, 0, 2, 4) == np.float32(0.1)
    assert source_sample_for_output(samples, 2, 0, 3, 4) == np.float32(0.9)


def test_out_of_range_is_silence():
    samples = np.array([0.5], np.float32)
    assert source_sample_for_output(samples, 1, 5, 0, 2) == 0.0
    assert source_sample_for_output(samples, 0, 0, 0, 2) == 0.0


def test_render_block_matches_scalar_path():
    rng = np.random.default_rng(0)
    samples = rng.uniform(-1, 1, 3 * 7).astype(np.float32)  # 7 frames of 3ch
    block = render_block(samples, 3, 2, 8, 2, volume=0.5)
    assert block.shape == (8, 2)
    for f in range(8):
        for oc in range(2):
            exp = source_sample_for_output(samples, 3, 2 + f, oc, 2) * 0.5
            assert abs(block[f, oc] - np.float32(exp)) < 1e-6


def _resample_tone(sr_in, sr_out, f_tone, sec=2):
    n = sr_in * sec
    t = np.arange(n) / sr_in
    tone = np.sin(2 * np.pi * f_tone * t).astype(np.float32)[None, :]
    rs = StreamResampler(sr_in, sr_out, 1)
    chunks = [rs.process(tone[:, i : i + 4096]) for i in range(0, n, 4096)]
    return np.concatenate(chunks, axis=1)[0]


def _spur_floor_dbc(out, sr_out, f_tone):
    """Worst spur level relative to the carrier, excluding +-40 bins."""
    mid = out[len(out) // 4 : len(out) // 4 + 32768]
    spec = np.abs(np.fft.rfft(mid * np.blackman(len(mid))))
    spec /= spec.max()
    sb = int(np.argmax(spec))
    mask = np.ones(len(spec), bool)
    mask[max(0, sb - 40) : sb + 41] = False
    return -20 * np.log10(max(spec[mask].max(), 1e-12))


def test_resampler_tone_quality():
    """Passband quality gate (VERDICT r2 #7): tones survive 44.1k<->48k both
    ways with every spur >=80 dB below the carrier — the quality class of
    the reference's rubato sinc-256/BlackmanHarris2 resampler
    (reference: src-tauri/src/player/stream.rs:14-233). Measured floor here
    is ~84.5 dBc (the 256-tap window's stopband)."""
    for sr_in, sr_out, f in [
        (44100, 48000, 1000.0),
        (48000, 44100, 1000.0),
        (44100, 48000, 10000.0),
        (48000, 44100, 18000.0),
    ]:
        out = _resample_tone(sr_in, sr_out, f)
        expect = f * len(out) // 1  # sanity via peak location below
        mid = out[len(out) // 4 : len(out) // 4 + 32768]
        spec = np.abs(np.fft.rfft(mid * np.blackman(len(mid))))
        peak_hz = np.argmax(spec) * sr_out / len(mid)
        assert abs(peak_hz - f) < 10, (sr_in, sr_out, f, peak_hz)
        floor = _spur_floor_dbc(out, sr_out, f)
        assert floor >= 80.0, (sr_in, sr_out, f, floor)
        # rate correct within 0.2%
        assert abs(len(out) - 2 * sr_out) < sr_out * 0.002 * 2


def test_resampler_stopband_alias_rejection():
    """Anti-alias gate: a tone above the OUTPUT Nyquist must vanish into the
    stopband (>=60 dB down; measured >120 dB)."""
    for sr_in, sr_out, f in [(48000, 44100, 23000.0), (48000, 8000, 10000.0)]:
        out = _resample_tone(sr_in, sr_out, f)
        mid = out[len(out) // 4 : len(out) // 4 + 32768]
        spec = np.abs(np.fft.rfft(mid * np.blackman(len(mid))))
        # carrier amplitude of an equal-level in-band tone for reference
        ref = _resample_tone(sr_in, sr_out, 1000.0)
        mid_r = ref[len(ref) // 4 : len(ref) // 4 + 32768]
        spec_r = np.abs(np.fft.rfft(mid_r * np.blackman(len(mid_r))))
        rejection = 20 * np.log10(spec_r.max() / max(spec.max(), 1e-12))
        assert rejection >= 60.0, (sr_in, sr_out, f, rejection)


def test_resampler_native_matches_numpy():
    """The C hot loop is bit-identical to the numpy reference path."""
    from thesia_tpu import native

    if not native.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, 20000)).astype(np.float32)
    rs_n = StreamResampler(44100, 48000, 2)
    out_n = rs_n.process(x)
    orig = native.available
    native.available = lambda: False
    try:
        rs_p = StreamResampler(44100, 48000, 2)
        out_p = rs_p.process(x)
    finally:
        native.available = orig
    # f64 accumulation order differs (einsum pairwise vs sequential): 1 ulp
    np.testing.assert_allclose(out_n, out_p, atol=2e-7, rtol=0)
    assert rs_n._pos == rs_p._pos


def test_resampler_downsample():
    sr_in, sr_out = 48000, 8000
    t = np.arange(sr_in // 2) / sr_in
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None, :]
    rs = StreamResampler(sr_in, sr_out, 1)
    out = rs.process(tone)[0]
    assert abs(len(out) - sr_out // 2) < sr_out * 0.02
    mid = out[500 : 500 + 2048]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak_hz = np.argmax(spec) * sr_out / len(mid)
    assert abs(peak_hz - 440.0) < 10


# ---------------------------------------------------------------------------
# state machine


def _tracks(store):
    def get_track(track_id):
        return store.get(track_id)

    return get_track


def test_player_set_track_seek_pause_resume():
    sr = 1000
    samples = np.zeros(2 * sr, np.float32)  # 2 s mono track (interleaved)
    store = {7: (samples, 1, sr, 2.0)}
    events = []
    p = Player(_tracks(store), events.append)
    p.max_sec = 2.0

    p.set_track(7, 0.5)
    assert p.playback.track_id == 7
    assert abs(p.playback.position_sec() - 0.5) < 1e-9
    assert not p.playback.is_playing

    p.resume()
    assert p.playback.is_playing
    p.pause()
    assert not p.playback.is_playing

    p.seek(5.0)  # clamps to max_sec then track length
    assert abs(p.playback.position_sec() - 2.0) < 1e-9
    p.seek(-1.0)
    assert p.playback.position_sec() == 0.0

    # unknown track clears state (reference: state.rs:222-233)
    p.set_track(99, None)
    assert p.playback.track_id is None and not p.playback.is_playing
    assert len(events) >= 4


def test_player_position_advances_and_ends():
    import time

    sr = 100000
    samples = np.zeros(sr // 100, np.float32)  # 10 ms track
    store = {0: (samples, 1, sr, 0.01)}
    p = Player(_tracks(store))
    p.max_sec = 0.01
    p.set_track(0, 0.0)
    p.resume()
    # poll up to 2 s: the 10 ms track ends almost immediately, but position
    # is paced by the output sink's consumer thread, which can stall when
    # the machine is loaded (the fixed 50 ms sleep flaked under a
    # concurrent benchmark run)
    deadline = time.monotonic() + 2.0
    while time.monotonic() < deadline:
        p.tick()
        if not p.playback.is_playing:
            break
        time.sleep(0.02)
    assert not p.playback.is_playing  # reached end
    assert abs(p.playback.position_sec() - 0.01) < 1e-9


def test_position_sec_clamps():
    pd = PlaybackData(
        samples=np.zeros(6, np.float32), input_channels=2, sample_rate=3, position_frame=100.0
    )
    assert pd.position_sec() == 1.0  # 3 frames / 3 Hz
    pd2 = PlaybackData()
    assert pd2.position_sec() == 0.0


def test_volume_db():
    p = Player(lambda _: None)
    p.set_volume_db(-6.0)
    assert abs(p.playback.volume - 10 ** (-6 / 20)) < 1e-6


def test_seek_after_end_no_spurious_end_event():
    """Seeking right after a track ends must not emit a spurious 'ended'
    state, and the NEXT genuine end must still emit (review finding: the
    callback-owned reached_end flag cleared too late)."""
    import time

    events = []
    sr = 100000
    samples = np.zeros(sr // 100, np.float32)  # 10 ms
    p = Player(_tracks({0: (samples, 1, sr, 0.01)}), emit=events.append)
    p.max_sec = 0.01
    p.set_track(0, 0.0)
    p.resume()
    deadline = time.monotonic() + 2.0
    while time.monotonic() < deadline:
        p.tick()
        if not p.playback.is_playing:
            break
        time.sleep(0.02)
    assert not p.playback.is_playing
    # first genuine end emitted
    n_events_at_end = len(events)
    # seek back: reached_end cleared synchronously, so ticks in the
    # pre-next-fill window must not emit an end event
    p.seek(0.0)
    baseline = len(events)  # seek itself emits one state
    p.tick()
    p.tick()
    ended_like = [e for e in events[baseline:] if not e["isPlaying"]]
    # ticks after a paused seek emit nothing (engine path emits only on
    # error change or end)
    assert len(events) == baseline, events[baseline:]
    # play to the end again: the genuine end must emit
    p.resume()
    deadline = time.monotonic() + 2.0
    while time.monotonic() < deadline:
        p.tick()
        if not p.playback.is_playing:
            break
        time.sleep(0.02)
    assert not p.playback.is_playing
    assert len(events) > baseline  # resume + the second genuine end


def test_seek_without_track_emits_state():
    events = []
    p = Player(_tracks({}), emit=events.append)
    p.seek(5.0)
    assert events and events[-1]["positionSec"] == 0.0


def test_wallclock_fallback_when_stream_unbuildable():
    """Engine present but its stream cannot be built (device lost): the
    wall clock must keep position advancing and end the track (review
    finding: position froze with isPlaying stuck true)."""
    import time

    from thesia_tpu.player.stream import OutputDevice

    class DeadDevice(OutputDevice):
        name = "dead"

        def supported_configs(self):
            return []

        def default_config(self):
            raise RuntimeError("no device")

        def is_alive(self):
            return False

        def open_stream(self, config, callback):
            raise RuntimeError("no device")

    sr = 1000
    p = Player(_tracks({0: (np.zeros(sr // 10, np.float32), 1, sr, 0.1)}))
    assert p.output_engine is not None
    p.output_engine.set_device(DeadDevice())
    assert not p.output_engine.is_active()
    p.max_sec = 0.1
    p.set_track(0, 0.0)
    p.resume()
    deadline = time.monotonic() + 3.0
    while time.monotonic() < deadline:
        p.tick()
        if not p.playback.is_playing:
            break
        time.sleep(0.02)
    assert not p.playback.is_playing  # 0.1 s track ended by wall clock
    assert abs(p.playback.position_sec() - 0.1) < 1e-6
