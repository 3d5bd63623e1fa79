"""Exercise the REAL sounddevice-backed output branch (VERDICT r4 next #6).

This image has no audio hardware or PortAudio, so `player/stream.py`'s
SounddeviceOutputDevice had never executed.  A fake `sounddevice` module
implementing the exact API surface the branch uses (query_devices,
OutputStream(samplerate, channels, blocksize, dtype, callback), start/stop/
close/.active, CallbackAbort) drives it deterministically: the happy fill
path, the status->CallbackAbort error capture, the PortAudio-died
".active == False" surfacing, device loss, and the rebuild poll.

reference behavior: src-tauri/src/player.rs:130-164 (error capture +
rebuild + 500 ms device poll), stream.rs:641-660 (cpal build_output_stream
error callback).
"""

import sys
import threading
import types

import numpy as np
import pytest


class FakeOutputStream:
    """Manual-pump stand-in for sounddevice.OutputStream: the test calls
    pump() instead of PortAudio's realtime thread calling the callback."""

    instances: list = []

    def __init__(self, samplerate, channels, blocksize, dtype, callback):
        assert dtype == "float32"
        self.samplerate = int(samplerate)
        self.channels = int(channels)
        self.blocksize = int(blocksize)
        self.callback = callback
        self.active = False
        self.closed = False
        self.written: list = []
        FakeOutputStream.instances.append(self)

    def start(self):
        self.active = True

    def stop(self):
        self.active = False

    def close(self):
        self.closed = True

    def pump(self, frames=None, status=None):
        """One device callback period.  Mirrors PortAudio semantics: a
        CallbackAbort from the callback kills the stream (active=False)."""
        n = int(frames or self.blocksize)
        outdata = np.zeros((n, self.channels), np.float32)
        try:
            self.callback(outdata, n, None, status)
        except _FAKE_SD.CallbackAbort:
            self.active = False
            return None
        self.written.append(outdata.copy())
        return outdata


def _make_fake_sd(max_channels=2, default_sr=48000):
    sd = types.ModuleType("sounddevice")
    state = {"dead": False}

    def query_devices(device=None, kind=None):
        if state["dead"]:
            raise RuntimeError("PortAudio: no default output device")
        return {
            "max_output_channels": max_channels,
            "default_samplerate": float(default_sr),
        }

    class CallbackAbort(Exception):
        pass

    sd.query_devices = query_devices
    sd.OutputStream = FakeOutputStream
    sd.CallbackAbort = CallbackAbort
    sd._state = state
    return sd


_FAKE_SD = None


@pytest.fixture
def fake_sd(monkeypatch):
    global _FAKE_SD
    FakeOutputStream.instances = []
    _FAKE_SD = _make_fake_sd()
    monkeypatch.setitem(sys.modules, "sounddevice", _FAKE_SD)
    yield _FAKE_SD


def test_try_sounddevice_builds_real_device(fake_sd):
    from thesia_tpu.player import stream as pstream

    dev = pstream._try_sounddevice()
    assert dev is not None and dev.name == "sounddevice"
    cfg = dev.default_config()
    assert cfg.channels == 2 and cfg.sample_rate == 48000
    assert cfg.sample_format == "f32"
    ranges = dev.supported_configs()
    assert ranges and ranges[0].channels == 2
    assert dev.is_alive()
    fake_sd._state["dead"] = True
    assert not dev.is_alive()


def test_sounddevice_stream_plays_engine_fill(fake_sd):
    """The hardware branch's callback writes the exact mix/volume/clamp fill
    into the device buffer (reference stream.rs:501-639)."""
    from thesia_tpu.player.mixing import render_block
    from thesia_tpu.player.player import PlaybackData
    from thesia_tpu.player import stream as pstream

    dev = pstream._try_sounddevice()
    playback = PlaybackData()
    lock = threading.Lock()
    engine = pstream.OutputEngine(playback, lock, device=dev)
    engine.ensure_stream(48000)
    assert engine.error == ""
    sd_stream = FakeOutputStream.instances[-1]
    assert sd_stream.active

    rng = np.random.default_rng(0)
    samples = rng.uniform(-1.0, 1.0, 48000).astype(np.float32)  # 1 s mono
    with lock:
        playback.track_id = 0
        playback.samples = samples
        playback.input_channels = 1
        playback.sample_rate = 48000
        playback.position_frame = 100.0
        playback.volume = 0.5
        playback.is_playing = True

    out = sd_stream.pump(512)
    expected = render_block(samples, 1, 100, 512, 2, 0.5)
    assert out.tobytes() == expected.tobytes()
    assert playback.position_frame == 612.0
    engine.close()
    assert sd_stream.closed


def test_sounddevice_callback_error_captured_and_rebuilt(fake_sd):
    """A PortAudio status flag aborts the callback, the error surfaces via
    the handle, and the 500 ms poll rebuilds the stream (player.rs:130-164)."""
    from thesia_tpu.player.player import PlaybackData
    from thesia_tpu.player import stream as pstream

    engine = pstream.OutputEngine(
        PlaybackData(), threading.Lock(), device=pstream._try_sounddevice()
    )
    engine.ensure_stream(48000)
    first = FakeOutputStream.instances[-1]

    first.pump(512, status="output underflow")  # CallbackAbort path
    assert not first.active
    assert "output underflow" in (engine.handle.error or "")

    engine._last_poll = 0.0  # bypass the 500 ms cadence for the test
    engine.poll()
    # instant successful rebuild clears the error (transient recovery —
    # matches test_output_engine_rebuilds_on_error_and_device_loss)
    assert engine.error == ""
    second = FakeOutputStream.instances[-1]
    assert second is not first and second.active
    assert first.closed  # the dead stream was torn down, not leaked
    engine.close()


def test_sounddevice_silent_stop_surfaces_as_error(fake_sd):
    """PortAudio can kill a stream without a Python exception: .active goes
    False and the handle must still report an error for the rebuild poll."""
    from thesia_tpu.player.player import PlaybackData
    from thesia_tpu.player import stream as pstream

    engine = pstream.OutputEngine(
        PlaybackData(), threading.Lock(), device=pstream._try_sounddevice()
    )
    engine.ensure_stream(44100)
    sd_stream = FakeOutputStream.instances[-1]
    sd_stream.active = False  # abrupt PortAudio death, no callback involved
    assert engine.handle.error == "stream stopped"
    engine._last_poll = 0.0
    engine.poll()
    assert FakeOutputStream.instances[-1] is not sd_stream  # rebuilt
    engine.close()


def test_sounddevice_device_loss_triggers_rebuild_cycle(fake_sd):
    """Unplugging the device (query_devices raising) makes is_alive False;
    the poll rebuilds — and keeps failing cleanly until it returns."""
    from thesia_tpu.player.player import PlaybackData
    from thesia_tpu.player import stream as pstream

    engine = pstream.OutputEngine(
        PlaybackData(), threading.Lock(), device=pstream._try_sounddevice()
    )
    engine.ensure_stream(48000)
    n0 = len(FakeOutputStream.instances)

    fake_sd._state["dead"] = True
    engine._last_poll = 0.0
    engine.poll()  # device dead: rebuild runs, default_config raises -> error
    assert engine.error != "" and engine.handle is None

    fake_sd._state["dead"] = False
    engine._last_poll = 0.0
    engine.poll()  # device back: stream rebuilt clean
    assert engine.error == "" and engine.handle is not None
    assert len(FakeOutputStream.instances) > n0
    engine.close()


def test_default_output_device_prefers_hardware(fake_sd):
    from thesia_tpu.player import stream as pstream

    assert pstream.default_output_device().name == "sounddevice"
    fake_sd._state["dead"] = True
    assert pstream.default_output_device().name == "null"
