"""Remote (browser) audio: the player's deployable last hop.

The reference's player delivers sound through an in-process cpal output
callback on the user's machine (reference: src-tauri/src/player/stream.rs:501-639
mix->volume->clamp fill; :110 cursor-version resampler resets; :335-499
resampled path).  In the service deployment the user's machine is a browser,
so the viewer attaches its AudioContext as the output device
(/player/attach_pcm) and pulls the PCM chunks it schedules (/player/pcm).
Every pull runs the exact same PlaybackStreamSource.fill a hardware stream
would — these tests pin that byte-for-byte, plus the attach/detach/staleness
lifecycle and the wire format.
"""

import struct
import time

import numpy as np
import pytest

from thesia_tpu.player.mixing import render_block
from thesia_tpu.player.player import (
    MAX_PULL_FRAMES,
    REMOTE_STALE_SEC,
    Player,
    encode_pcm_chunk,
)
from thesia_tpu.player.stream import RemoteOutputDevice, RemoteStreamHandle


def _tracks(store):
    return lambda tid: store.get(tid)


def _decode(chunk: bytes) -> dict:
    n, ch, sr, flags, pos, ver, _pad = struct.unpack_from("<IIIIdII", chunk, 0)
    data = np.frombuffer(chunk, np.float32, offset=32).reshape(n, ch)
    return {
        "n": n, "ch": ch, "sr": sr,
        "playing": bool(flags & 1), "ended": bool(flags & 2),
        "pos": pos, "ver": ver, "data": data,
    }


def _player_with_remote(store, remote_sr=48000, channels=2):
    p = Player(_tracks(store))
    cfg = p.attach_remote_audio(remote_sr, channels)
    assert cfg["sampleFormat"] == "f32"
    return p, cfg


def test_wire_format_golden():
    data = np.array([[0.5, -0.5], [1.0, -1.0]], np.float32)
    chunk = encode_pcm_chunk(data, 48000, 1.25, 7, True, False)
    assert len(chunk) == 32 + 2 * 2 * 4
    d = _decode(chunk)
    assert (d["n"], d["ch"], d["sr"]) == (2, 2, 48000)
    assert d["playing"] and not d["ended"]
    assert d["pos"] == 1.25 and d["ver"] == 7
    np.testing.assert_array_equal(d["data"], data)


def test_pull_equals_engine_fill_byte_for_byte():
    """The chunk a browser schedules must be the exact mix->volume->clamp
    output of the engine's device-callback path (stream.rs:501-639)."""
    sr = 48000
    rng = np.random.default_rng(1)
    samples = rng.uniform(-1.2, 1.2, 2 * sr).astype(np.float32)  # mono, 2 s, clips
    store = {0: (samples, 1, sr, 2.0)}
    p, cfg = _player_with_remote(store)
    assert cfg["sampleRate"] == sr and cfg["channels"] == 2
    p.max_sec = 2.0
    p.set_volume_db(-6.0)
    p.set_track(0, 0.25)
    p.resume()

    start_frame = int(0.25 * sr)
    vol = p.playback.volume
    d1 = _decode(p.pull_pcm(480))
    d2 = _decode(p.pull_pcm(480))
    # independent expected values straight from the track samples
    exp1 = render_block(samples, 1, start_frame, 480, 2, vol)
    exp2 = render_block(samples, 1, start_frame + 480, 480, 2, vol)
    assert d1["data"].tobytes() == exp1.tobytes()
    assert d2["data"].tobytes() == exp2.tobytes()
    # position advanced by exactly the pulled frames (client-paced)
    assert d2["pos"] == pytest.approx((start_frame + 2 * 480) / sr)
    assert d1["playing"] and not d1["ended"]


def test_pull_resampled_track():
    """Track sr != AudioContext sr engages the StreamResampler; the display
    position advances at the exact rate ratio (stream.rs:335-499)."""
    sr_in, sr_out = 8000, 48000
    t = np.arange(sr_in, dtype=np.float64) / sr_in
    samples = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    store = {0: (samples, 1, sr_in, 1.0)}
    p, cfg = _player_with_remote(store, remote_sr=sr_out)
    assert cfg["sampleRate"] == sr_out
    p.max_sec = 1.0
    p.set_track(0, 0.0)
    p.resume()

    n = 4800
    d = _decode(p.pull_pcm(n))
    assert d["sr"] == sr_out and d["ch"] == 2
    assert d["pos"] == pytest.approx(n * sr_in / sr_out / sr_in)  # = n/sr_out sec
    # audible, clamped, stereo-duplicated output (mono -> both channels)
    body = d["data"][1024:]  # skip the sinc filter's group-delay zeros
    assert np.max(np.abs(body)) > 0.2
    np.testing.assert_array_equal(body[:, 0], body[:, 1])
    assert np.max(np.abs(d["data"])) <= 1.0


def test_seek_bumps_cursor_version_in_chunks():
    sr = 48000
    samples = np.linspace(-0.5, 0.5, 2 * sr, dtype=np.float32)
    store = {0: (samples, 1, sr, 2.0)}
    p, _ = _player_with_remote(store)
    p.max_sec = 2.0
    p.set_track(0, 0.0)
    p.resume()
    v0 = _decode(p.pull_pcm(480))["ver"]
    p.seek(1.0)
    d = _decode(p.pull_pcm(480))
    assert d["ver"] == v0 + 1
    # the post-seek chunk starts at the seek target, not the old cursor
    exp = render_block(samples, 1, sr, 480, 2, p.playback.volume)
    assert d["data"].tobytes() == exp.tobytes()


def test_paused_pull_is_silent_and_position_frozen():
    sr = 48000
    samples = np.ones(sr, np.float32) * 0.5
    store = {0: (samples, 1, sr, 1.0)}
    p, _ = _player_with_remote(store)
    p.max_sec = 1.0
    p.set_track(0, 0.5)
    d = _decode(p.pull_pcm(480))  # never resumed
    assert not d["playing"]
    assert d["pos"] == pytest.approx(0.5)
    assert not d["data"].any()
    assert p.playback.position_sec() == pytest.approx(0.5)


def test_pull_drains_to_end_and_flags_ended():
    sr = 48000
    samples = np.ones(480, np.float32) * 0.25  # 10 ms mono
    store = {0: (samples, 1, sr, 0.01)}
    p, _ = _player_with_remote(store)
    p.max_sec = 0.01
    p.set_track(0, 0.0)
    p.resume()
    d = _decode(p.pull_pcm(480))
    assert d["ended"] and not d["playing"]
    assert d["pos"] == pytest.approx(0.01)
    assert not p.playback.is_playing


def test_detach_and_bounds():
    sr = 48000
    store = {0: (np.zeros(sr, np.float32), 1, sr, 1.0)}
    p, _ = _player_with_remote(store)
    p.set_track(0, 0.0)
    with pytest.raises(ValueError):
        p.pull_pcm(0)
    with pytest.raises(ValueError):
        p.pull_pcm(MAX_PULL_FRAMES + 1)
    p.detach_remote_audio()
    assert not p.remote_attached()
    with pytest.raises(ValueError):
        p.pull_pcm(480)
    # idempotent detach; local output path restored
    p.detach_remote_audio()
    assert p.output_engine is not None and p.output_engine.is_active()


def test_remote_attach_validates_params():
    p = Player(_tracks({}))
    with pytest.raises(ValueError):
        p.attach_remote_audio(1000, 2)  # below any real context rate
    with pytest.raises(ValueError):
        p.attach_remote_audio(48000, 7)


def test_stale_remote_client_falls_back_to_local_output():
    """A playing client that stops pulling (tab closed) must not freeze the
    position forever: tick() detaches and the local device path resumes
    ownership, like the reference's always-on stream."""
    sr = 48000
    store = {0: (np.zeros(2 * sr, np.float32), 1, sr, 2.0)}
    p, _ = _player_with_remote(store)
    p.max_sec = 2.0
    p.set_track(0, 0.0)
    p.resume()
    p.pull_pcm(480)
    handle = p.output_engine.handle
    assert isinstance(handle, RemoteStreamHandle)
    p.tick()
    assert p.remote_attached()  # fresh pulls: stays attached
    handle.last_pull_monotonic -= REMOTE_STALE_SEC + 1.0
    p.tick()
    assert not p.remote_attached()
    # while PAUSED a silent client is normal — no staleness detach
    p2, _ = _player_with_remote(store)
    p2.max_sec = 2.0
    p2.set_track(0, 0.0)
    h2 = p2.output_engine.handle
    h2.last_pull_monotonic -= REMOTE_STALE_SEC + 1.0
    p2.tick()
    assert p2.remote_attached()


def test_latest_attach_wins():
    """Single listener semantics: a re-attach (page reload) replaces the
    stream; the config reflects the newest context."""
    sr = 48000
    store = {0: (np.zeros(sr, np.float32), 1, sr, 1.0)}
    p, _ = _player_with_remote(store, remote_sr=48000)
    cfg2 = p.attach_remote_audio(44100, 2)
    assert cfg2["sampleRate"] == 44100
    assert p.output_engine.config.sample_rate == 44100


def test_remote_device_config_selection():
    dev = RemoteOutputDevice(44100, 2)
    from thesia_tpu.player.stream import select_output_config

    # any requested track rate clamps to the context's fixed rate
    for req in (0, 8000, 44100, 192000):
        cfg = select_output_config(dev, req)
        assert cfg.sample_rate == 44100 and cfg.sample_format == "f32"


def test_service_pcm_endpoints(tmp_path, samples_dir):
    import asyncio

    asyncio.run(_service_pcm(tmp_path, samples_dir))


async def _service_pcm(tmp_path, samples_dir):
    from aiohttp.test_utils import TestClient, TestServer

    from thesia_tpu.engine.service import EngineService
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.render import default_colormap_rgba8

    service = EngineService(EngineSession(settings_dir=tmp_path))
    server = TestServer(service.make_app())
    client = TestClient(server)
    await client.start_server()
    try:
        r = await client.post(
            "/api/init",
            json={"colormapRgba": default_colormap_rgba8().reshape(-1).tolist()},
        )
        assert r.status == 200
        r = await client.post(
            "/api/add_tracks",
            json={"trackIds": [0], "paths": [str(samples_dir / "sample_44k1.wav")]},
        )
        assert r.status == 200
        await client.post("/api/apply_track_list_changes", json={})

        # pull before attach: clean 400
        r = await client.post("/player/pcm", json={"frames": 480})
        assert r.status == 400

        r = await client.post(
            "/player/attach_pcm", json={"sampleRate": 44100, "channels": 2}
        )
        assert r.status == 200
        cfg = (await r.json())["result"]
        assert cfg["sampleRate"] == 44100 and cfg["channels"] == 2

        await client.post("/api/set_track_player", json={"trackId": 0, "sec": 0.0})
        await client.post("/api/resume_player", json={})
        r = await client.post("/player/pcm", json={"frames": 480})
        assert r.status == 200
        d = _decode(await r.read())
        assert d["n"] == 480 and d["ch"] == 2 and d["playing"]
        assert d["data"].any()

        # invalid frames: clean 400s
        for bad in (0, -3, MAX_PULL_FRAMES + 1, "x"):
            r = await client.post("/player/pcm", json={"frames": bad})
            assert r.status == 400, bad

        r = await client.post("/player/detach_pcm", json={})
        assert r.status == 200
        r = await client.post("/player/pcm", json={"frames": 480})
        assert r.status == 400
    finally:
        await client.close()

def test_detach_in_off_mode_restores_off():
    """output='off' deployments must stay off after a browser client leaves:
    detach tears the on-demand engine down instead of installing a local
    output stream the operator never asked for (review finding)."""
    sr = 48000
    store = {0: (np.zeros(sr, np.float32), 1, sr, 1.0)}
    p = Player(_tracks(store), output="off")
    assert p.output_engine is None
    p.attach_remote_audio(sr, 2)
    assert p.remote_attached()
    p.detach_remote_audio()
    assert p.output_engine is None  # wall-clock sink only, as configured
    assert not p.remote_attached()
    # the wall-clock position path still works after the teardown
    p.max_sec = 1.0
    p.set_track(0, 0.0)
    p.resume()
    time.sleep(0.03)
    p.tick()
    assert p.playback.position_sec() > 0.0


def test_stale_fallback_in_off_mode_restores_off():
    sr = 48000
    store = {0: (np.zeros(2 * sr, np.float32), 1, sr, 2.0)}
    p = Player(_tracks(store), output="off")
    p.attach_remote_audio(sr, 2)
    p.max_sec = 2.0
    p.set_track(0, 0.0)
    p.resume()
    p.pull_pcm(480)
    handle = p.output_engine.handle
    handle.last_pull_monotonic -= REMOTE_STALE_SEC + 1.0
    anchor_before = p._anchor
    p.tick()
    assert p.output_engine is None  # no local stream in 'off' mode
    assert p._anchor >= anchor_before  # wall-clock re-anchored (no jump)
    # a second attach works again from scratch
    cfg = p.attach_remote_audio(sr, 2)
    assert cfg["sampleRate"] == sr and p.remote_attached()


def test_closed_remote_handle_pull_raises():
    """A detach racing an in-flight client pull loop: once the handle is
    closed its pulls must raise instead of silently double-advancing the
    position alongside the new device's callback (review finding)."""
    sr = 48000
    store = {0: (np.zeros(sr, np.float32), 1, sr, 1.0)}
    p, _ = _player_with_remote(store)
    p.set_track(0, 0.0)
    handle = p.output_engine.handle
    assert isinstance(handle, RemoteStreamHandle)
    assert handle.config.sample_rate == sr  # header rate comes from here
    p.detach_remote_audio()  # rebuild closes the remote handle
    with pytest.raises(ValueError):
        handle.pull(480)


def test_failed_attach_rolls_back_off_mode():
    p = Player(_tracks({}), output="off")
    with pytest.raises(ValueError):
        p.attach_remote_audio(1000, 2)  # below any real context rate
    assert p.output_engine is None  # still 'off', no half-built engine


def test_threaded_pull_vs_detach_attach_churn():
    """Hammer pull_pcm from two threads while a third churns
    attach/detach/seek: every pull either returns a well-formed chunk or
    raises ValueError (detached) — never a wrong-rate header, never a
    crash, and the position only moves forward between seeks."""
    import threading

    sr = 48000
    store = {0: (np.zeros(30 * sr, np.float32), 1, sr, 30.0)}
    p, _ = _player_with_remote(store)
    p.max_sec = 30.0
    p.set_track(0, 0.0)
    p.resume()
    stop = threading.Event()
    failures: list = []

    def puller():
        while not stop.is_set():
            try:
                d = _decode(p.pull_pcm(512))
            except ValueError:
                continue  # detached mid-pull: the documented outcome
            except Exception as e:  # noqa: BLE001
                failures.append(f"pull: {type(e).__name__}: {e}")
                return
            if d["sr"] not in (44100, 48000) or d["ch"] != 2 or d["n"] != 512:
                failures.append(f"malformed chunk: {d['sr']} {d['ch']} {d['n']}")
                return

    def churner():
        rng = np.random.default_rng(5)
        while not stop.is_set():
            try:
                r = rng.random()
                if r < 0.4:
                    p.attach_remote_audio(int(rng.choice([44100, 48000])), 2)
                elif r < 0.7:
                    p.detach_remote_audio()
                else:
                    p.seek(float(rng.uniform(0, 20)))
            except ValueError:
                pass  # attach during teardown etc.
            except Exception as e:  # noqa: BLE001
                failures.append(f"churn: {type(e).__name__}: {e}")
                return

    threads = [threading.Thread(target=puller) for _ in range(2)]
    threads.append(threading.Thread(target=churner))
    for t in threads:
        t.start()
    time.sleep(2.0)
    stop.set()
    for t in threads:
        t.join(timeout=10)
        assert not t.is_alive(), "worker wedged"
    assert not failures, failures[:3]
