"""Concurrent service fuzz: several async clients hammer the HTTP command
surface simultaneously (reads under the shared lock racing writes through
the worker, tiles racing settings churn, player commands racing both).
Invariant: the server NEVER returns 500 and settles consistent."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from thesia_tpu.engine.service import EngineService
from thesia_tpu.engine.session import EngineSession
from thesia_tpu.io.wav import encode_wav_f32
from thesia_tpu.render import default_colormap_rgba8


def test_concurrent_clients_never_500(tmp_path, samples_dir):
    if not (samples_dir / "sample_16k.wav").exists():
        pytest.skip("sample corpus incomplete")
    asyncio.run(_fuzz(tmp_path, samples_dir))


def test_concurrent_clients_never_500_deferred(tmp_path, samples_dir, monkeypatch):
    """Same 6-client race with the PRODUCTION deferred-settings default:
    knob turns return at dispatch and supersede each other while tiles,
    metadata, dynamics and player commands race — still zero 500s, and
    after settling every track serves consistently under the last-applied
    setting."""
    if not (samples_dir / "sample_16k.wav").exists():
        pytest.skip("sample corpus incomplete")
    monkeypatch.setenv("THESIA_DEFER_SETTINGS", "1")
    asyncio.run(_fuzz(tmp_path, samples_dir, deferred=True))


async def _fuzz(tmp_path, samples_dir, deferred=False):
    rng = np.random.default_rng(99)
    paths = [str(samples_dir / "sample_16k.wav")]
    for i, (sr, c) in enumerate([(8000, 2), (22050, 1)]):
        w = (0.4 * rng.uniform(-1, 1, (c, sr))).astype(np.float32)
        p = tmp_path / f"c{i}.wav"
        p.write_bytes(encode_wav_f32(w, sr))
        paths.append(str(p))

    service = EngineService(EngineSession(settings_dir=tmp_path / "cfg"))
    server = TestServer(service.make_app())
    client = TestClient(server)
    await client.start_server()
    bad: list = []
    try:
        cm = default_colormap_rgba8().reshape(-1).tolist()
        r = await client.post("/api/init", json={"colormapRgba": cm})
        assert r.status == 200
        r = await client.post("/api/add_tracks", json={"trackIds": [0, 1, 2], "paths": paths})
        assert r.status == 200
        await client.post("/api/apply_track_list_changes", json={})

        async def worker(seed):
            wrng = np.random.default_rng(seed)
            for _ in range(40):
                op = wrng.integers(0, 12)
                if op == 8:
                    # remote-audio churn: concurrent attaches (latest wins),
                    # pulls racing detaches (must 400, never 500), seeks
                    # racing pulls (cursor-version bumps mid-stream)
                    r = await client.post("/player/attach_pcm", json={
                        "sampleRate": int(wrng.choice([44100, 48000])),
                        "channels": 2})
                    if r.status >= 500:
                        bad.append(("attach_pcm", None, r.status, await r.text()))
                    await asyncio.sleep(0)
                    continue
                if op == 9:
                    r = await client.post("/player/pcm", json={
                        "frames": int(wrng.choice([512, 4096]))})
                    if r.status >= 500:
                        bad.append(("pcm", None, r.status, await r.text()))
                    await asyncio.sleep(0)
                    continue
                if op == 10:
                    r = await client.post("/player/detach_pcm", json={})
                    if r.status >= 500:
                        bad.append(("detach_pcm", None, r.status, await r.text()))
                    await asyncio.sleep(0)
                    continue
                if op == 11:
                    name, body = (
                        ("resume_player", {}) if wrng.random() < 0.4
                        else ("pause_player", {}) if wrng.random() < 0.5
                        else ("seek_player", {"sec": float(wrng.uniform(0, 2))})
                    )
                    r = await client.post(f"/api/{name}", json=body)
                    if r.status >= 500:
                        bad.append((name, body, r.status, await r.text()))
                    await asyncio.sleep(0)
                    continue
                if op == 0:
                    name, body = "set_spec_setting", {"specSetting": {
                        "winMillisec": float(wrng.choice([20.0, 40.0])),
                        "tOverlap": int(wrng.choice([2, 4])),
                        "fOverlap": 1, "freqScale": str(wrng.choice(["Mel", "Linear"]))}}
                elif op == 1:
                    name, body = "set_dB_range", {"dBRange": float(wrng.choice([80.0, 100.0]))}
                elif op == 2:
                    name, body = "get_spectrogram_tile", {
                        "idChStr": f"{int(wrng.integers(0, 4))}_{int(wrng.integers(0, 2))}",
                        "levelX": int(wrng.integers(0, 4)), "levelY": 0,
                        "tileX": int(wrng.integers(0, 4)), "tileY": 0}
                elif op == 3:
                    name, body = "get_waveform_tile", {
                        "idChStr": f"{int(wrng.integers(0, 3))}_0",
                        "level": int(wrng.integers(0, 10)),
                        "tileIndex": int(wrng.integers(0, 4))}
                elif op == 4:
                    name, body = "get_audio_render_metadata", {"idChStr": f"{int(wrng.integers(0, 4))}_0"}
                elif op == 5:
                    name, body = "set_common_normalize", {"target": {"type": "LUFS", "target": -20.0}} \
                        if wrng.random() < 0.5 else ("set_common_normalize", {"target": {"type": "Off"}})
                    if isinstance(name, tuple):
                        name, body = name
                elif op == 6:
                    name, body = "set_track_player", {"trackId": int(wrng.integers(0, 3)), "sec": float(wrng.uniform(0, 2))}
                else:
                    name, body = "get_max_dB", {}
                r = await client.post(f"/api/{name}", json=body)
                if r.status >= 500:
                    bad.append((name, body, r.status, await r.text()))
                await asyncio.sleep(0)

        await asyncio.gather(*[worker(1000 + i) for i in range(6)])
        assert not bad, bad[:3]
        # settle: every track still serves consistently
        if deferred:
            assert service.session.settings_settled(timeout=120)
            # the engine's applied setting equals the reported target
            # (latest-wins across the racing knob turns)
            assert (
                service.session.tm.setting.to_json()
                == service.session.get_spec_setting()
            )
        service.session.tm.images.drain(timeout=60)
        for tid in (0, 1, 2):
            r = await client.post("/api/get_audio_render_metadata", json={"idChStr": f"{tid}_0"})
            assert r.status == 200
            md = (await r.json())["result"]
            assert md["spectrogramWidth"] > 0 and md["isComputing"] is False
            r = await client.post("/api/get_spectrogram_tile", json={
                "idChStr": f"{tid}_0", "levelX": 0, "levelY": 0, "tileX": 0, "tileY": 0})
            assert r.status == 200 and len(await r.read()) >= 40
    finally:
        await client.close()
