"""HTTP service tests (aiohttp test client)."""

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from thesia_tpu.engine.service import COMMANDS, EngineService
from thesia_tpu.engine.session import EngineSession
from thesia_tpu.render import decode_waveform_tile, default_colormap_rgba8


def test_command_registry_covers_reference_surface():
    # the reference registers 41 commands (lib.rs:759-816); menu/context-menu
    # commands are desktop-shell-only and are handled by the viewer directly
    assert len(COMMANDS) == 41


def test_service_round_trip(tmp_path, samples_dir):
    import asyncio

    if not (samples_dir / "sample_16k.wav").exists():
        pytest.skip("sample corpus incomplete")
    asyncio.run(_service_round_trip(tmp_path, samples_dir))


async def _service_round_trip(tmp_path, samples_dir):
    service = EngineService(EngineSession(settings_dir=tmp_path))
    server = TestServer(service.make_app())
    client = TestClient(server)
    await client.start_server()
    try:
        r = await client.post(
            "/api/init", json={"colormapRgba": default_colormap_rgba8().reshape(-1).tolist()}
        )
        assert r.status == 200
        init = (await r.json())["result"]
        assert init["constants"]["PLAY_JUMP_SEC"] == 1.0

        r = await client.post(
            "/api/add_tracks",
            json={"trackIds": [0], "paths": [str(samples_dir / "sample_16k.wav")]},
        )
        assert (await r.json())["result"] == [0]

        r = await client.post("/api/apply_track_list_changes", json={})
        assert (await r.json())["result"] == ["0_0"]

        r = await client.post("/api/get_audio_render_metadata", json={"idChStr": "0_0"})
        md = (await r.json())["result"]
        assert md["sampleRate"] == 16000

        r = await client.post(
            "/api/get_waveform_tile", json={"idChStr": "0_0", "level": 2, "tileIndex": 0}
        )
        assert r.status == 200
        assert r.content_type == "application/octet-stream"
        tile = decode_waveform_tile(await r.read())
        assert tile["binCount"] > 0

        r = await client.post(
            "/api/get_spectrogram_tile",
            json={"idChStr": "0_0", "levelX": 0, "levelY": 0, "tileX": 0, "tileY": 0},
        )
        assert r.status == 200
        body = await r.read()
        assert len(body) > 40

        r = await client.post("/api/get_max_dB", json={})
        assert (await r.json())["result"]["type"] in ("Finite", "NegInfinity")

        # unknown command -> 404; missing arg -> 400
        r = await client.post("/api/nope", json={})
        assert r.status == 404
        r = await client.post("/api/get_sample_rate", json={})
        assert r.status == 400
    finally:
        await client.close()
