"""X mip chain semantics + mip-served tile consistency.

reference LOD model: src-tauri/src/core/render_tiles.rs:281-393 (per-request
full-res Lanczos3 crop-resize); the rebuild's chain is the precomputed
variant of the same 2^level halving pyramid.
"""

import numpy as np

from thesia_tpu.render.mips import SpecImage, build_mip_chain, halve_x_u16
from thesia_tpu.render.tiles import (
    SPECTROGRAM_TILE_GUTTER,
    SPECTROGRAM_TILE_SIZE,
    decode_spectrogram_tile,
    encode_spectrogram_tile,
)


def test_halve_x_round_half_up_and_odd_tail():
    img = np.array([[0, 1, 2, 3, 65535]], np.uint16)
    out = halve_x_u16(img)
    # (0+1+1)>>1 = 1, (2+3+1)>>1 = 3, trailing odd column copied
    assert out.tolist() == [[1, 3, 65535]]


def test_chain_widths_match_encoder_lod_widths():
    """ceil-halving == ceil(W / 2^k): chain entry k IS the encoder's LOD k."""
    w = 5000
    img = np.random.default_rng(0).integers(0, 65536, (4, w), dtype=np.uint16)
    chain = build_mip_chain(img, min_width=16)
    for k, entry in enumerate(chain, start=1):
        assert entry.shape == (4, -(-w // (1 << k)))


def test_spec_image_mips_lazy_and_budgeted():
    img = SpecImage(np.zeros((2, 4096), np.uint16))
    assert img.mip_bytes() == 0  # nothing built yet
    src, m = img.mip_for_level(3)
    assert m >= 1 and img.mip_bytes() > 0
    assert src.shape[1] == -(-4096 // (1 << m))


def test_mip_identity_tile_is_pure_crop():
    """A tile at levelX == chain depth must be the exact mip crop (the
    Lanczos3 kernel at scale 1 / integral offsets is the identity)."""
    rng = np.random.default_rng(7)
    h, w = 64, 3000
    img = SpecImage(rng.integers(0, 65536, (h, w), dtype=np.uint16))
    colors = np.stack(
        [np.arange(256), np.zeros(256), np.zeros(256), np.full(256, 255)], axis=1
    ).astype(np.uint8)
    lx = 1
    chain = build_mip_chain(np.asarray(img), min_width=1024)
    mip1 = chain[0]
    data = encode_spectrogram_tile(img, colors, 9, lx, 0, 0, 0)
    d = decode_spectrogram_tile(data)
    assert d["originX"] == 0 and d["originY"] == 0
    crop = mip1[: d["height"], : d["width"]]
    idx = (crop.astype(np.int64) * 255 + 32767) // 65535
    expect = colors[idx][::-1]
    np.testing.assert_array_equal(d["rgba"], expect)


def test_mip_tile_matches_direct_resize_shape_and_coverage():
    """Coarse tiles from the chain keep the exact header geometry of the
    direct path and stay numerically close to full-res Lanczos3."""
    h, w = 128, 40000
    # smooth 2-D field: box-halving vs direct Lanczos3 agree closely on
    # band-limited content (spectrogram images are in this class)
    x = np.linspace(0, 40, w)
    y = np.linspace(0, 6, h)
    field = 0.5 + 0.25 * np.sin(x)[None, :] * np.cos(y)[:, None] + 0.2 * np.sin(0.3 * x)[None, :]
    base = np.clip(field * 65535, 0, 65535).astype(np.uint16)
    img = SpecImage(base)
    colors = np.stack(
        [np.arange(256), np.arange(256), np.arange(256), np.full(256, 255)], axis=1
    ).astype(np.uint8)
    for lx, ly in [(4, 0), (4, 1), (6, 0)]:
        with_mips = decode_spectrogram_tile(
            encode_spectrogram_tile(img, colors, 1, lx, ly, 0, 0)
        )
        direct = decode_spectrogram_tile(
            encode_spectrogram_tile(base, colors, 1, lx, ly, 0, 0)
        )
        assert with_mips["width"] == direct["width"]
        assert with_mips["height"] == direct["height"]
        assert (with_mips["originX"], with_mips["originY"]) == (
            direct["originX"],
            direct["originY"],
        )
        diff = np.abs(
            with_mips["rgba"][..., 0].astype(int) - direct["rgba"][..., 0].astype(int)
        )
        assert np.mean(diff) < 2.0 and np.percentile(diff, 99) <= 6


def test_mip_deeper_than_chain_resizes_from_last_entry():
    img = SpecImage(np.full((8, 3000), 30000, np.uint16))
    colors = np.array([[0, 0, 0, 255], [255, 255, 255, 255]], np.uint8)
    # chain stops at width <= 1024; levelX=8 (scale 256) resizes from it
    data = encode_spectrogram_tile(img, colors, 1, 8, 0, 0, 0)
    d = decode_spectrogram_tile(data)
    assert d["width"] == -(-3000 // 256) and d["height"] == 8
    # constant image survives any resample path exactly
    assert (d["rgba"][..., 0] == 255).all() or (d["rgba"][..., 0] == 0).all()


def test_manager_images_carry_mips(tmp_path):
    from thesia_tpu.io.wav import encode_wav_f32
    from thesia_tpu.engine.manager import TrackManager
    from thesia_tpu.engine.track import TrackList

    rng = np.random.default_rng(5)
    p = tmp_path / "long.wav"
    p.write_bytes(encode_wav_f32(rng.uniform(-0.5, 0.5, (1, 8000 * 60)).astype(np.float32), 8000))
    tl = TrackList()
    tm = TrackManager()
    ids = tl.add_tracks([0], [str(p)])
    tm.add_tracks(tl, ids)
    tm.apply_track_list_changes(tl)
    img = tm.get_spectrogram((0, 0))
    assert hasattr(img, "mip_for_level")
    src, m = img.mip_for_level(4)
    assert m >= 1
