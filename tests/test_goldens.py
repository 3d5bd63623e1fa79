"""End-to-end regression goldens: decode -> stats -> spec -> u16 img -> tiles.

Any pipeline change that shifts a single tile byte or dB value fails here
(SURVEY §4 "implication for the rebuild" — the image-diff coverage the
reference lacks).  The corpus entry is the deterministic synth48k track
(tests/synth.py), the always-runnable stand-in for the LFS-missing
sample_48k.wav (mono, 2,113,529 samples @48 kHz,
reference: src-tauri/src/core/audio.rs:506).

Regenerate after an INTENTIONAL pipeline change: python -m tests.make_goldens
"""

import hashlib
import json
import pathlib

import numpy as np
import pytest

from tests.synth import SYNTH48K_N, SYNTH48K_SR, synth48k_wavs, synth48k_write

GOLDENS = pathlib.Path(__file__).resolve().parent / "goldens"
SAMPLE_16K = pathlib.Path("/root/reference/samples/sample_16k.wav")


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


@pytest.fixture(scope="module")
def G():
    return json.loads((GOLDENS / "goldens.json").read_text())


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    from thesia_tpu.engine.session import EngineSession
    from thesia_tpu.render import default_colormap_rgba8

    td = tmp_path_factory.mktemp("golden_session")
    wav_path = td / "synth48k.wav"
    synth48k_write(wav_path)
    s = EngineSession(settings_dir=td / "cfg")
    s.init(default_colormap_rgba8())
    assert s.add_tracks([0, 1], [str(wav_path), str(SAMPLE_16K)]) == [0, 1]
    s.apply_track_list_changes()
    return s


def test_synth48k_decode_anchors(G, tmp_path):
    wavs = synth48k_wavs()
    g = G["synth48k"]
    assert wavs.shape == (1, SYNTH48K_N)
    np.testing.assert_array_equal(wavs[0, :16], np.array(g["first_16"], np.float32))
    assert sha(wavs.tobytes()) == g["sha_samples"]
    p = tmp_path / "s.wav"
    synth48k_write(p)
    assert sha(p.read_bytes()) == g["sha_file"]
    # io.wav round trip is exact
    from thesia_tpu.io.wav import decode_wav

    decoded, sr, codec = decode_wav(p.read_bytes())
    assert sr == SYNTH48K_SR and codec == "pcm_s16le"
    np.testing.assert_array_equal(decoded, wavs)


def test_synth48k_stats_anchors(G, session):
    st = session.tracklist[0].original.stats
    g = G["synth48k"]["stats"]
    assert abs(st.global_lufs - g["global_lufs"]) < 1e-9
    assert st.rms_db == pytest.approx(g["rms_db"], abs=1e-6)
    assert st.max_peak == g["max_peak"]
    assert st.max_peak_db == g["max_peak_db"]


def test_synth48k_lufs_cross_validated(G):
    """Three independent implementations agree: scipy.lfilter host path,
    a from-scratch sosfilt-based implementation below, and the device scan
    (dynamics/stats_device.py).  Guards the golden anchor the way the
    reference pins -26.20331705029079 (track.rs:455-458).  The displayed
    golden is ebur128 HISTOGRAM-mode (0.1-LU bins, stats.rs:48 Mode::all());
    the exact-energy gate is cross-validated alongside."""
    from scipy.signal import sosfilt

    from tests.test_dynamics import _hist_gated_reference
    from thesia_tpu.dynamics import stats_device
    from thesia_tpu.dynamics.loudness import integrated_lufs, k_weighting_coeffs

    wavs = synth48k_wavs()
    sr = SYNTH48K_SR
    golden = G["synth48k"]["stats"]["global_lufs"]

    host = integrated_lufs(wavs, sr)  # histogram mode: the displayed value
    assert abs(host - golden) < 1e-9
    host_exact = integrated_lufs(wavs, sr, histogram=False)
    assert abs(host - host_exact) < 0.06  # documented histogram deviation

    # independent: sosfilt cascade + own gating written against BS.1770 text
    b1, a1, b2, a2 = k_weighting_coeffs(sr)
    sos = np.array([np.concatenate([b1, a1]), np.concatenate([b2, a2])])
    y = sosfilt(sos, wavs.astype(np.float64), axis=-1)
    step = (sr + 5) // 10
    blk = 4 * step
    n = y.shape[-1]
    zs = []
    for start in range(0, n - blk + 1, step):
        seg = y[:, start : start + blk]
        zs.append(float((seg * seg).mean(axis=-1).sum()))
    z = np.array(zs)
    lj = -0.691 + 10 * np.log10(np.maximum(z, 1e-300))
    z_abs = z[lj > -70.0]
    rel = -0.691 + 10 * np.log10(z_abs.mean()) - 10.0
    z_rel = z[(lj > -70.0) & (lj > rel)]
    independent_exact = -0.691 + 10 * np.log10(z_rel.mean())
    assert abs(independent_exact - host_exact) < 1e-8
    # independent counts-based libebur128 histogram emulation on the
    # independently-computed blocks reproduces the displayed golden
    assert abs(_hist_gated_reference(z) - golden) < 1e-8

    if stats_device.device_dynamics_ok():
        dev = stats_device.integrated_lufs_device(wavs, sr)
        assert abs(dev - golden) < 1e-8


def test_synth48k_spec_db_anchors(G, session):
    res = session.tm.specs[0]
    db = np.asarray(res.db_padded)[0, : res.n_frames]
    g = G["synth48k"]["spec"]
    assert list(db.shape) == g["shape"]
    assert float(db.min()) == g["min_db"]
    assert float(db.max()) == g["max_db"]
    assert sha(np.ascontiguousarray(db).tobytes()) == g["sha_db"]
    crop = np.load(GOLDENS / "synth48k_db_crop.npy")
    np.testing.assert_array_equal(db[1000:1032], crop)


def test_synth48k_u16_image_anchors(G, session):
    img = session.tm.spec_imgs[(0, 0)]
    g = G["synth48k"]["img"]
    assert list(img.shape) == g["shape"]
    assert sha(np.ascontiguousarray(img).tobytes()) == g["sha"]
    assert [session.tm.min_db, session.tm.max_db] == G["db_range"]


def test_metadata_anchors(G, session):
    session.tm.images.drain()  # goldens pin the settled (isComputing=False) state
    assert session.get_audio_render_metadata("0_0") == G["synth48k"]["metadata"]
    assert session.get_audio_render_metadata("1_0") == G["sample16k_metadata"]


@pytest.mark.parametrize(
    "fname",
    [
        "synth48k_spec_t0.bin",
        "synth48k_spec_t1.bin",
        "synth48k_wave_t0.bin",
        "synth48k_wave_t1.bin",
        "sample16k_spec_t0.bin",
        "sample16k_wave_t0.bin",
    ],
)
def test_tile_bytes_bit_exact(G, session, fname):
    idch = "0_0" if fname.startswith("synth") else "1_0"
    if "_spec_" in fname:
        args = (0, 0, 1, 0) if fname.endswith("t0.bin") else (2, 1, 0, 0)
        if fname.startswith("sample16k"):
            args = (0, 0, 0, 0)
        data = session.get_spectrogram_tile(idch, *args)
    else:
        args = {"synth48k_wave_t0.bin": (0, 3), "synth48k_wave_t1.bin": (11, 0),
                "sample16k_wave_t0.bin": (4, 0)}[fname]
        data = session.get_waveform_tile(idch, *args)
    golden = (GOLDENS / fname).read_bytes()
    assert len(data) == G["tiles"][fname]["len"]
    assert data == golden


def test_native_and_python_tile_encoders_agree(session):
    """The C++ fast path and the numpy fallback produce identical bytes."""
    from thesia_tpu import native
    from thesia_tpu.render import tiles

    if not native.available():
        pytest.skip("native runtime unavailable")
    img = session.tm.spec_imgs[(0, 0)]
    cmap = session.tile_cache.colormap_rgba
    with_native = tiles.encode_spectrogram_tile(img, cmap, 1, 1, 1, 1, 0)
    lib, native._lib = native._lib, None
    tried, native._tried = native._tried, True
    try:
        assert not native.available()
        with_python = tiles.encode_spectrogram_tile(img, cmap, 1, 1, 1, 1, 0)
    finally:
        native._lib, native._tried = lib, tried
    assert with_native == with_python


def test_lanczos3_cross_validated_vs_pillow():
    """Our Lanczos3 fractional-crop resize vs Pillow's independent LANCZOS
    implementation on a known crop (reference uses fast_image_resize,
    render_tiles.rs:354-393; all three implement the same published
    convolution-with-scaled-support algorithm)."""
    from PIL import Image

    from thesia_tpu.render.resize import lanczos3_crop_resize_u16

    rng = np.random.default_rng(5)
    src = (rng.uniform(0, 65535, (200, 300))).astype(np.uint16)
    crop = (10.25, 5.5, 290.75, 195.0)
    dst_w, dst_h = 97, 63
    ours = lanczos3_crop_resize_u16(src, crop, dst_w, dst_h).astype(np.float64)

    im = Image.fromarray(src.astype(np.float32), mode="F")
    theirs = np.asarray(
        im.resize((dst_w, dst_h), resample=Image.LANCZOS, box=crop), np.float64
    )
    # Semantic differences vs PIL, both benign and explainable: PIL rounds
    # its kernel-window bounds ((int)(center±support+0.5)) where
    # fast_image_resize — the semantics we follow — floors/ceils, so a
    # near-zero edge tap is included/excluded for a handful of dst pixels;
    # and PIL stays float end-to-end while we round to u16 between passes.
    # Cross-validation is therefore distribution-level: overwhelming
    # agreement within 1 count.
    diff = np.abs(ours - np.clip(np.floor(theirs + 0.5), 0, 65535))
    assert np.median(diff) <= 1.0
    assert np.percentile(diff, 99) <= 1.0
    assert (diff <= 1.0).mean() > 0.99
    assert diff.mean() < 2.0


def test_settings_change_recompute_anchors(G, session):
    """set_spec_setting -> full recompute: 20ms/Linear metadata + tile bytes
    match the pinned goldens (SURVEY §3.3 recompute-everything path).
    Runs LAST in this module: it mutates the shared session's settings."""
    session.set_spec_setting(
        {"winMillisec": 20, "tOverlap": 4, "fOverlap": 1, "freqScale": "Linear"}
    )
    session.tm.images.drain()
    md = session.get_audio_render_metadata("0_0")
    g = dict(G["synth48k_metadata_20ms_linear"])
    got = dict(md)
    # revisions depend on how many invalidations this process performed
    for k in ("waveformRevision", "spectrogramRevision"):
        g.pop(k), got.pop(k)
    assert got == g
    data = session.get_spectrogram_tile("0_0", 1, 1, 1, 0)
    golden = (GOLDENS / "synth48k_spec_20ms_linear.bin").read_bytes()
    # tile headers carry the revision (first 8 bytes); compare payloads
    assert data[8:] == golden[8:]
    assert len(data) == G["tiles"]["synth48k_spec_20ms_linear.bin"]["len"]
