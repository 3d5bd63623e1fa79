"""Decode tests against the bundled reference samples corpus."""

import numpy as np
import pytest

from thesia_tpu.io.decode import DecodeError, open_audio_file
from thesia_tpu.io.wav import decode_wav, encode_wav_f32, encode_wav_s16


@pytest.mark.parametrize(
    "name,sr,codec",
    [
        ("sample_8k.wav", 8000, "wav - pcm_s16le"),
        ("sample_16k.wav", 16000, "wav - pcm_s16le"),
        ("sample_22k05.wav", 22050, "wav - pcm_s16le"),
        ("sample_24k.wav", 24000, "wav - pcm_s16le"),
        ("sample_44k1.wav", 44100, "wav - pcm_s16le"),
        ("sample_24k_s24.wav", 24000, "wav - pcm_s24le"),
    ],
)
def test_open_wav_samples(samples_dir, name, sr, codec):
    path = samples_dir / name
    if not path.exists():
        pytest.skip(f"{name} missing from corpus snapshot")
    wavs, info = open_audio_file(path)
    assert info.sr == sr
    assert info.name == codec
    assert wavs.ndim == 2 and wavs.shape[0] >= 1 and wavs.shape[1] > 1000
    assert np.abs(wavs).max() <= 1.0 + 1e-6


def test_s16_quantization_convention(samples_dir):
    # symphonia convention: s16 value v -> v / 32768 (reference golden uses
    # -3.0517578e-5 = -1/32768, audio.rs:488-505)
    path = samples_dir / "sample_16k.wav"
    if not path.exists():
        pytest.skip("missing")
    wavs, _ = open_audio_file(path)
    nonzero = wavs[0][wavs[0] != 0]
    # every sample must be an exact multiple of 1/32768
    assert np.all(np.abs(nonzero * 32768 - np.round(nonzero * 32768)) < 1e-4)


def test_tone_sample(samples_dir):
    path = samples_dir / "1kHz_1sec_sr24kHz.wav"
    if not path.exists():
        pytest.skip("missing")
    wavs, info = open_audio_file(path)
    assert info.sr == 24000
    # dominant frequency must be 1 kHz
    spec = np.abs(np.fft.rfft(wavs[0][:8192] * np.hanning(8192)))
    peak_hz = np.argmax(spec) * 24000 / 8192
    assert abs(peak_hz - 1000) < 30


def test_invalid_audio_raises(samples_dir):
    with pytest.raises(DecodeError):
        open_audio_file(samples_dir / "invalid_audio.wav")


def test_silence(samples_dir):
    path = samples_dir / "silence.wav"
    if not path.exists():
        pytest.skip("missing")
    wavs, _ = open_audio_file(path)
    assert np.abs(wavs).max() == 0.0


def test_wav_roundtrip_f32_s16():
    rng = np.random.default_rng(0)
    wavs = (rng.uniform(-1, 1, (2, 1000)) * 0.5).astype(np.float32)
    out, sr, codec = decode_wav(encode_wav_f32(wavs, 44100))
    assert sr == 44100 and codec == "pcm_f32le"
    np.testing.assert_array_equal(out, wavs)

    out16, sr16, codec16 = decode_wav(encode_wav_s16(wavs, 8000))
    assert sr16 == 8000 and codec16 == "pcm_s16le"
    np.testing.assert_allclose(out16, wavs, atol=1 / 32768)


def test_compressed_codecs_via_ffmpeg(samples_dir):
    from thesia_tpu.native import ffmpeg

    if not ffmpeg.available():
        pytest.skip("ffmpeg libraries unavailable")
    cases = [
        ("sample_44k1.mp3", "mp3"),
        ("sample_44k1-aac.m4a", "isomp4 - aac"),
        ("sample_44k1-alac.m4a", "isomp4 - alac"),
    ]
    for fname, expected_name in cases:
        path = samples_dir / fname
        if not path.exists():
            continue
        wavs, info = open_audio_file(path)
        assert info.name == expected_name
        assert info.sr == 44100
        assert wavs.shape[1] > 1_000_000


def test_alac_lossless_vs_wav(samples_dir):
    from thesia_tpu.native import ffmpeg

    if not ffmpeg.available():
        pytest.skip("ffmpeg libraries unavailable")
    alac = samples_dir / "sample_44k1-alac.m4a"
    wav = samples_dir / "sample_44k1.wav"
    if not (alac.exists() and wav.exists()):
        pytest.skip("corpus incomplete")
    aw, _ = open_audio_file(alac)
    ww, _ = open_audio_file(wav)
    n = min(aw.shape[1], ww.shape[1])
    np.testing.assert_array_equal(aw[:, :n], ww[:, :n])


def test_truncated_compressed_file_decodes_partially(samples_dir, tmp_path):
    """Per-packet error tolerance: a truncated mp3 yields the decodable
    prefix instead of failing (reference: core/audio.rs:326-424 packet-skip
    loop; hard error only when nothing decodable)."""
    src = samples_dir / "sample_44k1.mp3"
    if not src.exists():
        pytest.skip("corpus incomplete")
    from thesia_tpu.io.decode import DecodeError, open_audio_file

    data = src.read_bytes()
    trunc = tmp_path / "trunc.mp3"
    trunc.write_bytes(data[: len(data) // 3])
    wavs, info = open_audio_file(trunc)
    assert wavs.shape[0] >= 1 and wavs.shape[1] > 10000
    assert info.sr == 44100

    garbage = tmp_path / "garbage.wav"
    garbage.write_bytes(b"RIFF" + b"\x00" * 100)
    with pytest.raises(DecodeError):
        open_audio_file(garbage)
