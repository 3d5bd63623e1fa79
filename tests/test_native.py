"""Native C++ extension tests: FLAC decode, limiter parity, resize parity."""

import numpy as np
import pytest

from thesia_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="native ext unavailable")


def test_flac_bit_exact_vs_wav(samples_dir):
    flac_path = samples_dir / "sample_44k1.flac"
    wav_path = samples_dir / "sample_44k1.wav"
    if not (flac_path.exists() and wav_path.exists()):
        pytest.skip("corpus incomplete")
    from thesia_tpu.io.decode import open_audio_file

    fw, finfo = open_audio_file(flac_path)
    ww, winfo = open_audio_file(wav_path)
    assert finfo.sr == winfo.sr == 44100
    assert fw.shape == ww.shape
    np.testing.assert_array_equal(fw, ww)


def test_native_limiter_matches_python_streaming():
    from thesia_tpu.dynamics.envelope import BoxStackFilter, PeakHold

    rng = np.random.default_rng(2)
    sr = 2000
    wav = (rng.uniform(-1, 1, 900) * 2.5).astype(np.float32)
    gain = native.limiter_gain_seq(wav[None, :], sr, 1.0, 5.0, 15.0, 40.0)
    # streaming python reference
    attack = round(5.0 * sr / 1000)
    hold = round(20.0 * sr / 1000)
    release = 40.0 * sr / 1000
    ph = PeakHold(sr, 20.0)
    stack = BoxStackFilter(attack, 3)
    stack.reset(1.0)
    y = 1.0
    slew = 1.0 / (release + 1.0)
    eps = np.finfo(np.float64).eps
    out = []
    vs = list(np.abs(wav.astype(np.float64))) + [0.0] * attack
    for v in vs:
        raw = 1.0 / (v + eps) if v > 1.0 else 1.0
        held = -ph.step(-raw)
        y = min(held, y + (held - y) * slew)
        out.append(min(stack.step(y), 1.0))
    exp = np.array(out[attack:])
    np.testing.assert_allclose(gain, exp, rtol=1e-12, atol=1e-12)


def test_native_resize_matches_python():
    from thesia_tpu.render.resize import lanczos3_crop_resize_u16 as py_resize

    rng = np.random.default_rng(3)
    src = rng.integers(0, 65536, (64, 200)).astype(np.uint16)
    crop = (10.25, 3.5, 150.75, 60.0)
    got = native.lanczos3_crop_resize_u16(src, crop, 70, 28)
    exp = py_resize(src, crop, 70, 28)
    # identical algorithm; allow ±1 count for accumulation-order rounding
    assert np.abs(got.astype(int) - exp.astype(int)).max() <= 1
    assert (got == exp).mean() > 0.99


def test_native_waveform_bins():
    wav = (np.arange(64) - 32.0).astype(np.float32)
    out = native.waveform_bin_stats(wav, 0, 64, 64, 1)
    np.testing.assert_allclose(out[0], [-32.0, 31.0, -0.5])


def test_pcm_s32_s24_native_matches_numpy_bitexact():
    """Cross-path byte identity: the native s32 conversion must cast to f32
    BEFORE the divide like the numpy fallback (a correctly-rounded double
    divide differed in the last ulp for >24-significant-bit samples, e.g.
    INT32_MAX -> 0.99999994 vs 1.0; review finding).  s24 negatives cover
    the sign-extension path."""
    if not native.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        np.int32([2147483647, -2147483648, -1, 0, 1, 16777217, -16777217]),
        rng.integers(-2**31, 2**31 - 1, 500, dtype=np.int64).astype(np.int32),
    ])
    payload = vals.astype("<i4").tobytes()
    got = native.pcm_to_f32_planar(payload, 1, "s32")[0]
    exp = np.frombuffer(payload, "<i4").astype(np.float32) / 2147483648.0
    np.testing.assert_array_equal(got, exp)

    from thesia_tpu.io.wav import s24_bytes_to_f32

    s24 = np.concatenate([
        np.int32([0x7FFFFF, -0x800000, -1, 0, 1]),
        rng.integers(-2**23, 2**23 - 1, 500, dtype=np.int64).astype(np.int32),
    ])
    raw = np.zeros((len(s24), 3), np.uint8)
    u = s24.astype(np.int64) & 0xFFFFFF
    raw[:, 0] = u & 0xFF
    raw[:, 1] = (u >> 8) & 0xFF
    raw[:, 2] = (u >> 16) & 0xFF
    payload24 = raw.tobytes()
    got24 = native.pcm_to_f32_planar(payload24, 1, "s24")[0]
    exp24 = s24_bytes_to_f32(np.frombuffer(payload24, np.uint8))
    np.testing.assert_array_equal(got24, exp24)


def test_flac_malformed_inputs_never_crash():
    """Adversarial FLAC bytes (review findings): the heap-overflow shape
    (LPC order 32 with block_size 1), a huge 36-bit streaminfo sample count
    (~274 GB reserve), truncated streams, and random garbage must all fail
    CLEANLY (ValueError) or decode, never corrupt memory or abort."""
    import struct

    from thesia_tpu import native

    if not native.available():
        pytest.skip("native unavailable")

    def streaminfo(sr=8000, n_ch=1, bps=16, total=0xFFFFFFFFF):
        b = bytearray(34)
        b[10] = (sr >> 12) & 0xFF
        b[11] = (sr >> 4) & 0xFF
        b[12] = ((sr & 0xF) << 4) | (((n_ch - 1) & 0x7) << 1) | (((bps - 1) >> 4) & 1)
        b[13] = (((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
        b[14:18] = struct.pack(">I", total & 0xFFFFFFFF)
        return b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(b)

    # frame: sync + bs_code=6(8-bit size 0 -> block 1) + LPC order 32 subframe
    # header, then plenty of bits for the 32-sample warmup that must NOT be
    # written into the 1-sample buffer
    frame = bytes([0xFF, 0xF8, 0x60, 0x08, 0x00, 0x00])
    frame += bytes([0x00, 0x7E])  # subframe: pad 0, type 63 (LPC order 32)
    frame += bytes(64)  # warmup bit supply
    crafted = streaminfo() + frame

    cases = [
        crafted,
        streaminfo(),                      # no frames at all
        streaminfo()[:20],                 # truncated streaminfo
        b"fLaC" + bytes(100),
        bytes(200),
    ]
    rng = np.random.default_rng(3)
    for _ in range(50):
        n = int(rng.integers(8, 400))
        cases.append(b"fLaC" + rng.integers(0, 256, n, np.int64).astype(np.uint8).tobytes())
    for data in cases:
        try:
            arr, sr, bits = native.flac_decode(data)
            assert arr.ndim == 2  # decoded something plausible
        except ValueError:
            pass  # clean rejection
