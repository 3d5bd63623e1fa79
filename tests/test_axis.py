"""Axis marker golden tests.

Goldens from reference: src-wasm/src/axis.rs:656-845.
"""

import math

import numpy as np
import pytest

from thesia_tpu.axis import (
    calc_amp_axis_markers,
    calc_db_axis_markers,
    calc_freq_axis_markers,
    calc_time_axis_markers,
    format_frequency_axis_tooltip,
    format_linear_axis_tooltip,
    format_number_label,
    format_time_axis_tooltip,
    freq_label_to_hz,
    sec_to_label,
    time_label_to_sec,
)
from thesia_tpu.common.freqscale import FreqScale
from thesia_tpu.common.melscale import MIN_LOG_MEL, hz_to_mel

I32_MIN = -2147483648


def assert_axis_eq(got, expected):
    assert len(got) == len(expected), f"{got} vs {expected}"
    for (y0, s0), (y1, s1) in zip(got, expected):
        assert abs(y0 - y1) < 2e-7, f"{got} vs {expected}"
        assert s0 == s1, f"{got} vs {expected}"


def test_sec_to_label_floor():
    assert sec_to_label(1.999) == "00:00:01.999"
    assert sec_to_label(1.9991) == "00:00:01.999"
    assert sec_to_label(1.9999) == "00:00:01.999"
    assert sec_to_label(2.0 - 2.220446049250313e-16) == "00:00:01.999"
    assert sec_to_label(2.0) == "00:00:02.000"


def test_time_axis():
    assert_axis_eq(
        calc_time_axis_markers(1.999, 2.0015, 0.0005, 1, 59.0),
        [
            (-0.2, "1.998"),
            (0.0, "1.999"),
            (0.2, "1.999"),
            (0.4, "2"),
            (0.6, "2"),
            (0.8, "2.001"),
            (I32_MIN, "ss.xxx"),
        ],
    )
    assert_axis_eq(
        calc_time_axis_markers(1.999, 2.001, 0.001, 1, 60.0),
        [
            (-0.5, "00:01.998"),
            (0.0, "00:01.999"),
            (0.5, "00:02"),
            (I32_MIN, "mm:ss.xxx"),
        ],
    )


def mel(hz):
    return float(hz_to_mel(np.float32(hz)))


def test_freq_axis():
    assert_axis_eq(
        calc_freq_axis_markers((0.0, 12000.0), FreqScale.Linear, 2, 2),
        [(1.0, "0"), (0.0, "12k")],
    )
    assert_axis_eq(
        calc_freq_axis_markers((0.0, 12000.0), FreqScale.Linear, 8, 8),
        [
            (1.0, "0"),
            (5 / 6, "2k"),
            (4 / 6, "4k"),
            (3 / 6, "6k"),
            (2 / 6, "8k"),
            (1 / 6, "10k"),
            (0.0, "12k"),
        ],
    )
    assert_axis_eq(
        calc_freq_axis_markers((0.0, 12000.0), FreqScale.Linear, 24, 24)[:3],
        [(1.0, "0"), (11 / 12, "1k"), (10 / 12, "2k")],
    )
    assert_axis_eq(
        calc_freq_axis_markers((0.0, 12000.0), FreqScale.Linear, 25, 25)[:3],
        [(1.0, "0"), (23 / 24, "500"), (22 / 24, "1k")],
    )
    assert_axis_eq(
        calc_freq_axis_markers((0.0, 11025.0), FreqScale.Linear, 24, 24)[20:],
        [
            (1.0 - 10000.0 / 11025.0, "10k"),
            (1.0 - 10500.0 / 11025.0, "10.5k"),
            (0.0, "11.025k"),
        ],
    )
    assert_axis_eq(
        calc_freq_axis_markers((0.0, 12000.0), FreqScale.Mel, 2, 2),
        [(1.0, "0"), (0.0, "12k")],
    )
    assert_axis_eq(
        calc_freq_axis_markers((0.0, 12000.0), FreqScale.Mel, 3, 3),
        [(1.0, "0"), (1.0 - MIN_LOG_MEL / mel(12000), "1k"), (0.0, "12k")],
    )
    assert_axis_eq(
        calc_freq_axis_markers((0.0, 1500.0), FreqScale.Mel, 4, 4),
        [
            (1.0, "0"),
            (1.0 - mel(500) / mel(1500), "500"),
            (1.0 - MIN_LOG_MEL / mel(1500), "1k"),
            (0.0, "1.5k"),
        ],
    )
    assert_axis_eq(
        calc_freq_axis_markers((0.0, 12000.0), FreqScale.Mel, 8, 8),
        [
            (1.0, "0"),
            (1.0 - mel(500) / mel(12000), "500"),
            (1.0 - MIN_LOG_MEL / mel(12000), "1k"),
            (1.0 - mel(2000) / mel(12000), "2k"),
            (1.0 - mel(4000) / mel(12000), "4k"),
            (1.0 - mel(8000) / mel(12000), "8k"),
            (0.0, "12k"),
        ],
    )
    assert_axis_eq(
        calc_freq_axis_markers((0.0, 48000.0), FreqScale.Mel, 6, 6),
        [
            (1.0, "0"),
            (1.0 - MIN_LOG_MEL / mel(48000), "1k"),
            (1.0 - mel(4000) / mel(48000), "4k"),
            (1.0 - mel(16000) / mel(48000), "16k"),
            (0.0, "48k"),
        ],
    )


def test_db_axis():
    assert_axis_eq(
        calc_db_axis_markers(2, 2, (-100.0, 0.0)), [(0.0, "0"), (1.0, "-100")]
    )
    assert_axis_eq(
        calc_db_axis_markers(3, 3, (-12.0, 0.0)),
        [(0.0, "0"), (-5.0 / -12.0, "-5"), (-10.0 / -12.0, "-10")],
    )
    assert_axis_eq(
        calc_db_axis_markers(3, 3, (-2.0, -1.1)),
        [((-1.5 + 1.1) / (-2.0 + 1.1), "-1.5"), (1.0, "-2.0")],
    )
    assert_axis_eq(calc_db_axis_markers(2, 2, (-math.inf, -math.inf)), [(1.0, "-∞")])
    assert_axis_eq(calc_db_axis_markers(2, 2, (-360.0, -360.0)), [(1.0, "-360")])


def test_amp_axis():
    assert_axis_eq(
        calc_amp_axis_markers(5, 3, (-1.0, 1.0)),
        [(0.0, "1.0"), (0.25, "0.5"), (0.5, "0"), (0.75, "-0.5"), (1.0, "-1.0")],
    )


def test_label_parsing():
    assert abs(time_label_to_sec("2.125") - 2.125) < 1e-12
    assert abs(time_label_to_sec("1:02.5") - 62.5) < 1e-12
    assert abs(time_label_to_sec("01:02:03.25") - 3723.25) < 1e-12
    with pytest.raises(ValueError):
        time_label_to_sec("1:2:3:4")

    assert freq_label_to_hz("500") == 500.0
    assert freq_label_to_hz("1k") == 1000.0
    assert freq_label_to_hz("1K5") == 1500.0
    assert freq_label_to_hz("10.5k") == 10500.0
    for bad in ("k1", "-1", "1kK"):
        with pytest.raises(ValueError):
            freq_label_to_hz(bad)


def test_tooltips():
    assert format_time_axis_tooltip(62.125, "mm:ss.xxx") == "01:02.125"
    assert format_time_axis_tooltip(2.0, "ss.xxx") == "2.000"
    assert format_time_axis_tooltip(2.1, "ss.xx") == "2.10"
    assert format_frequency_axis_tooltip(12345.0, 10.0) == "12.35k"
    assert format_frequency_axis_tooltip(440.25, 0.1) == "440.2"
    assert format_linear_axis_tooltip(0.0012, 0.0001, 0.001, 9) == "1.2e-3"
    assert format_linear_axis_tooltip(1.234, 0.01, 0.1, 9) == "1.23"
    assert format_linear_axis_tooltip(-math.inf, 1.0, math.nan, 9) == "-∞"
    assert format_number_label(-12.345, 2) == "-12.35"
    assert format_number_label(0.0, 2) == "0.00"
    assert format_number_label(-math.inf, 2) == "-∞"


def test_axis_inputs_from_http_never_crash():
    """Review findings: HTTP-reachable axis inputs that previously raised
    ZeroDivisionError/OverflowError/NotImplementedError (-> 500) or hung in
    unbounded loops must now raise ValueError (-> 400) or return quickly."""
    import math

    import pytest

    from thesia_tpu.axis.markers import (
        calc_amp_axis_markers,
        calc_db_axis_markers,
        calc_freq_axis_markers,
        calc_time_axis_markers,
        format_frequency_axis_tooltip,
        format_time_axis_tooltip,
        hz_to_label,
    )
    from thesia_tpu.common.freqscale import FreqScale

    with pytest.raises(ValueError):
        calc_time_axis_markers(0.0, 1e15, 1e-6, 2, 10.0)  # ~1e21 ticks
    # zero span is VALID (reference asserts start <= end, axis.rs:23): a
    # zero-width canvas during boot layout produces start==end and must get
    # a well-formed (sentinel-terminated) marker list, not a 400
    degenerate = calc_time_axis_markers(1.0, 1.0, 0.5, 2, 10.0)
    assert degenerate[-1][1] == "ss"  # the format sentinel
    with pytest.raises(ValueError):
        calc_time_axis_markers(1.0, 0.999, 0.5, 2, 10.0)  # reversed
    # label converters mirror Rust saturating casts / field parsing
    # (axis.rs:325-360): inf and negatives must not 500 or go negative
    from thesia_tpu.axis.markers import sec_to_label, time_label_to_sec

    assert sec_to_label(-0.5) == "00:00:00.000"  # saturating u32 casts
    assert sec_to_label(float("nan")) == "00:00:00.000"
    assert ":" in sec_to_label(float("inf"))  # huge but well-formed, no 500
    assert time_label_to_sec("-30") == -30.0  # Rust f64 seconds field
    for bad in ("-1:30", "1: 30", "1_0:30", "+-1:30", "1:30:00:00"):
        with pytest.raises(ValueError):
            time_label_to_sec(bad)  # Rust u32 fields reject all of these
    # the API boundary maps non-finite parses to null (bare Infinity is
    # not valid JSON for the browser)
    from thesia_tpu.engine.axis_api import AxisApi

    api = AxisApi()
    assert api.time_label_to_seconds("inf") is None
    assert api.freq_label_to_hz("inf") is None
    assert api.time_label_to_seconds("90") == 90.0
    # freq position converters: ValueError (not assert/ZeroDivision) on
    # hostile input
    from thesia_tpu.axis.markers import freq_pos_to_hz
    from thesia_tpu.common.freqscale import FreqScale as FS

    with pytest.raises(ValueError):
        freq_pos_to_hz(FS.Mel, 10.0, 0, (0.0, 8000.0), 8000.0)
    with pytest.raises(ValueError):
        freq_pos_to_hz(FS.Mel, float("nan"), 100, (0.0, 8000.0), 8000.0)
    with pytest.raises(ValueError):
        calc_time_axis_markers(0.0, 1.0, 0.0, 2, 10.0)  # zero tick unit
    with pytest.raises(ValueError):
        calc_freq_axis_markers((0.0, 1e13), FreqScale.Mel, 10**10, 5, 24000.0)
    with pytest.raises(ValueError):
        calc_amp_axis_markers(5, 3, (-1.0, 2.0))  # asymmetric
    with pytest.raises(ValueError):
        calc_amp_axis_markers(4, 3, (-1.0, 1.0))  # even ticks
    with pytest.raises(ValueError):
        calc_db_axis_markers(3, 0, (-100.0, 0.0))  # zero labels
    with pytest.raises(ValueError):
        calc_db_axis_markers(3, 2, (0.0, -100.0))  # reversed
    with pytest.raises(ValueError):
        calc_db_axis_markers(3, 2, (-1e308, 1e308))  # beyond f32
    with pytest.raises(ValueError):
        format_time_axis_tooltip(math.inf, "mm:ss.xxx")
    with pytest.raises(ValueError):
        format_frequency_axis_tooltip(math.inf, 1.0)
    assert hz_to_label(math.inf) == "+∞"
    # sub-denormal span degrades to endpoint labels, no OverflowError
    out = calc_db_axis_markers(5, 3, (0.0, 1e-46))
    assert len(out) == 2
    # low-sample-rate track with a retained high zoom: raw range asserted
    # FIRST, then clamped (reference axis.rs:119-121) -> endpoint markers
    out = calc_freq_axis_markers((5000.0, 20000.0), FreqScale.Mel, 8, 4, 4000.0)
    assert out[0][1] == "5k" and len(out) == 2


def test_rust_exp_format_renormalizes_carry():
    """{:.2e} of 9.9999e-5 must carry to 1.00e-4 like Rust, not 10.00e-5."""
    from thesia_tpu.axis.markers import _rust_exp_format

    assert _rust_exp_format(9.9999e-5, 2) == "1.00e-4"
    assert _rust_exp_format(-9.9999e-5, 2) == "-1.00e-4"
    assert _rust_exp_format(9.49e-5, 2) == "9.49e-5"
