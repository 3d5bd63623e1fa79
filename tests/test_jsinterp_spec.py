"""ECMA-262 conformance pins for tests/jsinterp.py (VERDICT r4 weak #5).

The differential harness compares JS-as-executed-by-jsinterp against the
Python twins — if BOTH share a semantic misunderstanding of real JS, they
agree and the bug ships.  No JS engine exists in this image to referee, so
this module pins the interpreter against HAND-WRITTEN expected values taken
straight from the ECMA-262 algorithms (Number::toString shortest round-trip,
Number.prototype.toFixed's "pick the larger n" ties, %'s dividend-sign
remainder, Math.round's half-toward-+inf vs toFixed's divergence on -2.5,
SameValueZero Map keys, parseFloat's longest-prefix scan, ?? / typeof / NaN
rules).  Every expectation below is a spec-derived literal, NOT computed by
Python emulation — an error here means jsinterp AND every twin built on its
behavior are wrong together.

Scope: exactly the built-ins the viewer modules use (measured:
Math.max/min/floor/ceil/round/abs/log2, parseFloat, Number.isNaN/isFinite,
toFixed, ??, %, join, padStart, Map, template-literal ToString).
"""

import math

import pytest

from tests.jsinterp import Interp, UNDEF

# (label, js expression, expected python value)
# floats compare exactly (IEEE doubles are IEEE doubles in both languages);
# -0.0 distinctions are pinned via 1/x == -Infinity inside the JS.
CASES = [
    # ---- Number::toString — ECMA-262 6.1.6.1.20: shortest decimal that
    # round-trips, positional for -6 <= exp < 21, exponent form outside
    ("tostr_tenth", "`${0.1}`", "0.1"),
    ("tostr_sum_dust", "`${0.1 + 0.2}`", "0.30000000000000004"),
    ("tostr_third", "`${1 / 3}`", "0.3333333333333333"),
    ("tostr_neg_zero", "`${-0}`", "0"),
    ("tostr_1e21", "`${1e21}`", "1e+21"),
    ("tostr_1e20_positional", "`${1e20}`", "100000000000000000000"),
    ("tostr_1e-6_positional", "`${0.000001}`", "0.000001"),
    ("tostr_1e-7_exponent", "`${1e-7}`", "1e-7"),
    ("tostr_15e-7", "`${1.5e-7}`", "1.5e-7"),
    ("tostr_plain", "`${123.456}`", "123.456"),
    ("tostr_2p53", "`${9007199254740992}`", "9007199254740992"),
    ("tostr_denormal_min", "`${5e-324}`", "5e-324"),
    ("tostr_max_double", "`${1.7976931348623157e308}`", "1.7976931348623157e+308"),
    ("tostr_nan", "`${NaN}`", "NaN"),
    ("tostr_inf", "`${Infinity}`", "Infinity"),
    ("tostr_neg_inf", "`${-Infinity}`", "-Infinity"),
    ("tostr_int_from_exp", "`${1.5e3}`", "1500"),
    # ---- Number.prototype.toFixed — ECMA-262 21.1.3.3: n minimizes
    # |n/10^f - x|, ties pick the LARGER n; >= 1e21 falls back to ToString
    ("tofixed_binary_down", "(1.005).toFixed(2)", "1.00"),
    ("tofixed_exact_tie_up", "(0.125).toFixed(2)", "0.13"),
    ("tofixed_half_up", "(2.5).toFixed(0)", "3"),
    ("tofixed_neg_half", "(-2.5).toFixed(0)", "-3"),
    ("tofixed_plain", "(1234.5678).toFixed(2)", "1234.57"),
    ("tofixed_neg_dust_keeps_sign", "(-0.0001).toFixed(2)", "-0.00"),
    ("tofixed_zero", "(0).toFixed(2)", "0.00"),
    ("tofixed_1e21_tostring", "(1e21).toFixed(2)", "1e+21"),
    # ---- Math.round — half toward +Infinity (NOT half-away: -2.5 -> -2),
    # so it DISAGREES with (-2.5).toFixed(0) === "-3" above
    ("round_half_up", "Math.round(0.5)", 1.0),
    ("round_25", "Math.round(2.5)", 3.0),
    ("round_neg_25", "Math.round(-2.5)", -2.0),
    ("round_neg_half_is_neg0", "1 / Math.round(-0.5)", -math.inf),
    ("round_nan", "Math.round(NaN)", "NaN"),
    ("round_inf", "Math.round(Infinity)", math.inf),
    # the float add in floor(x+0.5) lands on 1.0 here; the spec compares
    # the mathematical fraction and answers 0
    ("round_below_half_ulp", "Math.round(0.49999999999999994)", 0.0),
    ("floor_neg0_keeps_sign", "1 / Math.floor(-0)", -math.inf),
    ("ceil_neg_half_is_neg0", "1 / Math.ceil(-0.5)", -math.inf),
    ("floor_nan", "Math.floor(NaN)", "NaN"),
    # ---- % — ECMA-262 6.1.6.1.6: remainder takes the DIVIDEND's sign
    ("mod_pos_negdiv", "5 % -2", 1.0),
    ("mod_neg_posdiv", "-5 % 2", -1.0),
    ("mod_neg_negdiv", "-5 % -2", -1.0),
    ("mod_float", "5.5 % 2", 1.5),
    ("mod_by_zero", "5 % 0", "NaN"),
    ("mod_inf_dividend", "Infinity % 2", "NaN"),
    # ---- Math.min/max — no args give the identity; NaN poisons
    ("max_empty", "Math.max()", -math.inf),
    ("min_empty", "Math.min()", math.inf),
    ("min_nan", "Math.min(1, NaN)", "NaN"),
    ("max_nan", "Math.max(NaN, 1)", "NaN"),
    ("floor_neg", "Math.floor(-0.5)", -1.0),
    ("ceil_pos_dust", "Math.ceil(0.2)", 1.0),
    ("abs_neg0", "1 / Math.abs(-0)", math.inf),
    ("log2_exact", "Math.log2(8)", 3.0),
    ("log2_one", "Math.log2(1)", 0.0),
    # ---- parseFloat — longest numeric-literal prefix; trims leading ws
    ("parsefloat_prefix", "parseFloat('  55.5e0 stuff')", 55.5),
    ("parsefloat_infinity", "parseFloat('Infinity')", math.inf),
    ("parsefloat_leading_dot", "parseFloat('-.5')", -0.5),
    ("parsefloat_dangling_e", "parseFloat('1e')", 1.0),
    ("parsefloat_dot_only", "parseFloat('.')", "NaN"),
    ("parsefloat_hex_stops_at_x", "parseFloat('0x10')", 0.0),
    ("parsefloat_empty", "parseFloat('')", "NaN"),
    ("parsefloat_plus_trailing_dot", "parseFloat('+12.')", 12.0),
    # ---- coercion: * goes numeric, + concatenates when either is a string
    ("coerce_mul_strings", "'5' * '2'", 10.0),
    ("coerce_concat_right", "'5' + 2", "52"),
    ("coerce_concat_left", "2 + '5'", "25"),
    ("coerce_add_null", "1 + null", 1.0),
    ("coerce_add_undefined", "1 + undefined", "NaN"),
    ("coerce_concat_true", "'' + true", "true"),
    ("coerce_concat_null", "'' + null", "null"),
    ("coerce_concat_undefined", "'' + undefined", "undefined"),
    ("nan_self_inequality", "NaN !== NaN", True),
    # ---- ?? (nullish) keeps every non-nullish falsy LHS; ||/&& don't
    ("nullish_null", "null ?? 'y'", "y"),
    ("nullish_undefined", "undefined ?? 5", 5.0),
    ("nullish_zero_kept", "0 ?? 9", 0.0),
    ("nullish_empty_kept", "'' ?? 'z'", ""),
    ("nullish_false_kept", "false ?? 1", False),
    ("or_zero_falls", "0 || 'x'", "x"),
    ("or_nan_falls", "NaN || 7", 7.0),
    ("and_empty_stops", "'' && 'y'", ""),
    ("and_truthy_passes", "2 && 3", 3.0),
    # ---- global isFinite/isNaN COERCE; the Number.* statics do NOT
    ("isfinite_coerces", "isFinite('5')", True),
    ("number_isfinite_strict", "Number.isFinite('5')", False),
    ("isnan_coerces", "isNaN('abc')", True),
    ("number_isnan_strict", "Number.isNaN('abc')", False),
    ("number_isnan_nan", "Number.isNaN(NaN)", True),
    # ---- string built-ins the viewer leans on
    ("padstart_pads", "'7'.padStart(2, '0')", "07"),
    ("padstart_never_truncates", "'abc'.padStart(2, '0')", "abc"),
    ("padstart_default_space", "'5'.padStart(3)", "  5"),
    ("join_mixed", "[1, 2.5, 'a'].join(':')", "1:2.5:a"),
    ("join_nullish_empty", "[null, undefined, 1].join(',')", ",,1"),
    ("join_empty_array", "[].join(',')", ""),
    ("string_lt_lexicographic", "'10' < '9'", True),
    # ---- typeof table
    ("typeof_null", "typeof null", "object"),
    ("typeof_undefined", "typeof undefined", "undefined"),
    ("typeof_nan", "typeof NaN", "number"),
    ("typeof_string", "typeof ''", "string"),
    # ---- unary + is ToNumber
    ("unary_plus_empty", "+''", 0.0),
    ("unary_plus_ws", "+' 12 '", 12.0),
    ("unary_plus_junk", "+'12a'", "NaN"),
    ("unary_plus_infinity", "+'Infinity'", math.inf),
]

# Map keys use SameValueZero: no coercion, NaN equals itself, +0 equals -0
MAP_SNIPPET = """
export function mapKeyTyping() {
  const m = new Map();
  m.set(1, 'num');
  m.set(NaN, 'nan');
  m.set(0, 'zero');
  return [m.get('1') === undefined, m.has(1), m.get(NaN), m.get(-0)];
}
"""


def _norm(v):
    if v is UNDEF:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


@pytest.fixture(scope="module")
def spec_env():
    interp = Interp()
    body = "\n".join(
        f"export function case_{i}() {{ return ({expr}); }}"
        for i, (_, expr, _e) in enumerate(CASES)
    )
    interp.load(body + "\n" + MAP_SNIPPET)
    return interp.global_env.vars


@pytest.mark.parametrize(
    "i,label", [(i, c[0]) for i, c in enumerate(CASES)], ids=[c[0] for c in CASES]
)
def test_ecma_semantics(spec_env, i, label):
    _, expr, expected = CASES[i]
    got = _norm(spec_env[f"case_{i}"]())
    if isinstance(expected, bool) or expected is None:
        assert got is expected, f"{label}: {expr} -> {got!r}, spec says {expected!r}"
    else:
        assert got == expected and type(got) is type(expected), (
            f"{label}: {expr} -> {got!r} ({type(got).__name__}), "
            f"spec says {expected!r}"
        )


def test_map_samevaluezero(spec_env):
    got = [_norm(x) for x in spec_env["mapKeyTyping"]()]
    assert got == [True, True, "nan", "zero"], got


def test_loose_equality_rejected():
    """Loose == / != are OUTSIDE the supported ES subset by design (the
    viewer sources use strict equality only — the == hits in them are all
    comments).  Pinning the rejection keeps that invariant honest: new
    viewer code using == fails to load in CI instead of silently getting
    whatever semantics the interpreter guessed."""
    interp = Interp()
    with pytest.raises(SyntaxError):
        interp.load("export function t() { return (undefined == null); }")
    with pytest.raises(SyntaxError):
        interp.load("export function t() { return (1 != 2); }")
