"""Mutation generator + kill-checker for the executed viewer-JS harness.

VERDICT r4 weak #5: the differential harness (real JS through
tests/jsinterp.py vs the Python twins) had only anecdotal evidence of what
it can catch.  This module auto-generates semantic mutations of the pure
twinned modules (applogic.js, freqscale.js) — operator flips, boundary
<->(<=) swaps, min/max swaps, floor/ceil swaps, logic flips, constant
nudges — applies each to the REAL source, and runs the full differential
case battery (tests/test_js_execution.CASES, 800+ cases) against the
unmutated twins as the oracle.  A mutation is KILLED when any case
mismatches or errors (a parse error counts: it would fail CI outright).

tests/test_mutation_battery.py runs the whole pool every suite run and
pins a curated must-kill set (tests/goldens/js_mutants.json, regenerate
with `python -m tests.make_js_mutants`).
"""

from __future__ import annotations

import pathlib

VIEWER_JS = pathlib.Path(__file__).resolve().parent.parent / "thesia_tpu" / "viewer" / "js"
FILES = ("applogic.js", "freqscale.js")

# (from, to, guard) — guard(src, i) -> bool: the occurrence at i is a real
# code token of this operator (not part of a longer operator)
def _not_part_of(longer_chars_before="", longer_chars_after=""):
    def guard(src, i, n):
        if i > 0 and src[i - 1] in longer_chars_before:
            return False
        j = i + n
        if j < len(src) and src[j] in longer_chars_after:
            return False
        return True

    return guard


_ALWAYS = lambda src, i, n: True  # noqa: E731

MUTATORS = [
    ("<=", "<", _ALWAYS),
    ("<", "<=", _not_part_of("<", "=<")),
    (">=", ">", _ALWAYS),
    (">", ">=", _not_part_of("=>", "=>")),  # skip arrows and >= / >>
    (" + ", " - ", _ALWAYS),
    (" - ", " + ", _ALWAYS),
    (" * ", " / ", _ALWAYS),
    (" / ", " * ", _ALWAYS),
    ("Math.max", "Math.min", _ALWAYS),
    ("Math.min", "Math.max", _ALWAYS),
    ("Math.floor", "Math.ceil", _ALWAYS),
    ("Math.ceil", "Math.floor", _ALWAYS),
    ("Math.round", "Math.floor", _ALWAYS),
    ("Math.log", "Math.exp", _ALWAYS),
    ("&&", "||", _ALWAYS),
    ("||", "&&", _ALWAYS),
    ("===", "!==", _ALWAYS),
    ("!==", "===", _ALWAYS),
    ("0.5", "0.499", _ALWAYS),
    ("1e-8", "1e-2", _ALWAYS),
    ("? ", "? !", _ALWAYS),  # ternary-arm negation probe
]


def _line_of(src: str, i: int) -> str:
    a = src.rfind("\n", 0, i) + 1
    b = src.find("\n", i)
    return src[a : b if b >= 0 else len(src)]


def _in_comment_or_export_const_name(src: str, i: int) -> bool:
    a = src.rfind("\n", 0, i) + 1
    before = src[a:i]
    if "//" in before:
        return True
    # skip string/template contents on this line (odd quote count before)
    for q in ('"', "'", "`"):
        if before.count(q) % 2 == 1:
            return True
    return False


def _occurrences(src: str, frm: str, guard) -> list[int]:
    out = []
    i = src.find(frm)
    while i >= 0:
        if not _in_comment_or_export_const_name(src, i) and guard(src, i, len(frm)):
            out.append(i)
        i = src.find(frm, i + 1)
    return out


def candidate_sites() -> list[dict]:
    """Every mutable site in the twinned pure modules, deterministically
    ordered.  `context` pins the exact source line so the must-kill fixture
    detects drift after edits (re-curate rather than silently skip)."""
    sites = []
    for fname in FILES:
        src = (VIEWER_JS / fname).read_text()
        for frm, to, guard in MUTATORS:
            for k, i in enumerate(_occurrences(src, frm, guard)):
                sites.append(
                    {
                        "file": fname,
                        "from": frm,
                        "to": to,
                        "occurrence": k,
                        "context": _line_of(src, i).strip(),
                    }
                )
    return sites


def apply_site(src: str, site: dict) -> str | None:
    """Mutated source, or None when the site no longer exists / drifted."""
    frm = site["from"]
    guard = next(g for f, t, g in MUTATORS if f == frm and t == site["to"])
    occ = _occurrences(src, frm, guard)
    k = site["occurrence"]
    if k >= len(occ):
        return None
    i = occ[k]
    if _line_of(src, i).strip() != site["context"]:
        return None
    return src[:i] + site["to"] + src[i + len(frm) :]


_LOAD_ORDER = ("api.js", "freqscale.js", "caches.js", "axes.js",
               "viewport.js", "applogic.js")


class _MutantHang(Exception):
    pass


class _mutant_deadline:
    """SIGALRM watchdog: a mutant that flips a loop bound can loop forever
    inside the interpreter; CI would hang on it (caught, but expensively) —
    here it's killed with 'hang' evidence.  Main-thread only; no-op
    elsewhere."""

    def __init__(self, seconds: float):
        self.seconds = seconds
        self.armed = False

    def __enter__(self):
        import signal
        import threading

        if threading.current_thread() is threading.main_thread():
            def on_alarm(_sig, _frm):
                raise _MutantHang()

            self._prev = signal.signal(signal.SIGALRM, on_alarm)
            signal.setitimer(signal.ITIMER_REAL, self.seconds)
            self.armed = True
        return self

    def __exit__(self, *exc):
        import signal

        if self.armed:
            signal.setitimer(signal.ITIMER_REAL, 0.0)
            signal.signal(signal.SIGALRM, self._prev)
        return False


_PRISTINE_AST: dict[str, object] = {}  # unmutated module parse cache


def battery_kills(overrides: dict[str, str], timeout_s: float = 10.0) -> str | None:
    """Run the full differential battery with mutated source(s).  Returns
    the first kill evidence ('name: reason') or None if the mutant SURVIVES
    every case."""
    from tests import test_js_execution as tj
    from tests.jsinterp import Interp

    try:
        with _mutant_deadline(timeout_s):
            interp = Interp()
            try:
                for name in _LOAD_ORDER:
                    if name in overrides:
                        interp.load(overrides[name])
                    else:
                        # pristine modules: parse once per battery process
                        # (ASTs are pure data; only the mutated file differs
                        # between mutants — re-parsing all six per mutant
                        # dominated the battery's runtime)
                        ast = _PRISTINE_AST.get(name)
                        if ast is None:
                            from tests.jsinterp import Parser, tokenize

                            ast = Parser(
                                tokenize((VIEWER_JS / name).read_text())
                            ).parse_program()
                            _PRISTINE_AST[name] = ast
                        interp.load_ast(ast)
            except Exception as e:  # parse/eval error at load: CI fails -> killed
                return f"load: {type(e).__name__}"
            env = interp.global_env.vars
            for name, cases in tj.CASES.items():
                for args in cases:
                    try:
                        tj.check(env, name, *args)
                    except _MutantHang:
                        raise
                    except Exception as e:
                        return f"{name}: {type(e).__name__}"
    except _MutantHang:
        return "hang: infinite loop"
    # constants are compared against the twins too (test_constants_equal)
    import math

    from thesia_tpu.viewer import twin_app as T

    for cname, v in T.TWINNED.items():
        if isinstance(v, (int, float)):
            got = env.get(cname)
            if not (isinstance(got, float) and got == float(v)):
                return f"const {cname}"
    return None


def kill_report() -> tuple[list[dict], list[dict]]:
    """(killed_sites, surviving_sites) over the whole candidate pool."""
    killed, survived = [], []
    for site in candidate_sites():
        src = (VIEWER_JS / site["file"]).read_text()
        mutated = apply_site(src, site)
        assert mutated is not None  # fresh sites always apply
        evidence = battery_kills({site["file"]: mutated})
        if evidence is None:
            survived.append(site)
        else:
            killed.append({**site, "evidence": evidence})
    return killed, survived
