"""Bracket/structure sanity checker for the no-build viewer JS (no JS
runtime exists in this image).  Tokenizes string literals, template
literals (incl. ${} nesting), comments and common regex positions, then
verifies (), [], {} balance.  Used by tests/test_viewer_consistency.py and
runnable standalone:  python tests/jscheck.py [files...]
"""

from __future__ import annotations

import pathlib
import sys

OPEN = {"(": ")", "[": "]", "{": "}"}
CLOSE = {v: k for k, v in OPEN.items()}


def check_js(src: str, name: str = "<js>") -> list[str]:
    errors: list[str] = []
    stack: list[tuple[str, int]] = []  # (bracket, line)
    line = 1
    i = 0
    n = len(src)
    # template-literal nesting: each entry is True while inside `${ ... }`
    template_stack: list[int] = []  # remembers stack depth at ${ entry
    mode: list[str] = []  # "tpl" markers for nested template literals
    prev_significant = ""

    def is_regex_position(prev: str) -> bool:
        # a `/` starts a regex when the previous significant token can't
        # end an expression
        return prev in "" or prev in "=([{,;:!&|?+-*%~^<>" or prev == "return"

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            i = n if j == -1 else j
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j == -1:
                errors.append(f"{name}:{line}: unterminated block comment")
                return errors
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c in "\"'":
            quote = c
            i += 1
            while i < n:
                if src[i] == "\\":
                    i += 2
                    continue
                if src[i] == quote:
                    break
                if src[i] == "\n":
                    errors.append(f"{name}:{line}: unterminated string")
                    line += 1
                    break
                i += 1
            i += 1
            prev_significant = '"'
            continue
        if c == "`":
            # scan template literal; handle ${ } nesting by recursing into
            # normal mode via the shared stack
            i += 1
            while i < n:
                if src[i] == "\\":
                    i += 2
                    continue
                if src[i] == "\n":
                    line += 1
                    i += 1
                    continue
                if src[i] == "`":
                    break
                if src[i] == "$" and i + 1 < n and src[i + 1] == "{":
                    # push sentinel and scan as code until matching }
                    depth = 1
                    i += 2
                    while i < n and depth:
                        if src[i] == "\n":
                            line += 1
                        elif src[i] in "\"'`":
                            q = src[i]
                            i += 1
                            while i < n and src[i] != q:
                                if src[i] == "\\":
                                    i += 1
                                elif src[i] == "\n":
                                    line += 1
                                i += 1
                        elif src[i] == "{":
                            depth += 1
                        elif src[i] == "}":
                            depth -= 1
                            if depth == 0:
                                break
                        i += 1
                    if depth:
                        errors.append(f"{name}:{line}: unterminated ${{}} in template")
                        return errors
                i += 1
            if i >= n:
                errors.append(f"{name}:{line}: unterminated template literal")
                return errors
            i += 1
            prev_significant = "`"
            continue
        if c == "/":
            if is_regex_position(prev_significant):
                # skip regex literal
                i += 1
                in_class = False
                while i < n:
                    if src[i] == "\\":
                        i += 2
                        continue
                    if src[i] == "[":
                        in_class = True
                    elif src[i] == "]":
                        in_class = False
                    elif src[i] == "/" and not in_class:
                        break
                    elif src[i] == "\n":
                        errors.append(f"{name}:{line}: unterminated regex")
                        break
                    i += 1
                i += 1
                prev_significant = "/"
                continue
            i += 1
            prev_significant = "/"
            continue
        if c in OPEN:
            stack.append((c, line))
            prev_significant = c
        elif c in CLOSE:
            if not stack:
                errors.append(f"{name}:{line}: unmatched '{c}'")
                return errors
            want, oline = stack.pop()
            if OPEN[want] != c:
                errors.append(
                    f"{name}:{line}: '{c}' closes '{want}' opened at line {oline}"
                )
                return errors
            prev_significant = c
        elif not c.isspace():
            if c.isalnum() or c in "_$.":
                # track 'return' keyword for regex detection
                j = i
                while j < n and (src[j].isalnum() or src[j] in "_$."):
                    j += 1
                word = src[i:j]
                prev_significant = "return" if word == "return" else word[-1]
                i = j
                continue
            prev_significant = c
        i += 1
    for b, oline in stack:
        errors.append(f"{name}: '{b}' opened at line {oline} never closed")
    return errors


def main(paths: list[str]) -> int:
    if not paths:
        base = pathlib.Path(__file__).resolve().parent.parent / "thesia_tpu" / "viewer" / "js"
        paths = [str(p) for p in sorted(base.glob("*.js"))]
    bad = 0
    for path in paths:
        src = pathlib.Path(path).read_text()
        errs = check_js(src, pathlib.Path(path).name)
        for e in errs:
            print(e)
            bad += 1
        if not errs:
            print(f"{pathlib.Path(path).name}: ok")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
