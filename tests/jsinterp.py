"""Minimal ES-subset interpreter — executes the viewer's ACTUAL JavaScript
inside the test suite, where no JS runtime exists (no node/browser in this
image).

Three layers of coverage are built on it:
  * tests/test_js_execution.py runs every applogic.js export differentially
    against the Python twins (twin_app.py, itself golden-tested against the
    reference formulas), plus the round-2 twin surfaces (tick tables, LOD
    math, LruByteCache op tapes) and the api.js binary tile decoders
    against the Python encoders byte-for-byte;
  * tests/test_app_boot.py BOOTS app.js/overview.js headlessly against a
    real EngineSession via tests/fakedom.py (DOM + synchronous fetch
    bridge) and drives the reference's interaction flows;
  * a sign flip or dropped clamp anywhere in the viewer JS now fails the
    suite instead of shipping silently.

Supported subset (everything the viewer modules use):
  statements  const/let (array + object destructuring), if/else, classic
              for (;;), for-of (with patterns), while, switch/case,
              break/continue, return, blocks, try/catch/finally, throw,
              function + class declarations, export, import (namespace +
              dynamic imports resolve against the shared global scope)
  expressions numbers, strings, template literals w/ ${}, regex literals
              (contextual tokenization), member/computed/optional-chaining
              access, calls, new, unary -+!~ typeof await, binary ops,
              === !==, && || ??, ternary, assignment (=, +=, -=, *=, /=),
              ++/--, arrow functions (expression + block bodies, defaults),
              object literals (shorthand + method shorthand), array
              literals with spread
  runtime     Math.*, Number()/String()/isFinite/isNaN/parseFloat/BigInt,
              toFixed/toPrecision, String/Array prototype methods,
              Map/Set/WeakMap, DataView/ArrayBuffer/TypedArrays, Symbol,
              Error, synchronous promise model (.then/.catch/.finally on
              any value; async/await are identity)
JS semantics honored: undefined vs null, strict equality (NaN !== NaN),
truthiness, % as remainder-with-dividend-sign, Math.round half-toward-+inf,
toFixed decimal ties toward +inf, number->string without trailing ".0".
"""

from __future__ import annotations

import math
import re
from decimal import Decimal


class JSUndefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"


UNDEF = JSUndefined()


# ---------------------------------------------------------------------------
# tokenizer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<num>0x[0-9a-fA-F]+|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<tpl>`)
  | (?P<id>[A-Za-z_$][\w$]*)
  | (?P<punct>\.\.\.|=>|\*\*=?|===|!==|<<=?|>>>?=?|<=|>=|&&|\|\||\?\?|\?\.|\+\+|--|[+\-*/%]=|[{}()\[\];,<>+\-*/%!?:.=&|~^])
    """,
    re.X | re.S,
)


class Tok:
    __slots__ = ("kind", "val", "pos")

    def __init__(self, kind, val, pos):
        self.kind, self.val, self.pos = kind, val, pos

    def __repr__(self):
        return f"{self.kind}:{self.val!r}"


_REGEX_PREV = {"=", "(", ",", "[", ":", "&&", "||", "!", "?", ";", "return", "{"}


def tokenize(src: str) -> list[Tok]:
    toks = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise SyntaxError(f"tokenize error at {i}: {src[i:i+30]!r}")
        if (
            m.lastgroup == "punct" and m.group() == "/"
            and (not toks
                 # template-literal tokens carry unhashable (lists) vals —
                 # a value position, so / after one is division, not regex
                 or (isinstance(toks[-1].val, str)
                     and toks[-1].val in _REGEX_PREV))
        ):
            # regex literal position (JS grammar is context-sensitive here)
            j = i + 1
            in_class = False
            while j < len(src):
                c = src[j]
                if c == "\\":
                    j += 2
                    continue
                if c == "[":
                    in_class = True
                elif c == "]":
                    in_class = False
                elif c == "/" and not in_class:
                    break
                elif c == "\n":
                    raise SyntaxError(f"unterminated regex at {i}")
                j += 1
            pattern = src[i + 1 : j]
            j += 1
            flags = ""
            while j < len(src) and src[j].isalpha():
                flags += src[j]
                j += 1
            toks.append(Tok("regex", (pattern, flags), i))
            i = j
            continue
        if m.lastgroup == "tpl":
            # template literal: split into parts + ${expr} token streams
            parts, exprs = [], []
            j = m.end()
            buf = []
            while j < len(src):
                c = src[j]
                if c == "\\":
                    # real JS escape semantics: `\n` is a newline, not 'n'
                    nxt = src[j + 1]
                    buf.append({
                        "n": "\n", "t": "\t", "r": "\r", "0": "\0",
                        "b": "\b", "f": "\f", "v": "\v",
                    }.get(nxt, nxt))
                    j += 2
                    continue
                if c == "`":
                    j += 1
                    break
                if c == "$" and j + 1 < len(src) and src[j + 1] == "{":
                    parts.append("".join(buf))
                    buf = []
                    depth = 1
                    k = j + 2
                    while k < len(src) and depth:
                        if src[k] == "{":
                            depth += 1
                        elif src[k] == "}":
                            depth -= 1
                        k += 1
                    exprs.append(src[j + 2 : k - 1])
                    j = k
                    continue
                buf.append(c)
                j += 1
            parts.append("".join(buf))
            toks.append(Tok("template", (parts, exprs), m.start()))
            i = j
            continue
        if m.lastgroup not in ("ws", "comment"):
            kind = m.lastgroup
            val = m.group()
            if kind == "str":
                val = val[1:-1].encode().decode("unicode_escape") \
                    if "\\" in val else val[1:-1]
            toks.append(Tok(kind, val, m.start()))
        i = m.end()
    toks.append(Tok("eof", None, len(src)))
    return toks


# ---------------------------------------------------------------------------
# parser (Pratt) — produces tuple-based AST nodes

_KEYWORDS = {
    "const", "let", "var", "if", "else", "for", "while", "return", "function",
    "true", "false", "null", "undefined", "break", "continue", "export",
    "import", "from", "of", "new", "typeof", "class", "async", "await",
    "try", "catch", "finally", "throw", "switch", "case", "default",
}

_BINARY_PREC = {
    "??": 1, "||": 2, "&&": 3,
    "|": 4, "^": 5, "&": 6,
    "===": 7, "!==": 7, "<": 8, ">": 8, "<=": 8, ">=": 8,
    "+": 10, "-": 10, "*": 11, "/": 11, "%": 11, "**": 12,
    "<<": 9, ">>": 9, ">>>": 9,
}


class Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat(self, val):
        t = self.next()
        if t.val != val:
            raise SyntaxError(f"expected {val!r}, got {t.val!r} @{t.pos}")
        return t

    def at(self, val):
        return self.peek().val == val and self.peek().kind in ("punct", "id")

    # -- statements --------------------------------------------------------
    def parse_program(self):
        stmts = []
        while self.peek().kind != "eof":
            stmts.append(self.parse_statement())
        return ("block", stmts)

    def parse_statement(self):
        t = self.peek()
        if t.kind == "id":
            if t.val == "async" and self.peek(1).val == "function":
                self.next()
                return self.parse_function_decl()
            if t.val == "class":
                return self.parse_class()
            if t.val == "try":
                return self.parse_try()
            if t.val == "switch":
                return self.parse_switch()
            if t.val == "throw":
                self.next()
                e = self.parse_expr()
                if self.at(";"):
                    self.next()
                return ("throw", e)
            if t.val == "import":
                # `import * as NS from "..."` binds NS to the shared global
                # scope (modules are concatenated); named imports just skip
                if self.peek(1).val == "*" and self.peek(2).val == "as":
                    ns = self.peek(3).val
                    while self.next().val != ";":
                        pass
                    return ("nsimport", ns)
                while self.next().val != ";":
                    pass
                return ("empty",)
            if t.val == "export":
                self.next()
                return self.parse_statement()
            if t.val in ("const", "let", "var"):
                return self.parse_decl()
            if t.val == "function":
                return self.parse_function_decl()
            if t.val == "if":
                return self.parse_if()
            if t.val == "for":
                return self.parse_for()
            if t.val == "while":
                return self.parse_while()
            if t.val == "return":
                self.next()
                if self.at(";"):
                    self.next()
                    return ("return", ("undef",))
                e = self.parse_expr()
                if self.at(";"):
                    self.next()
                return ("return", e)
            if t.val == "break":
                self.next()
                if self.at(";"):
                    self.next()
                return ("break",)
            if t.val == "continue":
                self.next()
                if self.at(";"):
                    self.next()
                return ("continue",)
        if t.val == "{":
            return self.parse_block()
        if t.val == ";":
            self.next()
            return ("empty",)
        e = self.parse_expr()
        if self.at(";"):
            self.next()
        return ("expr", e)

    def parse_block(self):
        self.eat("{")
        stmts = []
        while not self.at("}"):
            stmts.append(self.parse_statement())
        self.eat("}")
        return ("block", stmts)

    def parse_decl(self):
        self.next()  # const/let/var
        decls = []
        while True:
            target = self.parse_binding_target()
            init = ("undef",)
            if self.at("="):
                self.next()
                init = self.parse_assign()
            decls.append((target, init))
            if self.at(","):
                self.next()
                continue
            break
        if self.at(";"):
            self.next()
        return ("decl", decls)

    def parse_binding_target(self):
        t = self.peek()
        if t.val == "[":
            self.next()
            names = []
            while not self.at("]"):
                names.append(self.parse_binding_target())
                if self.at(","):
                    self.next()
            self.eat("]")
            return ("arr_pat", names)
        if t.val == "{":
            self.next()
            pairs = []  # (source_key, target_pattern)
            while not self.at("}"):
                key = self.next().val
                if self.at(":"):
                    self.next()
                    pairs.append((key, self.parse_binding_target()))
                else:
                    pairs.append((key, ("id_pat", key)))
                if self.at(","):
                    self.next()
            self.eat("}")
            return ("obj_pat", pairs)
        return ("id_pat", self.next().val)

    def parse_function_decl(self):
        self.eat("function")
        name = self.next().val
        params = self.parse_params()
        body = self.parse_block()
        return ("funcdecl", name, params, body)

    def parse_params(self):
        self.eat("(")
        params = []
        while not self.at(")"):
            target = self.parse_binding_target()
            default = None
            if self.at("="):
                self.next()
                default = self.parse_assign()
            params.append((target, default))
            if self.at(","):
                self.next()
        self.eat(")")
        return params

    def parse_class(self):
        self.eat("class")
        name = self.next().val
        self.eat("{")
        methods = {}
        while not self.at("}"):
            if self.peek().val == "async":
                self.next()
            mname = self.next().val
            params = self.parse_params()
            body = self.parse_block()
            methods[mname] = (params, body)
        self.eat("}")
        return ("classdecl", name, methods)

    def parse_switch(self):
        self.eat("switch")
        self.eat("(")
        subject = self.parse_expr()
        self.eat(")")
        self.eat("{")
        cases = []  # (test_expr | None for default, [stmts])
        while not self.at("}"):
            if self.peek().val == "case":
                self.next()
                test = self.parse_expr()
            else:
                self.eat("default")
                test = None
            self.eat(":")
            body = []
            while self.peek().val not in ("case", "default", "}"):
                body.append(self.parse_statement())
            cases.append((test, body))
        self.eat("}")
        return ("switch", subject, cases)

    def parse_try(self):
        self.eat("try")
        block = self.parse_block()
        catch_block = None
        catch_name = None
        fin = None
        if self.peek().val == "catch":
            self.next()
            if self.at("("):
                self.next()
                catch_name = self.next().val
                self.eat(")")
            catch_block = self.parse_block()
        if self.peek().val == "finally":
            self.next()
            fin = self.parse_block()
        return ("try", block, catch_name, catch_block, fin)

    def parse_if(self):
        self.eat("if")
        self.eat("(")
        cond = self.parse_expr()
        self.eat(")")
        then = self.parse_statement()
        other = None
        if self.peek().val == "else":
            self.next()
            other = self.parse_statement()
        return ("if", cond, then, other)

    def parse_for(self):
        self.eat("for")
        self.eat("(")
        # for (const x of y) or classic
        if self.peek().val in ("const", "let", "var") and (
            self.peek(2).val == "of" or self.peek(1).val in ("[", "{")
        ):
            save = self.i
            self.next()
            target = self.parse_binding_target()
            if self.peek().val == "of":
                self.eat("of")
                it = self.parse_expr()
                self.eat(")")
                body = self.parse_statement()
                return ("forof", target, it, body)
            self.i = save  # classic for with decl init
        init = ("empty",)
        if not self.at(";"):
            if self.peek().val in ("const", "let", "var"):
                init = self.parse_decl()
            else:
                init = ("expr", self.parse_expr())
                if self.at(";"):
                    self.next()
        else:
            self.next()
        cond = ("bool", True)
        if not self.at(";"):
            cond = self.parse_expr()
        self.eat(";")
        update = None
        if not self.at(")"):
            update = self.parse_expr()
        self.eat(")")
        body = self.parse_statement()
        return ("for", init, cond, update, body)

    def parse_while(self):
        self.eat("while")
        self.eat("(")
        cond = self.parse_expr()
        self.eat(")")
        body = self.parse_statement()
        return ("while", cond, body)

    # -- expressions -------------------------------------------------------
    def parse_expr(self):
        e = self.parse_assign()
        while self.at(","):
            # comma operator unused in our sources except in for-updates
            self.next()
            e = ("comma", e, self.parse_assign())
        return e

    def parse_assign(self):
        left = self.parse_ternary()
        t = self.peek()
        if t.kind == "punct" and t.val in ("=", "+=", "-=", "*=", "/="):
            self.next()
            right = self.parse_assign()
            return ("assign", t.val, left, right)
        return left

    def parse_ternary(self):
        cond = self.parse_binary(0)
        if self.at("?"):
            self.next()
            a = self.parse_assign()
            self.eat(":")
            b = self.parse_assign()
            return ("ternary", cond, a, b)
        return cond

    def parse_binary(self, min_prec):
        left = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind != "punct" or t.val not in _BINARY_PREC:
                break
            prec = _BINARY_PREC[t.val]
            if prec < min_prec:
                break
            self.next()
            right = self.parse_binary(prec + 1)
            left = ("binop", t.val, left, right)
        return left

    def parse_unary(self):
        t = self.peek()
        if t.kind == "punct" and t.val in ("-", "+", "!", "~"):
            self.next()
            return ("unary", t.val, self.parse_unary())
        if t.kind == "punct" and t.val in ("++", "--"):
            self.next()
            target = self.parse_unary()
            return ("preincr", t.val, target)
        if t.kind == "id" and t.val == "typeof":
            self.next()
            return ("typeof", self.parse_unary())
        if t.kind == "id" and t.val == "delete":
            self.next()
            return ("delete", self.parse_unary())
        if t.kind == "id" and t.val == "await":
            self.next()
            return self.parse_unary()  # synchronous model: await is identity
        if t.kind == "id" and t.val == "new":
            self.next()
            callee = self.parse_primary()
            while self.at("."):
                self.next()
                callee = ("member", callee, self.next().val)
            args = []
            if self.at("("):
                self.next()
                while not self.at(")"):
                    args.append(self.parse_assign())
                    if self.at(","):
                        self.next()
                self.eat(")")
            return ("new", callee, args)
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while True:
            t = self.peek()
            if t.val == "?." and t.kind == "punct":
                self.next()
                if self.at("("):
                    self.next()
                    args = []
                    while not self.at(")"):
                        args.append(self.parse_assign())
                        if self.at(","):
                            self.next()
                    self.eat(")")
                    e = ("optcall", e, args)
                else:
                    e = ("optmember", e, self.next().val)
            elif t.val == "." and t.kind == "punct":
                self.next()
                e = ("member", e, self.next().val)
            elif t.val == "[" and t.kind == "punct":
                self.next()
                idx = self.parse_expr()
                self.eat("]")
                e = ("index", e, idx)
            elif t.val == "(" and t.kind == "punct":
                self.next()
                args = []
                while not self.at(")"):
                    if self.at("..."):
                        raise SyntaxError("spread unsupported")
                    args.append(self.parse_assign())
                    if self.at(","):
                        self.next()
                self.eat(")")
                e = ("call", e, args)
            elif t.val in ("++", "--") and t.kind == "punct":
                self.next()
                e = ("postincr", t.val, e)
            else:
                break
        return e

    def _is_arrow_ahead(self):
        """At '(' — scan for the matching ')' followed by '=>'."""
        depth = 0
        j = self.i
        while j < len(self.toks):
            v = self.toks[j].val
            if v == "(":
                depth += 1
            elif v == ")":
                depth -= 1
                if depth == 0:
                    return self.toks[j + 1].val == "=>"
            j += 1
        return False

    def parse_primary(self):
        t = self.peek()
        if t.kind == "num":
            self.next()
            v = t.val
            return ("num", float(int(v, 16)) if v.startswith("0x") else float(v))
        if t.kind == "str":
            self.next()
            return ("str", t.val)
        if t.kind == "template":
            self.next()
            parts, exprs = t.val
            parsed = [Parser(tokenize(e)).parse_expr() for e in exprs]
            return ("template", parts, parsed)
        if t.kind == "regex":
            self.next()
            return ("regex", t.val[0], t.val[1])
        if t.kind == "id":
            if t.val == "async" and (self.peek(1).val == "(" or self.peek(2).val == "=>"
                                     or self.peek(1).val == "function"):
                self.next()  # drop the async modifier (synchronous model)
                return self.parse_primary()
            if t.val == "import" and self.peek(1).val == "(":
                # dynamic import(): all modules share the global scope
                self.next()
                self.eat("(")
                self.parse_expr()
                self.eat(")")
                return ("dynimport",)
            if t.val == "true":
                self.next()
                return ("bool", True)
            if t.val == "false":
                self.next()
                return ("bool", False)
            if t.val == "null":
                self.next()
                return ("null",)
            if t.val == "undefined":
                self.next()
                return ("undef",)
            if t.val == "function":
                self.next()
                name = None
                if self.peek().kind == "id":
                    name = self.next().val
                params = self.parse_params()
                body = self.parse_block()
                return ("func", name, params, body)
            # arrow with single bare param: x => ...
            if self.peek(1).val == "=>":
                name = self.next().val
                self.eat("=>")
                return self._arrow_body([(("id_pat", name), None)])
            self.next()
            return ("name", t.val)
        if t.val == "(":
            if self._is_arrow_ahead():
                params = self.parse_params()
                self.eat("=>")
                return self._arrow_body(params)
            self.next()
            e = self.parse_expr()
            self.eat(")")
            return e
        if t.val == "[":
            self.next()
            items = []
            while not self.at("]"):
                if self.at("..."):
                    self.next()
                    items.append(("spread", self.parse_assign()))
                else:
                    items.append(self.parse_assign())
                if self.at(","):
                    self.next()
            self.eat("]")
            return ("array", items)
        if t.val == "{":
            self.next()
            pairs = []
            while not self.at("}"):
                k = self.next()
                key = k.val if k.kind in ("id", "str") else str(k.val)
                if self.at(":"):
                    self.next()
                    pairs.append((key, self.parse_assign()))
                elif self.at("("):
                    # method shorthand: { move(ev) { ... } }
                    params = self.parse_params()
                    body = self.parse_block()
                    pairs.append((key, ("func", key, params, body)))
                else:
                    pairs.append((key, ("name", key)))  # shorthand
                if self.at(","):
                    self.next()
            self.eat("}")
            return ("object", pairs)
        raise SyntaxError(f"unexpected token {t!r}")

    def _arrow_body(self, params):
        if self.at("{"):
            return ("func", None, params, self.parse_block())
        return ("func", None, params, ("return", self.parse_assign()))


# ---------------------------------------------------------------------------
# evaluator

class BreakEx(Exception):
    pass


class ContinueEx(Exception):
    pass


class ReturnEx(Exception):
    def __init__(self, value):
        self.value = value


class Env:
    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def get(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise NameError(f"undefined identifier {name}")

    def set(self, name, value):
        e = self
        while e is not None:
            if name in e.vars:
                e.vars[name] = value
                return
            e = e.parent
        raise NameError(f"assignment to undeclared {name}")

    def declare(self, name, value):
        self.vars[name] = value


class JSFunction:
    def __init__(self, name, params, body, env, interp, this_val=None):
        self.name, self.params, self.body, self.env, self.interp = (
            name, params, body, env, interp
        )
        self.this_val = this_val

    def bind_this(self, this_val):
        return JSFunction(self.name, self.params, self.body, self.env,
                          self.interp, this_val)

    def __call__(self, *args):
        local = Env(self.env)
        if self.this_val is not None:
            local.declare("this", self.this_val)
        for k, (target, default) in enumerate(self.params):
            v = args[k] if k < len(args) else UNDEF
            if v is UNDEF and default is not None:
                v = self.interp.eval(default, local)
            self.interp.bind(target, v, local)
        try:
            self.interp.exec(self.body, local)
        except ReturnEx as r:
            return r.value
        return UNDEF


class JSClass:
    def __init__(self, name, methods, env, interp):
        self.name, self.methods, self.env, self.interp = name, methods, env, interp

    def construct(self, args):
        inst = JSInstance(self)
        ctor = self.methods.get("constructor")
        if ctor is not None:
            params, body = ctor
            JSFunction("constructor", params, body, self.env, self.interp,
                       this_val=inst)(*args)
        return inst


class JSInstance(dict):
    """Instance = dict of own properties + method lookup via its class."""

    def __init__(self, cls):
        super().__init__()
        self.cls = cls


class JSMap:
    def __init__(self, entries=None):
        self.d = {}
        if isinstance(entries, list):
            for pair in entries:
                self.set(pair[0], pair[1])

    def _k(self, key):
        # tag by type: Python hashes True == 1.0 == 1, but JS Map keys
        # distinguish true from 1
        if isinstance(key, bool):
            return ("b", key)
        if isinstance(key, (str, float)):
            return (type(key).__name__, key)
        return ("id", id(key))

    def get(self, key):
        return self.d.get(self._k(key), (None, UNDEF))[1]

    def set(self, key, value):
        self.d[self._k(key)] = (key, value)
        return self

    def has(self, key):
        return self._k(key) in self.d

    def delete(self, key):
        return self.d.pop(self._k(key), None) is not None

    def keys(self):
        return [k for k, _v in self.d.values()]

    def values(self):
        return [v for _k, v in self.d.values()]

    def entries(self):
        return [[k, v] for k, v in self.d.values()]

    def __iter__(self):
        return iter([[k, v] for k, v in list(self.d.values())])

    @property
    def size(self):
        return float(len(self.d))


class JSSet:
    def __init__(self, items=None):
        self.m = JSMap()
        if isinstance(items, (list, JSSet)):
            for v in items:
                self.add(v)

    def add(self, v):
        self.m.set(v, True)
        return self

    def has(self, v):
        return self.m.has(v)

    def delete(self, v):
        return self.m.delete(v)

    def __iter__(self):
        return iter(self.m.keys())

    @property
    def size(self):
        return self.m.size


class InterpGap(Exception):
    """An INTERPRETER limitation (unimplemented builtin/method), not a JS
    runtime error: it must escape JS try/catch and fail the test — a real
    browser would have executed the code (review finding: the missing
    Object builtin hid an entire app.js path behind a catch)."""


class JSThrow(Exception):
    def __init__(self, value):
        self.value = value


class JSArrayBuffer:
    """Binary buffer (the HTTP tile Response bodies in api.js)."""

    def __init__(self, data=b""):
        self.data = bytes(data) if not isinstance(data, (int, float)) else bytes(int(data))

    @property
    def byteLength(self):
        return float(len(self.data))


class JSDataView:
    def __init__(self, buf, byte_offset=0.0, byte_length=None):
        self.buf = buf
        self.off = int(byte_offset)

    def _get(self, fmt, size, off, little):
        import struct as _s

        lb = "<" if (little is True or little == 1.0) else ">"
        return _s.unpack_from(lb + fmt, self.buf.data, self.off + int(off))[0]

    def getUint8(self, off, little=False):
        return float(self._get("B", 1, off, True))

    def getUint16(self, off, little=False):
        return float(self._get("H", 2, off, little))

    def getUint32(self, off, little=False):
        return float(self._get("I", 4, off, little))

    def getInt32(self, off, little=False):
        return float(self._get("i", 4, off, little))

    def getFloat32(self, off, little=False):
        return float(self._get("f", 4, off, little))

    def getFloat64(self, off, little=False):
        return float(self._get("d", 8, off, little))

    def getBigUint64(self, off, little=False):
        # model BigInt as a float (tile revisions are far below 2^53)
        return float(self._get("Q", 8, off, little))


def _typed_array(fmt, itemsize):
    import struct as _s

    def ctor(buf, byte_offset=0.0, length=None):
        if isinstance(buf, (int, float)):
            return [0.0] * int(buf)
        off = int(byte_offset)
        data = buf.data
        if length is None:
            count = (len(data) - off) // itemsize
        else:
            count = int(length)
        vals = _s.unpack_from(f"<{count}{fmt}", data, off)
        return [float(v) for v in vals]

    return ctor


def js_truthy(v) -> bool:
    if v is UNDEF or v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return not (v == 0.0 or math.isnan(v))
    if isinstance(v, str):
        return v != ""
    return True


def js_num(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if v is None:
        return 0.0
    if v is UNDEF:
        return math.nan
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0.0
        try:
            return float(s)
        except ValueError:
            return math.nan
    return math.nan


def js_strict_eq(a, b) -> bool:
    if a is UNDEF or b is UNDEF:
        return a is b
    if a is None or b is None:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return False
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def js_number_to_string(x: float) -> str:
    if math.isnan(x):
        return "NaN"
    if x == math.inf:
        return "Infinity"
    if x == -math.inf:
        return "-Infinity"
    if x == int(x) and abs(x) < 1e21:
        return str(int(x))
    s = repr(x)
    if "e" not in s:
        return s
    # JS exponent rules differ from Python repr: positional down to 1e-7
    # ("0.000001", not "1e-06"), no zero-padded exponents ("1e-7"/"1e+21")
    mant, exp = s.split("e")
    e = int(exp)
    if -7 < e < 21:
        from decimal import Decimal as _D

        return format(_D(s), "f")
    neg = mant.startswith("-")
    mant = mant.lstrip("-").rstrip("0").rstrip(".")
    return f"{'-' if neg else ''}{mant}e{'+' if e >= 0 else '-'}{abs(e)}"


def js_to_string(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return js_number_to_string(v)
    if v is None:
        return "null"
    if v is UNDEF:
        return "undefined"
    if isinstance(v, list):
        return ",".join("" if x is None or x is UNDEF else js_to_string(x) for x in v)
    return str(v)


def js_to_fixed(x: float, digits: int) -> str:
    # ECMA-262 21.1.3.3: NaN -> "NaN"; |x| >= 1e21 falls back to ToString;
    # otherwise the SIGN SPLITS OFF FIRST (step 6) and ties on the magnitude
    # pick the larger n — (-2.5).toFixed(0) is "-3" even though
    # Math.round(-2.5) is -2.  Negative dust keeps the sign ("-0.0"); -0
    # itself does not (-0 < 0 is false -> "0.0").
    if math.isnan(x) or abs(x) >= 1e21:
        return js_number_to_string(x)
    sign = "-" if x < 0 else ""
    scaled = Decimal(abs(x)) * (10 ** digits)
    n = int((scaled + Decimal("0.5")).to_integral_value(rounding="ROUND_FLOOR"))
    s = str(n).rjust(digits + 1, "0")
    return f"{sign}{s[:-digits]}.{s[-digits:]}" if digits else f"{sign}{s}"


def js_to_precision(x: float, p: int) -> str:
    """Number.prototype.toPrecision: KEEPS trailing zeros, unlike Python's
    '%g' ((50).toPrecision(3) is '50.0', (0.05).toPrecision(3) is
    '0.0500'); scientific form outside [1e-7, 1e21) exponent rules."""
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "-Infinity" if x < 0 else "Infinity"
    if x == 0:
        return f"{0:.{p - 1}f}" if p > 1 else "0"
    e = math.floor(math.log10(abs(x)))
    # decimal-rounded mantissa can bump the exponent (9.99 -> 10.0)
    from decimal import ROUND_HALF_UP

    d = Decimal(x).scaleb(-e).quantize(
        Decimal(1).scaleb(-(p - 1)), rounding=ROUND_HALF_UP
    )
    if abs(d) >= 10:
        # re-quantize after the bump or the mantissa keeps a surplus digit
        # ((999.95).toPrecision(3) is "1.00e+3", not "1.000e+3")
        d = d.scaleb(-1).quantize(
            Decimal(1).scaleb(-(p - 1)), rounding=ROUND_HALF_UP
        )
        e += 1
    if e < -6 or e >= p:
        mant = str(d)
        return f"{mant}e{'+' if e >= 0 else '-'}{abs(e)}"
    # fixed notation with exactly p significant digits
    frac = p - 1 - e
    v = d.scaleb(e)
    return f"{v:.{max(frac, 0)}f}"


def _js_math_floor(x: float) -> float:
    # ECMA-262 Math.floor: NaN/±inf pass through; Math.floor(-0) is -0
    if not math.isfinite(x):
        return x
    r = float(math.floor(x))
    return -0.0 if r == 0 and math.copysign(1.0, x) < 0 else r


def _js_math_ceil(x: float) -> float:
    # Math.ceil: results that land on zero from below keep the sign
    # (Math.ceil(-0.5) is -0)
    if not math.isfinite(x):
        return x
    r = float(math.ceil(x))
    return -0.0 if r == 0 and (x < 0 or math.copysign(1.0, x) < 0) else r


def _js_math_round(x: float) -> float:
    # Math.round: half toward +inf — but NOT floor(x+0.5): the float add
    # rounds 0.49999999999999994 up to 1.0, while the spec compares the
    # MATHEMATICAL fraction (answer 0).  Negative inputs rounding to zero
    # keep the sign (Math.round(-0.5) is -0).
    if not math.isfinite(x):
        return x
    f = math.floor(x)
    r = float(f + 1 if x - f >= 0.5 else f)
    return -0.0 if r == 0 and (x < 0 or math.copysign(1.0, x) < 0) else r


_MATH = {
    "floor": _js_math_floor,
    "ceil": _js_math_ceil,
    "round": _js_math_round,
    "abs": abs,
    "sqrt": lambda x: math.sqrt(x) if x >= 0 else math.nan,
    "exp": math.exp,
    "log": lambda x: math.log(x) if x > 0 else (-math.inf if x == 0 else math.nan),
    "log2": lambda x: math.log2(x) if x > 0 else (-math.inf if x == 0 else math.nan),
    "log10": lambda x: math.log10(x) if x > 0 else (-math.inf if x == 0 else math.nan),
    "min": lambda *a: min(a) if a and not any(math.isnan(x) for x in a) else (math.nan if a else math.inf),
    "max": lambda *a: max(a) if a and not any(math.isnan(x) for x in a) else (math.nan if a else -math.inf),
    "sign": lambda x: math.nan if math.isnan(x) else (0.0 if x == 0 else math.copysign(1.0, x)),
    "pow": lambda a, b: float(a ** b),
    "PI": math.pi,
    "E": math.e,
    "cos": math.cos,
    "sin": math.sin,
    "tan": math.tan,
    "atan2": math.atan2,
    "atan": math.atan,
    "acos": lambda x: math.acos(x) if -1 <= x <= 1 else math.nan,
    "asin": lambda x: math.asin(x) if -1 <= x <= 1 else math.nan,
    "hypot": math.hypot,
    "trunc": lambda x: float(math.trunc(x)),
    "cbrt": lambda x: math.copysign(abs(x) ** (1 / 3), x),
    "random": lambda: 0.5,
}


class Interp:
    def __init__(self):
        self.global_env = Env()
        g = self.global_env
        g.declare("Infinity", math.inf)
        g.declare("NaN", math.nan)
        g.declare("Math", ("__math__",))
        g.declare("Number", ("__number__",))
        g.declare("String", ("__string_ctor__",))
        g.declare("isFinite", lambda v: math.isfinite(js_num(v)))
        g.declare("isNaN", lambda v: math.isnan(js_num(v)))

        def _parse_float(v):
            s = js_to_string(v).strip()
            m = re.match(r"([+-]?)Infinity", s)
            if m:
                return -math.inf if m.group(1) == "-" else math.inf
            m = re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s)
            return float(m.group()) if m else math.nan

        g.declare("parseFloat", _parse_float)
        g.declare("parseInt", lambda v, base=10.0: (
            float(int(js_to_string(v).strip() or "x", int(base))
                  ) if (js_to_string(v).strip().lstrip("+-").isdigit()) else math.nan
        ))
        g.declare("Symbol", lambda desc=UNDEF: ("__symbol__", object()))
        g.declare("Error", ("__ctor__", lambda msg=UNDEF: {
            "name": "Error", "message": msg, "stack": "",
        }))
        g.declare("TypeError", ("__ctor__", lambda msg=UNDEF: {
            "name": "TypeError", "message": msg, "stack": "",
        }))
        g.declare("Map", ("__ctor__", JSMap))
        g.declare("Set", ("__ctor__", JSSet))
        g.declare("WeakMap", ("__ctor__", JSMap))
        g.declare("DataView", ("__ctor__", JSDataView))
        g.declare("ArrayBuffer", ("__ctor__", JSArrayBuffer))
        g.declare("Float32Array", ("__ctor__", _typed_array("f", 4)))
        g.declare("Uint8Array", ("__ctor__", _typed_array("B", 1)))
        g.declare("Uint8ClampedArray", ("__ctor__", _typed_array("B", 1)))
        g.declare("Uint16Array", ("__ctor__", _typed_array("H", 2)))
        g.declare("Uint32Array", ("__ctor__", _typed_array("I", 4)))
        g.declare("performance", {"now": lambda: 0.0})
        g.declare("console", {
            "log": lambda *a: UNDEF, "warn": lambda *a: UNDEF,
            "error": lambda *a: UNDEF,
        })

        def _obj_pairs(o):
            if isinstance(o, JSMap):
                return [[k, v] for k, v in o.items()]
            if isinstance(o, dict):
                return [[k, v] for k, v in o.items()]
            if isinstance(o, list):
                return [[str(i) for i in (idx,)][0:1] + [v]
                        for idx, v in enumerate(o)]
            return []

        def _obj_assign(target=UNDEF, *sources):
            for s in sources:
                if isinstance(s, dict):
                    target.update(s)
            return target

        def _json_stringify(v=UNDEF, _r=UNDEF, _s=UNDEF):
            import json as _json

            def conv(x):
                if x is UNDEF or callable(x):
                    return None
                if isinstance(x, float):
                    return int(x) if x == int(x) and math.isfinite(x) else x
                if isinstance(x, dict):
                    return {k: conv(val) for k, val in x.items()
                            if val is not UNDEF and not callable(val)}
                if isinstance(x, list):
                    return [conv(i) for i in x]
                return x

            if v is UNDEF:
                return UNDEF
            return _json.dumps(conv(v), separators=(",", ":"))

        def _json_parse(s=UNDEF):
            import json as _json

            def conv(x):
                if isinstance(x, bool):
                    return x
                if isinstance(x, (int, float)):
                    return float(x)
                if isinstance(x, dict):
                    return {k: conv(v) for k, v in x.items()}
                if isinstance(x, list):
                    return [conv(i) for i in x]
                return x

            return conv(_json.loads(js_to_string(s)))

        g.declare("JSON", {
            "stringify": _json_stringify,
            "parse": _json_parse,
        })
        g.declare("Object", {
            "entries": lambda o=UNDEF: _obj_pairs(o),
            "keys": lambda o=UNDEF: [p[0] for p in _obj_pairs(o)],
            "values": lambda o=UNDEF: [p[1] for p in _obj_pairs(o)],
            "assign": _obj_assign,
            "fromEntries": lambda pairs=UNDEF: {p[0]: p[1] for p in pairs},
            "freeze": lambda o=UNDEF: o,
        })

    def load(self, source: str):
        """Parse + execute top-level declarations of a module source.
        Statements execute directly in the global env (the generic block
        path would scope module bindings into a discarded child env)."""
        self.load_ast(Parser(tokenize(source)).parse_program())

    def load_ast(self, ast):
        """Execute a pre-parsed program (ASTs are pure data — execution
        never mutates nodes — so one parse can serve many interpreters;
        the mutation battery reuses pristine-module parses this way)."""
        for stmt in ast[1]:
            self.exec(stmt, self.global_env)

    # -- statements --------------------------------------------------------
    def exec(self, node, env):
        kind = node[0]
        if kind == "block":
            block_env = Env(env)
            for s in node[1]:
                self.exec(s, block_env)
        elif kind == "decl":
            for target, init in node[1]:
                self.bind(target, self.eval(init, env), env)
        elif kind == "funcdecl":
            env.declare(node[1], JSFunction(node[1], node[2], node[3], env, self))
        elif kind == "classdecl":
            env.declare(node[1], JSClass(node[1], node[2], env, self))
        elif kind == "nsimport":
            # snapshot the concatenated-module globals at import time: a
            # later same-named declaration in the IMPORTING file must not
            # shadow the namespace member (browser module scopes are
            # separate — a live view made app.js's zoomFreqRangeAt wrapper
            # call itself through L.*).  Load files in dependency order.
            snap = Env()
            snap.vars = dict(self.global_env.vars)
            env.declare(node[1], ("__ns__", snap))
        elif kind == "throw":
            raise JSThrow(self.eval(node[1], env))
        elif kind == "switch":
            subject = self.eval(node[1], env)
            sw_env = Env(env)
            # JS matches cases FIRST; default only runs (with fallthrough)
            # when no case matched, even if it appears before a matching
            # case in source order
            start = None
            for idx, (test, _body) in enumerate(node[2]):
                if test is not None and js_strict_eq(
                    subject, self.eval(test, sw_env)
                ):
                    start = idx
                    break
            if start is None:
                for idx, (test, _body) in enumerate(node[2]):
                    if test is None:
                        start = idx
                        break
            try:
                if start is not None:
                    for _test, body in node[2][start:]:
                        for s in body:
                            self.exec(s, sw_env)
            except BreakEx:
                pass
        elif kind == "try":
            _blk, catch_name, catch_block, fin = node[1], node[2], node[3], node[4]
            try:
                try:
                    self.exec(_blk, env)
                except (JSThrow, TypeError, AttributeError, NameError,
                        KeyError, IndexError) as exc:
                    if catch_block is None:
                        raise
                    cenv = Env(env)
                    if catch_name:
                        val = exc.value if isinstance(exc, JSThrow) else str(exc)
                        cenv.declare(catch_name, val)
                    self.exec(catch_block, cenv)
            finally:
                if fin is not None:
                    self.exec(fin, env)
        elif kind == "if":
            if js_truthy(self.eval(node[1], env)):
                self.exec(node[2], env)
            elif node[3] is not None:
                self.exec(node[3], env)
        elif kind == "for":
            loop_env = Env(env)
            self.exec(node[1], loop_env)
            while js_truthy(self.eval(node[2], loop_env)):
                # per-iteration let bindings (JS spec CopyDeclarativeBindings):
                # closures created in the body capture THIS iteration's
                # counter value, not the final one
                iter_env = Env(env)
                iter_env.vars = dict(loop_env.vars)
                try:
                    self.exec(node[4], iter_env)
                except BreakEx:
                    break
                except ContinueEx:
                    pass
                # body mutations of the loop vars carry into the next copy
                for k in loop_env.vars:
                    loop_env.vars[k] = iter_env.vars[k]
                if node[3] is not None:
                    self.eval(node[3], loop_env)
        elif kind == "forof":
            it = self.eval(node[2], env)
            items = list(it) if not isinstance(it, str) else list(it)
            for item in items:
                loop_env = Env(env)
                target = node[1]
                if isinstance(target, str):
                    loop_env.declare(target, item)
                else:
                    self.bind(target, item, loop_env)
                try:
                    self.exec(node[3], loop_env)
                except BreakEx:
                    break
                except ContinueEx:
                    continue
        elif kind == "while":
            while js_truthy(self.eval(node[1], env)):
                try:
                    self.exec(node[2], env)
                except BreakEx:
                    break
                except ContinueEx:
                    continue
        elif kind == "return":
            raise ReturnEx(self.eval(node[1], env))
        elif kind == "break":
            raise BreakEx()
        elif kind == "continue":
            raise ContinueEx()
        elif kind == "expr":
            self.eval(node[1], env)
        elif kind == "empty":
            pass
        else:
            raise RuntimeError(f"unknown stmt {kind}")

    def bind(self, target, value, env):
        kind = target[0]
        if kind == "id_pat":
            env.declare(target[1], value)
        elif kind == "arr_pat":
            for i, sub in enumerate(target[1]):
                v = value[i] if isinstance(value, list) and i < len(value) else UNDEF
                self.bind(sub, v, env)
        elif kind == "obj_pat":
            for key, sub in target[1]:
                if isinstance(value, dict):
                    v = value.get(key, UNDEF)
                elif isinstance(value, tuple) and value and value[0] == "__ns__":
                    v = value[1].get(key)
                else:
                    v = UNDEF
                self.bind(sub, v, env)
        else:
            raise RuntimeError(f"bad binding {target}")

    # -- expressions -------------------------------------------------------
    def eval(self, node, env):
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "str":
            return node[1]
        if kind == "bool":
            return node[1]
        if kind == "null":
            return None
        if kind == "undef":
            return UNDEF
        if kind == "name":
            return env.get(node[1])
        if kind == "template":
            parts, exprs = node[1], node[2]
            out = [parts[0]]
            for p, e in zip(parts[1:], exprs):
                out.append(js_to_string(self.eval(e, env)))
                out.append(p)
            return "".join(out)
        if kind == "dynimport":
            return ("__ns__", self.global_env)
        if kind == "regex":
            pattern, flags = node[1], node[2]
            py_flags = re.I if "i" in flags else 0
            rx = re.compile(pattern, py_flags)
            return {
                "test": lambda s: rx.search(js_to_string(s)) is not None,
                "source": pattern,
            }
        if kind == "array":
            out = []
            for e in node[1]:
                if e[0] == "spread":
                    out.extend(list(self.eval(e[1], env)))
                else:
                    out.append(self.eval(e, env))
            return out
        if kind == "new":
            callee = self.eval(node[1], env)
            args = [self.eval(a, env) for a in node[2]]
            if isinstance(callee, JSClass):
                return callee.construct(args)
            if isinstance(callee, tuple) and callee[0] == "__ctor__":
                return callee[1](*args)
            raise TypeError(f"not constructible: {callee!r}")
        if kind == "object":
            return {k: self.eval(v, env) for k, v in node[1]}
        if kind == "func":
            return JSFunction(node[1], node[2], node[3], env, self)
        if kind == "ternary":
            return (
                self.eval(node[2], env)
                if js_truthy(self.eval(node[1], env))
                else self.eval(node[3], env)
            )
        if kind == "comma":
            self.eval(node[1], env)
            return self.eval(node[2], env)
        if kind == "unary":
            op = node[1]
            v = self.eval(node[2], env)
            if op == "-":
                return -js_num(v)
            if op == "+":
                return js_num(v)
            if op == "!":
                return not js_truthy(v)
            if op == "~":
                return float(~int(js_num(v)))
        if kind == "delete":
            target = node[1]
            if target[0] == "member":
                obj = self.eval(target[1], env)
                if isinstance(obj, dict):
                    obj.pop(target[2], None)
                return True
            if target[0] == "index":
                obj = self.eval(target[1], env)
                idx = self.eval(target[2], env)
                if isinstance(obj, dict):
                    obj.pop(idx if isinstance(idx, str) else js_to_string(idx),
                            None)
                return True
            return True
        if kind == "typeof":
            try:
                v = self.eval(node[1], env)
            except NameError:
                return "undefined"
            if v is UNDEF:
                return "undefined"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, float):
                return "number"
            if isinstance(v, str):
                return "string"
            if callable(v):
                return "function"
            return "object"
        if kind in ("preincr", "postincr"):
            old = js_num(self.eval(node[2], env))
            new = old + (1.0 if node[1] == "++" else -1.0)
            self._assign_to(node[2], new, env)
            return new if kind == "preincr" else old
        if kind == "binop":
            return self._binop(node[1], node[2], node[3], env)
        if kind == "assign":
            op = node[1]
            if op == "=":
                v = self.eval(node[3], env)
            else:
                cur = self.eval(node[2], env)
                rhs = self.eval(node[3], env)
                if op == "+=" and (isinstance(cur, str) or isinstance(rhs, str)):
                    v = js_to_string(cur) + js_to_string(rhs)
                else:
                    a, b = js_num(cur), js_num(rhs)
                    v = {"+=": a + b, "-=": a - b, "*=": a * b,
                         "/=": self._div(a, b)}[op]
            self._assign_to(node[2], v, env)
            return v
        if kind == "member":
            return self._member(self.eval(node[1], env), node[2])
        if kind == "optmember":
            base = self.eval(node[1], env)
            if base is None or base is UNDEF:
                return UNDEF
            return self._member(base, node[2])
        if kind == "optcall":
            fn = self.eval(node[1], env)
            if fn is None or fn is UNDEF:
                return UNDEF
            args = [self.eval(a, env) for a in node[2]]
            if isinstance(fn, tuple) and fn and fn[0] == "__method__":
                return self._call_method(fn[1], fn[2], args)
            return fn(*args)
        if kind == "index":
            obj = self.eval(node[1], env)
            idx = self.eval(node[2], env)
            if isinstance(obj, list):
                i = int(idx)
                return obj[i] if 0 <= i < len(obj) else UNDEF
            if isinstance(obj, dict):
                return obj.get(idx if isinstance(idx, str) else js_to_string(idx), UNDEF)
            if isinstance(obj, str):
                i = int(idx)
                return obj[i] if 0 <= i < len(obj) else UNDEF
            raise TypeError(f"cannot index {obj!r}")
        if kind == "call":
            callee = node[1]
            args = [self.eval(a, env) for a in node[2]]
            if callee[0] == "member":
                obj = self.eval(callee[1], env)
                return self._call_method(obj, callee[2], args)
            if callee[0] == "optmember":
                obj = self.eval(callee[1], env)
                if obj is None or obj is UNDEF:
                    return UNDEF
                return self._call_method(obj, callee[2], args)
            if callee[0] == "index":
                obj = self.eval(callee[1], env)
                meth = self.eval(callee[2], env)
                return self._call_method(obj, meth, args)
            fn = self.eval(callee, env)
            if fn == ("__string_ctor__",):
                return js_to_string(args[0]) if args else ""
            if fn == ("__number__",):
                return js_num(args[0]) if args else 0.0
            if callable(fn):
                return fn(*args)
            raise TypeError(f"not callable: {fn!r} (callee {callee!r})")
        raise RuntimeError(f"unknown expr {kind}")

    @staticmethod
    def _div(a, b):
        if b == 0:
            if a == 0 or math.isnan(a):
                return math.nan
            return math.copysign(math.inf, a) * math.copysign(1.0, b)
        return a / b

    def _binop(self, op, ln, rn, env):
        if op == "&&":
            left = self.eval(ln, env)
            return self.eval(rn, env) if js_truthy(left) else left
        if op == "||":
            left = self.eval(ln, env)
            return left if js_truthy(left) else self.eval(rn, env)
        if op == "??":
            left = self.eval(ln, env)
            return self.eval(rn, env) if left is None or left is UNDEF else left
        a = self.eval(ln, env)
        b = self.eval(rn, env)
        if op == "===":
            return js_strict_eq(a, b)
        if op == "!==":
            return not js_strict_eq(a, b)
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return js_to_string(a) + js_to_string(b)
            return js_num(a) + js_num(b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
            x, y = js_num(a), js_num(b)
            if math.isnan(x) or math.isnan(y):
                return False
            return {"<": x < y, ">": x > y, "<=": x <= y, ">=": x >= y}[op]
        x, y = js_num(a), js_num(b)
        if op == "-":
            return x - y
        if op == "*":
            return x * y
        if op == "/":
            return self._div(x, y)
        if op == "%":
            if y == 0 or math.isnan(x) or math.isnan(y) or math.isinf(x):
                return math.nan
            if math.isinf(y):
                return x
            return math.fmod(x, y)
        if op == "**":
            return float(x ** y)
        if op == "<<":
            return float(_to_int32(x) << (int(y) & 31))
        if op == ">>":
            return float(_to_int32(x) >> (int(y) & 31))
        if op == ">>>":
            return float((_to_int32(x) & 0xFFFFFFFF) >> (int(y) & 31))
        if op == "&":
            return float(_to_int32(_to_int32(x) & _to_int32(y)))
        if op == "|":
            return float(_to_int32(_to_int32(x) | _to_int32(y)))
        if op == "^":
            return float(_to_int32(_to_int32(x) ^ _to_int32(y)))
        raise RuntimeError(f"unknown op {op}")

    def _assign_to(self, target, value, env):
        if target[0] == "name":
            env.set(target[1], value)
        elif target[0] == "member":
            obj = self.eval(target[1], env)
            obj[target[2]] = value
        elif target[0] == "index":
            obj = self.eval(target[1], env)
            idx = self.eval(target[2], env)
            if isinstance(obj, list):
                obj[int(idx)] = value
            else:
                obj[idx if isinstance(idx, str) else js_to_string(idx)] = value
        else:
            raise RuntimeError(f"bad assignment target {target}")

    def _member(self, obj, name):
        if isinstance(obj, tuple) and obj and obj[0] == "__ns__":
            return obj[1].get(name)
        if isinstance(obj, JSInstance):
            if name in obj:
                return obj[name]
            if name in obj.cls.methods:
                params, body = obj.cls.methods[name]
                return JSFunction(name, params, body, obj.cls.env,
                                  obj.cls.interp, this_val=obj)
            return UNDEF
        if isinstance(obj, JSDataView):
            return ("__method__", obj, name)
        if isinstance(obj, JSArrayBuffer):
            if name == "byteLength":
                return obj.byteLength
            return ("__method__", obj, name)
        if isinstance(obj, JSMap):
            if name == "size":
                return obj.size
            return ("__method__", obj, name)
        if isinstance(obj, JSSet):
            if name == "size":
                return obj.size
            return ("__method__", obj, name)
        if obj == ("__math__",):
            return _MATH[name]
        if obj == ("__number__",):
            if name == "isFinite":
                return lambda v: isinstance(v, float) and math.isfinite(v)
            if name == "isNaN":
                return lambda v: isinstance(v, float) and math.isnan(v)
            if name == "POSITIVE_INFINITY":
                return math.inf
            raise InterpGap(f"Number.{name}")
        if isinstance(obj, dict):
            return obj.get(name, UNDEF)
        if isinstance(obj, (list, str)) and name == "length":
            return float(len(obj))
        if isinstance(obj, (list, str, float)):
            known = {
                float: {"toFixed"},
                str: {"padStart", "padEnd", "slice", "includes", "startsWith",
                      "endsWith", "indexOf", "split", "repeat", "charCodeAt",
                      "toLowerCase", "toUpperCase", "trim"},
                list: {"indexOf", "includes", "slice", "concat", "filter",
                       "map", "every", "some", "reverse", "push", "join",
                       "reduce", "pop", "shift", "find", "findIndex", "flat",
                       "forEach", "fill", "set", "subarray", "unshift"},
            }[type(obj) if type(obj) in (float, str) else list]
            if name in known:
                return ("__method__", obj, name)
            return UNDEF  # unknown property on a primitive (JS: undefined)
        if obj is None or obj is UNDEF:
            raise TypeError(f"cannot read {name!r} of {obj!r}")
        raise InterpGap(f"{type(obj)}.{name}")

    def _call_method(self, obj, name, args):
        if isinstance(name, tuple) and name[0] == "__method__":
            _tag, obj, name = name
        # synchronous promise model: every value is a resolved promise
        if name == "then" and not (isinstance(obj, dict) and "then" in obj):
            out = args[0](obj) if args and callable(args[0]) else obj
            return obj if out is UNDEF and False else out
        if name == "catch" and not (isinstance(obj, dict) and "catch" in obj):
            return obj  # errors propagate as exceptions in this model
        if name == "finally" and not (isinstance(obj, dict) and "finally" in obj):
            if args and callable(args[0]):
                args[0]()
            return obj
        if isinstance(obj, tuple) and obj and obj[0] == "__ns__":
            fn = obj[1].get(name)
            if fn == ("__string_ctor__",):
                return js_to_string(args[0]) if args else ""
            if callable(fn):
                return fn(*args)
            raise TypeError(f"namespace member {name} not callable")
        if isinstance(obj, JSInstance):
            fn = self._member(obj, name)
            if callable(fn):
                return fn(*args)
            raise TypeError(f"{obj.cls.name}.{name} not callable")
        if isinstance(obj, (JSMap, JSSet, JSDataView, JSArrayBuffer)):
            m = getattr(obj, name, None)
            if m is None:
                raise InterpGap(f"{type(obj).__name__}.{name}")
            out = m(*args)
            return out
        if obj == ("__math__",):
            return _MATH[name](*[js_num(a) for a in args])
        if obj == ("__number__",):
            return self._member(obj, name)(*args)
        if isinstance(obj, float):
            if name == "toFixed":
                return js_to_fixed(obj, int(args[0]) if args else 0)
            if name == "toPrecision":
                if not args:
                    return js_number_to_string(obj)
                return js_to_precision(obj, int(args[0]))
            if name == "toString":
                return js_number_to_string(obj)
            raise InterpGap(f"number.{name}")
        if isinstance(obj, str):
            if name == "padStart":
                width = int(args[0])
                fill = args[1] if len(args) > 1 else " "
                return obj.rjust(width, fill)
            if name == "padEnd":
                return obj.ljust(int(args[0]), args[1] if len(args) > 1 else " ")
            if name == "slice":
                return _js_slice(obj, args)
            if name == "includes":
                return args[0] in obj
            if name == "startsWith":
                return obj.startswith(args[0])
            if name == "endsWith":
                return obj.endswith(args[0])
            if name == "indexOf":
                return float(obj.find(args[0]))
            if name == "toFixed":
                raise InterpGap("string.toFixed")
            if name == "split":
                return obj.split(args[0])
            if name == "repeat":
                return obj * int(args[0])
            if name == "charCodeAt":
                return float(ord(obj[int(args[0]) if args else 0]))
            if name == "toLowerCase":
                return obj.lower()
            if name == "toUpperCase":
                return obj.upper()
            if name == "trim":
                return obj.strip()
            raise InterpGap(f"string.{name}")
        if isinstance(obj, list):
            if name == "indexOf":
                for i, x in enumerate(obj):
                    if js_strict_eq(x, args[0]):
                        return float(i)
                return -1.0
            if name == "includes":
                return any(js_strict_eq(x, args[0]) for x in obj)
            if name == "slice":
                return _js_slice(obj, args)
            if name == "concat":
                out = list(obj)
                for a in args:
                    if isinstance(a, list):
                        out.extend(a)
                    else:
                        out.append(a)
                return out
            if name == "filter":
                return [x for i, x in enumerate(obj) if js_truthy(args[0](x, float(i)))]
            if name == "map":
                return [args[0](x, float(i)) for i, x in enumerate(obj)]
            if name == "every":
                return all(js_truthy(args[0](x, float(i))) for i, x in enumerate(obj))
            if name == "some":
                return any(js_truthy(args[0](x, float(i))) for i, x in enumerate(obj))
            if name == "reverse":
                obj.reverse()
                return obj
            if name == "push":
                obj.extend(args)
                return float(len(obj))
            if name == "join":
                # ECMA-262 Array.prototype.join: null/undefined elements
                # render as the EMPTY string, not "null"/"undefined"
                sep = args[0] if args else ","
                return sep.join(
                    "" if x is None or x is UNDEF else js_to_string(x) for x in obj
                )
            if name == "reduce":
                acc = args[1]
                for i, x in enumerate(obj):
                    acc = args[0](acc, x, float(i))
                return acc
            if name == "set":  # TypedArray.prototype.set(src, offset)
                src = args[0] if args else []
                off = int(args[1]) if len(args) > 1 else 0
                for i, v in enumerate(src):
                    obj[off + i] = v
                return UNDEF
            if name == "subarray":
                return _js_slice(obj, args)
            if name == "fill":
                val = args[0] if args else UNDEF
                for i in range(len(obj)):
                    obj[i] = val
                return obj
            if name == "pop":
                return obj.pop() if obj else UNDEF
            if name == "shift":
                return obj.pop(0) if obj else UNDEF
            if name == "unshift":
                for a in reversed(args):
                    obj.insert(0, a)
                return float(len(obj))
            if name == "find":
                for i, x in enumerate(obj):
                    if js_truthy(args[0](x, float(i))):
                        return x
                return UNDEF
            if name == "findIndex":
                for i, x in enumerate(obj):
                    if js_truthy(args[0](x, float(i))):
                        return float(i)
                return -1.0
            if name == "flat":
                out = []
                for x in obj:
                    if isinstance(x, list):
                        out.extend(x)
                    else:
                        out.append(x)
                return out
            if name == "forEach":
                for i, x in enumerate(obj):
                    args[0](x, float(i))
                return UNDEF
            if name == "sort":
                raise InterpGap("array.sort unsupported")
            raise InterpGap(f"array.{name}")
        if isinstance(obj, dict):
            fn = obj.get(name, UNDEF)
            if callable(fn):
                return fn(*args)
            raise TypeError(f"object member {name} not callable")
        raise TypeError(f"cannot call {name} on {obj!r}")


def _to_int32(x: float) -> int:
    if math.isnan(x) or math.isinf(x):
        return 0
    n = int(x) & 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def _js_slice(seq, args):
    n = len(seq)

    def norm(v, default):
        if v is UNDEF or v is None:
            return default
        i = int(v)
        return max(n + i, 0) if i < 0 else min(i, n)

    start = norm(args[0] if args else UNDEF, 0)
    end = norm(args[1] if len(args) > 1 else UNDEF, n)
    out = seq[start:end] if start < end else seq[:0]
    return list(out) if isinstance(seq, list) else out


def load_viewer_logic():
    """Interpreter with every PURE viewer module loaded (freqscale, caches,
    axes, viewport, applogic — app.js/overview.js touch the DOM at module
    top level and stay twin-only)."""
    import pathlib

    js_dir = (
        pathlib.Path(__file__).resolve().parent.parent
        / "thesia_tpu" / "viewer" / "js"
    )
    interp = Interp()
    for name in ("api.js", "freqscale.js", "caches.js", "axes.js",
                 "viewport.js", "applogic.js"):
        interp.load((js_dir / name).read_text())
    return interp
