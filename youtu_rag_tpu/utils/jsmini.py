"""Restricted-JS interpreter: executes the SPA's pure view transforms in tests.

The image has no browser and no node (re-verified each round), so the SPA's
data→display logic was previously untestable at runtime — a broken render
function in ``api/static/views/*.js`` passed the static DOM-contract tests.
This module closes that gap the hermetic way: the views' pure transforms
live in ``api/static/views/transforms.js`` (no DOM, no fetch, no imports),
the browser imports them as a normal ES module, and pytest executes THE SAME
FILE here and asserts golden render trees.

Reference counterpart: the runtime verification ``frontend/rag_webui``'s
16.6k-LoC JS gets from humans clicking it; here it is mechanized.

Supported subset (everything transforms.js is allowed to use):
  - ``export function`` / ``export const`` modules (imports are rejected —
    transforms must stay dependency-free so both runtimes agree);
  - const/let, if/else, while, classic for, for-of, break/continue/return,
    throw / try-catch-finally;
  - arrow + function expressions with closures, default params, rest args,
    object/array destructuring (params and declarations);
  - template literals, regex literals (translated to Python ``re``),
    spread in calls/arrays, optional chaining, ``??``/``&&``/``||``,
    ternary, compound assignment, ++/--;
  - String/Array/Object/Math/JSON/Number built-ins (the methods the views
    use: map/filter/reduce/sort/join/slice/splice/replace/match/split/…).

Deliberately absent: classes, async/await, generators, ``this``-ful OO,
Date (transforms take timestamps as data), DOM/fetch/localStorage — absence
is the enforcement mechanism for purity.
"""

from __future__ import annotations

import json as _json
import math as _math
import re as _re

# --------------------------------------------------------------------- values


class JSUndefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = JSUndefined()


class JSArray(list):
    """JS array: a list that can also carry expando properties (.index on
    match results)."""

    def __init__(self, *a):
        super().__init__(*a)
        self.props = {}


class JSObject(dict):
    pass


class JSFunction:
    def __init__(self, name, params, body, env, is_expr_body=False):
        self.name = name or "anonymous"
        self.params = params  # list of (pattern, default, is_rest)
        self.body = body
        self.env = env
        self.is_expr_body = is_expr_body

    def __repr__(self):
        return f"function {self.name}"


class JSRegExp:
    def __init__(self, source: str, flags: str):
        self.source = source
        self.flags = flags
        py_flags = 0
        if "i" in flags:
            py_flags |= _re.IGNORECASE
        if "m" in flags:
            py_flags |= _re.MULTILINE
        if "s" in flags:
            py_flags |= _re.DOTALL
        self.re = _re.compile(_js_regex_to_py(source), py_flags)
        self.global_ = "g" in flags
        self.last_index = 0

    def __repr__(self):
        return f"/{self.source}/{self.flags}"


def _js_regex_to_py(src: str) -> str:
    """JS regex source → Python re source. The views' patterns are already
    in the shared subset; only ``$`` semantics and escapes line up 1:1.
    Kept as a hook for future divergences."""
    return src


class JSThrow(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class JSError(Exception):
    """Tokenizer/parser/runtime error in the interpreted source."""


# ------------------------------------------------------------------ tokenizer

_KEYWORDS = {
    "const", "let", "var", "function", "return", "if", "else", "for", "of",
    "in", "while", "break", "continue", "throw", "try", "catch", "finally",
    "new", "typeof", "delete", "true", "false", "null", "undefined",
    "export", "import", "class", "async", "await", "this", "void", "do",
    "switch", "case", "default", "instanceof",
}

_PUNCT = [
    "...", "=>", "===", "!==", "==", "!=", "<=", ">=", "&&=", "||=", "??=",
    "&&", "||", "??", "?.", "++", "--", "+=", "-=", "*=", "/=", "%=", "**",
    "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*", "/",
    "%", "=", "!", "?", ":", ".", "&", "|", "^", "~",
]


class Tok:
    __slots__ = ("kind", "value", "pos", "line")

    def __init__(self, kind, value, pos, line):
        self.kind = kind
        self.value = value
        self.pos = pos
        self.line = line

    def __repr__(self):
        return f"{self.kind}:{self.value!r}"


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n, line = 0, len(src), 1

    def prev_allows_regex() -> bool:
        for t in reversed(toks):
            if t.kind == "punct":
                return t.value not in (")", "]", "}")
            if t.kind == "keyword":
                return t.value not in ("this", "true", "false", "null", "undefined")
            return t.kind not in ("num", "str", "name", "regex", "template")
        return True

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i)
            if j < 0:
                raise JSError(f"unterminated comment at line {line}")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c in "'\"":
            j = i + 1
            buf = []
            while j < n and src[j] != c:
                if src[j] == "\\":
                    buf.append(_unescape(src[j : j + 6]))
                    j += 2 if src[j + 1] not in "xu" else (4 if src[j + 1] == "x" else 6)
                else:
                    if src[j] == "\n":
                        raise JSError(f"unterminated string at line {line}")
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise JSError(f"unterminated string at line {line}")
            toks.append(Tok("str", "".join(buf), i, line))
            i = j + 1
            continue
        if c == "`":
            parts, j, buf = [], i + 1, []
            while j < n and src[j] != "`":
                if src[j] == "\\":
                    buf.append(_unescape(src[j : j + 6]))
                    j += 2 if src[j + 1] not in "xu" else (4 if src[j + 1] == "x" else 6)
                elif src.startswith("${", j):
                    parts.append(("str", "".join(buf)))
                    buf = []
                    depth, k = 1, j + 2
                    while k < n and depth:
                        if src[k] == "{":
                            depth += 1
                        elif src[k] == "}":
                            depth -= 1
                        k += 1
                    if depth:
                        raise JSError(f"unterminated template expr at line {line}")
                    parts.append(("expr", src[j + 2 : k - 1]))
                    j = k
                else:
                    if src[j] == "\n":
                        line += 1
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise JSError(f"unterminated template at line {line}")
            parts.append(("str", "".join(buf)))
            toks.append(Tok("template", parts, i, line))
            i = j + 1
            continue
        if c == "/" and prev_allows_regex():
            j, in_class = i + 1, False
            while j < n:
                ch = src[j]
                if ch == "\\":
                    j += 2
                    continue
                if ch == "\n":
                    raise JSError(f"unterminated regex at line {line}")
                if ch == "[":
                    in_class = True
                elif ch == "]":
                    in_class = False
                elif ch == "/" and not in_class:
                    break
                j += 1
            if j >= n:
                raise JSError(f"unterminated regex at line {line}")
            body = src[i + 1 : j]
            k = j + 1
            while k < n and src[k].isalpha():
                k += 1
            toks.append(Tok("regex", (body, src[j + 1 : k]), i, line))
            i = k
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            m = _re.match(r"0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?", src[i:])
            text = m.group(0)
            if text.startswith(("0x", "0X")):
                val = int(text, 16)
            elif "." in text or "e" in text or "E" in text:
                val = float(text)
            else:
                val = int(text)
            toks.append(Tok("num", val, i, line))
            i += len(text)
            continue
        if c.isalpha() or c in "_$":
            m = _re.match(r"[A-Za-z_$][A-Za-z0-9_$]*", src[i:])
            w = m.group(0)
            toks.append(Tok("keyword" if w in _KEYWORDS else "name", w, i, line))
            i += len(w)
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(Tok("punct", p, i, line))
                i += len(p)
                break
        else:
            raise JSError(f"unexpected char {c!r} at line {line}")
    toks.append(Tok("eof", None, n, line))
    return toks


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "v": "\v",
            "0": "\0", "\\": "\\", "'": "'", '"': '"', "`": "`", "$": "$",
            "\n": ""}


def _unescape(chunk: str) -> str:
    e = chunk[1]
    if e == "x":
        return chr(int(chunk[2:4], 16))
    if e == "u":
        return chr(int(chunk[2:6], 16))
    return _ESCAPES.get(e, e)


# -------------------------------------------------------------------- parser


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    # -- token helpers
    def peek(self, k=0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, kind, value=None) -> bool:
        t = self.peek()
        return t.kind == kind and (value is None or t.value == value)

    def eat(self, kind, value=None):
        if not self.at(kind, value):
            t = self.peek()
            raise JSError(f"expected {value or kind}, got {t.kind}:{t.value!r} (line {t.line})")
        return self.next()

    def opt(self, kind, value=None) -> bool:
        if self.at(kind, value):
            self.next()
            return True
        return False

    # -- module
    def parse_module(self) -> list:
        stmts = []
        while not self.at("eof"):
            if self.at("keyword", "import"):
                raise JSError("imports are not allowed in transforms modules "
                              "(keep transforms dependency-free)")
            stmts.append(self.statement())
        return stmts

    # -- statements
    def statement(self):
        t = self.peek()
        if t.kind == "keyword":
            v = t.value
            if v == "export":
                self.next()
                inner = self.statement()
                if inner[0] not in ("var", "fndecl"):
                    raise JSError("only `export function`/`export const` supported")
                return ("export", inner)
            if v in ("const", "let", "var"):
                return self.var_stmt()
            if v == "function":
                return self.fn_decl()
            if v == "return":
                self.next()
                if self.at("punct", ";") or self.at("punct", "}") or self.at("eof"):
                    self.opt("punct", ";")
                    return ("return", None)
                e = self.expression()
                self.opt("punct", ";")
                return ("return", e)
            if v == "if":
                return self.if_stmt()
            if v == "for":
                return self.for_stmt()
            if v == "while":
                self.next()
                self.eat("punct", "(")
                cond = self.expression()
                self.eat("punct", ")")
                return ("while", cond, self.statement())
            if v == "break":
                self.next()
                self.opt("punct", ";")
                return ("break",)
            if v == "continue":
                self.next()
                self.opt("punct", ";")
                return ("continue",)
            if v == "throw":
                self.next()
                e = self.expression()
                self.opt("punct", ";")
                return ("throw", e)
            if v == "try":
                return self.try_stmt()
            if v in ("class", "async", "await", "do", "switch", "import"):
                raise JSError(f"`{v}` is outside the transforms subset (line {t.line})")
        if self.at("punct", "{"):
            return self.block()
        if self.opt("punct", ";"):
            return ("empty",)
        e = self.expression()
        self.opt("punct", ";")
        return ("expr", e)

    def block(self):
        self.eat("punct", "{")
        stmts = []
        while not self.at("punct", "}"):
            stmts.append(self.statement())
        self.eat("punct", "}")
        return ("block", stmts)

    def var_stmt(self):
        kind = self.next().value
        decls = []
        while True:
            target = self.binding_target()
            init = None
            if self.opt("punct", "="):
                init = self.assignment()
            decls.append((target, init))
            if not self.opt("punct", ","):
                break
        self.opt("punct", ";")
        return ("var", kind, decls)

    def binding_target(self):
        if self.at("punct", "{"):
            return self.obj_pattern()
        if self.at("punct", "["):
            return self.arr_pattern()
        name = self.eat("name").value
        return ("name", name)

    def obj_pattern(self):
        self.eat("punct", "{")
        props = []
        while not self.at("punct", "}"):
            key = self.next()
            if key.kind not in ("name", "keyword", "str"):
                raise JSError(f"bad destructuring key (line {key.line})")
            target = ("name", key.value)
            if self.opt("punct", ":"):
                target = self.binding_target()
            default = None
            if self.opt("punct", "="):
                default = self.assignment()
            props.append((key.value, target, default))
            if not self.opt("punct", ","):
                break
        self.eat("punct", "}")
        return ("objpat", props)

    def arr_pattern(self):
        self.eat("punct", "[")
        elts = []
        while not self.at("punct", "]"):
            if self.at("punct", ","):
                elts.append(None)
            elif self.at("punct", "..."):
                self.next()
                elts.append(("rest", self.binding_target()))
            else:
                t = self.binding_target()
                default = None
                if self.opt("punct", "="):
                    default = self.assignment()
                elts.append(("elt", t, default))
            if not self.opt("punct", ","):
                break
        self.eat("punct", "]")
        return ("arrpat", elts)

    def fn_decl(self):
        self.eat("keyword", "function")
        name = self.eat("name").value
        params = self.param_list()
        body = self.block()
        return ("fndecl", name, ("fn", name, params, body, False))

    def param_list(self):
        self.eat("punct", "(")
        params = []
        while not self.at("punct", ")"):
            if self.opt("punct", "..."):
                params.append((self.binding_target(), None, True))
            else:
                t = self.binding_target()
                default = None
                if self.opt("punct", "="):
                    default = self.assignment()
                params.append((t, default, False))
            if not self.opt("punct", ","):
                break
        self.eat("punct", ")")
        return params

    def if_stmt(self):
        self.eat("keyword", "if")
        self.eat("punct", "(")
        cond = self.expression()
        self.eat("punct", ")")
        then = self.statement()
        other = None
        if self.opt("keyword", "else"):
            other = self.statement()
        return ("if", cond, then, other)

    def for_stmt(self):
        self.eat("keyword", "for")
        self.eat("punct", "(")
        init = None
        if not self.at("punct", ";"):
            if self.peek().kind == "keyword" and self.peek().value in ("const", "let", "var"):
                kind = self.next().value
                target = self.binding_target()
                if self.at("keyword", "of") or self.at("keyword", "in"):
                    op = self.next().value
                    it = self.expression()
                    self.eat("punct", ")")
                    return ("forof" if op == "of" else "forin",
                            ("var", kind, [(target, None)]), it, self.statement())
                decls = []
                initv = None
                if self.opt("punct", "="):
                    initv = self.assignment()
                decls.append((target, initv))
                while self.opt("punct", ","):
                    t2 = self.binding_target()
                    i2 = self.assignment() if self.opt("punct", "=") else None
                    decls.append((t2, i2))
                init = ("var", kind, decls)
            else:
                init = ("expr", self.expression())
        self.eat("punct", ";")
        cond = None if self.at("punct", ";") else self.expression()
        self.eat("punct", ";")
        update = None if self.at("punct", ")") else self.expression()
        self.eat("punct", ")")
        return ("for", init, cond, update, self.statement())

    def try_stmt(self):
        self.eat("keyword", "try")
        block = self.block()
        param, catch, fin = None, None, None
        if self.opt("keyword", "catch"):
            if self.opt("punct", "("):
                param = self.binding_target()
                self.eat("punct", ")")
            catch = self.block()
        if self.opt("keyword", "finally"):
            fin = self.block()
        return ("try", block, param, catch, fin)

    # -- expressions (precedence climbing)
    def expression(self):
        e = self.assignment()
        while self.at("punct", ","):
            self.next()
            e = ("seq", e, self.assignment())
        return e

    _ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "||=", "&&=", "??="}

    def assignment(self):
        if self.is_arrow_ahead():
            return self.arrow_fn()
        left = self.conditional()
        t = self.peek()
        if t.kind == "punct" and t.value in self._ASSIGN_OPS:
            self.next()
            right = self.assignment()
            return ("assign", t.value, left, right)
        return left

    def is_arrow_ahead(self) -> bool:
        t = self.peek()
        if t.kind == "name" and self.peek(1).kind == "punct" and self.peek(1).value == "=>":
            return True
        if t.kind == "punct" and t.value == "(":
            depth, k = 0, self.i
            while k < len(self.toks):
                tk = self.toks[k]
                if tk.kind == "punct" and tk.value == "(":
                    depth += 1
                elif tk.kind == "punct" and tk.value == ")":
                    depth -= 1
                    if depth == 0:
                        nxt = self.toks[k + 1]
                        return nxt.kind == "punct" and nxt.value == "=>"
                elif tk.kind == "eof":
                    return False
                k += 1
        return False

    def arrow_fn(self):
        if self.at("name"):
            params = [(("name", self.next().value), None, False)]
        else:
            params = self.param_list()
        self.eat("punct", "=>")
        if self.at("punct", "{"):
            return ("fn", None, params, self.block(), False)
        return ("fn", None, params, self.assignment(), True)

    def conditional(self):
        c = self.nullish()
        if self.opt("punct", "?"):
            t = self.assignment()
            self.eat("punct", ":")
            f = self.assignment()
            return ("cond", c, t, f)
        return c

    def nullish(self):
        e = self.logical_or()
        while self.at("punct", "??"):
            self.next()
            e = ("logic", "??", e, self.logical_or())
        return e

    def logical_or(self):
        e = self.logical_and()
        while self.at("punct", "||"):
            self.next()
            e = ("logic", "||", e, self.logical_and())
        return e

    def logical_and(self):
        e = self.equality()
        while self.at("punct", "&&"):
            self.next()
            e = ("logic", "&&", e, self.equality())
        return e

    def equality(self):
        e = self.relational()
        while self.peek().kind == "punct" and self.peek().value in ("===", "!==", "==", "!="):
            op = self.next().value
            e = ("binop", op, e, self.relational())
        return e

    def relational(self):
        e = self.additive()
        while True:
            t = self.peek()
            if t.kind == "punct" and t.value in ("<", ">", "<=", ">="):
                op = self.next().value
                e = ("binop", op, e, self.additive())
            elif t.kind == "keyword" and t.value == "in":
                self.next()
                e = ("binop", "in", e, self.additive())
            else:
                return e

    def additive(self):
        e = self.multiplicative()
        while self.peek().kind == "punct" and self.peek().value in ("+", "-"):
            op = self.next().value
            e = ("binop", op, e, self.multiplicative())
        return e

    def multiplicative(self):
        e = self.exponent()
        while self.peek().kind == "punct" and self.peek().value in ("*", "/", "%"):
            op = self.next().value
            e = ("binop", op, e, self.exponent())
        return e

    def exponent(self):
        e = self.unary()
        if self.at("punct", "**"):
            self.next()
            return ("binop", "**", e, self.exponent())
        return e

    def unary(self):
        t = self.peek()
        if t.kind == "punct" and t.value in ("!", "-", "+", "~"):
            self.next()
            return ("unary", t.value, self.unary())
        if t.kind == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, self.unary(), True)
        if t.kind == "keyword" and t.value in ("typeof", "void", "delete"):
            self.next()
            return ("unary", t.value, self.unary())
        return self.postfix()

    def postfix(self):
        e = self.call_member()
        t = self.peek()
        if t.kind == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, e, False)
        return e

    def call_member(self):
        if self.opt("keyword", "new"):
            callee = self.call_member_core(self.primary(), allow_call=False)
            args = []
            if self.at("punct", "("):
                args = self.args()
            return self.call_member_core(("new", callee, args))
        return self.call_member_core(self.primary())

    def call_member_core(self, e, allow_call=True):
        while True:
            t = self.peek()
            if t.kind == "punct" and t.value == ".":
                self.next()
                name = self.next()
                if name.kind not in ("name", "keyword"):
                    raise JSError(f"bad member name (line {name.line})")
                e = ("member", e, name.value, False)
            elif t.kind == "punct" and t.value == "?.":
                self.next()
                if self.at("punct", "("):
                    e = ("call", e, self.args(), True)
                elif self.at("punct", "["):
                    self.next()
                    idx = self.expression()
                    self.eat("punct", "]")
                    e = ("index", e, idx, True)
                else:
                    name = self.next()
                    e = ("member", e, name.value, True)
            elif t.kind == "punct" and t.value == "[":
                self.next()
                idx = self.expression()
                self.eat("punct", "]")
                e = ("index", e, idx, False)
            elif allow_call and t.kind == "punct" and t.value == "(":
                e = ("call", e, self.args(), False)
            else:
                return e

    def args(self):
        self.eat("punct", "(")
        out = []
        while not self.at("punct", ")"):
            if self.opt("punct", "..."):
                out.append(("spread", self.assignment()))
            else:
                out.append(self.assignment())
            if not self.opt("punct", ","):
                break
        self.eat("punct", ")")
        return out

    def primary(self):
        t = self.next()
        if t.kind == "num":
            return ("num", t.value)
        if t.kind == "str":
            return ("str", t.value)
        if t.kind == "template":
            parts = []
            for kind, val in t.value:
                if kind == "str":
                    parts.append(("str", val))
                else:
                    sub = Parser(tokenize(val))
                    parts.append(("expr", sub.expression()))
            return ("tpl", parts)
        if t.kind == "regex":
            return ("regex", t.value[0], t.value[1])
        if t.kind == "name":
            return ("name", t.value)
        if t.kind == "keyword":
            v = t.value
            if v == "true":
                return ("bool", True)
            if v == "false":
                return ("bool", False)
            if v == "null":
                return ("null",)
            if v == "undefined":
                return ("undef",)
            if v == "function":
                name = self.next().value if self.at("name") else None
                params = self.param_list()
                return ("fn", name, params, self.block(), False)
            if v == "this":
                return ("undef",)
            raise JSError(f"unexpected keyword {v} (line {t.line})")
        if t.kind == "punct":
            if t.value == "(":
                e = self.expression()
                self.eat("punct", ")")
                return e
            if t.value == "[":
                items = []
                while not self.at("punct", "]"):
                    if self.at("punct", ","):
                        self.next()
                        continue
                    if self.opt("punct", "..."):
                        items.append(("spread", self.assignment()))
                    else:
                        items.append(self.assignment())
                    if not self.at("punct", "]"):
                        self.eat("punct", ",")
                self.eat("punct", "]")
                return ("arr", items)
            if t.value == "{":
                props = []
                while not self.at("punct", "}"):
                    if self.opt("punct", "..."):
                        props.append(("spread", self.assignment()))
                    else:
                        kt = self.next()
                        if kt.kind == "punct" and kt.value == "[":
                            key = ("computed", self.expression())
                            self.eat("punct", "]")
                        elif kt.kind in ("name", "keyword", "str"):
                            key = ("lit", kt.value)
                        elif kt.kind == "num":
                            key = ("lit", _to_js_string(kt.value))
                        else:
                            raise JSError(f"bad object key (line {kt.line})")
                        if self.at("punct", "("):  # method shorthand
                            params = self.param_list()
                            props.append((key, ("fn", None, params, self.block(), False)))
                        elif self.opt("punct", ":"):
                            props.append((key, self.assignment()))
                        else:  # shorthand {x}
                            props.append((key, ("name", kt.value)))
                    if not self.opt("punct", ","):
                        break
                self.eat("punct", "}")
                return ("obj", props)
        raise JSError(f"unexpected token {t.kind}:{t.value!r} (line {t.line})")


# ----------------------------------------------------------------- coercions


def _truthy(v) -> bool:
    if v is UNDEF or v is None or v is False:
        return False
    if v is True:
        return True
    if isinstance(v, (int, float)):
        return v != 0 and v == v  # NaN falsy
    if isinstance(v, str):
        return len(v) > 0
    return True


def _to_js_string(v) -> str:
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == float("inf"):
            return "Infinity"
        if v == float("-inf"):
            return "-Infinity"
        if v.is_integer() and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, JSArray) or isinstance(v, list):
        return ",".join("" if x is UNDEF or x is None else _to_js_string(x) for x in v)
    if isinstance(v, dict):
        return "[object Object]"
    if isinstance(v, JSFunction):
        return f"function {v.name}() {{ … }}"
    if isinstance(v, JSRegExp):
        return repr(v)
    return str(v)


def _to_number(v):
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, (int, float)):
        return v
    if v is None:
        return 0
    if v is UNDEF:
        return float("nan")
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0
        try:
            return int(s)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return float("nan")
    if isinstance(v, list):
        if not v:
            return 0
        if len(v) == 1:
            return _to_number(v[0])
    return float("nan")


def _js_eq_loose(a, b) -> bool:
    if (a is None or a is UNDEF) and (b is None or b is UNDEF):
        return True
    if (a is None or a is UNDEF) or (b is None or b is UNDEF):
        return False
    if isinstance(a, str) and isinstance(b, (int, float)) and not isinstance(b, bool):
        return _to_number(a) == b
    if isinstance(b, str) and isinstance(a, (int, float)) and not isinstance(a, bool):
        return _to_number(b) == a
    if isinstance(a, bool) or isinstance(b, bool):
        return _to_number(a) == _to_number(b)
    return _js_eq_strict(a, b)


def _js_eq_strict(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    if type(a) is not type(b) and not (isinstance(a, str) and isinstance(b, str)):
        if isinstance(a, dict) and isinstance(b, dict):
            return a is b
        if isinstance(a, list) and isinstance(b, list):
            return a is b
        return False
    if isinstance(a, (dict, list)):
        return a is b
    return a == b


# ---------------------------------------------------------------- environment


class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None, vars=None):
        self.vars = vars or {}
        self.parent = parent

    def get(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise JSThrow(f"ReferenceError: {name} is not defined")

    def has(self, name) -> bool:
        e = self
        while e is not None:
            if name in e.vars:
                return True
            e = e.parent
        return False

    def set(self, name, value):
        e = self
        while e is not None:
            if name in e.vars:
                e.vars[name] = value
                return
            e = e.parent
        raise JSThrow(f"ReferenceError: {name} is not defined")

    def declare(self, name, value):
        self.vars[name] = value


# --------------------------------------------------------------- interpreter


class Interpreter:
    def __init__(self):
        self.globals = Env(vars=_make_globals(self))
        self.exports: dict = {}

    # -- public API ------------------------------------------------------
    def run_module(self, source: str) -> dict:
        stmts = Parser(tokenize(source)).parse_module()
        env = Env(parent=self.globals)
        self.exec_stmts(stmts, env, module=True)
        return self.exports

    def call(self, fn, *args):
        if not isinstance(fn, JSFunction) and not callable(fn):
            raise JSError(f"not callable: {fn!r}")
        return self.invoke(fn, [py_to_js(a) for a in args])

    # -- statements --------------------------------------------------------
    def exec_stmts(self, stmts, env, module=False):
        # hoist function declarations (the views call helpers before their
        # textual definition)
        for s in stmts:
            t = s[0]
            if t == "fndecl":
                env.declare(s[1], self.make_fn(s[2], env))
            elif t == "export" and s[1][0] == "fndecl":
                fn = self.make_fn(s[1][2], env)
                env.declare(s[1][1], fn)
                if module:
                    self.exports[s[1][1]] = fn
        for s in stmts:
            self.exec_stmt(s, env, module)

    def exec_stmt(self, s, env, module=False):
        t = s[0]
        if t == "expr":
            self.eval(s[1], env)
        elif t == "var":
            for target, init in s[2]:
                val = self.eval(init, env) if init is not None else UNDEF
                self.bind(target, val, env, declare=True)
        elif t == "fndecl":
            pass  # hoisted
        elif t == "export":
            inner = s[1]
            if inner[0] == "var":
                self.exec_stmt(inner, env)
                if module:
                    for target, _ in inner[2]:
                        for name in _pattern_names(target):
                            self.exports[name] = env.get(name)
            # fndecl exports hoisted already
        elif t == "return":
            raise _Return(self.eval(s[1], env) if s[1] is not None else UNDEF)
        elif t == "if":
            if _truthy(self.eval(s[1], env)):
                self.exec_stmt(s[2], Env(parent=env))
            elif s[3] is not None:
                self.exec_stmt(s[3], Env(parent=env))
        elif t == "block":
            self.exec_stmts(s[1], Env(parent=env))
        elif t == "while":
            while _truthy(self.eval(s[1], env)):
                try:
                    self.exec_stmt(s[2], Env(parent=env))
                except _Break:
                    break
                except _Continue:
                    continue
        elif t == "for":
            fenv = Env(parent=env)
            if s[1] is not None:
                self.exec_stmt(s[1], fenv)
            while s[2] is None or _truthy(self.eval(s[2], fenv)):
                try:
                    self.exec_stmt(s[4], Env(parent=fenv))
                except _Break:
                    break
                except _Continue:
                    pass
                if s[3] is not None:
                    self.eval(s[3], fenv)
        elif t == "forof":
            it = self.eval(s[2], env)
            seq = list(it) if isinstance(it, (list, str)) else (
                list(it.keys()) if isinstance(it, dict) else None)
            if seq is None:
                raise JSThrow("TypeError: value is not iterable")
            target = s[1][2][0][0]
            for item in seq:
                fenv = Env(parent=env)
                self.bind(target, item, fenv, declare=True)
                try:
                    self.exec_stmt(s[3], fenv)
                except _Break:
                    break
                except _Continue:
                    continue
        elif t == "forin":
            obj = self.eval(s[2], env)
            keys = (list(obj.keys()) if isinstance(obj, dict)
                    else [_to_js_string(i) for i in range(len(obj))] if isinstance(obj, list)
                    else [])
            target = s[1][2][0][0]
            for k in keys:
                fenv = Env(parent=env)
                self.bind(target, k, fenv, declare=True)
                try:
                    self.exec_stmt(s[3], fenv)
                except _Break:
                    break
                except _Continue:
                    continue
        elif t == "break":
            raise _Break()
        elif t == "continue":
            raise _Continue()
        elif t == "throw":
            raise JSThrow(self.eval(s[1], env))
        elif t == "try":
            try:
                self.exec_stmt(s[1], Env(parent=env))
            except JSThrow as ex:
                if s[3] is not None:
                    cenv = Env(parent=env)
                    if s[2] is not None:
                        self.bind(s[2], ex.value, cenv, declare=True)
                    self.exec_stmt(s[3], cenv)
            finally:
                if s[4] is not None:
                    self.exec_stmt(s[4], Env(parent=env))
        elif t == "empty":
            pass
        else:
            raise JSError(f"unknown statement {t}")

    # -- binding ------------------------------------------------------------
    def bind(self, target, value, env, declare=False):
        t = target[0]
        if t == "name":
            if declare:
                env.declare(target[1], value)
            else:
                env.set(target[1], value)
        elif t == "objpat":
            src = value if isinstance(value, dict) else {}
            for key, sub, default in target[1]:
                v = src.get(key, UNDEF)
                if v is UNDEF and default is not None:
                    v = self.eval(default, env)
                self.bind(sub, v, env, declare)
        elif t == "arrpat":
            seq = value if isinstance(value, list) else []
            i = 0
            for elt in target[1]:
                if elt is None:
                    i += 1
                    continue
                if elt[0] == "rest":
                    self.bind(elt[1], JSArray(seq[i:]), env, declare)
                    break
                v = seq[i] if i < len(seq) else UNDEF
                if v is UNDEF and elt[2] is not None:
                    v = self.eval(elt[2], env)
                self.bind(elt[1], v, env, declare)
                i += 1
        else:
            raise JSError(f"bad binding target {t}")

    # -- functions ------------------------------------------------------
    def make_fn(self, node, env) -> JSFunction:
        _, name, params, body, is_expr = node
        return JSFunction(name, params, body, env, is_expr)

    def invoke(self, fn, args: list):
        if callable(fn) and not isinstance(fn, JSFunction):
            return fn(*args)
        env = Env(parent=fn.env)
        i = 0
        for pattern, default, is_rest in fn.params:
            if is_rest:
                self.bind(pattern, JSArray(args[i:]), env, declare=True)
                break
            v = args[i] if i < len(args) else UNDEF
            if v is UNDEF and default is not None:
                v = self.eval(default, env)
            self.bind(pattern, v, env, declare=True)
            i += 1
        if fn.is_expr_body:
            return self.eval(fn.body, env)
        try:
            self.exec_stmt(fn.body, env)
        except _Return as r:
            return r.value
        return UNDEF

    # -- expressions -----------------------------------------------------
    def eval(self, e, env):
        t = e[0]
        if t == "num":
            return e[1]
        if t == "str":
            return e[1]
        if t == "bool":
            return e[1]
        if t == "null":
            return None
        if t == "undef":
            return UNDEF
        if t == "name":
            return env.get(e[1])
        if t == "tpl":
            out = []
            for kind, val in e[1]:
                out.append(val if kind == "str" else _to_js_string(self.eval(val, env)))
            return "".join(out)
        if t == "regex":
            return JSRegExp(e[1], e[2])
        if t == "arr":
            arr = JSArray()
            for item in e[1]:
                if item[0] == "spread":
                    arr.extend(self.eval(item[1], env))
                else:
                    arr.append(self.eval(item, env))
            return arr
        if t == "obj":
            obj = JSObject()
            for key, val in e[1]:
                if key == "spread":
                    src = self.eval(val, env)
                    if isinstance(src, dict):
                        obj.update(src)
                    continue
                k = key[1] if key[0] == "lit" else _to_js_string(self.eval(key[1], env))
                obj[k] = self.eval(val, env)
            return obj
        if t == "fn":
            return self.make_fn(e, env)
        if t == "cond":
            return self.eval(e[2] if _truthy(self.eval(e[1], env)) else e[3], env)
        if t == "seq":
            self.eval(e[1], env)
            return self.eval(e[2], env)
        if t == "logic":
            left = self.eval(e[2], env)
            if e[1] == "&&":
                return self.eval(e[3], env) if _truthy(left) else left
            if e[1] == "||":
                return left if _truthy(left) else self.eval(e[3], env)
            return self.eval(e[3], env) if left is None or left is UNDEF else left
        if t == "binop":
            return self.binop(e[1], self.eval(e[2], env), self.eval(e[3], env))
        if t == "unary":
            if e[1] == "typeof":
                try:
                    v = self.eval(e[2], env)
                except JSThrow:
                    return "undefined"
                return _typeof(v)
            if e[1] == "delete":
                inner = e[2]
                if inner[0] == "member":
                    obj = self.eval(inner[1], env)
                    if isinstance(obj, dict):
                        obj.pop(inner[2], None)
                    return True
                if inner[0] == "index":
                    obj = self.eval(inner[1], env)
                    key = self.eval(inner[2], env)
                    if isinstance(obj, dict):
                        obj.pop(_to_js_string(key), None)
                    return True
                return True
            v = self.eval(e[2], env)
            if e[1] == "!":
                return not _truthy(v)
            if e[1] == "-":
                return _neg(_to_number(v))
            if e[1] == "+":
                return _to_number(v)
            if e[1] == "~":
                return ~int(_to_number(v))
            if e[1] == "void":
                return UNDEF
        if t == "update":
            old = _to_number(self.eval(e[2], env))
            new = old + (1 if e[1] == "++" else -1)
            self.assign_to(e[2], new, env)
            return new if e[3] else old
        if t == "assign":
            op = e[1]
            if op == "=":
                val = self.eval(e[3], env)
            elif op in ("||=", "&&=", "??="):
                cur = self.eval(e[2], env)
                if op == "||=" and _truthy(cur):
                    return cur
                if op == "&&=" and not _truthy(cur):
                    return cur
                if op == "??=" and cur is not None and cur is not UNDEF:
                    return cur
                val = self.eval(e[3], env)
            else:
                cur = self.eval(e[2], env)
                val = self.binop(op[:-1], cur, self.eval(e[3], env))
            self.assign_to(e[2], val, env)
            return val
        if t == "member":
            obj = self.eval(e[1], env)
            if e[3] and (obj is None or obj is UNDEF):
                return UNDEF
            return self.get_member(obj, e[2])
        if t == "index":
            obj = self.eval(e[1], env)
            if e[3] and (obj is None or obj is UNDEF):
                return UNDEF
            key = self.eval(e[2], env)
            return self.get_index(obj, key)
        if t == "call":
            return self.eval_call(e, env)
        if t == "new":
            callee = self.eval(e[1], env)
            args = [self.eval(a, env) for a in e[2]]
            if callee is _js_map_ctor:
                return _js_map_ctor(*args)
            if callee is _js_set_ctor:
                return _js_set_ctor(*args)
            if callable(callee) and not isinstance(callee, JSFunction):
                # new Array(n) / new String(x) etc. — constructor == call
                return callee(*args)
            if isinstance(callee, JSFunction):
                raise JSError("`new` on user functions is outside the subset")
            raise JSError(f"cannot construct {callee!r}")
        raise JSError(f"unknown expression {t}")

    def eval_call(self, e, env):
        _, callee, arg_nodes, optional = e
        args = []
        for a in arg_nodes:
            if a[0] == "spread":
                args.extend(self.eval(a[1], env))
            else:
                args.append(self.eval(a, env))
        if callee[0] == "member" or (callee[0] == "index"):
            obj = self.eval(callee[1], env)
            if callee[3] and (obj is None or obj is UNDEF):
                return UNDEF
            name = callee[2] if callee[0] == "member" else _to_js_string(self.eval(callee[2], env))
            method = _builtin_method(self, obj, name)
            if method is not None:
                return method(args)
            fn = self.get_member(obj, name)
            if fn is UNDEF:
                raise JSThrow(f"TypeError: {_typeof(obj)}.{name} is not a function")
            return self.invoke(fn, args)
        fn = self.eval(callee, env)
        if optional and (fn is None or fn is UNDEF):
            return UNDEF
        if fn is UNDEF or fn is None:
            raise JSThrow("TypeError: undefined is not a function")
        return self.invoke(fn, args)

    def assign_to(self, target, value, env):
        t = target[0]
        if t == "name":
            if env.has(target[1]):
                env.set(target[1], value)
            else:
                env.declare(target[1], value)
        elif t == "member":
            obj = self.eval(target[1], env)
            self.set_member(obj, target[2], value)
        elif t == "index":
            obj = self.eval(target[1], env)
            key = self.eval(target[2], env)
            self.set_index(obj, key, value)
        else:
            raise JSError(f"bad assignment target {t}")

    # -- member / index access -------------------------------------------
    def get_member(self, obj, name):
        if obj is None or obj is UNDEF:
            raise JSThrow(f"TypeError: cannot read '{name}' of {_to_js_string(obj)}")
        if isinstance(obj, str):
            if name == "length":
                return len(obj)
            return UNDEF
        if isinstance(obj, list):
            if name == "length":
                return len(obj)
            if isinstance(obj, JSArray) and name in obj.props:
                return obj.props[name]
            return UNDEF
        if isinstance(obj, dict):
            return obj.get(name, UNDEF)
        if isinstance(obj, JSRegExp):
            if name == "source":
                return obj.source
            if name == "flags":
                return obj.flags
            if name == "lastIndex":
                return obj.last_index
            return UNDEF
        if isinstance(obj, _Namespace):
            return obj.attrs.get(name, UNDEF)
        if isinstance(obj, _JSMap):
            if name == "size":
                return len(obj.d)
            return UNDEF
        if isinstance(obj, _JSSet):
            if name == "size":
                return len(obj.s)
            return UNDEF
        return UNDEF

    def set_member(self, obj, name, value):
        if isinstance(obj, JSArray) and name == "length":
            n = int(_to_number(value))
            del obj[n:]
            return
        if isinstance(obj, JSArray):
            obj.props[name] = value
            return
        if isinstance(obj, dict):
            obj[name] = value
            return
        raise JSThrow(f"TypeError: cannot set '{name}' on {_typeof(obj)}")

    def get_index(self, obj, key):
        if isinstance(obj, list):
            if isinstance(key, (int, float)) and not isinstance(key, bool):
                i = int(key)
                if 0 <= i < len(obj):
                    return obj[i]
                return UNDEF
            return self.get_member(obj, _to_js_string(key))
        if isinstance(obj, str):
            if isinstance(key, (int, float)) and not isinstance(key, bool):
                i = int(key)
                if 0 <= i < len(obj):
                    return obj[i]
                return UNDEF
            return self.get_member(obj, _to_js_string(key))
        if isinstance(obj, dict):
            return obj.get(_to_js_string(key), UNDEF)
        return self.get_member(obj, _to_js_string(key))

    def set_index(self, obj, key, value):
        if isinstance(obj, list) and isinstance(key, (int, float)) and not isinstance(key, bool):
            i = int(key)
            while len(obj) <= i:
                obj.append(UNDEF)
            obj[i] = value
            return
        if isinstance(obj, dict):
            obj[_to_js_string(key)] = value
            return
        raise JSThrow(f"TypeError: cannot index-assign on {_typeof(obj)}")

    # -- operators ---------------------------------------------------------
    def binop(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str) or isinstance(a, (list, dict)) or isinstance(b, (list, dict)):
                return _to_js_string(a) + _to_js_string(b)
            return _to_number(a) + _to_number(b)
        if op == "-":
            return _to_number(a) - _to_number(b)
        if op == "*":
            return _to_number(a) * _to_number(b)
        if op == "/":
            bn = _to_number(b)
            an = _to_number(a)
            if bn == 0:
                if an == 0:
                    return float("nan")
                return float("inf") if (an > 0) == (bn >= 0) else float("-inf")
            r = an / bn
            return r
        if op == "%":
            bn = _to_number(b)
            if bn == 0:
                return float("nan")
            return _math.fmod(_to_number(a), bn)
        if op == "**":
            return _to_number(a) ** _to_number(b)
        if op == "===":
            return _js_eq_strict(a, b)
        if op == "!==":
            return not _js_eq_strict(a, b)
        if op == "==":
            return _js_eq_loose(a, b)
        if op == "!=":
            return not _js_eq_loose(a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                x, y = a, b
            else:
                x, y = _to_number(a), _to_number(b)
                if x != x or y != y:
                    return False
            return {"<": x < y, ">": x > y, "<=": x <= y, ">=": x >= y}[op]
        if op == "in":
            if isinstance(b, dict):
                return _to_js_string(a) in b
            if isinstance(b, list):
                i = int(_to_number(a))
                return 0 <= i < len(b)
            raise JSThrow("TypeError: 'in' on non-object")
        raise JSError(f"unknown operator {op}")


def _neg(v):
    return -v


def _typeof(v) -> str:
    if v is UNDEF:
        return "undefined"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, JSFunction) or callable(v):
        return "function"
    return "object"


def _pattern_names(target) -> list[str]:
    t = target[0]
    if t == "name":
        return [target[1]]
    if t == "objpat":
        out = []
        for _, sub, _d in target[1]:
            out.extend(_pattern_names(sub))
        return out
    if t == "arrpat":
        out = []
        for elt in target[1]:
            if elt is None:
                continue
            if elt[0] == "rest":
                out.extend(_pattern_names(elt[1]))
            else:
                out.extend(_pattern_names(elt[1]))
        return out
    return []


# ----------------------------------------------------------- builtin methods


def _builtin_method(interp: Interpreter, obj, name):
    """Return a handler(args)->value for built-in prototype methods, or None
    to fall back to own-property lookup (user fns stored on objects)."""
    if isinstance(obj, str):
        return _string_method(interp, obj, name)
    if isinstance(obj, list):
        if not (isinstance(obj, dict)) and name in _ARRAY_METHODS:
            return lambda args: _ARRAY_METHODS[name](interp, obj, args)
        return None
    if isinstance(obj, JSRegExp):
        if name == "test":
            return lambda args: obj.re.search(_to_js_string(args[0] if args else "")) is not None
        if name == "exec":
            return lambda args: _regex_exec(obj, _to_js_string(args[0] if args else ""))
        return None
    if isinstance(obj, _JSMap):
        return _map_method(obj, name)
    if isinstance(obj, _JSSet):
        return _set_method(obj, name)
    if isinstance(obj, dict):
        if name == "hasOwnProperty":
            return lambda args: _to_js_string(args[0]) in obj
        if name == "toString":
            return lambda args: _to_js_string(obj)
        return None
    if isinstance(obj, (int, float)) and not isinstance(obj, bool):
        if name == "toFixed":
            return lambda args: f"{obj:.{int(_to_number(args[0])) if args else 0}f}"
        if name == "toString":
            return lambda args: _num_to_string(obj, int(_to_number(args[0])) if args else 10)
        if name == "toLocaleString":
            return lambda args: f"{int(obj):,}" if float(obj).is_integer() else f"{obj:,}"
        return None
    return None


def _num_to_string(v, base):
    if base == 10:
        return _to_js_string(v)
    i = int(v)
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    if i == 0:
        return "0"
    neg, i = i < 0, abs(i)
    out = []
    while i:
        out.append(digits[i % base])
        i //= base
    return ("-" if neg else "") + "".join(reversed(out))


def _string_method(interp, s: str, name):
    def m(fn):
        return fn

    if name == "slice":
        return m(lambda args: _slice(s, args))
    if name == "substring":
        def substring(args):
            a = max(0, min(len(s), int(_to_number(args[0])) if args else 0))
            b = max(0, min(len(s), int(_to_number(args[1])) if len(args) > 1 and args[1] is not UNDEF else len(s)))
            if a > b:
                a, b = b, a
            return s[a:b]
        return substring
    if name == "split":
        def split(args):
            if not args or args[0] is UNDEF:
                return JSArray([s])
            sep = args[0]
            limit = int(_to_number(args[1])) if len(args) > 1 else -1
            if isinstance(sep, JSRegExp):
                parts = sep.re.split(s)
            elif sep == "":
                parts = list(s)
            else:
                parts = s.split(_to_js_string(sep))
            if limit >= 0:
                parts = parts[:limit]
            return JSArray(parts)
        return split
    if name in ("replace", "replaceAll"):
        def replace(args):
            pat, rep = args[0], args[1]
            count = 0 if name == "replaceAll" else 1
            if isinstance(pat, JSRegExp):
                count = 0 if pat.global_ else 1
                if isinstance(rep, JSFunction) or callable(rep):
                    def cb(mt):
                        groups = [g if g is not None else UNDEF for g in mt.groups()]
                        res = interp.invoke(rep, [mt.group(0), *groups, mt.start(), s])
                        return _to_js_string(res)
                    return pat.re.sub(cb, s, count=count)
                return pat.re.sub(lambda mt: _expand_js_replacement(_to_js_string(rep), mt), s, count=count)
            pat_s = _to_js_string(pat)
            if isinstance(rep, JSFunction) or callable(rep):
                out, start, done = [], 0, 0
                while True:
                    idx = s.find(pat_s, start)
                    if idx < 0 or (count and done >= count):
                        out.append(s[start:])
                        break
                    out.append(s[start:idx])
                    out.append(_to_js_string(interp.invoke(rep, [pat_s, idx, s])))
                    start = idx + len(pat_s)
                    done += 1
                return "".join(out)
            rep_s = _to_js_string(rep)
            return s.replace(pat_s, rep_s) if count == 0 else s.replace(pat_s, rep_s, 1)
        return replace
    if name == "match":
        def match(args):
            r = args[0]
            if not isinstance(r, JSRegExp):
                r = JSRegExp(_re.escape(_to_js_string(r)), "")
            if r.global_:
                found = r.re.findall(s)
                if not found:
                    return None
                return JSArray(mm.group(0) for mm in r.re.finditer(s))
            return _regex_exec(r, s)
        return match
    if name == "trim":
        return lambda args: s.strip()
    if name == "trimStart":
        return lambda args: s.lstrip()
    if name == "trimEnd":
        return lambda args: s.rstrip()
    if name == "toLowerCase":
        return lambda args: s.lower()
    if name == "toUpperCase":
        return lambda args: s.upper()
    if name == "includes":
        return lambda args: _to_js_string(args[0]) in s
    if name == "startsWith":
        return lambda args: s.startswith(_to_js_string(args[0]))
    if name == "endsWith":
        return lambda args: s.endswith(_to_js_string(args[0]))
    if name == "indexOf":
        return lambda args: s.find(_to_js_string(args[0]), int(_to_number(args[1])) if len(args) > 1 else 0)
    if name == "lastIndexOf":
        return lambda args: s.rfind(_to_js_string(args[0]))
    if name == "charAt":
        return lambda args: s[int(_to_number(args[0] if args else 0))] if 0 <= int(_to_number(args[0] if args else 0)) < len(s) else ""
    if name == "charCodeAt":
        return lambda args: ord(s[int(_to_number(args[0] if args else 0))]) if s else float("nan")
    if name == "codePointAt":
        return lambda args: ord(s[int(_to_number(args[0] if args else 0))]) if s else UNDEF
    if name == "at":
        def at(args):
            i = int(_to_number(args[0] if args else 0))
            if i < 0:
                i += len(s)
            return s[i] if 0 <= i < len(s) else UNDEF
        return at
    if name == "repeat":
        return lambda args: s * int(_to_number(args[0]))
    if name == "padStart":
        return lambda args: s.rjust(int(_to_number(args[0])), _to_js_string(args[1]) if len(args) > 1 else " ")
    if name == "padEnd":
        return lambda args: s.ljust(int(_to_number(args[0])), _to_js_string(args[1]) if len(args) > 1 else " ")
    if name == "concat":
        return lambda args: s + "".join(_to_js_string(a) for a in args)
    if name == "localeCompare":
        return lambda args: (s > _to_js_string(args[0])) - (s < _to_js_string(args[0]))
    if name == "toString":
        return lambda args: s
    if name == "search":
        def search(args):
            r = args[0]
            if not isinstance(r, JSRegExp):
                r = JSRegExp(_re.escape(_to_js_string(r)), "")
            mt = r.re.search(s)
            return mt.start() if mt else -1
        return search
    return None


def _expand_js_replacement(rep: str, mt) -> str:
    out, i = [], 0
    while i < len(rep):
        c = rep[i]
        if c == "$" and i + 1 < len(rep):
            nx = rep[i + 1]
            if nx == "$":
                out.append("$")
                i += 2
                continue
            if nx == "&":
                out.append(mt.group(0))
                i += 2
                continue
            if nx.isdigit():
                j = i + 1
                num = nx
                if j + 1 < len(rep) and rep[j + 1].isdigit() and int(num + rep[j + 1]) <= len(mt.groups()):
                    num += rep[j + 1]
                    j += 1
                g = mt.group(int(num))
                out.append(g or "")
                i = j + 1
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _regex_exec(r: JSRegExp, s: str):
    mt = r.re.search(s, r.last_index if r.global_ else 0)
    if mt is None:
        r.last_index = 0
        return None
    if r.global_:
        r.last_index = mt.end()
    arr = JSArray([mt.group(0), *[g if g is not None else UNDEF for g in mt.groups()]])
    arr.props["index"] = mt.start()
    arr.props["input"] = s
    if mt.groupdict():
        arr.props["groups"] = JSObject({k: (v if v is not None else UNDEF)
                                        for k, v in mt.groupdict().items()})
    return arr


def _slice(seq, args):
    n = len(seq)
    a = int(_to_number(args[0])) if args and args[0] is not UNDEF else 0
    b = int(_to_number(args[1])) if len(args) > 1 and args[1] is not UNDEF else n
    if a < 0:
        a = max(0, n + a)
    if b < 0:
        b = max(0, n + b)
    out = seq[min(a, n):min(b, n)]
    return JSArray(out) if isinstance(seq, list) else out


def _cmp_default(a, b):
    x, y = _to_js_string(a), _to_js_string(b)
    return (x > y) - (x < y)


_ARRAY_METHODS = {}


def _array_method(name):
    def deco(fn):
        _ARRAY_METHODS[name] = fn
        return fn
    return deco


@_array_method("push")
def _arr_push(interp, arr, args):
    arr.extend(args)
    return len(arr)


@_array_method("pop")
def _arr_pop(interp, arr, args):
    return arr.pop() if arr else UNDEF


@_array_method("shift")
def _arr_shift(interp, arr, args):
    return arr.pop(0) if arr else UNDEF


@_array_method("unshift")
def _arr_unshift(interp, arr, args):
    arr[0:0] = args
    return len(arr)


@_array_method("slice")
def _arr_slice(interp, arr, args):
    return _slice(arr, args)


@_array_method("splice")
def _arr_splice(interp, arr, args):
    start = int(_to_number(args[0])) if args else 0
    if start < 0:
        start = max(0, len(arr) + start)
    start = min(start, len(arr))
    dc = int(_to_number(args[1])) if len(args) > 1 else len(arr) - start
    removed = JSArray(arr[start : start + dc])
    arr[start : start + dc] = list(args[2:])
    return removed


@_array_method("map")
def _arr_map(interp, arr, args):
    fn = args[0]
    return JSArray(interp.invoke(fn, [v, i, arr]) for i, v in enumerate(list(arr)))


@_array_method("filter")
def _arr_filter(interp, arr, args):
    fn = args[0]
    return JSArray(v for i, v in enumerate(list(arr)) if _truthy(interp.invoke(fn, [v, i, arr])))


@_array_method("forEach")
def _arr_foreach(interp, arr, args):
    fn = args[0]
    for i, v in enumerate(list(arr)):
        interp.invoke(fn, [v, i, arr])
    return UNDEF


@_array_method("reduce")
def _arr_reduce(interp, arr, args):
    fn = args[0]
    items = list(arr)
    if len(args) > 1:
        acc = args[1]
        start = 0
    else:
        if not items:
            raise JSThrow("TypeError: reduce of empty array with no initial value")
        acc = items[0]
        start = 1
    for i in range(start, len(items)):
        acc = interp.invoke(fn, [acc, items[i], i, arr])
    return acc


@_array_method("some")
def _arr_some(interp, arr, args):
    fn = args[0]
    return any(_truthy(interp.invoke(fn, [v, i, arr])) for i, v in enumerate(list(arr)))


@_array_method("every")
def _arr_every(interp, arr, args):
    fn = args[0]
    return all(_truthy(interp.invoke(fn, [v, i, arr])) for i, v in enumerate(list(arr)))


@_array_method("find")
def _arr_find(interp, arr, args):
    fn = args[0]
    for i, v in enumerate(list(arr)):
        if _truthy(interp.invoke(fn, [v, i, arr])):
            return v
    return UNDEF


@_array_method("findIndex")
def _arr_findindex(interp, arr, args):
    fn = args[0]
    for i, v in enumerate(list(arr)):
        if _truthy(interp.invoke(fn, [v, i, arr])):
            return i
    return -1


@_array_method("indexOf")
def _arr_indexof(interp, arr, args):
    for i, v in enumerate(arr):
        if _js_eq_strict(v, args[0]):
            return i
    return -1


@_array_method("includes")
def _arr_includes(interp, arr, args):
    return any(_js_eq_strict(v, args[0]) for v in arr)


@_array_method("join")
def _arr_join(interp, arr, args):
    sep = _to_js_string(args[0]) if args and args[0] is not UNDEF else ","
    return sep.join("" if v is None or v is UNDEF else _to_js_string(v) for v in arr)


@_array_method("concat")
def _arr_concat(interp, arr, args):
    out = JSArray(arr)
    for a in args:
        if isinstance(a, list):
            out.extend(a)
        else:
            out.append(a)
    return out


@_array_method("flat")
def _arr_flat(interp, arr, args):
    depth = int(_to_number(args[0])) if args else 1

    def go(xs, d):
        out = []
        for v in xs:
            if isinstance(v, list) and d > 0:
                out.extend(go(v, d - 1))
            else:
                out.append(v)
        return out

    return JSArray(go(arr, depth))


@_array_method("flatMap")
def _arr_flatmap(interp, arr, args):
    fn = args[0]
    out = JSArray()
    for i, v in enumerate(list(arr)):
        r = interp.invoke(fn, [v, i, arr])
        if isinstance(r, list):
            out.extend(r)
        else:
            out.append(r)
    return out


@_array_method("sort")
def _arr_sort(interp, arr, args):
    import functools

    if args and args[0] is not UNDEF:
        fn = args[0]

        def cmp(a, b):
            r = _to_number(interp.invoke(fn, [a, b]))
            return -1 if r < 0 else (1 if r > 0 else 0)

        arr.sort(key=functools.cmp_to_key(cmp))
    else:
        arr.sort(key=functools.cmp_to_key(_cmp_default))
    return arr


@_array_method("reverse")
def _arr_reverse(interp, arr, args):
    arr.reverse()
    return arr


@_array_method("fill")
def _arr_fill(interp, arr, args):
    v = args[0] if args else UNDEF
    a = int(_to_number(args[1])) if len(args) > 1 else 0
    b = int(_to_number(args[2])) if len(args) > 2 else len(arr)
    for i in range(max(a, 0), min(b, len(arr))):
        arr[i] = v
    return arr


@_array_method("at")
def _arr_at(interp, arr, args):
    i = int(_to_number(args[0] if args else 0))
    if i < 0:
        i += len(arr)
    return arr[i] if 0 <= i < len(arr) else UNDEF


@_array_method("keys")
def _arr_keys(interp, arr, args):
    return JSArray(range(len(arr)))


@_array_method("entries")
def _arr_entries(interp, arr, args):
    return JSArray(JSArray([i, v]) for i, v in enumerate(arr))


@_array_method("toString")
def _arr_tostring(interp, arr, args):
    return _to_js_string(arr)


# --------------------------------------------------------------- namespaces


class _Namespace:
    def __init__(self, attrs):
        self.attrs = attrs


class _CallableNamespace(_Namespace):
    """A namespace that is also callable (Array(…), Number(…), String(…))."""

    def __init__(self, fn, attrs):
        super().__init__(attrs)
        self.fn = fn

    def __call__(self, *a):
        return self.fn(*a)


class _JSMap:
    def __init__(self, entries=None):
        self.d = {}
        if entries:
            for pair in entries:
                self.d[_map_key(pair[0])] = (pair[0], pair[1])


class _JSSet:
    def __init__(self, items=None):
        self.s = {}
        if items:
            for v in items:
                self.s[_map_key(v)] = v


def _map_key(v):
    if isinstance(v, (dict, list)):
        return id(v)
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


def _map_method(m: _JSMap, name):
    if name == "get":
        return lambda args: m.d.get(_map_key(args[0]), (None, UNDEF))[1]
    if name == "set":
        def set_(args):
            m.d[_map_key(args[0])] = (args[0], args[1] if len(args) > 1 else UNDEF)
            return m
        return set_
    if name == "has":
        return lambda args: _map_key(args[0]) in m.d
    if name == "delete":
        return lambda args: m.d.pop(_map_key(args[0]), None) is not None
    if name == "keys":
        return lambda args: JSArray(k for k, _ in m.d.values())
    if name == "values":
        return lambda args: JSArray(v for _, v in m.d.values())
    if name == "entries":
        return lambda args: JSArray(JSArray([k, v]) for k, v in m.d.values())
    if name == "clear":
        return lambda args: (m.d.clear(), UNDEF)[1]
    if name == "forEach":
        return None
    return None


def _set_method(st: _JSSet, name):
    if name == "add":
        def add(args):
            st.s[_map_key(args[0])] = args[0]
            return st
        return add
    if name == "has":
        return lambda args: _map_key(args[0]) in st.s
    if name == "delete":
        return lambda args: st.s.pop(_map_key(args[0]), None) is not None
    if name == "clear":
        return lambda args: (st.s.clear(), UNDEF)[1]
    return None


def _js_map_ctor(*args):
    return _JSMap(args[0] if args else None)


def _js_set_ctor(*args):
    return _JSSet(args[0] if args else None)


def _json_stringify(interp):
    def stringify(value=UNDEF, _replacer=UNDEF, indent=UNDEF):
        def conv(v):
            if v is UNDEF:
                return None
            if isinstance(v, float):
                if v != v or v in (float("inf"), float("-inf")):
                    return None
                if v.is_integer():
                    return int(v)
                return v
            if isinstance(v, (bool, int, str)) or v is None:
                return v
            if isinstance(v, list):
                return [conv(x) for x in v]
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items() if x is not UNDEF and not isinstance(x, JSFunction)}
            return None

        if value is UNDEF:
            return UNDEF
        ind = None
        if isinstance(indent, (int, float)) and not isinstance(indent, bool) and indent:
            ind = int(indent)
        elif isinstance(indent, str) and indent:
            ind = indent
        return _json.dumps(conv(value), indent=ind, ensure_ascii=False,
                           separators=(",", ":") if ind is None else (",", ": "))

    return stringify


def _json_parse(s=UNDEF):
    try:
        return py_to_js(_json.loads(_to_js_string(s)))
    except (ValueError, TypeError) as ex:
        # JS semantics: bad JSON is a catchable SyntaxError, not a host crash
        raise JSThrow(f"SyntaxError: {ex}") from None


def _make_globals(interp: Interpreter) -> dict:
    # ctors are also used as map/filter callbacks (`.filter(Boolean)`,
    # `.map(Number)`) where the runtime passes (value, index, array) — accept
    # and ignore the extras
    def number_ctor(v=UNDEF, *_a):
        n = _to_number(v)
        return n

    def string_ctor(v=UNDEF, *_a):
        return "" if v is UNDEF else _to_js_string(v)

    def boolean_ctor(v=UNDEF, *_a):
        return _truthy(v)

    def parse_int(s=UNDEF, base=UNDEF, *_a):
        txt = _to_js_string(s).strip()
        b = int(_to_number(base)) if base is not UNDEF and _truthy(base) else 10
        m = _re.match(r"[+-]?(0[xX][0-9a-fA-F]+|[0-9a-zA-Z]+)", txt)
        if not m:
            return float("nan")
        t = m.group(0)
        try:
            if t.lower().startswith(("0x", "-0x", "+0x")) and b in (10, 16):
                return int(t, 16)
            # trim chars not valid in base
            out = ""
            neg = t.startswith("-")
            for ch in t.lstrip("+-"):
                try:
                    if int(ch, b) >= 0:
                        out += ch
                except ValueError:
                    break
            if not out:
                return float("nan")
            v = int(out, b)
            return -v if neg else v
        except ValueError:
            return float("nan")

    def parse_float(s=UNDEF, *_a):
        m = _re.match(r"[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|Infinity)", _to_js_string(s).strip())
        if not m:
            return float("nan")
        t = m.group(0)
        if t.endswith("Infinity"):
            return float("-inf") if t.startswith("-") else float("inf")
        return float(t)

    math_ns = _Namespace({
        "min": lambda *a: min((_to_number(x) for x in a), default=float("inf")),
        "max": lambda *a: max((_to_number(x) for x in a), default=float("-inf")),
        "abs": lambda x=UNDEF: abs(_to_number(x)),
        "round": lambda x=UNDEF: _math.floor(_to_number(x) + 0.5),
        "floor": lambda x=UNDEF: _math.floor(_to_number(x)),
        "ceil": lambda x=UNDEF: _math.ceil(_to_number(x)),
        "trunc": lambda x=UNDEF: _math.trunc(_to_number(x)),
        "sqrt": lambda x=UNDEF: _math.sqrt(_to_number(x)) if _to_number(x) >= 0 else float("nan"),
        "pow": lambda x=UNDEF, y=UNDEF: _to_number(x) ** _to_number(y),
        "log": lambda x=UNDEF: _math.log(_to_number(x)) if _to_number(x) > 0 else float("-inf" if _to_number(x) == 0 else "nan"),
        "log2": lambda x=UNDEF: _math.log2(_to_number(x)) if _to_number(x) > 0 else float("nan"),
        "log10": lambda x=UNDEF: _math.log10(_to_number(x)) if _to_number(x) > 0 else float("nan"),
        "exp": lambda x=UNDEF: _math.exp(_to_number(x)),
        "sign": lambda x=UNDEF: (0 if _to_number(x) == 0 else _math.copysign(1, _to_number(x))),
        "hypot": lambda *a: _math.hypot(*[_to_number(x) for x in a]),
        "PI": _math.pi,
        "E": _math.e,
        # deterministic "random": tests need reproducibility; transforms
        # should not depend on randomness anyway
        "random": lambda: 0.5,
    })

    def object_entries(o=UNDEF):
        if isinstance(o, dict):
            return JSArray(JSArray([k, v]) for k, v in o.items())
        return JSArray()

    object_ns = _Namespace({
        "keys": lambda o=UNDEF: JSArray(o.keys()) if isinstance(o, dict) else JSArray(
            str(i) for i in range(len(o))) if isinstance(o, list) else JSArray(),
        "values": lambda o=UNDEF: JSArray(o.values()) if isinstance(o, dict) else JSArray(o) if isinstance(o, list) else JSArray(),
        "entries": object_entries,
        "assign": lambda target=UNDEF, *srcs: (
            [target.update(s) for s in srcs if isinstance(s, dict)], target)[1],
        "fromEntries": lambda pairs=UNDEF: JSObject(
            {_to_js_string(p[0]): (p[1] if len(p) > 1 else UNDEF) for p in pairs}) if isinstance(pairs, list) else JSObject(),
        "freeze": lambda o=UNDEF: o,
    })

    def array_from(src=UNDEF, fn=UNDEF):
        if isinstance(src, list):
            items = list(src)
        elif isinstance(src, str):
            items = list(src)
        elif isinstance(src, dict) and "length" in src:
            items = [src.get(str(i), UNDEF) for i in range(int(_to_number(src["length"])))]
        elif isinstance(src, _JSMap):
            items = [JSArray([k, v]) for k, v in src.d.values()]
        elif isinstance(src, _JSSet):
            items = list(src.s.values())
        else:
            items = []
        if fn is not UNDEF:
            items = [interp.invoke(fn, [v, i]) for i, v in enumerate(items)]
        return JSArray(items)

    def array_ctor(*a):
        # Array(n) → n empty slots; Array(a, b, …) → elements (JS semantics)
        if len(a) == 1 and isinstance(a[0], (int, float)) and not isinstance(a[0], bool):
            return JSArray([UNDEF] * int(a[0]))
        return JSArray(a)

    array_ns = _CallableNamespace(array_ctor, {
        "isArray": lambda v=UNDEF: isinstance(v, list),
        "from": array_from,
        "of": lambda *a: JSArray(a),
    })

    number_ns_attrs = {
        "isFinite": lambda v=UNDEF: isinstance(v, (int, float)) and not isinstance(v, bool) and _math.isfinite(v),
        "isInteger": lambda v=UNDEF: isinstance(v, int) and not isinstance(v, bool) or (isinstance(v, float) and v.is_integer()),
        "isNaN": lambda v=UNDEF: isinstance(v, float) and v != v,
        "parseFloat": parse_float,
        "parseInt": parse_int,
        "MAX_SAFE_INTEGER": 2 ** 53 - 1,
        "MIN_SAFE_INTEGER": -(2 ** 53 - 1),
        "POSITIVE_INFINITY": float("inf"),
        "NEGATIVE_INFINITY": float("-inf"),
        "NaN": float("nan"),
        "EPSILON": 2.220446049250313e-16,
    }

    string_ns = _CallableNamespace(string_ctor, {
        "fromCharCode": lambda *a: "".join(chr(int(_to_number(x))) for x in a),
    })

    json_ns = _Namespace({
        "stringify": _json_stringify(interp),
        "parse": _json_parse,
    })

    return {
        "Math": math_ns,
        "JSON": json_ns,
        "Object": object_ns,
        "Array": array_ns,
        "Number": _CallableNamespace(number_ctor, number_ns_attrs),
        "String": string_ns,
        "Boolean": boolean_ctor,
        "parseInt": parse_int,
        "parseFloat": parse_float,
        "isNaN": lambda v=UNDEF: _to_number(v) != _to_number(v),
        "isFinite": lambda v=UNDEF: _math.isfinite(_to_number(v)),
        "NaN": float("nan"),
        "Infinity": float("inf"),
        "undefined": UNDEF,
        "Map": _js_map_ctor,
        "Set": _js_set_ctor,
        "encodeURIComponent": lambda s=UNDEF: _uri_component(_to_js_string(s)),
        "decodeURIComponent": lambda s=UNDEF: _uri_decode(_to_js_string(s)),
        "console": _Namespace({"log": lambda *a: UNDEF, "warn": lambda *a: UNDEF,
                               "error": lambda *a: UNDEF}),
    }


def _uri_component(s: str) -> str:
    import urllib.parse

    return urllib.parse.quote(s, safe="!'()*-._~")


def _uri_decode(s: str) -> str:
    import urllib.parse

    return urllib.parse.unquote(s)


# ------------------------------------------------------------ py <-> js glue


def py_to_js(v):
    if isinstance(v, dict):
        return JSObject({str(k): py_to_js(x) for k, x in v.items()})
    if isinstance(v, (list, tuple)):
        return JSArray(py_to_js(x) for x in v)
    return v


def js_to_py(v):
    if v is UNDEF:
        return None
    if isinstance(v, float) and v.is_integer() and abs(v) < 2 ** 53:
        return int(v)
    if isinstance(v, list):
        return [js_to_py(x) for x in v]
    if isinstance(v, dict):
        return {k: js_to_py(x) for k, x in v.items()}
    return v


class JSModule:
    """Convenience wrapper: load an ES module of pure functions, call its
    exports with Python values, get Python values back.

        mod = JSModule.load_file("youtu_rag_tpu/api/static/views/transforms.js")
        tree = mod.call("kbCardData", {...})
    """

    def __init__(self, source: str):
        self.interp = Interpreter()
        self.exports = self.interp.run_module(source)

    @classmethod
    def load_file(cls, path) -> "JSModule":
        with open(path, encoding="utf-8") as f:
            return cls(f.read())

    def call(self, name: str, *args):
        if name not in self.exports:
            raise JSError(f"module does not export {name!r} "
                          f"(exports: {sorted(self.exports)})")
        try:
            out = self.interp.call(self.exports[name], *args)
        except JSThrow as ex:
            raise JSError(f"uncaught JS exception in {name}: "
                          f"{_to_js_string(ex.value)}") from None
        return js_to_py(out)
