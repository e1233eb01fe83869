"""Minimal JavaScript lexical checker — the SPA syntax gate.

The image has no browser and no node, so the 1k+ lines of hand-written SPA
JS (api/static/) would otherwise ship unparsed (VERDICT r2 weak #6: one
typo bricks a tab and nothing notices). This is a *lexer-level* gate, not
a parser: it tokenizes comments, strings, template literals (with nested
``${}``), and regex literals (via the standard prev-token heuristic), and
verifies (1) every quote/comment terminates and (2) brackets balance and
nest correctly. That catches the realistic breakage class — unterminated
strings, stray/missing braces, truncated files — with zero dependencies.

Not a semantic check; a real browser drive remains blocked on the image
(documented in ROADMAP).
"""

from __future__ import annotations

from dataclasses import dataclass

_OPEN = {"(": ")", "[": "]", "{": "}"}
_CLOSE = {")": "(", "]": "[", "}": "{"}

# after one of these a `/` starts a regex literal, not division
_REGEX_PRECEDERS = set("([{,;=:!&|?+-*%^~<>") | {None}
_REGEX_KEYWORDS = {
    "return", "typeof", "instanceof", "in", "of", "new", "delete", "void",
    "throw", "case", "do", "else", "yield", "await",
}


@dataclass
class JsError:
    line: int
    message: str

    def __str__(self) -> str:  # pragma: no cover - repr convenience
        return f"line {self.line}: {self.message}"


def check_js(src: str) -> list[JsError]:
    """Lexical scan; returns [] when the source passes the gate."""
    errors: list[JsError] = []
    stack: list[tuple[str, int]] = []  # (bracket, line)
    line = 1
    i = 0
    n = len(src)
    prev_significant: str | None = None  # last non-space token fragment
    last_word = ""

    def regex_can_start() -> bool:
        if prev_significant is None:
            return True
        if prev_significant in _REGEX_PRECEDERS:
            return True
        return last_word in _REGEX_KEYWORDS

    while i < n:
        ch = src[i]
        if ch == "\n":
            line += 1
            i += 1
            continue
        if ch in " \t\r":
            i += 1
            continue
        # comments
        if ch == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            i = n if j == -1 else j
            continue
        if ch == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j == -1:
                errors.append(JsError(line, "unterminated block comment"))
                return errors
            line += src.count("\n", i, j)
            i = j + 2
            continue
        # strings
        if ch in ("'", '"'):
            start_line = line
            j = i + 1
            while j < n:
                c = src[j]
                if c == "\\":
                    j += 2
                    continue
                if c == ch:
                    break
                if c == "\n":
                    errors.append(JsError(start_line, f"unterminated string {ch}…{ch}"))
                    return errors
                j += 1
            else:
                errors.append(JsError(start_line, f"unterminated string {ch}…{ch}"))
                return errors
            i = j + 1
            prev_significant = '"'
            last_word = ""
            continue
        # template literal (may nest ${ … } which may nest more templates)
        if ch == "`":
            start_line = line
            j = i + 1
            depth = 0  # ${ nesting inside this template
            while j < n:
                c = src[j]
                if c == "\\":
                    j += 2
                    continue
                if c == "\n":
                    line += 1
                    j += 1
                    continue
                if depth == 0 and c == "`":
                    break
                if depth == 0 and c == "$" and j + 1 < n and src[j + 1] == "{":
                    depth = 1
                    j += 2
                    continue
                if depth > 0:
                    if c == "{":
                        depth += 1
                    elif c == "}":
                        depth -= 1
                    elif c in ("'", '"', "`"):
                        # nested string inside ${}: skip it naively
                        q = c
                        j += 1
                        while j < n and src[j] != q:
                            if src[j] == "\\":
                                j += 1
                            elif src[j] == "\n":
                                line += 1
                            j += 1
                        if j >= n:
                            errors.append(JsError(start_line, "unterminated template"))
                            return errors
                j += 1
            else:
                errors.append(JsError(start_line, "unterminated template literal"))
                return errors
            i = j + 1
            prev_significant = '"'
            last_word = ""
            continue
        # regex literal
        if ch == "/" and regex_can_start():
            start_line = line
            j = i + 1
            in_class = False
            ok = False
            while j < n:
                c = src[j]
                if c == "\\":
                    j += 2
                    continue
                if c == "\n":
                    break
                if c == "[":
                    in_class = True
                elif c == "]":
                    in_class = False
                elif c == "/" and not in_class:
                    ok = True
                    break
                j += 1
            if not ok:
                errors.append(JsError(start_line, "unterminated regex literal"))
                return errors
            # skip flags
            j += 1
            while j < n and src[j].isalpha():
                j += 1
            i = j
            prev_significant = '"'
            last_word = ""
            continue
        # brackets
        if ch in _OPEN:
            stack.append((ch, line))
            prev_significant = ch
            last_word = ""
            i += 1
            continue
        if ch in _CLOSE:
            if not stack:
                errors.append(JsError(line, f"unmatched closing {ch!r}"))
                return errors
            open_ch, open_line = stack.pop()
            if _OPEN[open_ch] != ch:
                errors.append(
                    JsError(line, f"mismatched {ch!r} (opened {open_ch!r} at line {open_line})")
                )
                return errors
            prev_significant = ch
            last_word = ""
            i += 1
            continue
        # identifiers / keywords (for the regex heuristic)
        if ch.isalnum() or ch in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            last_word = src[i:j]
            prev_significant = "a"
            i = j
            continue
        prev_significant = ch
        last_word = ""
        i += 1

    for open_ch, open_line in stack:
        errors.append(JsError(open_line, f"unclosed {open_ch!r}"))
    return errors


def check_file(path) -> list[JsError]:
    with open(path, encoding="utf-8") as f:
        return check_js(f.read())


# ---------------------------------------------------------------------------
# ES-module graph check: named imports must resolve to real exports
# ---------------------------------------------------------------------------

import re as _re
from pathlib import Path as _Path

_IMPORT_RE = _re.compile(
    r"import\s*(?:\{(?P<names>[^}]*)\}|(?P<default>[A-Za-z_$][\w$]*))\s*"
    r"from\s*[\"'](?P<path>[^\"']+)[\"']",
    _re.DOTALL,
)
_EXPORT_DECL_RE = _re.compile(
    r"export\s+(?:async\s+)?(?:function\s*\*?|const|let|var|class)\s+([A-Za-z_$][\w$]*)"
)
_EXPORT_LIST_RE = _re.compile(r"export\s*\{([^}]*)\}", _re.DOTALL)


def _strip_comments(src: str) -> str:
    # newlines inside block comments are preserved so error line numbers
    # computed against the stripped text match the original file
    src = _re.sub(
        r"/\*.*?\*/", lambda m: "\n" * m.group(0).count("\n"), src, flags=_re.DOTALL
    )
    return _re.sub(r"^\s*//.*$", "", src, flags=_re.MULTILINE)


def module_exports(src: str) -> set[str]:
    """Named exports of one module (declarations + export lists)."""
    src = _strip_comments(src)
    names = set(_EXPORT_DECL_RE.findall(src))
    for group in _EXPORT_LIST_RE.findall(src):
        for item in group.split(","):
            item = item.strip()
            if not item:
                continue
            # "orig as alias" exports the alias
            parts = item.split()
            names.add(parts[-1])
    if _re.search(r"export\s+default\b", src):
        names.add("default")
    return names


def check_modules(root) -> list[JsError]:
    """Cross-module gate over a directory of ES modules: every relative
    named import must resolve to a file that actually exports that name.
    Catches the breakage class the lexical gate can't — a typo'd import
    silently killing a whole view at load time."""
    root = _Path(root)
    files = sorted(root.rglob("*.js"))
    # keyed by resolved path so import-target lookups hit the cache
    exports = {
        f.resolve(): module_exports(f.read_text(encoding="utf-8")) for f in files
    }
    errors: list[JsError] = []
    for f in files:
        src = _strip_comments(f.read_text(encoding="utf-8"))
        for m in _IMPORT_RE.finditer(src):
            spec = m.group("path")
            if not spec.startswith("."):
                continue  # bare/URL specifiers are out of scope
            line = src.count("\n", 0, m.start()) + 1
            target = (f.parent / spec).resolve()
            if not target.is_file():
                errors.append(
                    JsError(line, f"{f.name}: import from missing module {spec!r}")
                )
                continue
            avail = exports.get(target)
            if avail is None:
                avail = exports[target] = module_exports(target.read_text(encoding="utf-8"))
            wanted: list[str] = []
            if m.group("default"):
                wanted.append("default")
            for item in (m.group("names") or "").split(","):
                item = item.strip()
                if item:
                    # "orig as alias" imports orig
                    wanted.append(item.split()[0])
            for name in wanted:
                if name not in avail:
                    errors.append(
                        JsError(
                            line,
                            f"{f.name}: {name!r} is not exported by {spec!r} "
                            f"(exports: {', '.join(sorted(avail)) or 'none'})",
                        )
                    )
    return errors
