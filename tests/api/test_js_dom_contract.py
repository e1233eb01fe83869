"""Cross-layer DOM contracts for the SPA, checked without a JS runtime.

A true DOM-stub harness needs *some* JS engine; this image has none
(verified: no node/deno/bun binaries, no quickjs/duktape/mini-racer
python modules or sources, no Chrome for a WebView). What CAN be checked
hermetically is the contract between the JS and everything it touches:

- every ``document.getElementById("…")`` resolves to an id defined in
  index.html or created by some shipped module (catches renamed/removed
  mount points — a real class of render breakage);
- every CSS class the views attach via ``h(tag, {class: …})`` with a
  styled name is actually styled (catches typo'd badge/chart classes);
- every route in app.js maps to an exported render function in the view
  module it imports from.

Route/i18n/import-graph contracts live in test_spa.py / test_js_gate.py.
Reference slot: the runtime verification rag_webui's frontend gets from
humans driving it (frontend/rag_webui/assets/js/**).
"""

import re
from pathlib import Path

STATIC = Path(__file__).parents[2] / "youtu_rag_tpu" / "api" / "static"
JS_FILES = sorted(STATIC.rglob("*.js"))
INDEX = (STATIC / "index.html").read_text()


def _defined_ids() -> set[str]:
    ids = set(re.findall(r'\bid="([\w-]+)"', INDEX))
    for f in JS_FILES:
        text = f.read_text()
        # h(tag, { id: "x" }) object-literal ids
        ids |= set(re.findall(r'\bid:\s*"([\w-]+)"', text))
        # ids inside template-literal / string HTML
        ids |= set(re.findall(r'id="([\w-]+)"', text))
        # ids built with template params count as dynamic — collect prefix
        ids |= {m + "*" for m in re.findall(r'id:\s*`([\w-]+)\$\{', text)}
        ids |= {m + "*" for m in re.findall(r'id="([\w-]+)\$\{', text)}
    return ids


def test_get_element_by_id_targets_exist():
    defined = _defined_ids()
    prefixes = tuple(d[:-1] for d in defined if d.endswith("*"))
    missing = []
    for f in JS_FILES:
        text = f.read_text()
        for line_no, line in enumerate(text.splitlines(), 1):
            for ref in re.findall(r'getElementById\("([\w-]+)"\)', line):
                if ref not in defined and not ref.startswith(prefixes):
                    missing.append(f"{f.name}:{line_no} #{ref}")
            # template-parameterized lookups: getElementById(`x${i}`)
            for ref in re.findall(r"getElementById\(`([\w-]+)\$\{", line):
                if not any(p.startswith(ref) or ref.startswith(p) for p in prefixes) \
                        and not any(d.startswith(ref) for d in defined):
                    missing.append(f"{f.name}:{line_no} #{ref}…")
    assert not missing, f"getElementById targets never defined: {missing}"


def test_status_badge_and_chart_classes_styled():
    """The views' structural classes (badges, chart bars, modal, toast)
    must exist in style.css — a typo silently unstyles status displays."""
    css = (STATIC / "style.css").read_text()
    styled = set(re.findall(r"\.([\w-]+)", css))
    required = set()
    for f in JS_FILES:
        text = f.read_text()
        for cls in re.findall(r'class:\s*"([\w -]+)"', text):
            required |= set(cls.split())
    # dynamic `class:` template literals: check their static first word
    for f in JS_FILES:
        for cls in re.findall(r"class:\s*`([\w-]+)[ $]", f.read_text()):
            required.add(cls)
    missing = sorted(c for c in required if c not in styled)
    assert not missing, f"classes used by views but absent from style.css: {missing}"


def test_router_targets_are_exported_render_fns():
    app_js = (STATIC / "app.js").read_text()
    wired = re.findall(r"\[/\^#[^,]+,\s*(render\w+)", app_js)
    assert len(wired) >= 6, f"router table unexpectedly small: {wired}"
    imports = dict(
        (name, mod)
        for names, mod in re.findall(r'import \{([^}]+)\} from "\./(views/\w+\.js)"', app_js)
        for name in [n.strip() for n in names.split(",")]
    )
    for fn in wired:
        assert fn in imports, f"router wires {fn} but app.js never imports it"
        target = (STATIC / imports[fn]).read_text()
        assert re.search(rf"export (async )?function {fn}\s*\(\s*view", target), (
            f"{imports[fn]} must export `{fn}(view, …)` — the router calls "
            "render(view, hash)"
        )


def test_spa_fetch_targets_resolve_to_routes():
    """Every fetch/api() URL in the views must match a route pattern in
    app.py (catches typo'd endpoints — runtime 404s a JS engine would
    surface, checked statically instead)."""
    app_py = (Path(__file__).parents[2] / "youtu_rag_tpu" / "api" / "app.py").read_text()
    routes = re.findall(r'\(r"(/[^"]+)"', app_py)
    patterns = [re.compile(re.sub(r"\([^)]*\)", "[^/]+", r.rstrip("$")) + r"(\?.*)?$")
                for r in routes]

    missing = []
    for f in JS_FILES:
        for line_no, line in enumerate(f.read_text().splitlines(), 1):
            for m in re.finditer(r'(?:\bapi|\bfetch)\(\s*[`"](/[^`"]*)', line):
                url = m.group(1)
                # template params → a literal placeholder segment
                url = re.sub(r"\$\{[^}]*\}", "X", url)
                url = url.split("?")[0]
                if not any(p.fullmatch(url) or p.match(url) for p in patterns):
                    missing.append(f"{f.name}:{line_no} {m.group(1)}")
    assert not missing, f"SPA fetches unmatched by any app.py route: {missing}"
