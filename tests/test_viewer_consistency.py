"""Static consistency checks for the no-build viewer (no JS runtime exists
in this image, so cross-reference the sources instead of executing them):

  * every `$("#id")` / `querySelector("#id")` in the JS exists in index.html;
  * every `api.<method>` used by app/viewport/overview is defined in api.js;
  * every backend command name the JS posts to (`call("name")` and literal
    fetch("/api/name")) is registered on the service;
  * every template class the JS queries exists in the row template.
"""

import pathlib
import re

VIEWER = pathlib.Path(__file__).resolve().parent.parent / "thesia_tpu" / "viewer"


def _js_sources():
    return {p.name: p.read_text() for p in sorted((VIEWER / "js").glob("*.js"))}


def test_dom_ids_exist():
    html = (VIEWER / "index.html").read_text()
    html_ids = set(re.findall(r'id="([\w-]+)"', html))
    referenced = set()
    for src in _js_sources().values():
        referenced |= set(re.findall(r'\$\("#([\w-]+)"\)', src))
        referenced |= set(re.findall(r'querySelector\("#([\w-]+)"\)', src))
    missing = referenced - html_ids
    assert not missing, f"JS references missing DOM ids: {sorted(missing)}"


def test_template_classes_exist():
    html = (VIEWER / "index.html").read_text()
    html_classes = set(re.findall(r'class="([\w -]+)"', html))
    flat = set()
    for cluster in html_classes:
        flat |= set(cluster.split())
    referenced = set()
    for src in _js_sources().values():
        referenced |= set(re.findall(r'querySelector\("\.([\w-]+)"\)', src))
    missing = referenced - flat
    assert not missing, f"JS queries missing classes: {sorted(missing)}"


def test_api_methods_defined():
    srcs = _js_sources()
    api_src = srcs["api.js"]
    defined = set(re.findall(r"^\s{2}(\w+):", api_src, re.M))
    used = set()
    for name, src in srcs.items():
        if name == "api.js":
            continue
        used |= set(re.findall(r"\bapi\.(\w+)\(", src))
    missing = used - defined
    assert not missing, f"api.js lacks methods used elsewhere: {sorted(missing)}"


def test_posted_commands_are_registered():
    from thesia_tpu.engine.axis_api import AXIS_COMMANDS
    from thesia_tpu.engine.service import COMMANDS, MISC_COMMANDS

    registered = set(COMMANDS) | set(AXIS_COMMANDS) | set(MISC_COMMANDS)
    posted = set()
    for src in _js_sources().values():
        posted |= set(re.findall(r'call\("(\w+)"', src))
        posted |= set(re.findall(r'callBinary\("(\w+)"', src))
        posted |= set(re.findall(r'fetch\("/api/(\w+)"', src))
    missing = posted - registered
    assert not missing, f"viewer posts unregistered commands: {sorted(missing)}"


def test_non_api_routes_exist():
    """Literal non-/api fetches map to registered aiohttp routes."""
    from thesia_tpu.engine.service import EngineService
    from thesia_tpu.engine.session import EngineSession
    import tempfile

    app = EngineService(
        EngineSession(settings_dir=tempfile.mkdtemp()), viewer_dir=str(VIEWER)
    ).make_app()
    route_paths = set()
    for r in app.router.routes():
        info = r.resource.get_info() if r.resource else {}
        p = info.get("path") or info.get("formatter") or info.get("prefix")
        if p:
            route_paths.add(p)
    posted = set()
    pattern = re.compile(r'fetch\(["`\'](/[\w/]+)')
    for src in _js_sources().values():
        posted |= {u for u in pattern.findall(src) if not u.startswith("/api")}
    unmatched = {
        p
        for p in posted
        if not any(p == rp or rp.endswith("{command}") or p.startswith(rp.rstrip("/")) for rp in route_paths)
    }
    assert not unmatched, f"viewer fetches unrouted paths: {sorted(unmatched)} vs {sorted(route_paths)}"
