"""Deterministic JS rendering for the fetch stage.

The reference's headline capability is Playwright navigation: pages
are rendered — inline scripts RUN — auto-scrolled, and links are
extracted from the LIVE DOM (playwrightcrawler.py:4926-5207,
:5174-5185, :4384-4397).  A sealed sandbox has no browser, so the
crawl pipeline exposes a render HOOK with the contract

    render_html(html: str, url: str = "", script_fetch=None) -> str

and this module provides the implementation: inline ``<script>``
blocks — and, when the caller supplies a ``script_fetch`` callback,
external ``<script src=…>`` sources fetched through it — are
**executed for real**, in document order (browser semantics), by the
sandboxed deterministic mini-JavaScript interpreter in
:mod:`.jsinterp` against a small DOM shim, so scripts that *compute*
URLs — string concatenation, loops,
``createElement``/``appendChild``, ``innerHTML``, ``location``
assignment, ``setTimeout`` bodies — contribute their links and images
to the rendered document.  Observable render behaviors:

1. ``document.write``/``writeln`` output is appended (with computed
   arguments, not just literals).
2. Elements created and ATTACHED to the document (``appendChild`` into
   ``document.body``/``head``/a queried node) are serialized into the
   output; created-but-never-attached nodes are dropped, matching live
   -DOM extraction.
3. ``innerHTML`` assignments on in-document nodes contribute HTML.
4. ``location.href`` assignment (and ``location.assign/replace``,
   ``window.open``) contribute the target as a link.
5. lazy-load promotion: ``data-src`` → ``src`` on ``<img>`` (what the
   reference's auto-scroll triggers).
6. Scripts on one page share one global environment (browser
   semantics): ``<script>var b='/x'</script><script>…b…</script>``
   works.

Execution is bounded (shared per-page step budget, parse-depth,
string-size and output-size caps) and deterministic (fixed-seed
``Math.random``, constant ``Date.now`` — see jsinterp).  A script the
interpreter cannot run (syntax outside the subset, budget, uncaught
throw) has its DOM effects ROLLED BACK and degrades to the round-3
literal ``document.write`` scan for that one script, so hostile or
exotic pages cost bounded CPU and never fail the fetch task.

On a real deployment the hook is replaced by a Playwright page actor
with the same signature; everything downstream (parse, offers, image
refs, the sequential oracle) is renderer-agnostic because engine and
oracle share this function through stages/process.py.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from .jsinterp import (
    Interp, JsError, JSArray, JSObject, NativeFn, UNDEF, js_str,
    std_globals,
)

_SCRIPT_RE = re.compile(
    r"<script\b([^>]*)>(.*?)</script>", re.I | re.S
)
_WRITE_RE = re.compile(
    r"""document\.write(?:ln)?\(\s*(['"])(.*?)\1\s*\)""", re.S
)
_DATASRC_RE = re.compile(r"(<img\b[^>]*?)\bdata-src(\s*=)", re.I)
_SRC_ATTR_RE = re.compile(r"""\bsrc\s*=""", re.I)
_SRC_VAL_RE = re.compile(
    r"""\bsrc\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>'"]+))""", re.I)
_TYPE_ATTR_RE = re.compile(r"""\btype\s*=\s*["']?([^"'\s>]+)""", re.I)

_JS_TYPES = {"", "text/javascript", "application/javascript",
             "module", "text/ecmascript"}
_PAGE_STEP_BUDGET = 500_000
_MAX_OUTPUT = 2 << 20  # 2 MiB of rendered additions per page

# element properties that reflect to HTML attributes when assigned
_ATTR_PROPS = {"src", "href", "id", "alt", "title", "rel", "type",
               "name", "value", "target", "action", "poster", "content",
               "data"}
_VOID_TAGS = {"img", "br", "hr", "input", "meta", "link", "source",
              "area", "base", "col", "embed", "track", "wbr"}


class _Sink:
    """Ordered chunks of HTML the scripts added to the document."""

    def __init__(self):
        self.chunks: list[str] = []
        self.size = 0

    def add(self, s: str):
        self.size += len(s)
        if self.size > _MAX_OUTPUT:
            raise JsError("render output too large")
        self.chunks.append(s)

    def mark(self):
        return len(self.chunks), self.size

    def rollback(self, mark):
        n, sz = mark
        del self.chunks[n:]
        self.size = sz


def _esc_attr(v: str) -> str:
    return v.replace("&", "&amp;").replace('"', "&quot;")


class _Dom:
    """DOM shim: element records + JSObject facades for the interp."""

    def __init__(self, sink: _Sink, url: str):
        self.sink = sink
        self.roots: list[dict] = []   # attached subtree roots, in order
        self.url = url
        # 'load'/'DOMContentLoaded' callbacks — fired once after every
        # script has run (the settle point Playwright waits for)
        self.load_handlers: list = []

    # ---- element model
    def new_elem(self, tag: str) -> JSObject:
        rec = {"tag": tag.lower(), "attrs": {}, "children": [],
               "inner": ""}
        facade = JSObject()
        rec["facade"] = facade

        def _set(obj, args):
            name, value = args[0], args[1]
            obj.props[name] = value
            if name in _ATTR_PROPS:
                rec["attrs"][name] = js_str(value)
            elif name == "className":
                rec["attrs"]["class"] = js_str(value)
            elif name in ("innerHTML", "outerHTML"):
                rec["inner"] = js_str(value)
            elif name in ("textContent", "innerText"):
                rec["inner"] = (js_str(value).replace("&", "&amp;")
                                .replace("<", "&lt;"))

        def _set_attr(this, args):
            if args:
                rec["attrs"][js_str(args[0])] = (
                    js_str(args[1]) if len(args) > 1 else "")
            return UNDEF

        def _get_attr(this, args):
            if args:
                return rec["attrs"].get(js_str(args[0]), None)
            return None

        def _append(this, args):
            for child in args:
                if isinstance(child, JSObject) and "_rec" in child.props:
                    rec["children"].append(child.props["_rec"])
                else:
                    rec["children"].append({"text": js_str(child)})
            return args[0] if args else UNDEF

        facade.props.update({
            "_rec": rec,
            "__set__": NativeFn(_set, "setprop"),
            "tagName": tag.upper(),
            "setAttribute": NativeFn(_set_attr, "setAttribute"),
            "getAttribute": NativeFn(_get_attr, "getAttribute"),
            "appendChild": NativeFn(_append, "appendChild"),
            "append": NativeFn(_append, "append"),
            "insertBefore": NativeFn(
                lambda this, a: _append(this, a[:1]), "insertBefore"),
            "addEventListener": NativeFn(lambda this, a: UNDEF, "ael"),
            "removeChild": NativeFn(
                lambda this, a: a[0] if a else UNDEF, "removeChild"),
            "style": JSObject({"__set__": NativeFn(
                lambda obj, a: obj.props.__setitem__(a[0], a[1]),
                "style")}),
        })
        return facade

    def attached_elem(self, tag: str) -> JSObject:
        el = self.new_elem(tag)
        self.roots.append(el.props["_rec"])
        return el

    def serialize_roots(self) -> list[str]:
        out = []
        for rec in self.roots:
            s = rec["inner"] + "".join(
                self._ser(c) for c in rec["children"])
            if s:
                out.append(s)
        return out

    def _ser(self, rec: dict) -> str:
        if "text" in rec:
            return rec["text"]
        attrs = "".join(f' {k}="{_esc_attr(v)}"'
                        for k, v in rec["attrs"].items())
        inner = rec["inner"] + "".join(self._ser(c)
                                       for c in rec["children"])
        if rec["tag"] in _VOID_TAGS and not inner:
            return f"<{rec['tag']}{attrs}>"
        return f"<{rec['tag']}{attrs}>{inner}</{rec['tag']}>"

    # ---- document / window / location facades
    def location_obj(self) -> JSObject:
        parts = urlsplit(self.url) if self.url else None
        loc = JSObject()

        def _set(obj, args):
            name, value = args[0], args[1]
            obj.props[name] = value
            if name == "href":
                self.sink.add(f'<a href="{_esc_attr(js_str(value))}"></a>')

        def _go(this, args):
            if args:
                self.sink.add(
                    f'<a href="{_esc_attr(js_str(args[0]))}"></a>')
            return UNDEF

        loc.props.update({
            "__set__": NativeFn(_set, "setloc"),
            "href": self.url,
            "protocol": (parts.scheme + ":") if parts else "",
            "host": parts.netloc if parts else "",
            "hostname": (parts.hostname or "") if parts else "",
            "pathname": (parts.path or "/") if parts else "",
            "search": ("?" + parts.query if parts and parts.query
                       else ""),
            "hash": "",
            "origin": (f"{parts.scheme}://{parts.netloc}"
                       if parts else ""),
            "assign": NativeFn(_go, "assign"),
            "replace": NativeFn(_go, "replace"),
            "toString": NativeFn(lambda this, a: self.url, "toString"),
        })
        return loc

    def globals(self) -> dict:
        sink = self.sink
        body = self.attached_elem("body")
        head = self.attached_elem("head")
        loc = self.location_obj()

        def _write(this, args):
            for a in args:
                sink.add(js_str(a))
            return UNDEF

        def _writeln(this, args):
            for a in args:
                sink.add(js_str(a) + "\n")
            return UNDEF

        def _create(this, args):
            return self.new_elem(js_str(args[0]) if args else "div")

        def _create_text(this, args):
            el = JSObject()
            el.props["_rec"] = {"text": js_str(args[0]) if args else ""}
            return el

        def _query(this, args):
            # in-document node: whatever the script hangs on it renders
            return self.attached_elem("div")

        def _query_all(this, args):
            return JSArray([self.attached_elem("div")])

        def _ael(this, args):
            # collect load-time callbacks; other event types never fire
            # in a render (no user input exists)
            if len(args) >= 2 and js_str(args[0]) in (
                    "load", "DOMContentLoaded", "readystatechange"):
                self.load_handlers.append(args[1])
            return UNDEF

        def _onload_set(obj, a):
            obj.props[a[0]] = a[1]
            if a[0] in ("onload", "ondomcontentloaded"):
                self.load_handlers.append(a[1])

        document = JSObject({
            "write": NativeFn(_write, "write"),
            "writeln": NativeFn(_writeln, "writeln"),
            "createElement": NativeFn(_create, "createElement"),
            "createTextNode": NativeFn(_create_text, "createTextNode"),
            "getElementById": NativeFn(_query, "getElementById"),
            "querySelector": NativeFn(_query, "querySelector"),
            "querySelectorAll": NativeFn(_query_all, "qsa"),
            "getElementsByTagName": NativeFn(_query_all, "gebtn"),
            "getElementsByClassName": NativeFn(_query_all, "gebcn"),
            "body": body,
            "head": head,
            "documentElement": self.attached_elem("html"),
            "location": loc,
            "cookie": "",
            "title": "",
            "addEventListener": NativeFn(_ael, "ael"),
            "__set__": NativeFn(
                lambda obj, a: (
                    _onload_set(obj, a),
                    sink.add(f'<a href="{_esc_attr(js_str(a[1]))}"></a>')
                    if a[0] == "location" else None)[0],
                "setdoc"),
        })

        window = JSObject({
            "document": document,
            "location": loc,
            "addEventListener": NativeFn(_ael, "ael"),
            "open": NativeFn(
                lambda this, a: (sink.add(
                    f'<a href="{_esc_attr(js_str(a[0]))}"></a>')
                    if a else None) or UNDEF, "open"),
            "innerWidth": 1280.0,
            "innerHeight": 720.0,
            "scrollTo": NativeFn(lambda this, a: UNDEF, "scrollTo"),
            "__set__": NativeFn(
                lambda obj, a: (
                    _onload_set(obj, a),
                    sink.add(f'<a href="{_esc_attr(js_str(a[1]))}"></a>')
                    if a[0] == "location" else None)[0],
                "setwin"),
        })
        window.props["window"] = window
        window.props["self"] = window
        window.props["top"] = window

        g = {
            "document": document,
            "window": window,
            "location": loc,
            "navigator": JSObject({"userAgent": "ray-crawl-render/1.0"}),
            "screen": JSObject({"width": 1280.0, "height": 720.0}),
            "alert": NativeFn(lambda this, a: UNDEF, "alert"),
        }
        return g


class _TimerHost:
    """setTimeout runs its callback synchronously (deterministic
    equivalent of the reference's settle-wait after navigation);
    setInterval is a no-op (unbounded by construction)."""

    def __init__(self, interp_ref: list):
        self.interp_ref = interp_ref

    def globals(self) -> dict:
        def _timeout(this, args):
            if args and not isinstance(args[0], str):
                interp = self.interp_ref[0]
                if interp is not None:
                    interp.call_function(args[0], [])
            return 0.0

        return {
            "setTimeout": NativeFn(_timeout, "setTimeout"),
            "setInterval": NativeFn(lambda this, a: 0.0, "setInterval"),
            "clearTimeout": NativeFn(lambda this, a: UNDEF, "ct"),
            "clearInterval": NativeFn(lambda this, a: UNDEF, "ci"),
            "requestAnimationFrame": NativeFn(
                lambda this, a: _timeout(this, a), "raf"),
        }


def _literal_writes(script_src: str) -> list[str]:
    """Round-3 fallback: string-literal document.write args only."""
    return [m.group(2) for m in _WRITE_RE.finditer(script_src)]


def render_html(text: str, url: str = "",
                script_fetch=None) -> str:
    """Render dynamic HTML deterministically (module docstring).

    ``script_fetch(abs_url) -> str | None`` resolves external
    ``<script src=…>`` sources (the browser's subresource fetch during
    navigation — the reference's Playwright runs every such script,
    playwrightcrawler.py:5174-5185); ``None``/no callback skips that
    script, matching the pre-round-5 behavior. Inline and external
    scripts execute interleaved in document order against ONE shared
    page environment, exactly as a browser would."""
    from urllib.parse import urljoin

    scripts = []
    for m in _SCRIPT_RE.finditer(text):
        attrs, src = m.group(1), m.group(2)
        tm = _TYPE_ATTR_RE.search(attrs)
        if tm and tm.group(1).lower() not in _JS_TYPES:
            continue  # JSON / template payloads are not executed
        sm = _SRC_VAL_RE.search(attrs)
        if sm:
            if script_fetch is None:
                continue  # external script, no fetcher: skip (round-4)
            rel = sm.group(1) or sm.group(2) or sm.group(3) or ""
            rel = rel.strip()
            if not rel or rel.lower().startswith(("data:", "javascript:")):
                continue
            try:
                fetched = script_fetch(urljoin(url, rel))
            except Exception:
                fetched = None  # unfetchable subresource: browser skips
            if fetched is None:
                continue
            scripts.append(fetched)
        else:
            scripts.append(src)

    out = _DATASRC_RE.sub(r"\1src\2", text)
    if not scripts:
        return out

    sink = _Sink()
    dom = _Dom(sink, url)
    interp_ref: list = [None]
    g = std_globals()
    g.update(dom.globals())
    g.update(_TimerHost(interp_ref).globals())
    interp = Interp(g, max_steps=_PAGE_STEP_BUDGET)
    interp_ref[0] = interp

    from .jsinterp import JsThrow

    for src in scripts:
        mark = sink.mark()
        try:
            interp.run(src)
        except (JsError, JsThrow):
            # roll back this script's partial DOM effects, degrade to
            # the literal scan (round-3 behavior) for it
            sink.rollback(mark)
            for lit in _literal_writes(src):
                try:
                    sink.add(lit)
                except JsError:
                    break
        except RecursionError:  # pragma: no cover - parser depth caps first
            sink.rollback(mark)

    # fire load-time callbacks once all scripts ran (the settle point
    # Playwright waits for); a crashing handler keeps its prior effects
    # (browser semantics) but never fails the render
    for fn in dom.load_handlers:
        try:
            interp.call_function(fn, [])
        except (JsError, JsThrow, RecursionError):
            pass

    chunks = sink.chunks + dom.serialize_roots()
    if chunks:
        out = out + "\n" + "\n".join(chunks)
    return out
