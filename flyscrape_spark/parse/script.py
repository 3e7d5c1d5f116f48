"""Python scrape-script API — the engine's analog of the reference's
JS scripting surface.

The reference compiles a user JS file and hands its default export a
``{doc, url, absoluteURL, scrape, follow}`` parameter object
(/root/reference/js.go:29-36, 155-246); ``doc`` is a goquery selection
wrapped with the element API of js.go:257-300. This engine has no JS
VM (SURVEY §2.1 #24: extraction rules are Python); the equivalent is a
plain Python function over :class:`Sel`, executed VECTORIZED — one
pandas UDF call per Arrow batch, the script applied per document
inside the batch (contrast the reference's global VM mutex,
js.go:225-226, which serializes all extraction).

Element API parity (js.go:257-300, goquery semantics):

========================  =============================================
JS (reference)            Python (:class:`Sel`)
========================  =============================================
find(sel)                 .find(sel)         descendants of each node
text()                    .text()            concat text of ALL nodes
name()                    .name()            tag of first node
html()                    .html()            outer HTML of FIRST node
attr(n) / hasAttr(n)      .attr(n) / .has_attr(n)   first node
hasClass(c)               .has_class(c)      ANY node
length / first/last/get   .length / .first()/.last()/.get(i)
next()/nextAll()          .next() / .next_all()
nextUntil(s)              .next_until(s)
prev()/prevAll()          .prev() / .prev_all()
prevUntil(s)              .prev_until(s)
siblings()/children()     .siblings() / .children()
parent()                  .parent()
map(cb) / filter(cb)      .map(cb) / .filter(cb)
========================  =============================================

Set semantics follow goquery: axis methods apply to EVERY node in the
selection, results are deduplicated and returned in document order.

:func:`make_script_udf` compiles a script into one pandas UDF returning
``struct<data: string, follow_urls: array<string>>`` — ``data`` is the
JSON-serialized return value (the reference wraps the export in
JSON.stringify, js.go:162; None = no output row, js_test.go:97-110),
``follow_urls`` are the absolutized URLs passed to ``ctx.follow``
(manual follow, js.go:217-219 -> scrape.go:210-212), which the crawl
engine unions into the next frontier generation.
"""

from __future__ import annotations

import json
from html import escape

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from flyscrape_spark.functions.urls import resolve
from flyscrape_spark.parse.html import Node, VOID_TAGS, parse_html, select

SCRIPT_TYPE = StructType(
    [
        StructField("data", StringType()),
        StructField("follow_urls", ArrayType(StringType())),
    ]
)


def _element_siblings(node: Node) -> list[Node]:
    if node.parent is None:
        return []
    return [c for c in node.parent.children if c.tag != "#text"]


def _render(node: Node) -> str:
    """Outer-HTML rendering (goquery.OuterHtml analog, js.go:262)."""
    if node.tag == "#text":
        return escape(node.data, quote=False)
    attrs = "".join(f' {k}="{escape(v)}"' for k, v in node.attrs.items())
    inner = "".join(_render(c) for c in node.children)
    if node.tag in VOID_TAGS and not node.children:
        return f"<{node.tag}{attrs}/>"
    return f"<{node.tag}{attrs}>{inner}</{node.tag}>"


def _doc_order(nodes: list[Node]) -> list[Node]:
    """Dedup (by identity) + document order, goquery result semantics."""
    seen: set[int] = set()
    out = []
    for n in sorted(nodes, key=lambda n: n.order):
        if id(n) not in seen:
            seen.add(id(n))
            out.append(n)
    return out


class Sel:
    """A node set with the reference element API (js.go:257-300)."""

    def __init__(self, nodes: list[Node]):
        self.nodes = nodes

    # -- basics ---------------------------------------------------------

    @property
    def length(self) -> int:
        return len(self.nodes)

    def text(self) -> str:
        return "".join(n.text() for n in self.nodes)

    def name(self) -> str:
        return self.nodes[0].tag if self.nodes else ""

    def html(self) -> str:
        return _render(self.nodes[0]) if self.nodes else ""

    def attr(self, name: str) -> str:
        # js.go:263: (v, _ := sel.Attr(name)) -> "" when absent
        return self.nodes[0].attrs.get(name, "") if self.nodes else ""

    def has_attr(self, name: str) -> bool:
        return bool(self.nodes) and name in self.nodes[0].attrs

    def has_class(self, cls: str) -> bool:
        return any(cls in n.classes() for n in self.nodes)

    def first(self) -> "Sel":
        return Sel(self.nodes[:1])

    def last(self) -> "Sel":
        return Sel(self.nodes[-1:])

    def get(self, index: int) -> "Sel":
        if 0 <= index < len(self.nodes):
            return Sel([self.nodes[index]])
        return Sel([])

    # -- search ---------------------------------------------------------

    def find(self, selector: str) -> "Sel":
        out: list[Node] = []
        for n in self.nodes:
            out.extend(select(n, selector))
        return Sel(_doc_order(out))

    # -- sibling / tree axes (js.go:271-279) -----------------------------

    def _axis(self, pick) -> "Sel":
        out: list[Node] = []
        for n in self.nodes:
            out.extend(pick(n))
        return Sel(_doc_order(out))

    def next(self) -> "Sel":
        def pick(n):
            sibs = _element_siblings(n)
            if n in sibs:
                i = sibs.index(n)
                if i + 1 < len(sibs):
                    return [sibs[i + 1]]
            return []

        return self._axis(pick)

    def next_all(self) -> "Sel":
        def pick(n):
            sibs = _element_siblings(n)
            return sibs[sibs.index(n) + 1:] if n in sibs else []

        return self._axis(pick)

    def next_until(self, selector: str) -> "Sel":
        from flyscrape_spark.parse.html import parse_selector

        chain = parse_selector(selector)

        def pick(n):
            out = []
            sibs = _element_siblings(n)
            if n not in sibs:
                return out
            for s in sibs[sibs.index(n) + 1:]:
                if chain and chain[-1].matches(s):
                    break
                out.append(s)
            return out

        return self._axis(pick)

    def prev(self) -> "Sel":
        def pick(n):
            sibs = _element_siblings(n)
            if n in sibs:
                i = sibs.index(n)
                if i > 0:
                    return [sibs[i - 1]]
            return []

        return self._axis(pick)

    def prev_all(self) -> "Sel":
        def pick(n):
            sibs = _element_siblings(n)
            return sibs[: sibs.index(n)] if n in sibs else []

        return self._axis(pick)

    def prev_until(self, selector: str) -> "Sel":
        from flyscrape_spark.parse.html import parse_selector

        chain = parse_selector(selector)

        def pick(n):
            out = []
            sibs = _element_siblings(n)
            if n not in sibs:
                return out
            for s in reversed(sibs[: sibs.index(n)]):
                if chain and chain[-1].matches(s):
                    break
                out.append(s)
            return out

        return self._axis(pick)

    def siblings(self) -> "Sel":
        return self._axis(
            lambda n: [s for s in _element_siblings(n) if s is not n]
        )

    def children(self) -> "Sel":
        return self._axis(lambda n: [c for c in n.children if c.tag != "#text"])

    def parent(self) -> "Sel":
        return self._axis(
            lambda n: [n.parent]
            if n.parent is not None and n.parent.tag != "#root"
            else []
        )

    # -- per-element transforms (js.go:280-298) --------------------------
    # JS callbacks declare any prefix of (element, index) and ignore
    # the rest; mirror that by passing only as many positional args as
    # the callback accepts (ported one-arg `post => ...` lambdas work).

    @staticmethod
    def _call(callback, sel: "Sel", i: int):
        import inspect

        try:
            params = inspect.signature(callback).parameters.values()
        except (TypeError, ValueError):  # builtins etc.
            return callback(sel, i)
        if any(p.kind == p.VAR_POSITIONAL for p in params):
            return callback(sel, i)
        n = sum(p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                for p in params)
        return callback(sel, i) if n >= 2 else callback(sel)

    def map(self, callback) -> list:
        return [self._call(callback, Sel([n]), i)
                for i, n in enumerate(self.nodes)]

    def filter(self, callback) -> "list[Sel]":
        return [
            Sel([n]) for i, n in enumerate(self.nodes)
            if self._call(callback, Sel([n]), i)
        ]


class ScriptContext:
    """The ScrapeParams object handed to a script (js.go:29-36):
    ``doc``, ``url``, ``absolute_url``, ``follow``. (``scrape`` — the
    synchronous nested fetch — is batch-shaped instead:
    plans/nested.py.)"""

    def __init__(self, doc: Sel, url: str):
        self.doc = doc
        self.url = url
        self._follow: list[str] = []

    def absolute_url(self, ref: str) -> str | None:
        """js.go:191-194 absoluteURL."""
        return resolve(self.url, ref) if ref is not None else None

    def follow(self, ref: str) -> None:
        """Manual follow (js.go:217-219 -> scrape.go:210-212): the URL
        is absolutized against the page URL and enqueued at depth+1.
        Empty/unresolvable refs are dropped (enqueueJob trims and
        drops empties, scrape.go:270-274)."""
        if not ref:
            return
        absolute = resolve(self.url, ref)
        if absolute:
            self._follow.append(absolute)


def run_script(fn, html: str, url: str) -> tuple[str | None, list[str]]:
    """Run one script invocation; returns (json_data, follow_urls).
    Shared by the vectorized UDF and the sequential test oracle."""
    ctx = ScriptContext(Sel([parse_html(html)]), url)
    value = fn(ctx)
    # None -> no output (undefined semantics, js_test.go:97-110);
    # NaN -> null happens naturally via json (allow_nan False would
    # throw; the reference's JSON.stringify emits null)
    data = None if value is None else json.dumps(
        value, sort_keys=True, default=lambda o: None
    )
    return data, ctx._follow


def make_script_udf(fn):
    """Compile a Python scrape script into a vectorized pandas UDF
    returning struct<data, follow_urls>. ``fn(ctx)`` receives a
    :class:`ScriptContext`; its return value is JSON-serialized."""

    @F.pandas_udf(SCRIPT_TYPE)
    def script_udf(body: pd.Series, url: pd.Series) -> pd.DataFrame:
        datas, follows = [], []
        for html, origin in zip(body, url):
            if not html:
                datas.append(None)
                follows.append([])
                continue
            data, follow_urls = run_script(fn, html, origin)
            datas.append(data)
            follows.append(follow_urls)
        return pd.DataFrame({"data": datas, "follow_urls": follows})

    return script_udf
