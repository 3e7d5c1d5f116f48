"""Pure-Python HTML parsing core shared by the vectorized UDFs and the
sequential test oracle.

Re-implements the subset of goquery/cascadia the reference uses
(/root/reference/js.go:257-300 element API;
modules/followlinks/followlinks.go:37-108 link extraction) on top of
stdlib ``html.parser`` — no lxml in this container.  This module is
plain Python by design: it only ever runs inside Arrow-batched pandas
UDFs (one call per document, thousands of documents per batch), never
per-row Spark UDFs.

Pieces:
- :class:`Node` / :func:`parse_html` — a DOM-lite document tree.
- :func:`select` — CSS selector subset: descendant chains of simple
  selectors ``tag``, ``.class``, ``#id``, ``[attr]``, ``[attr=val]``
  (covers every selector in the reference's tests and examples).
- :func:`selector_attr` — the attr-from-selector rule: the first word
  of the LAST ``[...]`` group anywhere in the selector, else ``href``
  (followlinks.go:110-117).
- :func:`extract_spans` — interleaved text/link/media spans in document
  order (the BASELINE.json input_hint payload).
- :func:`extract_links` — the reference's exact follow semantics:
  per-selector document-order matches, resolve against origin,
  http/https-only, first-seen dedup across all selectors
  (followlinks.go:63-94).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

from flyscrape_spark.functions.urls import resolve

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
SKIP_TEXT_TAGS = frozenset(("script", "style", "noscript", "template"))


@dataclass(slots=True)
class Node:
    tag: str  # element tag, or "#text"
    attrs: dict[str, str] = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)
    parent: "Node | None" = None
    data: str = ""  # text content for #text nodes
    order: int = 0  # document-order index (set at parse; Sel sorting)

    def iter_elements(self):
        """Depth-first document-order walk over element nodes."""
        for child in self.children:
            if child.tag != "#text":
                yield child
                yield from child.iter_elements()

    def text(self) -> str:
        """Concatenated descendant text (goquery Selection.Text()
        analog, /root/reference/js.go:260)."""
        out: list[str] = []
        self._collect_text(out)
        return "".join(out)

    def _collect_text(self, out: list[str]) -> None:
        if self.tag in SKIP_TEXT_TAGS:
            return
        for child in self.children:
            if child.tag == "#text":
                out.append(child.data)
            else:
                child._collect_text(out)

    def classes(self) -> set[str]:
        return set(self.attrs.get("class", "").split())


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]
        self._order = 0

    def _append(self, node: Node) -> None:
        node.parent = self.stack[-1]
        node.order = self._order
        self._order += 1
        self.stack[-1].children.append(node)

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._append(Node(tag, {k: (v if v is not None else "") for k, v in attrs}))

    def handle_endtag(self, tag):
        # close the nearest matching open tag (lenient, browser-like)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._append(Node("#text", data=data))


def _stdlib_parse(html: str) -> Node:
    builder = _TreeBuilder()
    try:
        builder.feed(html or "")
        builder.close()
    except Exception:
        pass  # lenient: return whatever parsed (reference returns nil links on parse error)
    return builder.root


# ------------------------------------------------- fast scanning parser
#
# html.parser spends ~70% of the page-UDF's CPU (profiled); this scanner
# handles the well-formed constructs that dominate real crawl HTML with
# plain find/regex-match and BAILS OUT (returns None -> full stdlib
# reparse) on anything whose tolerant-parser semantics are subtle:
# malformed start tags, exotic attribute punctuation, marked sections,
# stray '<'. Equality with _stdlib_parse on every non-bail input is
# differential-fuzz-pinned (tests/test_parse.py).

_FAST_TAG = re.compile(r"([a-zA-Z][a-zA-Z0-9:._-]*)")
_FAST_ATTR = re.compile(
    r"\s+([a-zA-Z_:@][-a-zA-Z0-9_:.@]*)"
    r"(?:\s*=+\s*(\"([^\"]*)\"|'([^']*)'|(?!['\"])([^>\s]*)))?"
)
_RAW_END = {
    t: re.compile(r"</" + t + r"\s*>", re.IGNORECASE)
    for t in ("script", "style")
}
_WS = " \t\r\n\f"
_ENDTAG_CLOSE = re.compile(r"\s*>")


def _fast_parse(s: str) -> Node | None:  # noqa: C901 — one hot loop by design
    root = Node("#root")
    stack = [root]
    order = 0
    i, n = 0, len(s)
    find = s.find
    while i < n:
        lt = find("<", i)
        if lt != i:
            seg = s[i:] if lt == -1 else s[i:lt]
            node = Node("#text", {}, [], stack[-1],
                        unescape(seg) if "&" in seg else seg, order)
            order += 1
            stack[-1].children.append(node)
            if lt == -1:
                return root
        c = s[lt + 1] if lt + 1 < n else ""
        if c == "/":
            m = _FAST_TAG.match(s, lt + 2)
            if m is None:
                return None  # '</ x', '</>', '</!': bogus-comment rules
            m2 = _ENDTAG_CLOSE.match(s, m.end())
            if m2 is None:
                return None  # junk between name and '>': tolerant rules
            tag = m.group(1).lower()
            for j in range(len(stack) - 1, 0, -1):
                if stack[j].tag == tag:
                    del stack[j:]
                    break
            i = m2.end()
        elif c == "!" or c == "?":
            if s.startswith("<!--", lt):
                e = find("-->", lt + 4)
                if e == -1:
                    return None
                i = e + 3
            elif s.startswith("<![", lt):
                return None  # marked section: ']>' terminator rules
            else:
                gt = find(">", lt)
                if gt == -1:
                    return None
                i = gt + 1
        elif c.isalpha():
            m = _FAST_TAG.match(s, lt + 1)
            if m is None:
                return None  # non-ASCII letter: stdlib treats '<' as data
            tag = m.group(1).lower()
            j = m.end()
            attrs: dict[str, str] = {}
            while True:
                am = _FAST_ATTR.match(s, j)
                if am is None:
                    break
                if am.group(3) is not None:
                    val = am.group(3)
                elif am.group(4) is not None:
                    val = am.group(4)
                elif am.group(5) is not None:
                    val = am.group(5)
                else:
                    val = ""
                attrs[am.group(1).lower()] = (
                    unescape(val) if "&" in val else val
                )
                j = am.end()
            # trailing junk: whitespace and '/' not directly before '>'
            # are separators (attrfind_tolerant's (?:\s|/(?!>))*);
            # '/>' exactly is a startendtag
            while j < n and (
                s[j] in _WS
                or (s[j] == "/" and not (j + 1 < n and s[j + 1] == ">"))
            ):
                j += 1
            selfclose = False
            if j + 1 < n and s[j] == "/" and s[j + 1] == ">":
                selfclose = True
                j += 1
            if j >= n or s[j] != ">":
                return None  # tolerant-parser territory
            i = j + 1
            node = Node(tag, attrs, [], stack[-1], "", order)
            order += 1
            stack[-1].children.append(node)
            if selfclose:
                continue  # startendtag: appended, never pushed
            if tag in VOID_TAGS:
                continue
            stack.append(node)
            if tag in _RAW_END:
                em = _RAW_END[tag].search(s, i)
                if em is None:
                    return None  # unterminated rawtext: close() semantics
                if em.start() > i:
                    data = Node("#text", {}, [], node, s[i:em.start()], order)
                    order += 1
                    node.children.append(data)
                i = em.start()  # generic endtag branch pops it
        else:
            return None  # literal '<' in text: stdlib's char-ref rules
    return root


def parse_html(html: str) -> Node:
    if not html:
        return Node("#root")
    root = _fast_parse(html)
    return root if root is not None else _stdlib_parse(html)


# ---------------------------------------------------------------- selectors

_SIMPLE_RE = re.compile(
    r"(?P<tag>[\w-]+|\*)?"
    r"(?P<quals>(?:[.#][\w-]+|\[[^\]]*\])*)"
)
_QUAL_RE = re.compile(r"([.#][\w-]+|\[[^\]]*\])")


@dataclass
class SimpleSelector:
    tag: str | None
    sel_id: str | None
    classes: tuple[str, ...]
    attrs: tuple[tuple[str, str | None], ...]  # (name, required value or None)
    #: combinator relating this selector to the PREVIOUS one in the
    #: chain: " " descendant (default) or ">" child
    combinator: str = " "

    def matches(self, node: Node) -> bool:
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        if self.sel_id and node.attrs.get("id") != self.sel_id:
            return False
        if self.classes and not set(self.classes) <= node.classes():
            return False
        for name, value in self.attrs:
            if name not in node.attrs:
                return False
            if value is not None and node.attrs[name] != value:
                return False
        return True


_SELECTOR_CACHE: dict[str, list["SimpleSelector"]] = {}


def parse_selector(selector: str) -> list[SimpleSelector]:
    """Parse a chain of simple selectors joined by descendant (space)
    or child (``>``) combinators — the two goquery spellings the
    reference's shipped scripts use (e.g. ``.titleline > a``).
    Memoized: the page UDF re-selects the same few selectors for
    every document of every batch."""
    cached = _SELECTOR_CACHE.get(selector)
    if cached is not None:
        return cached
    chain: list[SimpleSelector] = []
    pending = " "
    for token in selector.replace(">", " > ").split():
        if token == ">":
            pending = ">"
            continue
        m = _SIMPLE_RE.match(token)
        if not m:
            continue
        tag = m.group("tag")
        sel_id = None
        classes: list[str] = []
        attrs: list[tuple[str, str | None]] = []
        for qual in _QUAL_RE.findall(m.group("quals") or ""):
            if qual.startswith("."):
                classes.append(qual[1:])
            elif qual.startswith("#"):
                sel_id = qual[1:]
            else:  # [attr] or [attr=val] / [attr="val"]
                body = qual[1:-1]
                if "=" in body:
                    name, _, value = body.partition("=")
                    attrs.append((name.strip(), value.strip().strip("\"'")))
                else:
                    attrs.append((body.strip(), None))
        chain.append(SimpleSelector(tag, sel_id, tuple(classes),
                                    tuple(attrs), pending))
        pending = " "
    if len(_SELECTOR_CACHE) < 4096:  # scripts use a handful; bound anyway
        _SELECTOR_CACHE[selector] = chain
    return chain


def _ancestors_match(node: Node, chain: list[SimpleSelector],
                     idx: int | None = None) -> bool:
    """chain[:idx] must match ancestors of ``node`` (which matched
    chain[idx]), honoring each link's combinator: ``>`` pins the
    immediate parent, descendant walks (with backtracking — the old
    greedy walk missed matches like ``div div b`` over nested divs
    when the first candidate ancestor couldn't finish the chain)."""
    if idx is None:
        idx = len(chain) - 1
    if idx == 0:
        return True
    comb = chain[idx].combinator
    parent = node.parent
    if comb == ">":
        if parent is None or parent.tag == "#root":
            return False
        return (chain[idx - 1].matches(parent)
                and _ancestors_match(parent, chain, idx - 1))
    current = parent
    while current is not None and current.tag != "#root":
        if chain[idx - 1].matches(current) and _ancestors_match(
                current, chain, idx - 1):
            return True
        current = current.parent
    return False


def select(root: Node, selector: str) -> list[Node]:
    """All elements matching ``selector``, in document order."""
    chain = parse_selector(selector)
    if not chain:
        return []
    out = []
    for node in root.iter_elements():
        if chain[-1].matches(node) and _ancestors_match(node, chain):
            out.append(node)
    return out


_SELECTOR_GROUP_RE = re.compile(r"\[(.*?)\]")
_ATTR_WORD_RE = re.compile(r"[\w-]+")


def selector_attr(selector: str) -> str:
    """Attr-from-selector rule (followlinks.go:110-117): first word of
    the last [...] group in the selector, else 'href'."""
    groups = _SELECTOR_GROUP_RE.findall(selector)
    if not groups:
        return "href"
    word = _ATTR_WORD_RE.search(groups[-1])
    return word.group(0) if word else "href"


# ------------------------------------------------------------------- spans


def extract_spans(html: str) -> list[dict]:
    """Interleaved span rows (kind, text, media_ref, offset) in document
    order — the canonical payload from BASELINE.json input_hint.

    Rules (FIXTURES.md "Parse rule"): visible text chunks -> 'text';
    <a href> -> 'link' (text=anchor text, media_ref=raw unresolved
    href); <img src> -> 'media' (media_ref=raw src). Anchor text
    belongs to its link span (not duplicated as text spans); media
    inside anchors still emit their own span.
    """
    return spans_from_root(parse_html(html))


def spans_from_root(root: Node) -> list[dict]:
    spans: list[dict] = []

    def walk(node: Node, inside_link: bool) -> None:
        for child in node.children:
            if child.tag == "#text":
                if not inside_link:
                    chunk = child.data.strip()
                    if chunk:
                        spans.append(
                            {"kind": "text", "text": chunk, "media_ref": "",
                             "offset": len(spans)}
                        )
            elif child.tag in SKIP_TEXT_TAGS:
                continue
            elif child.tag == "a" and "href" in child.attrs:
                spans.append(
                    {"kind": "link", "text": child.text().strip(),
                     "media_ref": child.attrs["href"], "offset": len(spans)}
                )
                walk(child, True)
            elif child.tag == "img" and "src" in child.attrs:
                spans.append(
                    {"kind": "media", "text": "", "media_ref": child.attrs["src"],
                     "offset": len(spans)}
                )
            else:
                walk(child, inside_link)

    walk(root, False)
    return spans


# ------------------------------------------------------------------- links


def extract_links(html: str, origin: str, selectors: list[str]) -> list[str]:
    """Reference link-follow semantics, exactly
    (modules/followlinks/followlinks.go:37-94):

    for each selector (in config order): match in document order, read
    the selector-derived attribute, resolve against ``origin``
    (RFC 3986), keep only http/https(/empty-scheme) results, dedup
    first-seen across ALL selectors preserving order.
    """
    return links_from_root(parse_html(html), origin, selectors)


def links_from_root(root: Node, origin: str, selectors: list[str]) -> list[str]:
    seen: set[str] = set()
    links: list[str] = []
    for selector in selectors:
        attr = selector_attr(selector)
        for node in select(root, selector):
            raw = node.attrs.get(attr)
            if raw is None:
                continue
            absolute = resolve(origin, raw)
            if absolute is None:
                continue
            if absolute not in seen:
                seen.add(absolute)
                links.append(absolute)
    return links
