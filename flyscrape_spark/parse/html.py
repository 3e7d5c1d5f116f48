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
from html.parser import HTMLParser

from flyscrape_spark.functions.urls import resolve

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
SKIP_TEXT_TAGS = frozenset(("script", "style", "noscript", "template"))


@dataclass
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


def parse_html(html: str) -> Node:
    builder = _TreeBuilder()
    try:
        builder.feed(html or "")
        builder.close()
    except Exception:
        pass  # lenient: return whatever parsed (reference returns nil links on parse error)
    return builder.root


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


def parse_selector(selector: str) -> list[SimpleSelector]:
    """Parse a chain of simple selectors joined by descendant (space)
    or child (``>``) combinators — the two goquery spellings the
    reference's shipped scripts use (e.g. ``.titleline > a``)."""
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
