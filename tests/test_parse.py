"""Parser/selector unit tests, pinned to the reference's behavior:
- link extraction cases: modules/followlinks/followlinks_test.go
- URL resolution cases: js_test.go:188-203, js_test.go:233-261
- attr-from-selector: followlinks.go:110-117
No Spark needed here — pure Python core shared by the UDFs and oracle.
"""

from flyscrape_spark.functions.urls import resolve
from flyscrape_spark.parse.html import (
    extract_links,
    extract_spans,
    parse_html,
    select,
    selector_attr,
)

FOLLOW_HTML = """
<html><body>
<a href="/baz">baz</a>
<a href="baz">baz</a>
<a href="http://www.google.com">google</a>
</body></html>
"""

BASE = "http://www.example.com/foo/bar"


def test_default_follow_resolution():
    # followlinks_test.go:19-51: relative, rooted and absolute links
    links = extract_links(FOLLOW_HTML, BASE, ["a[href]"])
    assert links == [
        "http://www.example.com/baz",
        "http://www.example.com/foo/baz",
        "http://www.google.com",
    ]


def test_selector_scoped_follow():
    # followlinks_test.go:53-86
    html = """
    <a href="/baz">baz</a><a href="baz">baz</a>
    <div class="next"><a href="http://www.google.com">g</a></div>
    """
    assert extract_links(html, BASE, [".next a[href]"]) == ["http://www.google.com"]


def test_data_attr_selector():
    # followlinks_test.go:88-119 + attr rule followlinks.go:110-117
    html = '<div data-url="http://www.google.com">g</div><a href="/baz">x</a>'
    assert extract_links(html, BASE, ["[data-url]"]) == ["http://www.google.com"]


def test_multi_selector_union_order():
    # followlinks_test.go:121-153: selectors applied in config order
    html = """
    <a href="/baz">baz</a>
    <a class="prev" href="a">prev</a>
    <a class="next" href="b">next</a>
    """
    assert extract_links(html, BASE, ["a.prev", "a.next"]) == [
        "http://www.example.com/foo/a",
        "http://www.example.com/foo/b",
    ]


def test_per_page_first_seen_dedup():
    # followlinks.go:63-82: dedup across selectors, first-seen order
    html = '<a href="/x">1</a><a href="/x">2</a><a class="c" href="/x">3</a>'
    assert extract_links(html, BASE, ["a[href]", "a.c"]) == [
        "http://www.example.com/x"
    ]


def test_scheme_filter():
    # followlinks.go:88-94: only http/https survive resolution
    html = """
    <a href="mailto:x@y.z">m</a>
    <a href="javascript:void(0)">j</a>
    <a href="ftp://host/file">f</a>
    <a href="/ok">ok</a>
    """
    assert extract_links(html, BASE, ["a[href]"]) == ["http://www.example.com/ok"]


def test_selector_attr_rule():
    assert selector_attr("a[href]") == "href"
    assert selector_attr("[data-url]") == "data-url"
    assert selector_attr(".next a[href]") == "href"
    assert selector_attr("a.prev") == "href"
    assert selector_attr('a[data-x="1"]') == "data-x"


def test_resolution_cases():
    # js_test.go:188-203 (absoluteURL) and :233-261 (nested scrape)
    assert resolve("http://localhost/", "/foo") == "http://localhost/foo"
    assert resolve("http://localhost/foo/", "bar") == "http://localhost/foo/bar"
    assert resolve("http://localhost/foo", "bar") == "http://localhost/bar"
    assert resolve(BASE, "mailto:a@b.c") is None


def test_select_document_order_and_descendant():
    html = """
    <div id="top"><p class="a">one</p><span><p class="a b">two</p></span></div>
    <p class="a">three</p>
    """
    root = parse_html(html)
    assert [n.text() for n in select(root, "p.a")] == ["one", "two", "three"]
    assert [n.text() for n in select(root, "#top p.a")] == ["one", "two"]
    assert [n.text() for n in select(root, "p.a.b")] == ["two"]


def test_extract_spans_interleaved():
    html = """
    <html><body>
    <h1>Title</h1>
    <p>Some text</p>
    <a href="/next">next page</a>
    <img src="/pic.png">
    <p>tail</p>
    </body></html>
    """
    spans = extract_spans(html)
    assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans] == [
        ("text", "Title", "", 0),
        ("text", "Some text", "", 1),
        ("link", "next page", "/next", 2),
        ("media", "", "/pic.png", 3),
        ("text", "tail", "", 4),
    ]


def test_spans_skip_script_and_anchor_text_not_duplicated():
    html = "<script>var x=1;</script><a href='/a'>anchor</a><style>.x{}</style>"
    spans = extract_spans(html)
    assert spans == [
        {"kind": "link", "text": "anchor", "media_ref": "/a", "offset": 0}
    ]


# ------------------------------------------ fast-scanner differential

def _tree_eq(a, b):
    return (
        a.tag == b.tag and a.data == b.data and a.attrs == b.attrs
        and a.order == b.order and len(a.children) == len(b.children)
        and all(_tree_eq(x, y) for x, y in zip(a.children, b.children))
    )


def test_fast_parser_matches_stdlib_differentially():
    """parse_html's scanning fast path must produce the EXACT stdlib
    html.parser tree on every input it accepts (it bails to stdlib on
    anything subtle). Mutation fuzz over a representative page plus a
    curated edge-case corpus."""
    import random

    from flyscrape_spark.parse.html import _fast_parse, _stdlib_parse

    corpus = [
        "", "plain text", "a & b &amp; c", "<p>a<b>c</b>d</p>",
        '<a href="/x?a=1&amp;b=2">l</a>', "<a href=/z>u</a>",
        "<br><br/><img src=x>", "<script>if (a<b && c>d) {}</script>t",
        "<style>p > a { x }</style>", "<!-- c --><p>x</p>",
        "<!DOCTYPE html><html><body>t</body></html>", "<p>unclosed",
        "</p>stray", "<P CLASS=Big>c</p>", "<a b=1 b=2>dup-last-wins</a>",
        "<td>1<td>2", "<p>&#65;&#x42;&amp;</p>", "<p>&not</p>",
        "<input type=checkbox checked>", "<script></script>",
        "<p  a=1   b=2  >s</p>", "<p a='x\"y'>q</p>", "<a href= >e</a>",
        "<div><p>a</div>b</p>", "<foo-bar baz='1'>c</foo-bar>",
        "<a\nhref='nl'>n</a>", "<a href=x/>s</a>", "<p //>y",
    ]
    checked = 0
    for doc in corpus:
        fast = _fast_parse(doc)
        if fast is not None:
            assert _tree_eq(fast, _stdlib_parse(doc)), doc
            checked += 1
    assert checked >= 20  # the corpus is mostly fast-path-eligible

    base = (
        '<html><body><p>text &amp; more</p>'
        + "".join(f'<a href="/d/{i}?x=1&y=2">l{i}</a>' for i in range(4))
        + '<img src="/m.png"><script>var a = "<i>";</script>'
        + '<div class="c one" id="z"><span>s</span></div></body></html>'
    )
    rnd = random.Random(7)
    chars = '<>/="\'& abc!-#?[]\n\t@:.'
    for _ in range(4000):
        doc = base
        for _ in range(rnd.randint(1, 4)):
            pos = rnd.randrange(len(doc))
            op = rnd.random()
            if op < 0.4:
                doc = doc[:pos] + rnd.choice(chars) + doc[pos:]
            elif op < 0.7:
                doc = doc[:pos] + doc[pos + 1:]
            else:
                doc = doc[:pos] + rnd.choice(chars) + doc[pos + 1:]
        fast = _fast_parse(doc)
        if fast is not None:
            assert _tree_eq(fast, _stdlib_parse(doc)), repr(doc)
