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
