"""Element query API parity (reference js.go:257-300) + the Python
scrape-script surface: sibling/tree axes, html()/name(), map/filter,
and the flagship hackernews.js extraction shape (post.next())."""

import json

from flyscrape_spark.parse.html import parse_html
from flyscrape_spark.parse.script import Sel, make_script_udf, run_script

HTML = """
<html><body>
<table>
<tr class="athing" id="p1"><td><span class="titleline"><a href="item?id=1">First story</a></span></td></tr>
<tr class="sub"><td><span class="score">100 points</span> <a class="hnuser">alice</a> <span class="age" title="2024-01-01T00:00:00">1 day ago</span></td></tr>
<tr class="athing" id="p2"><td><span class="titleline"><a href="item?id=2">Second story</a></span></td></tr>
<tr class="sub"><td><span class="score">7 points</span> <a class="hnuser">bob</a> <span class="age" title="2024-01-02T00:00:00">2 days ago</span></td></tr>
</table>
<div id="d"><p id="a">one</p><p id="b">two</p><span id="c">three</span><p id="e">four</p></div>
</body></html>
"""


def doc() -> Sel:
    return Sel([parse_html(HTML)])


# ------------------------------------------------------- sibling axes

def test_next_prev():
    b = doc().find("#b")
    assert b.next().attr("id") == "c"
    assert b.prev().attr("id") == "a"
    assert doc().find("#a").prev().length == 0
    assert doc().find("#e").next().length == 0


def test_next_all_prev_all_until():
    a = doc().find("#a")
    assert a.next_all().length == 3
    assert [n.attrs["id"] for n in a.next_all().nodes] == ["b", "c", "e"]
    assert [n.attrs["id"] for n in a.next_until("span").nodes] == ["b"]
    e = doc().find("#e")
    assert [n.attrs["id"] for n in e.prev_all().nodes] == ["a", "b", "c"]
    assert [n.attrs["id"] for n in e.prev_until("p").nodes] == ["c"]


def test_siblings_children_parent():
    b = doc().find("#b")
    assert [n.attrs["id"] for n in b.siblings().nodes] == ["a", "c", "e"]
    assert [n.attrs["id"] for n in doc().find("#d").children().nodes] == [
        "a", "b", "c", "e",
    ]
    assert b.parent().attr("id") == "d"
    assert b.parent().name() == "div"


def test_multi_node_axis_dedup_doc_order():
    # goquery set semantics: axis over every node, dedup, doc order
    ps = doc().find("#d p")  # a, b, e
    sibs = ps.siblings()
    assert [n.attrs["id"] for n in sibs.nodes] == ["a", "b", "c", "e"]


# ------------------------------------------------------- html / name / misc

def test_html_name_attr():
    a = doc().find("#a")
    assert a.name() == "p"
    assert a.html() == '<p id="a">one</p>'
    assert a.text() == "one"
    assert doc().find("#d").find("span").attr("id") == "c"
    assert doc().find("#missing").html() == ""
    assert doc().find("#missing").attr("x") == ""  # js.go:263 "" on miss


def test_first_last_get_filter():
    ps = doc().find("#d p")
    assert ps.length == 3
    assert ps.first().attr("id") == "a"
    assert ps.last().attr("id") == "e"
    assert ps.get(1).attr("id") == "b"
    assert ps.get(9).length == 0
    kept = ps.filter(lambda s, i: s.text() != "two")
    assert [s.attr("id") for s in kept] == ["a", "e"]


# ------------------------------------------------------- the HN example

def hn_script(ctx):
    """examples/hackernews.js default export, re-expressed in Python:
    per-post meta row reached via post.next() — the axis the round-1
    extract spec could not express."""
    posts = ctx.doc.find(".athing")

    def one(post, i):
        link = post.find(".titleline a")
        meta = post.next()
        return {
            "url": ctx.absolute_url(link.attr("href")),
            "user": meta.find(".hnuser").text(),
            "title": link.text(),
            "points": meta.find(".score").text().replace(" points", ""),
            "created": meta.find(".age").attr("title"),
        }

    return {"posts": posts.map(one)}


def test_hackernews_extraction_shape():
    data, follow = run_script(hn_script, HTML, "https://news.ycombinator.com/")
    posts = json.loads(data)["posts"]
    assert follow == []
    assert posts == [
        {
            "created": "2024-01-01T00:00:00",
            "points": "100",
            "title": "First story",
            "url": "https://news.ycombinator.com/item?id=1",
            "user": "alice",
        },
        {
            "created": "2024-01-02T00:00:00",
            "points": "7",
            "title": "Second story",
            "url": "https://news.ycombinator.com/item?id=2",
            "user": "bob",
        },
    ]


def test_script_udf_vectorized(spark):
    """The same script through the Arrow-batched UDF: one batch, many
    docs, follow_urls surfaced as a column."""

    def script(ctx):
        ctx.follow(ctx.doc.find(".titleline a").attr("href"))
        return {"n_posts": ctx.doc.find(".athing").length}

    df = spark.createDataFrame(
        [("https://news.ycombinator.com/", HTML), ("https://x.test/", "<p>no posts</p>")],
        "url string, body string",
    )
    udf = make_script_udf(script)
    rows = {
        r["url"]: r["s"]
        for r in df.select("url", udf("body", "url").alias("s")).collect()
    }
    assert json.loads(rows["https://news.ycombinator.com/"]["data"]) == {"n_posts": 2}
    assert rows["https://news.ycombinator.com/"]["follow_urls"] == [
        "https://news.ycombinator.com/item?id=1"
    ]
    assert rows["https://x.test/"]["follow_urls"] == []
