"""Port of examples/hackernews_with_comments.js: the JS script calls
scrape(url, fn) — a synchronous nested fetch per row (js.go:155-246).
Per-row synchronous fetches don't exist in a batch engine; the
engine's substitution is the two-level nested-scrape plan
(plans/nested.py): this module exports the OUTER extraction (listing
page -> title + comments link) and the INNER one (comments page ->
author/text rows); tests/test_examples.py composes them with
nested_scrape, producing the same joined shape as the reference."""

config = {
    "url": "https://news.ycombinator.com/",
}


def scrape(ctx):
    """Outer: first submission's title and its comments link (the
    nested plan fetches the link as the child page)."""
    post = ctx.doc.find(".athing.submission").first()
    title = post.find(".titleline > a").text()
    comments_link = post.next().find("a").last().attr("href")
    return {
        "title": title,
        "comments_link": ctx.absolute_url(comments_link),
    }


def scrape_comments(ctx):
    """Inner: one row per comment on the comments page."""
    comments = ctx.doc.find(".comtr")
    return {
        "comments": comments.map(lambda c: {
            "author": c.find(".hnuser").text(),
            "text": c.find(".commtext").text(),
        }),
    }
