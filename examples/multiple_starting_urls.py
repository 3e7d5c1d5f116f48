"""Port of examples/multiple_starting_urls.js: same post extraction
as hackernews.py, seeded from two listing URLs."""

config = {
    "urls": [
        "https://news.ycombinator.com/show",
        "https://news.ycombinator.com/ask",
    ],
}


def scrape(ctx):
    posts = ctx.doc.find(".athing")

    def one(post):
        link = post.find(".titleline > a")
        meta = post.next()
        return {
            "url": ctx.absolute_url(link.attr("href")),
            "user": meta.find(".hnuser").text(),
            "title": link.text(),
            "points": meta.find(".score").text().replace(" points", ""),
            "created": meta.find(".age").attr("title"),
        }

    return {"posts": posts.map(one)}
