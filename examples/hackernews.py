"""Port of examples/hackernews.js: front-page posts, following the
"More" pagination link to depth 9, with the file snapshot cache."""

config = {
    "url": "https://news.ycombinator.com/",
    "depth": 9,
    "cache": "file",
    "follow": ["a.morelink[href]"],
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
