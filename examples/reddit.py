"""Port of examples/reddit.js: old-reddit front page. `:not(.promoted)`
is ported to the script API's set-semantics .filter() (the selector
engine has no :not pseudo — parse/html.py)."""

config = {
    "url": "https://old.reddit.com/",
}


def scrape(ctx):
    posts = ctx.doc.find("#siteTable .thing")
    organic = posts.filter(lambda p: not p.has_class("promoted"))

    def one(post):
        title = post.find("a.title")
        comments = post.find(".comments")
        return {
            "rank": post.find(".rank").text(),
            "user": post.find(".author").text(),
            "created": post.find("time").attr("datetime"),
            "title": title.text(),
            "link": ctx.absolute_url(title.attr("href")),
            "comments": comments.text().replace(" comments", ""),
            "comments_link": comments.attr("href"),
            "subreddit": post.find(".subreddit").text(),
            "upvotes": post.find(".score.unvoted").text(),
            "thumbnail": ctx.absolute_url(post.find("a.thumbnail img").attr("src")),
        }

    return {"posts": [one(p) for p in organic]}
