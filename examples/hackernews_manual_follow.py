"""Port of examples/hackernews_manual_follow.js: follow([]) disables
auto link-following; the script enqueues the next page itself via
ctx.follow (js.go:217-219 manual follow)."""

config = {
    "url": "https://news.ycombinator.com/",
    "depth": 2,
    "follow": [],
}


def scrape(ctx):
    next_page = ctx.doc.find(".morelink").attr("href")
    ctx.follow(next_page)
    return {"url": ctx.url, "next": next_page}
