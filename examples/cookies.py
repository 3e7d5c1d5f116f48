"""Port of examples/cookies.js: authenticated front page via browser
cookies. The reference imports the chrome/edge/firefox profile store
(modules/cookies/cookies.go:39-59); no browser profile exists in this
sandbox, so the engine substitutes an EXPLICIT cookie store
(sources/cookies.py, RFC 6265 matching) — the config key parses and is
carried as cookies_browser for a caller to satisfy."""

config = {
    "url": "https://news.ycombinator.com/",
    "cookies": "chrome",
}


def scrape(ctx):
    return {
        "user": ctx.doc.find("#me").text(),
        "karma": ctx.doc.find("#karma").text(),
    }
