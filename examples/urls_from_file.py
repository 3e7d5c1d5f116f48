"""Port of examples/urls_from_file.js: seed list read from a sibling
urls.txt at script load (the JS `import urls from "./urls.txt"`)."""

import os

with open(os.path.join(os.path.dirname(__file__), "urls.txt"),
          encoding="utf-8") as f:
    urls = f.read()

config = {
    "urls": [u for u in urls.split("\n") if u],
}


def scrape(ctx):
    return {"title": ctx.doc.find("title").text().strip()}
