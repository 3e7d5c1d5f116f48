"""Port of examples/download.js: gallery images saved via the async
downloader (sources/client.py Downloader — the reference's
flyscrape/http download: 5-way parallel, skip-existing,
Content-Disposition names). `:first-of-type` is ported to .first()."""

from flyscrape_spark.sources.client import Downloader

config = {
    "url": "https://commons.wikimedia.org/wiki/London",
}

downloader = Downloader()


def basename(path):
    return path.split("/")[-1]


def scrape(ctx):
    gallery = ctx.doc.find("#mw-content-text .mw-gallery-traditional").first()
    symbols = gallery.find("li")

    def one(symbol):
        name = symbol.text().strip()
        url = symbol.find("img").attr("src")
        file = f"symbols/{basename(url)}"
        downloader.download(url, file)
        return {"name": name, "url": url, "file": file}

    return {"symbols": symbols.map(one)}
