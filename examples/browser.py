"""Port of examples/browser.js: Airbnb listings need a JS render —
`browser: true` swaps the transport for the rendering path
(sources/browser.py; Chromium is a documented stub in this sandbox,
tests drive the fake DOM-settling renderer). `new Set(...)` in the JS
stringifies to {}; the port keeps the intent as a sorted unique list."""

config = {
    "url": "https://www.airbnb.com/",
    "browser": True,
    # "headless": False,
}


def scrape(ctx):
    rooms = ctx.doc.find("[itemprop=itemListElement]")

    def one(room):
        link = "https://" + room.find("meta[itemprop=url]").attr("content")
        image = room.find("img").attr("src")
        desc = sorted({
            d for d in room.find("[role=group] > div > div > div").map(
                lambda e: e.text())
            if d
        })
        return {"link": link, "image": image, "desc": desc}

    return {"listings": rooms.map(one)}
