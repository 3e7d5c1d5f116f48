"""Port of examples/coinmarketcap.js: top-10 currencies from the
front-page table (column indexes as in the reference; .get() is
0-indexed in both)."""

config = {
    "url": "https://coinmarketcap.com/",
}


def scrape(ctx):
    rows = ctx.doc.find(".cmc-table tbody tr")

    def one(row):
        cols = row.find("td")
        return {
            "position": cols.get(1).text(),
            "currency": cols.get(2).find("p").get(0).text(),
            "symbol": cols.get(2).find("p").get(1).text(),
            "price": cols.get(3).text(),
            "change": {
                "1h": cols.get(4).text(),
                "24h": cols.get(5).text(),
                "7dh": cols.get(6).text(),
            },
            "marketcap": cols.get(7).find("span").get(1).text(),
            "volume": cols.get(8).find("p").get(0).text(),
            "supply": cols.get(9).text(),
        }

    return {"currencies": rows.map(one)[:10]}
