"""Web-feed ingestion: parse RSS 2.0 and Atom (RFC 4287) feed XML
into frontier seed rows, JVM-side.

The reference seeds only from config URLs
(/root/reference/modules/starturl/starturl.go:27-35); alongside
sitemaps (sources/sitemaps.py), a site's feeds are the cheapest
*freshness* discovery channel — they advertise the newest URLs with
publish timestamps, which is exactly what a recrawl scheduler wants.
Pages advertise their feeds via ``<link rel="alternate"
type="application/rss+xml" ...>`` (operators/feeds.py
``feed_discovery``).

Both parsers emit the SAME schema so RSS and Atom entries union
directly into one planning pass:

    feed_url STRING, position INT, link STRING, guid STRING,
    title STRING, pub_ts TIMESTAMP

Scale shape: ``from_xml`` + ``posexplode`` + regexp timestamp
normalization are pure JVM codegen — no Python, no shuffle; one feed
row fans out to its entries partition-locally (feeds are small by
convention, tens to hundreds of entries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

RSS_SCHEMA = (
    "channel STRUCT<title: STRING, link: STRING, item: ARRAY<STRUCT<"
    "title: STRING, link: STRING, guid: STRING, pubDate: STRING>>>"
)

#: Atom <link> is attribute-based (href/rel); from_xml surfaces
#: attributes with the default ``_`` prefix.
ATOM_SCHEMA = (
    "title STRING, updated STRING, entry ARRAY<STRUCT<"
    "title: STRING, id: STRING, updated: STRING, published: STRING,"
    " link: ARRAY<STRUCT<_href: STRING, _rel: STRING>>>>"
)

#: RFC 822 §5.1 zone names -> numeric offsets. Spark >= 3 rejects
#: zone-name parse patterns under the proleptic parser, so pubDate is
#: normalized to a numeric offset first (the HTTP-date handling in
#: sources/transport.py Retry-After does the same dance).
_RFC822_ZONES = {
    "UT": "+0000",
    "GMT": "+0000",
    "Z": "+0000",
    "EST": "-0500",
    "EDT": "-0400",
    "CST": "-0600",
    "CDT": "-0500",
    "MST": "-0700",
    "MDT": "-0600",
    "PST": "-0800",
    "PDT": "-0700",
}


def rfc822_timestamp(col: Column) -> Column:
    """Parse an RFC-822/RFC-1123 date ("Tue, 06 Feb 2026 11:00:00
    GMT", weekday optional, zone name or numeric offset) to a
    timestamp, NULL when malformed. Pure JVM: two regexp rewrites
    (drop the advisory weekday — parsers must not trust it — and map
    zone names to offsets) then one ``try_to_timestamp``."""
    norm = F.regexp_replace(F.trim(col), r"^[A-Za-z]{3},\s*", "")
    for zone, offset in _RFC822_ZONES.items():
        norm = F.regexp_replace(norm, rf"\s{zone}$", f" {offset}")
    # RFC 822 §5.1 makes the day 1-or-2-digit and the seconds
    # optional; try the variants from most to least common
    return F.coalesce(
        F.try_to_timestamp(norm, F.lit("dd MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(norm, F.lit("d MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(norm, F.lit("dd MMM yyyy HH:mm Z")),
        F.try_to_timestamp(norm, F.lit("d MMM yyyy HH:mm Z")),
    )


def parse_rss(
    feeds: DataFrame, xml_col: str = "xml", url_col: str = "feed_url"
) -> DataFrame:
    """(feed_url, position, link, guid, title, pub_ts) for every
    ``<item>`` of every RSS 2.0 body, in document order. Items with
    no ``<link>`` are dropped (nothing to crawl); guid/title/pubDate
    are optional and NULL when absent or unparseable."""
    parsed = feeds.select(
        F.col(url_col).alias("feed_url"),
        F.from_xml(F.col(xml_col), RSS_SCHEMA).alias("r"),
    )
    return (
        parsed.select(
            "feed_url",
            F.posexplode_outer("r.channel.item").alias("position", "i"),
        )
        .filter(F.col("i.link").isNotNull())
        .select(
            "feed_url",
            "position",
            F.trim(F.col("i.link")).alias("link"),
            F.col("i.guid").alias("guid"),
            F.col("i.title").alias("title"),
            rfc822_timestamp(F.col("i.pubDate")).alias("pub_ts"),
        )
    )


def parse_atom(
    feeds: DataFrame, xml_col: str = "xml", url_col: str = "feed_url"
) -> DataFrame:
    """(feed_url, position, link, guid, title, pub_ts) for every
    ``<entry>`` of every Atom body, in document order. The crawlable
    link is the ``rel="alternate"`` <link> (RFC 4287 §4.2.7.2), else
    the first <link> with no rel (alternate is the default rel), else
    the first <link> of any rel; entries with no href are dropped.
    guid is the entry ``<id>``; pub_ts prefers ``<published>`` over
    ``<updated>`` (ISO-8601 both)."""
    parsed = feeds.select(
        F.col(url_col).alias("feed_url"),
        F.from_xml(F.col(xml_col), ATOM_SCHEMA).alias("a"),
    )
    links = F.col("e.link")
    href = F.coalesce(
        F.get(F.filter(links, lambda l: l["_rel"] == F.lit("alternate")), 0)[
            "_href"
        ],
        F.get(F.filter(links, lambda l: l["_rel"].isNull()), 0)["_href"],
        F.get(links, 0)["_href"],
    )
    return (
        parsed.select(
            "feed_url", F.posexplode_outer("a.entry").alias("position", "e")
        )
        .withColumn("link", F.trim(href))
        .filter(F.col("link").isNotNull())
        .select(
            "feed_url",
            "position",
            "link",
            F.col("e.id").alias("guid"),
            F.col("e.title").alias("title"),
            F.try_to_timestamp(
                F.coalesce(F.col("e.published"), F.col("e.updated"))
            ).alias("pub_ts"),
        )
    )
