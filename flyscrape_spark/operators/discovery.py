"""Discovery-channel attribution: which channel found each URL first,
rolled up per host.

The engine now has four ways a URL can enter the frontier — config
seeds (plans/frontier.py), in-page links (the reference's only
channel beyond seeds, /root/reference/scrape.go:210-268), sitemaps
(operators/sitemaps.py) and feeds (operators/feeds.py). At crawl
scale the mix is an operational dial: a host whose URLs arrive
mostly via sitemap needs sitemap refetches, not deeper link
crawling; a feed-heavy host wants the cadence scheduler. This rollup
attributes every distinct URL to its FIRST discovery (earliest
generation; ties broken by channel priority seed < sitemap < feed <
link — the cheaper/more-authoritative channel wins credit) and
reports the per-host mix.

Scale shape: one combinable min-struct groupBy(url) over the big
discovery log, then one combinable groupBy(host) — no windows, no
Python, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: tie-break priority when the same URL surfaces in the same
#: generation through several channels
CHANNEL_PRIORITY = {"seed": 0, "sitemap": 1, "feed": 2, "link": 3}


def discovery_mix(
    discoveries: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    channel_col: str = "channel",
    gen_col: str = "gen",
) -> DataFrame:
    """(host, n_urls, n_seed, n_sitemap, n_feed, n_link, link_share)
    from a discovery log of (url, host, channel, gen) events —
    every distinct URL credited to its first-discovery channel.
    Unknown channel labels rank after the known four (priority 9)
    but are preserved in n_urls."""
    rank = F.lit(9)
    for name, pri in sorted(CHANNEL_PRIORITY.items(), key=lambda kv: kv[1]):
        rank = F.when(F.col(channel_col) == name, F.lit(pri)).otherwise(rank)
    first = (
        discoveries.select(
            F.col(host_col).alias("host"),
            F.col(url_col).alias("url"),
            F.struct(
                F.col(gen_col).cast("long").alias("gen"),
                rank.cast("int").alias("pri"),
                F.col(channel_col).alias("channel"),
            ).alias("d"),
        )
        .groupBy("host", "url")
        .agg(F.min("d").alias("d"))
        .select("host", F.col("d.channel").alias("channel"))
    )
    per_host = first.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.sum((F.col("channel") == "seed").cast("long")).alias("n_seed"),
        F.sum((F.col("channel") == "sitemap").cast("long")).alias(
            "n_sitemap"
        ),
        F.sum((F.col("channel") == "feed").cast("long")).alias("n_feed"),
        F.sum((F.col("channel") == "link").cast("long")).alias("n_link"),
    )
    return per_host.withColumn(
        "link_share",
        F.round(F.col("n_link") / F.col("n_urls"), 6),
    )
