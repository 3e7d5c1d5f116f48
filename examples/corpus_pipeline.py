"""End-to-end crawl-operations walkthrough using the library API —
from discovery to a packed training corpus, every stage a documented
operator with a DuckDB-oracle-gated driver query behind it.

Unlike the sibling examples (flyscrape-config scripts run through the
CLI), this is the PySpark-native surface a data engineer drives
directly. Run standalone:

    python examples/corpus_pipeline.py

or import ``run(spark, pages, feeds_xml)`` from tests.

Pipeline stages (module -> §2.4 driver query):

1. feed autodiscovery over fetched pages        feeds.feed_discovery
2. RSS parse -> recency-ranked frontier seeds   sources.feeds / feed_seeds
3. next-cycle fetch plan: backlog x politeness
   caps x global budget, water-filled           budget.cycle_plan
4. host-scoped boilerplate strip                segments.strip_host_boilerplate
5. near-dup clustering -> canonical pick        cluster.canonical_pick
6. pack survivors into byte-balanced shards     mixing.byte_packed_shards
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flyscrape_spark.operators import cluster, dedup
from flyscrape_spark.operators.budget import cycle_plan
from flyscrape_spark.operators.cluster import canonical_pick
from flyscrape_spark.operators.feeds import feed_discovery, feed_seeds
from flyscrape_spark.operators.mixing import byte_packed_shards
from flyscrape_spark.operators.segments import strip_host_boilerplate
from flyscrape_spark.sources.feeds import parse_rss


def run(spark: SparkSession, pages: DataFrame,
        feeds_xml: DataFrame) -> dict[str, DataFrame]:
    """Run the six stages; returns each stage's DataFrame keyed by
    stage name so callers (and the pytest) can inspect every hop."""
    # 1. which feeds do the fetched pages advertise?
    discovered = feed_discovery(pages)

    # 2. parse the (already-fetched) feed bodies into dated entries,
    #    rank per host by recency under a politeness cap
    entries = parse_rss(feeds_xml)
    seeds = feed_seeds(entries, per_host_cap=100)

    # 3. the cycle plan: frontier backlog = the seeds we just found;
    #    per-host pacing from a (here: static) delay table; one
    #    global budget split exactly by water-filling
    delays = seeds.select("host").distinct().select(
        "host", F.lit(1.0).alias("adjusted_delay_s")
    )
    plan = cycle_plan(
        seeds.select("host", F.col("link").alias("url")),
        delays, budget=50, cycle_s=30,
    )

    # 4-5. corpus hygiene on the fetched text: strip each host's
    #    template chrome, then elect one canonical doc per near-dup
    #    cluster (longest copy wins)
    stripped = strip_host_boilerplate(
        pages.select("host", "doc_id", "text"), min_docs=3
    )
    docs = stripped.select(
        "doc_id", F.col("clean_text").alias("text"),
        F.length("clean_text").alias("n_chars"),
    )
    pairs = dedup.simhash_near_dup(docs, bits=16, bands=4, max_distance=3)
    labeled = cluster.dedup_clusters(docs, pairs).select(
        "doc_id", "cluster_id"
    )
    keepers = canonical_pick(
        labeled.join(docs.select("doc_id", "n_chars"), "doc_id")
    )

    # 6. byte-balanced contiguous export shards over the keepers
    shards = byte_packed_shards(
        docs.join(
            keepers.select(F.col("keeper_doc_id").alias("doc_id")),
            "doc_id",
        ),
        shard_bytes=4096,
    )
    return {
        "discovered": discovered,
        "seeds": seeds,
        "plan": plan,
        "stripped": stripped,
        "keepers": keepers,
        "shards": shards,
    }


def _demo_inputs(spark: SparkSession):
    """Tiny deterministic corpus: 3 hosts x 8 pages, each page
    advertising its host's feed; per-host nav/footer template lines;
    hosts publish RSS with dated entries. The page BODIES differ only
    by one number, so the dedup stage demonstrably collapses all 24
    into one near-dup cluster and keeps a single canonical doc."""
    n, hosts = 24, 3
    i = F.col("id")
    host = F.concat(F.lit("h"), (i % hosts).cast("string"),
                    F.lit(".example"))
    pages = spark.range(n).select(
        i.alias("doc_id"),
        host.alias("host"),
        F.concat(F.lit("https://"), host, F.lit("/p/"),
                 i.cast("string")).alias("url"),
        F.concat(
            F.lit('<html><head><link rel="alternate" '
                  'type="application/rss+xml" href="/feed.xml">'
                  "</head><body>x</body></html>"),
        ).alias("html"),
        F.concat(F.lit("nav home\nbody text "), i.cast("string"),
                 F.lit(" unique content here\nfooter ç "),
                 (i % hosts).cast("string")).alias("text"),
    )
    entry = F.concat(
        F.lit("<item><title>P"), i.cast("string"),
        F.lit("</title><link>https://"), host, F.lit("/p/"),
        i.cast("string"), F.lit("</link><pubDate>"),
        F.lpad((i % 28 + 1).cast("string"), 2, "0"),
        F.lit(" Jan 2026 0"), (i % 10).cast("string"),
        F.lit(":00:00 GMT</pubDate></item>"),
    )
    feeds_xml = (
        spark.range(n)
        .select(host.alias("host"), entry.alias("e"))
        .groupBy("host")
        .agg(F.array_join(F.collect_list("e"), "").alias("body"))
        .select(
            F.concat(F.lit("https://"), F.col("host"),
                     F.lit("/feed.xml")).alias("feed_url"),
            F.concat(F.lit('<rss version="2.0"><channel>'),
                     F.col("body"),
                     F.lit("</channel></rss>")).alias("xml"),
        )
    )
    return pages, feeds_xml


if __name__ == "__main__":
    from flyscrape_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    pages, feeds_xml = _demo_inputs(spark)
    out = run(spark, pages, feeds_xml)
    for name, df in out.items():
        print(f"== {name}")
        df.show(5, truncate=False)
    spark.stop()
