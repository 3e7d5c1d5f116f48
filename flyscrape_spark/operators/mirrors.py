"""Cross-host mirror detection: find host pairs that serve the same
content — CDNs, www/apex twins, scraped re-hosts — from the exact
content-hash table the dedup stage already produces.

The reference has no cross-host analysis (flyscrape scrapes one
site per script); engine-added for the crawl mission: mirrors are
the crawl-budget sink a per-host politeness scheduler cannot see
(each host individually looks fine; together they fetch everything
twice), and a mirror map feeds both budget assignment and dedup.

Scale shape (the inverted-index/candidate-pair pattern shared with
ngram_jaccard, dedup.py:66-118):
- one distinct on (content_hash, host): hash-partitioned,
  skew-free (a hash is near-unique by construction);
- postings-frequency cap: hashes served by more than
  ``max_hosts_per_hash`` hosts are dropped BEFORE pairing (boiler-
  plate shared by thousands of hosts would otherwise explode the
  self-join quadratically — same stop-shingle guard as the n-gram
  index, and the hosts it would pair are not mirrors anyway);
- pair generation: self-join WITHIN a hash bucket only, host_a <
  host_b, then a map-side-combinable count per pair;
- the overlap denominator joins each side's CAPPED distinct-content
  count (a tiny host-cardinality table, broadcast by AQE) — same
  universe as the numerator, so syndication past the cap cannot
  deflate a genuine mirror's score.

Overlap = shared / min(|A|, |B|) (containment, not Jaccard: a small
mirror of a big site should still score 1.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: hashes on more hosts than this are boilerplate, not mirrors
MAX_HOSTS_PER_HASH = 20

#: host pairs sharing at least this fraction of the smaller side
MIRROR_THRESHOLD = 0.5


def mirror_hosts(
    content: DataFrame,
    host_col: str = "host",
    hash_col: str = "content_hash",
    max_hosts_per_hash: int = MAX_HOSTS_PER_HASH,
    threshold: float = MIRROR_THRESHOLD,
) -> DataFrame:
    """(host_a, host_b, shared, n_a, n_b, overlap, is_mirror) for
    every host pair sharing >= 1 eligible content hash."""
    from pyspark.sql import Window

    hh = content.select(
        F.col(hash_col).alias("h"), F.col(host_col).alias("host")
    ).distinct()
    # frequency cap as a count-over-window on the hash partition (no
    # ordering, so no per-partition sort pass): the filtered postings
    # stay h-partitioned and BOTH sides of the pairing self-join reuse
    # that exchange instead of re-shuffling
    capped = (
        hh.withColumn(
            "n_hosts", F.count("*").over(Window.partitionBy("h"))
        )
        .filter(F.col("n_hosts") <= max_hosts_per_hash)
        .select("h", "host")
    )
    # sizes from the CAPPED postings so numerator and denominator see
    # the same hash universe: a genuine mirror pair whose common
    # content is syndicated past the cap would otherwise score below
    # threshold (denominator inflated by hashes the numerator never
    # counts). n_a/n_b therefore mean "eligible distinct hashes".
    sizes = capped.groupBy("host").agg(F.count("*").alias("n"))
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"),
              (F.col("a.h") == F.col("b.h"))
              & (F.col("a.host") < F.col("b.host")))
        .groupBy(F.col("a.host").alias("host_a"),
                 F.col("b.host").alias("host_b"))
        .agg(F.count("*").alias("shared"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("host", "host_a")
                   .withColumnRenamed("n", "n_a"), "host_a")
        .join(sizes.withColumnRenamed("host", "host_b")
              .withColumnRenamed("n", "n_b"), "host_b")
        .select(
            "host_a", "host_b", "shared", "n_a", "n_b",
            F.round(
                F.col("shared").cast("double")
                / F.least("n_a", "n_b").cast("double"), 6
            ).alias("overlap"),
        )
        .withColumn("is_mirror", F.col("overlap") >= F.lit(threshold))
    )
