"""Document deduplication operators for large-scale training-data
pipelines — exact, MinHash+LSH, SimHash and n-gram Jaccard.

All pure DataFrame + built-in functions (no Python UDFs): hashes use
the md5-derived :func:`portable_hash64` so the driver's DuckDB oracle
reproduces every value bit-for-bit, and every operator is
shuffle-shaped for scale:

- exact dedup: one groupBy on a 64-bit content hash (map-side partial
  aggregation, AQE-coalesced);
- minhash: per-row array_min over transform(shingle array) — zero
  shuffle, the whole signature fuses into the scan projection; LSH
  banding then buckets signatures so candidate generation is a
  groupBy on band values, NOT an O(n^2) self-join;
- ngram-jaccard: shingle-inverted-index self-join — joins only on
  shared shingles (the standard sparse-similarity-join shape), with a
  frequency cap to drop stop-shingles that would create skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flyscrape_spark.functions.hashing import portable_hash64


def normalized_text(col="text"):
    """lower + collapse whitespace — the canonical content key."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact-duplicate groups: one row per distinct normalized text,
    representative = min doc_id, with the duplicate count."""
    return (
        documents.select(
            F.col("doc_id"), portable_hash64(normalized_text()).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("representative"),
            F.count("*").alias("dup_count"),
        )
    )


def word_shingles(col="text", n: int = 3):
    """Word n-gram shingles as an array column (distinct, JVM-side)."""
    words = F.split(normalized_text(col), " ")
    # sliding n-gram via transform over index range
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )
    )


def shingle_index(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle_hash) inverted index, exploded."""
    return documents.select(
        "doc_id", F.explode(word_shingles(n=n)).alias("shingle")
    ).select("doc_id", portable_hash64(F.col("shingle")).alias("shingle_hash"))


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 100,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard >= threshold.

    Sparse similarity join: self-join the shingle inverted index on
    shingle_hash (docs sharing no shingle never meet), drop shingles
    shared by more than ``max_shingle_freq`` docs (stop-shingle skew
    guard — at web scale one hot shingle would otherwise create a
    quadratic partition).

    ``materialize`` pins the inverted index (localCheckpoint; an
    Iceberg table on a cluster) — it feeds four consumers (sizes,
    document frequencies, both join sides), so without pinning the
    shingle explode re-runs four times.
    """
    idx = shingle_index(documents, n)
    if materialize:
        idx = idx.localCheckpoint(eager=True)
    sizes = idx.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    freq = idx.groupBy("shingle_hash").agg(F.count("*").alias("df"))
    filtered = idx.join(
        freq.filter(F.col("df") <= max_shingle_freq), "shingle_hash"
    ).select("doc_id", "shingle_hash")
    if materialize:
        filtered = filtered.localCheckpoint(eager=True)

    a = filtered.alias("a")
    b = filtered.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle_hash") == F.col("b.shingle_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("intersection"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_shingles": "size_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_shingles": "size_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("intersection")
                / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# Universal-hash minhash family (Carter-Wegman): h_i(s) =
# (a_i * x + b_i) mod P over x = low 31 bits of ONE portable base
# hash per shingle — one md5 per shingle instead of num_hashes md5s.
# P = 2^31-1 (Mersenne) so products genuinely wrap (a 61-bit modulus
# would never reduce a < 2^60 product, leaving every h_i monotone in
# x and all minima identical — a real bug caught by tests). Products
# stay < 2^62, overflow-free in BOTH Spark (wrapping) and DuckDB
# (which errors on BIGINT overflow) — required for oracle equality.
MINHASH_PRIME = (1 << 31) - 1
_MINHASH_MASK = (1 << 31) - 1


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i), 1 <= a_i < P, 0 <= b_i < P, derived
    from md5 so any engine (or oracle author) can rebuild them."""
    import hashlib

    params = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"a:{i}".encode()).hexdigest()[:15], 16) % (MINHASH_PRIME - 1) + 1
        b = int(hashlib.md5(f"b:{i}".encode()).hexdigest()[:15], 16) % MINHASH_PRIME
        params.append((a, b))
    return params


def minhash_signatures(documents: DataFrame, num_hashes: int = 16, n: int = 3,
                       shingles: DataFrame | None = None) -> DataFrame:
    """MinHash signature per doc: mh_i = min over shingles of
    (a_i * base31 + b_i) mod (2^31-1), base31 = low 31 bits of the
    portable shingle hash.

    Zero-shuffle shape: the min is ``array_min`` over higher-order
    ``transform`` of the per-row shingle array — no explode, no
    groupBy, signatures fuse into the parquet scan's projection. At
    10^10 docs the old explode+groupBy form shuffled one combined row
    per (doc, seed); this form shuffles nothing at all.

    ``shingles`` lets callers share one (doc_id, s:array<string>)
    scan across pipeline stages (lsh_near_dup reuses it for the exact
    Jaccard verify)."""
    if shingles is None:
        shingles = documents.select("doc_id", word_shingles(n=n).alias("s"))
    xs = F.transform(
        F.col("s"), lambda s: portable_hash64(s).bitwiseAND(F.lit(_MINHASH_MASK))
    )
    hashed = shingles.select("doc_id", xs.alias("xs"))
    cols = [
        F.array_min(
            F.transform(
                F.col("xs"),
                lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(MINHASH_PRIME)),
            )
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    return hashed.select("doc_id", *cols)


def minhash_lsh_candidates(
    documents: DataFrame, num_hashes: int = 16, bands: int = 4, n: int = 3,
    materialize: bool = True, shingles: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the minhash
    signature. Banding makes candidate generation a groupBy on the
    band hash — linear shuffle, no O(n^2) compare.

    ``materialize`` pins the banded table before the self-join —
    otherwise the whole shingle->minhash pipeline runs once per join
    side (an Iceberg signature table on a cluster)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(documents, num_hashes, n, shingles=shingles)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     portable_hash64(F.concat_ws("_", *[c.cast("string") for c in cols])
                                     ).alias("bucket"))
        )
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if materialize:
        banded = banded.localCheckpoint(eager=True)

    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_near_dup(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """The full MinHash+LSH near-duplicate pipeline: shingle ->
    minhash -> band -> bucket-join candidates -> EXACT Jaccard verify
    on candidates only. This is the training-data dedup shape that
    scales: candidate generation is a linear shuffle on band buckets;
    the quadratic verify runs only within buckets (at web scale,
    ~1% of all pairs)."""
    # ONE shingle scan serves the whole pipeline: signatures transform
    # the per-row arrays (zero shuffle), the verify join reads the
    # same arrays
    shingles = documents.select(
        "doc_id", word_shingles(n=n).alias("s")
    ).localCheckpoint(eager=True)
    cand = minhash_lsh_candidates(documents, num_hashes, bands, n, shingles=shingles)
    sa = shingles.withColumnsRenamed({"doc_id": "doc_a", "s": "s_a"})
    sb = shingles.withColumnsRenamed({"doc_id": "doc_b", "s": "s_b"})
    inter = F.size(F.array_intersect(F.col("s_a"), F.col("s_b"))).cast("double")
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("inter", inter)
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("inter")
                / (F.size("s_a") + F.size("s_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash fingerprint over word tokens: bit j of the fingerprint
    is set iff sum over tokens of (+1 if bit j of token-hash else -1)
    is positive. Pure explode + groupBy + bit arithmetic."""
    tokens = documents.select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("token")
    ).withColumn("th", portable_hash64(F.col("token")))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    per_bit = (
        tokens.select("doc_id", "th", bit)
        .withColumn(
            "vote",
            F.when(F.expr("(th >> bit) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("votes"))
    )
    return (
        per_bit.withColumn(
            "bitval",
            F.when(F.col("votes") > 0, F.expr("CAST(1 AS BIGINT) << bit"))
            .otherwise(F.lit(0).cast("bigint")),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").cast("bigint").alias("simhash"))
    )


def simhash_near_dup(
    documents: DataFrame, bits: int = 16, bands: int = 4,
    max_distance: int = 3,
) -> DataFrame:
    """SimHash near-duplicate PAIRS — the neighbor-join stage that
    makes the fingerprint usable as a dedup operator at scale.

    Banded hamming join: split the fingerprint into ``bands``
    contiguous bit bands; candidates = pairs agreeing on at least one
    band (a linear-shuffle bucket equi-join, exactly the LSH banding
    shape — never O(n^2)); verify = exact popcount(xor) on candidates
    only. With ``max_distance <= bands - 1`` the banding is LOSSLESS
    by pigeonhole (<= bands-1 differing bits leave >= 1 band intact),
    so the output is EXACTLY all pairs with hamming <= max_distance —
    which is what the DuckDB oracle computes pairwise."""
    assert bits % bands == 0
    assert max_distance <= bands - 1, "banding is only lossless below bands"
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    # pin: the fingerprint table feeds the band explode AND both
    # verify sides
    fp = simhash(documents, bits).localCheckpoint(eager=True)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(f"(simhash >> {b * band_bits}) & {mask}").alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = fp.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    fa = fp.withColumnsRenamed({"doc_id": "doc_a", "simhash": "sh_a"})
    fb = fp.withColumnsRenamed({"doc_id": "doc_b", "simhash": "sh_b"})
    return (
        cand.join(fa, "doc_a").join(fb, "doc_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_distance)
        .select("doc_a", "doc_b", "hamming")
    )


def containment_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 100,
    materialize: bool = True,
) -> DataFrame:
    """Directional near-duplicate detection by shingle containment
    (Broder 1997's "containment" companion to resemblance/Jaccard):
    C(A in B) = |A∩B| / |A| over distinct word n-gram shingle sets.
    Catches subset duplication Jaccard misses — a short doc quoted
    whole inside a long one scores ~1.0 containment but low Jaccard.

    Same sparse inverted-index join shape as ngram_jaccard_pairs
    (docs sharing no shingle never meet; stop-shingle frequency cap
    guards hot-shingle quadratic skew): candidates are generated once
    per unordered pair (doc_a < doc_b), and BOTH directions'
    containments are computed from that one intersection count — no
    second join. A pair is emitted if either direction clears the
    threshold.
    """
    idx = shingle_index(documents, n)
    if materialize:
        idx = idx.localCheckpoint(eager=True)
    sizes = idx.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    freq = idx.groupBy("shingle_hash").agg(F.count("*").alias("df"))
    filtered = idx.join(
        freq.filter(F.col("df") <= max_shingle_freq), "shingle_hash"
    ).select("doc_id", "shingle_hash")
    if materialize:
        filtered = filtered.localCheckpoint(eager=True)

    a = filtered.alias("a")
    b = filtered.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle_hash") == F.col("b.shingle_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("intersection"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_shingles": "size_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_shingles": "size_b"}), "doc_b")
        .withColumn("containment_a_in_b",
                    F.round(F.col("intersection") / F.col("size_a"), 6))
        .withColumn("containment_b_in_a",
                    F.round(F.col("intersection") / F.col("size_b"), 6))
    )
    return (
        out.filter((F.col("containment_a_in_b") >= threshold)
                   | (F.col("containment_b_in_a") >= threshold))
        .select("doc_a", "doc_b", "containment_a_in_b", "containment_b_in_a")
    )


def lsh_eval(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
    truth_max_freq: int = 1_000_000_000,
) -> DataFrame:
    """One-row LSH tuning report: precision/recall of the MinHash
    band-bucket CANDIDATE set against exact-Jaccard ground truth at
    ``threshold`` — the measurement that picks (num_hashes, bands)
    before a corpus-scale dedup run. Collision probability at
    similarity s is 1-(1-s^r)^b; this operator verifies the
    configured curve on real data.

    Ground truth uses the same inverted-index exact-Jaccard operator
    with the frequency cap effectively off: the truth side is meant
    for a SAMPLE (10^5-10^6 docs — eval is statistics, not
    production dedup), where the uncapped index is safe. The
    candidate side is the production banded shape.

    Columns: n_candidates, n_true, n_hit, precision, recall (4dp).
    """
    cand = minhash_lsh_candidates(documents, num_hashes, bands, n).select(
        "doc_a", "doc_b"
    )
    truth = ngram_jaccard_pairs(
        documents, n=n, threshold=threshold, max_shingle_freq=truth_max_freq
    ).select("doc_a", "doc_b")
    joined = cand.withColumn("c", F.lit(1)).join(
        truth.withColumn("t", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    return joined.agg(
        F.sum(F.coalesce("c", F.lit(0))).cast("bigint").alias("n_candidates"),
        F.sum(F.coalesce("t", F.lit(0))).cast("bigint").alias("n_true"),
        F.sum(
            F.when(F.col("c").isNotNull() & F.col("t").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_hit"),
        F.round(
            F.sum(F.when(F.col("c").isNotNull() & F.col("t").isNotNull(), 1.0)
                  .otherwise(0.0))
            / F.greatest(F.sum(F.coalesce("c", F.lit(0))).cast("double"),
                         F.lit(1.0)),
            4,
        ).alias("precision"),
        F.round(
            F.sum(F.when(F.col("c").isNotNull() & F.col("t").isNotNull(), 1.0)
                  .otherwise(0.0))
            / F.greatest(F.sum(F.coalesce("t", F.lit(0))).cast("double"),
                         F.lit(1.0)),
            4,
        ).alias("recall"),
    )


def normalized_title(col="title"):
    """Case-folded, whitespace-collapsed title — the cheap near-dup
    key for template-farm detection (thousands of pages differing
    only in their body boilerplate share one headline)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def title_clusters(pages: DataFrame, title_col: str = "title",
                   url_col: str = "url", min_pages: int = 2) -> DataFrame:
    """(title_key, n_pages, n_hosts, example_url) for every
    normalized title shared by ≥ ``min_pages`` pages — the
    duplicate-headline report (soft-404 shells, tag/search pages,
    syndication) that feeds the same demotion pipeline as
    url_templates (operators/traps.py).

    Scale shape: one combinable aggregate keyed by the 64-bit title
    hash; n_hosts is a two-level distinct (host set per title is
    tiny; the inner groupBy combines map-side).
    """
    from flyscrape_spark.functions.urls import host_of

    keyed = pages.select(
        portable_hash64(normalized_title(title_col)).alias("title_key"),
        F.col(url_col).alias("url"),
        host_of(F.col(url_col)).alias("host"),
    )
    per_host = keyed.groupBy("title_key", "host").agg(
        F.count("*").alias("_n"), F.min("url").alias("_u")
    )
    return (
        per_host.groupBy("title_key")
        .agg(
            F.sum("_n").alias("n_pages"),
            F.count("*").alias("n_hosts"),
            F.min("_u").alias("example_url"),
        )
        .filter(F.col("n_pages") >= min_pages)
    )
