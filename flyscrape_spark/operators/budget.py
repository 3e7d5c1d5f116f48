"""Global fetch-budget allocation across hosts — exact max-min
water-filling, distributed.

A crawl cycle has one global budget B (fetches the cluster can issue
this cycle) and, per host, a demand (frontier backlog) and a
politeness cap (the most the host's crawl-delay budget allows). The
fair allocation is the classic water-filling solution: every host
gets min(effective_cap, t) where effective_cap = min(demand, cap)
and the water level t solves sum_i min(c_i, t) = B — small hosts are
fully funded, big hosts are leveled equally. The reference has no
notion of a budget at all (it fetches until the frontier drains,
/root/reference/scrape.go:150-220); at 10^10 URLs the cycle budget
IS the scheduler.

Scale shape (no global sort window, no single-partition exchange):

1. ``repartitionByRange(c, host)`` + partition-local sort — the same
   skew-free two-phase prefix-sum layout as
   operators/mixing.py token_budget_sample.
2. Per-partition (count, sum) collected driver-side — O(partitions)
   metadata, never rows.
3. One Arrow ``mapInPandas`` pass computes each row's global rank k
   and exclusive prefix sum S from the broadcast offsets, emitting
   the candidate level t_k = (B - S_k) / (n - k + 1) and its
   feasibility (t_k <= c_k). The water level is the FIRST feasible
   candidate — one scalar min aggregate.
4. Final projection alloc = min(c, t) over the hosts table.

The level is exact (not iterative): f(t) = sum min(c_i, t) is
piecewise linear with breakpoints at the sorted c_k, and t_k is the
unique solution on the segment where it is feasible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def waterfill(
    hosts: DataFrame,
    budget: int,
    host_col: str = "host",
    demand_col: str = "demand",
    cap_col: str = "cap",
    parts: int | None = None,
) -> DataFrame:
    """(host, demand, cap, alloc, capped) for every host: the exact
    water-filling split of ``budget`` over effective caps
    min(demand, cap). ``capped`` hosts are fully funded; the rest sit
    at the common water level. When total effective demand fits the
    budget, everyone is capped and the level is infinite.

    Deterministic: ties in c break on host name in the ranking, and
    the level depends only on the multiset of caps.
    """
    spark = hosts.sparkSession
    if parts is None:
        parts = spark.sparkContext.defaultParallelism
    base = hosts.select(
        F.col(host_col).alias("host"),
        F.col(demand_col).cast("long").alias("demand"),
        F.col(cap_col).cast("long").alias("cap"),
        # least() skips nulls (one known signal still caps the host);
        # a host with BOTH unknown gets effective cap 0. The coalesce
        # is load-bearing: a null c would be counted by n but not by
        # sum(c) in the partition stats AND would poison the pandas
        # cumsum with NaN, desynchronizing the rank/prefix pair the
        # pivot search depends on.
        F.coalesce(
            F.least(F.col(demand_col), F.col(cap_col)).cast("long"),
            F.lit(0).cast("long"),
        ).alias("c"),
    )

    ranged = (
        base.repartitionByRange(parts, F.col("c"), F.col("host"))
        .sortWithinPartitions("c", "host")
        .localCheckpoint(eager=True)  # pin: offsets + cumsum see one layout
    )
    part_stats = (
        ranged.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("n"), F.sum("c").alias("s"))
        .collect()
    )
    n_total = sum(r["n"] for r in part_stats)
    s_total = sum(r["s"] for r in part_stats)
    if n_total == 0:
        return base.select(
            "host", "demand", "cap",
            F.col("c").cast("double").alias("alloc"),
            F.lit(True).alias("capped"),
        )
    if s_total <= budget:
        # every host fully funded; the water is above the tallest cap
        return base.select(
            "host", "demand", "cap",
            F.round(F.col("c").cast("double"), 6).alias("alloc"),
            F.lit(True).alias("capped"),
        )

    # exclusive (rank, prefix-sum) offsets per partition, driver-side
    offsets: dict[int, tuple[int, int]] = {}
    k_acc = 0
    s_acc = 0
    for row in sorted(part_stats, key=lambda r: r["pid"]):
        offsets[row["pid"]] = (k_acc, s_acc)
        k_acc += row["n"]
        s_acc += row["s"]

    schema = StructType(
        [StructField("t", DoubleType()), StructField("k", LongType())]
    )

    def candidates(iterator):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        k0, s0 = offsets.get(pid, (0, 0))
        seen = 0
        emitted = 0
        for pdf in iterator:
            c = pdf["c"]
            k = k0 + seen + pd.RangeIndex(1, len(pdf) + 1)
            s_excl = s0 + emitted + c.cumsum() - c
            t = (budget - s_excl) / (n_total - k + 1)
            ok = t <= c
            seen += len(pdf)
            emitted += int(c.sum())
            out = pd.DataFrame({"t": t[ok], "k": pd.Series(k)[ok.values]})
            if len(out):
                yield out

    first = (
        ranged.mapInPandas(candidates, schema=schema)
        .agg(F.min_by("t", "k").alias("t"))
        .collect()[0]
    )
    level = float(first["t"])
    return base.select(
        "host", "demand", "cap",
        F.round(F.least(F.col("c").cast("double"), F.lit(level)), 6).alias(
            "alloc"
        ),
        (F.col("c").cast("double") <= F.lit(level)).alias("capped"),
    )


def cycle_plan(
    frontier: DataFrame,
    delays: DataFrame,
    budget: int,
    cycle_s: float = 60.0,
    host_col: str = "host",
    delay_col: str = "adjusted_delay_s",
) -> DataFrame:
    """The next crawl cycle's per-host fetch plan — the composition
    that closes the scheduling loop: demand comes from the pending
    frontier (one combinable count per host), the per-host ceiling
    from the politeness pacing (floor(cycle_s / delay) fetches fit in
    a cycle at that delay — ``delays`` is the O(hosts) output of
    operators/politeness.py adaptive_delay or the robots crawl-delay
    table), and the global ``budget`` is split by exact water-filling
    (:func:`waterfill`). Output adds ``coverage`` = alloc/demand —
    the fraction of each host's backlog this cycle actually serves.

    Scale shape: one combinable groupBy over the big frontier, one
    broadcast join against the tiny delay table, then the waterfill
    pivot search (two-phase prefix sums, no global sort).
    """
    demand = frontier.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("demand")
    )
    caps = delays.select(
        F.col(host_col).alias("host"),
        F.col(delay_col).cast("double").alias("delay_s"),
    )
    # cap semantics: delay > 0 -> floor(cycle_s/delay) fetches fit;
    # delay == 0 (or negative) -> NO pacing constraint, so the cycle
    # cap is the host's own demand (waterfill never allocates more
    # than demand anyway) — a raw division here would NULL-out (or
    # ANSI-error) and zero the LEAST-constrained host; delay NULL or
    # host absent from the delay table -> cap 0 (no politeness
    # verdict yet means don't fetch, same as before).
    hosts = demand.join(F.broadcast(caps), "host", "left").select(
        "host",
        "demand",
        F.when(
            F.col("delay_s") > 0,
            F.floor(F.lit(float(cycle_s)) / F.col("delay_s")).cast("long"),
        )
        .when(F.col("delay_s").isNotNull(), F.col("demand"))
        .otherwise(F.lit(0).cast("long"))
        .alias("cap"),
    )
    plan = waterfill(hosts, budget=budget)
    return plan.withColumn(
        "coverage",
        F.round(F.col("alloc") / F.col("demand").cast("double"), 6),
    )


def shard_assignment(
    hosts: DataFrame,
    n_shards: int,
    host_col: str = "host",
    weight_col: str = "n_urls",
    hash_fn=None,
) -> DataFrame:
    """Host → crawler-shard assignment by stateless hash partitioning
    (every node computes the same mapping with no coordination — the
    standard sharding of a distributed frontier, Cho & Garcia-Molina
    2002's site-hash partitioning), with the per-shard load report
    that tells the operator whether the hash is balanced enough or a
    hot host needs its own shard.

    Input: one row per host with a load weight (e.g. pending URL
    count). Output: (shard, n_hosts, n_urls, load_factor) where
    load_factor = shard weight / ideal (total/n_shards) — a balanced
    assignment sits near 1.0 on every shard.

    ``hash_fn`` defaults to the hot-path xxhash64
    (functions/hashing.py url_hash64); pass
    ``portable_hash64`` where a cross-engine oracle must reproduce
    the mapping. Scale shape: a projection + ONE combinable groupBy
    on the shard id; the output is O(n_shards).
    """
    if hash_fn is None:
        from flyscrape_spark.functions.hashing import url_hash64 as hash_fn
    shard = F.pmod(hash_fn(F.col(host_col)), F.lit(n_shards)).cast("int")
    per_shard = (
        hosts.select(
            shard.alias("shard"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .groupBy("shard")
        .agg(F.count("*").alias("n_hosts"), F.sum("w").alias("n_urls"))
    )
    total = per_shard.agg(F.sum("n_urls").alias("total"))
    return per_shard.crossJoin(F.broadcast(total)).select(
        "shard",
        "n_hosts",
        "n_urls",
        F.round(
            F.col("n_urls") * n_shards / F.col("total"),
            6,
        ).alias("load_factor"),
    )
