"""Per-host politeness: salted host partitioning + token-bucket
pacing.

The reference rate-limits *globally* — one ticker for the whole
process (/root/reference/modules/ratelimit/ratelimit.go:36-75). At
cluster scale the budget must be enforced per host, locally to a task,
with no cross-executor coordination (north_rule). The construction:

1. ``host_fanout`` — from the generation's host histogram, give each
   hot host k shards (k = ceil(count / shard_target), capped), so the
   heaviest host's partitions stay under 2x the median partition
   (north_star skew bound). Cold hosts get k=1.
2. ``with_shards`` — shard assignment is ``xxhash64(url) % k``:
   deterministic, uniform within a host.
3. ``schedule`` — repartition by (host, shard); each task owns a host
   shard exclusively, so a local token bucket at rate/k per shard
   enforces the global per-host rate without coordination. The
   scheduler emits a virtual ``fetch_time`` (seconds into the
   generation) per row; a real HTTP transport awaits these offsets, a
   test transport asserts the spacing.

Everything except the per-group pacing is built-in DataFrame ops; the
pacing itself is an applyInPandas over (host, shard) groups — Arrow
batched, one Python call per host shard.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def host_fanout(
    frontier: DataFrame, shard_target: int | None = None, max_fanout: int = 64
) -> DataFrame:
    """(host, fanout): shards per host from this generation's counts.

    With ``shard_target=None`` the target rows-per-shard is the MEDIAN
    host size of the generation, which is what makes the north_star
    skew bound hold by construction: every hot host splits into shards
    of ~median rows, so max-partition/median-partition ~ 1. At
    10^10-URL scale the histogram comes from the previous generation's
    lineage metrics (SnapshotStore manifests) rather than a live count.
    """
    counts = frontier.groupBy("host").agg(F.count("*").alias("n"))
    if shard_target is None:
        med = counts.agg(
            F.greatest(F.expr("percentile_approx(n, 0.5)"), F.lit(1)).alias("target")
        )
        counts = counts.crossJoin(F.broadcast(med))
    else:
        counts = counts.withColumn("target", F.lit(shard_target))
    return counts.select(
        "host",
        F.least(
            F.ceil(F.col("n") / F.col("target")).cast("int"), F.lit(max_fanout)
        ).alias("fanout"),
        F.col("n").alias("host_rows"),
    )


def host_budget(
    frontier: DataFrame,
    max_per_host: int,
    order_cols: tuple[str, ...] = ("depth", "url"),
) -> DataFrame:
    """Per-host crawl budget: admit at most ``max_per_host`` URLs per
    host, in deterministic priority order (the frontier's canonical
    (depth, discovery-order) priority; ``url`` as a stable final
    tie-break).

    The reference has no per-domain page cap (its only frontier bound
    is the global queue cap, /root/reference/scrape.go:82,283-286);
    this is the standard large-crawl "max pages per domain" admission
    rule, a first-class frontier-scheduler feature at 10^10-URL scale
    where a handful of infinite-calendar hosts would otherwise eat
    the whole fetch budget.

    Scale shape: ONE shuffle on host. The row_number window does put
    each host in one task — but the budget itself caps the damage: a
    task only needs the TOP max_per_host rows per host, and Spark's
    rank-limit pushdown (WindowGroupLimit, Spark 3.5+) prunes beyond
    the limit before the sort where possible. The per-host admitted
    output is bounded at max_per_host rows by construction, so the
    downstream generation has a hard skew ceiling.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("host").orderBy(*[F.col(c) for c in order_cols])
    return (
        frontier.withColumn("host_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("host_rank") <= max_per_host)
    )


def with_shards(frontier: DataFrame, fanout: DataFrame) -> DataFrame:
    """Attach (fanout, shard) — shard = xxhash64(url) % fanout.
    The fanout table is one row per distinct host: broadcast it."""
    return frontier.join(F.broadcast(fanout), "host").withColumn(
        "shard", F.pmod(F.xxhash64("url"), F.col("fanout")).cast("int")
    )


def schedule(
    frontier: DataFrame,
    rate_per_min: float,
    shard_target: int | None = None,
    max_fanout: int = 64,
    host_delays: DataFrame | None = None,
) -> DataFrame:
    """Assign a virtual fetch_time (sec) per row such that requests to
    any single host are spaced >= 60/rate seconds globally, even though
    the host's rows span ``fanout`` independent tasks: each shard paces
    at rate/fanout and offsets its start by shard/(rate) so shards
    interleave instead of colliding.

    ``host_delays`` — optional (host, crawl_delay) table (e.g. the
    robots.txt Crawl-delay cache from operators/robots.py); a host's
    effective interval is max(60/rate, crawl_delay). Broadcast: one
    row per distinct host."""
    fan = host_fanout(frontier, shard_target, max_fanout)
    sharded = with_shards(frontier, fan)
    interval_global = 60.0 / rate_per_min
    if host_delays is not None:
        sharded = sharded.join(
            F.broadcast(host_delays.select("host", "crawl_delay")), "host", "left"
        )
    else:
        sharded = sharded.withColumn("crawl_delay", F.lit(None).cast("double"))
    out_schema = sharded.schema.add("fetch_time", "double")

    def pace(key, pdf: pd.DataFrame) -> pd.DataFrame:
        _, shard = key
        fanout = int(pdf["fanout"].iloc[0])
        delay = pdf["crawl_delay"].iloc[0]
        base = max(interval_global, float(delay)) if pd.notna(delay) else interval_global
        interval = base * fanout             # this shard's budget share
        offset = base * shard                # interleave shards
        pdf = pdf.sort_values("discovery_order") if "discovery_order" in pdf else pdf
        pdf = pdf.reset_index(drop=True)
        pdf["fetch_time"] = offset + pdf.index.to_series() * interval
        return pdf

    return (
        sharded.repartition(F.col("host"), F.col("shard"))
        .groupBy("host", "shard")
        .applyInPandas(pace, schema=out_schema)
    )


def partition_skew(frontier_with_shards: DataFrame) -> dict:
    """max/median rows across (host, shard) partitions — the
    north_star bound is max < 2x median for the heaviest host."""
    sizes = [
        r["n"]
        for r in frontier_with_shards.groupBy("host", "shard")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    sizes.sort()
    if not sizes:
        return {"max": 0, "median": 0, "ratio": 0.0}
    median = sizes[len(sizes) // 2]
    return {
        "max": sizes[-1],
        "median": median,
        "ratio": round(sizes[-1] / max(median, 1), 3),
        "n_partitions": len(sizes),
    }


#: statuses that count against a host's health (plus transport
#: errors, which surface as status 0)
DEFAULT_ERROR_STATUSES = (429, 500, 502, 503, 504)


def error_status_expr(error_statuses: tuple = DEFAULT_ERROR_STATUSES):
    """Column predicate: this fetch counts as a host-health error."""
    return F.col("status").isin(*[int(s) for s in error_statuses]) | (
        F.col("status") == 0
    )


def host_health(
    fetch_log: DataFrame,
    error_statuses: tuple = DEFAULT_ERROR_STATUSES,
    cooldown_ratio: float = 0.5,
    min_fetches: int = 10,
) -> DataFrame:
    """Per-host health from a generation's fetch log: fetch count,
    server-error count/ratio, and a ``cooldown`` flag — the circuit
    breaker a large crawl needs on top of pacing (a host answering
    mostly 5xx/429 should stop consuming the politeness-limited fetch
    budget until it recovers; the reference retries per-request,
    /root/reference/modules/retry/retry.go:43-81, but nothing stops
    it hammering a dying host across requests).

    cooldown = error_ratio >= ``cooldown_ratio`` once at least
    ``min_fetches`` requests were observed (small samples don't trip
    the breaker). Feed the flagged hosts into the next generation as
    a blocklist/deprioritization (plans/priority.py scores).

    Scale shape: one map-side-combinable groupBy(host); output is
    host-cardinality. Transport errors (status 0) count as errors.
    """
    is_err = error_status_expr(error_statuses)
    agg = fetch_log.groupBy("host").agg(
        F.count("*").alias("n_fetches"),
        F.sum(F.when(is_err, 1).otherwise(0)).alias("n_errors"),
    )
    ratio = F.round(
        F.col("n_errors").cast("double") / F.col("n_fetches").cast("double"), 6
    )
    return agg.select(
        "host", "n_fetches", "n_errors",
        ratio.alias("error_ratio"),
        ((F.col("n_fetches") >= min_fetches)
         & (ratio >= cooldown_ratio)).alias("cooldown"),
    )


#: a server at or above this many co-hosted names is shared hosting
SHARED_HOSTING_THRESHOLD = 10


def server_politeness(
    hosts: DataFrame,
    server_cap: float = 60.0,
    host_col: str = "host",
    ip_col: str = "ip",
    rate_col: str = "requested_rate",
) -> DataFrame:
    """Server-level politeness rollup: hostnames sharing one IP share
    ONE origin server, so per-HOST rate budgets that individually look
    polite can jointly hammer a box (virtual hosting / CDN edge). The
    reference rate-limits globally (modules/ratelimit/ratelimit.go:
    38-40) and this engine per host (host_budget above); this operator
    is the third level — per server — that real crawlers add once DNS
    resolution is in the loop.

    Input: (host, ip, requested_rate req/min) — the resolver output
    joined to the per-host budget table. Output one row per ip:
      n_hosts, total_requested, throttled (total > cap),
      effective_host_rate = min(cap, total) / n_hosts — the fair
      per-host share each co-hosted name is clamped to,
      shared_hosting flag at ``SHARED_HOSTING_THRESHOLD`` names.

    Scale shape: ONE map-side-combinable groupBy on the ip key.
    Skew note: a CDN ip fronting 10^6 names is one heavy group but
    the agg is partial-combinable, so the hot key costs one reducer
    a few counters, never a buffer.
    """
    return (
        hosts.groupBy(F.col(ip_col).alias("ip"))
        .agg(
            F.countDistinct(host_col).alias("n_hosts"),
            F.round(F.sum(rate_col), 6).alias("total_requested"),
        )
        .select(
            "ip", "n_hosts", "total_requested",
            (F.col("total_requested") > F.lit(server_cap)).alias("throttled"),
            F.round(
                F.least(F.lit(server_cap), F.col("total_requested"))
                / F.col("n_hosts"), 6
            ).alias("effective_host_rate"),
            (F.col("n_hosts") >= F.lit(SHARED_HOSTING_THRESHOLD))
            .alias("shared_hosting"),
        )
    )


def adaptive_delay(
    fetch_log: DataFrame,
    base_delay_s: float = 1.0,
    latency_factor: float = 3.0,
    quantile: float = 0.95,
) -> DataFrame:
    """Latency-adaptive per-host pacing: hosts whose p95 response
    latency is high get a LONGER crawl delay — the server is telling
    us it is struggling, and hammering a slow origin is how crawlers
    get blocked. adjusted = max(base, latency_factor * p95_seconds);
    the standard adaptive-politeness rule (e.g. Heritrix's
    delay-factor), which the reference's fixed per-host rate
    (/root/reference/modules/ratelimit/ratelimit.go:36-75) cannot
    express.

    Input: (host, latency_ms) one row per completed fetch. Output:
    (host, n_fetches, p95_ms, adjusted_delay_s, throttled).

    Scale shape: ONE combinable aggregate per host (exact
    interpolated percentile — Spark's percentile aggregate keeps a
    per-host digest, merged map-side); the result table is O(hosts)
    and feeds the token-bucket schedule as a broadcast.
    """
    lat = F.col("latency_ms").cast("double")
    agg = fetch_log.groupBy("host").agg(
        F.count("*").alias("n_fetches"),
        F.percentile(lat, F.lit(float(quantile))).alias("_p95"),
    )
    adjusted = F.greatest(
        F.lit(float(base_delay_s)),
        F.lit(float(latency_factor)) * F.col("_p95") / F.lit(1000.0),
    )
    return agg.select(
        "host",
        "n_fetches",
        F.round(F.col("_p95"), 4).alias("p95_ms"),
        F.round(adjusted, 4).alias("adjusted_delay_s"),
        (adjusted > float(base_delay_s)).alias("throttled"),
    )


def frontier_backlog(
    frontier: DataFrame,
    rates: DataFrame,
    horizon_s: float = 600.0,
    host_col: str = "host",
) -> DataFrame:
    """Per-host frontier drain report: how long until each host's
    pending queue empties at its politeness-capped rate, and which
    hosts are STARVED (drain time beyond the scheduling horizon —
    their tail will never be fetched unless the budget changes).

    Input: ``frontier`` (one row per pending URL, with ``host``),
    ``rates`` (host, rate_per_s — the politeness budget,
    O(hosts) small). Output: (host, n_pending, rate_per_s, drain_s,
    starved).

    The signal closes the planning loop: schedule_crawl decides WHAT
    to fetch per host, this reports whether the per-host budget can
    actually clear the queue — the capacity-planning view a frontier
    at 10^10 URLs is operated by.

    Scale shape: one map-side-combinable count per host over the big
    frontier, then a broadcast join against the tiny rate table.
    """
    pending = frontier.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("n_pending")
    )
    r = rates.select(F.col(host_col).alias("host"),
                     F.col("rate_per_s").cast("double").alias("rate_per_s"))
    j = pending.join(F.broadcast(r), "host", "left")
    drain = F.col("n_pending").cast("double") / F.col("rate_per_s")
    return j.select(
        "host", "n_pending", "rate_per_s",
        F.round(drain, 4).alias("drain_s"),
        F.coalesce(drain > float(horizon_s), F.lit(True)).alias("starved"),
    )


def fetch_gini(fetch_log: DataFrame, host_col: str = "host") -> DataFrame:
    """Crawl-fairness rollup: the Gini coefficient of per-host fetch
    shares — one number that says whether the scheduler's politeness
    budget actually spread the crawl (0 = perfectly even, -> 1 = one
    host ate the budget). The north rule's skew bound (<2x median
    partition) constrains one generation; this audits the realized
    allocation over a whole crawl.

    Output: single row (n_hosts, total_fetches, gini) with
    gini = sum_i (2i - n - 1) * x_i / (n * sum x) over ascending x.

    Scale shape: one combinable count per host reduces the input to
    O(hosts) rows; the rank window over that host table is a single
    ordered pass — bounded by the host count, not the fetch count
    (the same O(hosts)-is-small contract as server_politeness /
    adaptive_delay's output tables).
    """
    from pyspark.sql import Window

    counts = fetch_log.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("x")
    )
    w = Window.orderBy(F.col("x").asc(), F.col("host").asc())
    ranked = counts.withColumn("i", F.row_number().over(w))
    agg = ranked.agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("x").cast("double").alias("_sx"),
        F.sum(F.col("i").cast("double") * F.col("x").cast("double"))
            .alias("_six"),
    )
    # sum_i (2i - n - 1) x_i = 2*sum(i*x) - (n+1)*sum(x)
    gini = (2.0 * F.col("_six") - (F.col("_n") + 1.0) * F.col("_sx")) / (
        F.col("_n") * F.col("_sx")
    )
    return agg.select(
        F.col("_n").cast("long").alias("n_hosts"),
        F.col("_sx").cast("long").alias("total_fetches"),
        F.round(gini, 6).alias("gini"),
    )


def effective_delay(
    robots_delays: DataFrame,
    adaptive: DataFrame,
    default_delay_s: float = 1.0,
) -> DataFrame:
    """Per-host politeness RESOLUTION: the delay the scheduler must
    actually honor is the strictest of the three signals — the
    site's explicit robots.txt Crawl-delay ask
    (operators/robots.py robots_table), the latency-adaptive delay
    (:func:`adaptive_delay` — the server struggling NOW), and the
    engine default. The reference has only a fixed global rate
    (/root/reference/modules/ratelimit/ratelimit.go:36-75); this is
    the max-combine every polite crawler runs per host per cycle.

    Inputs: ``robots_delays`` (host, crawl_delay — nullable seconds),
    ``adaptive`` (host, adjusted_delay_s). Full-outer on host;
    missing signals contribute nothing. Output: (host,
    robots_delay_s, adaptive_delay_s, effective_delay_s, source)
    where source names the winning signal (ties resolve
    robots > adaptive > default — prefer honoring the explicit ask).

    Scale shape: both inputs are O(hosts) rollups; one equi-join +
    a projection. No Python, no windows.
    """
    r = robots_delays.select(
        F.col("host"),
        F.col("crawl_delay").cast("double").alias("robots_delay_s"),
    )
    a = adaptive.select(
        F.col("host"),
        F.col("adjusted_delay_s").cast("double").alias(
            "adaptive_delay_s"
        ),
    )
    j = r.join(a, "host", "full_outer")
    rd = F.coalesce("robots_delay_s", F.lit(0.0))
    ad = F.coalesce("adaptive_delay_s", F.lit(0.0))
    eff = F.greatest(rd, ad, F.lit(float(default_delay_s)))
    source = (
        F.when(rd >= eff, F.lit("robots"))
        .when(ad >= eff, F.lit("adaptive"))
        .otherwise(F.lit("default"))
    )
    return j.select(
        "host",
        "robots_delay_s",
        "adaptive_delay_s",
        F.round(eff, 4).alias("effective_delay_s"),
        source.alias("source"),
    )
