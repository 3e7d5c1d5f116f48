"""robots.txt politeness (RFC 9309) — the north_rule's "politeness,
robots" leg.

The reference has NO robots.txt support (no module under
/root/reference/modules/ touches robots); this engine adds it because
a 10^10-URL crawl without robots compliance is not shippable. Design:

- :func:`parse_robots` — pure-Python RFC 9309 group parser: the most
  specific matching user-agent group wins ('*' fallback), Allow /
  Disallow rules with ``*`` wildcards and ``$`` end anchors,
  longest-pattern-match precedence, Allow wins length ties
  (RFC 9309 §2.2.2). ``Crawl-delay`` (de-facto extension) is surfaced
  so the politeness scheduler can tighten a host's budget.
- :func:`robots_table` — hosts -> fetch ``/robots.txt`` through the
  engine's Transport -> one (host, rules, crawl_delay) row per host.
  Missing/error robots (4xx/no page) = allow-all, per RFC 9309 §2.3.1
  ("unavailable" status); rules are pre-sorted by specificity at parse
  time so the matcher is a first-match scan.
- :func:`allowed_filter` — frontier x robots broadcast join + one
  vectorized match UDF -> boolean ``robots_allowed`` column. Rules
  ride as an array<struct<allow,pattern>> column; hosts without a
  robots row pass.

Scale shape: the robots table is one row per *host* (millions of rows
at 10^10 URLs, still tiny next to the frontier) — broadcast when under
the autoBroadcast threshold, shuffle-join on host otherwise; the match
UDF is Arrow-batched, one regex-compile per distinct pattern per batch
(LRU-cached process-wide).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

RULE_TYPE = ArrayType(
    StructType(
        [
            StructField("allow", BooleanType()),
            StructField("pattern", StringType()),
        ]
    )
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("rules", RULE_TYPE),
        StructField("crawl_delay", DoubleType()),
    ]
)


def parse_robots(body: str | None, agent: str = "*") -> tuple[list[dict], float | None]:
    """Parse a robots.txt body for ``agent``.

    Returns (rules, crawl_delay). Rules are dicts {allow, pattern},
    sorted longest-pattern-first with Allow before Disallow on equal
    length (RFC 9309 §2.2.2 precedence), so evaluation is first-match.
    An unparseable / empty body yields ([], None) = allow-all.
    """
    if not body:
        return [], None
    agent = agent.lower()

    # group lines by user-agent blocks
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []  # (agents, directives)
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    agents_open = False  # consecutive user-agent lines share one group

    def flush():
        nonlocal cur_agents, cur_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules = [], []

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not agents_open:
                flush()
                agents_open = True
            cur_agents.append(value.lower())
        else:
            agents_open = False
            cur_rules.append((key, value))
    flush()

    # most specific agent group: longest user-agent token that is a
    # prefix of ours (product-token match), else the '*' group
    best: tuple[int, list[tuple[str, str]]] | None = None
    star: list[tuple[str, str]] | None = None
    for agents, directives in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = directives
            elif agent.startswith(a) and (best is None or len(a) > best[0]):
                best = (len(a), directives)
    directives = best[1] if best else (star if star is not None else [])

    rules: list[dict] = []
    crawl_delay: float | None = None
    for key, value in directives:
        if key in ("allow", "disallow"):
            if value:
                rules.append({"allow": key == "allow", "pattern": value})
            # empty Disallow == allow-all (emit nothing)
        elif key == "crawl-delay":
            try:
                crawl_delay = float(value)
            except ValueError:
                pass
    rules.sort(key=lambda r: (-len(r["pattern"]), not r["allow"]))
    return rules, crawl_delay


@lru_cache(maxsize=4096)
def _compile(pattern: str) -> re.Pattern:
    """robots pattern -> anchored regex: '*' matches any run, a
    trailing '$' anchors the end; everything else is literal."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return re.compile("^" + ".*".join(parts) + ("$" if anchored else ""))


def is_allowed(rules: list, path: str) -> bool:
    """First (= most specific) matching rule decides; no match = allow.
    Accepts dicts or Row-likes with .allow/.pattern."""
    if not path:
        path = "/"
    for r in rules or []:
        allow = r["allow"] if isinstance(r, dict) else r.allow
        pattern = r["pattern"] if isinstance(r, dict) else r.pattern
        if _compile(pattern).match(path):
            return bool(allow)
    return True


@F.pandas_udf(ROBOTS_SCHEMA["rules"].dataType)
def parse_rules_udf(body: pd.Series) -> pd.Series:
    return body.map(lambda b: parse_robots(b)[0])


@F.pandas_udf(DoubleType())
def parse_delay_udf(body: pd.Series) -> pd.Series:
    return body.map(lambda b: parse_robots(b)[1])


def robots_table(hosts: DataFrame, transport, scheme: str = "http") -> DataFrame:
    """hosts(host[, scheme]) -> (host, rules, crawl_delay) via one
    robots.txt fetch per distinct host through the engine Transport.
    If the hosts frame carries a ``scheme`` column (the engine derives
    it from the frontier URLs), robots.txt is probed on that origin;
    otherwise the ``scheme`` argument is the fallback."""
    scheme_col = (
        F.coalesce(F.col("scheme"), F.lit(scheme))
        if "scheme" in hosts.columns
        else F.lit(scheme)
    )
    robots_frontier = hosts.select(
        F.concat(scheme_col, F.lit("://"), F.col("host"), F.lit("/robots.txt")).alias("url"),
        F.col("host"),
    )
    fetched = transport.fetch(robots_frontier)
    ok_body = F.when(
        (F.col("status") >= 200) & (F.col("status") < 300), F.col("body")
    )
    return fetched.select(
        "host",
        parse_rules_udf(ok_body).alias("rules"),
        parse_delay_udf(ok_body).alias("crawl_delay"),
    )


def allowed_filter(
    frontier: DataFrame,
    robots: DataFrame,
    n_hosts: int | None = None,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """Add ``robots_allowed`` to a frontier that has (url, host).

    Join-strategy gating (the scale hazard): the robots table is one
    row per host — small for most crawls, but MILLIONS of rows at the
    10^10-URL design point, where a forced broadcast OOMs the driver.
    When the caller knows the host count (the engine counts each
    generation's materialized robots increment) the broadcast hint is
    applied only under ``broadcast_threshold``; with no count, no hint
    — Catalyst picks by its size estimate and falls back to a shuffle
    join on ``host``."""

    @F.pandas_udf(BooleanType())
    def match_udf(url: pd.Series, rules: pd.Series) -> pd.Series:
        out = []
        for u, rs in zip(url, rules):
            if rs is None or len(rs) == 0:
                out.append(True)
                continue
            # path+query, per RFC 9309 matching scope
            m = re.match(r"^[a-z][a-z0-9+.-]*://[^/]*(.*)$", u, re.I)
            path = m.group(1) if m else u
            out.append(is_allowed(list(rs), path or "/"))
        return pd.Series(out)

    rules = robots.select("host", "rules")
    if n_hosts is not None and n_hosts <= broadcast_threshold:
        rules = F.broadcast(rules)
    joined = frontier.join(rules, "host", "left")
    return joined.withColumn(
        "robots_allowed", match_udf(F.col("url"), F.col("rules"))
    ).drop("rules")


def sitemap_directives(
    robots_bodies: DataFrame, body_col: str = "body", host_col: str = "host"
) -> DataFrame:
    """(host, sitemap_url, position) for every ``Sitemap:`` line of
    every robots.txt body, in file order.

    The ``Sitemap:`` directive is the standard robots.txt extension
    (sitemaps.org protocol; RFC 9309 §2.3 leaves such "other records"
    to their own specs): it names absolute sitemap URLs, is
    case-insensitive, may appear anywhere in the file (outside any
    User-agent group), and may repeat. These URLs feed
    ``sources/sitemaps.py`` — fetch via the crawl Transport, parse,
    and union into the frontier as discovery seeds.

    Unlike the rule parser (grouped, stateful → pandas UDF), sitemap
    lines are context-free, so this is pure JVM regexp work: one
    ``regexp_extract_all`` + ``posexplode`` — zero Python, zero
    shuffles, fans out partition-locally.
    """
    lines = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?im)^\s*sitemap\s*:\s*(\S+)"), 1
    )
    return (
        robots_bodies.select(
            F.col(host_col).alias("host"),
            F.posexplode_outer(lines).alias("position", "sitemap_url"),
        )
        .filter(F.col("sitemap_url").isNotNull())
        .select("host", "sitemap_url", "position")
    )


def robots_churn(
    old: DataFrame,
    new: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Robots-policy churn between two crawl snapshots: which hosts
    changed their Disallow rule set, how many paths were added vs
    removed, and the net direction. A host that *tightened* its
    policy needs its already-fetched URLs re-checked (we may now hold
    pages the site disallows); one that *loosened* frees frontier
    URLs the last crawl skipped — both feed the recrawl planner.

    Inputs: one row per host per snapshot (host, robots body).
    Output: (host, n_old, n_new, added, removed, direction) with
    direction in {'same','tightened','loosened','mixed'}; hosts
    present in only one snapshot diff against the empty rule set
    (full outer join).

    The diff is policy-level — the sorted distinct Disallow path set
    across ALL agent groups — not a per-agent evaluation (that's
    ``allowed_filter``); empty ``Disallow:`` lines (allow-all per RFC
    9309 §2.2.2) carry no path and are excluded by construction.

    Scale shape: rule extraction is one multiline JVM regexp + array
    ops fused into each snapshot's scan; one equi-join on host (AQE
    broadcasts the smaller snapshot when sizes diverge). No Python.
    """
    # [ \t]* (NOT \s*) around the colon: \s crosses newlines, so an
    # empty "Disallow:" line (allow-all, RFC 9309 §2.2.2) would
    # capture the NEXT line's first token as a phantom rule path and
    # swallow the following real rule
    pat = r"(?m)^[Dd][Ii][Ss][Aa][Ll][Ll][Oo][Ww][ \t]*:[ \t]*(\S+)"

    def rules(df: DataFrame, out: str) -> DataFrame:
        return df.select(
            F.col(host_col).alias("host"),
            F.array_sort(
                F.array_distinct(
                    F.regexp_extract_all(F.col(body_col), F.lit(pat), 1)
                )
            ).alias(out),
        )

    empty = F.array().cast("array<string>")
    j = (
        rules(old, "r_old")
        .join(rules(new, "r_new"), "host", "full_outer")
        .select(
            "host",
            F.coalesce("r_old", empty).alias("r_old"),
            F.coalesce("r_new", empty).alias("r_new"),
        )
    )
    added = F.size(F.array_except("r_new", "r_old"))
    removed = F.size(F.array_except("r_old", "r_new"))
    direction = (
        F.when((added == 0) & (removed == 0), F.lit("same"))
        .when(added > removed, F.lit("tightened"))
        .when(removed > added, F.lit("loosened"))
        .otherwise(F.lit("mixed"))
    )
    return j.select(
        "host",
        F.size("r_old").alias("n_old"),
        F.size("r_new").alias("n_new"),
        added.alias("added"),
        removed.alias("removed"),
        direction.alias("direction"),
    )
