"""Request validators as Catalyst Column predicates.

The reference runs validators imperatively per URL with short-circuit
(/root/reference/scrape.go:162-168). Here each validator is a pure
Column expression, so the whole conjunction is one Catalyst filter:
pushdown-able, codegen-able, no Python in the loop.

Every URL in a frontier generation shares the same depth, so the depth
validator (modules/depth/depth.go:26-28, inclusive <=) is applied by
the generation loop itself; this module covers domain + URL-regex.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.functions.urls import host_of

import re


def _valid_regexes(patterns: list[str]) -> list[str]:
    """Invalid regexes are silently skipped (urlfilter.go:39-53).
    Go and Java regex syntax agree on the subset the reference uses."""
    ok = []
    for pattern in patterns:
        try:
            re.compile(pattern)
            ok.append(pattern)
        except re.error:
            continue
    return ok


def domain_filter(config: CrawlConfig, seed_hosts: list[str]) -> Column:
    """modules/domainfilter/domainfilter.go:45-77.

    allowed = config.allowed_domains + seed hosts (Provision appends,
    :32-43); pass iff host allowed (or '*'), minus blocked; disabled
    (pass-all) only if both lists empty.
    """
    if not config.domain_filter:
        return F.lit(True)
    allowed = list(config.allowed_domains) + list(seed_hosts)
    blocked = list(config.blocked_domains)
    if not allowed and not blocked:
        return F.lit(True)
    host = host_of("url")
    if "*" in allowed:
        ok = F.lit(True)
    elif allowed:
        ok = host.isin(allowed)
    else:
        ok = F.lit(False)
    if blocked:
        ok = ok & ~host.isin(blocked)
    return ok


def url_filter(config: CrawlConfig, seed_urls: list[str]) -> Column:
    """modules/urlfilter/urlfilter.go:57-100.

    Seeds always pass; disabled if both lists empty; empty allowlist =
    allow-all; block overrides allow.
    """
    allowed = _valid_regexes(list(config.allowed_urls))
    blocked = _valid_regexes(list(config.blocked_urls))
    if not config.allowed_urls and not config.blocked_urls:
        return F.lit(True)
    url = F.col("url")
    if allowed:
        ok = reduce(lambda a, b: a | b, (url.rlike(p) for p in allowed))
    else:
        ok = F.lit(True)
    if blocked:
        ok = ok & ~reduce(lambda a, b: a | b, (url.rlike(p) for p in blocked))
    if seed_urls:
        ok = ok | url.isin(list(seed_urls))
    return ok


def validators(config: CrawlConfig, seed_urls: list[str], seed_hosts: list[str]) -> Column:
    """Conjunction of all request validators (scrape.go:162-168)."""
    return domain_filter(config, seed_hosts) & url_filter(config, seed_urls)
