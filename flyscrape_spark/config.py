"""Crawl configuration.

Mirrors the reference's JSON config surface (template.js /
flyscrape.go:128-134): url/urls, depth, follow, allowedDomains /
blockedDomains, allowedURLs / blockedURLs, rate, concurrency, plus
engine-side knobs the reference hard-codes (retry schedule
modules/retry/retry.go:136-141).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlConfig:
    # BFS depth limit, inclusive (modules/depth/depth.go:26-28).
    # None = no depth module loaded (the reference's library-embedding
    # test path, e.g. modules/followlinks/followlinks_test.go:23-43).
    depth: int | None = 0
    # follow selectors; None -> default ["a[href]"]
    # (modules/followlinks/followlinks.go:31-35); [] disables following
    follow: list[str] | None = None
    # host filters (modules/domainfilter/domainfilter.go).
    # domain_filter=False models the reference's library-embedding test
    # path where the domainfilter module is simply not wired in
    # (e.g. modules/followlinks/followlinks_test.go:23-43); when True,
    # seed hosts are implicitly allowed (domainfilter.go:32-43).
    domain_filter: bool = True
    allowed_domains: list[str] = field(default_factory=list)
    blocked_domains: list[str] = field(default_factory=list)
    # URL regex filters (modules/urlfilter/urlfilter.go)
    allowed_urls: list[str] = field(default_factory=list)
    blocked_urls: list[str] = field(default_factory=list)
    # politeness: requests/minute. Reference enforces this globally
    # (modules/ratelimit/ratelimit.go:38-40); this engine enforces it
    # PER HOST across salted partitions (north_rule).
    rate: float | None = None
    # cap on simultaneous in-flight requests per fetch task — the
    # reference's semaphore (modules/ratelimit/ratelimit.go:54-59).
    # Consumed by HttpTransport (thread-pool width per Arrow batch).
    concurrency: int | None = None
    # browser rendering (modules/browser/browser.go:41-63): swap the
    # fetch transport for a page-render round trip (RenderingTransport,
    # sources/browser.py; no Chromium ships in this sandbox — the real
    # renderer is a documented stub, tests use a fake DOM-settling
    # renderer). When on and ``concurrency`` is unset, effective fetch
    # concurrency clamps to 1 (modules/ratelimit/ratelimit.go:50-52).
    browser: bool = False
    # headless: null in the reference means true (browser.go:46-49)
    headless: bool = True
    # retry schedule in seconds (modules/retry/retry.go:136-141)
    retry_delays: tuple[float, ...] = (1.0, 2.0, 5.0, 10.0)
    retry_statuses: frozenset[int] = frozenset({403, 408, 425, 429, 500, 502, 503, 504})
    # scale-mode RFC-3986 canonicalization before hashing into the seen
    # set. False = reference semantics (exact strings, TrimSpace only,
    # scrape.go:271) — required for fixture-equality tests.
    canonicalize: bool = False
    # 128-bit fingerprint seen keys (scale mode). The seen set and the
    # per-generation anti-join carry TWO independent 64-bit xxhash64
    # keys per URL instead of (64-bit key + full URL string): shuffle
    # width drops from ~8+len(url) bytes to 16 bytes per row, and the
    # 10^10-row seen side never shuffles strings at all. Collision
    # math: P(any pair of distinct URLs agreeing on both keys) over
    # n = 10^10 URLs is ~ n^2 / 2^129 ≈ 1.5e-19 — below hardware
    # bit-flip rates, so the result is exact for every practical
    # purpose (equality with exact mode is pytest-pinned). False =
    # collision-exact string tiebreak (reference-equality mode).
    seen_fingerprint: bool = False
    # max salt shards for a single hot host (politeness fan-out)
    max_host_fanout: int = 8
    # RFC 9309 robots.txt compliance (north_rule; the reference has no
    # robots support — engine-only capability). When on, each new host
    # costs one robots.txt fetch and disallowed URLs are dropped at
    # fetch time (they still enter the seen set, like any
    # validator-dropped URL, scrape.go:276-285 semantics).
    respect_robots: bool = False
    # page-level robots meta directives (operators/metarobots.py;
    # engine-only — the reference follows links unconditionally,
    # scrape.go:210-268). When on: a page declaring nofollow
    # contributes no outlinks to the next generation, and a page
    # declaring noindex is fetched and link-followed but excluded
    # from results. Seen/ordering semantics are untouched.
    respect_meta_robots: bool = False
    # best-first admission: cap on URLs FETCHED per generation, chosen
    # by priority score (CrawlEngine's ``priority_scores`` table, e.g.
    # PageRank/in-degree from the previous crawl's link graph —
    # operators/graph.py). None = reference behavior (fetch everything
    # enqueued). Truncation happens at fetch time, so skipped URLs are
    # still marked seen — identical to every other validator
    # (scrape.go:276-285 enqueue-marks-seen semantics).
    generation_budget: int | None = None
    # host circuit breaker (engine-only): once a host's cumulative
    # server-error ratio (5xx/429/transport errors) reaches this
    # threshold over >= host_cooldown_min_fetches observed fetches,
    # its URLs are dropped at fetch time in later generations (they
    # still enter the seen set — validator-dropped semantics,
    # scrape.go:276-285). None = breaker off (reference behavior:
    # per-request retry only, modules/retry/retry.go:43-81).
    host_cooldown_ratio: float | None = None
    host_cooldown_min_fetches: int = 10
    # fixed User-Agent for every request. None (default) = rotate a
    # browser UA deterministically per URL (the reference's behavior
    # when no User-Agent header is configured, headers.go:28-40 via
    # versions.go:47-96); a set value wins over rotation but loses to
    # an explicit User-Agent entry in ``headers``.
    user_agent: str | None = None
    # cookie store (modules/cookies/cookies.go:40-59): the reference
    # attaches browser-profile cookies matching each request URL; this
    # engine takes an explicit list of sources.cookies.Cookie records
    # (no browser profile exists in the sandbox) and applies the same
    # RFC 6265 match per request, JVM-side.
    cookies: list | None = None
    # request headers set on every request
    # (modules/headers/headers.go:28-40); if User-Agent is absent a
    # browser UA is picked per request — the reference picks randomly
    # (headers.go via versions.go:47-96), this engine picks
    # deterministically by hash(url) so runs are reproducible.
    headers: dict[str, str] = field(default_factory=dict)

    def follow_selectors(self) -> list[str]:
        if self.follow is None:
            return ["a[href]"]
        return list(self.follow)


# config fields that are arrays when overridden from CLI-style args
# (reference: cmd/args.go:14-22)
_ARRAY_FIELDS = {
    "urls", "follow", "allowed_domains", "blocked_domains",
    "allowed_urls", "blocked_urls",
    # reference spellings
    "allowedDomains", "blockedDomains", "allowedURLs", "blockedURLs",
}

_CAMEL = {
    "allowedDomains": "allowed_domains",
    "blockedDomains": "blocked_domains",
    "allowedURLs": "allowed_urls",
    "blockedURLs": "blocked_urls",
}


def _infer(value: str):
    """CLI scalar type inference (cmd/args.go:86-99): bool, number,
    else string."""
    if value == "true":
        return True
    if value == "false":
        return False
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    return value


def apply_overrides(config: CrawlConfig, overrides: dict) -> CrawlConfig:
    """CLI-style ``--key value`` overrides onto a config
    (flyscrape.go:155-167 sjson semantics): array fields accept lists
    or single values (wrapped), scalars are type-inferred from
    strings. Unknown keys are ignored (each reference module
    unmarshals only the fields it knows)."""
    from dataclasses import replace

    updates = {}
    for key, value in overrides.items():
        name = _CAMEL.get(key, key)
        if name not in CrawlConfig.__dataclass_fields__:
            continue
        if key in _ARRAY_FIELDS or name in _ARRAY_FIELDS:
            if not isinstance(value, list):
                value = [value]
            value = [v if not isinstance(v, str) else v for v in value]
        elif isinstance(value, str):
            value = _infer(value)
        updates[name] = value
    return replace(config, **updates)
