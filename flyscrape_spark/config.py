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
    concurrency: int | None = None
    # retry schedule in seconds (modules/retry/retry.go:136-141)
    retry_delays: tuple[float, ...] = (1.0, 2.0, 5.0, 10.0)
    retry_statuses: frozenset[int] = frozenset({403, 408, 425, 429, 500, 502, 503, 504})
    # scale-mode RFC-3986 canonicalization before hashing into the seen
    # set. False = reference semantics (exact strings, TrimSpace only,
    # scrape.go:271) — required for fixture-equality tests.
    canonicalize: bool = False
    # max salt shards for a single hot host (politeness fan-out)
    max_host_fanout: int = 8
    # RFC 9309 robots.txt compliance (north_rule; the reference has no
    # robots support — engine-only capability). When on, each new host
    # costs one robots.txt fetch and disallowed URLs are dropped at
    # fetch time (they still enter the seen set, like any
    # validator-dropped URL, scrape.go:276-285 semantics).
    respect_robots: bool = False
    user_agent: str = "flyscrape"

    def follow_selectors(self) -> list[str]:
        if self.follow is None:
            return ["a[href]"]
        return list(self.follow)
