"""Fetch transports.

The reference fetches with a shared http.Client through an adapter
onion (retry ⊂ ratelimit ⊂ cache ⊂ ..., /root/reference/module.go:97-107,
scrape.go:93-97). This sandbox has no network, so the engine abstracts
the fetch step behind a Transport that turns a frontier DataFrame
``(url, depth, host, ...)`` into a fetched DataFrame adding
``(status, body, error, attempts)``.

- :class:`JoinTransport` — resolves fetches against a synthetic
  ``pages(url, host, status, html)`` table via an equi-join (the test
  harness path; mirrors the reference's MockTransport,
  /root/reference/utils.go:22-35). Broadcast when small; plain
  shuffle join at scale. Retry semantics are *simulated*: a retryable
  status records len(delays)+1 attempts (modules/retry/retry.go:65-90,
  :136-141) without sleeping.

- :class:`PoliteJoinTransport` — same resolution, but routed through
  salted host-hash repartitioning + an in-partition token bucket, to
  exercise the politeness path end-to-end (virtual clock by default).

- :class:`HttpTransport` — real HTTP fetch (stdlib urllib in a thread
  pool per Arrow batch): reference retry semantics, proxy/UA
  rotation, per-host pacing, and body decoding per Content-Encoding +
  charset (:func:`decode_body`) — exercised by localhost pytest
  servers.

Error semantics copied from scrape.go:176-196: missing page == Go
transport error ("no such host") -> error set, empty body, no links;
non-2xx -> error set BUT body kept, extraction and link-follow still
run (the deferred ReceiveResponse at scrape.go:170-176 fires
regardless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flyscrape_spark.config import CrawlConfig


# Deterministic browser UA pool for rotation. The reference embeds
# live browser version lists and picks RANDOMLY per request
# (modules/headers/headers.go:28-40, versions.go:47-96); this engine
# picks by hash(url) % len(pool) so crawls are reproducible.
UA_POOL = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/121.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/122.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:123.0) "
    "Gecko/20100101 Firefox/123.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.3 Safari/605.1.15",
]


def with_request_headers(frontier: DataFrame, config: CrawlConfig) -> DataFrame:
    """Attach the per-request header map (SURVEY §2.1 #15): config
    headers as a literal map column; when no User-Agent is configured,
    a deterministic UA from the pool via pmod(xxhash64(url)). All
    JVM-side (map literal + element_at-free construction), no Python."""
    items = sorted(config.headers.items())
    if (
        not any(k.lower() == "user-agent" for k, _ in items)
        and config.user_agent is not None
    ):
        # configured fixed UA (engine-added config field); an explicit
        # User-Agent in ``headers`` still wins, matching the reference
        # precedence (headers module only fills a MISSING User-Agent)
        items = sorted(items + [("User-Agent", config.user_agent)])
    if not any(k.lower() == "user-agent" for k, _ in items):
        idx = F.pmod(F.xxhash64("url"), F.lit(len(UA_POOL)))
        ua = F.element_at(F.array(*[F.lit(u) for u in UA_POOL]), idx.cast("int") + 1)
        kv = [F.lit("User-Agent"), ua]
        for k, v in items:
            kv += [F.lit(k), F.lit(v)]
        header_map = F.create_map(*kv)
    elif items:
        kv = []
        for k, v in items:
            kv += [F.lit(k), F.lit(v)]
        header_map = F.create_map(*kv)
    else:  # pragma: no cover - unreachable (UA branch covers empty)
        header_map = F.create_map()
    frontier = frontier.withColumn("request_headers", header_map)
    if config.cookies:
        from flyscrape_spark.sources.cookies import with_cookie_header

        frontier = with_cookie_header(frontier, config.cookies)
    return frontier


class Transport:
    def fetch(self, frontier: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


class JoinTransport(Transport):
    def __init__(self, pages: DataFrame, config: CrawlConfig | None = None,
                 broadcast: bool | None = None):
        """``broadcast``: True forces the broadcast hint (tiny fixture
        tables), False forces a shuffle join, None (default) lets
        Catalyst pick by its size estimate — the scale-safe default
        (a synthetic "internet" table must not be force-broadcast)."""
        self.config = config or CrawlConfig()
        cols = ["url", "status", "html"]
        self.pages = pages.select(*cols).withColumnRenamed("url", "page_url")
        self.broadcast = broadcast

    def fetch(self, frontier: DataFrame) -> DataFrame:
        frontier = with_request_headers(frontier, self.config)
        pages = F.broadcast(self.pages) if self.broadcast else self.pages
        joined = frontier.join(pages, frontier["url"] == pages["page_url"], "left")
        retryable = list(self.config.retry_statuses)
        n_attempts = len(self.config.retry_delays) + 1
        return (
            joined.withColumn(
                "error",
                F.when(F.col("page_url").isNull(), F.lit("Get: no such host"))
                .when(
                    (F.col("status") < 200) | (F.col("status") >= 300),
                    F.concat(F.col("status").cast("string"), F.lit(" error")),
                )
                .otherwise(F.lit(None).cast("string")),
            )
            .withColumn(
                "body",
                F.when(F.col("page_url").isNull(), F.lit(None).cast("string"))
                .otherwise(F.col("html")),
            )
            .withColumn(
                "attempts",
                F.when(F.col("page_url").isNull(), F.lit(1))
                .when(F.col("status").isin(retryable), F.lit(n_attempts))
                .otherwise(F.lit(1)),
            )
            .withColumn("status", F.coalesce(F.col("status"), F.lit(0)))
            .drop("page_url", "html")
        )


class PoliteJoinTransport(Transport):
    """JoinTransport routed through the per-host politeness scheduler
    (operators/politeness.py): salted host-hash repartition so one
    task owns a host shard, then a per-shard token bucket assigns each
    row a ``fetch_time`` offset honoring rate + robots crawl-delay.

    The clock is virtual by default (fetch_time is emitted, not
    slept) — tests assert the spacing; a real HTTP transport awaits
    the same offsets. ``host_delays`` can be attached mid-crawl (the
    engine feeds it the robots.txt cache as hosts are discovered)."""

    def __init__(self, pages: DataFrame, config: CrawlConfig | None = None,
                 broadcast: bool = True, shard_target: int | None = None):
        self.config = config or CrawlConfig()
        self.inner = JoinTransport(pages, self.config, broadcast)
        self.shard_target = shard_target
        self.host_delays: DataFrame | None = None

    def fetch(self, frontier: DataFrame) -> DataFrame:
        from flyscrape_spark.operators.politeness import schedule

        rate = self.config.rate or 6000.0
        scheduled = schedule(
            frontier, rate_per_min=rate, shard_target=self.shard_target,
            max_fanout=self.config.max_host_fanout, host_delays=self.host_delays,
        ).drop("fanout", "host_rows", "shard", "crawl_delay")
        return self.inner.fetch(scheduled)


class ConstantTransport(Transport):
    """Serve the same body/status for every URL — the reference's
    MockTransport (/root/reference/utils.go:22-35), used by most module
    tests (e.g. modules/followlinks/followlinks_test.go:23-43)."""

    def __init__(self, html: str, status: int = 200,
                 config: CrawlConfig | None = None):
        self.html = html
        self.status = status
        self.config = config or CrawlConfig()

    def fetch(self, frontier: DataFrame) -> DataFrame:
        retryable = list(self.config.retry_statuses)
        n_attempts = len(self.config.retry_delays) + 1
        bad = self.status < 200 or self.status >= 300
        return (
            frontier.withColumn("status", F.lit(self.status))
            .withColumn(
                "error",
                F.lit(f"{self.status} error" if bad else None).cast("string"),
            )
            .withColumn("body", F.lit(self.html))
            .withColumn(
                "attempts",
                F.lit(n_attempts if self.status in retryable else 1),
            )
        )


# upper bound on an honored Retry-After header (seconds); beyond it
# the configured delay schedule applies instead
RETRY_AFTER_CAP = 30.0


_CHARSET_RE = None  # compiled lazily on executors


def _charset_patterns():
    global _CHARSET_RE
    if _CHARSET_RE is None:
        import re

        _CHARSET_RE = (
            # Content-Type header parameter: charset=x / charset="x"
            re.compile(r'charset\s*=\s*"?\s*([A-Za-z0-9._:-]+)', re.I),
            # HTML5 prescan (first 1024 bytes): <meta charset=...> or
            # <meta http-equiv=content-type content="...charset=...">
            re.compile(
                rb'<meta[^>]{0,512}?charset\s*=\s*["\']?\s*'
                rb"([A-Za-z0-9._:-]+)",
                re.I,
            ),
        )
    return _CHARSET_RE


def decode_body(raw: bytes, content_type: str | None = None,
                content_encoding: str | None = None) -> str:
    """Bytes-to-text the way the reference gets for free from Go's
    net/http + goquery (scrape.go:178-196): decompress per
    Content-Encoding, then decode per the declared charset.

    - Content-Encoding: gzip/x-gzip and deflate (both the RFC 1950
      zlib-wrapped form and the raw RFC 1951 form some servers send),
      comma-chained encodings applied in reverse order; a server that
      serves gzip REGARDLESS of Accept-Encoding (a real-web pattern)
      is caught by magic-byte sniffing even with no header.
    - Charset: Content-Type ``charset=`` parameter first; fallback is
      the HTML5 prescan rule — BOM, then a meta-tag sniff over the
      first 1024 bytes (covers both ``<meta charset=..>`` and the
      http-equiv form); final fallback UTF-8 with replacement (an
      unknown/garbled label also lands here). Without this an
      ISO-8859-1 or Shift-JIS page mojibakes every downstream span,
      dedup hash, and LM score.
    """
    hdr_re, meta_re = _charset_patterns()
    if content_encoding:
        encs = [e.strip().lower()
                for e in content_encoding.split(",") if e.strip()]
        for enc in reversed(encs):
            try:
                if enc in ("gzip", "x-gzip"):
                    import gzip

                    raw = gzip.decompress(raw)
                elif enc == "deflate":
                    import zlib

                    try:
                        raw = zlib.decompress(raw)
                    except zlib.error:
                        raw = zlib.decompress(raw, -zlib.MAX_WBITS)
                # identity / unknown codings: pass bytes through
            except Exception:
                break  # truncated/garbled stream: decode what we have
    elif raw[:2] == b"\x1f\x8b":  # undeclared gzip (magic bytes)
        import gzip

        try:
            raw = gzip.decompress(raw)
        except Exception:
            pass
    charset = None
    if content_type:
        m = hdr_re.search(content_type)
        if m:
            charset = m.group(1)
    if not charset:
        if raw[:3] == b"\xef\xbb\xbf":
            charset = "utf-8-sig"
        elif raw[:2] in (b"\xff\xfe", b"\xfe\xff"):
            charset = "utf-16"
        else:
            m = meta_re.search(raw[:1024])
            if m:
                charset = m.group(1).decode("ascii", "replace")
    try:
        return raw.decode(charset or "utf-8", "replace")
    except LookupError:  # unknown charset label
        return raw.decode("utf-8", "replace")


def parse_retry_after(value: str) -> float | None:
    """Retry-After: seconds or an HTTP date (the reference accepts 9
    date layouts, modules/retry/retry.go:102-134; RFC 9110 requires
    IMF-fixdate + the two legacy forms, which parsedate covers)."""
    value = value.strip()
    try:
        return max(0.0, float(value))
    except ValueError:
        pass
    try:
        from email.utils import parsedate_to_datetime
        import datetime

        when = parsedate_to_datetime(value)
        if when.tzinfo is None:
            when = when.replace(tzinfo=datetime.timezone.utc)
        now = datetime.datetime.now(datetime.timezone.utc)
        return max(0.0, (when - now).total_seconds())
    except Exception:
        return None


def _http_fetch_one(url: str, headers: dict, timeout: float,
                    retry_statuses: frozenset, retry_delays: tuple,
                    sleep, proxy: str | None = None,
                    ) -> tuple[int, str | None, str | None, int,
                               str | None, str | None]:
    """One URL through the reference's retry loop
    (modules/retry/retry.go:43-141): retry on retryable statuses and
    transport errors with the fixed delay schedule, honoring a numeric
    Retry-After header (retry.go:102-110). ``proxy`` routes the
    request through an HTTP proxy (modules/proxy/proxy.go:34-61).
    Returns (status, body, error, attempts, etag, last_modified) —
    the trailing validators feed conditional revalidation
    (RevalidatingTransport); 304 Not Modified is a SUCCESS here
    (error None, no body — the caller substitutes its cached copy)."""
    import urllib.error
    import urllib.request

    if proxy:
        open_fn = urllib.request.build_opener(
            urllib.request.ProxyHandler({"http": proxy, "https": proxy})
        ).open
    else:
        open_fn = urllib.request.urlopen

    attempts = 0
    last: tuple[int, str | None, str | None, str | None, str | None] = (
        0, None, "not fetched", None, None)
    for delay in list(retry_delays) + [None]:
        attempts += 1
        retry_after = None
        try:
            hdrs = dict(headers or {})
            if not any(k.lower() == "accept-encoding" for k in hdrs):
                # advertise gzip (Go's net/http does this by default
                # and transparently decompresses; decode_body is our
                # equivalent of that free behavior)
                hdrs["Accept-Encoding"] = "gzip"
            req = urllib.request.Request(url, headers=hdrs)
            with open_fn(req, timeout=timeout) as resp:
                status = resp.status
                body = decode_body(
                    resp.read(),
                    resp.headers.get("Content-Type"),
                    resp.headers.get("Content-Encoding"),
                )
                etag = resp.headers.get("ETag")
                lastmod = resp.headers.get("Last-Modified")
            last = (status, body, None, etag, lastmod)
            if status not in retry_statuses:
                return _ret(last, attempts)
        except urllib.error.HTTPError as e:
            if e.code == 304:
                # Not Modified: success for a conditional request —
                # validators may be resent per RFC 9110 §15.4.5
                return _ret((304, None, None, e.headers.get("ETag"),
                             e.headers.get("Last-Modified")), attempts)
            body = None
            try:
                body = decode_body(
                    e.read(),
                    e.headers.get("Content-Type"),
                    e.headers.get("Content-Encoding"),
                )
            except Exception:
                pass
            last = (e.code, body, f"{e.code} error", None, None)
            if e.code not in retry_statuses:
                return _ret(last, attempts)
            ra = e.headers.get("Retry-After")
            if ra is not None:
                retry_after = parse_retry_after(ra)
        except Exception as e:  # transport error (net.Error analog)
            last = (0, None, f"Get {url}: {e}", None, None)
        if delay is None:
            return _ret(last, attempts)
        if retry_after is not None:
            # honor Retry-After but clamp it: a hostile/misconfigured
            # server must not park an executor thread for hours (the
            # HTTP-date form allows arbitrary future times)
            sleep(max(delay, min(retry_after, RETRY_AFTER_CAP)))
        else:
            sleep(delay)
    return _ret(last, attempts)  # pragma: no cover


def _ret(last, attempts):
    """(status, body, error, attempts, etag, last_modified)."""
    status, body, error, etag, lastmod = last
    return (status, body, error, attempts, etag, lastmod)


class HttpTransport(Transport):
    """Real HTTP fetch: mapInPandas over the politeness-scheduled
    frontier, a thread pool per Arrow batch (stdlib urllib — aiohttp
    is not in this container; the structure is identical with an
    async pool swapped in), reference retry semantics, per-host
    pacing by awaiting the scheduler's ``fetch_time`` offsets.

    Scale shape: the frontier arrives repartitioned by (host, shard) —
    each task owns its host shards exclusively, so honoring the
    precomputed fetch_time offsets enforces the per-host budget with
    zero cross-executor coordination (north_rule)."""

    def __init__(self, config: CrawlConfig | None = None, timeout: float = 10.0,
                 pool_size: int | None = None, pace: bool = True,
                 shard_target: int | None = None,
                 proxies: list[str] | None = None):
        self.config = config or CrawlConfig()
        self.timeout = timeout
        # config.concurrency is the reference's simultaneous-request
        # semaphore (modules/ratelimit/ratelimit.go:54-59), enforced
        # here as the per-task thread-pool width
        self.pool_size = (
            pool_size if pool_size is not None
            else (self.config.concurrency or 16)
        )
        self.pace = pace
        self.shard_target = shard_target
        # proxy rotation (modules/proxy/proxy.go:34-61): the reference
        # picks randomly per request; this engine picks by hash(url)
        # so crawls are reproducible (same policy as UA rotation)
        self.proxies = list(proxies) if proxies else []

    def fetch(self, frontier: DataFrame) -> DataFrame:
        import pandas as pd
        from pyspark.sql.types import (
            IntegerType, StringType, StructField, StructType,
        )

        from flyscrape_spark.operators.politeness import schedule

        rate = self.config.rate or 6000.0
        host_interval = 60.0 / rate
        scheduled = schedule(
            frontier, rate_per_min=rate, shard_target=self.shard_target,
            max_fanout=self.config.max_host_fanout,
        ).drop("fanout", "host_rows", "shard", "crawl_delay")
        scheduled = with_request_headers(scheduled, self.config)

        out_schema = StructType(
            list(scheduled.schema.fields)
            + [
                StructField("status", IntegerType()),
                StructField("body", StringType()),
                StructField("error", StringType()),
                StructField("attempts", IntegerType()),
                StructField("etag", StringType()),
                StructField("last_modified", StringType()),
            ]
        )
        timeout = self.timeout
        pool_size = self.pool_size
        pace = self.pace
        proxies = list(self.proxies)
        retry_statuses = frozenset(self.config.retry_statuses)
        retry_delays = tuple(self.config.retry_delays)

        def run_batches(batches):
            import hashlib
            import threading
            import time as _time
            from concurrent.futures import ThreadPoolExecutor

            # Clock anchor = FIRST BATCH ARRIVAL, not generator start:
            # the batches iterator blocks on the JVM's schedule shuffle
            # before yielding, and anchoring earlier silently consumes
            # the first ~pipeline-latency seconds of every fetch_time
            # offset (observed: sub-interval same-host bursts at the
            # start of each task). None until the loop below runs.
            start: list[float] = []
            # belt-and-braces per-host floor: even if offsets drift
            # (late batch, clock anchor, retries), never START two
            # requests to one host closer than its scheduled spacing
            host_last: dict = {}
            host_lock = threading.Lock()

            def pick_proxy(url: str) -> str | None:
                if not proxies:
                    return None
                h = int(hashlib.md5(url.encode()).hexdigest()[:8], 16)
                return proxies[h % len(proxies)]

            def one(row):
                if pace:
                    wait = row["fetch_time"] - (_time.monotonic() - start[0])
                    if wait > 0:
                        _time.sleep(wait)
                    host = row.get("host")
                    while True:
                        now = _time.monotonic()
                        with host_lock:
                            nxt = host_last.get(host, now)
                            if now >= nxt:
                                host_last[host] = now + host_interval
                                break
                        _time.sleep(max(nxt - now, 0.0))
                headers = dict(row.get("request_headers") or {})
                # conditional validators (RevalidatingTransport) win
                # over any configured header of the same name
                headers.update(row.get("conditional_headers") or {})
                return _http_fetch_one(
                    row["url"], headers, timeout,
                    retry_statuses, retry_delays, _time.sleep,
                    proxy=pick_proxy(row["url"]),
                )

            with ThreadPoolExecutor(max_workers=pool_size) as pool:
                for pdf in batches:
                    if not start:
                        start.append(_time.monotonic())
                    results = list(pool.map(one, pdf.to_dict("records")))
                    pdf = pdf.copy()
                    pdf["status"] = [r[0] for r in results]
                    pdf["body"] = [r[1] for r in results]
                    pdf["error"] = [r[2] for r in results]
                    pdf["attempts"] = [r[3] for r in results]
                    pdf["etag"] = [r[4] for r in results]
                    pdf["last_modified"] = [r[5] for r in results]
                    yield pdf

        return scheduled.mapInPandas(run_batches, schema=out_schema)


class RevalidatingTransport(Transport):
    """Conditional-revalidation wrapper (RFC 9110 §13.1): joins the
    previous crawl's stored validators onto the frontier, sends
    ``If-None-Match`` (ETag) / ``If-Modified-Since`` (Last-Modified)
    with each request, and answers 304 Not Modified from the stored
    body — the page costs headers, not bytes.

    The reference's cache never revalidates (modules/cache/cache.go
    serves hits verbatim; the only refresh is the bypass header,
    utils.go:14) — engine-added, because an incremental recrawl at
    the 10^10-URL design point refetches mostly-unchanged pages and
    lives on 304s.

    ``prior``: (url, etag, last_modified, body) — from the previous
    snapshot's fetched table (HttpTransport now surfaces etag /
    last_modified columns). Shape: two equi-joins on url (validators
    in, bodies back); revalidated rows come back status 200 with the
    cached body and ``not_modified`` true, so downstream parse /
    extract treats them like any fetched page.
    """

    def __init__(self, inner: Transport, prior: DataFrame):
        self.inner = inner
        self.prior = prior

    def fetch(self, frontier: DataFrame) -> DataFrame:
        entries = F.filter(
            F.array(
                F.struct(F.lit("If-None-Match").alias("k"),
                         F.col("etag").alias("v")),
                F.struct(F.lit("If-Modified-Since").alias("k"),
                         F.col("last_modified").alias("v")),
            ),
            lambda s: s["v"].isNotNull(),
        )
        cond = self.prior.select(
            "url", F.map_from_entries(entries).alias("conditional_headers")
        )
        fetched = self.inner.fetch(frontier.join(cond, "url", "left"))
        prior_bodies = self.prior.select(
            "url", F.col("body").alias("_prior_body"),
            F.col("etag").alias("_prior_etag"),
            F.col("last_modified").alias("_prior_lm"),
        )
        hit = F.col("status") == 304
        return (
            fetched.join(prior_bodies, "url", "left")
            .withColumn("not_modified", F.coalesce(hit, F.lit(False)))
            .withColumn("body", F.when(hit, F.col("_prior_body"))
                        .otherwise(F.col("body")))
            .withColumn("status", F.when(hit, F.lit(200))
                        .otherwise(F.col("status")))
            .withColumn("etag", F.when(hit, F.coalesce("etag", "_prior_etag"))
                        .otherwise(F.col("etag")))
            .withColumn("last_modified",
                        F.when(hit, F.coalesce("last_modified", "_prior_lm"))
                        .otherwise(F.col("last_modified")))
            .drop("conditional_headers", "_prior_body", "_prior_etag",
                  "_prior_lm")
        )
