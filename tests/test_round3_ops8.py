"""Round-3 batch-8 operators: rel=canonical consolidation and
cross-host mirror detection — hand-computed values plus the
boilerplate-cap skew guard."""

from flyscrape_spark.operators.canonical import canonical_groups, canonical_url
from flyscrape_spark.operators.mirrors import mirror_hosts


# ---------------------------------------------------- rel=canonical


def test_canonical_extraction_forms(spark):
    """Absolute hrefs pass through (both attribute orders),
    root-relative resolves against the PAGE's host, missing/odd
    declarations fall back to self."""
    pages = spark.createDataFrame(
        [
            (0, "http://a.example/x?p=2",
             '<link rel="canonical" href="http://a.example/x"/>'),
            (1, "http://a.example/y",
             "<link href='http://a.example/x' rel='canonical'/>"),
            (2, "http://b.example/z?s=1",
             '<head><link rel="canonical" href="/z"/></head>'),
            (3, "http://c.example/plain", "<p>no link</p>"),
            (4, "http://d.example/odd",
             '<link rel="canonical" href="//cdn.example/odd"/>'),
        ],
        "doc_id long, url string, html string",
    )
    out = {
        r["doc_id"]: r["c"]
        for r in pages.select(
            "doc_id", canonical_url("url", "html").alias("c")
        ).collect()
    }
    assert out[0] == "http://a.example/x"
    assert out[1] == "http://a.example/x"      # href-before-rel order
    assert out[2] == "http://b.example/z"      # root-relative resolve
    assert out[3] == "http://c.example/plain"  # self fallback
    assert out[4] == "http://d.example/odd"    # scheme-relative -> self


def test_canonical_groups_rollup(spark):
    pages = spark.createDataFrame(
        [
            ("http://a.example/x",
             '<link rel="canonical" href="http://a.example/x"/>'),
            ("http://a.example/x?p=2",
             '<link rel="canonical" href="http://a.example/x"/>'),
            ("http://a.example/orphan?p=1",
             '<link rel="canonical" href="http://a.example/orphan"/>'),
        ],
        "url string, html string",
    )
    out = {r["canonical_url"]: r for r in canonical_groups(pages).collect()}
    x = out["http://a.example/x"]
    assert x["n_pages"] == 2 and x["canonical_fetched"]
    assert x["example_url"] == "http://a.example/x"
    orphan = out["http://a.example/orphan"]
    # the declared canonical was never fetched -> frontier feedback
    assert orphan["n_pages"] == 1 and not orphan["canonical_fetched"]


# ------------------------------------------------------ mirror hosts


def test_mirror_overlap_containment(spark):
    """m mirrors 2 of a's 4 docs: overlap vs the SMALLER side = 1.0;
    a~b share 1 of min(4,3) -> 0.333333, below the 0.5 flag."""
    rows = [("a", i) for i in (1, 2, 3, 4)]
    rows += [("m", 1), ("m", 2)]
    rows += [("b", 1), ("b", 10), ("b", 11)]
    content = spark.createDataFrame(rows, "host string, content_hash long")
    out = {
        (r["host_a"], r["host_b"]): r for r in mirror_hosts(content).collect()
    }
    am = out[("a", "m")]
    assert am["shared"] == 2 and am["overlap"] == 1.0 and am["is_mirror"]
    ab = out[("a", "b")]
    assert ab["shared"] == 1 and ab["overlap"] == 0.333333
    assert not ab["is_mirror"]
    bm = out[("b", "m")]
    assert bm["shared"] == 1 and bm["n_a"] == 3 and bm["n_b"] == 2


def test_mirror_boilerplate_cap(spark):
    """A hash on more hosts than the cap (site-chrome boilerplate)
    must not generate pairs at all."""
    rows = [(f"h{i}", 42) for i in range(5)]  # one hash on 5 hosts
    rows += [("h0", 1), ("h1", 1)]            # one eligible shared hash
    content = spark.createDataFrame(rows, "host string, content_hash long")
    out = mirror_hosts(content, max_hosts_per_hash=3).collect()
    assert len(out) == 1
    assert (out[0]["host_a"], out[0]["host_b"]) == ("h0", "h1")
    assert out[0]["shared"] == 1
    # denominators count the CAPPED universe (the boilerplate hash is
    # invisible to both numerator and denominator): h0/h1 each have 1
    # eligible hash, share it -> overlap 1.0, flagged as mirrors.
    assert out[0]["n_a"] == 1 and out[0]["n_b"] == 1
    assert out[0]["overlap"] == 1.0 and out[0]["is_mirror"]


def test_mirror_syndication_does_not_deflate_score(spark):
    """A genuine mirror pair whose common content is ALSO syndicated
    past the cap must still score on the eligible universe — the
    pre-cap denominator would have flagged it below threshold."""
    # a and m share eligible hashes 1,2; both also carry boilerplate
    # hashes 100..104 syndicated to 6 hosts (cap 3 drops them)
    rows = [("a", h) for h in (1, 2)] + [("m", h) for h in (1, 2)]
    for boiler in (100, 101, 102, 103, 104):
        for host in ("a", "m", "x1", "x2", "x3", "x4"):
            rows.append((host, boiler))
    content = spark.createDataFrame(rows, "host string, content_hash long")
    out = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_hosts(content, max_hosts_per_hash=3).collect()
    }
    am = out[("a", "m")]
    assert am["shared"] == 2 and am["n_a"] == 2 and am["n_b"] == 2
    assert am["overlap"] == 1.0 and am["is_mirror"]
