"""Round-4 batch-2 operators: soft-404 detection, broken-link audit,
hreflang clusters, conditional-GET planning, link reciprocity."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ soft404

def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, status int, text string"
    )


def test_soft404_template_signal_is_per_host(spark):
    from flyscrape_spark.operators.soft404 import soft_404

    tpl = "our error template"
    pages = _pages(spark, [
        ("http://a/404", "a", 404, tpl),
        ("http://a/soft", "a", 200, tpl),       # same host, same body -> hit
        ("http://a/ok", "a", 200, "fine page"),
        ("http://b/same-body", "b", 200, tpl),  # no 404 on b -> NOT a hit
    ])
    out = {r["url"]: r for r in soft_404(pages).collect()}
    assert set(out) == {"http://a/soft", "http://a/ok", "http://b/same-body"}
    assert out["http://a/soft"]["template_hit"]
    assert out["http://a/soft"]["soft404"]
    assert not out["http://a/ok"]["soft404"]
    assert not out["http://b/same-body"]["template_hit"]


def test_soft404_phrase_signal_case_folded(spark):
    from flyscrape_spark.operators.soft404 import soft_404

    pages = _pages(spark, [
        ("http://a/p", "a", 200, "Sorry — Page Not Found here"),
        ("http://a/q", "a", 200, "this resource Does Not Exist anymore"),
        ("http://a/r", "a", 200, "all good"),
    ])
    out = {r["url"]: r for r in soft_404(pages).collect()}
    assert out["http://a/p"]["phrase_hit"] and out["http://a/p"]["soft404"]
    assert out["http://a/q"]["phrase_hit"]
    assert not out["http://a/r"]["phrase_hit"]
    # phrase and template signals are independent columns
    assert not out["http://a/p"]["template_hit"]


def test_soft404_fixture_mix(spark):
    """The sf fixture produces hard 404s (excluded), template hits,
    phrase hits, and clean pages — no degenerate all-true/all-false."""
    from flyscrape_spark.queries import q_soft_404

    rows = q_soft_404(spark, SF).collect()
    assert all(r["soft404"] == (r["phrase_hit"] or r["template_hit"])
               for r in rows)
    assert any(r["template_hit"] and not r["phrase_hit"] for r in rows)
    assert any(r["phrase_hit"] and not r["template_hit"] for r in rows)
    assert any(not r["soft404"] for r in rows)


# ---------------------------------------------------------- linkcheck

def test_broken_links_reasons(spark):
    from flyscrape_spark.operators.linkcheck import broken_links

    links = spark.createDataFrame(
        [("s1", "http://x/dead"), ("s2", "http://x/dead"),
         ("s1", "http://x/ok"), ("s3", "http://x/ghost")],
        "src string, dst string",
    )
    pages = spark.createDataFrame(
        [("http://x/dead", 404), ("http://x/ok", 200)],
        "url string, status int",
    )
    out = {r["dst"]: r for r in broken_links(links, pages).collect()}
    assert set(out) == {"http://x/dead", "http://x/ghost"}
    dead = out["http://x/dead"]
    assert dead["n_refs"] == 2 and dead["reason"] == "http_error"
    assert dead["example_src"] == "s1"  # min(src)
    ghost = out["http://x/ghost"]
    assert ghost["status"] is None and ghost["reason"] == "unfetched"


def test_broken_link_hosts_rollup(spark):
    from flyscrape_spark.operators.linkcheck import broken_link_hosts

    links = spark.createDataFrame(
        [("ha", "http://x/dead"), ("ha", "http://x/ok"),
         ("hb", "http://x/ok"), ("hb", "http://x/ok2")],
        "src_host string, dst string",
    )
    pages = spark.createDataFrame(
        [("http://x/dead", 500), ("http://x/ok", 200), ("http://x/ok2", 200)],
        "url string, status int",
    )
    out = {r["src_host"]: r for r in broken_link_hosts(links, pages).collect()}
    assert out["ha"]["n_broken"] == 1 and out["ha"]["broken_ratio"] == 0.5
    assert out["hb"]["n_broken"] == 0 and out["hb"]["broken_ratio"] == 0.0


# ----------------------------------------------------------- hreflang

_TAG = '<link rel="alternate" hreflang="{lang}" href="{href}"/>'


def _page(url, alts):
    tags = "".join(_TAG.format(lang=l, href=h) for l, h in alts)
    return (url, f"<html><head>{tags}</head><body/></html>")


def test_hreflang_cluster_rollup(spark):
    from flyscrape_spark.operators.hreflang import hreflang_clusters

    alts = [("en", "http://x/en"), ("fr", "http://x/fr")]
    pages = spark.createDataFrame(
        [_page("http://x/en", alts), _page("http://x/fr", alts),
         ("http://x/plain", "<html><head></head><body/></html>")],
        "url string, html string",
    )
    out = hreflang_clusters(pages).collect()
    assert len(out) == 1  # unmarked page skipped
    row = out[0]
    assert row["cluster_id"] == "http://x/en"  # lexicographic min href
    assert row["n_pages"] == 2
    assert row["langs"] == "en,fr"  # serialized atomic output


def test_hreflang_pair_extraction_positional_zip(spark):
    """lang[i] must pair with href[i] even with >2 tags per page."""
    from flyscrape_spark.operators.hreflang import hreflang_pairs

    _, html = _page("u", [("en", "http://y/1"), ("de", "http://y/2"),
                          ("es", "http://y/3")])
    df = spark.createDataFrame([(html,)], "html string")
    pairs = df.select(hreflang_pairs("html").alias("p")).collect()[0]["p"]
    assert [(p["lang"], p["href"]) for p in pairs] == [
        ("en", "http://y/1"), ("de", "http://y/2"), ("es", "http://y/3")]


def test_hreflang_fixture_group_sizes(spark):
    """Fixture groups declare 2-4 langs cyclically; cluster sizes and
    language sets must track L = 2 + (base/4 % 3)."""
    from flyscrape_spark.queries import q_hreflang_clusters

    rows = q_hreflang_clusters(spark, SF).collect()
    sizes = {len(r["langs"].split(",")) for r in rows}
    assert sizes == {2, 3, 4}
    for r in rows:
        assert r["n_pages"] <= len(r["langs"].split(","))


def test_hreflang_attribute_order_free(spark):
    """href-before-hreflang and rel-last emission orders (both common
    in real CMSes) must cluster identically to the canonical order —
    the round-4 extractor matched only rel->hreflang->href."""
    from flyscrape_spark.operators.hreflang import hreflang_clusters

    canonical = '<link rel="alternate" hreflang="en" href="http://z/en"/>'
    href_first = '<link href="http://z/en" hreflang="fr" rel="alternate"/>'
    rel_mid = "<link hreflang='de' rel='alternate' href='http://z/en'/>"
    pages = spark.createDataFrame(
        [(f"http://z/{k}", f"<html><head>{t}</head><body/></html>")
         for k, t in [("a", canonical), ("b", href_first), ("c", rel_mid)]],
        "url string, html string",
    )
    out = hreflang_clusters(pages).collect()
    assert len(out) == 1
    assert out[0]["cluster_id"] == "http://z/en"
    assert out[0]["n_pages"] == 3
    assert out[0]["langs"] == "de,en,fr"


def test_hreflang_ignores_suffix_attrs_and_other_rel(spark):
    """data-href must not satisfy the href pull; rel=stylesheet links
    and tags missing hreflang are dropped."""
    from flyscrape_spark.operators.hreflang import hreflang_pairs

    html = (
        '<link rel="alternate" hreflang="en" data-href="http://bad" '
        'href="http://good"/>'
        '<link rel="stylesheet" href="http://css"/>'
        '<link rel="alternate" href="http://nolang"/>'
    )
    df = spark.createDataFrame([(html,)], "html string")
    pairs = df.select(hreflang_pairs("html").alias("p")).collect()[0]["p"]
    assert [(p["lang"], p["href"]) for p in pairs] == [("en", "http://good")]


# ----------------------------------------------------- revalidate_plan

def test_revalidate_plan_actions_and_bytes(spark):
    from flyscrape_spark.operators.recrawl import revalidate_plan

    import math
    log = spark.createDataFrame(
        [("u_skip", 1.0, 0.01, True, 5000.0),    # p ~ 0.01 < 0.2
         ("u_reval", 10.0, 0.5, True, 5000.0),   # p ~ 0.993, validator
         ("u_fetch", 10.0, 0.5, False, 5000.0)],  # same p, no validator
        "url string, age_days double, lambda_hat double, "
        "has_validator boolean, page_bytes double",
    )
    out = {r["url"]: r for r in revalidate_plan(log).collect()}
    assert out["u_skip"]["action"] == "skip"
    assert out["u_skip"]["est_bytes"] == 0.0
    p = 1.0 - math.exp(-5.0)
    assert out["u_reval"]["action"] == "revalidate"
    assert abs(out["u_reval"]["est_bytes"] - round(600 + p * 5000, 4)) < 1e-9
    assert out["u_fetch"]["action"] == "refetch"
    assert out["u_fetch"]["est_bytes"] == 5600.0


def test_revalidate_plan_fixture_mix(spark):
    from flyscrape_spark.queries import q_revalidate_plan

    rows = q_revalidate_plan(spark, SF).collect()
    actions = {r["action"] for r in rows}
    assert actions == {"skip", "revalidate", "refetch"}
    for r in rows:
        assert 0.0 <= r["p_change"] <= 1.0


# --------------------------------------------------- reciprocal_links

def test_reciprocal_links_ratio_and_flag(spark):
    from flyscrape_spark.operators.graph import reciprocal_links

    edges = spark.createDataFrame(
        # a<->b, a->c, a->d, a->e (1/4 reciprocal); f<->g twice (dup +
        # self loop dropped)
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("a", "e"),
         ("f", "g"), ("g", "f"), ("f", "g"), ("f", "f")],
        "src string, dst string",
    )
    out = {r["host"]: r for r in reciprocal_links(edges).collect()}
    assert out["a"]["n_out"] == 4 and out["a"]["n_reciprocal"] == 1
    assert out["a"]["reciprocity"] == 0.25 and not out["a"]["link_farm"]
    # f: 1 out-host, fully reciprocal, but below min_out
    assert out["f"]["n_out"] == 1 and out["f"]["reciprocity"] == 1.0
    assert not out["f"]["link_farm"]
    # lower the gate: now a ring of 3+ flags
    flagged = reciprocal_links(edges, min_out=1, spam_threshold=1.0)
    got = {r["host"]: r["link_farm"] for r in flagged.collect()}
    assert got["f"] and got["g"] and not got["a"]


def test_reciprocal_links_fixture_mix(spark):
    from flyscrape_spark.queries import q_reciprocal_links

    rows = q_reciprocal_links(spark, SF).collect()
    assert any(r["n_reciprocal"] > 0 for r in rows)
    assert any(r["n_reciprocal"] < r["n_out"] for r in rows)
