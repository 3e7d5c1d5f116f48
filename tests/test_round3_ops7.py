"""Round-3 batch-7 operators: parametric URL-family mining and the
per-domain document cap — hand-computed values plus plan-shape
invariants (WindowGroupLimit for the cap)."""

from pyspark.sql import functions as F

from flyscrape_spark.operators.curate import domain_cap
from flyscrape_spark.operators.traps import template_families, url_template_full


# ---------------------------------------------------- url templates


def test_template_hex_before_digits(spark):
    """A >=12-char hex run must collapse to H before the digit rule
    eats its numerals; short hex-ish runs stay as N-collapsed text."""
    df = spark.createDataFrame(
        [
            (0, "http://a.example/item?id=42&session=abcdef99deadbeef"),
            (1, "http://a.example/cafe42"),  # hex-ish but < 12 chars
        ],
        "doc_id long, url string",
    )
    out = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id",
                           url_template_full("url").alias("t")).collect()
    }
    assert out[0] == "http://a.example/item?id=N&session=H"
    assert out[1] == "http://a.example/cafeN"


def test_template_families_counts_and_flag(spark):
    """Distinct URLs per family; duplicates collapse; the static
    page is a 1-URL family; threshold gates the parametric flag."""
    rows = [(i, "a.example", f"http://a.example/article/{i}")
            for i in range(6)]
    rows += [(10 + j, "a.example", "http://a.example/static/about")
             for j in range(3)]  # 3 fetches, ONE distinct URL
    df = spark.createDataFrame(rows, "doc_id long, host string, url string")
    fams = {
        r["template"]: r
        for r in template_families(df, threshold=5).collect()
    }
    art = fams["http://a.example/article/N"]
    assert art["n_urls"] == 6 and art["parametric"]
    assert art["example_url"] == "http://a.example/article/0"
    static = fams["http://a.example/static/about"]
    assert static["n_urls"] == 1 and not static["parametric"]


# ------------------------------------------------------- domain cap


def _docs(spark):
    rows = []
    for dom, n in (("big.com", 5), ("small.org", 2)):
        for j in range(n):
            # longer docs have higher j; tie pair at j=0/1 for big.com
            rows.append((hash(dom) % 100 + j, dom, 100 + j))
    rows.append((999, None, 50))  # unknown-domain doc
    return spark.createDataFrame(
        rows, "doc_id long, registrable string, n_tokens long"
    )


def test_domain_cap_keeps_topk_deterministically(spark):
    df = _docs(spark)
    out = domain_cap(df, domain_col="registrable", cap=3).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["registrable"], []).append(r)
    assert len(by_dom["big.com"]) == 3  # capped from 5
    # highest n_tokens first
    kept = sorted(by_dom["big.com"], key=lambda r: r["rank"])
    assert [r["n_tokens"] for r in kept] == [104, 103, 102]
    assert len(by_dom["small.org"]) == 2  # under the cap
    assert len(by_dom[None]) == 1  # NULL domain row kept


def test_domain_cap_exempts_null_domains(spark):
    """registrable_domain() returns NULL for unknown TLDs; those rows
    must NOT collapse into one collectively-capped partition — each
    NULL-domain doc is its own singleton (rank 1, always kept)."""
    rows = [(i, None, 100 + i) for i in range(10)]
    rows += [(100 + j, "big.com", 200 + j) for j in range(5)]
    df = spark.createDataFrame(
        rows, "doc_id long, registrable string, n_tokens long"
    )
    out = domain_cap(df, domain_col="registrable", cap=3).collect()
    nulls = [r for r in out if r["registrable"] is None]
    assert len(nulls) == 10                       # none discarded
    assert all(r["rank"] == 1 for r in nulls)     # singleton groups
    assert len([r for r in out if r["registrable"] == "big.com"]) == 3


def test_domain_cap_compiles_to_group_limit(spark):
    """The rank<=k predicate must compile to WindowGroupLimit —
    a k-row heap per key, not a full per-domain sort."""
    plan = (
        domain_cap(_docs(spark), domain_col="registrable", cap=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
