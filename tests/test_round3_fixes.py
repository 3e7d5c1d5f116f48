"""Round-3 advice fixes: dev-watch survives script errors, `new`
refuses to clobber, ndjson streams to stdout without a file,
truncated JS configs error with a location, graph caches released."""

import json

import pytest

from flyscrape_spark.cli import main, make_dev_rerun, _run_once
from flyscrape_spark.jsconfig import JsConfigError, parse_config_block


def test_dev_rerun_survives_syntax_error(tmp_path, capsys):
    # mid-save edits produce transient SyntaxErrors; reference dev mode
    # prints compile errors and keeps watching (flyscrape.go:81-85)
    script = tmp_path / "s.py"
    script.write_text("config = {'url': 'http://x/'\ndef scrape(ctx:")
    rerun = make_dev_rerun(str(script), {})
    rerun(script.read_text())  # must NOT raise
    assert "SyntaxError" in capsys.readouterr().err


def test_dev_rerun_survives_js_config_error(tmp_path, capsys):
    script = tmp_path / "s.js"
    script.write_text("export const config = { url: 'x',")
    rerun = make_dev_rerun(str(script), {})
    rerun(script.read_text())  # must NOT raise
    assert capsys.readouterr().err.strip()


def test_new_refuses_existing_file(tmp_path, capsys):
    p = tmp_path / "s.py"
    assert main(["new", str(p)]) == 0
    before = p.read_text()
    p.write_text(before + "# user edit\n")
    assert main(["new", str(p)]) == 1  # reference `new` never clobbers
    assert "file exists" in capsys.readouterr().err
    assert p.read_text().endswith("# user edit\n")


def test_truncated_config_reports_location():
    with pytest.raises(JsConfigError):
        parse_config_block("export const config = { url: 'x',")
    with pytest.raises(JsConfigError):
        parse_config_block("export const config = {")


def test_ndjson_to_stdout_without_file(tmp_path, spark, capsys):
    # reference ndjson module streams newline-delimited records to
    # stdout when no file is configured (modules/output/ndjson/
    # ndjson.go:47)
    pages = spark.createDataFrame(
        [("http://shop.test/", "shop.test", 200, "<h1>A</h1>"),],
        "url string, host string, status int, html string")
    pages_path = str(tmp_path / "pages.parquet")
    pages.write.parquet(pages_path)
    script = tmp_path / "s.py"
    script.write_text(
        "config = {'url': 'http://shop.test/', 'depth': 0}\n"
        "def scrape(ctx):\n    return {'h1': ctx.doc.find('h1').text()}\n")
    _run_once(str(script), {"output.format": "ndjson"},
              spark=spark, pages_path=pages_path)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["url"] == "http://shop.test/"
    assert rec["data"] == {"h1": "A"}


def test_graph_ops_release_edge_cache(spark):
    from pyspark.sql import functions as F

    from flyscrape_spark.operators.graph import hits, pagerank

    nodes = spark.range(6).select(F.concat(F.lit("n"), "id").alias("node"))
    edges = spark.createDataFrame(
        [("n0", "n1"), ("n1", "n2"), ("n2", "n0"), ("n3", "n4")],
        "src string, dst string")

    def n_cached():
        return len(spark.sparkContext._jsc.getPersistentRDDs())

    base = n_cached()
    pr = pagerank(nodes, edges, iterations=2)
    assert pr.count() == 6
    hs = hits(nodes, edges, iterations=2)
    assert hs.count() == 6
    # the edge persist() must be released; only the two O(nodes)
    # localCheckpoint results may remain
    assert n_cached() <= base + 2
