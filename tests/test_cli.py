"""CLI surface (reference cmd/: new/run/dev/version, cmd/args.go
override parsing). `run` is exercised end-to-end against a pages
parquet via --pages (offline transport)."""

import json

import pytest

from flyscrape_spark.cli import TEMPLATE, main, parse_config_args, _run_once


def test_parse_config_args_reference_semantics():
    # cmd/args.go: repeated array flags append; bare flag -> true;
    # --k=v split form
    u = parse_config_args(
        ["--urls", "http://a/", "--urls", "http://b/", "--depth", "3",
         "--proxy", "http://p:1", "--cache=file", "--someflag"]
    )
    assert u["urls"] == ["http://a/", "http://b/"]
    assert u["depth"] == "3"
    assert u["proxy"] == "http://p:1"
    assert u["cache"] == "file"
    assert u["someflag"] is True
    with pytest.raises(SystemExit):
        parse_config_args(["notaflag"])


def test_new_and_version(tmp_path, capsys):
    assert main(["version"]) == 0
    p = tmp_path / "s.py"
    assert main(["new", str(p)]) == 0
    assert "def scrape" in p.read_text()
    # template is a valid script module
    compile(TEMPLATE, "s.py", "exec")


def test_run_py_script_offline(tmp_path, spark, capsys):
    pages = spark.createDataFrame(
        [("http://shop.test/", "shop.test", 200,
          '<h1>Shop</h1><a href="/a">A</a>'),
         ("http://shop.test/a", "shop.test", 200, "<h1>Leaf</h1>")],
        "url string, host string, status int, html string")
    pages_path = str(tmp_path / "pages.parquet")
    pages.write.parquet(pages_path)

    script = tmp_path / "s.py"
    script.write_text(
        "config = {'url': 'http://shop.test/', 'depth': 1}\n"
        "def scrape(ctx):\n"
        "    return {'h1': ctx.doc.find('h1').text()}\n"
    )
    out_file = tmp_path / "results.json"
    result = _run_once(
        str(script),
        {"output.file": str(out_file)},
        spark=spark, pages_path=pages_path,
    )
    rows = json.loads(out_file.read_text())
    assert [r["data"]["h1"] for r in rows] == ["Shop", "Leaf"]
    assert result.generations >= 1


def test_run_js_script_config_only(tmp_path, spark):
    """A reference .js script: config loads, crawl runs config-only
    (JS scrape fn needs the VM; data stays null)."""
    pages = spark.createDataFrame(
        [("http://shop.test/", "shop.test", 200, '<a href="/a">A</a>'),
         ("http://shop.test/a", "shop.test", 200, "<p>leaf</p>")],
        "url string, host string, status int, html string")
    pages_path = str(tmp_path / "pages.parquet")
    pages.write.parquet(pages_path)

    script = tmp_path / "s.js"
    script.write_text(
        'export const config = { url: "http://shop.test/", depth: 2 };\n'
        "export default function({ doc }) { return {}; }\n"
    )
    result = _run_once(str(script), {"output.file": str(tmp_path / "o.json")},
                       spark=spark, pages_path=pages_path)
    assert result.seen.count() == 2


def test_cli_override_beats_script_config(tmp_path, spark):
    pages = spark.createDataFrame(
        [("http://shop.test/", "shop.test", 200, '<a href="/a">A</a>'),
         ("http://shop.test/a", "shop.test", 200, "<p>x</p>")],
        "url string, host string, status int, html string")
    pages_path = str(tmp_path / "pages.parquet")
    pages.write.parquet(pages_path)
    script = tmp_path / "s.py"
    script.write_text("config = {'url': 'http://other.test/', 'depth': 9}\n"
                      "def scrape(ctx):\n    return {'u': ctx.url}\n")
    result = _run_once(
        str(script),
        {"url": "http://shop.test/", "depth": "0",
         "output.file": str(tmp_path / "o.json")},
        spark=spark, pages_path=pages_path,
    )
    # depth=0: only the seed is FETCHED; the discovered child still
    # enters the seen set at depth 1 (validator-dropped URLs are seen,
    # scrape.go:276-285) but is never fetched
    assert [r["url"] for r in result.results.collect()] == ["http://shop.test/"]
    assert result.seen.filter("depth <= 0").count() == 1