"""JS config-file loading (SURVEY §2.1 #24): the reference's
``export const config = {...}`` block parsed without a JS VM —
including the shipped template.js and examples verbatim."""

import glob

import pytest

from flyscrape_spark.jsconfig import (
    JsConfigError, config_from_source, parse_config_block,
)

FULL = """
// leading comment
export const config = {
  url: "https://example.com/",
  urls: ['https://a.test/', "https://b.test/"],
  depth: 5,
  follow: [".next > a", "a[href]"],
  allowedDomains: ["example.com"],
  blockedDomains: ["somesite.com"],
  allowedURLs: ["/posts", "/articles/\\\\d+"],
  blockedURLs: ["/admin"],
  rate: 60,
  concurrency: 2,
  proxy: "http://someproxy.com:8043",
  cache: "file",
  cookies: "chrome",
  headers: {
    "Authorization": "Bearer x",   // trailing comment
    "User-Agent": "Mozilla ...",
  },
  output: { file: "results.json", format: "ndjson" },
  browser: true,  /* rendering transport slot */
};
export default function({ doc }) { return {}; }
"""


def test_full_config_round_trip():
    c = config_from_source(FULL)
    assert c.seeds == ["https://example.com/", "https://a.test/",
                       "https://b.test/"]
    assert c.crawl.depth == 5
    assert c.crawl.follow == [".next > a", "a[href]"]
    assert c.crawl.allowed_domains == ["example.com"]
    assert c.crawl.blocked_domains == ["somesite.com"]
    assert c.crawl.allowed_urls == ["/posts", "/articles/\\d+"]
    assert c.crawl.blocked_urls == ["/admin"]
    assert c.crawl.rate == 60.0
    assert c.crawl.concurrency == 2
    assert c.crawl.headers["Authorization"] == "Bearer x"
    assert c.proxies == ["http://someproxy.com:8043"]
    assert c.cache == "file"
    assert c.cookies_browser == "chrome"
    assert c.output_file == "results.json"
    assert c.output_format == "ndjson"
    assert c.crawl.browser is True
    assert c.unsupported == {}


def test_empty_and_missing_config():
    # js_test.go:335 pins `export const config = {}`
    assert parse_config_block("export const config = {}") == {}
    c = config_from_source("export default function() {}")
    assert c.seeds == [] and c.crawl.depth == 0


def test_reference_scripts_parse():
    """Every shipped reference script's config block must load."""
    from flyscrape_spark.jsconfig import config_from_file

    paths = (["/root/reference/template.js"]
             + sorted(glob.glob("/root/reference/examples/*.js")))
    assert len(paths) >= 3
    for p in paths:
        cfg = config_from_file(p)
        src = open(p).read()
        if "url:" in src.split("export default")[0]:
            assert cfg.seeds, p


def test_text_file_import_split(tmp_path):
    """examples/urls_from_file.js idiom: import + .split resolved
    against the script's directory."""
    from flyscrape_spark.jsconfig import config_from_file

    (tmp_path / "urls.txt").write_text("http://a.test/\nhttp://b.test/")
    script = tmp_path / "s.js"
    script.write_text(
        'import urls from "./urls.txt"\n'
        "export const config = { urls: urls.split(\"\\n\") };\n"
    )
    c = config_from_file(str(script))
    assert c.seeds == ["http://a.test/", "http://b.test/"]


def test_hackernews_shape():
    with open("/root/reference/examples/hackernews.js") as f:
        c = config_from_source(f.read())
    assert c.seeds == ["https://news.ycombinator.com/"]
    assert c.crawl.depth == 9
    assert c.cache == "file"
    assert c.crawl.follow == ["a.morelink[href]"]


def test_parse_errors_are_located():
    with pytest.raises(JsConfigError, match="line 3"):
        parse_config_block(
            "export const config = {\n  url: 'x',\n  depth: 1 +\n}"
        )
    with pytest.raises(JsConfigError, match="static literal"):
        parse_config_block("export const config = { depth: someVar }")


def test_nested_arrays_and_trailing_commas():
    raw = parse_config_block(
        "export const config = {a: [[1, 2,], [3,],], 'b': {c: [true, null,],},}"
    )
    assert raw == {"a": [[1, 2], [3]], "b": {"c": [True, None]}}
