"""CLI — the reference's command surface (/root/reference/cmd/main.go:36-52):
``new`` / ``run`` / ``dev`` / ``version`` with ``--key value`` config
overrides (cmd/args.go).

Script files:
- ``.py`` — this engine's native scrape script: a module defining an
  optional ``config`` dict (reference key spelling accepted) and an
  optional ``scrape(ctx)`` function (the Python port of the JS default
  export; parse/script.py API).
- ``.js`` — a reference flyscrape script, executed as-is: the
  ``export const config`` block loads via jsconfig.py and the JS
  scrape function runs in the engine's JS interpreter
  (parse/jsvm.py + parse/jsbridge.py) vectorized over Arrow batches,
  including absoluteURL/follow/scrape params and the
  flyscrape//flyscrape/http import modules.

Transport: ``--pages table.parquet`` (engine-added flag) resolves
fetches against a pages table — the sandboxed/offline path and the
unit-test path; without it the real HttpTransport is used.

Overrides mirror cmd/args.go: repeated array flags append, bare flags
are true, ``--output.file x`` nests, camelCase reference keys map to
engine fields (config.apply_overrides).
"""

from __future__ import annotations

import sys

from flyscrape_spark.config import CrawlConfig, _ARRAY_FIELDS, apply_overrides

VERSION = "flyscrape-spark 0.2"

USAGE = """\
flyscrape-spark is a PySpark re-expression of the flyscrape scraper.

Usage:

    python -m flyscrape_spark <command> [arguments]

Commands:

    new       creates a sample scraping script
    run       runs a scraping script
    dev       watches and re-runs a scraping script
    version   prints the version
"""

TEMPLATE = '''\
# flyscrape-spark scraping script (Python port of template.js).
config = {
    # URL to start scraping from (string or list under "urls").
    "url": "https://example.com/",
    # How deep links should be followed.      (default = 0, no follow)
    # "depth": 5,
    # CSS selectors to follow.                (default = ["a[href]"])
    # "follow": [".next > a", ".related a"],
    # "allowedDomains": ["example.com"],      # ["*"] for all
    # "blockedDomains": ["somesite.com"],
    # "allowedURLs": ["/posts", "/articles/\\\\d+"],
    # "blockedURLs": ["/admin"],
    # "rate": 60,                             # requests per minute
    # "concurrency": 1,                       # simultaneous requests
    # "proxies": ["http://someproxy.com:8043"],
    # "cache": "file",                        # snapshot resume cache
    # "headers": {"Authorization": "Bearer ..."},
    # "output": {"file": "results.json", "format": "json"},
}


def scrape(ctx):
    """ctx.doc is the parsed page (find/text/attr/... element API);
    return a JSON-serializable dict, use ctx.follow(url) for manual
    enqueueing, ctx.absolute_url(ref) to resolve links."""
    title = ctx.doc.find("h1")
    link = ctx.doc.find("a")
    return {
        "title": title.text(),
        "link": {
            "text": link.text(),
            "url": ctx.absolute_url(link.attr("href")),
        },
    }
'''


def parse_config_args(args: list[str]) -> dict:
    """cmd/args.go:24-84 semantics: ``--key value`` pairs; a flag with
    no value is true; repeated array-field flags append."""
    updates: dict = {}
    key = None
    norm: list[str] = []
    for a in args:
        if a.startswith("--") and "=" in a:
            f, v = a.split("=", 1)
            norm += [f, v]
        else:
            norm.append(a)
    for a in norm:
        if key is None and not a.startswith("--"):
            raise SystemExit(f"expected flag, got {a!r} instead")
        if key is not None and a.startswith("--"):
            updates[key] = True
            key = None
        if a.startswith("--"):
            key = a[2:]
            continue
        if key in updates and key in _ARRAY_FIELDS:
            prev = updates[key]
            updates[key] = (prev if isinstance(prev, list) else [prev]) + [a]
        elif key in _ARRAY_FIELDS:
            updates[key] = [a]
        else:
            updates[key] = a
        key = None
    if key is not None:
        updates[key] = True
    return updates


def load_script(path: str):
    """Returns (JsScrapeConfig, scrape_spec) where scrape_spec is
    ``("py", fn)``, ``("js", source, base_dir)`` or ``None``."""
    import os

    from flyscrape_spark.jsconfig import config_from_file, config_from_source

    if path.endswith(".py"):
        import importlib.util
        import json as _json

        spec = importlib.util.spec_from_file_location("scrape_script", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        raw = dict(getattr(mod, "config", {}) or {})
        # one source of truth for key mapping: render the dict as a JS
        # config literal and route it through the same mapper
        js = config_from_source(
            "export const config = " + _json.dumps(raw, default=str)
        )
        fn = getattr(mod, "scrape", None)
        return js, (("py", fn) if fn else None)
    # .js: config via the literal parser; the scrape function runs in
    # the JS interpreter (parse/jsvm.py) — compile NOW so syntax errors
    # surface before the crawl starts (reference compiles up front,
    # flyscrape.go:47)
    with open(path, encoding="utf-8") as f:
        source = f.read()
    base_dir = os.path.dirname(path)
    js = config_from_file(path)
    from flyscrape_spark.parse.jsbridge import compile_script

    module = compile_script(source, base_dir=base_dir)
    if module.default is None:
        return js, None
    return js, ("js", source, base_dir)


def _run_once(path: str, overrides: dict, spark=None, pages_path: str | None = None):
    from flyscrape_spark.operators.sinks import (
        iter_ndjson_lines,
        to_json_array,
        write_ndjson,
    )
    from flyscrape_spark.parse.script import make_script_udf
    from flyscrape_spark.plans.frontier import CrawlEngine
    from flyscrape_spark.session import get_spark
    from flyscrape_spark.sources.transport import HttpTransport, JoinTransport

    pages_path = pages_path or overrides.pop("pages", None)
    out_file = overrides.pop("output.file", None)
    out_format = overrides.pop("output.format", None)

    js, scrape_spec = load_script(path)
    cfg = apply_overrides(js.crawl, overrides)
    seeds = js.seeds
    if "url" in overrides:
        seeds = [overrides["url"]]
    if "urls" in overrides:
        u = overrides["urls"]
        seeds = u if isinstance(u, list) else [u]
    if not seeds:
        raise SystemExit("no start URL (config url/urls or --url)")

    if spark is None:
        spark = get_spark()
    if cfg.browser:
        # browser: true swaps the transport for a page-render round
        # trip (modules/browser/browser.go:41-63). With a --pages
        # fixture the fake DOM-settling renderer stands in for
        # Chromium (none in this container); without one the real
        # renderer slot raises with guidance.
        from flyscrape_spark.sources.browser import (
            ChromiumRenderer,
            FakeDomSettlingRenderer,
            RenderingTransport,
        )

        if pages_path:
            rows = spark.read.parquet(pages_path).collect()
            renderer = FakeDomSettlingRenderer(
                {r["url"]: (r["status"], r["html"]) for r in rows})
        else:
            renderer = ChromiumRenderer(headless=cfg.headless)
        transport = RenderingTransport(renderer, cfg)
    elif pages_path:
        pages = spark.read.parquet(pages_path)
        transport = JoinTransport(pages, cfg)
    else:
        transport = HttpTransport(cfg, proxies=js.proxies or None)
    script_udf = None
    if scrape_spec and scrape_spec[0] == "py":
        script_udf = make_script_udf(scrape_spec[1])
    elif scrape_spec and scrape_spec[0] == "js":
        # JS scripts may call scrape(url, fn) — a synchronous nested
        # fetch (js.go:196-215). Wire the same fetch the transport uses:
        # fixture lookup under --pages, a plain HTTP get otherwise.
        from flyscrape_spark.parse.jsbridge import make_js_script_udf

        _, source, base_dir = scrape_spec
        nested_fetch = None
        if "scrape" in source:
            if pages_path:
                page_map = {r["url"]: r["html"]
                            for r in spark.read.parquet(pages_path).collect()}
                nested_fetch = page_map.get
            else:
                headers = dict(cfg.headers or {})

                def nested_fetch(url):  # noqa: ANN001 — executor-side hook
                    from flyscrape_spark.sources.client import get

                    return get(url, headers=headers).get("body", "")

        script_udf = make_js_script_udf(source, base_dir=base_dir,
                                        fetch=nested_fetch)
    engine = CrawlEngine(spark, cfg, transport, script_udf=script_udf,
                         collect_metrics=False)
    result = engine.run(seeds)

    out_file = out_file or js.output_file
    out_format = out_format or js.output_format
    if out_format == "ndjson" and out_file:
        write_ndjson(result.results, out_file)
    elif out_format == "ndjson":
        # reference ndjson module streams newline-delimited records to
        # stdout when no file is configured (modules/output/ndjson/
        # ndjson.go:47)
        for line in iter_ndjson_lines(result.results):
            print(line)
    else:
        payload = to_json_array(result.results)
        if out_file:
            with open(out_file, "w", encoding="utf-8") as f:
                f.write(payload)
        else:
            print(payload)
    return result


def make_dev_rerun(path: str, overrides: dict):
    """Build the dev-watch rerun callback. Any error — config
    (SystemExit/JsConfigError) or a transient mid-save script
    SyntaxError — is reported to stderr and the watch loop KEEPS
    RUNNING, mirroring the reference dev mode which prints compile
    errors and keeps watching (flyscrape.go:81-85)."""

    def rerun(_contents):
        # dev mode forces depth=0 (flyscrape.go:93: iterate on the
        # extraction against the seed page only, re-fetch cached)
        dev_overrides = dict(overrides, depth="0")
        try:
            _run_once(path, dev_overrides)
        except SystemExit as e:  # config error: report, keep watching
            print(e, file=sys.stderr)
        except Exception as e:
            print(f"{type(e).__name__}: {e}", file=sys.stderr)

    return rerun


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    cmd = args.pop(0) if args else ""
    if cmd == "version":
        print(VERSION)
        return 0
    if cmd == "new":
        path = args[0] if args else "scrape.py"
        try:
            with open(path, "x", encoding="utf-8") as f:
                f.write(TEMPLATE)
        except FileExistsError:
            print(f"file exists: {path}", file=sys.stderr)
            return 1
        print(f"wrote {path}")
        return 0
    if cmd in ("run", "dev"):
        if not args:
            print(USAGE)
            return 1
        path, rest = args[0], args[1:]
        overrides = parse_config_args(rest)
        if cmd == "run":
            _run_once(path, dict(overrides))
            return 0
        from flyscrape_spark.devwatch import watch

        watch(path, make_dev_rerun(path, overrides))
        return 0
    print(USAGE)
    return 1


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
