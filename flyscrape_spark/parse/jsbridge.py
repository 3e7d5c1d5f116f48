"""Run reference ``.js`` scrape scripts on the engine — the glue
between the JS interpreter (parse/jsvm.py) and the crawl pipeline.

Mirrors the reference's VM wiring (/root/reference/js.go:155-246):
each scrape call builds a ScrapeParams object ``{url, doc,
absoluteURL, scrape, follow}``; the default export's return value is
passed through JSON.stringify (js.go:161-162), undefined/null/NaN
results produce no output row (js_test.go:80-170); ``scrape(url, fn)``
fetches synchronously through the engine's fetch hook (the reference's
ScrapeParams.Process) with URLs resolved against the current page;
``follow(url)`` enqueues absolutized URLs for the next generation
(js.go:217-219).

Native import modules mirror NewJSLibrary (js_lib.go:32-44):
``flyscrape`` exports ``parse``; ``flyscrape/http`` exports
``get/postForm/postJSON/download`` backed by sources/client.py.

The vectorized path (:func:`make_js_script_udf`) ships the SOURCE to
executors and compiles once per worker (an Interpreter holds closures;
re-compiling from text is cheaper and dodges pickling entirely) — one
pandas UDF call per Arrow batch, the script applied per document, same
``struct<data, follow_urls>`` contract as parse/script.py.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from flyscrape_spark.functions.urls import resolve
from flyscrape_spark.parse.jsvm import (
    JsModule,
    JsRuntimeError,
    UNDEFINED,
    compile_module,
    js_json_stringify,
)
from flyscrape_spark.parse.script import SCRIPT_TYPE, Sel
from flyscrape_spark.parse.html import parse_html


def default_imports() -> dict:
    """The reference's standard library imports (js_lib.go:32-44)."""
    from flyscrape_spark.sources import client

    def parse(html):
        return Sel([parse_html(html if isinstance(html, str) else "")])

    def download(url, dst):
        # reference downloads fire-and-forget on a 5-way pool
        # (js_lib.go:25-30); client.Downloader(limit=5) matches
        _default_downloader().download(url, dst)
        return UNDEFINED

    return {
        "flyscrape": {"parse": parse},
        "flyscrape/http": {
            "get": client.get,
            "postForm": client.post_form,
            "postJSON": client.post_json,
            "download": download,
        },
    }


_DOWNLOADER = None


def _default_downloader():
    global _DOWNLOADER
    if _DOWNLOADER is None:
        from flyscrape_spark.sources.client import Downloader

        _DOWNLOADER = Downloader(limit=5)
    return _DOWNLOADER


def compile_script(source: str, base_dir: str | None = None,
                   imports: dict | None = None) -> JsModule:
    """Compile a flyscrape ``.js`` script with the standard imports."""
    merged = default_imports()
    if imports:
        merged.update(imports)
    return compile_module(source, imports=merged, base_dir=base_dir)


def _make_params(module: JsModule, html: str, url: str,
                 fetch: Callable[[str], str | None] | None,
                 follows: list[str] | None):
    """ScrapeParams object for one invocation (js.go:172-220)."""
    doc = Sel([parse_html(html or "")])

    def absolute_url(ref=UNDEFINED):
        # js.go:185-194: on resolve failure the ref itself is returned
        if ref is UNDEFINED or ref is None:
            return ""
        out = resolve(url, str(ref))
        return out if out is not None else str(ref)

    def scrape(ref, fn):
        target = absolute_url(ref)
        if fetch is None:
            # reference: Process is nil outside the crawl loop; calling
            # scrape would nil-deref. Surface a real error instead.
            raise JsRuntimeError(
                "scrape() needs a fetch hook (none in this context)")
        body = fetch(target)
        nested = _make_params(module, body or "", target, fetch, None)
        return module.interp.call(fn, [nested])

    def follow(ref=UNDEFINED):
        # js.go:217-219 -> scrape.go:210-212: absolutize and enqueue;
        # nested scrape params carry no Follow hook (js.go:203-207)
        if follows is None:
            raise JsRuntimeError("follow() is not available in nested scrape")
        if ref is UNDEFINED or ref is None or ref == "":
            return UNDEFINED
        absolute = resolve(url, str(ref))
        if absolute:
            follows.append(absolute)
        return UNDEFINED

    return {
        "url": url,
        "doc": doc,
        "absoluteURL": absolute_url,
        "scrape": scrape,
        "follow": follow,
    }


def run_js_script(module: JsModule, html: str, url: str,
                  fetch: Callable[[str], str | None] | None = None,
                  ) -> tuple[str | None, list[str]]:
    """One scrape invocation; returns (json_data, follow_urls) — the
    same contract as parse/script.run_script. ``data`` is None when
    the script returns undefined, null or NaN (all three JSON-round-
    trip to nil in the reference, js_test.go:80-170)."""
    fn = module.default
    if fn is None:
        raise JsRuntimeError("default export is not defined")
    follows: list[str] = []
    value = module.interp.call(fn, [_make_params(module, html, url,
                                                 fetch, follows)])
    # async scrape functions return a settled promise (all host APIs
    # are synchronous): unwrap it — a rejection surfaces exactly like
    # a synchronous throw
    from flyscrape_spark.parse.jsvm import JSPromise, JsRuntimeError as _RTE
    if isinstance(value, JSPromise):
        if value.state == "rejected":
            from flyscrape_spark.parse.jsvm import js_string
            raise _RTE(js_string(value.value))
        value._settled_or_raise("scrape result")
        value = value.value
    data = js_json_stringify(value)
    if data == "null":
        data = None
    return data, follows


def make_js_scrape_fn(source: str, base_dir: str | None = None,
                      fetch: Callable[[str], str | None] | None = None):
    """A ``scrape_fn(ctx)``-shaped adapter over a JS script so the
    sequential oracle path (parse/script.run_script) can execute JS
    scripts too. The ctx's own follow list is reused."""
    module = compile_script(source, base_dir=base_dir)

    def scrape_fn(ctx):
        data, follows = run_js_script(module, _ctx_html(ctx), ctx.url,
                                      fetch=fetch)
        ctx._follow.extend(follows)
        import json as _json

        return _json.loads(data) if data is not None else None

    return scrape_fn


def _ctx_html(ctx) -> str:
    # ScriptContext holds the parsed doc; re-render is lossy, so keep
    # the original html when the caller provided it
    return getattr(ctx, "_html", None) or ""


def make_js_script_udf(source: str, base_dir: str | None = None,
                       fetch: Callable[[str], str | None] | None = None):
    """Vectorized executor for a JS scrape script: one pandas UDF per
    Arrow batch returning ``struct<data, follow_urls>`` — identical
    schema to parse/script.make_script_udf, so CrawlEngine accepts
    either. Compiles the script once per Python worker (module-level
    cache keyed by source hash)."""
    from pyspark.sql import functions as F

    @F.pandas_udf(SCRIPT_TYPE)
    def js_script_udf(body: pd.Series, url: pd.Series) -> pd.DataFrame:
        module = _compiled(source, base_dir)
        datas, follows = [], []
        for html, origin in zip(body, url):
            if not html:
                datas.append(None)
                follows.append([])
                continue
            data, follow_urls = run_js_script(module, html, origin,
                                              fetch=fetch)
            datas.append(data)
            follows.append(follow_urls)
        return pd.DataFrame({"data": datas, "follow_urls": follows})

    return js_script_udf


_COMPILE_CACHE: dict = {}


def _compiled(source: str, base_dir: str | None) -> JsModule:
    key = (hash(source), base_dir)
    mod = _COMPILE_CACHE.get(key)
    if mod is None:
        mod = compile_script(source, base_dir=base_dir)
        _COMPILE_CACHE[key] = mod
    return mod
