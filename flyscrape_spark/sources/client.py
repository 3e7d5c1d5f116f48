"""HTTP client library — the reference's ``flyscrape/http`` JS import
(/root/reference/js_lib.go:57-103 get/postForm/postJSON, :192-224
jsFetch): synchronous requests returning
``{"body", "status", "headers", "error"}``.

Usable anywhere plain Python runs: inside a scrape script executed by
``make_script_udf`` (executor-side, per Arrow batch — the reference
exposes the same functions inside its JS scripts), or driver-side.
Response semantics mirror jsFetch exactly: transport error ->
status 0 + error message + empty body; any HTTP status (incl. non-2xx)
-> status + body + headers, empty error (Go's client.Do does not error
on non-2xx).

Retry: the reference routes these through the shared http.Client whose
transport the retry module adapts (module.go:97-107), so the standard
retry schedule applies; ``retries`` mirrors that (pass ``None`` for a
single attempt). Retry-After is honored with the transport's 30s
clamp.
"""

from __future__ import annotations

import json as _json
import urllib.error
import urllib.parse
import urllib.request

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.sources.transport import RETRY_AFTER_CAP, parse_retry_after

_DEFAULT = CrawlConfig()


def _opener(proxy: str | None):
    if proxy:
        return urllib.request.build_opener(
            urllib.request.ProxyHandler({"http": proxy, "https": proxy})
        )
    return urllib.request.build_opener()


def _attempt(req: urllib.request.Request, timeout: float, proxy: str | None) -> dict:
    out = {"body": "", "status": 0, "headers": {}, "error": ""}
    try:
        with _opener(proxy).open(req, timeout=timeout) as resp:
            out["status"] = resp.status
            out["body"] = resp.read().decode("utf-8", "replace")
            out["headers"] = dict(resp.headers.items())
    except urllib.error.HTTPError as e:
        # non-2xx is a RESPONSE, not an error (jsFetch semantics)
        out["status"] = e.code
        try:
            out["body"] = e.read().decode("utf-8", "replace")
        except Exception:
            pass
        out["headers"] = dict(e.headers.items())
    except Exception as e:  # transport error (net.Error analog)
        out["error"] = str(e)
    return out


def request(
    url: str,
    method: str = "GET",
    headers: dict | None = None,
    data: bytes | None = None,
    timeout: float = 10.0,
    retries: tuple[float, ...] | None = _DEFAULT.retry_delays,
    retry_statuses: frozenset[int] = _DEFAULT.retry_statuses,
    proxy: str | None = None,
    sleep=None,
) -> dict:
    """One request through the reference's retry schedule
    (modules/retry/retry.go:43-141): retryable statuses and transport
    errors retried with the fixed delays, Retry-After clamped."""
    import time as _time

    sleep = sleep or _time.sleep
    delays = list(retries) if retries else []
    try:
        req = urllib.request.Request(
            url, data=data, headers=headers or {}, method=method
        )
    except Exception as e:  # js_lib.go:60-62: invalid request -> error obj
        return {"body": "", "status": 0, "headers": {}, "error": str(e)}
    out: dict = {"body": "", "status": 0, "headers": {}, "error": "not fetched"}
    for delay in delays + [None]:
        out = _attempt(req, timeout, proxy)
        retryable = (out["status"] in retry_statuses) or (
            out["status"] == 0 and out["error"]
        )
        if not retryable or delay is None:
            return out
        ra = out["headers"].get("Retry-After")
        retry_after = parse_retry_after(ra) if ra else None
        if retry_after is not None:
            sleep(max(delay, min(retry_after, RETRY_AFTER_CAP)))
        else:
            sleep(delay)
    return out  # pragma: no cover


def get(url: str, headers: dict | None = None, **kw) -> dict:
    """js_lib.go:57-65 http.get."""
    return request(url, "GET", headers, **kw)


def post_form(url: str, form: dict, headers: dict | None = None, **kw) -> dict:
    """js_lib.go:67-89 http.postForm: urlencoded body; list values
    append one pair per element."""
    pairs = []
    for k, v in form.items():
        if isinstance(v, (list, tuple)):
            pairs.extend((k, str(x)) for x in v)
        else:
            pairs.append((k, str(v)))
    body = urllib.parse.urlencode(pairs).encode()
    hdrs = {"Content-Type": "application/x-www-form-urlencoded", **(headers or {})}
    return request(url, "POST", hdrs, data=body, **kw)


def post_json(url: str, data, headers: dict | None = None, **kw) -> dict:
    """js_lib.go:91-103 http.postJSON."""
    body = _json.dumps(data).encode()
    hdrs = {"Content-Type": "application/json", **(headers or {})}
    return request(url, "POST", hdrs, data=body, **kw)
