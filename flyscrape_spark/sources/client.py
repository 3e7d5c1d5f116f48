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
import sys
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


def _attempt(
    req: urllib.request.Request, timeout: float, proxy: str | None,
    binary: bool = False,
) -> dict:
    out = {"body": b"" if binary else "", "status": 0, "headers": {}, "error": ""}
    try:
        with _opener(proxy).open(req, timeout=timeout) as resp:
            out["status"] = resp.status
            raw = resp.read()
            out["body"] = raw if binary else raw.decode("utf-8", "replace")
            out["headers"] = dict(resp.headers.items())
    except urllib.error.HTTPError as e:
        # non-2xx is a RESPONSE, not an error (jsFetch semantics)
        out["status"] = e.code
        try:
            raw = e.read()
            out["body"] = raw if binary else raw.decode("utf-8", "replace")
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
    binary: bool = False,
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
        out = _attempt(req, timeout, proxy, binary=binary)
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


def _suggested_filename(url: str, content_disp: str) -> str:
    """js_lib.go:128-143: Content-Disposition filename param, else the
    URL path's basename."""
    import posixpath

    base = posixpath.basename(urllib.parse.urlsplit(url).path) or "download"
    if not content_disp:
        return base
    from email.message import Message

    m = Message()
    m["Content-Disposition"] = content_disp
    name = m.get_param("filename", header="Content-Disposition")
    if not name:
        return base
    return posixpath.basename(str(name)) or base


def _looks_like_dir(dst: str) -> bool:
    """js_lib.go:113-122 isDir: trailing slash, extension-less path,
    or an existing directory."""
    import os

    if dst.endswith("/"):
        return True
    if os.path.splitext(dst)[1] == "":
        return True
    return os.path.isdir(dst)


class Downloader:
    """``http.download(url, dst)`` — the reference's async file
    downloader (js_lib.go:105-190): up to ``limit`` parallel fetches
    (the reference pins 5, js_lib.go:26-31), errors LOGGED never
    raised, non-2xx skipped, directory destinations resolved to the
    Content-Disposition / URL-basename filename, existing files never
    overwritten. ``wait()`` is NewJSLibrary's returned wait fn.

    In the Spark pipeline the scale path for bulk media is the
    frontier's media-span table (operators/multimodal.py) — this class
    is the script-API parity surface for ad-hoc downloads from inside
    a scrape script or the driver."""

    def __init__(self, limit: int = 5, log=None, **request_kw):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=limit)
        self._futures: list = []
        self._log = log or (lambda msg: print(msg, file=sys.stderr))
        self._request_kw = request_kw

    def _fetch_one(self, url: str, dst: str) -> str | None:
        import os

        resp = request(url, "GET", binary=True, **self._request_kw)
        if resp["error"]:
            self._log(f"error downloading file {url!r}: {resp['error']}")
            return None
        if not (200 <= resp["status"] < 300):
            self._log(
                f"error downloading file {url!r}: unexpected status code "
                f"{resp['status']}"
            )
            return None
        dst = os.path.abspath(dst)
        if _looks_like_dir(dst):
            cd = resp["headers"].get("Content-Disposition", "")
            dst = os.path.join(dst, _suggested_filename(url, cd))
        if os.path.exists(dst):  # never overwrite (js_lib.go:174-176)
            return dst
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "wb") as f:
            f.write(resp["body"])
        return dst

    def download(self, url: str, dst: str) -> None:
        self._futures.append(self._pool.submit(self._fetch_one, url, dst))

    def wait(self) -> list:
        """Block until every queued download finished; returns the
        written paths (None per failed download)."""
        done = [f.result() for f in self._futures]
        self._futures.clear()
        return done
