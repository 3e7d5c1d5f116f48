"""Load the reference's JS config-file format (SURVEY §2.1 #24).

A flyscrape script exports ``export const config = { ... }``; the
reference executes the script in its JS VM and reads
``exports.Config()`` (/root/reference/js.go + flyscrape.go:47,91).
This engine does not embed a JS VM — instead the config object
literal is parsed directly (a JS object literal is JSON plus
comments, unquoted keys, single quotes and trailing commas), so a
user's existing ``.js`` scripts' config blocks load unchanged. The
scrape function itself is re-expressed as a Python script
(parse/script.py), which the SURVEY documents as the design
substitution for the JS VM.

Key mapping mirrors template.js / cmd/args.go: camelCase JS keys to
the engine's CrawlConfig fields; crawl-irrelevant keys (output,
proxies, cache, cookies, browser) surface as structured fields or in
``unsupported`` rather than being silently dropped.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from flyscrape_spark.config import CrawlConfig


class JsConfigError(ValueError):
    pass


# ------------------------------------------------ object-literal parser

class _Parser:
    def __init__(self, text: str, imports: dict | None = None):
        self.t = text
        self.i = 0
        self.imports = imports or {}

    def error(self, msg: str):
        line = self.t.count("\n", 0, self.i) + 1
        raise JsConfigError(f"line {line}: {msg}")

    def ws(self):
        while self.i < len(self.t):
            c = self.t[self.i]
            if c in " \t\r\n":
                self.i += 1
            elif self.t.startswith("//", self.i):
                nl = self.t.find("\n", self.i)
                self.i = len(self.t) if nl < 0 else nl + 1
            elif self.t.startswith("/*", self.i):
                end = self.t.find("*/", self.i + 2)
                if end < 0:
                    self.error("unterminated /* comment")
                self.i = end + 2
            else:
                return

    def value(self):
        self.ws()
        if self.i >= len(self.t):
            self.error("unexpected end of config")
        c = self.t[self.i]
        if c == "{":
            return self.object()
        if c == "[":
            return self.array()
        if c in "\"'`":
            return self.string()
        return self.scalar()

    def object(self) -> dict:
        out = {}
        self.i += 1  # {
        while True:
            self.ws()
            if self.i < len(self.t) and self.t[self.i] == "}":
                self.i += 1
                return out
            key = self.key()
            self.ws()
            if self.i >= len(self.t) or self.t[self.i] != ":":
                self.error(f"expected ':' after key {key!r}")
            self.i += 1
            out[key] = self.value()
            self.ws()
            if self.i < len(self.t) and self.t[self.i] == ",":
                self.i += 1
            elif self.i < len(self.t) and self.t[self.i] != "}":
                self.error("expected ',' or '}' in object")

    def array(self) -> list:
        out = []
        self.i += 1  # [
        while True:
            self.ws()
            if self.i < len(self.t) and self.t[self.i] == "]":
                self.i += 1
                return out
            out.append(self.value())
            self.ws()
            if self.i < len(self.t) and self.t[self.i] == ",":
                self.i += 1
            elif self.i < len(self.t) and self.t[self.i] != "]":
                self.error("expected ',' or ']' in array")

    def key(self) -> str:
        if self.i >= len(self.t):
            self.error("expected object key")
        if self.t[self.i] in "\"'":
            return self.string()
        j = self.i
        while j < len(self.t) and (self.t[j].isalnum() or self.t[j] in "_$"):
            j += 1
        if j == self.i:
            self.error("expected object key")
        key, self.i = self.t[self.i:j], j
        return key

    def string(self) -> str:
        quote = self.t[self.i]
        self.i += 1
        out = []
        while self.i < len(self.t):
            c = self.t[self.i]
            if c == "\\":
                esc = self.t[self.i + 1]
                out.append({"n": "\n", "t": "\t", "r": "\r"}.get(esc, esc))
                self.i += 2
            elif c == quote:
                self.i += 1
                return "".join(out)
            else:
                out.append(c)
                self.i += 1
        self.error("unterminated string")

    def scalar(self):
        j = self.i
        while j < len(self.t) and (self.t[j].isalnum() or self.t[j] in "+-_"):
            j += 1
        tok = self.t[self.i:j]
        # the one supported computed form: NAME.split("sep") over an
        # `import NAME from "./file"` (examples/urls_from_file.js) —
        # the reference's JS VM resolves the same import at runtime
        if tok in self.imports and self.t.startswith(".split(", j):
            self.i = j + len(".split(")
            self.ws()
            sep = self.string()
            self.ws()
            if self.i >= len(self.t) or self.t[self.i] != ")":
                self.error("expected ')' after .split(...)")
            self.i += 1
            return self.imports[tok].split(sep)
        while j < len(self.t) and (self.t[j].isalnum() or self.t[j] in "+-._"):
            j += 1
        tok, self.i = self.t[self.i:j], j
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok == "null":
            return None
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            self.error(f"unsupported value {tok!r} (the config block must "
                       "be a static literal; computed values need the JS VM)")


_IMPORT_RE = None


def _scan_imports(source: str, base_dir: str | None) -> dict:
    """``import NAME from "./file"`` statements resolved to file
    contents (text imports; examples/urls_from_file.js). Without a
    ``base_dir`` the import is left unresolved and a config referencing
    it errors with guidance."""
    import os
    import re

    global _IMPORT_RE
    if _IMPORT_RE is None:
        _IMPORT_RE = re.compile(
            r'^\s*import\s+([A-Za-z_$][\w$]*)\s+from\s+["\']([^"\']+)["\']',
            re.M,
        )
    out = {}
    for name, rel in _IMPORT_RE.findall(source):
        if base_dir is not None:
            path = os.path.join(base_dir, rel)
            try:
                with open(path, encoding="utf-8") as f:
                    out[name] = f.read()
            except OSError:
                pass
    return out


def parse_config_block(source: str, base_dir: str | None = None) -> dict:
    """Extract + parse ``export const config = {...}`` from a script.
    An absent or empty block is valid (js_test.go:335 pins
    ``export const config = {}``)."""
    marker = "export const config"
    at = source.find(marker)
    if at < 0:
        return {}
    p = _Parser(source, imports=_scan_imports(source, base_dir))
    p.i = at + len(marker)
    p.ws()
    if p.i >= len(source) or source[p.i] != "=":
        p.error("expected '=' after 'export const config'")
    p.i += 1
    p.ws()
    if p.i >= len(source) or source[p.i] != "{":
        p.error("config must be an object literal")
    return p.object()


# ------------------------------------------------------- field mapping

_LIST_KEYS = {"urls", "follow", "allowedDomains", "blockedDomains",
              "allowedURLs", "blockedURLs", "proxies"}


@dataclass
class JsScrapeConfig:
    crawl: CrawlConfig
    seeds: list[str] = field(default_factory=list)
    proxies: list[str] = field(default_factory=list)
    cache: str | None = None            # "file" -> SnapshotStore
    cookies_browser: str | None = None  # "chrome"|"edge"|"firefox"
    output_file: str | None = None      # None -> stdout (cmd semantics)
    output_format: str = "json"         # "json" | "ndjson"
    unsupported: dict = field(default_factory=dict)


def config_from_source(source: str, base_dir: str | None = None) -> JsScrapeConfig:
    raw = parse_config_block(source, base_dir)
    out = JsScrapeConfig(crawl=CrawlConfig())
    cfg = out.crawl

    seeds = []
    if isinstance(raw.get("url"), str):
        seeds.append(raw["url"])
    seeds += [u for u in raw.get("urls") or [] if isinstance(u, str)]
    out.seeds = seeds

    if "depth" in raw:
        cfg.depth = int(raw["depth"])
    if "follow" in raw:
        cfg.follow = list(raw["follow"])
    cfg.allowed_domains = list(raw.get("allowedDomains") or [])
    cfg.blocked_domains = list(raw.get("blockedDomains") or [])
    cfg.allowed_urls = list(raw.get("allowedURLs") or [])
    cfg.blocked_urls = list(raw.get("blockedURLs") or [])
    if raw.get("rate") is not None:
        cfg.rate = float(raw["rate"])
    if raw.get("concurrency") is not None:
        cfg.concurrency = int(raw["concurrency"])
    if isinstance(raw.get("headers"), dict):
        cfg.headers = {str(k): str(v) for k, v in raw["headers"].items()}
    if raw.get("browser") is not None:
        cfg.browser = bool(raw["browser"])
    if raw.get("headless") is not None:
        # reference: headless == nil means true (browser.go:46-49)
        cfg.headless = bool(raw["headless"])

    if isinstance(raw.get("proxy"), str):
        out.proxies = [raw["proxy"]]
    if raw.get("proxies"):
        out.proxies = list(raw["proxies"])
    if isinstance(raw.get("cache"), str):
        out.cache = raw["cache"]
    if isinstance(raw.get("cookies"), str):
        # the sandbox has no browser profile to read; the store name is
        # carried so a caller can supply matching Cookie records
        out.cookies_browser = raw["cookies"]
    o = raw.get("output")
    if isinstance(o, dict):
        out.output_file = o.get("file")
        out.output_format = o.get("format", "json")

    known = {"url", "urls", "depth", "follow", "allowedDomains",
             "blockedDomains", "allowedURLs", "blockedURLs", "rate",
             "concurrency", "headers", "proxy", "proxies", "cache",
             "cookies", "output", "browser", "headless"}
    out.unsupported = {k: v for k, v in raw.items() if k not in known}
    return out


def config_from_file(path: str) -> JsScrapeConfig:
    import os

    with open(path, encoding="utf-8") as f:
        return config_from_source(f.read(), base_dir=os.path.dirname(path))
