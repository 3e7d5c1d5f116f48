"""URL column builders: host extraction, canonicalization, validation.

The reference keeps URLs as exact strings (TrimSpace only,
/root/reference/scrape.go:271) and resolves relative links with Go's
net/url ResolveReference (modules/followlinks/followlinks.go:70).
We expose:

- ``host_of`` / ``scheme_of``  — JVM-side parse_url (no Python),
- ``canonicalize``             — RFC-3986-lite canonical form as a pure
  Column expression chain, with a DuckDB rendering
  (``canonicalize_sql``) kept step-for-step identical so the driver's
  oracle reproduces it,
- ``resolve`` — full RFC 3986 relative-reference resolution (urljoin)
  used inside extraction UDFs; Python, but always Arrow-batched.

Canonical steps (applied only to http/https absolute URLs):
  1. trim surrounding whitespace           (scrape.go:271 semantics)
  2. strip the fragment
  3. lowercase scheme + authority
  4. drop default ports (:80 http, :443 https)
  5. empty path -> '/'
"""

from __future__ import annotations

from urllib.parse import urljoin, urlparse

from pyspark.sql import Column
from pyspark.sql import functions as F

_ABS = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"
_PREFIX = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def host_of(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.parse_url(u, F.lit("HOST")))


def scheme_of(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.parse_url(u, F.lit("PROTOCOL")))


def canonicalize(url: Column | str) -> Column:
    """Canonical URL as a single JVM-side expression chain."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    nofrag = F.regexp_replace(u, r"#.*$", "")
    prefix = F.regexp_extract(nofrag, _PREFIX, 1)
    rest = nofrag.substr(F.length(prefix) + F.lit(1), F.lit(1 << 20))
    lp = F.lower(prefix)
    lp = F.regexp_replace(lp, r"^(http://[^/?#]*):80$", "$1")
    lp = F.regexp_replace(lp, r"^(https://[^/?#]*):443$", "$1")
    rest = F.when(rest == "", F.lit("/")).when(
        F.substring(rest, 1, 1) == "?", F.concat(F.lit("/"), rest)
    ).otherwise(rest)
    is_http = u.rlike(r"^[hH][tT][tT][pP][sS]?://")
    return F.when(is_http, F.concat(lp, rest)).otherwise(u)


def canonicalize_sql(expr: str) -> str:
    """DuckDB SQL mirroring :func:`canonicalize` step-for-step."""
    u = f"trim({expr})"
    nofrag = f"regexp_replace({u}, '#.*$', '')"
    prefix = f"regexp_extract({nofrag}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)"
    rest = f"substr({nofrag}, length({prefix}) + 1)"
    lp = f"lower({prefix})"
    lp = f"regexp_replace({lp}, '^(http://[^/?#]*):80$', '\\1')"
    lp = f"regexp_replace({lp}, '^(https://[^/?#]*):443$', '\\1')"
    rest = (
        f"CASE WHEN {rest} = '' THEN '/' "
        f"WHEN substr({rest}, 1, 1) = '?' THEN '/' || {rest} "
        f"ELSE {rest} END"
    )
    is_http = f"regexp_matches({u}, '^[hH][tT][tT][pP][sS]?://')"
    return f"CASE WHEN {is_http} THEN ({lp}) || ({rest}) ELSE {u} END"


def resolve(origin: str, link: str) -> str | None:
    """RFC 3986 resolution + the reference's link validity rule:
    scheme must be http/https/empty *after* resolution
    (modules/followlinks/followlinks.go:88-94)."""
    try:
        absolute = urljoin(origin, link)
        scheme = urlparse(absolute).scheme
    except ValueError:
        return None
    if scheme not in ("", "http", "https"):
        return None
    return absolute
