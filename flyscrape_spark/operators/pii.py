"""PII detection + redaction over a text column — the standard
pre-training scrub pass (public methodology: regex-based email /
IP-address / phone redaction as used by C4/Dolma-style corpus
pipelines; no model inference, pure pattern surface).

The reference has no PII stage (flyscrape emits raw scraped JSON,
/root/reference/modules/output/json/json.go:114-119); this operator
is part of the engine-added training-data pipeline the driver asks
for on top of the crawl core.

Scale shape: ONE projection — zero shuffles, fully JVM-side
(``regexp_extract_all`` / ``regexp_replace`` inside whole-stage
codegen, no Python). At 100 TB this runs at scan speed and fuses
with any other per-row pass (quality features, lang-id) into the
same stage, so the scrub is effectively free next to the I/O.

Patterns are written to the common subset of Java regex (Spark) and
RE2 (DuckDB oracle): no backreferences, no lookaround, ASCII ``\\b``
word boundaries only — so the oracle comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ASCII email; TLD >= 2 alpha chars.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Dotted-quad IPv4 (syntactic — no 0-255 range check, matching the
# common corpus-scrub setting).
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
# International-ish phone: leading digit or +, then >=6 of
# digits/space/()-, ending in a digit. Applied AFTER email+IP
# redaction so dotted/at-sign forms can't be half-eaten.
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _n_matches(col: F.Column, pattern: str) -> F.Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("bigint")


def pii_scrub(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII counts + redacted text.

    Returns (doc_id, n_emails, n_ips, n_phones, redacted). Redaction
    order is email -> IPv4 -> phone: emails and IPs contain digit
    runs that the looser phone pattern would otherwise match, so the
    specific patterns must consume them first (their replacement
    tokens are digit-free).
    """
    text = F.col(text_col)
    no_email = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    no_ip = F.regexp_replace(no_email, IPV4_RE, IP_TOKEN)
    redacted = F.regexp_replace(no_ip, PHONE_RE, PHONE_TOKEN)
    return documents.select(
        "doc_id",
        _n_matches(text, EMAIL_RE).alias("n_emails"),
        _n_matches(no_email, IPV4_RE).alias("n_ips"),
        _n_matches(no_ip, PHONE_RE).alias("n_phones"),
        redacted.alias("redacted"),
    )
