"""Attribute-order-free HTML tag attribute extraction, shared by the
meta-tag operators (operators/metarobots.py, operators/canonical.py,
operators/hreflang.py).

Real CMSes emit tag attributes in every order (``<link hreflang=..
href=.. rel=alternate>`` is as common as the canonical ordering), so
any pattern that hard-codes one attribute sequence silently drops
pages. Instead of enumerating permutations (2 attrs = 2 patterns,
3 attrs = 6), scan the WHOLE tag once with ``regexp_extract_all`` and
pull each attribute out of the matched tag text independently —
order-free by construction, still pure JVM codegen (no Python), and
document order is preserved because ``regexp_extract_all`` returns
matches positionally.

Scale shape: one regex scan per tag name + one small regex per
attribute applied via ``transform``/``filter`` over the (tiny) tag
array. Fuses into the page scan like the hand-rolled patterns did.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _attr_pattern(name: str) -> str:
    r"""Regex extracting ``name="value"`` / ``name='value'`` from one
    tag's text (group 1 = value). The lookbehind guards against
    suffix hits (``data-href`` must not match ``href`` — a plain
    ``\b`` would, since ``-`` is a word boundary)."""
    return r'(?i)(?<![\w-])' + name + r'\s*=\s*["\']([^"\']*)["\']'


def tag_attr(tag: Column, name: str) -> Column:
    """Value of attribute ``name`` inside a single tag's text (''
    when absent). Case-insensitive on the attribute name, exact on
    the value."""
    return F.regexp_extract(tag, _attr_pattern(name), 1)


def tags_of(html_col: str | Column, tag_name: str) -> Column:
    """array<string> of every ``<tag_name ...>`` open tag in document
    order (full tag text, attributes in whatever order the page
    emitted them)."""
    h = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.regexp_extract_all(
        h, F.lit(r"(?i)<" + tag_name + r"\b[^>]*>"), 0
    )


def tags_where(
    html_col: str | Column, tag_name: str, attr: str, value: str
) -> Column:
    """array<string> of every ``<tag_name ...>`` tag whose ``attr``
    equals ``value`` (case-insensitive), in document order —
    independent of where the attribute sits in the tag."""
    return F.filter(
        tags_of(html_col, tag_name),
        lambda t: F.lower(tag_attr(t, attr)) == value.lower(),
    )
