"""Property tests for the feed-source RFC-822 date normalization:
Spark's regexp-rewrite + try_to_timestamp chain must agree with
Python's stdlib RFC-2822 parser (email.utils) — an independent
implementation of the same public spec — across generated dates,
weekday/zone variants included."""

from __future__ import annotations

import datetime as dt
from email.utils import format_datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flyscrape_spark.sources.feeds import _RFC822_ZONES, rfc822_timestamp

ZONES = sorted(_RFC822_ZONES)

_dates = st.datetimes(
    min_value=dt.datetime(1995, 1, 1),
    max_value=dt.datetime(2035, 12, 31),
).map(lambda d: d.replace(microsecond=0))


def _spark_parse(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    return [
        r["ts"] for r in
        df.select(rfc822_timestamp(F.col("s")).alias("ts"))
        .collect()
    ]


@pytest.mark.usefixtures("spark")
@given(dts=st.lists(_dates, min_size=1, max_size=8),
       zone=st.sampled_from(ZONES),
       weekday=st.booleans())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rfc822_matches_stdlib(spark, dts, zone, weekday):
    offset = int(_RFC822_ZONES[zone][:3]) * 60 + (
        1 if _RFC822_ZONES[zone][0] == "+" else -1
    ) * int(_RFC822_ZONES[zone][3:])
    tz = dt.timezone(dt.timedelta(minutes=offset))
    strings, expected = [], []
    for d in dts:
        aware = d.replace(tzinfo=tz)
        # stdlib emits "Mon, 05 Jan 2026 10:30:00 +0000"; rewrite the
        # numeric offset to the zone NAME and optionally drop the
        # advisory weekday — the two wild variants the parser handles
        s = format_datetime(aware)
        s = s[: s.rfind(" ")] + f" {zone}"
        if not weekday:
            s = s.split(", ", 1)[1]
        strings.append(s)
        expected.append(
            aware.astimezone(dt.timezone.utc).replace(tzinfo=None)
        )
    assert _spark_parse(spark, strings) == expected


def test_rfc822_rejects_garbage(spark):
    out = _spark_parse(
        spark,
        ["not a date", "99 Foo 2026 10:00:00 +0000", "", "Mon, GMT"],
    )
    assert out == [None] * 4
