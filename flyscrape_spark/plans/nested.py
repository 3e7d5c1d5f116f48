"""Nested scrape — the reference's synchronous ``scrape(url, fn)``
(/root/reference/js.go:196-216, scrape.go:224-268 processImmediate):
fetch a linked page inline and embed its extraction in the parent's
result. Children bypass depth limits, the seen set and the output
sink (processImmediate never calls ReceiveResponse), but still pass
request validators.

Batch shape (SURVEY §2.1 #9): instead of a per-parent synchronous
fetch, the child URLs form one extra fetch generation, joined back to
parents — a left join, with child fetches deduplicated across parents.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from flyscrape_spark.functions.urls import host_of, resolve
from flyscrape_spark.plans.filters import validators
from flyscrape_spark.sources.transport import Transport


@F.pandas_udf(StringType())
def resolve_udf(base: pd.Series, ref: pd.Series) -> pd.Series:
    """RFC 3986 resolution of a (possibly relative) reference against
    a base URL — the scrape(url) absolutization (js.go:205-216)."""
    return pd.Series(
        [resolve(b, r) if (b and r is not None) else None for b, r in zip(base, ref)]
    )


def scrape_children(
    parents: DataFrame,
    child_ref_col: str,
    transport: Transport,
    child_extract_udf=None,
    config=None,
    seed_urls: list[str] | None = None,
    seed_hosts: list[str] | None = None,
    prefix: str = "child",
    child_results_fn=None,
) -> DataFrame:
    """Attach child-page extraction to each parent row.

    parents must carry (url, <child_ref_col>); the child reference is
    resolved against the parent URL, validated (ValidateRequest still
    runs for processImmediate, scrape.go:239-247), fetched as one
    deduplicated batch, extracted, and left-joined back.

    Nesting (js_test.go:205-261 pins 2-deep ``scrape`` chains):
    instead of ``child_extract_udf``, pass ``child_results_fn`` — a
    callable mapping the fetched-children DataFrame to
    ``(url, data, error)`` rows. Calling :func:`scrape_children` again
    inside it adds one more fetch generation per nesting level, each
    resolved against ITS parent URL (the /foo/ + bar -> /foo/bar
    chain), while staying a flat sequence of batch joins.
    """
    with_child = parents.withColumn(
        "_child_url", resolve_udf(F.col("url"), F.col(child_ref_col))
    )
    children = (
        with_child.select(F.col("_child_url").alias("url"))
        .filter(F.col("url").isNotNull())
        .dropDuplicates(["url"])
        .withColumn("depth", F.lit(0))
        .withColumn("host", host_of("url"))
    )
    if config is not None:
        children = children.filter(
            validators(config, seed_urls or [], seed_hosts or [])
        )
    fetched = transport.fetch(children)
    if child_results_fn is not None:
        extracted = child_results_fn(fetched).select("url", "data", "error")
    else:
        extracted = fetched.withColumn(
            "data",
            F.when(
                F.col("body").isNotNull(),
                child_extract_udf(F.col("body"), F.col("url")),
            ),
        ).select("url", "data", "error")
    child_data = extracted.select(
        F.col("url").alias("_child_join_url"),
        F.col("data").alias(f"{prefix}_data"),
        F.col("error").alias(f"{prefix}_error"),
    )
    return with_child.join(
        child_data, with_child["_child_url"] == child_data["_child_join_url"], "left"
    ).drop("_child_join_url").withColumnRenamed("_child_url", f"{prefix}_url")
