"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100TB design point and safe locally:
- AQE on (runtime coalescing + skew-join splitting),
- runtime bloom-filter join pruning on (Catalyst injects bloom filters
  into large joins — the idiomatic "bloom prefilter before the exact
  URL-seen anti-join"),
- Arrow enabled for every pandas UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flyscrape-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else os.cpu_count() or 8
        shuffle_partitions = int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE: runtimeFilter.semiJoinReduction hangs query planning in
        # Spark 4.1.2 when combined with Python UDFs — do not enable.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # GC/JIT experiments on the local-mode driver JVM (the kernel
    # benches probe allocator/GC contention at high thread counts);
    # spark-submit's launcher applies this at JVM start in client mode
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship flyscrape_spark to executors (the programmatic equivalent
    of ``spark-submit --py-files``). UDF closures reference this
    package by module name, so workers must be able to import it from
    any client cwd / any cluster node."""
    import shutil
    import tempfile
    from pathlib import Path

    pkg_dir = Path(__file__).resolve().parent
    staging = Path(tempfile.mkdtemp(prefix="fss-pyfiles-"))
    archive = shutil.make_archive(
        str(staging / "flyscrape_spark"), "zip",
        root_dir=pkg_dir.parent, base_dir=pkg_dir.name,
    )
    spark.sparkContext.addPyFile(archive)
