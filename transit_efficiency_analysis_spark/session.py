"""SparkSession factory with scale-aware defaults.

Local test runs use ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster — AQE on (runtime skew/coalesce handling),
UTC session timezone (all reference timestamps are normalized to UTC at
ingest, see SURVEY.md §1.2), Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "transit_efficiency_analysis_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's canonical config.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32). On a real
    cluster ``master`` comes from spark-submit and this factory only sets
    the semantic/adaptive configs.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match local cores; on a cluster this is overridden (AQE coalesces)
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # static conf: table writes (bucketed tables) land outside the repo
        .config("spark.sql.warehouse.dir", "/tmp/teas_warehouse")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
