"""JDBC source/sink round-trip against embedded Derby (bundled with Spark).

Covers SURVEY.md §2.1 src-jdbc / §2.2 sink-jdbc-insert: set-based batched
INSERT write (the fix for the reference's row-per-transaction bottleneck,
``realtime_extractor.py:198-234``) and partitioned parallel read-back.
"""

from __future__ import annotations

from datetime import datetime

from transit_efficiency_analysis_spark.demo.jdbc import jdbc_roundtrip


def test_jdbc_roundtrip_partitioned(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    rows = [
        (1, "alpha", 1.5, datetime(2026, 1, 1, 12, 0)),
        (2, None, -2.25, datetime(2026, 1, 2, 0, 30)),
        (3, "gamma", None, None),
        (10, "delta", 0.0, datetime(2026, 3, 1)),
    ]
    df = spark.createDataFrame(rows, "id long, name string, score double, seen timestamp")
    back = jdbc_roundtrip(df, url, "t_rt", partition_column="id", num_partitions=3)
    assert back.rdd.getNumPartitions() == 3  # parallel range scans
    assert sorted(map(tuple, back.collect())) == sorted(rows)

    # unpartitioned read path
    back1 = jdbc_roundtrip(df, url, "t_rt2")
    assert sorted(map(tuple, back1.collect())) == sorted(rows)


def test_jdbc_roundtrip_empty_table_falls_back(spark, tmp_path):
    """Empty input: min/max bounds are NULL, so the partitioned read must
    fall back to a plain read instead of crashing on int(None)."""
    url = f"jdbc:derby:{tmp_path}/db_empty;create=true"
    df = spark.createDataFrame([], "id long, name string")
    back = jdbc_roundtrip(df, url, "t_empty", partition_column="id")
    assert back.count() == 0
    assert back.columns == ["id", "name"]
