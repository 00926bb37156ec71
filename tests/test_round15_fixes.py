"""Round-15 regression tests.

- CORRECTNESS_r14's q_join_bucketed red row: a caller-owned session (the
  driver's) starts a fresh metastore each run but reuses the default
  warehouse directory, so a table LOCATION left by a previous run is
  invisible to ``DROP TABLE IF EXISTS`` yet still trips
  LOCATION_ALREADY_EXISTS on ``saveAsTable``. The demo must resolve the
  LIVE session's ``spark.sql.warehouse.dir`` (not a hardcoded path) and
  clear the stale db location. Reproduced here in a subprocess because
  the warehouse dir is a static conf — the suite's shared JVM cannot
  host a second warehouse.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap


def test_bucketed_demo_survives_stale_warehouse_location(tmp_path):
    """Exact driver failure mode: fresh metastore + pre-existing table dir
    under the session's (non-default-for-this-package) warehouse."""
    wh = str(tmp_path / "wh")
    stale = os.path.join(wh, "teas_bucketed_sf0_001.db", "li")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-stale"), "w") as f:
        f.write("stale")

    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, {repo!r})
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("r15-bucketed-repro")
            .config("spark.sql.warehouse.dir", {wh!r})
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        from transit_efficiency_analysis_spark.demo.joins import q_join_bucketed

        n = q_join_bucketed(spark, "/root/testdata/sf0.001").count()
        assert n > 0, n
        print("OK", n)
        spark.stop()
        """
    ).format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), wh=wh)

    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout
