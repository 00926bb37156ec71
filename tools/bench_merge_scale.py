"""Batch-proportionality check for the partitioned pure-Parquet MERGE
(docs/SCALE.md, VERDICT r11 ask #2).

Builds the stored table at Nx scale (lineitem replicated with disjoint
per-copy key spaces — table AND key cardinality grow Nx) with the
production bucket sizing rule: num_buckets grows with the table so a
bucket stays ~constant-sized (8 buckets per 1x copy here; the same rule
that picks 4096 buckets at 100 TB). Then merges one FIXED-size trickle
batch (the line items of 2 orders, newer shipdates) and times it:

- ``merge_into_partitioned``: should stay ~FLAT across table scale —
  the batch touches a handful of constant-sized bucket partitions, so
  scan + rewrite cost is bounded by the batch's touched slice, not the
  table (the only per-table-scale residue is the driver's partition-dir
  listing, O(num_buckets) — a catalog's job on a real deployment).
- ``merge_into_sql`` (the r11 full-rewrite runtime, same semantics):
  the contrast row — O(table) per batch, wall grows ~Nx.

The seed build (first merge, whole table) is also timed: that is the
pay-once layout cost, analogous to the bucketed-flagship layout write.

Usage:
    python tools/bench_merge_scale.py [sf_dir] [N ...]   # default 1 16 64

Prints one JSON line:
    {"metric": "merge_scale", "batch_rows": B,
     "points": {N: {"table_rows": _, "num_buckets": _, "seed_s": _,
                    "merge_part_s": _, "touched": _, "merge_full_s": _}}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scales = [int(a) for a in sys.argv[2:]] or [1, 16, 64]

    from transit_efficiency_analysis_spark.operators.upsert import (
        merge_into_partitioned,
        merge_into_sql,
    )
    from transit_efficiency_analysis_spark.session import get_spark
    from transit_efficiency_analysis_spark.sources.registry import load_table

    spark = get_spark("bench_merge_scale")
    spark.range(1).count()

    # lineitem, not events: 6x the rows and a wider payload, so the
    # full-rewrite contrast row measures data volume instead of fixed
    # job overheads
    base = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity",
        "l_extendedprice", "l_suppkey", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
    )
    keys = ["l_orderkey", "l_linenumber"]
    order_by = ["l_shipdate", "l_suppkey"]

    # fixed trickle batch: the line items of 2 orders, shipdate pushed
    # past everything stored so the merge is all matched-updates — a
    # trickle batch touches a handful of bucket partitions at every scale
    two_orders = [r[0] for r in base.select("l_orderkey").distinct().limit(2).collect()]
    batch = (
        base.where(F.col("l_orderkey").isin(two_orders))
        .withColumn("l_shipdate", F.date_add(F.col("l_shipdate"), 10_000))
        .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(100_000_000))
        .cache()
    )
    batch_rows = batch.count()

    points = {}
    work = tempfile.mkdtemp(prefix="bench_merge_scale_")
    try:
        for n in scales:
            table = None
            for i in range(n):
                c = base.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
                )
                table = c if table is None else table.unionByName(c)
            table = table.cache()
            table_rows = table.count()
            buckets = 8 * n

            part_target = os.path.join(work, f"part_{n}")
            t0 = time.perf_counter()
            merge_into_partitioned(part_target, table, keys, order_by,
                                   num_buckets=buckets)
            seed_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            merge_into_partitioned(part_target, batch, keys, order_by,
                                   num_buckets=buckets)
            part_s = time.perf_counter() - t0
            from transit_efficiency_analysis_spark.operators.upsert import (
                _bucket_expr,
            )

            touched = (
                batch.select(_bucket_expr(keys, buckets).alias("b"))
                .distinct()
                .count()
            )

            full_target = os.path.join(work, f"full_{n}")
            merge_into_sql(full_target, table, keys, order_by)
            t0 = time.perf_counter()
            merge_into_sql(full_target, batch, keys, order_by)
            full_s = time.perf_counter() - t0

            # the OTHER envelope end (worst case, recorded honestly): a
            # wide batch whose keys hash into every bucket forces a
            # read+rewrite of all partitions — expect ~the full-rewrite
            # wall plus partition bookkeeping, which is exactly what the
            # "trickle batches pay proportionally" claim excludes
            wide = (
                base.where(F.col("l_orderkey") % 100 == 0)
                .withColumn("l_shipdate", F.date_add(F.col("l_shipdate"), 20_000))
                .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(200_000_000))
            )
            wide_touched = (
                wide.select(_bucket_expr(keys, buckets).alias("b"))
                .distinct()
                .count()
            )
            # round-13 A/B, same session/state: the DIRECT write first
            # (wide_threshold=1.1 disables the clustered route — the
            # pre-r13 behavior), then the auto-routed clustered write
            # (the second merge of the same wide batch is a fixed point:
            # identical touched set and data volume)
            t0 = time.perf_counter()
            merge_into_partitioned(part_target, wide, keys, order_by,
                                   num_buckets=buckets, wide_threshold=1.1)
            wide_direct_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            merge_into_partitioned(part_target, wide, keys, order_by,
                                   num_buckets=buckets)
            wide_s = time.perf_counter() - t0
            # steady-state clustered point: the run above READ the
            # direct run's fragmented output (tasks x buckets small
            # files); this one reads the clustered one-file-per-bucket
            # layout — the state a clustered-only deployment lives in
            t0 = time.perf_counter()
            merge_into_partitioned(part_target, wide, keys, order_by,
                                   num_buckets=buckets)
            wide_steady_s = time.perf_counter() - t0

            # read-side overhead (VERDICT r12 ask #6): the same trickle
            # merge returning only the touched slice (pruned path read)
            # vs the default whole-table discovery read-back
            t0 = time.perf_counter()
            merge_into_partitioned(part_target, batch, keys, order_by,
                                   num_buckets=buckets,
                                   return_touched_only=True)
            part_touched_s = time.perf_counter() - t0

            # round-14 manifest-commit A/B (VERDICT r13 ask #3): the
            # same seed + trickle + touched-only sequence through the
            # manifest protocol (one atomic manifest swap per merge,
            # write-once version dirs, zero-listing manifest-resolved
            # reads) — the object-store-shaped commit. The contrast of
            # interest is merge_part_s vs mani_merge_s: the manifest
            # read path replaces the O(touched) dir stats + symlink
            # resolution with one JSON read.
            mani_target = os.path.join(work, f"mani_{n}")
            t0 = time.perf_counter()
            merge_into_partitioned(mani_target, table, keys, order_by,
                                   num_buckets=buckets, commit="manifest")
            mani_seed_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            merge_into_partitioned(mani_target, batch, keys, order_by,
                                   num_buckets=buckets)
            mani_merge_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            merge_into_partitioned(mani_target, batch, keys, order_by,
                                   num_buckets=buckets,
                                   return_touched_only=True)
            mani_touched_s = time.perf_counter() - t0
            # manifest wide point (round 14): the same wide batch as the
            # symlink rows, twice — the second run is the steady state
            # (one-file-per-bucket layout), comparable to wide_steady_s;
            # the commit here is ONE manifest replace instead of
            # `buckets` symlink flips.
            t0 = time.perf_counter()
            merge_into_partitioned(mani_target, wide, keys, order_by,
                                   num_buckets=buckets)
            mani_wide_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            merge_into_partitioned(mani_target, wide, keys, order_by,
                                   num_buckets=buckets)
            mani_wide_steady_s = time.perf_counter() - t0

            table.unpersist()
            points[n] = {
                "table_rows": table_rows,
                "num_buckets": buckets,
                "seed_s": round(seed_s, 2),
                "merge_part_s": round(part_s, 2),
                "touched": touched,
                "merge_full_s": round(full_s, 2),
                "wide_batch_s": round(wide_s, 2),
                "wide_direct_s": round(wide_direct_s, 2),
                "wide_steady_s": round(wide_steady_s, 2),
                "wide_touched": wide_touched,
                "merge_part_touched_s": round(part_touched_s, 2),
                "manifest_seed_s": round(mani_seed_s, 2),
                "manifest_merge_s": round(mani_merge_s, 2),
                "manifest_touched_s": round(mani_touched_s, 2),
                "manifest_wide_s": round(mani_wide_s, 2),
                "manifest_wide_steady_s": round(mani_wide_steady_s, 2),
            }
            print(
                f"# N={n}: table {table_rows} rows, {buckets} buckets, "
                f"seed {seed_s:.1f}s, partitioned merge {part_s:.2f}s "
                f"({touched} touched; touched-only return "
                f"{part_touched_s:.2f}s), full-rewrite merge {full_s:.2f}s, "
                f"wide batch direct {wide_direct_s:.2f}s / clustered "
                f"{wide_s:.2f}s / steady {wide_steady_s:.2f}s "
                f"({wide_touched}/{buckets} touched), manifest seed "
                f"{mani_seed_s:.1f}s / merge {mani_merge_s:.2f}s / "
                f"touched-only {mani_touched_s:.2f}s / wide "
                f"{mani_wide_s:.2f}s / wide steady {mani_wide_steady_s:.2f}s",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    la = os.getloadavg()
    print(json.dumps({
        "metric": "merge_scale",
        "sf_dir": sf_dir,
        "batch_rows": batch_rows,
        "points": points,
        "loadavg": [round(x, 2) for x in la],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
