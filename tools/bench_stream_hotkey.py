"""Hot-key stream-stream join measurement (docs/SCALE.md stream-stream row).

The r7/r8 verdicts asked for measured evidence behind the stream-stream
interval join's state/skew claims: run `q_stream_join_append`'s harness
shape twice — once on the natural (uniform-user) feeds and once with ONE
user holding ~50% of all clicks — and record, per micro-batch, the join
state-store row counts and the batch duration from `recentProgress`.

What the skew does structurally: the join key is `user_id`, so every
click of the hot user lands in ONE state-store shard (one partition of
the key shuffle) and every purchase by that user probes that whole
shard. The measurement shows (a) whether total state growth/eviction
still tracks the watermark, and (b) how much the hot shard stretches
batch durations vs the uniform run.

Usage:
    python tools/bench_stream_hotkey.py [sf_dir] [hot_frac]

Prints one JSON line:
    {"metric": "stream_hotkey_join", "sf_dir": ..., "hot_frac": 0.5,
     "runs": {"uniform": {...}, "hot": {...}}}
where each run carries output_rows, total wall seconds, and the
per-batch series [{batch, input_rows, state_rows, updated, removed,
trigger_ms}].
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _run_join(spark: SparkSession, batch: DataFrame, tag: str) -> dict:
    """The q_stream_join_append harness shape (two watermarked file feeds,
    maxFilesPerTrigger=1, 30-min interval join, parquet sink, AvailableNow)
    with per-batch progress capture."""
    out_dir = tempfile.mkdtemp(prefix=f"hotkey_{tag}_out_")
    ckpt_dir = tempfile.mkdtemp(prefix=f"hotkey_{tag}_ckpt_")
    feeds: dict[str, str] = {}
    try:
        sides = {}
        for etype in ("click", "purchase"):
            feed = tempfile.mkdtemp(prefix=f"hotkey_{tag}_{etype}_")
            feeds[etype] = feed
            batch.where(F.col("event_type") == etype).repartitionByRange(
                4, "ts"
            ).write.mode("overwrite").parquet(feed)
            sides[etype] = (
                spark.readStream.format("parquet")
                .schema(batch.schema)
                .option("maxFilesPerTrigger", "1")
                .load(feed)
                .withWatermark("ts", "1 hour")
            )
        # event-time-ordered arrival per source, quartiles interleaved
        # (the _append_catchup_protocol invariant — see streamingdemo.py)
        t0 = time.time() - 3600
        for i in range(4):
            for j, etype in enumerate(("click", "purchase")):
                parts = sorted(glob.glob(os.path.join(feeds[etype], "part-*")))
                if i < len(parts):
                    os.utime(parts[i], (t0 + 2 * i + j, t0 + 2 * i + j))
        c = sides["click"].select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        p = sides["purchase"].select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        joined = c.join(
            p,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
        wall0 = time.time()
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        batches = []
        for prog in q.recentProgress:
            ops = prog.get("stateOperators") or []
            op = ops[0] if ops else {}
            batches.append(
                {
                    "batch": prog.get("batchId"),
                    "input_rows": prog.get("numInputRows"),
                    "state_rows": op.get("numRowsTotal"),
                    "updated": op.get("numRowsUpdated"),
                    "removed": op.get("numRowsRemoved"),
                    "trigger_ms": (prog.get("durationMs") or {}).get(
                        "triggerExecution"
                    ),
                }
            )
        q.stop()
        wall = round(time.time() - wall0, 2)
        out_rows = spark.read.parquet(out_dir).count()
        return {"output_rows": out_rows, "wall_sec": wall, "batches": batches}
    finally:
        for d in (out_dir, ckpt_dir, *feeds.values()):
            shutil.rmtree(d, ignore_errors=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from transit_efficiency_analysis_spark.session import get_spark
    from transit_efficiency_analysis_spark.sources.registry import load_table

    spark = get_spark("bench_stream_hotkey")
    spark.range(1).count()
    events = load_table(spark, sf_dir, "events").cache()
    n = events.count()
    hot_user = events.agg(F.min("user_id")).first()[0]

    # hot feed: reassign ~hot_frac of CLICK rows (deterministic md5 coin
    # on event_id) to one user; purchases untouched, so the hot shard's
    # state inflates on the click side exactly as a runaway clicker would
    coin = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
    hot = events.withColumn(
        "user_id",
        F.when(
            (F.col("event_type") == "click")
            & (coin < F.lit(int(hot_frac * 65536))),
            F.lit(hot_user),
        ).otherwise(F.col("user_id")),
    )

    runs = {}
    for tag, df in (("uniform", events), ("hot", hot)):
        runs[tag] = _run_join(spark, df, tag)
        hot_clicks = df.where(
            (F.col("event_type") == "click") & (F.col("user_id") == hot_user)
        ).count()
        all_clicks = df.where(F.col("event_type") == "click").count()
        runs[tag]["hot_user_click_share"] = round(hot_clicks / max(all_clicks, 1), 3)
        print(
            f"# {tag}: {runs[tag]['output_rows']} pairs in "
            f"{runs[tag]['wall_sec']}s, hot-user click share "
            f"{runs[tag]['hot_user_click_share']}; per-batch "
            + "; ".join(
                f"b{b['batch']}: in={b['input_rows']} state={b['state_rows']} "
                f"rm={b['removed']} {b['trigger_ms']}ms"
                for b in runs[tag]["batches"]
            ),
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "stream_hotkey_join",
                "sf_dir": sf_dir,
                "events": n,
                "hot_frac": hot_frac,
                "hot_user": hot_user,
                "runs": runs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
