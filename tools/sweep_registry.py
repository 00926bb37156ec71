"""Single-pass timing sweep over EVERY registered demo (guide §1: the
optimization rounds must examine every operator, and the bench only
times headline+extras+TPC-H — this finds the slow ones outside it).

Usage: python tools/sweep_registry.py <sf_dir> [runs]

One warm-up pass (cache fills land outside the timed region, mirroring
bench.py), then ``runs`` timed count() passes per demo; prints one JSON
object {name: median_sec} sorted slowest-first to stdout, per-run lines
to stderr. Side-effecting demos (sinks, upserts, streaming triggers)
run exactly as the driver's verify does — repeatably.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 2:
        print("Usage: python tools/sweep_registry.py <sf_dir> [runs]", file=sys.stderr)
        raise SystemExit(2)
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("sweep_registry")
    spark.range(1).count()
    registry = load_registry()
    samples: dict[str, list[float]] = {}
    failed: dict[str, str] = {}
    for name, d in registry.items():
        spark.sparkContext.setJobDescription(f"sweep-warm:{name}")
        try:
            d.fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            failed[name] = repr(e)[:200]
            print(f"# {name} FAILED warmup: {failed[name]}", file=sys.stderr)
            continue
        samples[name] = []
    for r in range(runs):
        for name in samples:
            spark.sparkContext.setJobDescription(f"sweep:{name}:run{r}")
            # perf_counter: monotonic, immune to NTP steps (ADVICE r18)
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            print(f"# {name} run{r}: {dt:.3f}s", file=sys.stderr)
    med = {
        n: round(sorted(xs)[len(xs) // 2], 3)
        for n, xs in samples.items()
        if xs
    }
    out = dict(sorted(med.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "failed": failed, "queries": out}))


if __name__ == "__main__":
    main()
