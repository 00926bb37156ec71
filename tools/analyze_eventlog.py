"""Attribute wall time and task metrics to stages, grouped by job
description (guide §7.1 without a live UI: bench_explain labels every run
via setJobDescription, this reads the event log back).

Usage: python tools/analyze_eventlog.py <eventlog file> [desc-substring]

Per job description matching the filter, prints each stage's wall time,
task time, shuffle read/write bytes, and the stage name — so the slow
stage of a labelled query run is identifiable without the UI.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    want = sys.argv[2] if len(sys.argv) > 2 else ""
    job_desc: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    stages: dict[tuple[int, int], dict] = {}
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                job_desc[jid] = e.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                job_stages[jid] = [s["Stage ID"] for s in e.get("Stage Infos", [])]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                key = (si["Stage ID"], si.get("Stage Attempt ID", 0))
                agg = stages.setdefault(key, {})
                agg["name"] = si.get("Stage Name", "")
                agg["wall_ms"] = (si.get("Completion Time", 0) or 0) - (
                    si.get("Submission Time", 0) or 0
                )
                agg["tasks"] = si.get("Number of Tasks", 0)
            elif ev == "SparkListenerTaskEnd":
                sid = (e["Stage ID"], e.get("Stage Attempt ID", 0))
                m = e.get("Task Metrics") or {}
                agg = stages.setdefault(sid, {})
                agg["task_ms"] = agg.get("task_ms", 0) + m.get("Executor Run Time", 0)
                agg["cpu_ms"] = agg.get("cpu_ms", 0) + m.get(
                    "Executor CPU Time", 0
                ) // 1_000_000
                agg["gc_ms"] = agg.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                agg["shuf_read"] = (
                    agg.get("shuf_read", 0)
                    + sr.get("Remote Bytes Read", 0)
                    + sr.get("Local Bytes Read", 0)
                )
                agg["shuf_write"] = agg.get("shuf_write", 0) + sw.get(
                    "Shuffle Bytes Written", 0
                )
                agg["fetch_wait_ms"] = agg.get("fetch_wait_ms", 0) + sr.get(
                    "Fetch Wait Time", 0
                )
    by_desc: dict[str, list[tuple[int, dict]]] = defaultdict(list)
    for jid, desc in job_desc.items():
        if want and want not in desc:
            continue
        for sid in job_stages.get(jid, []):
            for (s, att), info in stages.items():
                if s == sid:
                    by_desc[desc].append((s, info))
    for desc in sorted(by_desc):
        rows = sorted(by_desc[desc], key=lambda r: -(r[1].get("wall_ms", 0)))
        total_wall = sum(r[1].get("wall_ms", 0) for r in rows)
        print(f"\n== {desc}  (sum stage wall {total_wall} ms, {len(rows)} stages)")
        for sid, info in rows:
            print(
                f"  stage {sid:4d} wall {info.get('wall_ms', 0):6d}ms "
                f"task {info.get('task_ms', 0):6d}ms cpu {info.get('cpu_ms', 0):6d}ms "
                f"gc {info.get('gc_ms', 0):4d}ms fetchwait {info.get('fetch_wait_ms', 0):4d}ms "
                f"sread {info.get('shuf_read', 0):>9d} swrite {info.get('shuf_write', 0):>9d} "
                f"tasks {info.get('tasks', 0):3d}  {info.get('name', '')[:90]}"
            )


if __name__ == "__main__":
    main()
