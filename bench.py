"""Headline benchmark: runs the engine's flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed with a count-style action (df.count() after the full
plan) so results are materialized without driver-side collection overhead
dominating the measurement. Per-query times are the MEDIAN of
$SPARK_GRAFT_BENCH_RUNS interleaved runs (default 3), with the per-query
max-min spread reported alongside — the total is the total of medians.

Load gate (round 14, VERDICT r13 ask #5): the record self-identifies
contamination instead of reading as a regression — BENCH_r13 ran at
loadavg_1m 13.59 on the 32-cpu box and every headline query showed
+6-49% with zero code changes on any headline path. When env_before's
1-minute loadavg exceeds $SPARK_GRAFT_LOAD_GATE (default 4.0 — the
"co-tenant work was competing" line in _machine_context's docstring),
both the stdout line and the stderr detail carry
"load_contaminated": true plus the triggering loadavg; the run still
completes (warn-and-record, never abort).

Load retry (round 16, VERDICT r15 ask #7 — BENCH_r14 AND r15 were both
load-contaminated; the gate reported honestly but the artifact of
record never got a fair shot): when env_before exceeds the gate the
run first WAITS, bounded by $SPARK_GRAFT_LOAD_WAIT seconds (default
240; 0 disables), polling until loadavg_1m drops under the gate —
loadavg decays with a ~1-minute time constant, so the driver's own
just-finished work (the usual contaminant) clears well inside the
bound. If the timed battery still STARTED contaminated, one bounded
re-wait + ONE retry of the timed passes runs afterwards; when the
retry starts clean it becomes the figure of record and the loaded
attempt is kept alongside (never hidden) as "first_attempt". A box
that stays busy past both waits records the single loaded run exactly
as before — measure-and-say-so, never block forever.

Post-run flag (round 17, ADVICE r16 #4): the pre-battery gate can't
see a load spike that STARTS mid-battery, and loadavg sampled after
the run can't either (our own 32-thread battery saturates the box).
The timed region instead measures co-tenant CPU directly — /proc/stat
box-busy delta minus this process tree's own CPU delta, divided by
wall time — and flags "load_contaminated_post": true when that
external concurrency exceeds the same gate. "external_cpu" in the
stderr detail carries the measured average.

Round-19 additions (VERDICT r18 asks #2/#7/#9 — ADDITIONS ONLY: the
frozen timed actions, warm-up protocol and every existing field are
untouched, so BENCH series stay comparable):

- "stage_sec" per headline query (stdout; every measured query in the
  stderr detail): executor stage time — the sum of task run time over
  the query's stages, read back from the in-process AppStatusStore
  after the battery via per-run job groups (set BEFORE each timed
  region starts; a job-group id is driver thread-local metadata, not
  work). At sf0.1 most headline walls are driver-bound (plan
  construction + AQE sequencing), so the 8-core/32-core WALL ratio
  sits near 1 and the driver's scaling block false-flagged
  suspect_cpus_ignored in r18; stage_sec is the scaling-legible
  signal — it stays ~constant across core counts while per-stage
  parallelism changes, and wall >> stage_sec/cores says "driver-bound",
  not "serial engine".
- "cold_first_run" (stderr detail; the two persist-backed dedup
  queries also on stdout as "cold"): the warm-up pass was always the
  true first run — it now gets a timestamp, so the artifact carries a
  cold figure for the queries whose timed medians are deliberately
  warm-cache (the DISK_ONLY shingle/fingerprint persists filled by the
  warm-up since round 4).
- "spread_flagged" (stdout + stderr): true when >= 2 headline queries'
  max-min spread exceeds max(0.3 s, 50% of their median) — the
  box's degraded-phase signature (OPTIMIZATION_r18.md "Environment
  instability") detected by the artifact itself instead of adjudicated
  in the round log.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.session import get_spark

#: headline set — the flagship pipeline + the heaviest operator families.
#: FROZEN as of round 3: this list must not change between rounds so BENCH
#: files stay comparable query-for-query. If coverage ever must change,
#: keep this list intact and report the additional queries separately.
#: ONE deliberate exception (round 11, VERDICT r10 ask #4): the headline
#: ANN slot switched from q_sim_lsh_topk (fixed plane count — the
#: parameterization with the measured 147.7×-at-64× scale cliff,
#: docs/SCALE.md) to q_sim_lsh_topk_derived (plane count derived from
#: count(*) — 27.3× at 64×, the mode you would actually run at 100 TB).
#: The fixed twin moved to EXTRAS so its round-over-round series
#: continues uninterrupted; compare r11+ headline ANN against the
#: EXTRAS series, not the pre-r11 headline slot.
HEADLINE = [
    "q_rebuild_full",
    "q_join_star",
    "q_sql_tpch_q1",
    "q_agg_dashboard",
    "q_upsert_cond",
    "q_window_session",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash_pairs",
    "q_sim_bruteforce_topk",
    "q_sim_lsh_topk_derived",
    "q_text_quality",
    # native-window form of the group-map normalization (the scale path);
    # q_apply_in_pandas stays as the Python-surface demo outside the headline
    "q_range_normalize",
]

#: measured with the SAME median-of-N + warm-up protocol as the headline
#: but reported separately (the headline list is frozen for
#: round-over-round comparability). The BI-representative dashboard
#: number (round-5 verdict ask #3): the same aggregate as
#: q_agg_dashboard_materialized over a table materialized ONCE per
#: process — the untimed warm-up pass pays the write, the timed runs
#: measure what a dashboard actually costs at 100x (scan+agg over the
#: materialized table). The registry demo keeps the write in its own
#: timing because its oracle contract is "materialization is lossless".
EXTRAS = [
    "q_agg_dashboard_materialized_read",
    # round-9 additions (exact-substring dedup + data selection),
    # reported outside the frozen headline list for round-over-round
    # comparability; registry-resolved below
    "q_text_dup_spans",
    "q_corpus_domain_affinity",
    # the fixed-plane ANN twin, demoted from the headline in round 11
    # (see the HEADLINE comment) — kept here so its series continues
    "q_sim_lsh_topk",
    # round-15 additions: the IVF ANN shapes whose executed default
    # flipped to the map-only fold assignment this round — a per-round
    # series starts here so any fold-path regression shows in the
    # artifact of record (q_sim_ivf_lloyd_topk's executed shape is
    # q_sim_ivf_topk's plus one fold-assign Lloyd round, so the two
    # tracked shapes cover all three demos' plan classes)
    "q_sim_ivf_topk",
    "q_sim_ivf_pq_topk",
]


def _extra_fns():
    from transit_efficiency_analysis_spark.demo.analytics import (
        dashboard_read_materialized,
    )

    return {"q_agg_dashboard_materialized_read": dashboard_read_materialized}


def _machine_context(spark=None) -> dict:
    """Environment annotation so noise rounds are self-diagnosing (round-8
    verdict #3: the r8 headline drifted +13% with no code cause and the
    record carried nothing to distinguish machine load from regression).
    Load averages are the 1/5/15-minute run-queue lengths; on the
    32-thread bench box a 1-minute figure near 0 means an idle machine,
    anything over ~4 means co-tenant work was competing with the run."""
    ctx: dict = {}
    try:
        la = os.getloadavg()
        ctx["loadavg_1m"] = round(la[0], 2)
        ctx["loadavg_5m"] = round(la[1], 2)
        ctx["loadavg_15m"] = round(la[2], 2)
    except OSError:  # pragma: no cover - platform without getloadavg
        pass
    ctx["cpus"] = os.cpu_count()
    if spark is not None:
        ctx["default_parallelism"] = spark.sparkContext.defaultParallelism
        ctx["shuffle_partitions"] = spark.conf.get("spark.sql.shuffle.partitions")
    return ctx


def _wait_for_idle(gate: float, budget_s: float) -> float:
    """Poll loadavg_1m every 10 s for up to ``budget_s`` seconds, until
    it drops to ``gate`` or below. Returns seconds actually waited.
    Platforms without getloadavg return immediately (nothing to gate)."""
    waited = 0.0
    while budget_s - waited >= 10.0:
        try:
            la = os.getloadavg()[0]
        except OSError:  # pragma: no cover - platform without getloadavg
            return waited
        if la <= gate:
            return waited
        print(
            f"# load wait: loadavg_1m {la:.2f} > gate {gate} — sleeping "
            f"10s ({waited:.0f}/{budget_s:.0f}s used)",
            file=sys.stderr,
        )
        time.sleep(10.0)
        waited += 10.0
    return waited


def _cpu_snapshot() -> tuple[float, float] | None:
    """(box_busy_cpu_seconds, self_tree_cpu_seconds) from /proc — the
    two counters whose deltas across the timed battery estimate
    EXTERNAL CPU concurrency (ADVICE r16 #4: a load spike starting
    mid-battery left load_contaminated=false on the figure of record).
    The naive fix — compare env_after's loadavg to the gate — would
    flag EVERY run: our own 32-thread battery saturates the box, so
    post-run loadavg always exceeds the gate from self-load alone.
    Subtracting our own process tree's CPU isolates the co-tenant
    signal instead.

    box busy = /proc/stat's cpu line minus idle+iowait. self tree =
    utime+stime over this process and every live descendant (the Spark
    JVM and its python workers), plus cutime+cstime (reaped children —
    counted exactly once: a reaped child is no longer in the live
    walk). Returns None off-Linux (the artifact then simply carries no
    post-run flag — same degradation as the loadavg fields).

    Known limitation (ADVICE r17): "own tree" is a live ppid walk, so a
    descendant that REPARENTS — a double-forked daemon, or a worker
    orphaned when its intermediate parent exits before reaping — leaves
    the tree and its CPU counts as external, which can false-flag
    load_contaminated_post on a clean run. Spark's local-mode children
    (the JVM, python workers, daemon.py) stay parented for the battery's
    lifetime, so the figure of record is unaffected; treat the flag as
    advisory if a custom query spawns detaching subprocesses."""
    try:
        tick = os.sysconf("SC_CLK_TCK")
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        # busy = everything except idle+iowait, MINUS guest/guest_nice
        # (fields 9/10): the kernel already folds guest time into
        # user/nice, so summing them too would double-count a
        # co-tenant VM's CPU and over-flag contamination (review r17)
        busy = (
            sum(vals[:8])  # user nice system idle iowait irq softirq steal
            - vals[3]
            - (vals[4] if len(vals) > 4 else 0)
        ) / tick
        stats: dict[int, tuple[int, float]] = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    line = f.read()
                # comm may contain spaces/parens — split after LAST ')'
                rest = line.rsplit(")", 1)[1].split()
                # rest[0]=state, [1]=ppid, [11..14]=utime stime cutime cstime
                cpu = sum(int(rest[i]) for i in (11, 12, 13, 14)) / tick
                stats[int(pid)] = (int(rest[1]), cpu)
            except (OSError, IndexError, ValueError):
                # one torn/truncated entry (teardown race, hidepid)
                # must not void the whole snapshot — the flag exists
                # precisely for churning boxes (review r17)
                continue
        children: dict[int, list[int]] = {}
        for pid, (ppid, _) in stats.items():
            children.setdefault(ppid, []).append(pid)
        own = 0.0
        frontier = [os.getpid()]
        while frontier:
            pid = frontier.pop()
            if pid not in stats:
                continue
            own += stats[pid][1]
            frontier.extend(children.get(pid, ()))
        return busy, own
    except (OSError, ValueError, IndexError):  # pragma: no cover
        return None


def _external_cpu_cores(
    before: tuple[float, float] | None,
    after: tuple[float, float] | None,
    wall_s: float,
) -> float | None:
    """Average co-tenant CPU concurrency (in cores, the same unit as
    loadavg's run-queue length) over a timed region: (box busy delta −
    own tree delta) / wall. None when either snapshot failed."""
    if before is None or after is None or wall_s <= 0:
        return None
    return max(0.0, (after[0] - before[0]) - (after[1] - before[1])) / wall_s


def _stage_times_ms(spark, prefix: str) -> dict[str, int]:
    """Executor stage time (sum of task run time, ms) per job group with
    the given prefix, read from the in-process AppStatusStore (works
    with spark.ui.enabled=false — the store always tracks). Stages are
    deduplicated per group (a SKIPPED re-listing of a shared stage
    reports 0 and the COMPLETE attempt is counted once). Read-only and
    post-battery: never inside any timed region."""
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        jobs = store.jobsList(None)
        group_stages: dict[str, set[int]] = {}
        for i in range(jobs.size()):
            j = jobs.apply(i)
            g = j.jobGroup()
            if not g.isDefined():
                continue
            g = g.get()
            if not g.startswith(prefix):
                continue
            sids = j.stageIds()
            group_stages.setdefault(g, set()).update(
                sids.apply(k) for k in range(sids.size())
            )
        cache: dict[int, int] = {}
        out: dict[str, int] = {}
        for g, sids in group_stages.items():
            total = 0
            for sid in sids:
                if sid not in cache:
                    try:
                        cache[sid] = store.lastStageAttempt(sid).executorRunTime()
                    except Exception:  # noqa: BLE001 - stage evicted/never ran
                        cache[sid] = 0
                total += cache[sid]
            out[g] = total
        return out
    except Exception as e:  # noqa: BLE001 - additions-only: never fail the bench
        print(f"# stage-time readback unavailable: {e!r}", file=sys.stderr)
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # retention raised so the post-battery stage-time readback still sees
    # the first queries' jobs (the battery runs ~1-2k jobs; the default
    # store keeps 1000). Measurement-visibility only: no effect on
    # planning or execution of any timed query.
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.retainedJobs": "20000",
            "spark.ui.retainedStages": "20000",
        },
    )
    registry = load_registry()
    # warn-and-record load gate (docstring "Load gate"): a battery
    # launched on a busy box measures the box, not the round
    load_gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "4.0"))
    load_wait = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "240"))
    env_before = _machine_context(spark)
    waited_s = 0.0
    if (
        env_before.get("loadavg_1m") is not None
        and env_before["loadavg_1m"] > load_gate
        and load_wait > 0
    ):
        # bounded pre-wait (docstring "Load retry"): give the figure of
        # record a fair shot at an idle box before measuring anything
        waited_s = _wait_for_idle(load_gate, load_wait)
        env_before = _machine_context(spark)
        env_before["pre_waited_s"] = round(waited_s, 1)
    load_1m = env_before.get("loadavg_1m")
    load_contaminated = load_1m is not None and load_1m > load_gate
    if load_contaminated:
        print(
            f"# WARNING: loadavg_1m {load_1m} > gate {load_gate} — this "
            "battery is load-contaminated; numbers measure the box",
            file=sys.stderr,
        )

    # warm the JVM/session and the Python worker pool so boot cost isn't in
    # query times (Arrow workers cold-start ~1-2s per executor thread)
    spark.range(1).count()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(1000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm("id")
    ).count()

    # 3 runs per query, report the MEDIAN (round-3 ask #7: the shared box
    # has ±2s co-tenant noise that polluted round-over-round comparison).
    # Runs interleave (full pass 1, 2, 3 over the list) so one noisy
    # minute doesn't bias all three samples of the same query; the spread
    # (max-min across runs) is reported per query for honesty.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # the headline list is FROZEN for round-over-round comparability —
    # a missing name must be a hard error BEFORE any timed work, never
    # a silently smaller total that reads as a speedup (review r17);
    # q_sql_tpch_q1 gets the same treatment because the TPC-H battery
    # appends it unconditionally below
    missing = [n for n in (*HEADLINE, "q_sql_tpch_q1") if n not in registry]
    if missing:
        raise SystemExit(
            f"bench: frozen queries missing from the registry: {missing} "
            "— fix the registry (or consciously amend the frozen list)"
        )
    missing_extras = [n for n in EXTRAS if n not in registry]
    if missing_extras:
        # extras are reported separately; a drop is loud but not fatal
        print(
            f"# WARNING: extras missing from the registry: {missing_extras}",
            file=sys.stderr,
        )
    fns = {n: registry[n].fn for n in HEADLINE}
    fns.update(_extra_fns())
    fns.update({n: registry[n].fn for n in EXTRAS if n in registry})

    # Headline ANN sizing via cached statistics (round 12, VERDICT r11
    # ask #5): the derived-planes demo re-counts the corpus on every
    # invocation (~0.2 s of its r11 wall) because the oracle twin must
    # re-derive the plane count inside its own SQL. A deployment sizes
    # from the catalog's row count instead — so the bench sources the
    # count ONCE per battery (untimed, below) and passes it as n_rows;
    # the timed runs then measure the query, not the sizing probe. The
    # registry demo keeps its self-sizing form for the oracle gate.
    if "q_sim_lsh_topk_derived" in fns:
        from transit_efficiency_analysis_spark.operators.similarity import lsh_topk
        from transit_efficiency_analysis_spark.sources.registry import load_table

        emb_rows = load_table(spark, sf_dir, "embeddings").count()
        print(f"# catalog stat: embeddings rows = {emb_rows}", file=sys.stderr)
        fns["q_sim_lsh_topk_derived"] = lambda s, d: lsh_topk(
            load_table(s, d, "embeddings"),
            planes=None,
            k=3,
            target_bucket_size=64,
            n_rows=emb_rows,
        )
    # one untimed warm-up pass (round-4 ask #7): cache fills (the dedup
    # operators persist their shared shingle/fingerprint relations) and
    # any other one-time materialization land OUTSIDE the timed region,
    # so medians measure the query and spreads measure the machine.
    # Round 19 (VERDICT r18 ask #7): the warm-up IS each query's true
    # cold first run, so it now carries a timestamp — cold_first_run is
    # reported alongside (never in place of) the frozen warm medians.
    cold_first = {}
    for name in fns:
        t0 = time.time()
        n = fns[name](spark, sf_dir).count()
        cold_first[name] = round(time.time() - t0, 3)
        print(
            f"# {name} warmup: {n} rows in {cold_first[name]}s (cold first run)",
            file=sys.stderr,
        )

    # the frozen list must stay comparable round-over-round, so extra
    # coverage is reported SEPARATELY (round-3 ask: "keep this list
    # intact and report additional queries separately"): the full 22-query
    # TPC-H battery, under the SAME median-of-N + spread protocol as
    # the headline (round-7 verdict ask #3: runs=1 made the battery's
    # round-over-round drift unreadable as signal). No separate warm-up
    # pass — run 1's samples still land in the median like the r2-r7
    # single-run numbers did, keeping the series roughly comparable while
    # the median+spread makes drift interpretable going forward.
    tpch = [n for n in registry if n.startswith("q_tpch_q")] + ["q_sql_tpch_q1"]
    tpch_order = sorted(tpch, key=lambda n: (len(n), n))

    def _timed_passes(tag: str = ""):
        """One full timed battery: `runs` interleaved headline passes,
        then `runs` interleaved TPC-H passes. Re-runnable — the load
        retry calls it a second time on a box that went idle. Also
        returns the battery's external-CPU estimate (ADVICE r16 #4:
        contamination STARTING mid-battery must flag the artifact, and
        pre-battery loadavg can't see it)."""
        cpu_before = _cpu_snapshot()
        battery_t0 = time.time()
        samples: dict[str, list[float]] = {n: [] for n in fns}
        for r in range(runs):
            for name in samples:
                # job-group id for the post-battery stage-time readback
                # (round 19) — set BEFORE the timer starts: thread-local
                # driver metadata, zero work in the timed region
                spark.sparkContext.setJobGroup(
                    f"bench:{tag}{r}:{name}", f"{name} {tag}run{r}"
                )
                t0 = time.time()
                df = fns[name](spark, sf_dir)
                n = df.count()
                dt = round(time.time() - t0, 3)
                samples[name].append(dt)
                print(
                    f"# {name} {tag}run{r}: {n} rows in {dt}s",
                    file=sys.stderr,
                )
        tpch_samples: dict[str, list[float]] = {n: [] for n in tpch_order}
        for r in range(runs):
            for name in tpch_order:
                # distinct prefix: q_sql_tpch_q1 also runs in the headline
                # loop, and a shared group id would merge both arms' stage
                # sets (double-counting its stage time)
                spark.sparkContext.setJobGroup(
                    f"bench-tpch:{tag}{r}:{name}", f"{name} battery {tag}run{r}"
                )
                t0 = time.time()
                n_rows = registry[name].fn(spark, sf_dir).count()
                dt = round(time.time() - t0, 3)
                tpch_samples[name].append(dt)
                print(
                    f"# {name} battery {tag}run{r}: {n_rows} rows in {dt}s",
                    file=sys.stderr,
                )
        spark.sparkContext._jsc.clearJobGroup()
        ext_cores = _external_cpu_cores(
            cpu_before, _cpu_snapshot(), time.time() - battery_t0
        )
        return samples, tpch_samples, ext_cores

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    samples, tpch_samples, ext_cores = _timed_passes()
    first_attempt = None
    retried = False
    if load_contaminated and load_wait > 0:
        # one bounded re-wait + ONE retry (docstring "Load retry"): when
        # the box goes idle the clean run becomes the figure of record;
        # the loaded attempt is recorded alongside, never hidden
        _wait_for_idle(load_gate, load_wait)
        env_retry = _machine_context(spark)
        if (
            env_retry.get("loadavg_1m") is not None
            and env_retry["loadavg_1m"] <= load_gate
        ):
            first_headline = {
                n: round(median(xs), 3)
                for n, xs in samples.items()
                if n in HEADLINE
            }
            first_attempt = {
                "total": round(sum(first_headline.values()), 3),
                "tpch_total": round(
                    sum(median(xs) for xs in tpch_samples.values()), 3
                ),
                "loadavg_1m": load_1m,
                # keep the loaded attempt's environment in the artifact
                # (env_before is about to be replaced by the clean
                # retry's) — never hide the loaded run
                "env_before": env_before,
                "external_cpu_cores": (
                    round(ext_cores, 2) if ext_cores is not None else None
                ),
            }
            print(
                f"# load retry: box idle (loadavg_1m "
                f"{env_retry['loadavg_1m']}) — re-running the timed "
                f"battery; loaded attempt kept as first_attempt "
                f"{first_attempt}",
                file=sys.stderr,
            )
            retried = True
            env_before = env_retry
            load_1m = env_retry["loadavg_1m"]
            load_contaminated = False
            samples, tpch_samples, ext_cores = _timed_passes(tag="retry-")
        else:
            print(
                "# load retry: box still busy after the bounded wait — "
                "keeping the single loaded run (measure-and-say-so)",
                file=sys.stderr,
            )

    load_contaminated_post = ext_cores is not None and ext_cores > load_gate
    if load_contaminated_post:
        print(
            f"# WARNING: external CPU concurrency averaged "
            f"{ext_cores:.2f} cores across the timed battery (gate "
            f"{load_gate}) — co-tenant work ran DURING the figure of "
            f"record",
            file=sys.stderr,
        )

    all_t = {n: round(median(xs), 3) for n, xs in samples.items()}
    all_s = {n: round(max(xs) - min(xs), 3) for n, xs in samples.items()}
    timings = {n: all_t[n] for n in HEADLINE if n in all_t}
    spread = {n: all_s[n] for n in HEADLINE if n in all_s}
    extras = {n: all_t[n] for n in EXTRAS if n in all_t}
    extras_spread = {n: all_s[n] for n in EXTRAS if n in all_s}
    total = round(sum(timings.values()), 3)

    tpch_timings = {n: round(median(xs), 3) for n, xs in tpch_samples.items()}
    tpch_spread = {n: round(max(xs) - min(xs), 3) for n, xs in tpch_samples.items()}

    # round-19 additions (docstring "Round-19 additions") --------------
    # executor stage time per query: median across the figure-of-record
    # battery's runs of the per-run stage-time sum, read back once here
    # (post-battery, untimed)
    final_tag = "retry-" if retried else ""
    group_ms = _stage_times_ms(spark, f"bench:{final_tag}")
    tpch_group_ms = _stage_times_ms(spark, f"bench-tpch:{final_tag}")
    stage_all: dict[str, float] = {}
    # tpch arm first, then the headline/extras arm — q_sql_tpch_q1 runs
    # in both, and stage_all should carry its headline-arm figure (the
    # arm the stdout `queries` medians come from)
    for names, gms, prefix in (
        (list(tpch_samples), tpch_group_ms, "bench-tpch:"),
        (list(samples), group_ms, "bench:"),
    ):
        for name in names:
            per_run = [
                gms[g]
                for r in range(runs)
                if (g := f"{prefix}{final_tag}{r}:{name}") in gms
            ]
            if per_run:
                stage_all[name] = round(median(per_run) / 1000.0, 3)
    stage_sec = {n: stage_all[n] for n in HEADLINE if n in stage_all}
    # degraded-phase self-detection: several headline queries with wide
    # spreads at once is the box oscillating, not the queries
    spread_wide = [
        n
        for n in timings
        if spread.get(n, 0.0) > max(0.3, 0.5 * max(timings[n], 0.001))
    ]
    spread_flagged = len(spread_wide) >= 2
    if spread_flagged:
        print(
            f"# WARNING: wide spreads on {spread_wide} — the box was in a "
            "degraded phase during part of this battery; trust medians "
            "with care",
            file=sys.stderr,
        )

    # FULL record (spreads, extras, battery detail, env annotation) goes to
    # stderr; stdout carries ONE compact line. Round-9 lesson (VERDICT r9
    # "what's wrong" #1): the driver captures a bounded tail of stdout, and
    # the r9 line — grown past ~3.5 KB with env/battery fields — fell out of
    # the capture window, so BENCH_r09.json recorded "parsed": null. The
    # final stdout line must stay well under ~1.5 KB: headline medians +
    # totals only, all detail relegated to stderr (still in the transcript).
    detail = {
        "metric": "headline_queries_detail",
        "spread": spread,
        "extras": extras,
        "extras_spread": extras_spread,
        # round-19 additions: executor stage time for every measured
        # query (headline + extras + TPC-H), the cold first run of every
        # measured query, and the degraded-phase flag detail
        "stage_sec": stage_all,
        "cold_first_run": cold_first,
        "spread_flagged": spread_flagged,
        "spread_wide_queries": spread_wide,
        "tpch_battery": {
            "total": round(sum(tpch_timings.values()), 3),
            "queries": tpch_timings,
            "spread": tpch_spread,
            "runs": runs,
        },
        "env_before": env_before,
        "env_after": _machine_context(spark),
        "load_contaminated": load_contaminated,
        "load_gate": load_gate,
        "load_retry": {"retried": retried, "first_attempt": first_attempt},
        # post-run contamination (ADVICE r16 #4): co-tenant CPU measured
        # ACROSS the timed battery of record, not just sampled before it
        # — loadavg-after can't serve here because our own battery
        # saturates the box (see _cpu_snapshot)
        "external_cpu": {
            "cores_avg": round(ext_cores, 2) if ext_cores is not None else None,
            "contaminated_post": load_contaminated_post,
            "gate": load_gate,
        },
    }
    print(json.dumps(detail), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "warmup": 1,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "tpch_total": detail["tpch_battery"]["total"],
                "load_contaminated": load_contaminated,
                "load_contaminated_post": load_contaminated_post,
                "loadavg_1m": load_1m,
                # round-19 additions (docstring): executor stage time per
                # headline query, cold first runs of the persist-backed
                # dedup queries, degraded-phase flag
                "stage_sec": stage_sec,
                "cold": {
                    n: cold_first[n]
                    for n in ("q_dedup_minhash_lsh", "q_dedup_simhash_pairs")
                    if n in cold_first
                },
                "spread_flagged": spread_flagged,
                **(
                    {"retried_after_load": True, "first_attempt": first_attempt}
                    if retried
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
