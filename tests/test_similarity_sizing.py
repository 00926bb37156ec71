"""Corpus-size-derived ANN parameters (derive_planes / target sizes)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.similarity import (
    derive_planes,
    ivf_topk,
    lsh_bucket_assignments,
    lsh_topk,
)


def test_derive_planes_tracks_corpus_growth():
    # 2^p buckets hold n/target: growing n by 2 adds one plane
    assert derive_planes(1_000, 100) == 4  # 1000/100=10 -> ceil(log2)=4
    assert derive_planes(2_000, 100) == 5
    assert derive_planes(1_000_000_000, 1_000) == 20
    # clamps
    assert derive_planes(10, 100) == 1
    assert derive_planes(2**40, 1) == 30


def _vecs(spark, n, dims=8, seed=3):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dims)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_target_bucket_size_holds_mean_occupancy(spark):
    small, big = _vecs(spark, 64), _vecs(spark, 256)

    def mean_occ(df):
        asg = lsh_bucket_assignments(df, planes=None, dims=8, target_bucket_size=16)
        counts = [r["n"] for r in asg.groupBy("bucket").agg(F.count("*").alias("n")).collect()]
        return sum(counts) / len(counts)

    occ_small, occ_big = mean_occ(small), mean_occ(big)
    # 4x corpus, 2 more planes: occupancy stays the same order, not 4x
    assert occ_big < occ_small * 2.5


def test_explicit_params_still_required(spark):
    df = _vecs(spark, 8)
    with pytest.raises(ValueError):
        lsh_topk(df, planes=None, dims=8)
    with pytest.raises(ValueError):
        ivf_topk(df, n_centroids=None)


def test_lloyd_round_improves_recall(spark):
    """One Lloyd refinement over the hash-seeded centroids raises IVF
    recall vs brute force on a clustered corpus (8 Gaussian clusters,
    n_probe=1 so cell quality is what decides recall)."""
    from transit_efficiency_analysis_spark.operators.similarity import brute_force_topk

    rng = random.Random(7)
    dims, nclus, per = 6, 8, 10
    centers = [[rng.gauss(0, 1) for _ in range(dims)] for _ in range(nclus)]
    rows = []
    i = 0
    for c in centers:
        for _ in range(per):
            rows.append((i, [x + rng.gauss(0, 0.4) for x in c]))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(df, df, k=3).collect()}

    def recall(lr):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(df, n_centroids=8, n_probe=1, k=3, lloyd_rounds=lr).collect()
        }
        return len(got & truth) / len(truth)

    r0, r1 = recall(0), recall(1)
    assert r1 > r0  # measured 0.69 -> 0.81 on this fixture
    assert r1 > 0.75


def test_multiprobe_recall_superset_of_plain_lsh(spark):
    """Multi-probe candidates strictly contain the single-bucket
    candidates (home bucket is always probed), so per-query recall vs
    brute force can only rise; verify both the containment of candidate
    coverage and a recall improvement on a fixture where buckets split
    near neighbors."""
    from transit_efficiency_analysis_spark.operators.similarity import (
        brute_force_topk,
        multiprobe_lsh_topk,
    )

    rng = random.Random(23)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(df, df, k=3).collect()}
    plain = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(df, planes=4, dims=16, k=3).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in multiprobe_lsh_topk(df, planes=4, dims=16, k=3).collect()
    }
    r_plain = len(plain & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi >= r_plain
    # every query answered by plain LSH is still answered
    assert {q for q, _ in plain} <= {q for q, _ in multi}


def test_target_cell_size_derives_centroids(spark):
    df = _vecs(spark, 60)
    out = ivf_topk(df, n_centroids=None, target_cell_size=10, n_probe=1, k=2)
    # 60/10 = 6 cells; result is a well-formed topk relation
    rows = out.collect()
    assert rows
    assert all(r["rank"] <= 2 for r in rows)


def test_ivf_pq_recall_and_code_shape(spark):
    """IVF-PQ with ADC scoring finds most true neighbors on a clustered
    corpus (residuals are small, so 16 codes per subspace represent them
    well), and the emitted ranking is a valid dense top-k."""
    from transit_efficiency_analysis_spark.operators.similarity import (
        brute_force_topk,
        ivf_pq_topk,
    )

    rng = random.Random(11)
    dims, nclus, per = 8, 4, 15
    centers = [[rng.gauss(0, 1) for _ in range(dims)] for _ in range(nclus)]
    rows = []
    i = 0
    for c in centers:
        for _ in range(per):
            rows.append((i, [x + rng.gauss(0, 0.3) for x in c]))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(df, df, k=3).collect()}

    got_rows = ivf_pq_topk(df, n_centroids=4, m=4, ks=16, n_probe=2, k=3).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    # every query answered with a dense 1..3 ranking
    per_q = {}
    for r in got_rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())
    assert len(per_q) == len(rows)
    # ADC is approximate: recall well above chance (chance ~3/59 ~ 0.05)
    recall = len(got & truth) / len(truth)
    assert recall > 0.5, recall


def test_n_rows_skips_count_action(spark):
    """The cached-statistics path: passing n_rows must produce the same
    bucket assignments as letting the operator count, without running
    any job at plan-construction time."""
    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.operators.similarity import (
        lsh_bucket_assignments,
    )

    df = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 13) - 6.0 for d in range(8)]) for i in range(256)],
        "vec_id long, embedding array<double>",
    )
    counted = lsh_bucket_assignments(
        df, dims=8, planes=None, target_bucket_size=16
    ).collect()
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    stats = lsh_bucket_assignments(
        df, dims=8, planes=None, target_bucket_size=16, n_rows=256
    )  # no action yet — sizing must not have launched a job
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    assert jobs_after == jobs_before
    assert sorted(map(tuple, stats.collect())) == sorted(map(tuple, counted))


def test_multiprobe_derived_planes_matches_fixed(spark):
    """multiprobe_lsh_topk's corpus-sizing mode (r9: same scale path as
    lsh_topk) must produce exactly the fixed-planes result at the derived
    plane count, via both the count() and the n_rows sizing paths."""
    from transit_efficiency_analysis_spark.operators.similarity import (
        multiprobe_lsh_topk,
    )

    df = _vecs(spark, 64)
    p = derive_planes(64, 16)
    fixed = sorted(map(tuple, multiprobe_lsh_topk(df, planes=p, dims=8).collect()))
    derived = sorted(
        map(
            tuple,
            multiprobe_lsh_topk(
                df, planes=None, dims=8, target_bucket_size=16
            ).collect(),
        )
    )
    stats = sorted(
        map(
            tuple,
            multiprobe_lsh_topk(
                df, planes=None, dims=8, target_bucket_size=16, n_rows=64
            ).collect(),
        )
    )
    assert derived == fixed
    assert stats == fixed
    with pytest.raises(ValueError):
        multiprobe_lsh_topk(df, planes=None, dims=8)


def test_fixed_planes_candidate_volume_quadratic_derived_linear(spark):
    """The measured 64x cliff (docs/SCALE.md §64x stretch), pinned at toy
    scale: candidate volume (sum of bucket_size^2 over buckets) grows
    ~quadratically under a FIXED plane count when the corpus grows 4x,
    but ~linearly when planes are derived from the corpus size."""

    def volume(df, n, *, fixed_planes=None):
        if fixed_planes is not None:
            asg = lsh_bucket_assignments(df, planes=fixed_planes, dims=8)
        else:
            asg = lsh_bucket_assignments(
                df, planes=None, dims=8, target_bucket_size=16, n_rows=n
            )
        row = (
            asg.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.col("n") * F.col("n")).alias("v"))
            .first()
        )
        return row["v"]

    small, big = _vecs(spark, 64), _vecs(spark, 256)
    p = derive_planes(64, 16)  # both modes identical at the small corpus
    ratio_fixed = volume(big, 256, fixed_planes=p) / volume(small, 64, fixed_planes=p)
    ratio_derived = volume(big, 256) / volume(small, 64)
    # 4x corpus: fixed planes square the per-bucket occupancy (~16x
    # volume); derived planes add 2 planes and hold occupancy (~4x)
    assert ratio_fixed > 9, ratio_fixed
    assert ratio_derived < ratio_fixed / 2, (ratio_derived, ratio_fixed)
