"""STAGED round-15 oracle mirrors for the IVF ``assign="fold"`` flip.

NOT imported by the demo registry (absent from ``_DEMO_MODULES``): round
14's correctness window is fully forced (docs/ROUND13.md), so the three
IVF demos keep ``assign="window"`` and their live window-form oracles
untouched this round. This module stages everything round 15 needs so
the flip is purely mechanical — flip three demo defaults to
``assign="fold"``, swap in these three SQL strings, and give the demos
their re-verification slots (VERDICT r13 ask #2).

What the fold arithmetic changes vs the live window-form oracles
(operators/similarity.py ``_fold_topk_cells`` / ``_argmax_cell``):

1. **Score expression**: raw ``dot(v, cv/cn)`` against the
   PRE-NORMALIZED centroid instead of cosine ``dot(v, cv)/(vn*cn)``.
   Order-equal mathematics under DIFFERENT floating-point rounding —
   which is exactly why the oracle is mirrored to the fold's formula
   instead of relying on equivalence (the flat-SemDeDup discipline,
   r13; a tie-corpus demonstrated the divergence, docs/ROUND13.md §
   round-close review).
2. **Zero-norm centroids are never probed**: the fold filters NULL
   scores BEFORE the rank, where the window form ranks them last (and
   so probes them once n_probe exceeds the non-NULL cell count). The
   mirror filters with ``WHERE fscore IS NOT NULL``.
3. **All-scores-NULL fallback**: when EVERY centroid is zero-norm the
   fold probes the ``n_probe`` smallest cell ids; the mirror keeps all
   rows for such a vector (``n_scorable = 0``), where NULL-tied DESC
   order + the cell ASC tie-break reproduces exactly that slice.
4. **Zero-norm-centroid oracle crash (ADVICE r13)**: DuckDB evaluates
   ``x / 0.0`` (double) to NULL and ``list_inner_product`` RAISES on
   NULL elements, so the unguarded ``list_transform(cv, x -> x/cn)``
   pattern (live in ``_IVF_LLOYD_SQL``'s members CTE and
   ``_semantic_dedup_sql``'s asg CTE since r13) would crash on a
   zero-norm centroid where the Spark fold skips it. Every staged
   score here carries the ``CASE WHEN cn = 0 THEN NULL`` guard; NULLS
   LAST (DuckDB's default null order) then mirrors the fold's
   strict-> skip, and an all-NULL argmax falls to the smallest cell —
   the fold's INIT fallback. The live oracles keep the documented
   limitation until their own re-verification slots.

The encode/ADC CTEs of the PQ mirror are UNCHANGED from the live
oracle: the fold's ``_l2sq_decimal`` is an exact DECIMAL(18,9)-per-term
sum, order-independent and bit-equal to the join form's
``SUM(sqdiff)``, so those stages cannot drift (pinned in
tests/test_round13_fixes.py). Only the coarse-assignment ``ranked``
relation changes.

Parity gate: tests/test_staged_r15_ivf_fold.py runs each staged oracle
against the ``assign="fold"`` Spark output through the same
compare/type gate as tools/verify_local.py (bit-match for the DECIMAL
paths, exact-first floats elsewhere).
"""

from __future__ import annotations

# Identical text to the live seeds/cent/base CTEs in
# demo/similarity.py's _IVF_ASSIGN_SQL — these stages don't change at
# the flip; only the `ranked` relation does.
_SEEDS_CENT_BASE_SQL = """
    seeds AS (
        SELECT vec_id AS sid, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT 8
    ),
    cent AS (
        SELECT row_number() OVER (ORDER BY md5(CAST(sid AS VARCHAR)), sid) - 1 AS cell,
               cv, sqrt(list_inner_product(cv, cv)) AS cn
        FROM seeds
    ),
    base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS vn
        FROM embeddings
    )
"""


def _ranked_fold_sql(cent_rel: str, out_name: str) -> str:
    """The `_fold_topk_cells` mirror: raw dot against the pre-normalized
    centroid (zero-norm guarded to NULL), NULL scores filtered before
    the rank unless the vector has NO scorable cell (then all rows stay
    and the cell ASC tie-break reproduces the fold's first-n_probe-cells
    fallback). Consumers read ``crank`` exactly like the window form."""
    return f"""
    {out_name} AS (
        SELECT vec_id, v, vn, cell,
               row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY fscore DESC, cell
               ) AS crank
        FROM (
            SELECT b.vec_id, b.v, b.vn, c.cell,
                   CASE WHEN c.cn = 0 THEN NULL
                        ELSE list_inner_product(
                                 b.v, list_transform(c.cv, x -> x / c.cn))
                   END AS fscore,
                   count(CASE WHEN c.cn = 0 THEN NULL ELSE 1 END)
                       OVER (PARTITION BY b.vec_id) AS n_scorable
            FROM base b CROSS JOIN {cent_rel} c
        )
        WHERE fscore IS NOT NULL OR n_scorable = 0
    )"""


# The probe/top-k tail is byte-identical to the live demos' (the flip
# does not touch the exact-cosine candidate scoring).
_TOPK_TAIL_SQL = """
    SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
               list_inner_product(q.v, d.v) / (q.vn * d.vn) AS cosine_sim,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_inner_product(q.v, d.v) / (q.vn * d.vn) DESC,
                            d.vec_id ASC
               ) AS rank
        FROM (SELECT * FROM {ranked} WHERE crank <= 2) q
        JOIN (SELECT * FROM {ranked} WHERE crank = 1) d
          ON q.cell = d.cell AND q.vec_id != d.vec_id
    )
    WHERE rank <= 3
"""

# --- q_sim_ivf_topk (round-15 fold oracle) --------------------------
Q_SIM_IVF_TOPK_FOLD_SQL = (
    "    WITH "
    + _SEEDS_CENT_BASE_SQL.strip()
    + ","
    + _ranked_fold_sql("cent", "ranked")
    + _TOPK_TAIL_SQL.format(ranked="ranked")
)

# --- q_sim_ivf_lloyd_topk (round-15 fold oracle) --------------------
# The Lloyd round itself: the members CTE mirrors _fold_assign (as the
# live r13 oracle already does) WITH the zero-norm guard; the
# dims/refined/cent1 refinement is byte-identical to the live
# _IVF_LLOYD_SQL; ranked1 becomes the fold mirror over cent1.
_LLOYD_REFINE_SQL = """
    members AS (
        SELECT cell, v FROM (
            SELECT b.v, c.cell,
                   row_number() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY CASE WHEN c.cn = 0 THEN NULL
                                     ELSE list_inner_product(
                                              b.v,
                                              list_transform(c.cv, x -> x / c.cn))
                                END DESC, c.cell
                   ) AS lrank
            FROM base b CROSS JOIN cent c
        ) WHERE lrank = 1
    ),
    dims AS (
        SELECT cell, pos,
               CAST(sum(CAST(v[pos] AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS m
        FROM members CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos)
        GROUP BY cell, pos
    ),
    refined AS (SELECT cell, list(m ORDER BY pos) AS rcv FROM dims GROUP BY cell),
    cent1 AS (
        SELECT c.cell, coalesce(r.rcv, c.cv) AS cv,
               sqrt(list_inner_product(coalesce(r.rcv, c.cv), coalesce(r.rcv, c.cv))) AS cn
        FROM cent c LEFT JOIN refined r USING (cell)
    )
"""

Q_SIM_IVF_LLOYD_TOPK_FOLD_SQL = (
    "    WITH "
    + _SEEDS_CENT_BASE_SQL.strip()
    + ","
    + _LLOYD_REFINE_SQL.rstrip()
    + ","
    + _ranked_fold_sql("cent1", "ranked1")
    + _TOPK_TAIL_SQL.format(ranked="ranked1")
)

# --- q_sim_ivf_pq_topk (round-15 fold oracle) -----------------------
# rdim/codeids/codedim/enc/qrdim/adc/scored are byte-identical to the
# live _IVF_PQ_SQL (exact DECIMAL sums — the fold's _l2sq_decimal
# bit-matches them); only `ranked` swaps to the fold mirror.
_PQ_TAIL_SQL = """,
    rdim AS (
        SELECT a.vec_id, a.cell, pos, a.v[pos] - c.cv[pos] AS rx,
               CAST((pos - 1) // 16 AS INTEGER) AS s
        FROM (SELECT vec_id, cell, v FROM ranked WHERE crank = 1) a
        JOIN cent c USING (cell)
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos)
    ),
    codeids AS (
        SELECT vec_id AS sid2,
               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                   AS code
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT 16
    ),
    codedim AS (
        SELECT s, code, pos, rx AS cx FROM rdim JOIN codeids ON vec_id = sid2
    ),
    enc AS (
        SELECT vec_id, cell, s, code FROM (
            SELECT r.vec_id, r.cell, r.s, c.code,
                   row_number() OVER (
                       PARTITION BY r.vec_id, r.s
                       ORDER BY sum(CAST((r.rx - c.cx) * (r.rx - c.cx) AS DECIMAL(18,9))),
                                c.code
                   ) AS rn
            FROM rdim r JOIN codedim c ON r.s = c.s AND r.pos = c.pos
            GROUP BY r.vec_id, r.cell, r.s, c.code
        ) WHERE rn = 1
    ),
    qrdim AS (
        SELECT q.vec_id AS query_id, q.cell AS qcell, pos,
               q.v[pos] - c.cv[pos] AS qrx,
               CAST((pos - 1) // 16 AS INTEGER) AS s
        FROM (SELECT vec_id, cell, v FROM ranked WHERE crank <= 2) q
        JOIN cent c USING (cell)
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos)
    ),
    adc AS (
        SELECT query_id, qcell, qr.s, c.code,
               sum(CAST((qr.qrx - c.cx) * (qr.qrx - c.cx) AS DECIMAL(18,9))) AS td
        FROM qrdim qr JOIN codedim c ON qr.s = c.s AND qr.pos = c.pos
        GROUP BY query_id, qcell, qr.s, c.code
    ),
    scored AS (
        SELECT a.query_id, e.vec_id AS neighbor_id, sum(a.td) AS d_exact
        FROM enc e
        JOIN adc a ON a.qcell = e.cell AND a.s = e.s AND a.code = e.code
                  AND a.query_id != e.vec_id
        GROUP BY a.query_id, e.vec_id
    )
    SELECT query_id, neighbor_id,
           CAST(CAST(d_exact AS DECIMAL(18,9)) AS DOUBLE) AS approx_l2sq,
           CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT query_id, neighbor_id, d_exact,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d_exact ASC, neighbor_id ASC) AS rank
        FROM scored
    )
    WHERE rank <= 3
"""

Q_SIM_IVF_PQ_TOPK_FOLD_SQL = (
    "    WITH "
    + _SEEDS_CENT_BASE_SQL.strip()
    + ","
    + _ranked_fold_sql("cent", "ranked")
    + _PQ_TAIL_SQL
)

#: round-15 flip table: demo name -> (staged oracle, fold kwargs for the
#: operator call). The flip swaps each demo's sql= to the staged string
#: and its operator call to assign="fold"; the parity test drives this
#: exact table so what is tested is what flips.
STAGED_FLIPS: dict[str, str] = {
    "q_sim_ivf_topk": Q_SIM_IVF_TOPK_FOLD_SQL,
    "q_sim_ivf_lloyd_topk": Q_SIM_IVF_LLOYD_TOPK_FOLD_SQL,
    "q_sim_ivf_pq_topk": Q_SIM_IVF_PQ_TOPK_FOLD_SQL,
}


# --- STAGED zero-norm oracle guards (ADVICE r13 #1; r15 slots 4-5) ----
#
# The live q_dedup_semantic / q_dedup_semantic_hier oracles carry the
# unguarded `list_transform(cv, x -> x / cn)` pattern: a zero-norm
# centroid would crash DuckDB (x/0.0 -> NULL elements,
# list_inner_product raises) where the Spark fold skips it. Unreachable
# on the testdata, but the guard belongs in the oracle; these staged
# variants are the LIVE strings with exactly the guarded substitutions
# applied (asserted counts — a drifted live string fails loudly at
# import), so the r15 swap is again purely mechanical. The parity gate
# (tests/test_staged_r15_ivf_fold.py) pins the guards output-neutral on
# the gate corpus: guarded and live SQL produce identical DuckDB rows.


def _subst(sql: str, pattern: str, repl: str, n: int, flags: int = 0) -> str:
    import re

    out, count = re.subn(pattern, repl, sql, flags=flags)
    assert count == n, (
        f"staged guard drift: expected {n} matches of {pattern!r}, "
        f"found {count} — the live oracle changed shape; re-derive"
    )
    return out


def _staged_semantic_dedup_guarded() -> str:
    from transit_efficiency_analysis_spark.demo.dedup import (
        _semantic_dedup_sql,
    )

    # the members CTE (via _IVF_LLOYD_SQL) and the asg CTE each score
    # b.v against the pre-normalized c.cv/c.cn — guard both
    return _subst(
        _semantic_dedup_sql(),
        r"list_inner_product\(\s*b\.v, list_transform\(c\.cv, x -> x / c\.cn\)\s*\)",
        "CASE WHEN c.cn = 0 THEN NULL ELSE list_inner_product("
        "b.v, list_transform(c.cv, x -> x / c.cn)) END",
        2,
    )


def _staged_semantic_hier_guarded() -> str:
    from transit_efficiency_analysis_spark.demo.dedup import (
        _SEMANTIC_HIER_SQL,
    )

    out = _subst(
        _SEMANTIC_HIER_SQL,
        r"list_transform\(ccv, x -> x / ccn\) AS ccvu",
        "CASE WHEN ccn = 0 THEN NULL ELSE "
        "list_transform(ccv, x -> x / ccn) END AS ccvu",
        1,
    )
    return _subst(
        out,
        r"list_transform\(cv, x -> x / cn\) AS cvu",
        "CASE WHEN cn = 0 THEN NULL ELSE "
        "list_transform(cv, x -> x / cn) END AS cvu",
        1,
    )


def staged_oracle_guards() -> dict[str, str]:
    """r15 slots 4-5: demo name -> zero-norm-guarded oracle string
    (callable, not constant, so the substitution assertions run at use
    time against the CURRENT live strings)."""
    return {
        "q_dedup_semantic": _staged_semantic_dedup_guarded(),
        "q_dedup_semantic_hier": _staged_semantic_hier_guarded(),
    }
