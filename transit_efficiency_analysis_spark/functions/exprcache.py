"""Per-process memoization of CONSTANT Column expression trees.

PySpark classic builds every ``Column`` through py4j round-trips (one JVM
call per operator), so a large constant expression tree — 64 aggregate
columns, per-plane sign arrays, CASE chains — costs real driver wall time
on EVERY query invocation: measured round 18 on local[32],
``q_dedup_simhash_pairs`` spent 2.0-3.3 s per call just CONSTRUCTING its
plan (vs 0.5-0.7 s executing it), ``lsh_topk`` ~1.3 s, the delay views
~0.7 s. The trees are pure functions of small static parameters (plane
count, dims, band count, a column-name prefix), so they are built once per
process and reused.

Safety: a ``Column`` wraps an immutable JVM expression tree; Catalyst
re-analyzes it per plan (name resolution happens at analysis, not at
construction), so the same object can appear in any number of plans and
sessions of one process. ``.alias()``/operators on a memoized Column
return NEW Columns and never mutate the cached one. Nothing here caches
data or results — construction only.

Callers must stay lazy (no SparkContext is needed to build Columns, but
module-level construction is still banned by the house rule — a memoized
builder invoked inside the query function is the pattern).
"""

from __future__ import annotations

import functools


def column_memo(fn):
    """``functools.lru_cache`` for Column-tree builders keyed on their
    (hashable, small-domain) parameters. Builders should return a Column,
    a tuple of Columns, or a dict treated as read-only by callers."""
    return functools.lru_cache(maxsize=None)(fn)
