"""Registry-wide schema guard: every demo must build a plan and emit
SCALAR columns only.

The driver's pandas canonicalizer dies on array/map/struct output
(round-4: ``q_approx_quantiles`` returned ``array<double>`` and crashed
even the rows-only check) — so non-scalar output is a correctness-gate
outage, not a style issue. Plan construction alone (no execution) keeps
this sweep fast.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

from transit_efficiency_analysis_spark.demo import load_registry


def test_every_demo_emits_scalar_columns_only(spark, sf_dir):
    offenders = []
    checked = 0
    for name, d in load_registry().items():
        schema = d.fn(spark, sf_dir).schema  # plan build; raises on error
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
        checked += 1
    assert not offenders, f"non-scalar demo output columns: {offenders}"
    assert checked >= 140  # the sweep must cover the whole registry
