"""Vector column expressions for embedding similarity operators.

Everything is a higher-order array expression evaluated on the JVM — no
Python UDFs, no driver-side collection of vectors. The fold order of
``F.aggregate`` (sequential left fold) matches DuckDB's
``list_inner_product`` loop, so dot products are bit-identical across
engines (verified empirically in the oracle harness).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """array<float> → array<double> (exact widening)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Inner product via zip_with + sequential left fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity: dot(a,b) / (|a| * |b|)."""
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_sign_bucket(vec: Column, planes: int, dims: int) -> Column:
    """Random-hyperplane LSH bucket id (sign-LSH / SRP).

    Hyperplane p has component ±1 at dim d, the sign drawn deterministically
    from md5(f"{p}_{d}") (first hex digit >= '8' → +1). The projection is
    summed in DECIMAL(28,9) — exact, order-independent — so the *sign* (all
    that matters for the bucket) is bit-stable across engines and partitions;
    a double sum could flip sign near zero under reordering.
    """
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[_plane_component(p, d) for d in range(dims)]),
                lambda x, s: x.cast("decimal(18,9)") * s,
            ),
            F.lit(0).cast("decimal(28,9)"),
            # re-cast each step: decimal addition widens (28,9)+(21,9)→(29,9)
            # and aggregate() requires the accumulator type to stay fixed;
            # values are |x|<~100 so (28,9) never overflows
            lambda acc, x: (acc + x).cast("decimal(28,9)"),
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def _plane_component(p: int, d: int) -> Column:
    import hashlib

    # deterministic ±1, precomputed driver-side (constants fold into codegen)
    h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()
    return F.lit(1 if h[0] >= "8" else -1).cast("decimal(2,0)")


def plane_sign(p: int, d: int) -> int:
    """The ±1 component of hyperplane ``p`` at dim ``d`` (shared with SQL
    oracle generation)."""
    import hashlib

    h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()
    return 1 if h[0] >= "8" else -1
