"""Vector column functions over ``array<float>`` embeddings.

Strategy for cross-engine-deterministic similarity (the driver hash-compares
Spark vs DuckDB values): QUANTIZE first.  ``round(x * 10000)`` puts every
component on an integer lattice; integer dot products and squared norms are
then exact in both engines (magnitudes ~64 * (2e4)^2 ≈ 2.6e10 « 2^53), and
the final ``dot / (sqrt(n1)*sqrt(n2))`` is a fixed sequence of
correctly-rounded IEEE ops — bit-identical everywhere.  Quantization error
(1e-4 per component) is far below any useful similarity threshold, and the
same trick is a standard memory/bandwidth optimization at 100 TB scale.

All expressions are Catalyst built-ins (``transform``/``zip_with``/
``aggregate``) — JVM-side, no Python in the scan path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 10000


def quantize(vec: Column) -> Column:
    """array<float> -> array<bigint> on the 1e-4 lattice."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * QUANT).cast("bigint"))


def dot(a: Column, b: Column) -> Column:
    """Integer dot product of two quantized vectors (exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return dot(a, a)


def cosine_from_quantized(a: Column, b: Column) -> Column:
    """Cosine similarity from quantized vectors — deterministic IEEE result.
    Zero-norm vectors score NULL (try_divide) instead of raising under the
    ANSI-on default of Spark 4."""
    return F.try_divide(
        dot(a, b).cast("double"),
        F.sqrt(sq_norm(a).cast("double")) * F.sqrt(sq_norm(b).cast("double")),
    )


def cosine_from_parts(d: Column, na: Column, nb: Column) -> Column:
    """Cosine from a precomputed integer dot product and squared norms.

    Identical value to :func:`cosine_from_quantized` (the integer inputs are
    exact either way), but lets operators compute each vector's norm ONCE per
    vector instead of once per compared pair — the norm fold is an
    interpreted higher-order expression, so hoisting it out of the pair loop
    is a ~3x win on the scoring stage.  Zero-norm vectors score NULL
    (try_divide) instead of raising under Spark 4's ANSI-on default.
    """
    return F.try_divide(
        d.cast("double"), F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    )


def hyperplane_weights(n_planes: int, dims: int) -> list[list[int]]:
    """Deterministic pseudo-random hyperplane weights in [-1000, 1000],
    derived from md5 of "plane_dim" — Spark embeds them as literals (computed
    once driver-side), while a SQL oracle regenerates the identical values
    with its own md5; no shipped state, no per-row hashing."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:7], 16) % 2001) - 1000
            for d in range(dims)
        ]
        for p in range(n_planes)
    ]


def simhash_bucket(qvec: Column, n_planes: int = 8, dims: int = 64) -> Column:
    """Random-hyperplane LSH bucket id: ``n_planes`` sign bits packed into a
    bigint.  Vectors with high cosine similarity collide with high
    probability; used to block near-dup / ANN candidate generation.
    ``dims`` must match the embedding dimensionality (weights are literal
    arrays — zero per-row hash cost)."""
    ws = hyperplane_weights(n_planes, dims)
    out = F.lit(0).cast("bigint")
    # dims mismatch would NULL every projection (zip_with pads) and silently
    # collapse all rows into bucket 0 — fail fast instead
    guard = F.when(
        F.size(qvec) == F.lit(dims), F.lit(0).cast("bigint")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"simhash_bucket: expected {dims}-dim vector, got "),
                F.size(qvec).cast("string"),
            )
        ).cast("bigint")
    )
    out = out + guard
    for p, row in enumerate(ws):
        proj = F.aggregate(
            F.zip_with(
                qvec,
                F.array(*[F.lit(w) for w in row]).cast("array<bigint>"),
                lambda x, w: x * w,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        out = out + F.when(proj >= 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out
