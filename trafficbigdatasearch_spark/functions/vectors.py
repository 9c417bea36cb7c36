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
    """Cosine similarity from quantized vectors — deterministic IEEE result."""
    return dot(a, b).cast("double") / (
        F.sqrt(sq_norm(a).cast("double")) * F.sqrt(sq_norm(b).cast("double"))
    )


def hyperplane_weight(dim_idx: Column, plane_idx: Column) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1000, 1000]:
    derived from md5 of "plane_dim", so Spark and any SQL oracle generate the
    *same* hyperplanes with no shipped state."""
    key = F.concat_ws("_", plane_idx.cast("string"), dim_idx.cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 7), 16, 10).cast("bigint")
    return (h % 2001) - 1000


def simhash_bucket(qvec: Column, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: ``n_planes`` sign bits packed into a
    bigint.  Vectors with high cosine similarity collide with high
    probability; used to block near-dup / ANN candidate generation."""
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                qvec,
                F.sequence(F.lit(0), F.size(qvec) - 1),
                lambda x, i: x * hyperplane_weight(i, F.lit(p)),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(2**p).cast("bigint")).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
