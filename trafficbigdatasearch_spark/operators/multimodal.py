"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Design (north-star requirement): media travels as ``binary`` payload columns
with typed metadata alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the Python
boundary is crossed once per batch, not per row.  The decode kernels
themselves are STUBBED here (no image/audio libs in this container — clearly
marked), but the Spark-side contract is real and tested: schemas, batch
iteration, partition parallelism, and deterministic fake features that an
SQL oracle can reproduce.

At 100 TB: payloads dominate row size — keep them in their own parquet
column (lazy column pruning skips them unless touched), repartition by
byte-size budget before Python stages, and never collect payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema of a multimodal asset table: payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("meta", StringType()),  # JSON sidecar
    ]
)

FEATURE_DIM = 4


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic asset table from ``documents`` (the container has
    no real media): payload = utf-8 bytes of the text, media_type round-robins
    by id.  Gives the binary-column pipeline real bytes to move."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta"),
    )


def _decode_stub(payload: bytes, media_type: str) -> list[float]:
    """STUB decode kernel. A real deployment plugs Pillow/torchaudio/PyAV in
    here; the container lacks them, so this produces a deterministic fake
    feature vector derived from the byte stream (same formula as the SQL
    oracle): [n_bytes, first_byte, last_byte, byte_sum % 997]."""
    n = len(payload)
    if n == 0:
        return [0.0] * FEATURE_DIM
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
    ]


def extract_features(assets: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction: (asset_id, media_type, n_bytes,
    features array<double>).

    ``mapInPandas`` contract: one Python worker per partition, an iterator of
    Arrow record batches in, one out — payload bytes never hit the driver.
    """
    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("media_type", StringType()),
            StructField("n_bytes", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, out_schema)


def extract_features_arrow(assets: DataFrame) -> DataFrame:
    """The ``mapInArrow`` twin of :func:`extract_features`: identical output,
    but the Python side receives raw ``pyarrow.RecordBatch``es — no
    Arrow->pandas materialization of the binary payload column.  For
    media-scale payloads (MBs per cell) the pandas conversion is real
    memory traffic (object boxing of every payload); operating on the
    Arrow buffers directly keeps the per-batch footprint at the Arrow
    buffer itself.  Same worker/batch topology as mapInPandas, so
    everything said there about partitioning holds unchanged."""
    import pyarrow as pa

    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("media_type", StringType()),
            StructField("n_bytes", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def run(batches):
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index("asset_id"))
            mts = batch.column(batch.schema.get_field_index("media_type"))
            pays = batch.column(batch.schema.get_field_index("payload"))
            n_bytes, feats = [], []
            for p, m in zip(pays, mts):
                b = p.as_py() or b""
                n_bytes.append(len(b))
                feats.append(_decode_stub(b, m.as_py()))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    mts,
                    pa.array(n_bytes, type=pa.int64()),
                    pa.array(feats, type=pa.list_(pa.float64())),
                ],
                names=["asset_id", "media_type", "n_bytes", "features"],
            )

    return assets.mapInArrow(run, out_schema)


def _pillow_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def default_image_resizer(payload: bytes, target: tuple[int, int]) -> bytes:
    """Default resize kernel hook: Pillow (decode -> bilinear resize ->
    re-encode PNG) when the workers have it, else the module's documented
    loud guard — same pluggable-hook contract as
    :func:`default_image_decoder`."""
    if not _pillow_available():
        raise NotImplementedError(
            "resize requires an image decoder (Pillow); not available "
            "in this container — install Pillow, or inject any "
            "resizer(payload, target) -> bytes via the `resizer=` hook"
        )
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).resize(target)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def resize_stub(
    assets: DataFrame,
    target: tuple[int, int] = (224, 224),
    resizer=None,
) -> DataFrame:
    """Image-resize stage with a PLUGGABLE kernel (the phash_decoded
    `decoder=` pattern): ``resizer`` is any callable
    ``(payload_bytes, target) -> resized_payload_bytes`` invoked per image
    row inside the Arrow batch loop; the default is
    :func:`default_image_resizer` — Pillow when present, the documented
    loud NotImplementedError otherwise — so deployment is a zero-edit
    drop-in while the Spark-side plumbing (schema, Arrow batching,
    partitioning, pass-through of non-image rows) stays identical and
    tested either way."""

    rz = resizer if resizer is not None else default_image_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, m in zip(pdf["payload"], pdf["media_type"]):
                if m != "image":
                    out.append(p)
                    continue
                out.append(rz(bytes(p), target))
            pdf = pdf.copy()
            pdf["payload"] = out
            yield pdf

    return assets.mapInPandas(run, ASSET_SCHEMA)


def frame_sample_stub(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling placeholder: contract = one output row per kept
    frame (asset_id, frame_idx, payload). Deterministic fake: emits
    ``len(payload) // (every_n * 100) + 1`` pseudo-frames per video asset so
    the fan-out shape (explode-like row multiplication in Python) is tested.
    """
    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for aid, p, m in zip(pdf["asset_id"], pdf["payload"], pdf["media_type"]):
                if m != "video":
                    continue
                n = len(bytes(p))
                for i in range(n // (every_n * 100) + 1):
                    ids.append(aid)
                    idxs.append(i)
                    sizes.append(n)
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "n_bytes": sizes})

    return assets.mapInPandas(run, out_schema)


def default_image_decoder(payload: bytes, media_type: str):
    """Default decoder hook: Pillow when the workers have it, else the
    module's documented loud guard.  Returns a 2-D grayscale float array
    (lists of lists — numpy-free contract so hooks need no extra deps)."""
    if not _pillow_available():
        raise NotImplementedError(
            "image decode requires a decoder; this container ships none — "
            "install Pillow, or inject any decoder(payload, media_type) -> "
            "2-D grayscale array via the `decoder=` hook"
        )
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L")
    w, h = img.size
    px = list(img.getdata())
    return [px[r * w : (r + 1) * w] for r in range(h)]


def phash_decoded(
    assets: DataFrame,
    n_bits: int = 64,
    decoder=None,
) -> DataFrame:
    """REAL perceptual hash over decoded pixels (verdict r8 #7): the
    pluggable-decoder half of the pHash family.  ``decoder`` is any
    callable ``(payload_bytes, media_type) -> 2-D grayscale array``
    (rows of pixel intensities); the default is
    :func:`default_image_decoder` — Pillow when present, the documented
    loud NotImplementedError otherwise, so shipping this container
    UNCHANGED keeps the honest no-codec behavior while a real deployment
    (or a test's synthetic decoder) plugs pixels in without touching
    Spark-side code.

    The hash itself is decoder-independent average-hash: block-mean the
    pixel grid to sqrt(n_bits) x sqrt(n_bits) cells, set each bit iff its
    cell mean exceeds the grid mean (ties -> 0), pack row-major MSB-first
    into a BIGINT compatible with :func:`phash_pairs`' banded-Hamming
    engine.  Runs in Arrow-batched ``mapInPandas`` — the decoder is
    invoked per row INSIDE the batch loop, payload bytes never hit the
    driver.  ``n_bits`` must be a square <= 64 (the BIGINT pack)."""
    side = int(n_bits**0.5)
    if side * side != n_bits or not 0 < n_bits <= 64:
        raise ValueError(
            f"n_bits must be a square in (0, 64], got {n_bits}"
        )
    dec = decoder if decoder is not None else default_image_decoder

    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("phash", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, p, m in zip(
                pdf["asset_id"], pdf["payload"], pdf["media_type"]
            ):
                grid = dec(bytes(p), m)
                if not grid or not grid[0]:
                    raise ValueError(
                        f"decoder returned an empty pixel grid for asset "
                        f"{aid} — decoders must yield a non-empty 2-D array"
                    )
                h, w = len(grid), len(grid[0])
                if any(len(row) != w for row in grid):
                    raise ValueError(
                        f"decoder returned a ragged pixel grid for asset "
                        f"{aid} — every row must match row 0's length {w}"
                    )
                cells = []
                for bi in range(side):
                    for bj in range(side):
                        r0, r1 = bi * h // side, max((bi + 1) * h // side, bi * h // side + 1)
                        c0, c1 = bj * w // side, max((bj + 1) * w // side, bj * w // side + 1)
                        block = [
                            grid[r][c]
                            for r in range(r0, min(r1, h))
                            for c in range(c0, min(c1, w))
                        ]
                        cells.append(sum(block) / len(block))
                mean = sum(cells) / len(cells)
                bits = 0
                for cell in cells:
                    bits = (bits << 1) | (1 if cell > mean else 0)
                # keep the MSB out of the sign bit for n_bits=64
                if n_bits == 64 and bits >= 2**63:
                    bits -= 2**64
                ids.append(aid)
                hashes.append(bits)
            yield pd.DataFrame(
                {"asset_id": ids, "phash": pd.array(hashes, dtype="int64")}
            )

    return assets.mapInPandas(run, out_schema)


def phash_stub(assets: DataFrame, n_bits: int = 16) -> DataFrame:
    """Perceptual-hash STUB for media payloads: (asset_id, phash).

    A real deployment computes a DCT pHash / chromaprint / video keyframe
    hash inside the decode kernel; the container has no codecs, so the stub
    derives ``n_bits`` deterministically from the payload's md5 — preserving
    the property that matters to the PIPELINE: identical payloads collide,
    near-identical ones are close (trivially, only exact here), and the
    value is reproducible by a SQL oracle.  Pure column expressions — the
    hash costs one md5 per asset at scan speed, no Python."""
    n_nibs = (n_bits + 3) // 4
    return assets.select(
        F.col("asset_id"),
        F.conv(F.substring(F.md5(F.col("payload")), 1, n_nibs), 16, 10)
        .cast("bigint")
        .alias("phash"),
    )


def phash_pairs(
    assets: DataFrame,
    n_bits: int = 16,
    band_bits: int = 4,
    max_hamming: int = 3,
    decoder=None,
) -> DataFrame:
    """Media near-duplicate pairs by perceptual hash: the banded Hamming
    blocking engine shared with text SimHash
    (operators/dedup.py::hamming_pairs) applied to :func:`phash_stub`
    fingerprints — multimodal dedup rides the exact same 100 TB machinery
    (posting-list banding, pigeonhole completeness, skew guard) as text.
    Returns (id_a, id_b, hamming), complete for ``max_hamming < n_bands``.

    ``decoder`` (r9, verdict r8 #7): pass any ``(payload, media_type) ->
    2-D grayscale array`` callable to fingerprint via
    :func:`phash_decoded`'s real pixel average-hash instead of the
    byte-level stub — same downstream engine, so a deployment with a
    codec upgrades to true perceptual blocking by adding one argument.
    Default None keeps the oracle-certified stub path byte-identical."""
    from trafficbigdatasearch_spark.operators import dedup

    fingerprints = (
        phash_decoded(assets, n_bits, decoder)
        if decoder is not None
        else phash_stub(assets, n_bits)
    )
    fps = fingerprints.select(
        F.col("asset_id").alias("id"), F.col("phash").alias("simhash")
    )
    return dedup.hamming_pairs(
        fps, n_bits=n_bits, band_bits=band_bits, max_hamming=max_hamming
    )


def scene_changes(
    assets: DataFrame,
    frame_chars: int = 200,
    threshold: int = 4,
    n_bits: int = 16,
) -> DataFrame:
    """SCENE-CHANGE detection over video-like assets: fingerprint
    consecutive frames and mark transitions whose perceptual-hash Hamming
    distance exceeds ``threshold`` — the shot-boundary primitive behind
    keyframe extraction and per-scene dedup budgets.

    The decode/frame stage follows the module's stub policy (no codecs in
    this container): frames are deterministic fixed-width payload windows
    and the per-frame hash is the md5 stub, so the whole chain — framing,
    hashing, the lag comparison — is oracle-reproducible while a real
    deployment swaps ONE stage (decoder-backed frame hashes via the
    ``phash_decoded`` hook) and keeps the boundary logic unchanged.

    Returns one row per frame TRANSITION: (asset_id, frame_idx, hamming,
    is_boundary) for frame_idx >= 1.  Empty payloads are excluded.

    Scale shape: the frame fan-out is a row-local sequence+explode
    (ceil(len/frame_chars) rows per asset — the format's own density), the
    hash is one md5 per frame at scan speed, and the ONLY exchange is the
    per-asset window for the lag — frames of one asset are a single
    partition's worth by construction (videos are bounded; a pathological
    asset is bounded by its own length / frame_chars).
    """
    n_nibs = (n_bits + 3) // 4
    framed = (
        assets.filter(F.length("payload") > 0)
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    ((F.length("payload") - 1) / frame_chars).cast("bigint"),
                )
            ).alias("frame_idx"),
            F.col("payload"),
        )
        .select(
            "asset_id",
            "frame_idx",
            F.expr(
                f"substring(CAST(payload AS STRING), "
                f"CAST(frame_idx * {frame_chars} + 1 AS INT), {frame_chars})"
            ).alias("_fr"),
        )
    )
    hashed = framed.select(
        "asset_id",
        "frame_idx",
        F.conv(F.substring(F.md5(F.col("_fr")), 1, n_nibs), 16, 10)
        .cast("bigint")
        .alias("_ph"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    x = hashed.select(
        "asset_id", "frame_idx", "_ph", F.lag("_ph").over(w).alias("_prev")
    ).filter(F.col("_prev").isNotNull())
    ham = F.bit_count(F.col("_ph").bitwiseXOR(F.col("_prev"))).cast("bigint")
    return x.select(
        "asset_id",
        "frame_idx",
        ham.alias("hamming"),
        (ham > threshold).alias("is_boundary"),
    )
