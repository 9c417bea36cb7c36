"""Raw media-file ingest: directories of image/audio/video files into the
binary-column asset table the multimodal operators consume.

The reference has no media handling at all; this completes the multimodal
lane's INGEST edge (operators/multimodal.py processes binary columns that,
until now, only ``assets_from_documents`` could fabricate): Spark's
``binaryFile`` source reads each file as one row — (path, modificationTime,
length, content) — with predicate pushdown on ``length`` and
``modificationTime``, so a "skip the 2 GB videos" or "only files newer
than the last ingest" filter prunes BEFORE content bytes are read.

Scale posture (100 TB of media):

- one row per file; partition sizing follows ``spark.sql.files
  .maxPartitionBytes`` like any file scan, so a directory of millions of
  small images parallelizes without per-file tasks;
- ``pathGlobFilter`` prunes by extension at LISTING time (no row ever
  materializes for a non-matching file);
- the content column is opaque bytes end-to-end — decode happens only
  inside the Arrow-batched multimodal kernels, never driver-side;
- ingest lands the asset table as parquet (``write_sized``) so every
  downstream read is a columnar scan that can PRUNE the payload column
  when only metadata is queried — reading (asset_id, n_bytes) never
  touches the media bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Extension -> media_type mapping for :func:`assets_from_files`.
_MEDIA_TYPES = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "avi": "video", "mkv": "video", "webm": "video",
}


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """One row per file under ``path``: (path, modificationTime, length,
    content).  ``glob`` (e.g. ``"*.png"``) filters at listing time;
    ``length``/``modificationTime`` predicates push down to the reader —
    assert via ``.explain()``: the filter appears in ``PushedFilters`` and
    oversized files are never fetched."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)


def assets_from_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest a media directory as the multimodal ASSET TABLE —
    (asset_id, media_type, payload, meta) — the schema every
    operators/multimodal.py kernel consumes (extract_features, resize,
    frame_sample, phash).

    - ``asset_id`` = xxhash64 of the file path: deterministic under
      re-ingest and re-partitioning (retry-stable ids, the same contract
      as the md5 sampling family);
    - ``media_type`` derived from the extension via a literal CASE (row
      local); unknown extensions -> 'binary';
    - ``max_bytes`` (skip-the-huge-files guard) is applied to the
      ``length`` METADATA column, so it pushes down and oversized content
      is never read;
    - ``meta`` carries (uri, n_bytes, mtime) as JSON — the typed-metadata
      convention of the asset table.
    """
    raw = read_binary_dir(spark, path, glob, recursive)
    if max_bytes is not None:
        raw = raw.filter(F.col("length") <= max_bytes)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mt = F.lit("binary")
    for e, t in sorted(_MEDIA_TYPES.items()):
        mt = F.when(ext == e, F.lit(t)).otherwise(mt)
    return raw.select(
        F.xxhash64(F.col("path")).alias("asset_id"),
        mt.alias("media_type"),
        F.col("content").alias("payload"),
        F.to_json(
            F.struct(
                F.col("path").alias("uri"),
                F.col("length").alias("n_bytes"),
                F.date_format(
                    F.col("modificationTime"), "yyyy-MM-dd HH:mm:ss"
                ).alias("mtime"),
            )
        ).alias("meta"),
    )
