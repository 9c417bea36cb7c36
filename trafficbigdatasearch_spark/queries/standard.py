"""The driver-contract query registry: every operator class from SURVEY.md §2
plus the beyond-parity pipeline operators, each as a (Spark builder, DuckDB
oracle SQL) pair over the testdata tables.

Cross-engine determinism rules used throughout (the driver hash-compares
values):

- counts / keys / strings: naturally exact.
- money sums: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`` — decimal
  sums are exact and order-independent, the final double cast is one
  correctly-rounded op; identical in both engines.
- averages: exact decimal sum cast to double, divided by the count — a fixed
  IEEE op sequence.
- similarity scores: quantized integer dot products (functions/vectors.py)
  -> bit-identical doubles.
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

# The registry facade: _shared owns the dict; the std_* modules register
# into it ON IMPORT, in the original top-to-bottom order (registration
# order is load-bearing: the driver verifies the first 50 entries); the
# _WINDOW reorder below then mutates the dict IN PLACE so every
# importer observes the driver ordering.  Policy + full rotation
# ledger: ROTATION.md.
from ._shared import (  # noqa: F401  (re-exported facade)
    QueryFn,
    _REGISTRY,
    _cents,
    _dsum,
    oracle_sql,
    queries,
    register,
)
from . import std_core  # noqa: F401,E402  isort:skip
from . import std_textsim  # noqa: F401,E402  isort:skip
from . import std_tpch_sampling  # noqa: F401,E402  isort:skip
from . import std_spatial_incr  # noqa: F401,E402  isort:skip
from . import std_olap_quality  # noqa: F401,E402  isort:skip
from . import std_retrieval  # noqa: F401,E402  isort:skip
from . import std_graph_eval  # noqa: F401,E402  isort:skip
from . import std_r11  # noqa: F401,E402  isort:skip
from . import std_r12  # noqa: F401,E402  isort:skip
from . import _shared  # noqa: F401,E402  isort:skip

#: Era modules in registration order — also the __getattr__ search order.
_ERA_MODULES = (
    _shared, std_core, std_textsim, std_tpch_sampling, std_spatial_incr,
    std_olap_quality, std_retrieval, std_graph_eval, std_r11, std_r12,
)


def __getattr__(name: str):
    """Pre-split compatibility (PEP 562): tests and tools that reached
    registry internals as ``standard.<helper>`` (approx_sketches_raw,
    _scratch, _SCRATCH_ROOT, _FK_BLOOM_CACHE, ...) resolve against the
    era module that owns them now.  Dynamic on purpose — _SCRATCH_ROOT is
    REBOUND by _scratch at runtime, so a static ``from ... import`` would
    freeze the pre-call value."""
    for _m in _ERA_MODULES:
        if hasattr(_m, name):
            return getattr(_m, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r} "
        "(searched _shared and the std_* era modules)"
    )

_WINDOW = [
    # --- stable flagship slots (22, unchanged from r10: one flagship per
    # capability family; every round re-verifies the load-bearing paths) --
    "p_bbox_filter",
    "j_asof",
    "w_sessionize",
    "pipeline_dedup_corpus",
    "dedup_incremental",
    "text_lang_id",
    "sim_embedding_near_dup",
    "sim_ivf_indexed",
    "sim_pq_adc_topk",
    "mm_phash_pairs",
    "q3_shipping_priority",
    "text_chunk_docs",
    "decontaminate",
    "a_cohort_retention",
    "a_grouping_sets",
    "text_phrase_indexed",
    "j_skew_salted",
    "j_range_keyless",
    "stream_events_hourly",
    "pack_sequences",
    "sketch_distinct_rollup",
    "quality_report",
    # --- rotating slots, round 12 (28): the ROUND-12 QUEUE head, exactly
    # as the r11 close and VERDICT r11 #1 ordered it.  First the 11-row
    # never-checked remainder of the r10 backlog (they have waited two
    # full rounds) ---------------------------------------------------------
    "sample_poisson_bootstrap",
    "quality_dedup_report",
    "text_vocab_curve",
    "quality_syndication",
    "eval_jaccard_histogram",
    "ts_peaks",
    "mm_scene_changes",
    "eval_langid_confusion",
    "quality_gopher_rates",
    "eval_split_leakage",
    "dedup_cross_corpus",
    # --- the 8 r11 registrations (never-checked; rehearsed green at both
    # sf0.01 and sf0.1 the session they landed), registration order -------
    "q7_volume_shipping",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_late_sole_supplier",
    "eval_bpe_fertility",
    "text_bpe_merges_batched",
    "ts_ohlc_bucketed",
    # --- changed-code cycle-backs: the struct ordering key replaced the
    # DECIMAL(38,0) pack in operators/timeseries.py `_ord_key` and
    # stream_ohlc's inline key in r11 (SCALING.md r11 A/B ruling) ----------
    "ts_resample_ohlc",
    "ts_gapfill",
    "ts_interpolate",
    "stream_ohlc",
    # --- changed-code cycle-backs, CC family: graph.py:183-203 changed
    # twice in r11 (rounds_per_check parameter added; the =2 default was
    # measured a 1.5x loss and reverted, commit 56de50a).  The family's
    # out-of-window members re-verify on the shipped code ------------------
    "pipeline_dbscan",
    "dedup_keep_best",
    "pipeline_entity_resolution",
    "pipeline_semantic_dedup",
    "dedup_clusters",
]


assert len(_WINDOW) == 50, len(_WINDOW)


assert set(_WINDOW) <= set(_REGISTRY), sorted(set(_WINDOW) - set(_REGISTRY))


_ordered = {
    **{n: _REGISTRY[n] for n in _WINDOW},
    **{n: v for n, v in _REGISTRY.items() if n not in _WINDOW},
}
_REGISTRY.clear()
_REGISTRY.update(_ordered)
