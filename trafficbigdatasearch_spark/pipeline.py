"""CorpusPipeline: the chainable facade over the curation operators.

The traffic side has ``TrafficEngine`` (engine.py) as its product surface;
this is the equivalent for the training-data side — one object that strings
quality gating, dedup, decontamination, sampling, chunking, and packing into
a lazily-composed SINGLE logical plan (each step returns a new pipeline over
a transformed DataFrame; nothing executes until the caller acts).

Every step delegates to the independently oracle-verified operator modules —
the facade adds composition and defaults, never new semantics — and because
each step is deterministic (md5 membership, min-id survivors), the whole
pipeline is reproducible end to end: same input, same corpus out, on any
cluster size, under retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.functions import text as T
from trafficbigdatasearch_spark.operators import dedup, graph, sampling


class CorpusPipeline:
    """Immutable chainable wrapper: each step returns a NEW pipeline."""

    def __init__(self, docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.df = docs
        self.id_col = id_col
        self.text_col = text_col

    def _next(self, df: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(df, self.id_col, self.text_col)

    # -- steps ------------------------------------------------------------
    def quality_gate(self, min_tokens: int = 5) -> "CorpusPipeline":
        """Drop documents below a token-count floor (row-local)."""
        return self._next(
            self.df.filter(T.token_count(F.col(self.text_col)) >= min_tokens)
        )

    def materialize(self) -> "CorpusPipeline":
        """Pin the current frame to ONE evaluation (lazy localCheckpoint)
        before fanning into multiple consumers — the recsys/graph
        multi-consumer pattern as an explicit pipeline stage.  Use after a
        gate whose output feeds a model-training slice AND the scoring
        pass AND a closing semi join (the lm_gate arrangement): without
        it each branch re-derives the whole upstream chain from the scan
        (r9 scan-hygiene audit: 4 documents scans in pipeline_lm_filter,
        2 after this stage).  Result-transparent; costs one executor-local
        write of the current frame."""
        return self._next(self.df.localCheckpoint(eager=False))

    def enforce(self, row_checks: dict) -> "CorpusPipeline":
        """FAIL the pipeline on the first row violating a constraint
        (operators/validate.py::enforce — row-local predicates fused into
        the scan): where quality_gate silently DROPS substandard rows,
        enforce asserts invariants whose violation means the upstream feed
        is broken and publishing anything would be wrong."""
        from trafficbigdatasearch_spark.operators import validate as V

        return self._next(V.enforce(self.df, row_checks))

    def lm_gate(
        self,
        trusted: DataFrame,
        min_coverage: float = 0.85,
        min_count: int = 10,
    ) -> "CorpusPipeline":
        """CCNet-style fluency gate (operators/lm.py): train a bigram LM on
        ``trusted`` documents (same id/text columns as the pipeline), keep
        rows whose known-bigram coverage is >= ``min_coverage``.  Documents
        with no bigrams have NULL coverage and DROP — "no signal" fails a
        fluency gate, unlike quality_gate's explicit length floor which is
        the stage that should have caught them.  Cost: one bounded model
        shuffle + one broadcast-scored pass + a semi join on the id."""
        from trafficbigdatasearch_spark.operators import lm

        model = lm.bigram_lm(
            trusted, id_col=self.id_col, text_col=self.text_col,
            min_count=min_count,
        )
        scored = lm.coverage_scores(
            self.df, model, id_col=self.id_col, text_col=self.text_col
        )
        keep = scored.filter(F.col("coverage") >= min_coverage).select(
            self.id_col
        )
        return self._next(self.df.join(keep, self.id_col, "left_semi"))

    def dedup_exact(self) -> "CorpusPipeline":
        """Keep the min-id document per exact content fingerprint."""
        keep = dedup.dedup_exact(
            self.df.select(self.id_col, self.text_col),
            id_col=self.id_col, text_col=self.text_col,
        ).select(self.id_col)
        return self._next(self.df.join(keep, self.id_col, "left_semi"))

    def dedup_near(self, k: int = 16, bands: int = 4, n: int = 3) -> "CorpusPipeline":
        """MinHash-LSH pairs -> connected components -> one survivor per
        near-dup CLUSTER (transitive closure, not pairwise order-bias)."""
        pairs = dedup.minhash_lsh_pairs(
            self.df.select(self.id_col, self.text_col),
            k=k, bands=bands, n=n,
            id_col=self.id_col, text_col=self.text_col,
        )
        drop = (
            graph.dedup_clusters(pairs)
            .filter(~F.col("is_keeper"))
            .select(F.col("id").alias(self.id_col))
        )
        return self._next(self.df.join(drop, self.id_col, "left_anti"))

    def dedup_near_keep_best(
        self, k: int = 16, bands: int = 4, n: int = 3
    ) -> "CorpusPipeline":
        """Near-dup clusters keep their highest-QUALITY member (token
        count; ties to the smaller id) instead of the min id — the
        curation policy that drops the boilerplate copy and keeps the full
        article.  Same LSH -> CC machinery as :meth:`dedup_near` plus one
        quality join and one composite arg-max per cluster; survivor
        choice stays a total function of the corpus (no scan-order
        dependence)."""
        pairs = dedup.minhash_lsh_pairs(
            self.df.select(self.id_col, self.text_col),
            k=k, bands=bands, n=n,
            id_col=self.id_col, text_col=self.text_col,
        )
        cc = graph.connected_components(pairs)
        members = cc.join(
            self.df.select(
                F.col(self.id_col).alias("id"),
                T.token_count(F.col(self.text_col)).alias("_q"),
            ),
            "id",
        )
        keep = (
            members.groupBy("component")
            .agg(
                # bounds (quality < 2^32, id < 2^31) enforced via the
                # amortized group-level guard — see graph._ARGMAX_PACK
                F.max_by(
                    "id", graph.quality_argmax_key(F.col("_q"), F.col("id"))
                ).alias("id"),
                graph.quality_argmax_bounds_ok(
                    F.col("_q"), F.col("id")
                ).alias("_ok"),
            )
            .select(
                graph.quality_argmax_guard(F.col("_ok"), F.col("id")).alias(
                    self.id_col
                )
            )
        )
        drop = (
            cc.select(F.col("id").alias(self.id_col))
            .join(keep, self.id_col, "left_anti")
        )
        return self._next(self.df.join(drop, self.id_col, "left_anti"))

    def sample(self, fraction: float) -> "CorpusPipeline":
        """Deterministic md5-hash sample — retry/repartition-stable,
        row-local (no shuffle)."""
        tagged = sampling.hash_split(
            self.df, self.id_col, {"keep": fraction, "rest": 1.0 - fraction}
        )
        return self._next(tagged.filter(F.col("split") == "keep").drop("split"))

    # -- terminals --------------------------------------------------------
    def docs(self) -> DataFrame:
        return self.df

    def ids(self) -> DataFrame:
        return self.df.select(self.id_col)
