#!/usr/bin/env python
"""Scale probe for persisted-index APPEND maintenance (r10).

Claim under test (similarity.ivf_index_append + search.text_index_append):
folding a new batch into a standing index costs work bounded by the BATCH
— standing index bytes are never read, shuffled, or rewritten — so append
wall-time should stay roughly flat as the standing index grows while a
full rebuild grows with it.

Probe: synthetic corpora at three base sizes (embeddings for IVF,
token-docs for the text index) with a FIXED-size batch; for each size,
  1. full (re)build over base+batch     (the rebuild-everything baseline)
  2. build over base, then append        (the maintenance path; the append
                                          is timed alone)
A result-equality guard runs at the smallest size (rebuild-exactness is
proved in tests; here it guards the probe itself).

Emits one JSON line; recorded in SCALING.md.  Usage:
    python tools/index_append_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_VECS = 2_000
BATCH_DOCS = 2_000


def main() -> None:
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.operators import search, similarity
    from trafficbigdatasearch_spark.session import build_spark

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="tbds_append_probe_")
    out = {"probe": "index_append", "batch_vecs": BATCH_VECS,
           "batch_docs": BATCH_DOCS, "ivf": [], "text": []}

    def synth_emb(n, offset=0):
        # 16-dim deterministic pseudo-embeddings; ids disjoint via offset
        return spark.range(n).select(
            (F.col("id") + offset).alias("vec_id"),
            F.array(*[
                ((F.col("id") * (d * 2 + 3) % 997) / 997.0).cast("float")
                for d in range(16)
            ]).alias("embedding"),
        )

    def synth_docs(n, offset=0):
        words = F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{j}_"), ((F.col("id") * (j + 2)) % 211).cast("string"))
              for j in range(30)],
        )
        return spark.range(n).select(
            (F.col("id") + offset).alias("doc_id"), words.alias("text")
        )

    # ---- IVF ---------------------------------------------------------------
    for n_base in (20_000, 80_000, 320_000):
        base, batch = synth_emb(n_base), synth_emb(BATCH_VECS, offset=n_base)
        both = base.unionByName(batch)
        cents = base.filter(F.col("vec_id") % 997 == 0).select(
            F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
        )
        full, inc = f"{root}/ivf_full_{n_base}", f"{root}/ivf_inc_{n_base}"
        t0 = time.time()
        similarity.build_ivf_index(both, full, centroids=cents)
        t_rebuild = time.time() - t0
        similarity.build_ivf_index(base, inc, centroids=cents)
        t0 = time.time()
        similarity.ivf_index_append(spark, inc, batch)
        t_append = time.time() - t0
        if n_base == 20_000:
            q = both.filter(F.col("vec_id") < 5)
            a = sorted(map(tuple, similarity.ivf_topk_indexed(spark, inc, q, k=3).collect()))
            b = sorted(map(tuple, similarity.ivf_topk_indexed(spark, full, q, k=3).collect()))
            assert a == b and a, "append != rebuild at guard size"
        out["ivf"].append({"n_base": n_base,
                           "rebuild_s": round(t_rebuild, 2),
                           "append_s": round(t_append, 2)})

    # ---- text --------------------------------------------------------------
    for n_base in (20_000, 80_000, 320_000):
        base, batch = synth_docs(n_base), synth_docs(BATCH_DOCS, offset=n_base)
        both = base.unionByName(batch)
        full, inc = f"{root}/txt_full_{n_base}", f"{root}/txt_inc_{n_base}"
        t0 = time.time()
        search.build_text_index(both, full)
        t_rebuild = time.time() - t0
        search.build_text_index(base, inc)
        t0 = time.time()
        search.text_index_append(batch, inc)
        t_append = time.time() - t0
        if n_base == 20_000:
            terms = ["w0_1", "w1_7", "w2_13"]
            a = sorted(map(tuple, search.bm25_indexed(spark, inc, terms, k=5).collect()))
            b = sorted(map(tuple, search.bm25_indexed(spark, full, terms, k=5).collect()))
            assert a == b and a, "append != rebuild at guard size"
        out["text"].append({"n_base": n_base,
                            "rebuild_s": round(t_rebuild, 2),
                            "append_s": round(t_append, 2)})

    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
