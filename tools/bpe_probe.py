#!/usr/bin/env python
"""Round-count probe for the batched BPE merge loop (VERDICT r8 #4).

``learn_merges`` is a driver-synced fixpoint: each round costs one
bounded top-(batch+1) collect plus the chained replace application.  At
``batch_size=1`` (the r8 shape) a production 32k-merge tokenizer would
pay ~2 Spark jobs of scheduler latency PER MERGE — the corpus math is
already bounded (everything after round 0 touches only the distinct-word
frequency table), so wall-clock is ROUND-COUNT-bound, not data-bound.

The r9 ``_safe_batch`` prefix accepts every provably-sequential-safe
merge per round (pairwise symbol-disjoint, strict-weight-above-conflict
— see operators/bpe.py for the equivalence argument; tie-trap pinned in
tests/test_bpe.py).  This probe measures the improvement on the real
documents table and ASSERTS rule-list equality between the two shapes,
so the speed number can never silently come from a semantics drift.

Usage:
    python tools/bpe_probe.py [n_merges] [sf_dir]
(defaults: 300 merges at /root/testdata/sf0.01)

Emits one JSON line: rounds + wall seconds for batch_size=1 vs 64, and
the measured rules/round acceptance rate.  Recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 300
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"


def main() -> None:
    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import bpe
    from trafficbigdatasearch_spark.session import build_spark

    spark = build_spark()
    docs = load_table(spark, SF_DIR, "documents")

    # rounds = collect() calls; count them by wrapping pair_counts' sink
    def run(batch_size: int) -> tuple[list, int, float]:
        rounds = 0
        orig = bpe.pair_counts

        def counting(reprs):
            nonlocal rounds
            rounds += 1
            return orig(reprs)

        bpe.pair_counts = counting
        try:
            t0 = time.time()
            rules, reprs = bpe.learn_merges(
                docs, N_MERGES, batch_size=batch_size
            )
            reprs.count()  # materialize the final table like a consumer
            dt = time.time() - t0
        finally:
            bpe.pair_counts = orig
        return rules, rounds, dt

    # JVM/codegen warmup so neither arm pays first-job costs
    docs.limit(50).count()
    bpe.learn_merges(docs.limit(50), 2)
    rules_s, rounds_s, dt_s = run(1)
    rules_b, rounds_b, dt_b = run(64)

    # Third arm: a Zipfian corpus.  The synthetic documents table has a
    # tiny closed vocabulary whose pair weights TIE heavily, and the safe
    # batch (correctly) refuses to cross a tie — so acceptance there is a
    # floor, not the expected case.  Real text is Zipfian with mostly
    # DISTINCT top weights; this arm measures acceptance at that tie
    # density.  Deterministic (seeded), driver-built, ~20k words.
    import random

    rng = random.Random(9)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    vocab = []
    seen = set()
    while len(vocab) < 4000:
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 10)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    zdocs = docs.sparkSession.createDataFrame(
        [
            (i, " ".join([w] * max(1, int(20000 / (i + 1)))))
            for i, w in enumerate(vocab)
        ],
        "doc_id bigint, text string",
    )
    docs = zdocs
    zrules_s, zrounds_s, zdt_s = run(1)
    zrules_b, zrounds_b, zdt_b = run(64)
    assert zrules_s == zrules_b
    assert rules_s == rules_b, (
        "batched BPE diverged from sequential — the probe refuses to "
        "report a speedup bought with different rules"
    )
    print(
        json.dumps(
            {
                "probe": "bpe_batch",
                "sf_dir": SF_DIR,
                "n_merges": len(rules_s),
                "sequential": {"rounds": rounds_s, "sec": round(dt_s, 2)},
                "batched_64": {"rounds": rounds_b, "sec": round(dt_b, 2)},
                "round_ratio": round(rounds_s / max(rounds_b, 1), 2),
                "speedup": round(dt_s / max(dt_b, 1e-9), 2),
                "rules_per_round_batched": round(
                    len(rules_b) / max(rounds_b, 1), 2
                ),
                "rules_identical": True,
                "zipf": {
                    "n_merges": len(zrules_s),
                    "sequential": {
                        "rounds": zrounds_s,
                        "sec": round(zdt_s, 2),
                    },
                    "batched_64": {
                        "rounds": zrounds_b,
                        "sec": round(zdt_b, 2),
                    },
                    "round_ratio": round(zrounds_s / max(zrounds_b, 1), 2),
                    "speedup": round(zdt_s / max(zdt_b, 1e-9), 2),
                    "rules_per_round_batched": round(
                        len(zrules_b) / max(zrounds_b, 1), 2
                    ),
                    "rules_identical": True,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
