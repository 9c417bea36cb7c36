#!/usr/bin/env python
"""Scale probe for incremental bit-fingerprint dedup (r10).

Claim under test (dedup.hamming_pairs_incremental): screening a NEW
fingerprint batch against a standing corpus costs work bounded by the
BATCH (the corpus streams through its band expansion once and never
shuffles), so increment wall-time should stay roughly flat as the corpus
grows while a full re-dedup of corpus+batch grows with corpus size — the
inc-CC / index-append probes' shape, reproduced for the bit-fingerprint
family.

Probe: synthetic 24-bit fingerprints (4 bands x 6 bits, max_hamming 3 —
pigeonhole-complete) at three corpus sizes with a FIXED 2 000-row batch;
per size,
  1. full hamming_pairs over corpus+batch        (re-dedup everything)
  2. hamming_pairs_incremental(corpus, batch)    (the maintenance path)
An equality guard at the smallest size checks the increment's cross pairs
against the full run's output restricted to (corpus, new) pairs.

Emits one JSON line; recorded in SCALING.md.  Usage:
    python tools/phash_inc_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 2_000
SIZES = [100_000, 400_000, 1_600_000]
N_BITS, BAND_BITS, MAX_H = 24, 6, 3


def main() -> None:
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.operators import dedup
    from trafficbigdatasearch_spark.session import build_spark

    spark = build_spark(app_name="phash-inc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"probe": "hamming_pairs_incremental", "n_bits": N_BITS,
                 "batch": BATCH, "sizes": []}

    def fps(n, offset):
        # deterministic pseudo-random 24-bit fingerprints (xxhash-free:
        # md5-derived so the probe is engine/rerun-stable)
        return (
            spark.range(offset, offset + n)
            .select(
                F.col("id"),
                (
                    F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6),
                           16, 10).cast("bigint")
                    % (1 << N_BITS)
                ).alias("simhash"),
            )
        )

    new = fps(BATCH, 10_000_000).localCheckpoint()
    for n in SIZES:
        corpus = fps(n, 0).localCheckpoint()

        t0 = time.perf_counter()
        full = dedup.hamming_pairs(
            corpus.unionByName(new), n_bits=N_BITS, band_bits=BAND_BITS,
            max_hamming=MAX_H, max_bucket_size=None,
        )
        n_full = full.count()
        t_full = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        inc = dedup.hamming_pairs_incremental(
            corpus, new, n_bits=N_BITS, band_bits=BAND_BITS, max_hamming=MAX_H
        )
        n_inc = inc.count()
        t_inc = round(time.perf_counter() - t0, 2)

        row = {"corpus": n, "full_s": t_full, "full_pairs": n_full,
               "inc_s": t_inc, "inc_pairs": n_inc}
        if n == SIZES[0]:
            got = {(r["new_id"], r["corpus_id"], r["hamming"])
                   for r in inc.collect()}
            want = {
                (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]),
                 r["hamming"])
                for r in full.collect()
                if (r["id_a"] >= 10_000_000) != (r["id_b"] >= 10_000_000)
            }
            assert got == want, (len(got), len(want))
            row["equality_guard"] = "identical"
        out["sizes"].append(row)
        print(row, file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
