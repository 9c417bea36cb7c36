#!/usr/bin/env python
"""Acceptance-rate CURVE probe for the batched BPE merge loop
(VERDICT r11 #6: does ~2 rules/round hold as the pair distribution
flattens toward a real 32k vocabulary, or does acceptance decay?).

`tools/bpe_probe.py` proves batched == sequential and measures the rate
at ONE point (300 merges).  This probe runs ONLY the batched arm (the
equivalence is already pinned per-run by the `text_bpe_merges_batched`
oracle row and tests/test_bpe.py) to much deeper merge counts, and
records the acceptance TRAJECTORY: rules accepted per round, segmented
into windows, so the flattening of the pair-weight distribution is
visible as a curve rather than one average.

Arms:
  - the real sf documents table (tie-dense closed vocabulary — the
    acceptance FLOOR; may exhaust pairs before deep merge counts),
  - a seeded Zipfian corpus with a 20k-word open vocabulary (realistic
    tie density for natural text — the expected case).

Usage:
    python tools/bpe_curve_probe.py [n_merges] [sf_dir]
(defaults: 1024 merges at /root/testdata/sf0.1)

Emits one JSON line with, per arm: rounds, wall seconds, rules/round
overall, the per-window curve (window = 128 rules), and the implied
wall-clock for a 32k-merge vocabulary at the measured tail rate.
Recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
WINDOW = 128


def main() -> None:
    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import bpe
    from trafficbigdatasearch_spark.session import build_spark

    spark = build_spark()

    def run(docs) -> dict:
        """One batched learn_merges run with the acceptance trajectory
        recorded: wrap pair_counts (round boundary) and apply_merge
        (accepted rule) — the trajectory is merges-so-far at each round
        start, so diffs give rules/round without touching the loop."""
        trajectory: list[int] = []
        merged = 0
        orig_pc, orig_am = bpe.pair_counts, bpe.apply_merge

        def counting_pc(reprs):
            trajectory.append(merged)
            return orig_pc(reprs)

        def counting_am(reprs, a, b):
            nonlocal merged
            merged += 1
            return orig_am(reprs, a, b)

        bpe.pair_counts, bpe.apply_merge = counting_pc, counting_am
        try:
            t0 = time.time()
            rules, reprs = bpe.learn_merges(docs, N_MERGES, batch_size=64)
            reprs.count()
            dt = time.time() - t0
        finally:
            bpe.pair_counts, bpe.apply_merge = orig_pc, orig_am
        trajectory.append(merged)
        rounds = len(trajectory) - 1
        # per-WINDOW-rules curve: rules/round inside each 128-rule slab.
        # A single round can accept MORE than one full window; integer
        # round attribution would charge the extra windows 0 (clamped to
        # 1) rounds and distort the trajectory (ADVICE r12).  Instead,
        # place each window boundary at a FRACTIONAL round index by
        # linear interpolation within the round that crossed it, and
        # divide the window's 128 rules by the fractional rounds between
        # its two boundaries.
        def _cross(target: int) -> float:
            """Fractional round index at which cumulative rules reached
            ``target`` (trajectory[i] = cumulative rules after round i)."""
            for i in range(1, len(trajectory)):
                if trajectory[i] >= target:
                    gained = trajectory[i] - trajectory[i - 1]
                    frac = (
                        (target - trajectory[i - 1]) / gained
                        if gained else 1.0
                    )
                    return (i - 1) + frac
            return float(len(trajectory) - 1)

        curve = []
        total = trajectory[-1]
        prev_cross = 0.0
        target = WINDOW
        while target <= total:
            at = _cross(target)
            curve.append(round(WINDOW / max(at - prev_cross, 1e-9), 2))
            prev_cross, target = at, target + WINDOW
        leftover = total - (target - WINDOW)
        if leftover > 0 and rounds > prev_cross:
            curve.append(round(leftover / (rounds - prev_cross), 2))
        tail_rate = curve[-1] if curve else 0.0
        overall = round(len(rules) / max(rounds, 1), 2)
        sec_per_round = dt / max(rounds, 1)
        implied_32k_sec = (
            round(32000 / max(tail_rate, 0.01) * sec_per_round)
            if rules else None
        )
        return {
            "n_rules": len(rules),
            "rounds": rounds,
            "sec": round(dt, 1),
            "rules_per_round": overall,
            "curve_per_128_rules": curve,
            "tail_rate": tail_rate,
            "sec_per_round": round(sec_per_round, 3),
            "implied_32k_merge_sec_at_tail_rate": implied_32k_sec,
        }

    docs = load_table(spark, SF_DIR, "documents")
    docs.limit(50).count()  # warmup

    import random

    rng = random.Random(9)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < 20000:
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 12)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    zdocs = spark.createDataFrame(
        [
            (i, " ".join([w] * max(1, int(200000 / (i + 1)))))
            for i, w in enumerate(vocab)
        ],
        "doc_id bigint, text string",
    )

    out = {
        "probe": "bpe_acceptance_curve",
        "sf_dir": SF_DIR,
        "n_merges_requested": N_MERGES,
        "batch_size": 64,
        "documents": run(docs),
        "zipf20k": run(zdocs),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
