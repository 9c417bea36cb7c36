#!/usr/bin/env python
"""Compare two bench records query-by-query.

Usage: ``python tools/bench_compare.py OLD.json NEW.json [threshold]``

Accepts either the full ``BENCH_local.json`` shape (``queries`` map inline)
or a driver ``BENCH_r{N}.json`` wrapper (``parsed`` holding the summary —
whose ``queries`` map may be the slowest-only compact subset).  Prints the
common-query totals, the per-query ratio table for everything past
``threshold`` (default 1.15 = +15 %), and exits 1 if any common query
regressed beyond 1.5x — a cheap guard for perf refactors.
"""

from __future__ import annotations

import json
import sys


def _queries(path: str) -> dict[str, float]:
    with open(path) as f:
        rec = json.load(f)
    if "queries" in rec:
        # fold in the r8+ blind-spot sweep rows under a namespaced key:
        # sweep numbers are ONE cold run (codegen/JIT included) while
        # headline numbers are MIN-of-2 warm — prefixing keeps the common
        # set regime-consistent (sweep compares to sweep, warm to warm),
        # so a query migrating between rosters across rounds never shows
        # a spurious cold-vs-warm "regression"
        return {
            **{f"sweep:{k}": v for k, v in rec.get("sweep_queries", {}).items()},
            **rec["queries"],
        }
    parsed = rec.get("parsed") or {}
    if parsed.get("queries"):
        return parsed["queries"]
    # truncated driver record (r1-r4 "parsed": null): scrape the surviving
    # "name": seconds pairs out of the 2000-char stdout tail
    import re

    tail = rec.get("tail") or ""
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"([a-z0-9_]+)": ([0-9.]+)', tail)
        if m.group(1) not in ("value", "sf", "cold_total_sec", "n_queries")
    }


def best_prior_map(repo_dir: str) -> dict[str, float]:
    """Per-query BEST (min) recorded seconds across every prior driver
    bench (``BENCH_r*.json``) — the tolerance-band baseline (verdict r8
    #3).  Min-over-rounds is the right anchor for a band: host variance
    only ever inflates a round's number, so the min approaches the true
    per-plan cost and a flag means 'worse than the best this host has
    ever demonstrated by more than the band', which variance alone has
    not produced (measured same-code spread: 2.4x — the 2.5 default band
    in ``flag_regressions`` sits just above it)."""
    import glob
    import os

    best: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))):
        try:
            qs = _queries(path)
        except Exception:
            continue
        for q, sec in qs.items():
            if not isinstance(sec, (int, float)) or sec <= 0:
                continue
            if q not in best or sec < best[q]:
                best[q] = float(sec)
    return best


#: Rulings that RE-ANCHOR a query's tolerance-band baseline: after an A/B
#: bracket rules a slowdown code-attributable-and-ACCEPTED (exactness or
#: scale trade documented in SCALING.md), the superseded formulation's
#: best-prior would flag the shipping plan every round forever.  The value
#: is the accepted formulation's measured best (min over same-session
#: fresh-process runs); best_prior is clamped UP to it.  Every entry must
#: cite its SCALING.md ruling.
RULED_FLOORS: dict[str, float] = {
    # r11 OHLC ruling (SCALING.md): exact-at-any-id ordering key forces
    # SortAggregate; r4's 0.25 s HashAggregate record is the superseded
    # bounded-bigint-pack plan.  Struct-key best measured 0.712 s.
    "ts_resample_ohlc": 0.712,
}


def flag_regressions(
    times: dict[str, float],
    best: dict[str, float],
    band: float = 2.5,
) -> dict[str, dict]:
    """Queries whose new time exceeds ``band`` x their best prior round.
    Sub-0.2 s rows are exempt: at that magnitude scheduler jitter alone
    crosses any band and a flag would be pure noise."""
    flags: dict[str, dict] = {}
    for q, sec in times.items():
        b = best.get(q)
        if q in RULED_FLOORS:
            b = max(b, RULED_FLOORS[q]) if b is not None else RULED_FLOORS[q]
        if b is None or max(sec, b) < 0.2:
            continue
        ratio = sec / b
        if ratio > band:
            flags[q] = {
                "sec": round(sec, 3),
                "best_prior": round(b, 3),
                "ratio": round(ratio, 2),
            }
    return flags


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--flags":
        # flag mode: compare NEW.json against the best prior driver round
        # (the round-close gate's mechanism; bench.py runs this inline)
        import os

        new_path = sys.argv[2]
        band = float(sys.argv[3]) if len(sys.argv) > 3 else 2.5
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        best = best_prior_map(repo)
        flags = flag_regressions(_queries(new_path), best, band)
        print(json.dumps({"band": band, "n_best_prior": len(best), "flags": flags}, indent=1))
        return 1 if flags else 0
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = _queries(sys.argv[1]), _queries(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.15
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries between the two records")
        return 2
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(
        f"{len(common)} common queries: {t_old:.2f}s -> {t_new:.2f}s "
        f"({t_new / t_old:.2f}x)"
    )
    worst = 0.0
    for q in sorted(common, key=lambda q: -(new[q] / max(old[q], 1e-9))):
        r = new[q] / max(old[q], 1e-9)
        worst = max(worst, r)
        if r >= threshold:
            print(f"  {q:32s} {old[q]:7.3f}s -> {new[q]:7.3f}s  {r:.2f}x")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only ({len(only_new)}): " + ", ".join(only_new))
    return 1 if worst > 1.5 else 0


if __name__ == "__main__":
    sys.exit(main())
