"""Randomized cross-engine differential fuzz (depth round r13).

The driver's correctness gate compares each registered query against a
DuckDB oracle at ONE fixed parameterization.  This suite generalizes that
gate: hypothesis draws random datasets AND random operator parameters, and
every example is compared Spark-vs-DuckDB under the driver's own
dtype-strict canonicalization (``tools/driver_sim._canon`` / ``_cell_repr``
imported directly, so the compare is literally the rehearsal harness's).

Targets are the divergence classes the ledger documents (SCALING.md,
VERDICT r11/r12) — the places where two engines can legitimately disagree
and where our contracts pin one exact behavior:

- ordered-aggregate tie-breaks with duplicate timestamps AND negative ids
  (the ``_ord_key`` struct vs the DuckDB ``first/last(v ORDER BY
  epoch_ms(ts), id)`` recipe — the r11-advice class);
- as-of join tolerance semantics (nearest-candidate-then-null, NOT
  nearest-in-tolerance — the pandas ``merge_asof`` contract);
- interval-containment endpoint semantics (closed left/right/both/neither
  on touching and degenerate intervals);
- the 2-decimal money contract (HALF_UP vs half-even rounding agrees on
  round(x*100) exactly because x is 2-decimal; fuzzed across boundary
  magnitudes);
- gap-fill spine + forward-fill alignment at random sparsity and bucket
  widths.

A second section fuzzes the BLOCKING/REWRITE INVARIANCES the scale paths
rest on: for every parameter draw, the blocked operator must be
row-identical to its brute twin — bucketed interval join at any bucket
width, salted equi join at any salt count under forced skew, the OR-key
union-of-joins vs the literal OR predicate (NULL first keys included),
and the 3x3 grid-blocked radius self-join vs brute-force distance.

Each example runs real Spark jobs, so example counts are small; datasets
are tiny (tens of rows) because the classes under test are value-level,
not volume-level.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from tools.driver_sim import _canon, _cell_repr

from trafficbigdatasearch_spark.operators import joins as J
from trafficbigdatasearch_spark.operators import timeseries as TS
from trafficbigdatasearch_spark.queries._shared import _dsum

#: Example budget per property; raise for soak runs, e.g.
#: ``SPARK_GRAFT_FUZZ_EXAMPLES=50 pytest tests/test_oracle_fuzz.py``.
_EXAMPLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "8"))

FUZZ = settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: For properties whose single example runs multiple full pipelines.
FUZZ_HEAVY = settings(
    max_examples=max(2, _EXAMPLES // 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _duck(frames: dict[str, pd.DataFrame]):
    import duckdb

    con = duckdb.connect()
    for name, pdf in frames.items():
        con.register(name, pdf)
    return con


def _oracle_df(frames: dict[str, pd.DataFrame], sql: str) -> pd.DataFrame:
    """Run one oracle query and ALWAYS close the native connection — a
    failing hypothesis example must not leak a duckdb handle per shrink
    iteration (review r13)."""
    con = _duck(frames)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _assert_match(sdf: pd.DataFrame, ddf: pd.DataFrame, ctx: str) -> None:
    """The driver's compare: column-name set, row count, then cell-by-cell
    dtype-strict repr equality over the canonical (sorted) form."""
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in ddf.columns
    ), f"{ctx}: schema {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    assert len(sdf) == len(ddf), f"{ctx}: rows {len(sdf)} vs {len(ddf)}"
    s, d = _canon(sdf), _canon(ddf)
    for i in range(len(s)):
        for j in range(len(s.columns)):
            a, b = s.iat[i, j], d.iat[i, j]
            assert _cell_repr(a) == _cell_repr(b), (
                f"{ctx}: col={s.columns[j]} row={i} "
                f"spark={_cell_repr(a)!r} vs oracle={_cell_repr(b)!r}"
            )




def _rows(df):
    """Collected rows as a None-safe sorted list of tuples (NULL cells sort
    last within their column, so multisets compare deterministically)."""
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, 0 if v is None else v) for v in t),
    )


# ---------------------------------------------------------------------------
# 1. Ordered aggregates: duplicate timestamps + negative ids
# ---------------------------------------------------------------------------


@given(seed=st.integers(min_value=0, max_value=10_000))
@FUZZ
def test_ohlc_random_ties_and_negative_ids_match_duckdb(spark, seed):
    """resample_ohlc's struct ordering key vs the negative-id-safe DuckDB
    recipe ``first/last(v ORDER BY epoch_ms(ts), id)`` under adversarial
    draws: many rows collapsed onto FEW distinct timestamps (forced ties,
    so the id leg of the key decides winners) and ids sign-flipped at
    random (the exact class where the HUGEINT pack inverts order —
    operators/timeseries.py:32 docstring)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 80))
    # few distinct instants -> guaranteed (key, ts) collisions
    instants = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 8, size=n) * 17, unit="m"
    )
    ids = rng.permutation(np.arange(1, n + 1))
    flip = rng.random(n) < 0.5
    ids = np.where(flip, -ids, ids).astype(np.int64)
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 3, size=n).astype(np.int64),
            "ts": instants,
            "id": ids,
            "v": np.round(rng.uniform(-50, 50, size=n), 2),
        }
    )
    sdf = TS.resample_ohlc(
        spark.createDataFrame(pdf), "k", "ts", "v", "id", bucket="hour"
    ).toPandas()
    ddf = _oracle_df(
        {"t": pdf},
        """
        SELECT k, date_trunc('hour', ts) AS bucket,
               first(v ORDER BY epoch_ms(ts), id) AS open,
               max(v) AS high, min(v) AS low,
               last(v ORDER BY epoch_ms(ts), id) AS close,
               count(*) AS volume
        FROM t GROUP BY k, date_trunc('hour', ts)
        """
    )
    _assert_match(sdf, ddf, f"ohlc seed={seed}")


# ---------------------------------------------------------------------------
# 2. As-of join: tolerance is nearest-candidate-then-null
# ---------------------------------------------------------------------------


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    direction=st.sampled_from(["backward", "forward"]),
    with_tol=st.booleans(),
)
@FUZZ
def test_asof_tolerance_matches_duckdb_lateral(spark, seed, direction, with_tol):
    """asof_join vs a DuckDB LATERAL oracle that mirrors the contract
    EXACTLY: elect the nearest candidate IGNORING tolerance, then null the
    value when the elected row's gap exceeds it (joins.py:84 — a farther
    in-tolerance row is never \"better\").  A naive oracle that filters by
    tolerance INSIDE the candidate election would diverge on draws where
    the nearest row is out of tolerance but an older one is in — the fuzz
    generates dense right sides so those draws occur."""
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(15, 40)), int(rng.integers(15, 40))
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, size=nl).astype(np.int64),
            "lt": rng.integers(0, 200, size=nl).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, size=nr).astype(np.int64),
            "rt": rng.integers(0, 200, size=nr).astype(np.int64),
            "rv": np.round(rng.uniform(0, 10, size=nr), 2),
        }
    )
    tol = int(rng.integers(1, 40)) if with_tol else None
    sdf = J.asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on=["k"],
        left_ts="lt",
        right_ts="rt",
        direction=direction,
        right_cols=["rv"],
        tolerance=tol,
    ).toPandas()
    cmp_op, order, gap = (
        ("<=", "DESC", "l.lt - r1.rt")
        if direction == "backward"
        else (">=", "ASC", "r1.rt - l.lt")
    )
    tol_case = (
        f"CASE WHEN ({gap}) <= {tol} THEN r1.rv END"
        if tol is not None
        else "r1.rv"
    )
    ddf = _oracle_df(
        {"l": left, "r": right},
        f"""
        SELECT l.k, l.lt, {tol_case} AS rv
        FROM l LEFT JOIN LATERAL (
          SELECT rt, rv FROM r
          WHERE r.k = l.k AND r.rt {cmp_op} l.lt
          ORDER BY r.rt {order}, rv DESC LIMIT 1
        ) r1 ON TRUE
        """
    )
    _assert_match(sdf, ddf, f"asof seed={seed} dir={direction} tol={tol}")


# ---------------------------------------------------------------------------
# 3. Interval containment: endpoint semantics on touching intervals
# ---------------------------------------------------------------------------


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    closed=st.sampled_from(["both", "left", "right", "neither"]),
)
@FUZZ
def test_interval_join_endpoints_match_duckdb(spark, seed, closed):
    """interval_join's four ``closed`` modes vs literal DuckDB range
    predicates, on draws engineered to land points EXACTLY on interval
    endpoints (times and bounds share one small integer lattice) and to
    include degenerate lo == hi intervals — the rows where the four modes
    actually differ."""
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(20, 50)), int(rng.integers(8, 20))
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 2, size=nl).astype(np.int64),
            "t": rng.integers(0, 15, size=nl).astype(np.int64),
        }
    )
    lo = rng.integers(0, 15, size=nr).astype(np.int64)
    width = rng.integers(0, 5, size=nr).astype(np.int64)  # 0 => degenerate
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 2, size=nr).astype(np.int64),
            "lo": lo,
            "hi": lo + width,
            "tag": np.arange(nr, dtype=np.int64),
        }
    )
    ops = {
        "both": (">=", "<="),
        "left": (">=", "<"),
        "right": (">", "<="),
        "neither": (">", "<"),
    }[closed]
    sdf = (
        J.interval_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right.rename(columns={"k": "rk"})),
            on=None,
            left_ts="t",
            right_lo="lo",
            right_hi="hi",
            closed=closed,
        )
        .filter("k = rk")
        .select("k", "t", "lo", "hi", "tag")
        .toPandas()
    )
    ddf = _oracle_df(
        {"l": left, "r": right},
        f"""
        SELECT l.k, l.t, r.lo, r.hi, r.tag
        FROM l JOIN r ON l.k = r.k
         AND l.t {ops[0]} r.lo AND l.t {ops[1]} r.hi
        """
    )
    _assert_match(sdf, ddf, f"interval seed={seed} closed={closed}")


# ---------------------------------------------------------------------------
# 4. The 2-decimal money contract across rounding-boundary magnitudes
# ---------------------------------------------------------------------------


@given(seed=st.integers(min_value=0, max_value=10_000))
@FUZZ
def test_money_sum_two_decimal_contract_matches_duckdb(spark, seed):
    """_dsum (Spark HALF_UP round(x*100)) vs the oracle recipe (DuckDB
    half-even round) agree for EVERY 2-decimal money value — the contract
    _shared.py:74 states.  The engines' rounding modes differ only on
    exact .5 inputs, which a 2-decimal x can never hand to round(x*100)
    (the float product lands near-integer, never near-half).  The fuzz
    draws cent values across magnitudes up to 10^7 including the .x5 /
    .x0 boundary cents where the float product error is largest."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 150))
    mag = 10.0 ** rng.integers(0, 8, size=n)
    cents = rng.integers(0, 100, size=n)
    # force a healthy share of boundary cents (x.x5, x.x0)
    boundary = rng.random(n) < 0.5
    cents[boundary] = rng.choice(
        [5, 10, 15, 25, 50, 75, 95], size=int(boundary.sum())
    )
    vals = np.round(np.floor(rng.uniform(0, 1, size=n) * mag) + cents / 100.0, 2)
    sign = np.where(rng.random(n) < 0.3, -1.0, 1.0)
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 4, size=n).astype(np.int64),
            "x": vals * sign,
        }
    )


    sdf = (
        spark.createDataFrame(pdf)
        .groupBy("g")
        .agg(_dsum(F.col("x")).alias("total"))
        .toPandas()
    )
    ddf = _oracle_df(
        {"t": pdf},
        """
        SELECT g, CAST(SUM(CAST(round(x * 100) AS BIGINT)) AS DOUBLE) / 100
                 AS total
        FROM t GROUP BY g
        """
    )
    _assert_match(sdf, ddf, f"money seed={seed}")


# ---------------------------------------------------------------------------
# 5. Gap-fill: spine + forward-fill at random sparsity and bucket width
# ---------------------------------------------------------------------------


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    bucket=st.sampled_from(["hour", "day"]),
)
@FUZZ
def test_gapfill_random_sparsity_matches_duckdb(spark, seed, bucket):
    """gapfill_ffill vs the parameterized DuckDB spine oracle (the
    ts_gapfill oracle generalized over the bucket unit and rewritten onto
    the negative-id-safe ordered-aggregate recipe).  Random sparsity makes
    interior gaps of random widths; sign-flipped ids force the close
    election through the struct key's negative-id branch."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 60))
    step = {"hour": 47, "day": 1440 + 313}[bucket]  # minutes; irregular
    instants = pd.Timestamp("2024-05-01") + pd.to_timedelta(
        np.sort(rng.choice(np.arange(0, 40) * step, size=n)), unit="m"
    )
    ids = rng.permutation(np.arange(1, n + 1))
    ids = np.where(rng.random(n) < 0.4, -ids, ids).astype(np.int64)
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 3, size=n).astype(np.int64),
            "ts": instants,
            "id": ids,
            "v": np.round(rng.uniform(0, 100, size=n), 2),
        }
    )
    sdf = TS.gapfill_ffill(
        spark.createDataFrame(pdf), "k", "ts", "v", "id", bucket=bucket
    ).toPandas()
    ddf = _oracle_df(
        {"t": pdf},
        f"""
        WITH closes AS (
          SELECT k, date_trunc('{bucket}', ts) AS bucket,
                 last(v ORDER BY epoch_ms(ts), id) AS _close
          FROM t GROUP BY k, date_trunc('{bucket}', ts)),
        spine AS (
          SELECT k, unnest(generate_series(min(bucket), max(bucket),
                                           INTERVAL 1 {bucket})) AS bucket
          FROM closes GROUP BY k)
        SELECT s.k, s.bucket,
               last_value(c._close IGNORE NULLS) OVER (
                 PARTITION BY s.k ORDER BY s.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
               CAST(CASE WHEN c._close IS NOT NULL THEN 1 ELSE 0 END
                    AS INTEGER) AS is_observed
        FROM spine s LEFT JOIN closes c
          ON c.k = s.k AND c.bucket = s.bucket
        """
    )
    _assert_match(sdf, ddf, f"gapfill seed={seed} bucket={bucket}")


def _rand_texts(rng, n, vocab, lo=5, hi=12):
    return [
        " ".join(rng.choice(vocab, size=int(rng.integers(lo, hi))))
        for _ in range(n)
    ]


# ---------------------------------------------------------------------------
# 6. Blocking / rewrite invariances: the scale-path operator must be
#    row-identical to its brute twin for EVERY parameter draw
# ---------------------------------------------------------------------------


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    width=st.integers(min_value=1, max_value=40),
)
@FUZZ
def test_bucketed_interval_join_lossless_for_any_width(spark, seed, width):
    """bucketed_interval_join's time-bucket blocking is semantics-free: for
    ANY bucket width it must return exactly interval_join(closed='both')
    (joins.py:50 — the width only tunes the candidate volume).  Random
    widths from degenerate (1 unit: every interval explodes into many
    buckets) to oversized (wider than the whole time axis: one bucket,
    near-cross-join candidates) hit both ends of the explode."""
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(20, 50)), int(rng.integers(8, 20))
    left = pd.DataFrame(
        {"t": rng.integers(0, 100, size=nl).astype(np.int64),
         "lid": np.arange(nl, dtype=np.int64)}
    )
    lo = rng.integers(0, 100, size=nr).astype(np.int64)
    right = pd.DataFrame(
        {"lo": lo, "hi": lo + rng.integers(0, 30, size=nr).astype(np.int64),
         "rid": np.arange(nr, dtype=np.int64)}
    )
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    cols = ["lid", "rid", "t", "lo", "hi"]
    got = sorted(
        map(tuple, J.bucketed_interval_join(l, r, "t", "lo", "hi", width)
            .select(*cols).collect())
    )
    want = sorted(
        map(tuple, J.interval_join(l, r, None, "t", "lo", "hi", closed="both")
            .select(*cols).collect())
    )
    assert got == want, f"width={width} seed={seed}: {len(got)} vs {len(want)}"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_salts=st.integers(min_value=1, max_value=13),
    how=st.sampled_from(["inner", "left"]),
)
@FUZZ
def test_salted_join_identical_to_plain_for_any_salt_count(
    spark, seed, n_salts, how
):
    """salted_equi_join must be row-identical (multiset) to the plain equi
    join for ANY salt count and join type it supports (joins.py:226) —
    the salt only re-partitions.  Draws force heavy skew (80 % of large
    rows on one key) and unmatched keys on both sides so 'left' exercises
    null-extension under replication."""
    rng = np.random.default_rng(seed)
    nb, ns = int(rng.integers(40, 100)), int(rng.integers(5, 15))
    hot = rng.random(nb) < 0.8
    big = pd.DataFrame(
        {"k": np.where(hot, 0, rng.integers(0, 10, size=nb)).astype(np.int64),
         "payload": rng.integers(0, 1000, size=nb).astype(np.int64)}
    )
    small = pd.DataFrame(
        {"k": rng.choice(np.arange(-4, 12), size=ns, replace=False).astype(np.int64),
         "dim": rng.integers(0, 100, size=ns).astype(np.int64)}
    )
    b, s = spark.createDataFrame(big), spark.createDataFrame(small)
    got = sorted(
        map(tuple, J.salted_equi_join(b, s, ["k"], n_salts=n_salts, how=how)
            .select("k", "payload", "dim").collect())
    )
    want = sorted(
        map(tuple, b.join(s, ["k"], how).select("k", "payload", "dim").collect())
    )
    assert got == want, f"n_salts={n_salts} how={how} seed={seed}"


@given(seed=st.integers(min_value=0, max_value=10_000))
@FUZZ
def test_or_key_union_join_matches_duckdb_or_predicate(spark, seed):
    """union_of_joins_on_either_key vs DuckDB's literal OR-predicate join
    (joins.py:540 — J3's fixed form).  Draws include NULL first keys (the
    coalesce subtlety: ~NULL would silently drop a second-key match),
    rows matching BOTH keys (must appear once), and keys matching
    neither."""
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(20, 50)), int(rng.integers(10, 30))
    left = pd.DataFrame(
        {"k": rng.integers(0, 12, size=nl).astype(np.int64),
         "lid": np.arange(nl, dtype=np.int64)}
    )
    a = rng.integers(0, 12, size=nr).astype(np.float64)
    a[rng.random(nr) < 0.3] = np.nan  # NULL first keys
    right = pd.DataFrame(
        {"a": a, "b": rng.integers(0, 12, size=nr).astype(np.int64),
         "rid": np.arange(nr, dtype=np.int64)}
    )
    l = spark.createDataFrame(left)
    r = spark.createDataFrame(right).withColumn(
        "a", F.col("a").cast("bigint")
    )
    sdf = (
        J.union_of_joins_on_either_key(l, r, "k", ("a", "b"))
        .select("lid", "rid")
        .toPandas()
    )
    ddf = _oracle_df(
        {"l": left, "r": right},
        """
        SELECT l.lid, r.rid
        FROM l JOIN r ON l.k = CAST(r.a AS BIGINT) OR l.k = r.b
        """
    )
    _assert_match(sdf, ddf, f"or-key seed={seed}")


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    radius=st.integers(min_value=1, max_value=25),
)
@FUZZ
def test_radius_pairs_grid_blocking_lossless_vs_duckdb_bruteforce(
    spark, seed, radius
):
    """radius_pairs' 3x3 grid-cell blocking vs the DuckDB brute-force
    distance self-join, for random radii and clustered point clouds
    (spatial.py:56 — the explode+equi-join must find EVERY within-radius
    pair, including pairs straddling cell boundaries, which the draws
    force by clustering points around lattice multiples of the radius)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 60))
    # cluster around cell-boundary lattice points so cross-cell pairs abound
    centers = rng.integers(0, 5, size=(n, 2)) * radius
    pts = centers + rng.integers(-2, 3, size=(n, 2))
    pts = np.clip(pts, 0, None)
    pdf = pd.DataFrame(
        {"id": np.arange(n, dtype=np.int64),
         "x": pts[:, 0].astype(np.int64),
         "y": pts[:, 1].astype(np.int64)}
    )
    from trafficbigdatasearch_spark.operators import spatial as SP

    sdf = SP.radius_pairs(
        spark.createDataFrame(pdf), "id", "x", "y", radius
    ).toPandas()
    ddf = _oracle_df(
        {"p": pdf},
        f"""
        SELECT a.id AS id_a, b.id AS id_b,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
        FROM p a JOIN p b ON a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= {radius * radius}
        """
    )
    _assert_match(sdf, ddf, f"radius seed={seed} r={radius}")


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_bits=st.sampled_from([64, 256, 1024, 4096]),
    n_hashes=st.integers(min_value=1, max_value=5),
)
@FUZZ
def test_bloom_joins_exact_for_any_bitmap_size(spark, seed, n_bits, n_hashes):
    """bloom_semi_join / bloom_anti_join must be row-identical to the plain
    left_semi / left_anti join for ANY bitmap geometry (joins.py:474,507) —
    undersized bitmaps only raise the false-positive rate, never change
    the answer.  Draws use tiny bitmaps (64 bits against ~30 keys: most
    probes collide) so the exact-join cleanup actually carries the result,
    and NULL keys on the large side to pin the anti join's NULL lane
    (hashable, must SURVIVE left_anti)."""
    rng = np.random.default_rng(seed)
    nb, nk = int(rng.integers(40, 100)), int(rng.integers(10, 30))
    kvals = rng.integers(0, 50, size=nb).astype(np.float64)
    kvals[rng.random(nb) < 0.15] = np.nan  # NULL keys in the large side
    big = pd.DataFrame(
        {"k": kvals, "payload": np.arange(nb, dtype=np.int64)}
    )
    keys = pd.DataFrame({"k": rng.integers(0, 50, size=nk).astype(np.float64)})
    b = spark.createDataFrame(big).withColumn("k", F.col("k").cast("bigint"))
    kd = spark.createDataFrame(keys).withColumn("k", F.col("k").cast("bigint"))
    got_semi = _rows(J.bloom_semi_join(b, kd, "k", n_bits=n_bits,
                                       n_hashes=n_hashes))
    want_semi = _rows(b.join(kd.select("k").distinct(), "k", "left_semi"))
    assert got_semi == want_semi, f"semi {seed}/{n_bits}/{n_hashes}"
    got_anti = _rows(J.bloom_anti_join(b, kd, "k", n_bits=n_bits,
                                       n_hashes=n_hashes))
    want_anti = _rows(b.join(kd.select("k").distinct(), "k", "left_anti"))
    assert got_anti == want_anti, f"anti {seed}/{n_bits}/{n_hashes}"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    k=st.sampled_from([8, 16]),
    bands=st.sampled_from([2, 4]),
)
@FUZZ_HEAVY
def test_incremental_dedup_index_path_invariant(spark, seed, k, bands):
    """incremental_dedup's persisted-index arrangement must give verdicts
    identical to the re-shingling path for ANY (k, bands) — the index is
    a cache, not a semantics knob (dedup.py:819).  And every 'exact'
    verdict must coincide with literal text membership in the corpus (the
    fingerprint is content-determined).  Draws plant exact duplicates and
    one-word-perturbed near duplicates in random proportions."""
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "bravo", "carol", "delta", "echo", "fox", "golf",
             "hotel", "india", "jazz"]
    nc = int(rng.integers(8, 20))
    corpus_texts = _rand_texts(rng, nc, vocab, lo=6, hi=14)
    new_texts = []
    for _ in range(int(rng.integers(5, 12))):
        u = rng.random()
        if u < 0.3:  # exact dup of a corpus doc
            new_texts.append(corpus_texts[int(rng.integers(0, nc))])
        elif u < 0.6:  # near dup: perturb one word
            w = corpus_texts[int(rng.integers(0, nc))].split()
            w[int(rng.integers(0, len(w)))] = "zulu"
            new_texts.append(" ".join(w))
        else:
            new_texts.append(_rand_texts(rng, 1, vocab, lo=6, hi=14)[0])
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(nc, dtype=np.int64),
                      "text": corpus_texts})
    )
    new = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(len(new_texts), dtype=np.int64),
                      "text": new_texts})
    )
    from trafficbigdatasearch_spark.operators import dedup as D

    plain = sorted(map(tuple, D.incremental_dedup(
        new, corpus, k=k, bands=bands).collect()))
    idx = D.minhash_band_buckets(corpus, "doc_id", "text", k, bands, 3)
    via_index = sorted(map(tuple, D.incremental_dedup(
        new, corpus, k=k, bands=bands, corpus_index=idx).collect()))
    assert plain == via_index, f"index path diverged seed={seed}"
    corpus_set = set(corpus_texts)
    verdicts = dict(plain)
    for i, t in enumerate(new_texts):
        if t in corpus_set:
            assert verdicts[i] == "exact", f"doc {i} seed={seed}: {verdicts[i]}"
        else:
            assert verdicts[i] != "exact", f"doc {i} seed={seed} false exact"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    band_bits=st.sampled_from([2, 4, 8]),
    max_hamming=st.integers(min_value=0, max_value=3),
)
@FUZZ
def test_hamming_banding_complete_vs_duckdb_bruteforce(
    spark, seed, band_bits, max_hamming
):
    """hamming_pairs' band blocking vs the DuckDB all-pairs
    bit_count(xor) filter (dedup.py:1010): complete by pigeonhole for
    max_hamming < n_bands, so for EVERY (band_bits, max_hamming) draw the
    banded result must EQUAL brute force.  Draws build clusters of
    near-identical 16-bit fingerprints (random base, few bits flipped) so
    in-threshold pairs abound at every distance 0..3.  The bucket-size
    guard is disabled — it is a documented recall knob, not part of the
    exactness contract."""
    n_bits = 16
    n_bands = n_bits // band_bits
    assume(max_hamming < n_bands)  # operator raises by contract otherwise
    rng = np.random.default_rng(seed)
    n_clusters = int(rng.integers(3, 7))
    rows = []
    i = 0
    for _ in range(n_clusters):
        base = int(rng.integers(0, 1 << n_bits))
        for _ in range(int(rng.integers(2, 6))):
            h = base
            for _ in range(int(rng.integers(0, 4))):
                h ^= 1 << int(rng.integers(0, n_bits))
            rows.append((i, h))
            i += 1
    pdf = pd.DataFrame(rows, columns=["id", "simhash"]).astype(np.int64)
    from trafficbigdatasearch_spark.operators import dedup as D

    sdf = D.hamming_pairs(
        spark.createDataFrame(pdf), n_bits=n_bits, band_bits=band_bits,
        max_hamming=max_hamming, max_bucket_size=None,
    ).toPandas()
    ddf = _oracle_df(
        {"f": pdf},
        f"""
        SELECT a.id AS id_a, b.id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM f a JOIN f b ON a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
        """
    )
    _assert_match(sdf, ddf, f"hamming seed={seed} bb={band_bits} d={max_hamming}")


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    width=st.integers(min_value=1, max_value=40),
)
@FUZZ
def test_interval_overlap_join_exactly_once_for_any_width(spark, seed, width):
    """interval_overlap_join's claim-one-bucket dedup vs the literal DuckDB
    overlap predicate (joins.py:274): for ANY bucket width each
    overlapping pair must appear EXACTLY once — the claim expression, not
    a distinct, carries the guarantee, so a width that splits an
    intersection across many buckets is the adversarial case.  Draws
    include degenerate (point) intervals and touching endpoints."""
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(10, 30)), int(rng.integers(10, 30))
    llo = rng.integers(0, 80, size=nl).astype(np.int64)
    left = pd.DataFrame(
        {"llo": llo, "lhi": llo + rng.integers(0, 25, size=nl).astype(np.int64),
         "lid": np.arange(nl, dtype=np.int64)}
    )
    rlo = rng.integers(0, 80, size=nr).astype(np.int64)
    right = pd.DataFrame(
        {"rlo": rlo, "rhi": rlo + rng.integers(0, 25, size=nr).astype(np.int64),
         "rid": np.arange(nr, dtype=np.int64)}
    )
    sdf = (
        J.interval_overlap_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            "llo", "lhi", "rlo", "rhi", bucket_width=width,
        )
        .select("lid", "rid")
        .toPandas()
    )
    ddf = _oracle_df(
        {"l": left, "r": right},
        """
        SELECT l.lid, r.rid
        FROM l JOIN r ON l.llo <= r.rhi AND r.rlo <= l.lhi
        """
    )
    _assert_match(sdf, ddf, f"overlap seed={seed} width={width}")


# ---------------------------------------------------------------------------
# 7. Incremental / cross-corpus / full-probe paths must agree with their
#    batch and brute twins
# ---------------------------------------------------------------------------


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    k=st.sampled_from([8, 16]),
    bands=st.sampled_from([2, 4]),
)
@FUZZ_HEAVY
def test_cross_corpus_pairs_equal_union_lsh_cross_subset(spark, seed, k, bands):
    """cross_corpus_pairs(A, B) must equal minhash_lsh_pairs(A ∪ B)
    restricted to cross pairs, for any (k, bands) with the skew caps
    disabled (dedup.py:1249 — both sides band with the SAME signature
    scheme, so meeting in the (band, bucket) join is exactly sharing a
    bucket in the union).  Ids are disjoint ranges so the restriction is
    a literal id-range split."""
    rng = np.random.default_rng(seed)
    vocab = ["red", "blue", "green", "gold", "iron", "wood", "salt",
             "moon", "star", "rain"]
    na, nb_ = int(rng.integers(6, 14)), int(rng.integers(6, 14))
    ta = _rand_texts(rng, na, vocab)
    tb = _rand_texts(rng, nb_, vocab)
    # plant shared/near docs across corpora so cross pairs exist
    for _ in range(int(rng.integers(1, 4))):
        tb[int(rng.integers(0, nb_))] = ta[int(rng.integers(0, na))]
    A = spark.createDataFrame(pd.DataFrame(
        {"doc_id": np.arange(na, dtype=np.int64), "text": ta}))
    B = spark.createDataFrame(pd.DataFrame(
        {"doc_id": np.arange(nb_, dtype=np.int64) + 1000, "text": tb}))
    from trafficbigdatasearch_spark.operators import dedup as D

    got = sorted(
        map(tuple, D.cross_corpus_pairs(A, B, k=k, bands=bands,
                                        max_bucket_size=None).collect())
    )
    union_pairs = D.minhash_lsh_pairs(
        A.unionByName(B), k=k, bands=bands, max_bucket_size=None
    ).collect()
    want = sorted(
        (a, b) for a, b in map(tuple, union_pairs) if a < 1000 <= b
    )
    assert got == want, f"seed={seed} k={k} bands={bands}"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    band_bits=st.sampled_from([2, 4]),
    max_hamming=st.integers(min_value=0, max_value=3),
)
@FUZZ
def test_incremental_hamming_equal_batch_cross_subset(
    spark, seed, band_bits, max_hamming
):
    """hamming_pairs_incremental(corpus, new) must equal
    hamming_pairs(corpus ∪ new) restricted to cross pairs
    (dedup.py:1116) — the broadcast-the-increment plan is a join
    DIRECTION choice, never a semantics choice."""
    rng = np.random.default_rng(seed)
    n_bits = 16

    def _fps(n, base_ids):
        out = []
        for j in range(n):
            h = int(rng.integers(0, 1 << n_bits))
            if j % 3 == 0 and out:
                h = out[-1][1] ^ (1 << int(rng.integers(0, n_bits)))
            out.append((base_ids + j, h))
        return out

    nc, nn = int(rng.integers(8, 20)), int(rng.integers(4, 10))
    corpus_rows = _fps(nc, 0)
    new_rows = _fps(nn, 1000)
    # plant near-dups across the split
    for _ in range(int(rng.integers(1, 4))):
        ci = int(rng.integers(0, nc))
        ni = int(rng.integers(0, nn))
        new_rows[ni] = (
            new_rows[ni][0],
            corpus_rows[ci][1] ^ (1 << int(rng.integers(0, n_bits))),
        )
    cdf = spark.createDataFrame(
        pd.DataFrame(corpus_rows, columns=["id", "simhash"]).astype(np.int64))
    ndf = spark.createDataFrame(
        pd.DataFrame(new_rows, columns=["id", "simhash"]).astype(np.int64))
    from trafficbigdatasearch_spark.operators import dedup as D

    got = sorted(
        (int(r["corpus_id"]), int(r["new_id"]), int(r["hamming"]))
        for r in D.hamming_pairs_incremental(
            cdf, ndf, n_bits=n_bits, band_bits=band_bits,
            max_hamming=max_hamming).collect()
    )
    full = D.hamming_pairs(
        cdf.unionByName(ndf), n_bits=n_bits, band_bits=band_bits,
        max_hamming=max_hamming, max_bucket_size=None).collect()
    want = sorted(
        (int(r["id_a"]), int(r["id_b"]), int(r["hamming"]))
        for r in full if r["id_a"] < 1000 <= r["id_b"]
    )
    assert got == want, f"seed={seed} bb={band_bits} d={max_hamming}"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    stride=st.sampled_from([3, 7, 11]),
)
@FUZZ
def test_ivf_full_probe_equals_brute_force(spark, seed, stride):
    """ivf_topk with nprobe >= n_cells must return EXACTLY
    brute_force_topk (similarity.py:146): probing every cell scans the
    whole corpus, and both paths share the quantized scorer and the
    (score DESC, neighbor_id ASC) tie-break — IVF's recall loss is
    entirely the probe subset, never the rerank.  Random corpora, random
    deterministic-sample centroid strides."""
    rng = np.random.default_rng(seed)
    n, dim = int(rng.integers(20, 50)), 8
    vecs = np.round(rng.normal(0, 1, size=(n, dim)), 3)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": [[float(x) for x in row] for row in vecs]}
    )
    corpus = spark.createDataFrame(pdf)
    queries = corpus.filter(F.col("vec_id") < 5)  # deterministic, not limit()
    from trafficbigdatasearch_spark.operators import similarity as S

    got = sorted(map(tuple, S.ivf_topk(
        corpus, queries, k=4, nprobe=10_000, centroid_stride=stride
    ).collect()))
    want = sorted(map(tuple, S.brute_force_topk(
        corpus, queries, k=4).collect()))
    assert got == want, f"seed={seed} stride={stride}"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    stride=st.sampled_from([5, 9]),
    nprobe=st.integers(min_value=1, max_value=4),
)
@FUZZ_HEAVY
def test_ivf_append_equals_rebuild_for_any_split(
    spark, tmp_path_factory, seed, stride, nprobe
):
    """build_ivf_index + ivf_index_append must answer ivf_topk_indexed
    IDENTICALLY to a full rebuild over corpus ∪ batch at the same fixed
    centroids, for ANY split point, stride, and nprobe
    (similarity.py:339 — assignment is per-vector independent, so the
    append path differs only in file layout).  The fuzz generalizes the
    sim_ivf_append oracle row from one fixed split to random ones."""
    rng = np.random.default_rng(seed)
    n, dim = int(rng.integers(24, 48)), 8
    vecs = np.round(rng.normal(0, 1, size=(n, dim)), 3)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": [[float(x) for x in row] for row in vecs]}
    )
    cut = int(rng.integers(8, n - 8))
    union = spark.createDataFrame(pdf)
    head = spark.createDataFrame(pdf.iloc[:cut])
    tail = spark.createDataFrame(pdf.iloc[cut:])
    cents = union.filter((F.col("vec_id") % stride) == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    queries = union.filter(F.col("vec_id") < 4)  # deterministic, not limit()
    from trafficbigdatasearch_spark.operators import similarity as S

    base = tmp_path_factory.mktemp(f"ivf{seed}_{stride}_{nprobe}")
    p1, p2 = str(base / "appended"), str(base / "rebuilt")
    S.build_ivf_index(head, p1, centroids=cents)
    S.ivf_index_append(spark, p1, tail)
    S.build_ivf_index(union, p2, centroids=cents)
    got = sorted(map(tuple, S.ivf_topk_indexed(
        spark, p1, queries, k=4, nprobe=nprobe).collect()))
    want = sorted(map(tuple, S.ivf_topk_indexed(
        spark, p2, queries, k=4, nprobe=nprobe).collect()))
    assert got == want, f"seed={seed} cut={cut} stride={stride} np={nprobe}"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    budget=st.integers(min_value=1, max_value=60),
    bucket_size=st.sampled_from([1, 3, 7, 64]),
    nparts=st.integers(min_value=1, max_value=9),
)
@FUZZ
def test_pack_sequences_matches_sequential_tape_any_partitioning(
    spark, seed, budget, bucket_size, nparts
):
    """pack_sequences' two-level distributed prefix sum vs a sequential
    pure-python tape, for ANY (budget, bucket_size, input partitioning)
    draw (packing.py:33) — the bucket summary cumsum plus per-bucket
    window must reproduce the exact global tape, including sparse
    non-contiguous ids (bucket occupancy gaps) and documents larger than
    the whole budget."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(10, 40))
    ids = np.sort(rng.choice(np.arange(0, 500), size=n, replace=False))
    toks = rng.integers(1, 2 * budget + 2, size=n)
    pdf = pd.DataFrame(
        {"doc_id": ids.astype(np.int64), "n_tok": toks.astype(np.int64)}
    )
    from trafficbigdatasearch_spark.operators import packing as P

    got = sorted(map(tuple, P.pack_sequences(
        spark.createDataFrame(pdf).repartition(nparts),
        budget=budget, token_col="n_tok", bucket_size=bucket_size,
    ).collect()))
    tape = 0
    want = []
    for i, t in zip(ids.tolist(), toks.tolist()):
        want.append((i, t, tape // budget, tape % budget))
        tape += t
    assert got == sorted(want), f"seed={seed} b={budget} bs={bucket_size} p={nparts}"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    radius=st.sampled_from([5, 9, 14]),
    min_pts=st.integers(min_value=1, max_value=5),
)
@FUZZ_HEAVY
def test_dbscan_random_parameters_match_reference(spark, seed, radius, min_pts):
    """Distributed DBSCAN (radius_pairs grid join + core test + CC over
    core-core edges + min-id border adoption, spatial.py:101) vs the
    pure-python reference, for random (radius, min_pts) — generalizing
    the fixed-parameter test to the whole parameter box.  Clustered
    clouds keep all three roles (core/border/noise) populated at every
    draw."""
    from tests.test_spatial import _dbscan_reference, _points
    from trafficbigdatasearch_spark.operators import spatial as SP

    rng = np.random.default_rng(seed)
    n_clusters = int(rng.integers(2, 5))
    pts = []
    for _ in range(n_clusters):
        cx, cy = int(rng.integers(10, 110)), int(rng.integers(10, 110))
        for _ in range(int(rng.integers(3, 14))):
            pts.append(
                (max(0, cx + int(rng.integers(-6, 7))),
                 max(0, cy + int(rng.integers(-6, 7))))
            )
    for _ in range(int(rng.integers(2, 6))):  # stragglers -> noise
        pts.append((int(rng.integers(0, 120)), int(rng.integers(0, 120))))
    got = {
        r.id: (r.cluster, r.role)
        for r in SP.dbscan(
            _points(spark, pts), "id", "x", "y", radius, min_pts
        ).collect()
    }
    assert got == _dbscan_reference(pts, radius, min_pts), (
        f"seed={seed} r={radius} min_pts={min_pts} n={len(pts)}"
    )


def _convex_hull_ccw(pts):
    """Monotone chain, strict turns (collinear hull points dropped), CCW."""
    pts = sorted(set(pts))
    if len(pts) < 3:
        return []

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower, upper = half(pts), half(reversed(pts))
    hull = lower[:-1] + upper[:-1]
    return hull if len(hull) >= 3 else []


@given(seed=st.integers(min_value=0, max_value=10_000))
@FUZZ
def test_polygon_join_random_zones_match_reference(spark, seed):
    """point_in_convex_polygon_join vs the pure-python half-plane test for
    random convex zones (hulls of random integer clouds) and random
    points, including points exactly ON edges and vertices (spatial.py:
    232 — boundary inclusive, all-integer, so there is exactly one right
    answer to match)."""
    rng = np.random.default_rng(seed)
    polys = []
    pid = 0
    n_polys = int(rng.integers(2, 5))
    while len(polys) < n_polys:
        cloud = [
            (int(rng.integers(0, 60)), int(rng.integers(0, 60)))
            for _ in range(int(rng.integers(4, 10)))
        ]
        hull = _convex_hull_ccw(cloud)
        if hull:
            polys.append((pid, hull))
            pid += 1
    n = int(rng.integers(30, 70))
    pts = [(int(rng.integers(0, 60)), int(rng.integers(0, 60))) for _ in range(n)]
    # force boundary hits: some points copied from polygon vertices
    for _ in range(5):
        p = polys[int(rng.integers(0, len(polys)))][1]
        pts.append(p[int(rng.integers(0, len(p)))])
    pdf = pd.DataFrame(
        {"id": np.arange(len(pts), dtype=np.int64),
         "x": np.array([p[0] for p in pts], dtype=np.int64),
         "y": np.array([p[1] for p in pts], dtype=np.int64)}
    )
    from trafficbigdatasearch_spark.operators import spatial as SP

    got = sorted(
        map(tuple, SP.point_in_convex_polygon_join(
            spark.createDataFrame(pdf), polys).collect())
    )
    want = []
    for i, (x, y) in enumerate(pts):
        for zid, verts in polys:
            inside = all(
                (bx - ax) * (y - ay) - (by - ay) * (x - ax) >= 0
                for (ax, ay), (bx, by) in zip(verts, verts[1:] + verts[:1])
            )
            if inside:
                want.append((i, zid))
    assert got == sorted(want), f"seed={seed}"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    radius=st.sampled_from([4, 8, 15]),
    k=st.integers(min_value=1, max_value=6),
)
@FUZZ
def test_knn_within_radius_matches_bruteforce(spark, seed, radius, k):
    """knn_within_radius vs a pure-python bounded kNN for random
    (radius, k): the grid join + symmetrize + one ranking window must
    reproduce the exact (dist2, neighbor_id) tie order, under-k points
    return what exists, isolated points return nothing (spatial.py:294)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 50))
    centers = rng.integers(0, 4, size=(n, 2)) * radius
    pts = np.clip(centers + rng.integers(-3, 4, size=(n, 2)), 0, None)
    pdf = pd.DataFrame(
        {"id": np.arange(n, dtype=np.int64),
         "x": pts[:, 0].astype(np.int64), "y": pts[:, 1].astype(np.int64)}
    )
    from trafficbigdatasearch_spark.operators import spatial as SP

    got = sorted(map(tuple, SP.knn_within_radius(
        spark.createDataFrame(pdf), "id", "x", "y", radius, k=k).collect()))
    want = []
    r2 = radius * radius
    for i in range(n):
        cand = sorted(
            (int((pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2), j)
            for j in range(n) if j != i
            if (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2 <= r2
        )
        for rank, (d2, j) in enumerate(cand[:k], start=1):
            want.append((i, j, d2, rank))
    assert got == sorted(want), f"seed={seed} r={radius} k={k}"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    bucket=st.sampled_from(["hour", "day"]),
)
@FUZZ
def test_gapfill_interpolate_random_sparsity_matches_duckdb(spark, seed, bucket):
    """gapfill_interpolate vs the parameterized DuckDB spine+bracketing
    oracle (ts_interpolate's SQL generalized over the bucket unit and
    rewritten onto the negative-id-safe ordered-aggregate recipe).  The
    interpolation is a fixed IEEE op sequence over epoch-millis bigints
    (timeseries.py:225), so random gaps of random widths must match
    bit-for-bit, trailing buckets carry the last value."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 60))
    step = {"hour": 53, "day": 1440 + 401}[bucket]
    instants = pd.Timestamp("2024-07-01") + pd.to_timedelta(
        np.sort(rng.choice(np.arange(0, 35) * step, size=n)), unit="m"
    )
    ids = rng.permutation(np.arange(1, n + 1))
    ids = np.where(rng.random(n) < 0.4, -ids, ids).astype(np.int64)
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 3, size=n).astype(np.int64),
            "ts": instants,
            "id": ids,
            "v": np.round(rng.uniform(-20, 120, size=n), 2),
        }
    )
    sdf = TS.gapfill_interpolate(
        spark.createDataFrame(pdf), "k", "ts", "v", "id", bucket=bucket
    ).toPandas()
    ddf = _oracle_df(
        {"t": pdf},
        f"""
        WITH closes AS (
          SELECT k, date_trunc('{bucket}', ts) AS bucket,
                 last(v ORDER BY epoch_ms(ts), id) AS _close
          FROM t GROUP BY k, date_trunc('{bucket}', ts)),
        spine AS (
          SELECT k, unnest(generate_series(min(bucket), max(bucket),
                                           INTERVAL 1 {bucket})) AS bucket
          FROM closes GROUP BY k),
        j AS (SELECT s.k, s.bucket, c._close
              FROM spine s LEFT JOIN closes c
                ON c.k = s.k AND c.bucket = s.bucket),
        w AS (SELECT k, bucket, _close,
                last_value(_close IGNORE NULLS) OVER (
                  PARTITION BY k ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
                last_value(CASE WHEN _close IS NOT NULL
                                THEN epoch_ms(bucket) END IGNORE NULLS) OVER (
                  PARTITION BY k ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
                first_value(_close IGNORE NULLS) OVER (
                  PARTITION BY k ORDER BY bucket
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
                first_value(CASE WHEN _close IS NOT NULL
                                 THEN epoch_ms(bucket) END IGNORE NULLS) OVER (
                  PARTITION BY k ORDER BY bucket
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1
              FROM j)
        SELECT k, bucket,
               CASE WHEN _close IS NOT NULL THEN _close
                    WHEN t1 IS NULL THEN v0
                    ELSE v0 + (v1 - v0) *
                         ((epoch_ms(bucket) - t0) / (t1 - t0)) END AS value,
               CAST(CASE WHEN _close IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
                 AS is_observed
        FROM w
        """
    )
    _assert_match(sdf, ddf, f"interp seed={seed} bucket={bucket}")


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    chunk_tokens=st.integers(min_value=1, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.99),
)
@FUZZ
def test_chunking_matches_reference_for_any_geometry(
    spark, seed, chunk_tokens, overlap_frac
):
    """chunk_documents vs a pure-python slicer for ANY valid
    (chunk_tokens, overlap) geometry (chunking.py:27): starts at
    0, stride, 2*stride while start < n_tokens, final chunk short,
    tokenless documents produce zero rows.  Draws include chunk_tokens=1
    (stride 1, maximal fan-out), overlap=0 (partition), overlap =
    chunk_tokens-1 (maximal overlap), and empty/whitespace-only docs."""
    overlap = min(int(chunk_tokens * overlap_frac), chunk_tokens - 1)
    rng = np.random.default_rng(seed)
    vocab = ["ax", "bo", "cu", "de", "el", "fi"]
    texts = []
    for _ in range(int(rng.integers(4, 10))):
        u = rng.random()
        if u < 0.15:
            texts.append(rng.choice(["", "   ", "\t \n"]))
        else:
            texts.append(" ".join(rng.choice(vocab, size=int(rng.integers(1, 30)))))
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    from trafficbigdatasearch_spark.operators import chunking as C

    got = sorted(map(tuple, C.chunk_documents(
        spark.createDataFrame(pdf), chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()))
    stride = chunk_tokens - overlap
    want = []
    for i, text in enumerate(texts):
        toks = text.split()
        cid = 0
        s = 0
        while s < len(toks):
            sl = toks[s:s + chunk_tokens]
            want.append((i, cid, " ".join(sl), len(sl)))
            cid += 1
            s += stride
    assert got == sorted(want), f"seed={seed} ct={chunk_tokens} ov={overlap}"


@given(seed=st.integers(min_value=0, max_value=10_000))
@FUZZ
def test_jsonl_clean_quarantine_partition_any_indentation(
    spark, tmp_path_factory, seed
):
    """clean_rows + quarantine_lines must PARTITION a JSONL file for any
    mix of line classes and leading/trailing whitespace (tabs and
    newpage included): valid content objects -> clean only (whatever
    their indentation), malformed / wrong-shape / type-mismatch lines ->
    quarantine only, whitespace-only and contentless {} lines -> neither
    (sources/jsonl.py:76 — the reader-consistency contract the r13 trim
    finding violated)."""
    import json as _json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    rng = np.random.default_rng(seed)
    pads = ["", "\t", "   ", "\t ", " \t\t"]

    def pad():
        return pads[int(rng.integers(0, len(pads)))]

    lines, want_clean, want_quar = [], [], []
    for i in range(int(rng.integers(10, 25))):
        u = rng.random()
        if u < 0.4:
            ln = pad() + _json.dumps({"a": i, "b": f"doc{i}"}) + pad()
            want_clean.append(i)
        elif u < 0.55:
            ln = pad() + "not json " + str(i)
            want_quar.append(ln)
        elif u < 0.65:
            ln = pad() + _json.dumps(["wrong", i])
            want_quar.append(ln)
        elif u < 0.75:
            ln = pad() + _json.dumps({"a": f"notlong{i}", "b": "x"})
            want_quar.append(ln)  # type mismatch: a is string, schema wants long
        elif u < 0.9:
            ln = pads[int(rng.integers(1, len(pads)))]  # whitespace-only
        else:
            ln = pad() + "{}" + pad()  # contentless
        lines.append(ln)
    base = tmp_path_factory.mktemp(f"jl{seed}")
    p = str(base / "f.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    schema = StructType(
        [StructField("a", LongType(), True), StructField("b", StringType(), True)]
    )
    from trafficbigdatasearch_spark.sources import jsonl as JL

    clean = JL.clean_rows(JL.read_jsonl(spark, p, schema))
    got_clean = sorted(r.a for r in clean.collect())
    got_quar = sorted(r.line for r in JL.quarantine_lines(spark, p, schema).collect())
    assert got_clean == sorted(want_clean), f"seed={seed} clean"
    assert got_quar == sorted(want_quar), f"seed={seed} quarantine"


# ---------------------------------------------------------------------------
# 8. Sketch exact phase: partition-independent AND exact for any split,
#    while cardinality stays below retention
# ---------------------------------------------------------------------------


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_slices=st.integers(min_value=1, max_value=7),
)
@FUZZ
def test_hll_merge_exact_below_retention_for_any_split(spark, seed, n_slices):
    """merged_distinct over ANY partition split of the data equals the
    exact python distinct count while cardinality sits in HLL's exact
    phase (sketches.py:34 — the oracle rows' determinism rests on this
    claim; the fixed test pins one split, the fuzz pins random ones).
    Slices are random, uneven, possibly empty."""
    from trafficbigdatasearch_spark.operators import sketches as SK

    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 200))
    vals = rng.integers(0, 400, size=n).astype(np.int64)
    slice_of = rng.integers(0, n_slices, size=n)
    partials = []
    for sidx in range(n_slices):
        sl = vals[slice_of == sidx]
        pdf = pd.DataFrame({"g": np.zeros(len(sl), dtype=np.int64), "v": sl})
        if len(pdf) == 0:
            pdf = pd.DataFrame({"g": pd.Series([], dtype=np.int64),
                                "v": pd.Series([], dtype=np.int64)})
        partials.append(
            SK.distinct_sketch_rollup(spark.createDataFrame(
                pdf, schema="g bigint, v bigint"), ["g"], "v")
        )
    allp = partials[0]
    for p in partials[1:]:
        allp = allp.unionByName(p)
    got = allp.agg(SK.merged_distinct(allp).alias("d")).collect()[0]["d"]
    assert got == len(set(vals.tolist())), f"seed={seed} slices={n_slices}"


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_slices=st.integers(min_value=1, max_value=5),
)
@FUZZ
def test_top_items_merge_exact_below_tracking_for_any_split(
    spark, seed, n_slices
):
    """merged_top_items over ANY split equals the exact python counter
    while distinct items stay below max_items_tracked (sketches.py:121 —
    counts ADD across partials in the exact phase).  k is held >= the
    distinct-item count so the result set is deterministic per the
    operator's documented tie contract."""
    from collections import Counter

    from trafficbigdatasearch_spark.operators import sketches as SK

    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 150))
    items = [f"it{int(x)}" for x in rng.zipf(1.7, size=n) % 12]
    slice_of = rng.integers(0, n_slices, size=n)
    partials = []
    for sidx in range(n_slices):
        sl = [it for it, s in zip(items, slice_of) if s == sidx]
        pdf = pd.DataFrame({"g": np.zeros(len(sl), dtype=np.int64),
                            "v": pd.Series(sl, dtype=str)})
        if len(pdf) == 0:
            pdf = pd.DataFrame({"g": pd.Series([], dtype=np.int64),
                                "v": pd.Series([], dtype=str)})
        partials.append(
            SK.top_items_rollup(spark.createDataFrame(
                pdf, schema="g bigint, v string"), ["g"], "v")
        )
    allp = partials[0]
    for p in partials[1:]:
        allp = allp.unionByName(p)
    exact = Counter(items)
    got = {
        r["item"]: r["n"]
        for r in SK.merged_top_items(allp, k=len(exact) + 5).collect()
    }
    assert got == dict(exact), f"seed={seed} slices={n_slices}"


@given(seed=st.integers(min_value=0, max_value=10_000))
@FUZZ
def test_theta_segment_overlap_exact_below_k(spark, seed):
    """segment_overlap's Theta set algebra equals exact python set algebra
    for random predicates while cardinalities sit below Theta's sub-k
    retention (sketches.py:63) — |A|, |B|, |A ∩ B|, |A \\ B| in one scan
    must be the true set sizes, including empty and disjoint segments."""
    from trafficbigdatasearch_spark.operators import sketches as SK

    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 200))
    pdf = pd.DataFrame(
        {"v": rng.integers(0, 300, size=n).astype(np.int64),
         "x": rng.integers(0, 100, size=n).astype(np.int64)}
    )
    ta, tb = int(rng.integers(0, 110)), int(rng.integers(0, 110))
    got = SK.segment_overlap(
        spark.createDataFrame(pdf), F.col("x") < ta, F.col("x") >= tb, "v"
    ).collect()[0]
    A = set(pdf.v[pdf.x < ta].tolist())
    B = set(pdf.v[pdf.x >= tb].tolist())
    want = (len(A), len(B), len(A & B), len(A - B))
    assert (got.n_a, got.n_b, got.n_intersect, got.n_a_only) == want, (
        f"seed={seed} ta={ta} tb={tb}: {tuple(got)} vs {want}"
    )
