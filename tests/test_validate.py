"""Validation contracts beyond the oracle-gated quality_report query."""

from __future__ import annotations

import os

import pytest

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.operators import validate as VA

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF, "lineitem")


def test_observed_metrics_free_with_write(spark, lineitem, tmp_path):
    """observe(): quality metrics ride the write action itself — the values
    must equal a direct computation, and the only jobs run are the write's."""
    checks = {
        "orderkey_not_null": VA.not_null("l_orderkey"),
        "quantity_range": VA.in_range("l_quantity", 1, 50),
        "returnflag_domain": VA.member_of("l_returnflag", ["A", "N", "R"]),
    }
    odf, obs = VA.observed(lineitem, checks)
    odf.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    direct = {
        r["check"]: r["violations"]
        for r in VA.report(lineitem, checks).collect()
    }
    assert got == direct
    # and the written data is intact
    assert spark.read.parquet(str(tmp_path / "out")).count() == lineitem.count()


def test_report_flags_violations(spark, lineitem):
    """A deliberately-wrong expectation must surface violations > 0 with
    ok = False, without affecting sibling checks."""
    rows = {
        r["check"]: (r["violations"], r["ok"])
        for r in VA.report(
            lineitem,
            {
                "quantity_at_most_10": VA.in_range("l_quantity", 1, 10),
                "orderkey_not_null": VA.not_null("l_orderkey"),
            },
        ).collect()
    }
    bad_n, bad_ok = rows["quantity_at_most_10"]
    assert bad_n > 0 and bad_ok is False
    good_n, good_ok = rows["orderkey_not_null"]
    assert good_n == 0 and good_ok is True


def test_referential_report(spark, lineitem):
    from trafficbigdatasearch_spark.catalog import load_table

    orders = load_table(spark, SF, "orders")
    ok_row = VA.referential_report(
        lineitem, orders, "l_orderkey", "o_orderkey"
    ).first()
    assert ok_row["ok"] is True and ok_row["violations"] == 0

    # drop half the parents -> orphans must surface
    some = orders.filter("o_orderkey % 2 = 0")
    bad_row = VA.referential_report(
        lineitem, some, "l_orderkey", "o_orderkey"
    ).first()
    assert bad_row["ok"] is False and bad_row["violations"] > 0


def test_profile_counts(spark):
    from trafficbigdatasearch_spark.operators import validate as V

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "k bigint, v string"
    )
    got = {r["column_name"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
           for r in V.profile(df, ["k", "v"]).collect()}
    assert got == {"k": (4, 1, 3), "v": (4, 1, 2)}


def test_profile_single_scan(spark):
    """The profile is one aggregate plan over one scan — no per-column
    jobs (the Expand branches for exact distincts all hang off the same
    read)."""
    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import validate as V

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    plan = (
        V.profile(orders, ["o_custkey", "o_orderstatus"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1, plan


def test_profile_hostile_column_names(spark):
    """Names with dots, spaces, hyphens, and quotes must profile fine —
    the unpivot is Column-API-built, never interpolated into SQL text
    (ADVICE r5)."""
    from trafficbigdatasearch_spark.operators import validate as V

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "a")],
        ["dotted.name", "it's a-weird name"],
    )
    got = {r["column_name"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
           for r in V.profile(df, list(df.columns)).collect()}
    assert got == {
        "dotted.name": (3, 1, 2),
        "it's a-weird name": (3, 1, 1),
    }


def test_profile_empty_cols_raises(spark):
    import pytest

    from trafficbigdatasearch_spark.operators import validate as V

    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="at least one column"):
        V.profile(df, [])


def test_enforce_passes_clean_and_raises_on_violation(spark):
    import pytest

    from trafficbigdatasearch_spark.operators import validate as V

    clean = spark.createDataFrame(
        [(1, 5.0, "a"), (2, 7.5, "b")], "k bigint, v double, c string"
    )
    checks = {
        "k_not_null": V.row_not_null("k"),
        "v_range": V.row_in_range("v", 0.0, 10.0),
        "c_member": V.row_member_of("c", ["a", "b"]),
    }
    assert V.enforce(clean, checks).count() == 2

    bad = spark.createDataFrame(
        [(1, 5.0, "a"), (2, 99.0, "b")], "k bigint, v double, c string"
    )
    with pytest.raises(Exception, match="v_range"):
        V.enforce(bad, checks).count()


def test_enforce_survives_projection(spark):
    """The check is a filter, so projecting AWAY the checked column still
    enforces it — the pruning hole a column-attached guard would have."""
    import pytest

    from trafficbigdatasearch_spark.operators import validate as V

    bad = spark.createDataFrame([(1, None)], "k bigint, v double")
    out = V.enforce(bad, {"v_required": V.row_not_null("v")}).select("k")
    with pytest.raises(Exception, match="v_required"):
        out.collect()


def test_enforce_null_semantics_of_range_and_member(spark):
    """row_in_range / row_member_of treat NULL as pass (presence is
    row_not_null's job) so the predicates compose independently."""
    from trafficbigdatasearch_spark.operators import validate as V

    df = spark.createDataFrame([(None, None)], "v double, c string")
    assert (
        V.enforce(
            df,
            {"r": V.row_in_range("v", 0, 1), "m": V.row_member_of("c", ["x"])},
        ).count()
        == 1
    )


def test_row_matches_is_full_match_and_empty_checks_raise(spark):
    import pytest

    from trafficbigdatasearch_spark.operators import validate as V

    df = spark.createDataFrame([("garbage-ABC-junk",)], "code string")
    with pytest.raises(Exception, match="code_fmt"):
        V.enforce(df, {"code_fmt": V.row_matches("code", "[A-Z]{3}")}).count()
    ok = spark.createDataFrame([("ABC",), (None,)], "code string")
    assert V.enforce(ok, {"f": V.row_matches("code", "[A-Z]{3}")}).count() == 2

    with pytest.raises(ValueError, match="at least one check"):
        V.enforce(df, {})


def test_enforce_output_always_clean_even_with_pushdown(spark, tmp_path):
    """The guarantee that matters: whatever plan shape Catalyst picks
    (filters merged/pushed into a parquet scan), no violating row reaches
    the output — either the job raises or the row was filtered out by
    other predicates anyway."""
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.operators import validate as V

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 5.0, "EU"), (2, 99.0, "AS"), (3, 7.0, "EU")],
        "k bigint, v double, region string",
    ).write.parquet(p)
    src = spark.read.parquet(p)
    guarded = V.enforce(src, {"v_range": V.row_in_range("v", 0, 10)})
    try:
        rows = guarded.filter(F.col("region") == "EU").collect()
        assert all(0 <= r["v"] <= 10 for r in rows)
    except Exception:
        pass  # raising is also within contract — bad row reached the check
    # and with no other filters, the violating row must raise
    import pytest

    with pytest.raises(Exception, match="v_range"):
        guarded.collect()


def test_impute_group_median_hand_case(spark):
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.operators import validate as VA

    df = spark.createDataFrame(
        [
            ("a", 1, 1.0), ("a", 2, 3.0), ("a", 3, None),
            ("b", 4, 10.0), ("b", 5, None), ("b", 6, 20.0), ("b", 7, 30.0),
        ],
        "g STRING, id BIGINT, v DOUBLE",
    )
    out = {r["id"]: r for r in VA.impute_group_median(df, "v", ["g"]).collect()}
    assert len(out) == 7                       # repair drops nothing
    assert out[3]["v_filled"] == 2.0           # median of {1, 3}
    assert out[5]["v_filled"] == 20.0          # median of {10, 20, 30}
    assert out[3]["was_null"] == 1 and out[1]["was_null"] == 0
    assert out[1]["v_filled"] == 1.0           # observed rows pass through

    import pytest as _pytest

    with _pytest.raises(ValueError, match="group col"):
        VA.impute_group_median(df, "v", [])


def test_impute_all_null_group_stays_null(spark):
    """A group with no observed values keeps NULL (was_null=1) — never
    borrows another group's median."""
    from trafficbigdatasearch_spark.operators import validate as VA

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("b", 2, None), ("b", 3, None)],
        "g STRING, id BIGINT, v DOUBLE",
    )
    out = {r["id"]: r for r in VA.impute_group_median(df, "v", ["g"]).collect()}
    assert out[2]["v_filled"] is None and out[2]["was_null"] == 1
    assert out[1]["v_filled"] == 5.0


def test_histogram_drift_hand_case_and_new_only_bins(spark):
    """histogram_drift: identical distributions give chi2_term 0 in every
    bin; a shifted distribution produces positive terms; a NEW-ONLY bin
    reports NULL term (infinite-drift signal) instead of divide-by-zero;
    guards reject bad bins."""
    import pytest as _pytest

    from trafficbigdatasearch_spark.operators import validate

    old = spark.createDataFrame(
        [(float(v),) for v in [5, 5, 15, 15]], "value DOUBLE"
    )
    same = validate.histogram_drift(old, old, "value", n_bins=4, bin_width=10)
    for r in same.collect():
        assert r["chi2_term"] == 0.0 and r["n_old"] == r["n_new"]
    # new snapshot doubles the mass in bucket 1 and adds bucket 3 (new-only)
    new = spark.createDataFrame(
        [(float(v),) for v in [5, 15, 15, 35]], "value DOUBLE"
    )
    out = {r["bucket"]: r for r in
           validate.histogram_drift(old, new, "value", n_bins=4, bin_width=10).collect()}
    # bucket 0: n_old=2, n_new=1, e = 4_new_total? totals: old 4, new 4
    # e0 = 4*2/4 = 2 -> term (1-2)^2/2 = 0.5
    assert out[0]["chi2_term"] == 0.5
    # bucket 3 is new-only: expected 0 -> NULL term, counts surfaced
    assert out[3]["n_old"] == 0 and out[3]["n_new"] == 1
    assert out[3]["chi2_term"] is None
    with _pytest.raises(ValueError, match="n_bins"):
        validate.histogram_drift(old, new, "value", n_bins=0)
    with _pytest.raises(ValueError, match="bin_width"):
        validate.histogram_drift(old, new, "value", bin_width=0)


def test_histogram_drift_null_group_is_monitored(spark):
    """Review (r8, second pass): a NULL group must be compared as its own
    group — null-safe joins, not phantom one-sided rows with NULL
    expectations — and the output preserves the NULL group value."""
    from trafficbigdatasearch_spark.operators import validate

    old = spark.createDataFrame(
        [(5.0, None), (5.0, None), (5.0, "a"), (15.0, "a")],
        "value DOUBLE, src STRING",
    )
    out = validate.histogram_drift(
        old, old, "value", n_bins=4, bin_width=10, group_col="src"
    ).collect()
    # identical snapshots: every bin (including the NULL group's) must
    # report a REAL zero-drift comparison
    assert len(out) == 3
    for r in out:
        assert r["n_old"] == r["n_new"] and r["chi2_term"] == 0.0
    null_rows = [r for r in out if r["src"] is None]
    assert len(null_rows) == 1 and null_rows[0]["n_old"] == 2


def test_histogram_drift_excludes_null_values(spark):
    """Advice r8: greatest/least skip NULLs, so floor(NULL) would collapse
    to the lower clamp and silently mix NULL mass into bucket 0 — NULL
    values must be EXCLUDED before binning (NULL-rate monitoring is
    profile's job), leaving bucket 0's counts and chi-square term pure."""
    from trafficbigdatasearch_spark.operators import validate

    old = spark.createDataFrame(
        [(5.0,), (5.0,), (15.0,)], "value DOUBLE"
    )
    # new side carries two NULLs that must not land in bucket 0
    new = spark.createDataFrame(
        [(5.0,), (5.0,), (15.0,), (None,), (None,)], "value DOUBLE"
    )
    out = {r["bucket"]: r for r in
           validate.histogram_drift(old, new, "value", n_bins=4,
                                    bin_width=10).collect()}
    assert set(out) == {0, 1}
    # with NULLs excluded the distributions are identical -> zero drift
    assert out[0]["n_new"] == 2 and out[0]["chi2_term"] == 0.0
    assert out[1]["n_new"] == 1 and out[1]["chi2_term"] == 0.0


def test_gopher_quality_flags_hand_cases(spark):
    """Each Gopher rule trips on its designed offender and passes a clean
    doc; the conjunction requires all five; thresholds are integer
    cross-multiplies (no float comparisons to wobble)."""
    from trafficbigdatasearch_spark.operators import validate

    clean = "the quick brown fox jumps over the lazy dog and runs far " * 5
    rows = [
        (1, clean),                                     # passes all
        (2, "short text only here"),                    # word-count floor
        (3, "a b c d e " * 12 + "the and of to in"),    # mean word len < 3
        (4, ("word " * 54) + "# " * 8),                 # symbol ratio > 0.1
        (5, ("123 456 " * 30) + "the and is"),          # alpha words < 80%
        (6, "lorem ipsum dolor sit amet " * 12),        # < 2 en stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           validate.gopher_quality_flags(docs, min_words=50).collect()}
    assert out[1]["passes"]
    assert not out[2]["ok_word_count"] and not out[2]["passes"]
    assert not out[3]["ok_mean_word_len"] and not out[3]["passes"]
    assert not out[4]["ok_symbol_ratio"] and not out[4]["passes"]
    assert not out[5]["ok_alpha_words"] and not out[5]["passes"]
    assert not out[6]["ok_stopwords"] and not out[6]["passes"]


# ---------------------------------------------------------------------------
# key_skew_profile
# ---------------------------------------------------------------------------


def test_key_skew_profile_hand_case(spark):
    from trafficbigdatasearch_spark.operators import validate

    # 10 keys: nine singletons + one hot key with 91 rows
    rows = [(f"k{i}",) for i in range(9)] + [("hot",)] * 91
    df = spark.createDataFrame(rows, "k: string")
    out = validate.key_skew_profile(df, "k").collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n_keys"] == 10 and r["n_rows"] == 100 and r["max_size"] == 91
    # ceil thresholds: p50 -> 5th key, p90 -> 9th key (both size 1),
    # p99 -> ceil(9.9)=10th key (the hot one)
    assert r["p50_size"] == 1 and r["p90_size"] == 1 and r["p99_size"] == 91
    assert r["max_share_ppm"] == 910000


def test_key_skew_profile_uniform(spark):
    from trafficbigdatasearch_spark.operators import validate

    df = spark.createDataFrame(
        [(i % 5,) for i in range(25)], "k: bigint"
    )
    r = validate.key_skew_profile(df, "k").collect()[0].asDict()
    assert r["n_keys"] == 5 and r["max_size"] == 5
    assert r["p50_size"] == r["p99_size"] == 5
    assert r["max_share_ppm"] == 200000


def test_key_skew_profile_percentile_boundaries(spark):
    from trafficbigdatasearch_spark.operators import validate

    # sizes 1..4 over 4 keys: ceil(.5*4)=2nd -> 2, ceil(.9*4)=4th -> 4
    rows = [(k,) for k, n in [("a", 1), ("b", 2), ("c", 3), ("d", 4)]
            for _ in range(n)]
    df = spark.createDataFrame(rows, "k: string")
    r = validate.key_skew_profile(df, "k").collect()[0].asDict()
    assert r["p50_size"] == 2 and r["p90_size"] == 4 and r["p99_size"] == 4


def test_profile_drift_hand_case(spark):
    from trafficbigdatasearch_spark.operators import validate

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, "b")], "v: bigint, s: string"
    )
    new = spark.createDataFrame(
        [(None, "a"), (None, "c"), (6, "c"), (7, "c"), (8, None)],
        "v: bigint, s: string",
    )
    rows = {
        r["column_name"]: r.asDict()
        for r in validate.profile_drift(old, new, ["v", "s"]).collect()
    }
    v = rows["v"]
    assert v["n_rows_old"] == 4 and v["n_nulls_old"] == 0
    assert v["n_rows_new"] == 5 and v["n_nulls_new"] == 2
    # delta = 2/5 - 0/4 = 0.4; num = 2*4 - 0*5 = 8, den = 20
    assert v["null_delta_num"] == 8 and v["null_delta_den"] == 20
    assert abs(v["null_rate_delta"] - 0.4) < 1e-15
    s = rows["s"]
    assert s["n_distinct_old"] == 2 and s["n_distinct_new"] == 2
    # delta = 1/5 - 1/4 = -0.05
    assert abs(s["null_rate_delta"] - (-0.05)) < 1e-15


def test_dedup_report_hand_case(spark):
    from trafficbigdatasearch_spark.operators import validate

    docs = spark.createDataFrame(
        [
            (1, "Hello world", "a"),
            (2, "hello, WORLD!!", "a"),   # same fingerprint as 1
            (3, "something else entirely", "a"),
            (4, "unique text here", "b"),
        ],
        "doc_id: bigint, text: string, source: string",
    )
    rows = {
        r["source"]: r.asDict()
        for r in validate.dedup_report(docs).collect()
    }
    a = rows["a"]
    assert a["n_docs"] == 3 and a["n_unique"] == 2 and a["surplus_docs"] == 1
    # keeper of the dup group is doc 1 (min id, 2 tokens); doc 2's 2 tokens
    # are the surplus
    assert a["surplus_tokens"] == 2
    b = rows["b"]
    assert b["n_docs"] == 1 and b["surplus_docs"] == 0 and b["surplus_tokens"] == 0


def test_gopher_rule_rates_hand_case(spark):
    from trafficbigdatasearch_spark.operators import validate

    flags = spark.createDataFrame(
        [(True, True), (True, False), (False, False), (True, True)],
        "rule_a: boolean, rule_b: boolean",
    )
    rows = {
        r["rule"]: r.asDict()
        for r in validate.gopher_rule_rates(flags).collect()
    }
    assert rows["rule_a"]["n_pass"] == 3 and rows["rule_a"]["pass_ppm"] == 750000
    assert rows["rule_b"]["n_pass"] == 2 and rows["rule_b"]["pass_ppm"] == 500000
    assert all(r["n_docs"] == 4 for r in rows.values())


def test_gopher_rule_rates_requires_flags(spark):
    import pytest as _pytest

    from trafficbigdatasearch_spark.operators import validate

    df = spark.createDataFrame([(1,)], "x: bigint")
    with _pytest.raises(ValueError, match="boolean"):
        validate.gopher_rule_rates(df)
