"""Deterministic sampling operators (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import sampling


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumn(
        "grp", (F.col("id") % 7).cast("string")
    )


def test_hash_split_partitions_everything_and_is_stable(ids):
    out = sampling.hash_split(ids, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5000
    # binomial(5000, p) stays well inside these bands
    assert 3800 <= counts["train"] <= 4200
    assert 350 <= counts["val"] <= 650
    assert 350 <= counts["test"] <= 650
    # pure function of the key: recomputation yields the identical assignment
    again = sampling.hash_split(ids, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).isEmpty()


def test_hash_split_salt_changes_assignment(ids):
    a = sampling.hash_split(ids, "id", {"x": 0.5, "y": 0.5}, salt="a")
    b = sampling.hash_split(ids, "id", {"x": 0.5, "y": 0.5}, salt="b")
    moved = a.join(b.withColumnRenamed("split", "split_b"), "id").filter(
        F.col("split") != F.col("split_b")
    )
    assert moved.count() > 1000  # ~half move under an independent hash


def test_hash_split_rejects_bad_fractions(ids):
    with pytest.raises(ValueError):
        sampling.hash_split(ids, "id", {"train": 0.5, "test": 0.4})


def test_stratified_sample_rates(ids):
    out = sampling.stratified_sample(
        ids, "grp", {"0": 1.0, "1": 0.0, "2": 0.5}, key_col="id", default_rate=0.1
    )
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    per = 5000 // 7
    assert counts["0"] == per + 1  # rate 1.0 keeps every row of the stratum
    assert "1" not in counts  # rate 0.0 keeps none
    assert 0.35 * per <= counts["2"] <= 0.65 * per
    for g in ("3", "4", "5", "6"):
        assert counts[g] <= 0.25 * per


def test_group_sample_caps_each_group(ids):
    out = sampling.group_sample(ids, "grp", 11, key_col="id")
    counts = [r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()]
    assert counts == [11] * 7
    # k above group size keeps the whole group
    small = ids.filter(F.col("id") < 3)
    assert sampling.group_sample(small, "grp", 100, key_col="id").count() == 3
    # deterministic: same rows both times
    again = sampling.group_sample(ids, "grp", 11, key_col="id")
    assert out.exceptAll(again).isEmpty()


def test_mixture_sample_hits_target_proportions(ids):
    # availability: grp 0 has ~715 rows of 5000; ask for a mixture where
    # grp "1" is the limiting stratum (weight far above its share)
    weights = {"0": 0.2, "1": 0.5, "2": 0.3}
    out = sampling.mixture_sample(ids, "grp", weights, key_col="id")
    counts = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    # unlisted strata are dropped
    assert set(counts) <= set(weights)
    per = {g: 5000 // 7 + (1 if int(g) < 5000 % 7 else 0) for g in weights}
    # the limiting stratum (max count/weight shortfall -> "1") is kept whole
    assert counts["1"] == per["1"]
    total = sum(counts.values())
    for g, w in weights.items():
        # achieved proportion within sampling noise + 1/BUCKETS quantization
        assert abs(counts[g] / total - w) < 0.05, (g, counts[g], total)
    # deterministic: recomputation keeps the identical rows
    again = sampling.mixture_sample(ids, "grp", weights, key_col="id")
    assert out.exceptAll(again).isEmpty()
    # stable under repartitioning (membership is row-local)
    reparted = sampling.mixture_sample(
        ids.repartition(13), "grp", weights, key_col="id"
    )
    assert out.exceptAll(reparted).isEmpty()


def test_mixture_sample_rejects_bad_weights(ids):
    with pytest.raises(ValueError):
        sampling.mixture_sample(ids, "grp", {"0": 0.5, "1": 0.4}, key_col="id")
    with pytest.raises(ValueError):
        sampling.mixture_sample(ids, "grp", {}, key_col="id")


def test_leakage_free_split_keeps_pairs_together(spark):
    """The leakage invariant: for EVERY candidate near-dup pair, both
    members land in the same split (a plain doc-id hash split cannot
    guarantee this); no rows dropped; splits roughly honor the fractions."""
    import os

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import dedup

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, k=8, bands=4, n=3)
    out = sampling.leakage_free_split(docs, pairs, {"train": 0.9, "test": 0.1})
    assert out.count() == docs.count()
    side = {r["doc_id"]: r["split"] for r in out.collect()}
    prs = pairs.collect()
    assert prs, "fixture produced no candidate pairs"
    for r in prs:
        assert side[r["id_a"]] == side[r["id_b"]], (r["id_a"], r["id_b"])
    frac = sum(1 for s in side.values() if s == "train") / len(side)
    assert 0.8 <= frac <= 0.97, frac


def test_importance_sample_extremes_and_stability(spark):
    from trafficbigdatasearch_spark.operators import sampling as S

    df = spark.createDataFrame([(i, i % 10) for i in range(1000)], "id long, q int")
    assert S.importance_sample(df, "id", F.lit(0.0)).count() == 0
    assert S.importance_sample(df, "id", F.lit(1.0)).count() == 1000
    # out-of-range weights clamp instead of misbehaving
    assert S.importance_sample(df, "id", F.lit(7.5)).count() == 1000
    # deterministic under repartition; rate tracks the weight
    w = F.col("q") / 10.0
    a = sorted(r.id for r in S.importance_sample(df, "id", w).collect())
    b = sorted(r.id for r in S.importance_sample(df.repartition(13), "id", w).collect())
    assert a == b
    # E[kept] = sum(q/10) = 450; md5 uniformity keeps it close
    assert 380 <= len(a) <= 520


def test_temperature_sample_flattens_and_is_exact(spark):
    """temperature_sample (alpha = a/b): membership is the exact integer
    inequality bucket^b * n_g^(b-a) < BUCKETS^b * n_min^(b-a) — verified
    against a Python reimplementation — the smallest group is kept whole,
    larger groups shrink toward sqrt scaling, and alpha=1 is the
    identity."""
    import hashlib

    # group sizes 100 / 400 / 1600: alpha=1/2 targets 100 / 200 / 400
    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(400)]
        + [(10_000 + i, "c") for i in range(1600)]
    )
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING")
    kept = sampling.temperature_sample(
        df, "src", key_col="doc_id", alpha=(1, 2)
    )
    got = {(r["doc_id"], r["src"]) for r in kept.collect()}

    def bucket(key, salt="temp"):
        return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:7], 16) % 10_000

    sizes = {"a": 100, "b": 400, "c": 1600}
    n_min = 100
    want = {
        (i, s)
        for i, s in rows
        if bucket(i) ** 2 * sizes[s] < 10_000**2 * n_min
    }
    assert got == want
    by = {}
    for _, s in got:
        by[s] = by.get(s, 0) + 1
    assert by["a"] == 100                    # anchor group kept whole
    # sqrt targets 200 / 400 with binomial noise (md5-uniform buckets)
    assert 150 < by["b"] < 250 and 320 < by["c"] < 480
    # alpha = 1 is the identity
    assert sampling.temperature_sample(
        df, "src", key_col="doc_id", alpha=(1, 1)
    ).count() == len(rows)
    # guards
    with pytest.raises(ValueError, match="alpha"):
        sampling.temperature_sample(df, "src", key_col="doc_id", alpha=(0, 2))
    with pytest.raises(ValueError, match="denominator"):
        sampling.temperature_sample(df, "src", key_col="doc_id", alpha=(1, 4))
    # deterministic under repartitioning (the module contract)
    again = {
        (r["doc_id"], r["src"])
        for r in sampling.temperature_sample(
            df.repartition(7), "src", key_col="doc_id", alpha=(1, 2)
        ).collect()
    }
    assert again == got


def test_temperature_sample_null_group_is_its_own_group(spark):
    """Review (r8): NULL-group rows must form their own group — not set
    the n_min anchor and then vanish through the equi join.  alpha=1
    stays the identity INCLUDING NULL rows."""
    rows = [(i, "a") for i in range(400)] + [(1000 + i, None) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, src STRING")
    ident = sampling.temperature_sample(df, "src", key_col="doc_id", alpha=(1, 1))
    assert ident.count() == 405
    kept = sampling.temperature_sample(df, "src", key_col="doc_id", alpha=(1, 2))
    by = {}
    for r in kept.collect():
        by[r["src"]] = by.get(r["src"], 0) + 1
    # the NULL group is the smallest -> kept whole; 'a' downsamples
    # toward sqrt(5 * 400) ~ 45
    assert by.get(None, 0) == 5
    assert 20 < by["a"] < 90
    # schema passes through unchanged (no helper columns leak)
    assert kept.columns == df.columns


def test_priority_sample_weighted_and_deterministic(spark):
    """priority_sample (r9): exact-k weighted sample, deterministic under
    repartitioning and salt-sensitive; heavier rows are preferred (a
    1000x-weight block dominates the sample over uniform hashes);
    zero/NULL weights are excluded; k validates."""
    import pytest as _pytest

    from trafficbigdatasearch_spark.operators import sampling

    rows = [(i, 1000.0 if i < 50 else 1.0) for i in range(1000)]
    rows += [(2000, 0.0), (2001, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    out = sampling.priority_sample(df, "w", k=40, key_col="doc_id")
    got = [r["doc_id"] for r in out.collect()]
    assert len(got) == 40
    # the 50 heavy rows (5% of rows, ~99% of total weight) dominate
    heavy = sum(1 for i in got if i < 50)
    assert heavy >= 30
    assert 2000 not in got and 2001 not in got
    # deterministic under repartitioning
    again = [r["doc_id"] for r in
             sampling.priority_sample(df.repartition(13), "w", k=40,
                                      key_col="doc_id").collect()]
    assert got == again
    # a different salt draws a different sample
    other = [r["doc_id"] for r in
             sampling.priority_sample(df, "w", k=40, key_col="doc_id",
                                      salt="other").collect()]
    assert got != other
    # priorities published for downstream Horvitz-Thompson estimates
    assert all(r["_priority"] > 0 for r in out.collect())
    with _pytest.raises(ValueError, match="positive"):
        sampling.priority_sample(df, "w", k=0)


def test_priority_sample_excludes_nan_weights(spark):
    """ADVICE r9: Spark orders NaN greater than any number, so ``w > 0``
    alone ADMITS NaN weights; when fewer than k finite-weight rows exist
    they'd silently enter the sample with a NaN priority.  NaN is excluded
    like zero/NULL."""
    from trafficbigdatasearch_spark.operators import sampling

    df = spark.createDataFrame(
        [(1, 2.0), (2, 3.0), (3, float("nan")), (4, float("nan"))],
        "doc_id bigint, w double",
    )
    got = sampling.priority_sample(df, "w", k=4, key_col="doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2]
    assert all(r["_priority"] == r["_priority"] for r in got)  # no NaN prio


def test_priority_sample_grouped(spark):
    """priority_sample_grouped (r10): exactly k per group where the group
    has >= k eligible rows, heavier rows preferred within each group,
    deterministic under repartitioning, zero/NULL/NaN weights excluded,
    k validates."""
    import pytest as _pytest

    from trafficbigdatasearch_spark.operators import sampling

    rows = [(i, "a", 1000.0 if i < 30 else 1.0) for i in range(300)]
    rows += [(1000 + i, "b", 1.0) for i in range(3)]       # under-full group
    rows += [(2000, "a", 0.0), (2001, "a", None), (2002, "a", float("nan"))]
    df = spark.createDataFrame(rows, "doc_id bigint, g string, w double")
    out = sampling.priority_sample_grouped(df, "g", "w", k=20, key_col="doc_id")
    got = [(r["g"], r["doc_id"]) for r in out.collect()]
    by_g = {}
    for g, i in got:
        by_g.setdefault(g, []).append(i)
    assert len(by_g["a"]) == 20 and sorted(by_g["b"]) == [1000, 1001, 1002]
    assert not any(i >= 2000 for i in by_g["a"])           # exclusions hold
    heavy = sum(1 for i in by_g["a"] if i < 30)            # 10% of rows, ~99% of weight
    assert heavy >= 15
    again = [(r["g"], r["doc_id"]) for r in
             sampling.priority_sample_grouped(df.repartition(13), "g", "w",
                                              k=20, key_col="doc_id").collect()]
    assert sorted(got) == sorted(again)
    with _pytest.raises(ValueError, match="positive"):
        sampling.priority_sample_grouped(df, "g", "w", k=0)


def test_quota_split_exact_counts(spark):
    """quota_split (r10): per-group split sizes are the EXACT
    largest-remainder apportionment (not in-expectation), every row is
    assigned, membership is deterministic under repartitioning, and
    fractions validate."""
    import pytest as _pytest

    from trafficbigdatasearch_spark.operators import sampling

    # group sizes chosen so floors don't sum to n: n=7 at (0.8,0.1,0.1)
    # floors (5,0,0) rem 2 -> remainders (0.6,0.7,0.7): bonus to r2,r3
    # (largest remainders, tie by order) -> (5,1,1)
    rows = [(i, "a") for i in range(7)] + [(100 + i, "b") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, g string")
    out = sampling.quota_split(
        df, "g", {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id"
    )
    counts = {
        (r["g"], r["split"]): r["n"]
        for r in out.groupBy("g", "split").count().withColumnRenamed("count", "n").collect()
    }
    assert counts[("a", "train")] == 5
    assert counts[("a", "val")] == 1 and counts[("a", "test")] == 1
    assert counts[("b", "train")] == 8
    assert counts[("b", "val")] == 1 and counts[("b", "test")] == 1
    assert out.count() == 17
    again = sampling.quota_split(
        df.repartition(13), "g", {"train": 0.8, "val": 0.1, "test": 0.1},
        key_col="doc_id",
    )
    assert out.exceptAll(again).isEmpty()
    with _pytest.raises(ValueError, match="sum to 1.0"):
        sampling.quota_split(df, "g", {"x": 0.5, "y": 0.4}, key_col="doc_id")
    with _pytest.raises(ValueError, match="at least 2"):
        sampling.quota_split(df, "g", {"x": 1.0}, key_col="doc_id")


# ---------------------------------------------------------------------------
# curriculum_order
# ---------------------------------------------------------------------------


def test_curriculum_positions_are_a_permutation(spark):
    from trafficbigdatasearch_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, "x " * (i % 17 + 1)) for i in range(200)],
        "doc_id: bigint, text: string",
    )
    out = sampling.curriculum_order(docs).collect()
    positions = sorted(r["position"] for r in out)
    assert positions == list(range(200))


def test_curriculum_matches_naive_global_sort(spark):
    import hashlib

    from trafficbigdatasearch_spark.operators import sampling

    rows = [(i, "w " * ((i * 7) % 31 + 1)) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    out = {r["doc_id"]: r.asDict()
           for r in sampling.curriculum_order(docs).collect()}
    # naive reference: phase from exact ceil-CDF deciles, then
    # (phase, md5, id) order
    n_chars = {i: len("w " * ((i * 7) % 31 + 1)) for i, _ in rows}
    nn = len(rows)
    sorted_vals = sorted(n_chars.values())
    import bisect
    def phase(v):
        cum = bisect.bisect_right(sorted_vals, v)
        return (10 * cum + nn - 1) // nn
    order = sorted(
        n_chars,
        key=lambda i: (phase(n_chars[i]),
                       hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    for pos, i in enumerate(order):
        assert out[i]["position"] == pos, (i, out[i], pos)
        assert out[i]["phase"] == phase(n_chars[i])


def test_curriculum_phases_are_monotone_in_position(spark):
    from trafficbigdatasearch_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, "a" * (i + 1)) for i in range(50)],
        "doc_id: bigint, text: string",
    )
    out = sorted(
        sampling.curriculum_order(docs).collect(),
        key=lambda r: r["position"],
    )
    phases = [r["phase"] for r in out]
    assert phases == sorted(phases)  # easy phases never follow hard ones


# ---------------------------------------------------------------------------
# contrastive_triplets
# ---------------------------------------------------------------------------


def test_triplets_contract(spark):
    from trafficbigdatasearch_spark.operators import sampling

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta iota"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 0
            (3, "totally different words about spark physical plans"),
            (4, "more unrelated text regarding query optimizers"),
        ],
        "doc_id: bigint, text: string",
    )
    out = {r["anchor_id"]: r.asDict()
           for r in sampling.contrastive_triplets(docs).collect()}
    # docs 0,1,2 are anchors (near-dups of each other); 3,4 are not
    assert set(out) == {0, 1, 2}
    # 0's best positive is its exact dup 2 (jaccard 1), not 1
    assert out[0]["positive_id"] == 2
    assert out[2]["positive_id"] == 0
    for r in out.values():
        assert r["negative_id"] not in (r["anchor_id"], r["positive_id"])
        assert 0 <= r["negative_id"] < 5
        assert isinstance(r["neg_is_known_dup"], bool)


def test_triplets_known_dup_flag(spark):
    from trafficbigdatasearch_spark.operators import sampling

    # 3 docs, ALL near-dups of each other -> any negative the hash picks
    # is a known dup and must be flagged
    docs = spark.createDataFrame(
        [
            (0, "one two three four five six seven eight"),
            (1, "one two three four five six seven nine"),
            (2, "one two three four five six seven ten"),
        ],
        "doc_id: bigint, text: string",
    )
    out = sampling.contrastive_triplets(docs).collect()
    assert len(out) == 3
    assert all(r["neg_is_known_dup"] for r in out)


def test_triplets_raises_below_three_docs(spark):
    import pytest as _pytest

    from trafficbigdatasearch_spark.operators import sampling

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c")], "doc_id: bigint, text: string"
    )
    with _pytest.raises(ValueError, match="3 documents"):
        sampling.contrastive_triplets(docs)


# ---------------------------------------------------------------------------
# poisson_bootstrap
# ---------------------------------------------------------------------------


def test_poisson_bootstrap_matches_python_reference(spark):
    import hashlib

    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.operators import sampling

    rows = [(i, (i * 3) % 7 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id: bigint, v: bigint")
    out = {
        r["replicate"]: (r["n_rows_resampled"], r["value_resampled"])
        for r in sampling.poisson_bootstrap(
            df, "id", F.col("v"), n_replicates=4
        ).collect()
    }
    cdf = sampling._POISSON1_CDF_BUCKETS
    for rep in range(4):
        n = t = 0
        for i, v in rows:
            b = int(hashlib.md5(f"boot{rep}{i}".encode()).hexdigest()[:7], 16) % 10000
            k = next((j for j, thr in enumerate(cdf) if b < thr), len(cdf))
            n += k
            t += k * v
        assert out[rep] == (n, t), (rep, out[rep], (n, t))


def test_poisson_bootstrap_replicate_means_center_on_total(spark):
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.operators import sampling

    df = spark.range(2000).select(F.col("id"), F.lit(1).alias("v"))
    out = sampling.poisson_bootstrap(df, "id", F.col("v"), n_replicates=10)
    ns = [r["n_rows_resampled"] for r in out.collect()]
    assert len(ns) == 10
    # E[n] = 2000, sd ~ sqrt(2000) ~ 45; all replicates well within 5 sd
    assert all(abs(n - 2000) < 250 for n in ns)
    # replicates differ (distinct salts actually vary the draws)
    assert len(set(ns)) > 1
