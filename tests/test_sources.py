"""Storage-layer tests: the month-partitioned writer's layout and round-trip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.sources.parquet import (
    read_partitioned,
    write_month_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_month_partitioned_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    out = str(tmp_path / "ev_by_month")
    write_month_partitioned(ev.withColumn("ms", F.unix_millis("ts")), out, "ts")
    # Hive-style month=yyyyMM directories on disk
    parts = sorted(d for d in os.listdir(out) if d.startswith("month="))
    assert parts, os.listdir(out)
    back = read_partitioned(spark, out)
    assert back.count() == ev.count()
    # a month predicate must reach the scan as a partition filter
    some_month = parts[0].split("=", 1)[1]
    q = back.filter(F.col("month") == some_month)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "month" in plan, plan
    assert q.count() > 0


def test_month_partitioned_from_epoch_millis(spark, tmp_path):
    """bigint epoch-millis timestamp columns derive the same month key."""
    ev = load_table(spark, SF, "events").select(
        "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    out = str(tmp_path / "ev_ms")
    write_month_partitioned(ev, out, "ts_ms")
    back = read_partitioned(spark, out)
    assert back.count() == ev.count()
    assert "month" in back.columns


def test_load_table_events_on_vanilla_session(spark):
    """load_table must self-heal a session missing the nanos/tz confs.

    The driver harness passes a vanilla SparkSession that never went through
    session.build_spark; without the runtime conf set inside load_table,
    events.parquet (TIMESTAMP NANOS) throws PARQUET_TYPE_ILLEGAL — the round-1
    root cause that erred 12 registry queries."""
    saved_nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    saved_tz = spark.conf.get("spark.sql.session.timeZone", None)
    try:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ev = load_table(spark, SF, "events")
        assert dict(ev.dtypes)["ts"] == "timestamp"
        assert ev.count() > 0
        # load_table must have re-pinned both confs for oracle parity
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        if saved_nanos is not None:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", saved_nanos)
        if saved_tz is not None:
            spark.conf.set("spark.sql.session.timeZone", saved_tz)


def test_sql_facade_views(spark):
    """register_views exposes every testdata table for spark.sql — the
    engine-native replacement for the reference's registerTempTable (S8)."""
    from trafficbigdatasearch_spark.catalog import TABLE_NAMES, register_views

    register_views(spark, SF)
    for t in TABLE_NAMES:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {t}").collect()[0]["n"] >= 0
    joined = spark.sql(
        """SELECT r_name, COUNT(*) AS n FROM nation
           JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"""
    )
    assert joined.count() > 0


def test_malformed_query_date_raises(spark, tmp_path):
    import pytest

    from trafficbigdatasearch_spark.queries._core import parse_date

    with pytest.raises(ValueError):
        parse_date("2016-13-45")
    with pytest.raises(ValueError):
        parse_date("not-a-date")


def test_rollup_reaggregation_equals_direct(spark):
    """Daily answers from the hourly rollup must equal direct daily
    aggregation over raw events — the re-aggregability invariant that lets
    coarse queries skip the raw table entirely."""
    from trafficbigdatasearch_spark.operators import rollup as R

    ev = load_table(spark, SF, "events")
    via_rollup = R.daily_from_hourly(R.hourly_rollup(ev))
    direct = R.daily_direct(ev)
    k = ["day_start", "event_type"]

    def canon(df):
        return sorted(
            (r["day_start"], r["event_type"], r["n"], round(r["sum_v"], 6),
             r["min_v"], r["max_v"], round(r["avg_v"], 9))
            for r in df.collect()
        )

    assert canon(via_rollup) == canon(direct)


def test_interval_join_closed_modes(spark):
    """Boundary semantics of the four closed-ness variants (quirk §2.10.2/3
    territory: closed-both double counts exact boundary instants)."""
    from trafficbigdatasearch_spark.operators import joins as J

    left = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 15)], ["eid", "t"]
    )
    right = spark.createDataFrame([(100, 10, 20)], ["rid", "lo", "hi"])
    def hits(closed):
        out = J.interval_join(left, right, None, "t", "lo", "hi", closed=closed)
        return sorted(r["eid"] for r in out.collect())

    assert hits("both") == [1, 2, 3]
    assert hits("left") == [1, 3]
    assert hits("right") == [2, 3]
    assert hits("neither") == [3]


class TestWriteSized:
    def test_rows_per_file_cap_and_count(self, spark, tmp_path):
        """500 docs at 100 rows/file -> exactly 5 files, none over the cap,
        roundtrip-identical."""
        import glob

        from trafficbigdatasearch_spark.sources.parquet import write_sized

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        n = docs.count()
        out = str(tmp_path / "sized")
        write_sized(docs, out, rows_per_file=100)
        files = glob.glob(out + "/*.parquet")
        assert len(files) == -(-n // 100)
        for f in files:
            assert spark.read.parquet(f).count() <= 100
        back = spark.read.parquet(out)
        assert back.count() == n
        assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
            r["doc_id"] for r in docs.select("doc_id").collect()
        )

    def test_partitioned_write_one_file_per_small_partition(self, spark, tmp_path):
        import glob

        from trafficbigdatasearch_spark.sources.parquet import write_sized

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = str(tmp_path / "by_lang")
        write_sized(docs, out, rows_per_file=10_000, partition_by=["lang"])
        langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
        for lang in langs:
            files = glob.glob(f"{out}/lang={lang}/*.parquet")
            # every partition fits rows_per_file -> exactly one file each
            assert len(files) == 1, (lang, files)
        assert spark.read.parquet(out).count() == docs.count()

    def test_range_by_gives_nonoverlapping_files(self, spark, tmp_path):
        import glob

        from trafficbigdatasearch_spark.sources.parquet import write_sized

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = str(tmp_path / "ranged")
        write_sized(docs, out, rows_per_file=100, range_by=["doc_id"])
        spans = []
        for f in glob.glob(out + "/*.parquet"):
            ids = [r["doc_id"] for r in spark.read.parquet(f).select("doc_id").collect()]
            if ids:
                spans.append((min(ids), max(ids)))
        spans.sort()
        for (_, hi), (lo, _) in zip(spans, spans[1:]):
            assert hi < lo, spans  # files carry disjoint doc_id ranges


class TestZOrder:
    """write_zordered: files cover compact tiles, so a 2-D bbox query skips
    far more files on parquet min/max stats than a 1-D range layout — the
    layout win for the reference's bbox workload.  (Boundary files of the
    Morton curve may span one full dimension; the pins are on medians and
    on actual file-skipping, the operational property.)"""

    def _file_boxes(self, path):
        import glob

        import pyarrow.parquet as pq

        out = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            mins, maxs = {}, {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    n = col.path_in_schema
                    if col.statistics is None or n == "id":
                        continue
                    mins[n] = min(mins.get(n, float("inf")), col.statistics.min)
                    maxs[n] = max(maxs.get(n, float("-inf")), col.statistics.max)
            out.append((mins, maxs))
        return out

    @staticmethod
    def _touched(boxes, lon_lo, lon_hi, lat_lo, lat_hi):
        return sum(
            1
            for mins, maxs in boxes
            if mins["lon"] <= lon_hi and maxs["lon"] >= lon_lo
            and mins["lat"] <= lat_hi and maxs["lat"] >= lat_lo
        )

    def test_bbox_file_skipping_beats_1d_layout(self, spark, tmp_path):
        import random
        import statistics

        from trafficbigdatasearch_spark.sources.parquet import (
            write_sized,
            write_zordered,
        )

        rng = random.Random(11)
        rows = [
            (i, 116.0 + 2.0 * rng.random(), 36.0 + 3.0 * rng.random())
            for i in range(20_000)
        ]
        df = spark.createDataFrame(rows, "id bigint, lon double, lat double")

        zpath = str(tmp_path / "zorder")
        write_zordered(df, zpath, ["lon", "lat"], rows_per_file=80)
        spath = str(tmp_path / "slabs")
        write_sized(df, spath, rows_per_file=80, range_by=["lon"])

        zb = self._file_boxes(zpath)
        sb = self._file_boxes(spath)
        assert len(zb) >= 100

        # typical z-file is a tile: median extents bounded in BOTH dims;
        # 1-D slabs span (almost) the full lat range in every file
        med_lon = statistics.median(maxs["lon"] - mins["lon"] for mins, maxs in zb)
        med_lat = statistics.median(maxs["lat"] - mins["lat"] for mins, maxs in zb)
        assert med_lon <= 0.3 * 2.0, med_lon
        assert med_lat <= 0.3 * 3.0, med_lat
        assert all(maxs["lat"] - mins["lat"] > 0.9 * 3.0 for mins, maxs in sb)

        # file-skipping on square-ish query boxes: z touches far fewer files
        z_total = s_total = 0
        for k in range(10):
            lon0 = 116.0 + 1.7 * (k / 10.0)
            lat0 = 36.0 + 2.6 * (k / 10.0)
            z_total += self._touched(zb, lon0, lon0 + 0.2, lat0, lat0 + 0.3)
            s_total += self._touched(sb, lon0, lon0 + 0.2, lat0, lat0 + 0.3)
        assert z_total * 2 <= s_total, (z_total, s_total)

        # correctness: layout changes nothing about the data
        back = spark.read.parquet(zpath)
        assert back.count() == 20_000
        box = (F.col("lon").between(116.1, 116.3)) & (
            F.col("lat").between(36.15, 36.45)
        )
        assert back.filter(box).count() == df.filter(box).count()

    def test_read_pruned_box_identical_and_prunes(self, spark, tmp_path):
        import random

        from trafficbigdatasearch_spark.sources.parquet import (
            build_minmax_sidecar,
            read_pruned_box,
            write_zordered,
        )

        rng = random.Random(13)
        rows = [
            (i, 116.0 + 2.0 * rng.random(), 36.0 + 3.0 * rng.random())
            for i in range(8_000)
        ]
        df = spark.createDataFrame(rows, "id bigint, lon double, lat double")
        path = str(tmp_path / "ztiles")
        write_zordered(df, path, ["lon", "lat"], rows_per_file=200)
        sidecar = build_minmax_sidecar(spark, path, ["lon", "lat"])
        n_files = sidecar.count()
        assert n_files >= 30

        preds = [("lon", 116.2, 116.5), ("lat", 36.3, 36.8)]
        pruned = read_pruned_box(spark, path, sidecar, preds)
        expect = df.filter(
            (F.col("lon") >= 116.2) & (F.col("lon") < 116.5)
            & (F.col("lat") >= 36.3) & (F.col("lat") < 36.8)
        )
        assert sorted(map(tuple, pruned.collect())) == sorted(
            map(tuple, expect.collect())
        )
        # the 2-D conjunction actually skips: the box covers ~2.5% of the
        # area, tiles are compact, so most files never reach the reader
        kept = sidecar.filter(
            (F.col("max_lon") >= 116.2) & (F.col("min_lon") < 116.5)
            & (F.col("max_lat") >= 36.3) & (F.col("min_lat") < 36.8)
        ).count()
        assert kept * 3 <= n_files, (kept, n_files)

        # empty box: zero rows, schema intact, no crash on the no-file path
        empty = read_pruned_box(
            spark, path, sidecar, [("lon", 200.0, 201.0), ("lat", 36.0, 37.0)]
        )
        assert empty.count() == 0
        assert empty.columns == ["id", "lon", "lat"]

        with pytest.raises(ValueError, match="at least one"):
            read_pruned_box(spark, path, sidecar, [])


class TestUpsertPartitions:
    def test_only_touched_partitions_replaced(self, spark, tmp_path):
        from trafficbigdatasearch_spark.sources.parquet import upsert_partitions

        path = str(tmp_path / "fact")
        base = spark.createDataFrame(
            [(1, "202401", 10.0), (2, "202401", 11.0), (3, "202402", 12.0)],
            "id bigint, month string, v double",
        )
        upsert_partitions(base, path, ["month"])

        # reload month 202402 with corrected data; 202401 must survive
        fix = spark.createDataFrame(
            [(3, "202402", 99.0), (4, "202402", 98.0)],
            "id bigint, month string, v double",
        )
        upsert_partitions(fix, path, ["month"])

        back = spark.read.parquet(path)
        # partition-value inference types month as int on read; normalize
        got = sorted(
            map(
                tuple,
                back.select("id", back["month"].cast("string"), "v").collect(),
            )
        )
        assert got == [
            (1, "202401", 10.0),
            (2, "202401", 11.0),
            (3, "202402", 99.0),
            (4, "202402", 98.0),
        ]


class TestSchemaEvolution:
    def test_merge_schema_unions_columns(self, spark, tmp_path):
        from trafficbigdatasearch_spark.sources.parquet import read_evolving

        path = str(tmp_path / "evolving")
        v1 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id bigint, text string"
        )
        v1.write.parquet(path)
        v2 = spark.createDataFrame(
            [(3, "c", "en")], "id bigint, text string, lang string"
        )
        v2.write.mode("append").parquet(path)

        got = read_evolving(spark, path)
        assert set(got.columns) == {"id", "text", "lang"}
        rows = {r["id"]: (r["text"], r["lang"]) for r in got.collect()}
        assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", "en")}


def test_map_in_arrow_features_equal_pandas_path(spark):
    """extract_features_arrow must produce byte-identical output to the
    mapInPandas path — same stub kernel, zero-copy Arrow batches."""
    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import multimodal as MM

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    assets = MM.assets_from_documents(docs)
    a = sorted(map(tuple, MM.extract_features(assets).collect()))
    b = sorted(map(tuple, MM.extract_features_arrow(assets).collect()))
    assert a == b


def test_resize_autodetects_pillow(spark):
    """Without Pillow the pixel path raises the documented error but the
    plan still builds (plumbing validated); with Pillow it runs the real
    decode+resize kernel.  Both arms of the importlib gate are exercised
    on whichever container runs the suite."""
    import pytest

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import multimodal as MM

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    assets = MM.assets_from_documents(docs)
    out = MM.resize_stub(assets)
    # plumbing holds in both modes (nullability differs between literal
    # expressions and the declared mapInPandas schema — compare shape)
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in assets.schema
    ]
    if not MM._pillow_available():
        with pytest.raises(Exception, match="Pillow"):
            out.collect()
        pytest.skip("Pillow not installed — real-kernel arm untested here")
    rows = out.collect()
    assert len(rows) == assets.count()


def test_resize_with_synthetic_resizer(spark):
    """The pluggable resize hook (verdict r9 #8): a synthetic resizer —
    deterministic fake bytes encoding the target — drives the REAL
    mapInPandas plumbing end-to-end without a codec: image payloads are
    replaced by the kernel's output, non-image rows pass through
    byte-identical, schema shape is preserved, and the default hook stays
    the loud no-codec guard."""
    from trafficbigdatasearch_spark.operators import multimodal as MM

    def synth(payload, target):
        # golden kernel: first byte + target dims, length-3 payload
        return bytes([payload[0] % 256, target[0] % 256, target[1] % 256])

    assets = spark.createDataFrame(
        [
            (1, "image", b"\x10abc", "{}"),
            (2, "audio", b"\x99xyz", "{}"),
            (3, "image", b"\x20def", "{}"),
        ],
        MM.ASSET_SCHEMA,
    )
    out = {r["asset_id"]: bytes(r["payload"]) for r in
           MM.resize_stub(assets, target=(64, 48), resizer=synth).collect()}
    assert out[1] == bytes([0x10, 64, 48])   # golden: kernel output
    assert out[3] == bytes([0x20, 64, 48])
    assert out[2] == b"\x99xyz"              # non-image passes through
    sch = MM.resize_stub(assets, resizer=synth).schema
    assert [(f.name, f.dataType) for f in sch] == [
        (f.name, f.dataType) for f in assets.schema
    ]


def test_phash_decoded_with_synthetic_decoder(spark):
    """The pluggable decoder hook (verdict r8 #7): a synthetic decoder —
    deterministic fake pixels from payload bytes — drives the REAL
    average-hash kernel end-to-end through mapInPandas, proving the
    Spark-side plumbing without any codec.  Identical payloads collide;
    a half-bright/half-dark grid hashes to the known bit pattern; the
    default hook stays the loud no-codec guard; n_bits is validated."""
    import pytest

    from trafficbigdatasearch_spark.operators import multimodal as MM

    def synth(payload, media_type):
        # 8x8 grid: row intensity = byte at (row mod len), so identical
        # payloads give identical grids
        b = payload or b"\x00"
        return [[float(b[r % len(b)])] * 8 for r in range(8)]

    assets = spark.createDataFrame(
        [
            (1, "image", b"\x10" * 4 + b"\xf0" * 4, "{}"),
            (2, "image", b"\x10" * 4 + b"\xf0" * 4, "{}"),  # dup of 1
            (3, "image", b"\xf0" * 4 + b"\x10" * 4, "{}"),  # inverted
        ],
        MM.ASSET_SCHEMA,
    )
    out = {r["asset_id"]: r["phash"] for r in
           MM.phash_decoded(assets, n_bits=16, decoder=synth).collect()}
    assert out[1] == out[2]            # identical payloads collide
    assert out[1] != out[3]
    # hand value: synth gives rows 0-3 dark (0x10), rows 4-7 bright
    # (0xf0); 4x4 block-means -> bottom half above the mean -> bits
    # 0000 0000 1111 1111
    assert out[1] == 0x00FF
    assert out[3] == 0xFF00
    # the hash rides the shared banded-Hamming engine unchanged
    from trafficbigdatasearch_spark.operators import dedup

    fps = MM.phash_decoded(assets, n_bits=16, decoder=synth).select(
        F.col("asset_id").alias("id"), F.col("phash").alias("simhash")
    )
    pairs = dedup.hamming_pairs(
        fps, n_bits=16, band_bits=4, max_hamming=3
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]
    with pytest.raises(ValueError, match="square"):
        MM.phash_decoded(assets, n_bits=15, decoder=synth)
    # default hook: loud guard without a codec, real kernel with one
    out_default = MM.phash_decoded(assets)
    if not MM._pillow_available():
        with pytest.raises(Exception, match="decoder"):
            out_default.collect()
    # signed 64-bit pack stays int64-safe (all-bright grid -> all bits 0
    # since no cell exceeds the mean; craft a high-MSB case instead)
    def msb(payload, media_type):
        return [[255.0] * 8] * 4 + [[0.0] * 8] * 4  # TOP half bright

    h = {r["asset_id"]: r["phash"] for r in
         MM.phash_decoded(assets.limit(1), n_bits=64, decoder=msb).collect()}
    assert h[1] < 0  # top 32 bits set -> sign bit set, packed without overflow

    # ADVICE r9: a ragged grid (later rows shorter than row 0) raises the
    # operator's loud, named validation error — not an opaque IndexError
    # from inside the executor's batch loop
    def ragged(payload, media_type):
        return [[1.0] * 8] * 4 + [[1.0] * 5] * 4

    with pytest.raises(Exception, match="ragged"):
        MM.phash_decoded(assets.limit(1), n_bits=16, decoder=ragged).collect()


# ---------------------------------------------------------------------------
# Min/max sidecar file skipping
# ---------------------------------------------------------------------------


def test_minmax_sidecar_prunes_and_matches(spark, tmp_path):
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.sources import parquet as P

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    layout = str(tmp_path / "orders_by_date")
    P.write_sized(
        orders, layout, rows_per_file=1 << 30, range_by=["o_orderdate"], n_files=8
    )
    sidecar = P.build_minmax_sidecar(spark, layout, ["o_orderdate"])
    stats = sidecar.collect()
    assert len(stats) == 8
    lo, hi = "1995-01-01", "1995-04-01"
    picked = [
        r
        for r in stats
        if str(r["max_o_orderdate"]) >= lo and str(r["min_o_orderdate"]) < hi
    ]
    # range clustering must make the quarter touch a strict subset of files
    assert 0 < len(picked) < 8
    pruned = P.read_pruned_by_sidecar(spark, layout, sidecar, "o_orderdate", lo, hi)
    plain = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the pruned scan must read only the selected files
    read_files = {
        r["f"]
        for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert read_files <= {r["file"] for r in picked}


def test_minmax_sidecar_empty_range(spark, tmp_path):
    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.sources import parquet as P

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    layout = str(tmp_path / "orders_small")
    P.write_sized(
        orders, layout, rows_per_file=1 << 30, range_by=["o_orderdate"], n_files=4
    )
    sidecar = P.build_minmax_sidecar(spark, layout, ["o_orderdate"])
    out = P.read_pruned_by_sidecar(
        spark, layout, sidecar, "o_orderdate", "2050-01-01", "2051-01-01"
    )
    assert out.count() == 0
    assert out.columns == orders.columns


# ---------------------------------------------------------------------------
# ORC interop
# ---------------------------------------------------------------------------


def test_orc_roundtrip_identical(spark, tmp_path):
    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.sources import orc as O

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "li_orc")
    O.write_orc(li, path, rows_per_file=2000)
    back = O.read_orc(spark, path, schema=li.schema)
    assert back.schema == li.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))


def test_orc_scan_pushes_filters(spark, tmp_path):
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.sources import orc as O

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "li_orc2")
    O.write_orc(li, path)
    df = O.read_orc(spark, path).filter(F.col("l_linenumber") == 1).select(
        "l_orderkey", "l_linenumber"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_linenumber" in plan.split(
        "PushedFilters"
    )[1][:120], plan
    # column pruning reaches the ORC reader too
    assert "ReadSchema" in plan


def test_minmax_sidecar_explicit_schema_no_probe(spark, tmp_path):
    """With an explicit schema the pruned read never lists the data dir
    for planning — only the sidecar-selected files appear in the scan."""
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.sources import parquet as P

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    layout = str(tmp_path / "orders_schema")
    P.write_sized(
        orders, layout, rows_per_file=1 << 30, range_by=["o_orderdate"], n_files=4
    )
    sidecar = P.build_minmax_sidecar(spark, layout, ["o_orderdate"])
    pruned = P.read_pruned_by_sidecar(
        spark, layout, sidecar, "o_orderdate",
        "1995-01-01", "1995-04-01", schema=orders.schema,
    )
    plain = orders.filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-04-01")
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_sidecar_incremental_append_equals_bootstrap(spark, tmp_path):
    """write→append→pruned-read: the incrementally-maintained sidecar must
    equal a fresh full-scan rebuild, and pruned reads over the evolving
    table must stay row-identical to the plain filtered scan."""
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.sources import parquet as P

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    layout = str(tmp_path / "orders_incr")
    side = str(tmp_path / "orders_incr_sidecar")

    batches = [
        orders.filter(F.col("o_orderkey") % 3 == i).repartition(2)
        for i in range(3)
    ]
    for b in batches:
        P.append_with_sidecar(b, layout, ["o_orderdate"], side)

    incr = P.load_sidecar(spark, side)
    boot = P.build_minmax_sidecar(spark, layout, ["o_orderdate"])
    assert sorted(map(tuple, incr.collect())) == sorted(
        map(tuple, boot.collect())
    )

    lo, hi = "1995-01-01", "1995-07-01"
    pruned = P.read_pruned_by_sidecar(spark, layout, incr, "o_orderdate", lo, hi)
    plain = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_sidecar_compact_repairs(spark, tmp_path):
    """compact_sidecar rebuilds the persisted sidecar in place (atomic
    swap); the result equals the incremental one on unchanged data and
    recovers after the sidecar is deleted."""
    import shutil

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.sources import parquet as P

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    layout = str(tmp_path / "orders_cmp")
    side = str(tmp_path / "orders_cmp_sidecar")
    P.append_with_sidecar(orders.repartition(3), layout, ["o_orderdate"], side)
    want = sorted(map(tuple, P.load_sidecar(spark, side).collect()))

    shutil.rmtree(side)  # lose the sidecar
    P.compact_sidecar(spark, layout, ["o_orderdate"], side)
    got = sorted(map(tuple, P.load_sidecar(spark, side).collect()))
    assert got == want


def test_compact_parquet_dir_collapses_small_files(spark, tmp_path):
    """Many small appended files compact to the target count with data
    unchanged, and the sidecar is rebuilt to match the new files so pruned
    reads keep working."""
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.sources import parquet as P

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    layout = str(tmp_path / "orders_sm")
    side = str(tmp_path / "orders_sm_sidecar")
    for i in range(4):
        P.append_with_sidecar(
            orders.filter(F.col("o_orderkey") % 4 == i).repartition(5),
            layout, ["o_orderdate"], side,
        )
    import os

    n_before = len([f for f in os.listdir(layout) if f.endswith(".parquet")])
    assert n_before >= 20
    want = sorted(map(tuple, orders.collect()))

    P.compact_parquet_dir(
        spark, layout,
        rows_per_file=1 << 30,
        range_by=["o_orderdate"],
        sidecar_cols=["o_orderdate"],
        sidecar_path=side,
    )
    files_after = [f for f in os.listdir(layout) if f.endswith(".parquet")]
    assert len(files_after) < n_before
    assert sorted(map(tuple, spark.read.parquet(layout).collect())) == want

    # rebuilt sidecar covers exactly the new files and still prunes
    sc = P.load_sidecar(spark, side)
    assert {r["file"].rsplit("/", 1)[-1] for r in sc.collect()} == set(files_after)
    lo, hi = "1995-01-01", "1995-07-01"
    pruned = P.read_pruned_by_sidecar(spark, layout, sc, "o_orderdate", lo, hi)
    plain = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_binary_ingest_to_asset_table(spark, tmp_path):
    """Media-directory ingest: one row per file, deterministic ids,
    extension-derived media types, content intact, length filter pushed to
    the binaryFile reader."""
    from trafficbigdatasearch_spark.operators import multimodal as MM
    from trafficbigdatasearch_spark.sources import binary as B

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake" * 10)
    (d / "b.wav").write_bytes(b"RIFF-fake" * 200)
    (d / "c.xyz").write_bytes(b"opaque")
    (d / "skip.txt").write_bytes(b"not media")

    assets = B.assets_from_files(spark, str(d), glob="*.{png,wav,xyz}")
    rows = {r["meta"]: r for r in assets.collect()}
    assert len(rows) == 3
    by_ext = {r["media_type"] for r in rows.values()}
    assert by_ext == {"image", "audio", "binary"}
    total = sum(len(r["payload"]) for r in rows.values())
    assert total == 90 + 1800 + 6

    # ids deterministic under re-read
    again = {r["asset_id"] for r in B.assets_from_files(spark, str(d), glob="*.{png,wav,xyz}").collect()}
    assert again == {r["asset_id"] for r in rows.values()}

    # length guard pushes down (oversized wav excluded before read)
    small = B.assets_from_files(spark, str(d), glob="*.{png,wav,xyz}", max_bytes=100)
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "LessThanOrEqual(length" in plan or "length" in plan, plan
    assert {r["media_type"] for r in small.collect()} == {"image", "binary"}

    # the asset table feeds the multimodal kernels directly
    feats = MM.extract_features(small)
    assert feats.count() == 2


def test_verify_sidecar_manifest_detects_gap(spark, tmp_path):
    """A data file missing from the sidecar (crashed ingest) is reported;
    after compact_sidecar repair the manifest is consistent again."""
    import os

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.sources import parquet as P

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    layout = str(tmp_path / "o")
    side = str(tmp_path / "o_sc")
    P.append_with_sidecar(orders.repartition(2), layout, ["o_orderdate"], side)
    assert P.verify_sidecar_manifest(spark, layout, P.load_sidecar(spark, side)) == []

    # simulate a crash: data lands without its sidecar rows
    orders.limit(10).repartition(1).write.mode("append").parquet(layout)
    missing = P.verify_sidecar_manifest(
        spark, layout, P.load_sidecar(spark, side)
    )
    assert len(missing) == 1

    P.compact_sidecar(spark, layout, ["o_orderdate"], side)
    assert P.verify_sidecar_manifest(spark, layout, P.load_sidecar(spark, side)) == []


def test_minmax_sidecar_unselective_range_falls_back_to_dir(spark, tmp_path):
    """Verdict r7 #7: at 10^6-file scale an UNSELECTIVE predicate must not
    ship ~every path through the driver — when >= _PRUNE_FALLBACK_RATIO of
    the sidecar survives, the reader gets the DIRECTORY + residual (rows
    identical, planning O(1)); a selective range still gets the explicit
    pruned file list."""
    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.sources import parquet as P

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    layout = str(tmp_path / "orders_fallback")
    P.write_sized(
        orders, layout, rows_per_file=1 << 30, range_by=["o_orderdate"], n_files=8
    )
    sidecar = P.build_minmax_sidecar(spark, layout, ["o_orderdate"])
    lo, hi = "1990-01-01", "2050-01-01"  # covers everything -> fallback
    wide = P.read_pruned_by_sidecar(spark, layout, sidecar, "o_orderdate", lo, hi)
    assert sorted(map(tuple, wide.collect())) == sorted(
        map(tuple, orders.collect())
    )
    # fallback shape: the scan's paths are the directory listing (all 8
    # files), NOT an explicit subset — and input_file_name confirms all read
    assert len(wide.inputFiles()) == 8
    # a selective quarter still prunes to a strict subset
    narrow = P.read_pruned_by_sidecar(
        spark, layout, sidecar, "o_orderdate", "1995-01-01", "1995-04-01"
    )
    assert 0 < len(narrow.inputFiles()) < 8
    # r9 (verdict r8 #8): the BOUNDARY itself — with 8 range files, a
    # predicate surviving exactly 7 (87.5% >= 80%) must take the
    # directory fallback, while 6 (75% < 80%) must get the explicit
    # 6-file list.  Cut points come from the sidecar's own per-file
    # ranges so the test tracks any re-chunking.
    stats = sorted(
        sidecar.select("file", "min_o_orderdate", "max_o_orderdate").collect(),
        key=lambda r: r["min_o_orderdate"],
    )
    assert len(stats) == 8

    def survivors(hi):  # the reader's own closed='both' overlap count
        return sum(
            1
            for r in stats
            if str(r["min_o_orderdate"]) <= hi and str(r["max_o_orderdate"]) >= lo
        )

    def hi_for(n_files):  # a hi yielding exactly n surviving files
        for r in stats:
            cand = str(r["max_o_orderdate"])
            if survivors(cand) == n_files:
                return cand
        raise AssertionError(f"no cut point yields {n_files} survivors")

    seven = P.read_pruned_by_sidecar(
        spark, layout, sidecar, "o_orderdate", lo, hi_for(7), closed="both"
    )
    assert len(seven.inputFiles()) == 8, "87.5% survivors must fall back"
    hi6 = hi_for(6)
    six = P.read_pruned_by_sidecar(
        spark, layout, sidecar, "o_orderdate", lo, hi6, closed="both"
    )
    assert len(six.inputFiles()) == 6, "75% survivors must prune explicitly"
    # rows stay correct on both sides of the boundary (residual re-filter)
    want6 = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi6)
    )
    assert sorted(map(tuple, six.collect())) == sorted(map(tuple, want6.collect()))


def test_scene_changes_hand_case(spark):
    from trafficbigdatasearch_spark.operators import multimodal

    # frames of 4 chars: 'aaaa'|'aaaa'|'bbbb' -> transition 0->1 identical
    # (hamming 0, not a boundary), 1->2 different (boundary w.h.p.)
    assets = spark.createDataFrame(
        [(1, "video", bytearray(b"aaaaaaaabbbb"), "{}")],
        "asset_id: bigint, media_type: string, payload: binary, meta: string",
    )
    out = {
        r["frame_idx"]: r.asDict()
        for r in multimodal.scene_changes(
            assets, frame_chars=4, threshold=0
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["hamming"] == 0 and out[1]["is_boundary"] is False
    assert out[2]["hamming"] > 0 and out[2]["is_boundary"] is True


def test_scene_changes_single_frame_asset_emits_nothing(spark):
    from trafficbigdatasearch_spark.operators import multimodal

    assets = spark.createDataFrame(
        [(1, "video", bytearray(b"tiny"), "{}"),
         (2, "video", bytearray(b""), "{}")],
        "asset_id: bigint, media_type: string, payload: binary, meta: string",
    )
    assert multimodal.scene_changes(assets, frame_chars=100).count() == 0
