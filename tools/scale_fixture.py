#!/usr/bin/env python
"""Deterministic scale-up fixture: replicate the sf0.1 testdata K times into
a measurement-only directory, preserving join structure and at-scale input
shape.  NOT an oracle fixture — the driver's correctness gate stays on the
driver-generated sf0.001/sf0.01; this exists so the r13 compute-width
mechanism (partitioning.py) can be measured at a data size where the scan
itself supplies parallelism (VERDICT r13 "Next round" #1).

Design (all pure functions of the source bytes + replica index — rerunning
reproduces the fixture bit-for-bit):

- Fact tables are replicated with DISJOINT key offsets (replica r shifts
  every key in a family by r * (max_key + 1)), so each replica is an
  isomorphic copy of the original join graph: output cardinalities grow
  linearly in K, never quadratically.
- Dimension tables (region, nation) are shared across replicas, matching
  how a real larger corpus keeps small dims small.
- ``documents.text`` in replicas r >= 1 is SALTED: a token unique per
  (replica, doc, block) is inserted every 3 tokens.  Identical text
  replicated K times would give every doc K-1 exact duplicates and grow
  LSH candidate pairs ~K^2 — an artifact of replication, not of scale.
  Salting drops cross-replica Jaccard to ~0.6 (below the dedup thresholds)
  so the near-duplicate structure stays ~that of the source corpus while
  token volume grows Kx.  Replica 0 is byte-identical to the source.
- ``embeddings`` in replicas r >= 1 get a deterministic per-replica nudge
  on component 0 (r * 0.25), large enough to keep cross-replica copies out
  of near-dup distance thresholds.
- Every scaled table is written as ~``files_per_table`` parquet files:
  Spark's file packing charges ``openCostInBytes`` per file, so >= 64
  small files give the scan >= 64 input splits — the at-scale shape where
  ``ensure_compute_width`` must be an identity.

Usage: python tools/scale_fixture.py <src_sf_dir> <dst_dir> <replicas>
e.g.   python tools/scale_fixture.py /root/testdata/sf0.1 /tmp/r14/sf0.5x 5
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: key column -> stride family (strides are computed from the family's
#: owning table so foreign keys shift consistently with their primary key)
KEY_FAMILIES = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}

#: stride name -> (table, column) that defines it
STRIDE_SOURCE = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}

DIMS = {"region", "nation"}


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def _salt_text(texts: list, doc_ids: list, r: int) -> list:
    """Insert a (replica, doc, block)-unique token every 3 tokens.  Pure
    string work; deterministic."""
    out = []
    for text, did in zip(texts, doc_ids):
        if text is None:
            out.append(None)
            continue
        toks = text.split(" ")
        buf = []
        for i, t in enumerate(toks):
            buf.append(t)
            if i % 3 == 2:
                buf.append(f"zq{r}d{did}b{i // 3}")
        out.append(" ".join(buf))
    return out


def _replica(tbl: pa.Table, name: str, r: int, strides: dict) -> pa.Table:
    if r == 0:
        return tbl
    cols = {}
    for i, field in enumerate(tbl.schema):
        col = tbl.column(i)
        fam = KEY_FAMILIES.get(name, {}).get(field.name)
        if fam is not None:
            off = r * strides[fam]
            cols[field.name] = pc.add(col, off).cast(field.type)
        else:
            cols[field.name] = col
    if name == "documents":
        ids = cols["doc_id"].to_pylist()
        cols["text"] = pa.array(
            _salt_text(tbl.column("text").to_pylist(), ids, r), type=pa.string()
        )
    if name == "embeddings":
        nudged = []
        for vec in tbl.column("embedding").to_pylist():
            if vec is None:
                nudged.append(None)
            else:
                nudged.append([vec[0] + 0.25 * r] + vec[1:])
        cols["embedding"] = pa.array(nudged, type=tbl.schema.field("embedding").type)
    return pa.table(cols, schema=tbl.schema)


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    files_per_table = int(os.environ.get("SCALE_FIXTURE_FILES", "64"))
    strides = {
        fam: int(pc.max(_read(src, t).column(c)).as_py()) + 1
        for fam, (t, c) in STRIDE_SOURCE.items()
    }
    for name in TABLES:
        base = _read(src, name)
        out_dir = os.path.join(dst, f"{name}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        if name in DIMS:
            pq.write_table(base, os.path.join(out_dir, "part-000.parquet"))
            print(f"{name}: {base.num_rows} rows (dim, shared)")
            continue
        full = pa.concat_tables(
            [_replica(base, name, r, strides) for r in range(k)]
        )
        n = full.num_rows
        per_file = max(1, (n + files_per_table - 1) // files_per_table)
        for fi, start in enumerate(range(0, n, per_file)):
            pq.write_table(
                full.slice(start, per_file),
                os.path.join(out_dir, f"part-{fi:03d}.parquet"),
                row_group_size=max(1, per_file // 2),
            )
        print(f"{name}: {n} rows in {fi + 1} files")


if __name__ == "__main__":
    main()
