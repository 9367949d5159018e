"""Synthesize a larger fixture set by replicating an existing sf dir
with disjoint key spaces — for SCALE-RATIO measurement only (bench
timings at 10x), never for correctness gates (oracles stay at the
driver-generated sf dirs).

Replication is shape-preserving, not copy-pasting:
- events: replicas get fresh event_id/user_id ranges (10x entities, 10x
  density over the same 30-day window — matching how the driver's own
  sf0.01 -> sf0.1 step scales).
- documents: replica texts have every word suffixed with the replica
  tag, so shingle sets are disjoint ACROSS replicas (a naive copy makes
  every doc a 10-way exact dup and blows the near-dup pair count
  superlinearly — exactly the artifact a scale test must not inject)
  while the planted near-dup structure WITHIN each replica is preserved
  (pair counts scale linearly, like a real crawl).
- embeddings: replicas draw fresh deterministic vectors (seeded per
  replica) with the same dim/scale, so LSH/IVF bucket occupancy grows
  10x without creating cosine~1 cross-replica twins.
- lineitem/orders/customer/supplier/part: key-shifted replicas;
  region/nation stay fixed (true dimensions don't scale).

Usage: python scripts/make_scaled_fixture.py <src_sf_dir> <dst_dir> [factor]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_STRIDE = 10_000_000


def _replicate(table: pa.Table, factor: int, mutate) -> pa.Table:
    chunks = [mutate(table, i) for i in range(factor)]
    return pa.concat_tables(chunks)


def _shift(table: pa.Table, cols: dict[str, int], i: int) -> pa.Table:
    if i == 0:
        return table
    out = table
    for name, stride in cols.items():
        idx = out.schema.get_field_index(name)
        col = out.column(name)
        shifted = pa.compute.add(col, pa.scalar(i * stride, type=col.type))
        out = out.set_column(idx, out.schema.field(name), shifted)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    def passthrough(name):
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))

    for name in ("region", "nation"):
        passthrough(name)

    shifts = {
        "customer": {"c_custkey": KEY_STRIDE},
        "supplier": {"s_suppkey": KEY_STRIDE},
        "part": {"p_partkey": KEY_STRIDE},
        "orders": {"o_orderkey": KEY_STRIDE, "o_custkey": KEY_STRIDE},
        "lineitem": {
            "l_orderkey": KEY_STRIDE,
            "l_partkey": KEY_STRIDE,
            "l_suppkey": KEY_STRIDE,
        },
        "events": {"event_id": KEY_STRIDE, "user_id": 100_000},
    }
    for name, cols in shifts.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        out = _replicate(t, factor, lambda tab, i: _shift(tab, cols, i))
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(name, t.num_rows, "->", out.num_rows)

    # documents: per-replica word suffix keeps replicas shingle-disjoint
    docs = pq.read_table(os.path.join(src, "documents.parquet"))

    def mutate_docs(tab: pa.Table, i: int) -> pa.Table:
        if i == 0:
            return tab
        tab = _shift(tab, {"doc_id": KEY_STRIDE}, i)
        texts = tab.column("text").to_pylist()
        tag = f"r{i}"
        new_texts = [
            None if t is None else " ".join(f"{w}{tag}" for w in t.split(" "))
            for t in texts
        ]
        n_chars = pa.array(
            [None if t is None else len(t) for t in new_texts], type=pa.int64()
        )
        ti = tab.schema.get_field_index("text")
        tab = tab.set_column(ti, tab.schema.field("text"), pa.array(new_texts))
        ni = tab.schema.get_field_index("n_chars")
        return tab.set_column(ni, tab.schema.field("n_chars"), n_chars)

    out = _replicate(docs, factor, mutate_docs)
    pq.write_table(out, os.path.join(dst, "documents.parquet"))
    print("documents", docs.num_rows, "->", out.num_rows)

    # embeddings: fresh deterministic vectors per replica, same scale
    emb = pq.read_table(os.path.join(src, "embeddings.parquet"))
    base_vecs = np.stack(
        [np.asarray(v, dtype=np.float32) for v in emb.column("embedding").to_pylist()]
    )
    dim, scale = base_vecs.shape[1], float(np.abs(base_vecs).mean())

    def mutate_emb(tab: pa.Table, i: int) -> pa.Table:
        if i == 0:
            return tab
        tab = _shift(tab, {"vec_id": KEY_STRIDE}, i)
        rng = np.random.RandomState(1000 + i)
        fresh = rng.normal(0.0, scale * 1.2533, size=(tab.num_rows, dim)).astype(
            np.float32
        )  # 1.2533 = sqrt(pi/2): normal with that sigma matches E|x|=scale
        vi = tab.schema.get_field_index("embedding")
        arr = pa.array(list(fresh), type=tab.schema.field("embedding").type)
        return tab.set_column(vi, tab.schema.field("embedding"), arr)

    out = _replicate(emb, factor, mutate_emb)
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"))
    print("embeddings", emb.num_rows, "->", out.num_rows)


if __name__ == "__main__":
    main()
