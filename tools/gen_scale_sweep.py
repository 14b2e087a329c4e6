#!/usr/bin/env python3
"""Synthetic scale sweep: multiply the driver corpus N x with id offsets.

The r7 verdict's standing gate: cap-class claims (reservoir exactness,
DF caps, bucket-histogram cutoffs) must be exercised BEYOND their caps,
not just at the driver SFs. This writes <out>/ as a full testdata dir
where documents/embeddings/orders/lineitem are replicated N times:

  - documents: doc_id += k*100_000_000, text IDENTICAL across replicas
    (maximal DF-cap / dup-candidate stress; planted-twin offsets at
    +10_000_000 stay collision-free).
  - embeddings: vec_id += k*100_000_000, embedding[0] += k*1e-3 (breaks
    cross-replica score ties; within-replica planted twins stay exact).
  - orders/lineitem: orderkey += k*10_000_000 (joins preserved).
  - everything else copied verbatim (events keeps TIMESTAMP(NANOS)).

Usage: gen_scale_sweep.py <srcSfDir> <outDir> [N=10] [tables]
  tables: comma list of tables to replicate (default all four);
  non-replicated tables are copied verbatim — e.g. a 100x documents
  CC sweep doesn't need 60M lineitem rows.
"""
import shutil, sys, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

COPY = ["region", "nation", "customer", "supplier", "part"]


def replicate(src, out, table, n, key_col, key_off, perturb=None):
    t = pq.read_table(f"{src}/{table}.parquet")
    parts = []
    for k in range(n):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name == key_col:
                col = pc.add(col, pa.scalar(k * key_off, type=col.type))
            elif perturb is not None and name == perturb and k > 0:
                # bump element 0 of each float-list by k*1e-3 in float32
                vals = col.to_pylist()
                for v in vals:
                    if v:
                        import struct
                        v[0] = struct.unpack(
                            "f", struct.pack("f", v[0] + k * 1e-3))[0]
                col = pa.array(vals, type=col.type)
            cols[name] = col
        parts.append(pa.table(cols, schema=t.schema))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out}/{table}.parquet")
    print(f"{table}: {t.num_rows} -> {big.num_rows}")


def replicate_events(src, out, n):
    """events replicates along the USER axis (r13): event_id +=
    k*100_000_000, user_id += k*1_000_000, ts/type/value/props
    verbatim — N x the users over the same day span, so the events
    analytics family (funnel/retention/transitions/rolling quantiles/
    interval join/anomaly/kmv) genuinely scales in the sweep instead
    of re-running on identical data. TIMESTAMP(NANOS) is preserved
    (schema passed through, parquet 2.6 writer keeps ns).
    """
    t = pq.read_table(f"{src}/events.parquet")
    # loud guard (the ImageDedup twin-band precedent): the axis offsets
    # only partition the id space if base ids stay below them — a base
    # corpus with user_id >= 1e6 would silently MERGE replicas into the
    # same users, corrupting the funnel/retention/transitions scaling
    # semantics this replication exists to exercise.
    max_uid = pc.max(t.column("user_id")).as_py()
    max_eid = pc.max(t.column("event_id")).as_py()
    assert max_uid < 1_000_000, (
        f"base user_id max {max_uid} >= 1e6 replica offset — replicas "
        "would alias; raise the offset")
    assert max_eid < 100_000_000, (
        f"base event_id max {max_eid} >= 1e8 replica offset — replicas "
        "would alias; raise the offset")
    parts = []
    for k in range(n):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name == "event_id":
                col = pc.add(col, pa.scalar(k * 100_000_000, type=col.type))
            elif name == "user_id":
                col = pc.add(col, pa.scalar(k * 1_000_000, type=col.type))
            cols[name] = col
        parts.append(pa.table(cols, schema=t.schema))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out}/events.parquet")
    print(f"events: {t.num_rows} -> {big.num_rows}")


def main():
    src, out = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spec = {
        "documents": ("doc_id", 100_000_000, None),
        "embeddings": ("vec_id", 100_000_000, "embedding"),
        "orders": ("o_orderkey", 10_000_000, None),
        "lineitem": ("l_orderkey", 10_000_000, None),
        "events": (None, None, None),
    }
    tables = (sys.argv[4].split(",") if len(sys.argv) > 4
              else [t for t in spec if t != "events"])
    os.makedirs(out, exist_ok=True)
    for t in COPY + [t for t in spec if t not in tables]:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    for t in tables:
        if t == "events":
            replicate_events(src, out, n)
            continue
        key, off, perturb = spec[t]
        replicate(src, out, t, n, key, off, perturb=perturb)


if __name__ == "__main__":
    main()
