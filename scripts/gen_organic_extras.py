"""Generate ORGANICALLY-scaled events / embeddings / trade tables for the
round-14 scale probes (VERDICT r13 #6).

Same philosophy as :mod:`gen_organic_docs` — real corpora grow by adding
ENTITIES at constant per-entity rates, not by densifying every existing
entity — applied to the three non-document table families the remaining
top bench rows read:

- ``events``  (c16_holt_smoothing): users × constant ~67-event series over
  the same 30-day window; scaling ``n`` grows the user count, so the
  per-user ``applyInPandas`` group SIZE stays fixed and the group COUNT
  scales — the shape a per-entity timeseries operator meets in production.
- ``embeddings`` (c8_semantic_dedup): labels × constant ~200-vector
  blocks; 15% of base vectors spawn a near-dup variant perturbed to
  cosine ≥ 0.9 (relative-norm ε=0.2 noise → cos ≈ 0.98).  Label count
  scales with the corpus, so block-join pair mass stays LINEAR — the
  organic contrast to fixed-label densification, where within-block pairs
  grow quadratically.
- ``orders``/``lineitem`` (c17_pagerank, c17_label_propagation): the
  trade bipartite graph with sf0.1's shape — ~10 orders/customer, 4 line
  items/order, supplier popularity rank-skewed P(r) ∝ 1/(r+10) — with
  customer AND supplier counts scaling together, so node degrees stay
  O(1)-distributed and edge count scales linearly (the offline stand-in
  for the networked gen_organic_sf1 TPC-H corpus, still unreachable from
  this box — SCALE.md round-10a).

Usage: python scripts/gen_organic_extras.py [scale] [out_dir]
       scale=1 mirrors sf0.1 row counts; scale=10 is the 10×-organic probe
Writes events/embeddings/orders/lineitem ``.parquet`` (testdata column
subsets the probe queries read) with deterministic seeds per scale.

Each table is sharded into ``scale`` equal files (1× = one file, matching
sf0.1's on-disk layout).  This is the organic file shape too — a corpus
10× bigger arrives as ~10× more files, not one 10×-bigger file — and it
is load-bearing for the probes: Spark's scan parallelism follows file
splits, and a single 6 MB parquet file puts ALL fused per-row compute
(cosine folds, shingle explodes) on ONE core regardless of cluster size
(the spread_for_compute rationale, sources/tables.py; a first probe run
with unsharded 10× tables measured the ANN monitor 3.4× slower than the
sharded layout purely from that serialization).
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 1
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/organic_extras_{SCALE}x"

EVENT_TYPES = ["click", "view", "purchase", "login", "error"]


def write_sharded(table: pa.Table, path: str, shards: int) -> None:
    """Write ``table`` as a parquet DIRECTORY of ``shards`` row-sliced
    files.  Spark reads the directory transparently; DuckDB 1.0.0 needs a
    glob (``read_parquet('<dir>/*.parquet')``) — the tests/oracle.py view
    pattern (``FROM '<dir>/<name>.parquet'``) does NOT resolve a bare
    directory, so these corpora are probe inputs, not oracle inputs
    (r14 review)."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    os.makedirs(path)
    n = table.num_rows
    per = (n + shards - 1) // shards
    for i in range(shards):
        chunk = table.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{i:05d}.parquet"))


def main() -> None:
    # c8_semantic_dedup plants its own duplicates at vec_id + 1M/2M
    # (plans/curation_queries.py _semantic_corpus); our variant ids start
    # at n_base*10 = 20000*SCALE, so SCALE >= 50 would collide with the
    # planted range and corrupt dedup semantics (r14 review)
    if 2000 * SCALE * 10 >= 1_000_000:
        raise SystemExit(
            f"scale {SCALE} puts variant vec_ids into c8_semantic_dedup's "
            "planted +1M id range; max supported scale is 49"
        )
    rng = np.random.default_rng(20260816 + SCALE)
    os.makedirs(OUT, exist_ok=True)

    # ---- events: USERS scale, per-user series length fixed -------------
    n_users = 1500 * SCALE
    counts = rng.poisson(67, n_users)
    user_id = np.repeat(np.arange(n_users, dtype=np.int64), counts)
    n_ev = len(user_id)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 30 * 86_400_000_000, n_ev)
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user_id),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, len(EVENT_TYPES), n_ev)]
            ),
            "value": pa.array(rng.normal(50.0, 15.0, n_ev)),
        }
    )
    write_sharded(events, os.path.join(OUT, "events.parquet"), SCALE)

    # ---- embeddings: LABELS scale, block size + dup rate fixed ----------
    n_base = 2000 * SCALE
    n_labels = 10 * SCALE
    dim = 64
    vecs = rng.normal(0.0, 1.0, (n_base, dim)).astype(np.float32)
    labels = (np.arange(n_base) % n_labels).astype(np.int32)
    dup_mask = rng.random(n_base) < 0.15
    dup_src = np.flatnonzero(dup_mask)
    noise = rng.normal(0.0, 1.0, (len(dup_src), dim)).astype(np.float32)
    noise *= (
        0.2
        * np.linalg.norm(vecs[dup_src], axis=1, keepdims=True)
        / np.maximum(np.linalg.norm(noise, axis=1, keepdims=True), 1e-9)
    )
    variants = vecs[dup_src] + noise  # cos ≈ 1/sqrt(1+0.04) ≈ 0.98
    all_vecs = np.vstack([vecs, variants])
    all_labels = np.concatenate([labels, labels[dup_src]])
    all_ids = np.concatenate(
        [np.arange(n_base), n_base * 10 + np.arange(len(dup_src))]
    ).astype(np.int64)
    emb = pa.table(
        {
            "vec_id": pa.array(all_ids),
            "embedding": pa.array(list(all_vecs), pa.list_(pa.float32())),
            "label": pa.array(all_labels, pa.int32()),
        }
    )
    write_sharded(emb, os.path.join(OUT, "embeddings.parquet"), SCALE)

    # ---- trade graph: customers+suppliers scale, degrees fixed ----------
    n_cust = 15_000 * SCALE
    n_supp = 1_000 * SCALE
    n_orders = 150_000 * SCALE
    items_per_order = 4
    o_orderkey = np.arange(n_orders, dtype=np.int64)
    o_custkey = rng.integers(0, n_cust, n_orders).astype(np.int64)
    write_sharded(
        pa.table({"o_orderkey": o_orderkey, "o_custkey": o_custkey}),
        os.path.join(OUT, "orders.parquet"),
        SCALE,
    )
    n_li = n_orders * items_per_order
    ranks = np.arange(n_supp, dtype=np.float64)
    p = 1.0 / (ranks + 10.0)
    p /= p.sum()
    l_suppkey = rng.choice(n_supp, n_li, p=p).astype(np.int64)
    write_sharded(
        pa.table(
            {
                "l_orderkey": np.repeat(o_orderkey, items_per_order),
                "l_suppkey": l_suppkey,
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            }
        ),
        os.path.join(OUT, "lineitem.parquet"),
        SCALE,
    )
    print(
        f"wrote {OUT}: events={n_ev} embeddings={len(all_ids)} "
        f"orders={n_orders} lineitem={n_li}"
    )


if __name__ == "__main__":
    main()
