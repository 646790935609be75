"""Synthesize a larger scale factor from an existing testdata dir.

The driver ships ``/root/testdata/sf{0.001,0.01,0.1}``; the scaling
ledger (SCALE.md) needs a ~sf1 point to show query wall-time stays
linear one decade past the largest shipped SF.  This tool replicates a
source SF ``factor`` times with per-replica key striding so referential
integrity is preserved (orders in replica *i* reference customers in
replica *i*, lineitem references orders/part/supplier of the same
replica).  ``region``/``nation`` stay fixed, matching TPC-H semantics
where dimension tables do not grow with SF.

Two columns need more than a key shift to keep the *rates* that drive
plan shape constant under replication:

- ``documents.text``: verbatim replication would make every doc an
  exact duplicate of its 9 siblings, collapsing the corpus into giant
  duplicate clusters (quadratic within-cluster pair growth is then a
  *data* artifact, not a plan property).  Each replica instead applies
  a per-replica vowel+consonant permutation via ``translate`` (25
  distinct mappings, so no two replicas coincide) — length (and so
  ``n_chars``) is preserved, intra-replica duplicate structure is
  preserved exactly, and cross-replica shingle overlap drops to ~0 so
  the near-dup rate stays at the source corpus's rate.
- ``embeddings.embedding``: verbatim replication would put 10 exact
  copies of every vector in the index.  Each replica instead applies a
  deterministic per-replica sign-flip pattern (seeded ``numpy`` ±1
  vector), which preserves norms and the intra-replica cosine
  structure while decorrelating replicas.

Timestamps are kept verbatim so window densities per (replicated) user
and date-filter selectivities are unchanged — 10x rows at the same
selectivity, i.e. clean linear scaling of useful work.

Usage: python tools/scale_data.py [--src DIR] [--out DIR] [--factor N]
"""

from __future__ import annotations

import argparse
import os

LETTERS = "abcdefghijklmnopqrstuvwxyz"


def text_cycle(i: int) -> tuple[str, str]:
    """Per-replica letter permutation (translate src, dst), identity for
    replica 0, a seeded random 26-letter bijection otherwise.

    Why the FULL alphabet: the original 15-letter rotation family left
    11 letters (plus digits/punctuation/whitespace) fixed, so any
    k-shingle dominated by unpermuted characters stayed byte-identical
    across every replica — its document frequency multiplied by the
    factor, climbed into the max_df cap, and reintroduced quadratic
    candidate pairs in the n-gram dedup operators as a pure DATA
    artifact (measured: dedup_ngram_jaccard 136 s at factor-50 with the
    rotation family). A full per-replica bijection leaves only
    digit/space-only shingles shared, keeping cross-replica shingle df
    at ~the source corpus's rate. Any bijection preserves length and
    intra-replica duplicate structure exactly."""
    if i == 0:
        return (LETTERS, LETTERS)
    import random

    dst = list(LETTERS)
    random.Random(9_000 + i).shuffle(dst)
    return (LETTERS, "".join(dst))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scratch/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    src = args.src

    def q(sql: str):
        return con.execute(sql)

    def scalar(sql: str):
        return q(sql).fetchone()[0]

    def tbl(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    # key strides: one past the max of each key domain in the source
    strides = {
        "custkey": scalar(f"SELECT max(c_custkey)+1 FROM {tbl('customer')}"),
        "suppkey": scalar(f"SELECT max(s_suppkey)+1 FROM {tbl('supplier')}"),
        "partkey": scalar(f"SELECT max(p_partkey)+1 FROM {tbl('part')}"),
        "orderkey": scalar(f"SELECT max(o_orderkey)+1 FROM {tbl('orders')}"),
        "event_id": scalar(f"SELECT max(event_id)+1 FROM {tbl('events')}"),
        "user_id": scalar(f"SELECT max(user_id)+1 FROM {tbl('events')}"),
        "doc_id": scalar(f"SELECT max(doc_id)+1 FROM {tbl('documents')}"),
        "vec_id": scalar(f"SELECT max(vec_id)+1 FROM {tbl('embeddings')}"),
    }

    def write_union(name: str, select_for_replica) -> None:
        parts = [select_for_replica(i) for i in range(args.factor)]
        union = " UNION ALL ".join(parts)
        out = f"{args.out}/{name}.parquet"
        q(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        n = scalar(f"SELECT count(*) FROM read_parquet('{out}')")
        print(f"{name}: {n} rows -> {out}")

    # fixed dims: copy verbatim
    for name in ("region", "nation"):
        q(
            f"COPY (SELECT * FROM {tbl(name)}) TO "
            f"'{args.out}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"{name}: copied verbatim")

    # c_name/s_name are key-derived ('Supplier#%09d'): regenerate them
    # from the strided key. Verbatim copies collide across replicas and
    # make group-by-key vs group-by-name diverge (surfaced as a false
    # q21 engine mismatch at sf1 — a data artifact, not a plan bug).
    write_union(
        "customer",
        lambda i: f"""SELECT c_custkey + {i * strides['custkey']} AS c_custkey,
            'Customer#' || lpad(CAST(c_custkey + {i * strides['custkey']} AS VARCHAR), 9, '0')
              AS c_name,
            c_nationkey, c_acctbal, c_mktsegment FROM {tbl('customer')}""",
    )
    write_union(
        "supplier",
        lambda i: f"""SELECT s_suppkey + {i * strides['suppkey']} AS s_suppkey,
            'Supplier#' || lpad(CAST(s_suppkey + {i * strides['suppkey']} AS VARCHAR), 9, '0')
              AS s_name,
            s_nationkey, s_acctbal FROM {tbl('supplier')}""",
    )
    write_union(
        "part",
        lambda i: f"""SELECT p_partkey + {i * strides['partkey']} AS p_partkey,
            p_name, p_brand, p_type, p_size, p_retailprice FROM {tbl('part')}""",
    )
    write_union(
        "orders",
        lambda i: f"""SELECT o_orderkey + {i * strides['orderkey']} AS o_orderkey,
            o_custkey + {i * strides['custkey']} AS o_custkey,
            o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {tbl('orders')}""",
    )
    write_union(
        "lineitem",
        lambda i: f"""SELECT l_orderkey + {i * strides['orderkey']} AS l_orderkey,
            l_partkey + {i * strides['partkey']} AS l_partkey,
            l_suppkey + {i * strides['suppkey']} AS l_suppkey,
            l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
            l_returnflag, l_linestatus, l_shipdate FROM {tbl('lineitem')}""",
    )
    write_union(
        "events",
        lambda i: f"""SELECT event_id + {i * strides['event_id']} AS event_id,
            ts, user_id + {i * strides['user_id']} AS user_id,
            event_type, value, props FROM {tbl('events')}""",
    )
    write_union(
        "documents",
        lambda i: f"""SELECT doc_id + {i * strides['doc_id']} AS doc_id,
            translate(text, '{text_cycle(i)[0]}', '{text_cycle(i)[1]}') AS text,
            lang, source, n_chars FROM {tbl('documents')}""",
    )

    # embeddings: per-replica deterministic sign-flip via numpy/pyarrow
    emb = q(f"SELECT vec_id, embedding, label FROM {tbl('embeddings')}").fetch_arrow_table()
    vec_ids = emb.column("vec_id").to_numpy()
    labels = emb.column("label").to_numpy()
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    for i in range(args.factor):
        rng = np.random.default_rng(1234 + i)
        signs = np.where(rng.random(dim) < 0.5, -1.0, 1.0).astype(np.float32)
        if i == 0:
            signs = np.ones(dim, dtype=np.float32)
        out_ids.append(vec_ids + i * strides["vec_id"])
        out_vecs.append(vecs * signs)
        out_labels.append(labels)
    all_ids = np.concatenate(out_ids)
    all_vecs = np.concatenate(out_vecs)
    all_labels = np.concatenate(out_labels)
    table = pa.table(
        {
            "vec_id": pa.array(all_ids, type=pa.int64()),
            "embedding": pa.array(
                [row for row in all_vecs.tolist()], type=pa.list_(pa.float32())
            ),
            "label": pa.array(all_labels, type=pa.int32()),
        }
    )
    pq.write_table(table, f"{args.out}/embeddings.parquet")
    print(f"embeddings: {table.num_rows} rows -> {args.out}/embeddings.parquet")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
