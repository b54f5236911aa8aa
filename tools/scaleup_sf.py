#!/usr/bin/env python3
"""Deterministic 10x scale-up of a testdata SF directory (driver-side
tooling, like oracle_check.py — NOT part of the library).

Purpose: measure the sf0.1 -> sf1.0 wall/cpu scaling exponent of the
heaviest bench queries (VERDICT r11 Next #4). The driver only ships
sf <= 0.1, so sf1.0 is synthesized from sf0.1 as 10 replicas with:

  - all entity keys offset by replica * 10^7 (FK consistency: both
    sides of every TPC-H relationship shift together);
  - region/nation kept single (fixed enumeration dimensions);
  - document TEXT token-suffixed per replica (replica r rewrites every
    token w -> w_r<r>), so replicas share NO shingles/grams with each
    other: without this, every doc would acquire 9 exact/near dups and
    the dedup/LM families would measure an artificial quadratic blowup
    instead of 10x organic growth. Distinct-gram tables therefore grow
    ~linearly with the corpus — the pessimistic (upper-bound) regime
    for count-table shuffles vs Heaps-law sublinearity on real data;
  - embeddings perturbed with a deterministic ZERO-MEAN per
    (vector, dimension, replica) jitter of +/-~0.12 — large enough
    that cross-replica cosines drop well below the 0.95 near-dup
    thresholds (replicas are independent vectors, 10x organic
    growth), zero-mean so no shared drift direction emerges (a
    CONSTANT shift made every high-replica vector near-parallel to
    the all-ones direction: one giant cosine clique, and the
    connected-components queries degenerated — measured, then fixed);
  - events/timestamps kept in-window (10x density, same span).

Everything is pure arithmetic on the base tables — no RNG — so the
scaled directory is bit-reproducible.

Every output file is re-encoded through pyarrow with the testdata
writer profile (RLE_DICTIONARY + snappy, 1Mi-row row groups — what
parquet-cpp writes by default). DuckDB's COPY emits PLAIN-encoded
pages in ~120k-row row groups; measured against dictionary-encoded
sf0.1 files that skews scan-bound queries to ~2-3x their true cpu
factor (TPC-H Q14 read 34.6x instead of ~11x) — the factor table
must compare like-encoded inputs or it measures the writer, not the
query.

Usage: python3 tools/scaleup_sf.py /root/testdata/sf0.1 /tmp/sf1.0 10
"""
import os
import sys

import duckdb
import pyarrow.parquet as pq

OFF = 10_000_000


def reencode(path):
    """Rewrite in the testdata writer profile (pyarrow defaults)."""
    tmp = path + ".reenc"
    pq.write_table(pq.read_table(path), tmp)
    os.replace(tmp, path)


def main(src, dst, reps):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def gen(table, select_r):
        parts = [select_r(0)] + [select_r(r) for r in range(1, reps)]
        q = " UNION ALL ".join(parts)
        out = f"{dst}/{table}.parquet"
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        reencode(out)
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")

    def base(t):
        return f"'{src}/{t}.parquet'"

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {base(t)}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        reencode(f"{dst}/{t}.parquet")
        print(f"{t}: copied 1x")

    gen("customer", lambda r: f"""
        SELECT c_custkey + {r * OFF} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM {base('customer')}""")
    gen("supplier", lambda r: f"""
        SELECT s_suppkey + {r * OFF} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM {base('supplier')}""")
    gen("part", lambda r: f"""
        SELECT p_partkey + {r * OFF} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice FROM {base('part')}""")
    gen("orders", lambda r: f"""
        SELECT o_orderkey + {r * OFF} AS o_orderkey,
               o_custkey + {r * OFF} AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM {base('orders')}""")
    gen("lineitem", lambda r: f"""
        SELECT l_orderkey + {r * OFF} AS l_orderkey,
               l_partkey + {r * OFF} AS l_partkey,
               l_suppkey + {r * OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {base('lineitem')}""")
    gen("events", lambda r: f"""
        SELECT event_id + {r * OFF} AS event_id, ts,
               user_id + {r * OFF} AS user_id, event_type, value, props
        FROM {base('events')}""")

    def doc_text(r):
        if r == 0:
            return "text"
        return f"regexp_replace(text, '(\\S+)', '\\1_r{r}', 'g')"

    gen("documents", lambda r: f"""
        SELECT doc_id + {r * OFF} AS doc_id, {doc_text(r)} AS text,
               lang, source, length({doc_text(r)})::BIGINT AS n_chars
        FROM {base('documents')}""")
    gen("embeddings", lambda r: f"""
        SELECT vec_id + {r * OFF} AS vec_id,
               CASE WHEN {r} = 0 THEN embedding
                 ELSE list_transform(embedding, (x, i) ->
                   (x + (((vec_id * 37 + i * 101 + {r} * 53) % 19) - 9)
                    * 0.013)::FLOAT) END AS embedding,
               label FROM {base('embeddings')}""")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
