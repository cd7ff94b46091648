#!/usr/bin/env python3
"""Synthesize an sfN dataset (K x sf0.1) for the scale-curve bench —
the K-generic form of gen_sf1.py (K=10 reproduces sf1's structure).

Replication preserves workload STRUCTURE instead of duplicating it:
 - documents: per-replica LETTER PERMUTATION (a bijection on texts,
   seeded by replica index), so each replica carries the original's
   internal duplication while replicas share ~no spans/shingles ->
   dedup pair volume scales linearly, not quadratically. (gen_sf1 used
   rotations; only 26 exist, so K > 26 would alias replicas into exact
   duplicates and square the pair volume — permutations don't alias.)
 - embeddings: per-replica deterministic sign-flips (dots within a
   replica are exact, across replicas near-zero).
 - TPC-H fact/dim keys shift by replica so joins keep their selectivity;
   region/nation stay single-copy (true dimensions).
 - events: ids/users shift, timestamps keep their window distribution.

Usage: python3 scripts/gen_sfN.py K [outdir] [table,table,...]
       (default outdir /tmp/sf{K/10}; default all tables)
"""
import sys, os, random
import duckdb

src = "/root/testdata/sf0.1"
K = int(sys.argv[1])
out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf{K // 10}"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute("PRAGMA threads=16")

lower = "abcdefghijklmnopqrstuvwxyz"
upper = lower.upper()


def perm(k):
    """Deterministic letter permutation per replica (identity for k=0)."""
    if k == 0:
        return lower
    cs = list(lower)
    random.Random(1234 + k).shuffle(cs)
    return "".join(cs)


def want(table):
    return only is None or table in only


def copy(table, select_fn):
    if not want(table):
        return
    # chunk the replica union: a K-way UNION ALL trips DuckDB's
    # expression-depth limit past a few hundred branches, so write
    # replica batches to temp parquet parts and concatenate via glob
    batch = 200
    if K <= batch:
        parts = [select_fn(k) for k in range(K)]
        union = " UNION ALL ".join(parts)
        con.execute(f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    else:
        tmp = f"{out}/__{table}_parts"
        os.makedirs(tmp, exist_ok=True)
        for b0 in range(0, K, batch):
            parts = [select_fn(k) for k in range(b0, min(b0 + batch, K))]
            union = " UNION ALL ".join(parts)
            con.execute(
                f"COPY ({union}) TO '{tmp}/part{b0}.parquet' (FORMAT PARQUET)")
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{tmp}/part*.parquet')) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        for f in os.listdir(tmp):
            os.remove(f"{tmp}/{f}")
        os.rmdir(tmp)
    n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


# single-copy dims
for t in ["region", "nation"]:
    if want(t):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

D = f"'{src}/documents.parquet'"
copy("documents", lambda k:
    f"SELECT doc_id + {k}*1000000 AS doc_id, "
    f"translate(text, '{lower}{upper}', '{perm(k)}{perm(k).upper()}') AS text, "
    f"lang, source, n_chars FROM {D}")

E = f"'{src}/embeddings.parquet'"
def emb_select(k):
    if k == 0:
        return f"SELECT vec_id, embedding, label FROM {E}"
    sign = (f"(CASE WHEN ((d*1103515245 + {k}*12345) % 2147483647) % 2 = 0 "
            f"THEN 1 ELSE -1 END)")
    return (f"SELECT vec_id + {k}*1000000 AS vec_id, "
            f"[CAST(embedding[d] * {sign} AS FLOAT) "
            f"FOR d IN generate_series(1, len(embedding))] AS embedding, "
            f"label FROM {E}")
copy("embeddings", emb_select)

V = f"'{src}/events.parquet'"
copy("events", lambda k:
    f"SELECT event_id + {k}*100000000 AS event_id, ts, "
    f"user_id + {k}*10000000 AS user_id, event_type, value, props FROM {V}")

C = f"'{src}/customer.parquet'"
copy("customer", lambda k:
    f"SELECT c_custkey + {k}*1000000 AS c_custkey, c_name, c_nationkey, "
    f"c_acctbal, c_mktsegment FROM {C}")

S = f"'{src}/supplier.parquet'"
copy("supplier", lambda k:
    f"SELECT s_suppkey + {k}*1000000 AS s_suppkey, s_name, s_nationkey, s_acctbal FROM {S}")

P = f"'{src}/part.parquet'"
copy("part", lambda k:
    f"SELECT p_partkey + {k}*1000000 AS p_partkey, p_name, p_brand, p_type, "
    f"p_size, p_retailprice FROM {P}")

O = f"'{src}/orders.parquet'"
copy("orders", lambda k:
    f"SELECT o_orderkey + {k}*10000000 AS o_orderkey, "
    f"o_custkey + {k}*1000000 AS o_custkey, o_orderstatus, o_totalprice, "
    f"o_orderdate, o_orderpriority FROM {O}")

L = f"'{src}/lineitem.parquet'"
copy("lineitem", lambda k:
    f"SELECT l_orderkey + {k}*10000000 AS l_orderkey, "
    f"l_partkey + {k}*1000000 AS l_partkey, l_suppkey + {k}*1000000 AS l_suppkey, "
    f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    f"l_returnflag, l_linestatus, l_shipdate FROM {L}")

print("done ->", out)
