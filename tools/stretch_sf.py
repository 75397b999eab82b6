"""Synthetic sf1 stretch: 10x the sf0.1 testdata, for the scaling-curve
decade measurement (timing only — correctness oracles run at the driver
SFs; /root/testdata is read-only so the stretch lands in-repo and is
gitignored).

Stretch rules keep the WORKLOAD SHAPE natural at 10x, the property the
growth-exponent claim needs:

- TPC-H tables: 10 key-shifted copies (customer/supplier/part/orders/
  lineitem keys offset per copy, foreign keys follow), so every copy
  joins only to its own copy — join fan-outs identical to a real larger
  SF.  region/nation stay fixed (as in TPC-H).
- events: 10 copies with user_id/event_id shifted — 10x users over the
  same time range (per-user op counts unchanged, the shape kv/session
  folds care about).
- documents: 50k NEW texts sampled from the sf0.1 empirical unigram and
  length distributions (seeded) — key-shifted copies would make every
  doc a 10-way exact duplicate and quadratically distort pair-generating
  workloads (tfidf/minhash); fresh sampled text keeps near-dup structure
  sparse like a real corpus.
- embeddings: 10 copies, one coordinate deterministically perturbed per
  copy so vectors are distinct (ANN bucket occupancy grows 10x instead
  of stacking exact ties).

Usage: python tools/stretch_sf.py [out_dir]   (default .sf1_stretch/)
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10


def stretch_tpch(con: duckdb.DuckDBPyConnection, out: str) -> None:
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet'"
        )
    pieces = {
        "customer": "SELECT c_custkey + {o}*100000 AS c_custkey, c_name,"
        " c_nationkey, c_acctbal, c_mktsegment FROM src",
        "supplier": "SELECT s_suppkey + {o}*10000 AS s_suppkey, s_name,"
        " s_nationkey, s_acctbal FROM src",
        "part": "SELECT p_partkey + {o}*100000 AS p_partkey, p_name, p_brand,"
        " p_type, p_size, p_retailprice FROM src",
        "orders": "SELECT o_orderkey + {o}*1000000 AS o_orderkey,"
        " o_custkey + {o}*100000 AS o_custkey, o_orderstatus, o_totalprice,"
        " o_orderdate, o_orderpriority FROM src",
        "lineitem": "SELECT l_orderkey + {o}*1000000 AS l_orderkey,"
        " l_partkey + {o}*100000 AS l_partkey, l_suppkey + {o}*10000 AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate FROM src",
        "events": "SELECT event_id + {o}*100000 AS event_id, ts,"
        " user_id + {o}*1500 AS user_id, event_type, value, props FROM src",
    }
    for t, tmpl in pieces.items():
        cols = [d[0] for d in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        # guard: the templates must cover the real schema
        sel0 = tmpl.format(o=0)
        got = [d[0] for d in con.execute(
            f"DESCRIBE WITH src AS (SELECT * FROM '{SRC}/{t}.parquet') {sel0}"
        ).fetchall()]
        assert got == cols, f"{t}: template columns {got} != schema {cols}"
        union = "\nUNION ALL\n".join(tmpl.format(o=o) for o in range(COPIES))
        con.execute(
            f"COPY (WITH src AS (SELECT * FROM '{SRC}/{t}.parquet') {union})"
            f" TO '{out}/{t}.parquet'"
        )


def stretch_embeddings(con: duckdb.DuckDBPyConnection, out: str) -> None:
    n = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    union = "\nUNION ALL\n".join(
        f"SELECT vec_id + {o}*{n} AS vec_id,"
        f" CAST(list_transform(embedding, x -> x + {o} * 0.0005) AS FLOAT[])"
        f" AS embedding, label FROM src"
        for o in range(COPIES)
    )
    con.execute(
        f"COPY (WITH src AS (SELECT * FROM '{SRC}/embeddings.parquet') {union})"
        f" TO '{out}/embeddings.parquet'"
    )


def stretch_documents(con: duckdb.DuckDBPyConnection, out: str) -> None:
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet'"
    ).fetchall()
    rng = random.Random(65840)
    vocab: list[str] = []
    lengths: list[int] = []
    meta: list[tuple[str, str]] = []
    for _id, text, lang, source in rows:
        toks = text.split(" ")
        vocab.extend(toks)
        lengths.append(len(toks))
        meta.append((lang, source))
    out_rows = []
    for i in range(COPIES * len(rows)):
        n_tok = lengths[rng.randrange(len(lengths))]
        text = " ".join(vocab[rng.randrange(len(vocab))] for _ in range(n_tok))
        lang, source = meta[rng.randrange(len(meta))]
        out_rows.append((i, text, lang, source, len(text)))
    con.execute("CREATE OR REPLACE TABLE _docs (doc_id BIGINT, text VARCHAR,"
                " lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO _docs VALUES (?, ?, ?, ?, ?)", out_rows)
    con.execute(f"COPY _docs TO '{out}/documents.parquet'")
    con.execute("DROP TABLE _docs")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1_stretch"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    stretch_tpch(con, out)
    stretch_embeddings(con, out)
    stretch_documents(con, out)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)
    print("sf1 stretch written to", out)


if __name__ == "__main__":
    main()
