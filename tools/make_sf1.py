"""Regenerate the gitignored sf1 replica tables under data/sf1/.

data/ is gitignored, so the sf1 order-of-magnitude evidence in
BASELINE.md must be reproducible from this script plus the driver's
/root/testdata/sf0.1 parquet. Native sf1 transcripts come from the
deterministic generator (pdf_parser_spark.generator.transcripts_path(1));
every other table is a 10x OFFSET REPLICA of its sf0.1 twin:

- ids offset per replica so keys stay unique AND joins stay aligned
  across tables (o_orderkey/l_orderkey share the +10M/rep offset,
  o_custkey/c_custkey share +100k/rep)
- timestamps shifted +97 days per replica so funnels/cohorts/anomaly
  windows see fresh calendar spans instead of 10 stacked copies of the
  same month
- text/vector content is unchanged -> content distributions are
  preserved, but exact-dup and near-dup rates are inflated 10x by
  construction (noted in BASELINE.md wherever it matters:
  dedup_simhash, semdedup, dedup_incremental pair counts)

Usage: python tools/make_sf1.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPS = 10
DAY_SHIFT = 97

# table -> (id offsets {col: per-rep offset}, timestamp cols to shift)
SCHEMES = {
    "documents": ({"doc_id": 1_000_000}, []),
    "embeddings": ({"vec_id": 1_000_000}, []),
    "events": ({"event_id": 1_000_000, "user_id": 10_000}, ["ts"]),
    "orders": ({"o_orderkey": 10_000_000, "o_custkey": 100_000},
               ["o_orderdate"]),
    "lineitem": ({"l_orderkey": 10_000_000}, ["l_shipdate"]),
    "customer": ({"c_custkey": 100_000}, []),
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/data/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, (offsets, ts_cols) in SCHEMES.items():
        src_path = os.path.join(src, f"{table}.parquet")
        if not os.path.exists(src_path):
            print(f"skip {table}: no {src_path}")
            continue
        cols = [r[0] for r in
                con.sql(f"DESCRIBE SELECT * FROM '{src_path}'").fetchall()]
        exprs = []
        for c in cols:
            if c in offsets:
                exprs.append(f"{c} + r.rep * {offsets[c]} AS {c}")
            elif c in ts_cols:
                exprs.append(
                    f"{c} + r.rep * INTERVAL {DAY_SHIFT} DAY AS {c}")
            else:
                exprs.append(c)
        dst = os.path.join(out, f"{table}.parquet")
        con.sql(f"""
            COPY (
              SELECT {', '.join(exprs)}
              FROM '{src_path}'
              CROSS JOIN (SELECT unnest(range({REPS})) AS rep) r
              ORDER BY r.rep
            ) TO '{dst}' (FORMAT PARQUET)
        """)
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"wrote {dst}: {n} rows")

    # Small dimensions copy verbatim: region/nation are fixed-size by
    # definition; supplier keeps its original key range because the
    # replicated lineitem only offsets l_orderkey, so l_suppkey joins
    # stay aligned against the original supplier rows.
    for table in ("region", "nation", "supplier", "part"):
        src_path = os.path.join(src, f"{table}.parquet")
        if not os.path.exists(src_path):
            continue
        dst = os.path.join(out, f"{table}.parquet")
        con.sql(f"COPY (SELECT * FROM '{src_path}') TO '{dst}' "
                "(FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"wrote {dst}: {n} rows (verbatim dim)")

    # Non-replica documents variant: the plain 10x replica keeps text
    # byte-identical across reps, which inflates exact/near-dup PAIR
    # counts quadratically (10 identical copies = 45 pairs each) — an
    # artifact of the fixture, not a property of 10x data. For honest
    # dedup scaling numbers, salt each replica's token SET: tokens whose
    # md5 bucket falls below the rep index get a rep-specific suffix, so
    # rep r differs from the original in ~r*10% of distinct tokens
    # (SimHash/MinHash see genuinely distinct documents while length and
    # vocabulary shape are preserved). rep 0 stays verbatim.
    src_docs = os.path.join(src, "documents.parquet")
    if os.path.exists(src_docs):
        dst = os.path.join(out, "documents_nonrep.parquet")
        con.sql(f"""
            COPY (
              SELECT doc_id + r.rep * 1000000 AS doc_id,
                     CASE WHEN r.rep = 0 OR text IS NULL THEN text ELSE
                       array_to_string(
                         [CASE WHEN (('0x' || substr(md5(t), 1, 8))::UBIGINT
                                     % 10) < r.rep
                               THEN t || '_r' || r.rep ELSE t END
                          FOR t IN string_split(text, ' ')], ' ')
                     END AS text,
                     * EXCLUDE (doc_id, text)
              FROM '{src_docs}'
              CROSS JOIN (SELECT unnest(range({REPS})) AS rep) r
              ORDER BY r.rep
            ) TO '{dst}' (FORMAT PARQUET)
        """)
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"wrote {dst}: {n} rows (token-salted non-replica)")

    # Non-replica embeddings variant: identical replica vectors give
    # every SemDeDup cell 10 exact copies of each member (quadratic
    # within-cell pairs, 23x wall at sf1 — a fixture artifact). Rotate
    # each replica's dimensions by rep*7 positions: norms and the value
    # distribution are preserved exactly, but cosine between a vector
    # and its rotation is ~a random-pair cosine, so near-dup density is
    # natural. rep 0 stays verbatim.
    src_emb = os.path.join(src, "embeddings.parquet")
    if os.path.exists(src_emb):
        dst = os.path.join(out, "embeddings_nonrep.parquet")
        con.sql(f"""
            COPY (
              SELECT vec_id + r.rep * 1000000 AS vec_id,
                     CASE WHEN r.rep = 0 OR embedding IS NULL
                          THEN embedding
                          ELSE list_concat(
                              embedding[(r.rep * 7) % len(embedding) + 1 :],
                              embedding[: (r.rep * 7) % len(embedding)])
                     END AS embedding,
                     * EXCLUDE (vec_id, embedding)
              FROM '{src_emb}'
              CROSS JOIN (SELECT unnest(range({REPS})) AS rep) r
              ORDER BY r.rep
            ) TO '{dst}' (FORMAT PARQUET)
        """)
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"wrote {dst}: {n} rows (dim-rotated non-replica)")


if __name__ == "__main__":
    main()
