"""CLI retrieval-index job: the spark-submit deployment surface for the
chunk → embed → quantize indexing pipeline (the batch side of a RAG /
semantic-search system; querying is `similarity.sq8_topk` /
`ivf_topk` over the tables this writes):

    spark-submit --py-files engine.zip jobs/index_job.py \\
        --input  /path/to/documents_ds \\
        --output /path/to/index_root \\
        [--size 128] [--overlap 32] [--dims 64] \\
        [--cells 16] [--refine-iters 2] \\
        [--embeddings /path/to/precomputed_embeddings_ds]

Build stages, each through the pluggable table IO:
  <output>/chunks     (chunk_id, doc_id, chunk_idx, tok_start, chunk_text)
  <output>/embeddings (chunk_id, embedding)     [hashed-BoW featurizer,
                                                 or --embeddings passthrough]
  <output>/codes      (chunk_id, codes)         [SQ8: 1 byte/dim]
  <output>/cells      (chunk_id, centroid_id)   [IVF assignment under the
                                                 Lloyd-refined codebook]

The featurizer is the deterministic stand-in behind the neural-encoder
contract (`textstats.hashed_bow_embeddings`); pass ``--embeddings`` with
a (doc_id, embedding) table to index real vectors at document grain
instead. Prints one summary line with the stage counts.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="retrieval index build job")
    p.add_argument("--input", required=True, help="documents table/path")
    p.add_argument("--output", required=True, help="index root directory")
    p.add_argument("--size", type=int, default=128,
                   help="chunk window tokens")
    p.add_argument("--overlap", type=int, default=32)
    p.add_argument("--dims", type=int, default=64,
                   help="hashed-BoW embedding dims")
    p.add_argument("--cells", type=int, default=16, help="IVF centroids")
    p.add_argument("--refine-iters", type=int, default=2,
                   help="distributed Lloyd iterations over the corpus")
    p.add_argument("--embeddings", default=None,
                   help="precomputed (doc_id, embedding) table: skip "
                        "chunk+featurize and index these vectors")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.appName("index-job").getOrCreate()

    from pdf_parser_spark.corpus import similarity as S
    from pdf_parser_spark.corpus import textstats as TS
    from pdf_parser_spark.corpus.packing import chunk_documents
    from pdf_parser_spark.io import read_table, write_table

    root = args.output.rstrip("/")
    if args.embeddings:
        emb = read_table(spark, args.embeddings).select(
            F.col(args.id_col).alias("chunk_id"), "embedding")
        n_chunks = 0
    else:
        docs = read_table(spark, args.input)
        chunks = chunk_documents(
            docs, size=args.size, overlap=args.overlap,
            text_col=args.text_col, id_col=args.id_col).select(
            (F.col(args.id_col) * 100000 + F.col("chunk_idx"))
            .alias("chunk_id"),
            args.id_col, "chunk_idx", "tok_start", "chunk_text")
        write_table(chunks, f"{root}/chunks")
        chunks = read_table(spark, f"{root}/chunks")
        n_chunks = chunks.count()
        # the chunk_id scheme packs chunk_idx into the low decimal
        # digits; it is injective only for non-negative doc ids and
        # < 100000 chunks per doc (~9.6M tokens at the defaults) —
        # fail loudly instead of silently aliasing into a neighbor's
        # key range
        bad = chunks.filter((F.col("chunk_idx") >= 100000)
                            | (F.col(args.id_col) < 0)).count()
        if bad:
            raise SystemExit(
                f"index-job: {bad} chunks overflow the "
                f"doc_id*100000+chunk_idx key scheme (doc_id < 0 or "
                f">=100000 chunks in one doc); re-chunk with a larger "
                f"--size or remap ids first")
        emb = TS.hashed_bow_embeddings(
            chunks, dims=args.dims, id_col="chunk_id",
            text_col="chunk_text")
    # embeddings materialize ONCE; codes/cells/refine all read the
    # stored table instead of re-deriving the featurizer subtree
    # (the near_dedup scratch-materialization rule).
    write_table(emb, f"{root}/embeddings")
    emb = read_table(spark, f"{root}/embeddings")
    n_emb = emb.count()
    # codes/cells index only the VALID vectors: with_norm drops
    # null/empty/zero-norm embeddings (failed embedding jobs commonly
    # emit them), so the consistency check is against that count, and
    # the skipped rows are reported rather than crashing post-hoc
    n_valid = S.with_norm(emb).count()

    codes = S.sq8_encode(emb, id_col="chunk_id")
    write_table(codes, f"{root}/codes")

    cb = S.kmeans_codebook(emb, n_centroids=args.cells, id_col="chunk_id")
    if args.refine_iters > 0:
        cb, _counts = S.kmeans_refine(emb, cb, iters=args.refine_iters,
                                      id_col="chunk_id")
    cells = S.ivf_assign(emb, n_centroids=args.cells, id_col="chunk_id",
                         codebook=cb)
    write_table(cells, f"{root}/cells")
    n_cells = read_table(spark, f"{root}/cells").count()
    n_codes = read_table(spark, f"{root}/codes").count()
    assert n_codes == n_valid and n_cells == n_valid, \
        (n_codes, n_cells, n_valid)

    print(f"index-job done: chunks={n_chunks} embeddings={n_emb} "
          f"valid={n_valid} skipped_degenerate={n_emb - n_valid} "
          f"sq8_codes={n_codes} ivf_cells={n_cells} cells_k={args.cells}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
