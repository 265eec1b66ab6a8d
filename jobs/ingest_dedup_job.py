"""CLI incremental ingest-dedup job: the daily-production loop around
``dedup.incremental_dedup_keep`` — each new batch is probed against the
ACCUMULATED corpus via its persisted fingerprint store, never by
re-shingling history:

    spark-submit --py-files engine.zip jobs/ingest_dedup_job.py \\
        --batch    /path/to/new_docs_ds \\
        --batch-id 2024-06-01 \\
        --output   /path/to/kept_corpus \\
        --store    /path/to/fingerprint_store \\
        [--threshold 0.5] [--no-within-batch]

Layout (everything partitioned by batch so every write is an
idempotent per-batch overwrite — re-running a failed batch redoes
exactly its own files and nothing else):

    output/batch=<id>/      kept documents (the corpus itself)
    store/bands/batch=<id>/ LSH band keys of the kept documents
    store/fp/batch=<id>/    md5 exact fingerprints of the kept documents
    store/done/batch=<id>/  one-row completion marker, written LAST

Resume contract (the manifest idea of operators/manifest.py at batch
granularity): the completion marker is written only after output and
both store relations are durable, so on restart a batch is either
absent (rerun: all three overwrites are deterministic and idempotent)
or marked done (skip, exit 0). Within a batch:

    1. optional within-batch near-dedup (``near_dedup_keep_docs`` —
       the corpus-wide pass at batch size; incremental_dedup_keep
       deliberately does not remove within-batch dups)
    2. probe vs history: exact md5 anti-join against store/fp plus LSH
       band collisions against store/bands verified by candidate-only
       Jaccard (history TEXT is read only for collision candidates —
       at steady state a vanishing fraction of the corpus)
    3. append kept rows to the corpus and their band keys /
       fingerprints to the store

At 100 TB the store relations are exactly what Iceberg's partitioned
append gives on the io.py seam; the history text reads in step 2 are
candidate-pruned point lookups, not a corpus scan.
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="incremental ingest-dedup job")
    p.add_argument("--batch", required=True, help="new documents table/path")
    p.add_argument("--batch-id", required=True,
                   help="unique id of this ingest batch (resume key)")
    p.add_argument("--output", required=True,
                   help="accumulated kept-corpus root")
    p.add_argument("--store", required=True,
                   help="fingerprint store root (bands/, fp/, done/)")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--num-hashes", type=int, default=8)
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--ngram", type=int, default=3)
    p.add_argument("--no-within-batch", action="store_true",
                   help="skip the within-batch near-dedup pass")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    return p


def _sub(root: str, *parts: str) -> str:
    return os.path.join(root, *parts)


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.appName("ingest-dedup-job").getOrCreate()

    from pdf_parser_spark.corpus import dedup as D
    from pdf_parser_spark.io import read_table, write_table

    bid = args.batch_id
    done_dir = _sub(args.store, "done", f"batch={bid}")
    if _exists(spark, done_dir):
        print(f"[ingest-dedup] batch {bid} already complete - skipping "
              "(resume contract)")
        return 0

    batch = read_table(spark, args.batch)
    n_in = batch.count()

    if not args.no_within_batch:
        batch = D.near_dedup_keep_docs(
            batch, n=args.ngram, threshold=args.threshold,
            num_hashes=args.num_hashes, bands=args.bands,
            id_col=args.id_col, text_col=args.text_col)
    n_within = batch.count()

    # exclude THIS batch's partitions from every history read: after a
    # crash between the data writes and the marker, the rerun must not
    # see the batch's own previous output as history (rows would dedup
    # against themselves and the batch would collapse to empty)
    not_self = F.col("batch") != bid
    have_history = _exists(spark, _sub(args.store, "fp"))
    if have_history:
        history = read_table(spark, args.output) \
            .where(not_self).drop("batch")
        history_fp = read_table(spark, _sub(args.store, "fp")) \
            .where(not_self).select("fp")
        history_bands = read_table(spark, _sub(args.store, "bands")) \
            .where(not_self).select(args.id_col, "band", "band_key")
        kept = D.incremental_dedup_keep(
            batch, history, n=args.ngram, threshold=args.threshold,
            num_hashes=args.num_hashes, bands=args.bands,
            id_col=args.id_col, text_col=args.text_col,
            history_bands=history_bands, history_fp=history_fp)
    else:
        kept = batch  # bootstrap: first batch IS the corpus
    # one computation feeds the three writes + both counts
    kept = kept.localCheckpoint()
    n_kept = kept.count()

    write_table(kept, _sub(args.output, f"batch={bid}"))
    write_table(
        D.band_keys(kept, num_hashes=args.num_hashes, bands=args.bands,
                    n=args.ngram, id_col=args.id_col,
                    text_col=args.text_col),
        _sub(args.store, "bands", f"batch={bid}"))
    write_table(
        kept.select(F.col(args.id_col),
                    F.md5(D.canonical_text(args.text_col)).alias("fp")),
        _sub(args.store, "fp", f"batch={bid}"))
    # marker LAST: durable only when everything above is
    write_table(
        spark.createDataFrame(
            [(bid, n_in, n_kept)],
            "batch_id string, n_in long, n_kept long"),
        done_dir)

    print(f"[ingest-dedup] batch {bid}: {n_in} in -> {n_within} after "
          f"within-batch -> {n_kept} kept "
          f"({n_in - n_kept} duplicates dropped)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
