"""Per-partition checkpoint manifests + exact resume + lineage metrics.

North-rule requirement (BASELINE.json:north_rule): outputs written with
per-partition checkpoint manifests enabling exact resume, plus lineage and
throughput metrics per partition. The reference has no analog (it is a
single-process batch tool whose only batch metadata is the dict at
/root/reference/pdf_layout_tester.py:253-258); this is the distributed
generalization of "degrade, don't abort" (D1) to whole-job granularity.

Protocol:

* conversations are deterministically bucketed: ``bucket =
  pmod(xxhash64(conv_id), n_buckets)`` — stable across runs and engines,
  and conversation-aligned so a conversation is never split across
  manifest units (exact resume can then guarantee no duplicate / missing
  *turns*).
* each bucket's output is written to ``out_dir/bucket=<k>/`` and committed
  by atomically renaming a manifest JSON into ``manifest_dir`` (write tmp
  + os.replace — the same commit idiom as Iceberg's atomic metadata swap,
  scoped down to a local-FS sandbox; the IO layer is pluggable).
* the manifest row carries lineage + throughput:
  ``{bucket, status, rows_in, rows_out, error_rows, wall_ms,
  turns_per_sec, input_path}``.
* resume = set-difference of pending buckets against committed manifests
  (the anti-join of SURVEY.md section 4.2), then re-run only those. A
  bucket with data files but no manifest is re-run from scratch
  (overwrite), which is what makes the resume *exact*.

At cluster scale the same protocol runs with Iceberg table appends per
bucket group; buckets stay O(thousands) so the manifest table is tiny.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark.operators.extract import extract_layouts


def bucket_expr(n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


def committed_buckets(manifest_dir: str) -> dict:
    """bucket -> manifest dict for every committed bucket."""
    out = {}
    if not os.path.isdir(manifest_dir):
        return out
    for name in os.listdir(manifest_dir):
        if name.startswith("bucket-") and name.endswith(".json"):
            with open(os.path.join(manifest_dir, name), encoding="utf-8") as f:
                m = json.load(f)
            out[m["bucket"]] = m
    return out


def _commit_manifest(manifest_dir: str, manifest: dict) -> None:
    os.makedirs(manifest_dir, exist_ok=True)
    path = os.path.join(manifest_dir, f"bucket-{manifest['bucket']:05d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    os.replace(tmp, path)  # atomic commit


def run_with_manifest(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    variant: str = "a003",
    fail_after: int | None = None,
    input_path: str = "",
) -> dict:
    """Extract layouts bucket-by-bucket with checkpoint manifests.

    Returns ``{"processed": [...], "skipped": [...], "manifests": {...}}``.
    ``fail_after=k`` aborts after k bucket commits (test hook for the
    kill/resume test). Re-invoking resumes exactly: committed buckets are
    skipped, uncommitted ones are (re)computed and overwritten.
    """
    manifest_dir = os.path.join(out_dir, "_manifests")
    done = committed_buckets(manifest_dir)
    src = transcripts.withColumn("bucket", bucket_expr(n_buckets))

    processed, skipped = [], []
    for k in range(n_buckets):
        if k in done:
            skipped.append(k)
            continue
        t0 = time.monotonic()
        part = src.filter(F.col("bucket") == k).drop("bucket")
        layouts = extract_layouts(part, variant=variant)
        bucket_dir = os.path.join(out_dir, f"bucket={k}")
        if os.path.isdir(bucket_dir):  # uncommitted partial output: redo
            shutil.rmtree(bucket_dir)
        layouts.write.mode("overwrite").parquet(bucket_dir)

        out_df = spark.read.parquet(bucket_dir)
        rows_out = out_df.count()
        error_rows = out_df.filter(
            F.map_contains_key(F.col("metadata"), "error")).count()
        wall_ms = int((time.monotonic() - t0) * 1000)
        manifest = {
            "bucket": k,
            "status": "committed",
            "rows_in": rows_out,  # extraction is 1:1 row-preserving
            "rows_out": rows_out,
            "error_rows": error_rows,
            "wall_ms": wall_ms,
            "turns_per_sec": round(rows_out / max(wall_ms / 1000.0, 1e-9), 2),
            "input_path": input_path,
            "n_buckets": n_buckets,
            "variant": variant,
        }
        _commit_manifest(manifest_dir, manifest)
        processed.append(k)
        if fail_after is not None and len(processed) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} buckets")
    return {
        "processed": processed,
        "skipped": skipped,
        "manifests": committed_buckets(manifest_dir),
    }


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read every committed bucket's layouts as one DataFrame."""
    done = committed_buckets(os.path.join(out_dir, "_manifests"))
    paths = [os.path.join(out_dir, f"bucket={k}") for k in sorted(done)]
    return spark.read.parquet(*paths)


def lineage_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """The per-partition lineage/throughput manifest as a DataFrame."""
    rows = list(committed_buckets(os.path.join(out_dir, "_manifests")).values())
    return spark.createDataFrame(
        rows,
        schema=(
            "bucket int, status string, rows_in long, rows_out long, "
            "error_rows long, wall_ms long, turns_per_sec double, "
            "input_path string, n_buckets int, variant string"
        ),
    )
