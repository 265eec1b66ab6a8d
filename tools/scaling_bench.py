"""Scaling-efficiency evidence for the north rule: the same extraction job
at two parallelism levels (local[N] and local[4N] — the sandbox stand-in
for N vs 4N executors), reporting throughput at both plus efficiency
 = (T_N / T_4N) / 4  (equivalently throughput_4N / (4 * throughput_N)).

Writes one JSON line per level plus a summary; results are recorded in
BASELINE.md. Usage:

    python tools/scaling_bench.py [sf_dir] [N] [inflate] [repeats]

``N`` runs just that one pair (N -> 4N); ``inflate`` unions k scans of the
input to amortize fixed per-job overhead (default 4 — use 1 at sf1 where
the input is already an order of magnitude larger); ``repeats`` best-of.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.generator import sf_from_dir, transcripts_path  # noqa: E402
from pdf_parser_spark.operators.extract import extract_layouts  # noqa: E402
from pdf_parser_spark.session import ensure_min_partitions, get_spark  # noqa: E402


def run_level(tpath: str, cpus: int, repeats: int = 4, inflate: int = 4) -> dict:
    spark = get_spark(f"scaling-bench-{cpus}", cpus=str(cpus))
    src = spark.read.parquet(tpath)
    # Inflate the workload by unioning k scans so per-job fixed overhead
    # (scheduling, worker spin-up, scan setup — a few seconds) is amortized
    # and the measurement reflects steady-state throughput, as it would on
    # a long-running cluster job over much more data.
    base = src
    for _ in range(inflate - 1):
        src = src.union(base)
    src = ensure_min_partitions(src, cpus * 2)
    n = src.count()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.monotonic()
        extract_layouts(src).count()
        best = min(best, time.monotonic() - t0)
    spark.stop()
    return {"cpus": cpus, "n_turns": n, "sec": round(best, 2),
            "turns_per_sec": round(n / best, 1)}


def pair(tpath: str, sf_dir: str, n_small: int, inflate: int = 4,
         repeats: int = 4) -> dict:
    small = run_level(tpath, n_small, repeats=repeats, inflate=inflate)
    print(json.dumps(small))
    time.sleep(15)  # let the previous JVM + python workers fully drain
    big = run_level(tpath, n_small * 4, repeats=repeats, inflate=inflate)
    print(json.dumps(big))
    eff = (big["turns_per_sec"] / small["turns_per_sec"]) / 4.0
    out = {
        "sf_dir": sf_dir,
        "N": n_small,
        "throughput_N": small["turns_per_sec"],
        "throughput_4N": big["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "gate": ">= 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(out))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tpath = transcripts_path(sf_from_dir(sf_dir))
    n_only = int(sys.argv[2]) if len(sys.argv) > 2 else None
    inflate = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    if n_only is not None:
        pair(tpath, sf_dir, n_only, inflate=inflate, repeats=repeats)
        return

    # Primary gate pair: 2 -> 8 cores. Both levels leave the JVM side of
    # the Arrow boundary un-starved (task threads + python workers < 32
    # physical cores), which matches a real cluster where executors do not
    # share cores with each other.
    pair(tpath, sf_dir, 2, inflate=inflate, repeats=repeats)
    # Secondary pair: 8 -> 32. local[32] oversubscribes the box (32 JVM
    # task threads + 32 python workers on 32 cores) and all-core turbo
    # drops the clock ~1.2x, so this pair under-reads true distributed
    # scaling; reported for transparency.
    time.sleep(15)
    pair(tpath, sf_dir, 8, inflate=inflate, repeats=repeats)


if __name__ == "__main__":
    main()
