"""Geometry-preserving vector TRANSFORMS — not retrieval operators.

This module holds transforms that reshape an embedding table's geometry
(dimensionality, basis) without claiming retrieval accuracy. They were
deliberately moved OUT of `corpus.similarity` so a user cannot mistake
them for a working ANN path: on this repo's synthetic embeddings the JL
projection's top-10 recall measured 0.125–0.295 at 64→16/32/48 dims
(BASELINE.md, ANN table — the fixture's top-10 cosine gaps sit far
below JL's √(2/k) distortion), while SQ8 reaches 0.93 at the same 4×
compression. Use `similarity.sq8_*` / `similarity.pq_*` for retrieval
compression; use these transforms when you need a cheaper FLOAT
geometry for downstream *statistics* (clustering warm-starts, sketch
pre-hashing, visualization), where unbiased expected inner products
matter more than neighbor-rank fidelity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jl_project(df: DataFrame, in_dims: int = 64, out_dims: int = 16,
               id_col: str = "vec_id", vec_col: str = "embedding",
               salt: str = "jl") -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress embeddings to
    ``out_dims`` with a deterministic ±1 sign matrix scaled 1/√k
    (Achlioptas 2003 — the database-friendly JL variant: no Gaussian
    sampling, just signs), preserving pairwise distances within
    ~O(√(log n / k)) IN EXPECTATION.

    WARNING — not an ANN component. At the compression ratios that make
    JL worth running (k ≪ d) its distortion √(2/k) exceeds the top-k
    score gaps of realistic embedding tables, and measured top-10
    recall on this repo's fixtures is 0.125–0.295 (BASELINE.md). For
    retrieval use `similarity.sq8_topk` / `similarity.pq_adc_topk`;
    keep this for norm/inner-product *estimates* where bias, not rank,
    is the contract (E[⟨Px, Py⟩] = ⟨x, y⟩).

    The sign matrix derives from md5 of ``salt:d:j`` at PLAN BUILD time
    (the kmeans literal-codebook pattern): out_dims zip_with/aggregate
    folds over in_dims literal signs — pure codegen, no UDF, no
    shuffle, and the identical literals embed in the SQL twin so the
    projection value-hashes cross-engine (6dp). Vectors with the wrong
    width are excluded (the PQ width contract)."""
    import hashlib
    import math

    signs = [[1 if int(hashlib.md5(
        f"{salt}:{d}:{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
        for d in range(in_dims)] for j in range(out_dims)]
    scale = 1.0 / math.sqrt(out_dims)
    dims_exprs = []
    for j in range(out_dims):
        s_lit = ", ".join(f"{s}D" for s in signs[j])
        dims_exprs.append(
            f"round(aggregate(zip_with({vec_col}, array({s_lit}), "
            f"(v, s) -> v * s), 0D, (a, x) -> a + x) * {scale!r}D, 6)")
    return (df.filter(F.col(vec_col).isNotNull()
                      & (F.size(F.col(vec_col)) == in_dims))
            .select(F.col(id_col),
                    F.expr("array(" + ", ".join(dims_exprs) + ")")
                    .alias("projected")))


def jl_signs_sql(in_dims: int = 64, out_dims: int = 16,
                 salt: str = "jl") -> list:
    """The identical sign matrix as SQL list literals (kept beside
    `jl_project` so the twin cannot drift)."""
    import hashlib

    return [
        "[" + ", ".join(
            "1.0" if int(hashlib.md5(
                f"{salt}:{d}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else "-1.0" for d in range(in_dims)) + "]"
        for j in range(out_dims)]
