"""Bloom-pruned join: exactness vs the plain join, false-negative
freedom, real pruning on the fact side, and the build-size guard."""

import pytest

from pyspark.sql import functions as F

from pdf_parser_spark.plans import bloomjoin as BJ


@pytest.fixture(scope="module")
def fact(spark):
    # 500 fact rows over keys 0..99; dim selects keys 0..9 only.
    return spark.range(500).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v"))


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(10).select(
        F.col("id").alias("dk"), (F.col("id") * 7).alias("w"))


def test_bloom_join_exactly_matches_plain_join(fact, dim):
    got = (BJ.bloom_prune_join(fact, dim, "k", "dk")
           .select("k", "v", "dk", "w"))
    want = (fact.join(dim, fact["k"] == dim["dk"])
            .select("k", "v", "dk", "w"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_probe_has_no_false_negatives(fact, dim):
    bitmap = BJ.bloom_bitmap(dim, "dk")
    pruned = BJ.bloom_prune(fact, bitmap, "k")
    surviving = {r.k for r in pruned.select("k").distinct().collect()}
    assert set(range(10)) <= surviving  # every true match key survives


def test_probe_actually_prunes(fact, dim):
    # 10 of 100 keys match; with 2^20 bits and 5 hashes the false-positive
    # rate is ~0, so the pruned fact should be ~10% of the original.
    bitmap = BJ.bloom_bitmap(dim, "dk")
    n = BJ.bloom_prune(fact, bitmap, "k").count()
    assert n == 50  # exactly the matching rows at this density


def test_probe_keeps_original_schema(fact, dim):
    bitmap = BJ.bloom_bitmap(dim, "dk")
    pruned = BJ.bloom_prune(fact, bitmap, "k")
    assert pruned.schema == fact.schema  # hash cols never leak out


def test_build_size_guard(spark, fact):
    big_dim = spark.range(100).select(F.col("id").alias("dk"))
    with pytest.raises(ValueError, match="max_build_rows"):
        BJ.bloom_bitmap(big_dim, "dk", max_build_rows=50)


def test_prune_is_below_the_join_shuffle(fact, dim):
    # The probe must be a narrow MapInPandas on the fact scan side,
    # upstream of the join — that is the whole point (shuffle fewer
    # bytes). The textual plan lists the probe before any join node on
    # the fact branch; assert MapInPandas is present and the joined plan
    # still resolves to an equi-join.
    joined = BJ.bloom_prune_join(fact, dim, "k", "dk")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Join" in plan or "BroadcastHashJoin" in plan
