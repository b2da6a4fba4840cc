"""Deterministic sampling: stability across runs/partitioning, stratum
fractions, split disjointness."""

from pyspark.sql import functions as F

from awesome_spark_search import corpus
from awesome_spark_search.sampling import (
    deterministic_sample,
    stratified_sample,
    train_test_split,
)


def test_split_deterministic_and_partition_invariant(spark):
    df = spark.createDataFrame(corpus.generate_pandas(400, seed=2))
    a = {r["doc_id"]: r["split"] for r in train_test_split(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in train_test_split(df.repartition(13)).collect()
    }
    assert a == b
    frac = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.04 < frac < 0.2  # ~0.1 with hash noise at n=400


def test_sample_is_subset_and_monotone(spark):
    df = spark.createDataFrame(corpus.generate_pandas(300, seed=3))
    s10 = {r["doc_id"] for r in deterministic_sample(df, 0.1).select("doc_id").collect()}
    s50 = {r["doc_id"] for r in deterministic_sample(df, 0.5).select("doc_id").collect()}
    assert s10 <= s50  # same hash, larger cut => superset
    assert 0 < len(s10) < len(s50) < 300


def test_stratified_respects_per_stratum_fraction(spark):
    df = spark.createDataFrame(corpus.generate_pandas(600, seed=4))
    out = stratified_sample(df, "lang", {"py": 1.0}, default_frac=0.0)
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"py"}
    n_py = df.filter(F.col("lang") == "py").count()
    assert out.count() == n_py  # frac 1.0 keeps the whole stratum
