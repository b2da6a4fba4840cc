"""Similarity search: brute-force exactness, IVF pruning, on-disk IVF layout
with real partition pruning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from awesome_spark_search.similarity import (
    brute_force_topk,
    ivf_topk,
    read_ivf_topk,
    write_ivf_index,
)

N, DIM, NCENT = 400, 16, 8


@pytest.fixture(scope="module")
def emb_pdf():
    import pandas as pd

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(N, DIM)).astype(np.float32)
    return pd.DataFrame(
        {"vec_id": np.arange(N, dtype=np.int64), "embedding": list(map(list, vecs))}
    )


@pytest.fixture(scope="module")
def emb(spark, emb_pdf):
    return spark.createDataFrame(emb_pdf)


@pytest.fixture(scope="module")
def centroids(emb_pdf):
    return [list(map(float, emb_pdf["embedding"][i])) for i in range(NCENT)]


def _np_topk(emb_pdf, q, k):
    m = np.array(emb_pdf["embedding"].tolist(), dtype=np.float64)
    qv = np.asarray(q, dtype=np.float64)
    cos = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
    order = np.lexsort((emb_pdf["vec_id"].to_numpy(), -cos))
    return [int(emb_pdf["vec_id"][i]) for i in order[:k]]


def _np_kmeans(emb_pdf, k, iterations):
    """Independent numpy reimplementation of similarity.kmeans_fit's
    contract (init = k lowest ids quantized, cosine assignment with
    lowest-id tie-break, mean update re-quantized to the 1e-6 grid)."""
    import math

    def q6(v):
        return np.array([math.floor(float(x) * 1e6 + 0.5) / 1e6 for x in v])

    m = np.array(emb_pdf["embedding"].tolist(), dtype=np.float64)
    cents = np.stack([q6(m[i]) for i in range(k)])

    def assign(c):
        sims = (m @ c.T) / (
            np.linalg.norm(m, axis=1)[:, None] * np.linalg.norm(c, axis=1)[None, :]
        )
        return sims.argmax(axis=1)  # argmax takes the FIRST max = lowest id

    for _ in range(iterations):
        a = assign(cents)
        for c in range(k):
            if (a == c).any():
                cents[c] = q6(m[a == c].mean(axis=0))
    return cents, assign(cents)


def test_kmeans_matches_numpy_reference(spark, emb, emb_pdf):
    """kmeans_fit (Spark posexplode/groupBy Lloyd loop) must reproduce the
    numpy reference bit-for-bit: quantizing centroids to the 1e-6 grid after
    every update makes the iteration engine-independent."""
    from awesome_spark_search.similarity import kmeans_fit

    cents, asg = kmeans_fit(spark, emb, k=NCENT, iterations=3)
    want_c, want_a = _np_kmeans(emb_pdf, NCENT, 3)
    got_c = np.array(cents)
    assert got_c.shape == want_c.shape
    assert np.abs(got_c - want_c).max() == 0.0
    got_a = {r["vec_id"]: r["cluster"] for r in asg.collect()}
    assert got_a == {int(i): int(want_a[i]) for i in range(len(want_a))}
    # determinism: a second fit is identical
    cents2, _ = kmeans_fit(spark, emb, k=NCENT, iterations=3)
    assert cents == cents2


def test_ivf_recall_on_trained_centroids(spark, emb, emb_pdf):
    """The full ANN pipeline on TRAINED centroids (not caller-supplied):
    recall@10 of ivf_topk vs the exact brute force must clear the gate, and
    the scan must actually prune (probed clusters hold < the full corpus)."""
    from awesome_spark_search.similarity import assign_ivf_clusters, kmeans_fit

    cents, _ = kmeans_fit(spark, emb, k=NCENT, iterations=3)
    sizes = {
        r["cluster"]: r["n"]
        for r in assign_ivf_clusters(emb, cents)
        .groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    assert sum(sizes.values()) == N
    recalls = []
    for qi in (3, 57, 201):
        q = list(map(float, emb_pdf["embedding"][qi]))
        exact = set(_np_topk(emb_pdf, q, 10))
        got = {
            r["vec_id"]
            for r in ivf_topk(emb, cents, q, k=10, nprobe=3).collect()
        }
        recalls.append(len(got & exact) / 10)
        # pruning is real: 3 of 8 trained clusters never hold everything
        probed = sorted(sizes.values(), reverse=True)[:3]
        assert sum(probed) < N
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_brute_force_matches_numpy(emb, emb_pdf):
    q = list(map(float, emb_pdf["embedding"][3]))
    got = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    assert got == _np_topk(emb_pdf, q, 10)


def test_ivf_recall_contains_query_vector(emb, emb_pdf, centroids):
    q = list(map(float, emb_pdf["embedding"][5]))
    got = [r["vec_id"] for r in ivf_topk(emb, centroids, q, k=5, nprobe=2).collect()]
    assert got[0] == 5  # the vector itself lives in its own nearest cluster


def test_ivf_disk_layout_prunes_partitions(spark, emb, emb_pdf, centroids, tmp_path):
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, centroids, path)
    q = list(map(float, emb_pdf["embedding"][2]))
    out = read_ivf_topk(spark, path, centroids, q, k=5, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), plan[:2000]
    rows = out.collect()
    assert rows[0]["vec_id"] == 2
    # identical to the in-memory IVF path
    want = [r["vec_id"] for r in ivf_topk(emb, centroids, q, k=5, nprobe=2).collect()]
    assert [r["vec_id"] for r in rows] == want


def test_int8_quantized_topk_recall_and_schema(spark, emb):
    """int8 quantization: top-10 overlaps heavily with the exact scan (the
    score error of symmetric per-vector int8 is ~1e-2 on random vectors) and
    the scales genuinely cancel (scores within quantization error)."""
    from awesome_spark_search.similarity import (
        brute_force_topk,
        quantize_embeddings,
        quantized_topk,
        quantize_query,
    )

    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    exact = brute_force_topk(emb, qvec, k=10).collect()
    eq = quantize_embeddings(emb)
    got = quantized_topk(eq, qvec, k=10).collect()
    assert len(got) == 10
    overlap = {r["vec_id"] for r in got} & {r["vec_id"] for r in exact}
    assert len(overlap) >= 7, overlap
    # the query matches itself at cosine ~1 in both
    assert got[0]["vec_id"] == exact[0]["vec_id"] == 0
    assert abs(got[0]["cosine"] - 1.0) < 1e-9
    ex = {r["vec_id"]: r["cosine"] for r in exact}
    for r in got:
        if r["vec_id"] in ex:
            assert abs(r["cosine"] - ex[r["vec_id"]]) < 0.02
    # all-zero vector edge: scale 0, qvec zeros, cosine 0
    zq = quantize_query([0.0, 0.0])
    assert zq == [0, 0]


def test_ivf_quantized_composition(spark, emb, centroids):
    """IVF pruning + int8 rerank together: results come only from the probed
    clusters and agree with the float IVF path's candidates."""
    from awesome_spark_search.similarity import (
        assign_ivf_clusters,
        ivf_topk,
        ivf_topk_quantized,
    )
    from pyspark.sql import functions as F

    qvec = [float(x) for x in emb.filter("vec_id = 1").collect()[0]["embedding"]]
    got = ivf_topk_quantized(emb, centroids, qvec, k=10, nprobe=2).collect()
    ref = ivf_topk(emb, centroids, qvec, k=10, nprobe=2).collect()
    assert len(got) == 10
    overlap = {r["vec_id"] for r in got} & {r["vec_id"] for r in ref}
    assert len(overlap) >= 7, overlap
    # every result must come from a probed cluster (the pruning is real)
    import numpy as np

    q = np.asarray(qvec); cents = np.asarray(centroids, dtype=np.float64)
    sims = (cents @ q) / (np.linalg.norm(cents, axis=1) * np.linalg.norm(q) + 1e-30)
    probe = set(int(c) for c in np.argsort(-sims)[:2])
    clusters = {
        r["vec_id"]: r["cluster"]
        for r in assign_ivf_clusters(emb, centroids).collect()
    }
    assert all(clusters[r["vec_id"]] in probe for r in got)
