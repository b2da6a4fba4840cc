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
