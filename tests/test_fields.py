"""Field/zone-weighted scoring (reference ContentType weights analog)."""

from awesome_spark_search.fields import build_fielded_postings, fielded_bm25_topk


def _corpus(spark):
    rows = [
        (0, "merge buffer merge", "title merge here"),
        (1, "merge buffer", "other title"),
        (2, "buffer only text", "title merge here"),
        (3, "nothing relevant", "other title"),
    ]
    return spark.createDataFrame(rows, "doc_id long, body string, title string")


def test_title_weight_boosts_title_matches(spark):
    df = _corpus(spark)
    weights = {"body": 1.0, "title": 2.0}
    postings, lens, ts = build_fielded_postings(df, weights, do_stem=False)
    top = fielded_bm25_topk(spark, postings, lens, ts, weights, ["merge"], k=4).collect()
    got = [r["doc_id"] for r in top]
    # doc 0 matches in both fields -> highest; doc 3 matches nowhere
    assert got[0] == 0
    assert 3 not in got
    # title-only match (doc 2, w=2) outranks body-only match (doc 1, w=1)
    assert got.index(2) < got.index(1)


def test_zero_weight_field_is_ignored(spark):
    df = _corpus(spark)
    weights = {"body": 1.0, "title": 0.0}
    postings, lens, ts = build_fielded_postings(df, weights, do_stem=False)
    top = fielded_bm25_topk(spark, postings, lens, ts, weights, ["merge"], k=4).collect()
    ids = {r["doc_id"] for r in top if r["score"] > 0}
    assert ids == {0, 1}  # title-only matches score 0
