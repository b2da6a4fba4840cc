"""Source adapters: XML distributed parse, schema normalization, doc_id
assignment (SURVEY §2.1 S1/S2 analogs)."""

import os

import pytest

from awesome_spark_search import corpus
from awesome_spark_search.sources import normalize_source, read_source

XML_DOC = """<corpus>
<document repo="org0/repo1" path="src/a.py" commit="c0ffee000001" lang="py">
  <content>import buffer merge sort</content>
</document>
<document repo="org1/repo2" path="src/b.rs" commit="c0ffee000002" lang="rs">
  <content>posting list compress encode</content>
</document>
</corpus>
"""


def test_xml_corpus_roundtrip(spark, tmp_path):
    xml_dir = tmp_path / "xml"
    xml_dir.mkdir()
    (xml_dir / "part1.xml").write_text(XML_DOC)
    df = read_source(spark, str(xml_dir), fmt="xml")
    rows = {r["repo"]: r for r in df.collect()}
    assert set(rows) == {"org0/repo1", "org1/repo2"}
    assert rows["org0/repo1"]["content"].strip() == "import buffer merge sort"
    assert rows["org1/repo2"]["lang"] == "rs"


def test_normalize_assigns_dense_ordered_doc_ids(spark):
    pdf = corpus.generate_pandas(50, seed=11).drop(columns=["doc_id"])
    df = spark.createDataFrame(pdf)
    out = normalize_source(df)
    rows = out.orderBy("doc_id").collect()
    assert [r["doc_id"] for r in rows] == list(range(50))
    # ordering key respected
    keys = [(r["repo"], r["path"], r["commit"]) for r in rows]
    assert keys == sorted(keys)


def test_normalize_rejects_missing_columns(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, content string")
    with pytest.raises(ValueError, match="missing columns"):
        normalize_source(df)


def test_iceberg_falls_back_to_parquet(spark, tmp_path):
    pq = str(tmp_path / "tbl")
    spark.createDataFrame(corpus.generate_pandas(10, seed=1)).write.parquet(pq)
    df = read_source(spark, pq, fmt="iceberg")
    assert df.count() == 10
