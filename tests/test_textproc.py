"""Tokenizer contract tests (SURVEY.md §2.2 T1-T3 semantics)."""

from awesome_spark_search.textproc import tokenize_text, preprocess_query_terms


def test_basic_pipeline_positions_before_stopword_removal():
    # "the" is a stopword: removed from terms but holds position 0 and counts
    # toward doc length (ref: DocumentIndexer.java:225,238)
    n, pairs = tokenize_text("the quick buffer", do_stem=False)
    assert n == 3
    assert pairs == [("quick", 1), ("buffer", 2)]


def test_length_filter_min2():
    n, pairs = tokenize_text("a bb c dd", do_stem=False)
    # 1-char tokens dropped BEFORE position assignment (Lucene filter chain)
    assert n == 2
    assert pairs == [("bb", 0), ("dd", 1)]


def test_regex_alphabet():
    n, pairs = tokenize_text("foo_bar baz-qux x1y2 42", do_stem=False)
    terms = [t for t, _ in pairs]
    assert "foo_bar" in terms and "baz-qux" in terms
    # digits split tokens: "x1y2" -> no token (x,y are length-1)
    assert all("1" not in t and "4" not in t for t in terms)


def test_lowercase():
    _, pairs = tokenize_text("BUFFER Merge", do_stem=False)
    assert [t for t, _ in pairs] == ["buffer", "merge"]


def test_stemming_applied():
    _, pairs = tokenize_text("merging buffers", do_stem=True)
    assert [t for t, _ in pairs] == ["merg", "buffer"]


def test_wildcard_preserved_only_in_query_mode():
    _, pairs = tokenize_text("token* merge", do_stem=True, preserve_wildcards=True)
    assert ("token*", 0) in pairs  # not stemmed, star kept
    _, pairs2 = tokenize_text("token* merge", do_stem=True)
    assert [t for t, _ in pairs2][0] == "token"


def test_query_preprocess():
    assert preprocess_query_terms("the Token* MERGING", do_stem=True) == [
        "token*", "merg",
    ]


def test_empty_and_none():
    assert tokenize_text("", do_stem=True) == (0, [])
    assert tokenize_text(None, do_stem=True) == (0, [])


def test_jvm_doc_len_matches_python(spark):
    """doc_len computed JVM-side (doc_len_col) must equal the Python
    tokenizer's stopword-inclusive count for every doc."""
    from awesome_spark_search import corpus
    from awesome_spark_search.textproc import doc_len_col, tokenize_text

    pdf = corpus.generate_pandas(80, seed=13)
    df = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: r["dl"]
        for r in df.select("doc_id", doc_len_col("content").alias("dl")).collect()
    }
    for _, row in pdf.iterrows():
        n, _ = tokenize_text(row["content"], do_stem=False)
        assert got[row["doc_id"]] == n, row["doc_id"]
