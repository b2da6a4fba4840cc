"""Deterministic synthetic source-code corpus (FIXTURES.md F1) + adapters.

Shape fixed by BASELINE.json input_hint:
    (repo:string, path:string, commit:string, lang:string, content:string)
plus a dense deterministic ``doc_id`` ordered by (repo, path, commit) so
top-k tie-breaks are reproducible.

Content is Zipf-distributed draws from a code-like vocabulary, with planted
phrases (phrase-query goldens), one-doc rare terms (exact match), a wildcard
family (token*, prefix queries), misspelling targets, and stop-word noise —
everything the golden query suite needs, generated from one seed with numpy
(vectorized; scales to bench sizes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "java", "js", "go", "rs", "c"]
LANG_W = [0.35, 0.2, 0.15, 0.12, 0.1, 0.08]

_BASE_VOCAB = [
    "import", "def", "return", "class", "buffer", "posting", "list", "merge",
    "sort", "scan", "index", "token", "stream", "batch", "shard", "partition",
    "compress", "encode", "decode", "varint", "delta", "block", "score",
    "query", "search", "rank", "filter", "join", "group", "shuffle", "spill",
    "hash", "tree", "node", "edge", "graph", "cache", "flush", "commit",
    "branch", "vector", "matrix", "tensor", "kernel", "thread", "lock",
    "mutex", "atomic", "async", "await", "yield", "lambda", "struct", "enum",
    "trait", "module", "package", "runtime", "compile", "parse", "lexer",
    "grammar", "symbol", "table", "record", "field", "schema", "column",
    "row", "tuple", "array", "string", "integer", "float", "double", "byte",
]
PHRASE = ["merge", "sort", "buffer"]          # planted phrase
WILDCARD_FAMILY = ["tokenize", "tokenizer", "tokenizing", "tokenized"]
STOP_NOISE = ["the", "a", "of", "and", "in", "to", "is"]


def vocab(size: int = 2000) -> list[str]:
    """~`size` code-like identifiers: base words + derived compounds."""
    out = list(_BASE_VOCAB) + WILDCARD_FAMILY
    i = 0
    while len(out) < size:
        a = _BASE_VOCAB[i % len(_BASE_VOCAB)]
        b = _BASE_VOCAB[(i * 7 + 3) % len(_BASE_VOCAB)]
        out.append(f"{a}_{b}{i % 13}" if i % 3 == 0 else f"{a}-{b}")
        i += 1
    # dedupe preserving order
    seen: set[str] = set()
    return [w for w in out if not (w in seen or seen.add(w))][:size]


def generate_pandas(n_docs: int, seed: int = 42, vocab_size: int = 2000,
                    zipf_a: float = 1.3, doc_len_mean: int = 120) -> pd.DataFrame:
    """Seeded generator -> pandas DataFrame (driver-side; for tests/bench
    the result is parallelized or written to Parquet once)."""
    rng = np.random.default_rng(seed)
    words = np.array(vocab(vocab_size))
    V = len(words)
    # Zipf over vocab ranks, exponent tuned so rank-0 hits >30% of docs
    ranks = np.arange(1, V + 1, dtype=np.float64)
    probs = ranks ** (-zipf_a)
    probs /= probs.sum()

    lens = np.maximum(8, rng.poisson(doc_len_mean, n_docs))
    total = int(lens.sum())
    draws = rng.choice(V, size=total, p=probs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    docs = []
    stop = np.array(STOP_NOISE)
    for i in range(n_docs):
        toks = list(words[draws[offsets[i]: offsets[i + 1]]])
        # interleave stop-word noise deterministically
        for j in range(0, len(toks), 9):
            toks.insert(j, stop[(i + j) % len(stop)])
        if i % 17 == 0:          # plant the phrase
            toks[3:3] = PHRASE
        if i % 23 == 0:          # wildcard family member
            toks.append(WILDCARD_FAMILY[i % len(WILDCARD_FAMILY)])
        if i % 101 == 0:         # one-doc rare term (letters only: the
            # tokenizer alphabet is [a-zA-Z-_], digits would split the token)
            suffix = "".join(chr(ord("a") + int(d)) for d in str(i))
            toks.append(f"rareterm{suffix}")
        docs.append(" ".join(toks))

    idx = np.arange(n_docs)
    repo = np.array([f"org{i % 7}/repo{i % 23}" for i in idx])
    lang = rng.choice(LANGS, size=n_docs, p=LANG_W)
    path = np.array(
        [f"src/pkg{(i * 3) % 11}/mod{i}.{lang[i]}" for i in idx]
    )
    commit = np.array(
        [hashlib.sha1(f"{repo[i]}|{path[i]}".encode()).hexdigest()[:12] for i in idx]
    )
    pdf = pd.DataFrame(
        {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": docs}
    )
    pdf = pdf.sort_values(["repo", "path", "commit"], kind="mergesort").reset_index(drop=True)
    pdf.insert(0, "doc_id", np.arange(n_docs, dtype=np.int64))
    return pdf


def generate(spark: SparkSession, n_docs: int, seed: int = 42, **kw) -> DataFrame:
    return spark.createDataFrame(generate_pandas(n_docs, seed, **kw))


def from_documents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: driver-provided documents.parquet -> input_hint shape.
    repo/path/commit synthesized deterministically from doc_id/source."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.lit("corpus/"), F.col("source")).alias("repo"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.concat_ws("|", "source", F.col("doc_id").cast("string")), 256).substr(1, 12).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def assign_doc_ids(df: DataFrame, order_cols: list[str], partitions: int = 64) -> DataFrame:
    """Scalable dense doc_id assignment ordered by ``order_cols``.

    Two-pass pattern (no global sort bottleneck beyond range partitioning):
    range-partition + local sort, count rows per partition (tiny collect),
    then doc_id = partition_offset + local row_number. At 10^12 rows the only
    driver-side state is one count per partition.
    """
    from pyspark.sql.window import Window

    ranged = df.repartitionByRange(partitions, *order_cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    counts = {r["_pid"]: r["c"] for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        with_pid.withColumn("_rn", F.row_number().over(w))
        .withColumn("doc_id", (omap[F.col("_pid")] + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn")
    )
