"""Index build pipeline — the Spark-native equivalent of the reference's
index()/compressIndex() (ref: src/SearchEngine/AwesomeSearchEngine.java:326-340,
src/indexing/DocumentIndexer.java:141-173, InvertedIndexMerger.java:34-112).

The reference's shape — per-document posting accumulation, memory-bounded
spill runs, external k-way merge by term — *is* Spark's map/combine/shuffle/
reduce. We express it declaratively and let Catalyst/Tungsten own spilling and
merging; what stays explicit is what the optimizer cannot infer:

* **skew**: hot terms (``import``/``def``-class tokens hit >30% of docs)
  never hit an unbounded reducer: term_stats rolls up from the packed
  (term, doc_shard) group rows (bounded by construction), and the unpacked
  fallback aggregates two-level — ``groupBy(term, salt)`` partials then a
  final ``groupBy(term)``.
* **bounded posting rows**: packed postings are keyed ``(term, doc_shard)``
  where ``doc_shard = doc_id // shard_size``. A term over 10^12 docs never
  produces one giant array row; every row is <= shard_size entries and the
  query side intersects per-shard (embarrassingly parallel WAND).
* **term-bucket layout**: the final index is hash-bucketed on term
  (``term_bucket`` partition column), so a query's term lookup prunes to
  q buckets (the role of the reference's seek list, via partition pruning +
  Parquet min/max stats).

At 100 TB: tokenize is a narrow map (Arrow batches), the single wide shuffle
is groupBy(term, doc_id) with map-side partial aggregation, and every later
stage groups on keys that include doc_shard/term_bucket, keeping state bounded.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec
from .lineage import StageRunner
from .textproc import doc_postings_flat, doc_len_col

K1 = 1.2
B = 0.75
DEFAULT_TERM_BUCKETS = 64
DEFAULT_DOC_SHARD_SIZE = 1 << 20  # 1M docs per shard row at scale
DEFAULT_SALT = 16


@dataclass
class IndexStats:
    n_docs: int
    total_tokens: int
    avgdl: float


@dataclass
class Index:
    """The queryable index: a set of DataFrames + tiny driver-side stats.

    Columnar split mirrors the reference's frequency/positional file split
    (ref: src/SearchEngine/AwesomeSearchEngine.java:91-100): ``positions`` is
    its own column, so keyword queries never read it (Parquet column pruning).
    """

    doc_map: DataFrame      # doc_id, repo, path, commit, lang, doc_len, content_sha256
    postings: DataFrame     # term_bucket, term, doc_id, tf, positions
    term_stats: DataFrame   # term_bucket, term, df, cf
    packed: DataFrame       # term_bucket, term, doc_shard, n, *_vb blobs, block_max, blk_* directory
    stats: IndexStats
    do_stem: bool = True
    build_metrics: list = field(default_factory=list)
    doc_shard_size: int = DEFAULT_DOC_SHARD_SIZE  # packed sharding (query side must match)


PACKED_SCHEMA = T.StructType(
    [
        T.StructField("term_bucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_shard", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        # per-group collection frequency (sum of tfs): term_stats aggregates
        # straight off the packed table — the pack shuffle already grouped by
        # term, so the separate full-postings term_stats pass is skipped
        T.StructField("cf", T.LongType(), False),
        T.StructField("doc_ids_vb", T.BinaryType(), False),
        T.StructField("tfs_vb", T.BinaryType(), False),
        # doc lengths ride inside the blob (aligned with doc_ids) so the
        # query side never joins doc_map — ~1-2 bytes/posting, the classic
        # impact-index tradeoff
        T.StructField("dls_vb", T.BinaryType(), False),
        T.StructField("pos_vb", T.BinaryType(), False),
        T.StructField("block_max", T.ArrayType(T.DoubleType()), False),
        # block directory (ref skipping-areas analog: src/io/index/
        # UncompressedIndexWriter.java:101-118): per 128-posting block, the
        # byte offset into each stream plus the block's first doc_id. The
        # doc_id delta stream RESTARTS at each block head, so any block
        # decodes standalone — the query side skips whole blocks without
        # touching their bytes (see wand._shard_topk_factory).
        T.StructField("blk_doc_off", T.ArrayType(T.IntegerType()), False),
        T.StructField("blk_tf_off", T.ArrayType(T.IntegerType()), False),
        T.StructField("blk_dl_off", T.ArrayType(T.IntegerType()), False),
        # byte offset into pos_vb at each block's first doc marker: the
        # position stream ([tf, gap...] per doc) of any block run decodes
        # standalone, so phrase queries decode positions ONLY for blocks
        # holding doc-level candidates (wand._phrase_shard_factory)
        T.StructField("blk_pos_off", T.ArrayType(T.IntegerType()), False),
        T.StructField("blk_first_doc", T.ArrayType(T.LongType()), False),
    ]
)


def _pack_many(pdf: pd.DataFrame, avgdl: float, n_buckets: int) -> pd.DataFrame:
    """Pack MANY (term, doc_shard) groups from one sorted frame.

    ``pdf`` must be sorted by (term, doc_shard, doc_id). Group detection and
    the position gap stream are computed vectorized over the whole frame; the
    only per-group Python is a handful of numpy slice + varint calls
    (~50-100us/group vs ~1.3ms/group for pandas per-group dispatch).
    """
    terms = pdf["term"].to_numpy()
    shards = pdf["doc_shard"].to_numpy(dtype=np.int64)
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["doc_len"].to_numpy(dtype=np.int64)
    n = len(pdf)
    if n == 0:
        return pd.DataFrame(
            {
                "term_bucket": pd.Series(dtype="int32"),
                "term": pd.Series(dtype="object"),
                "doc_shard": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int32"),
                "cf": pd.Series(dtype="int64"),
                "doc_ids_vb": pd.Series(dtype="object"),
                "tfs_vb": pd.Series(dtype="object"),
                "dls_vb": pd.Series(dtype="object"),
                "pos_vb": pd.Series(dtype="object"),
                "block_max": pd.Series(dtype="object"),
                "blk_doc_off": pd.Series(dtype="object"),
                "blk_tf_off": pd.Series(dtype="object"),
                "blk_dl_off": pd.Series(dtype="object"),
                "blk_pos_off": pd.Series(dtype="object"),
                "blk_first_doc": pd.Series(dtype="object"),
            }
        )

    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
    gstart = np.flatnonzero(new)
    gend = np.append(gstart[1:], n)

    # whole-frame position gap stream: per doc [tf, gap0(=pos0), gaps...]
    flat = (
        np.concatenate([np.asarray(p, dtype=np.int64) for p in pdf["positions"]])
        if n
        else np.zeros(0, dtype=np.int64)
    )
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tfs, out=offsets[1:])
    total = int(offsets[-1])
    gaps = np.empty(total, dtype=np.int64)
    if total:
        gaps[1:] = np.diff(flat)
        gaps[offsets[:-1]] = flat[offsets[:-1]]

    cols: dict[str, list] = {f.name: [] for f in PACKED_SCHEMA.fields}
    for s, e in zip(gstart.tolist(), gend.tolist()):
        ids = doc_ids[s:e]
        t = tfs[s:e]
        seg = gaps[offsets[s]: offsets[e]]
        k = e - s
        stream = np.empty(k + len(seg), dtype=np.uint64)
        marker_idx = (offsets[s:e] - offsets[s]) + np.arange(k, dtype=np.int64)
        stream[marker_idx] = t.astype(np.uint64)
        mask = np.ones(len(stream), dtype=bool)
        mask[marker_idx] = False
        stream[mask] = seg.astype(np.uint64)
        row = _encode_group(terms[s], int(shards[s]), ids, t, dls[s:e],
                            stream, avgdl, n_buckets)
        for name, v in row.items():
            cols[name].append(v)
    return pd.DataFrame(cols)


def _encode_group(
    term: str,
    shard: int,
    ids: np.ndarray,
    t: np.ndarray,
    dls_seg: np.ndarray,
    stream: np.ndarray,
    avgdl: float,
    n_buckets: int,
) -> dict:
    """Encode ONE (term, doc_shard) group — sorted doc_ids ``ids``, per-doc
    tfs ``t`` and doc lengths ``dls_seg``, and the concatenated
    [tf, gap0(=pos0), gaps...] position ``stream`` — into a PACKED_SCHEMA
    row dict. Shared by the builder (_pack_many) and the packed-index
    merger (merge.merge_packed_indexes), so both produce byte-compatible
    blobs and directories."""
    k = ids.size
    marker_idx = np.zeros(k, dtype=np.int64)
    if k:
        np.cumsum(t[:-1] + 1, out=marker_idx[1:])
    ids_vb, doc_off, first_doc = codec.delta_vbyte_encode_blocked(ids)
    tfs_vb, tf_off = codec.vbyte_encode_blocked(t.astype(np.uint64))
    dls_vb, dl_off = codec.vbyte_encode_blocked(dls_seg.astype(np.uint64))
    pos_vb, pos_enc_off = codec._vbyte_encode_with_offsets(stream)
    # the blk_* directories are stored int32: a blob past 2^31 bytes would
    # silently wrap the offsets and corrupt block slicing. Unreachable at
    # the default doc_shard_size (2^20 docs * <=10B/varint), but guard the
    # invariant rather than assume it — fail the build loudly instead.
    if len(pos_vb) >= 2**31 or len(ids_vb) >= 2**31:
        raise ValueError(
            f"packed blob for term={term!r} doc_shard={shard} "
            f"exceeds int32 offset range ({len(pos_vb)} bytes); "
            "lower doc_shard_size"
        )
    # stream entry index of doc j's tf marker = (cum tf before j) + j;
    # take it at each 128-doc block head -> byte offset into pos_vb
    blk_heads = np.arange(0, k, codec.BLOCK, dtype=np.int64)
    pos_off = (
        pos_enc_off[marker_idx[blk_heads]] if k else np.zeros(0, dtype=np.int64)
    )
    return {
        "term_bucket": _py_term_bucket(term, n_buckets),
        "term": term,
        "doc_shard": shard,
        "n": k,
        "cf": int(t.sum()),
        "doc_ids_vb": ids_vb,
        "tfs_vb": tfs_vb,
        "dls_vb": dls_vb,
        "pos_vb": pos_vb,
        "block_max": codec.block_max_scores(t, dls_seg, avgdl, K1, B).tolist(),
        "blk_doc_off": doc_off.astype(np.int32).tolist(),
        "blk_tf_off": tf_off.astype(np.int32).tolist(),
        "blk_dl_off": dl_off.astype(np.int32).tolist(),
        "blk_pos_off": pos_off.astype(np.int32).tolist(),
        "blk_first_doc": first_doc.tolist(),
    }


def _pack_stream_factory(avgdl: float, n_buckets: int):
    """mapInPandas packer over a partition sorted by (term, doc_shard, doc_id).

    One Python call per Arrow batch; a group spanning a batch boundary is
    buffered and completed with the next batch (partition order is stable).
    """

    def pack_iter(batches):
        buf: pd.DataFrame | None = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_term = pdf["term"].iloc[-1]
            last_shard = pdf["doc_shard"].iloc[-1]
            tail = (pdf["term"] == last_term) & (pdf["doc_shard"] == last_shard)
            buf = pdf[tail]
            head = pdf[~tail]
            if len(head):
                yield _pack_many(head, avgdl, n_buckets)
        if buf is not None and len(buf):
            yield _pack_many(buf, avgdl, n_buckets)

    return pack_iter


def _py_term_bucket(term: str, n_buckets: int) -> int:
    """Deterministic term->bucket hash shared by build (JVM crc32 expression)
    and query (driver-side pruning). CRC32 is identical across zlib and Spark;
    Python's hash() is process-salted and unusable here."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_col(term_col, n_buckets: int):
    """JVM-side bucket id == _py_term_bucket, pure codegen (no UDF)."""
    return F.pmod(F.crc32(F.encode(term_col, "UTF-8")), F.lit(n_buckets)).cast("int")


def build_index(
    spark: SparkSession,
    source_df: DataFrame,
    *,
    do_stem: bool = True,
    checkpoint_dir: str | None = None,
    n_term_buckets: int = DEFAULT_TERM_BUCKETS,
    doc_shard_size: int = DEFAULT_DOC_SHARD_SIZE,
    salt: int = DEFAULT_SALT,
    build_packed: bool = True,
    cache: bool = True,
    cache_postings: bool = True,
) -> Index:
    """Build the full index from a source table.

    ``source_df`` must carry (doc_id, content) and may carry
    (repo, path, commit, lang). ``checkpoint_dir`` enables stage-resumable
    materialization (see lineage.py); None keeps everything lazy/cached
    (test mode — same plan shapes).
    """
    runner = StageRunner(spark, checkpoint_dir)
    meta_cols = [c for c in ("repo", "path", "commit", "lang") if c in source_df.columns]

    # Per-document posting accumulation happens map-side inside the Arrow
    # batch (the reference's PostingTable.put loop, ref: DocumentIndexer.java:
    # 220-242) — the posting table exists after ONE narrow mapInPandas pass,
    # with NO (term, doc_id) shuffle at all.
    def _postings():
        return doc_postings_flat(
            source_df.select("doc_id", "content"), do_stem=do_stem
        ).withColumn("term_bucket", term_bucket_col(F.col("term"), n_term_buckets))

    postings = runner.run(
        "postings", _postings,
        partition_by=["term_bucket"], sort_within=["term", "doc_id"],
    )
    if cache and cache_postings and checkpoint_dir is None:
        # cache_postings=False skips the columnar cache-write of the long
        # posting table (the single biggest memory-bandwidth item in the
        # build) — right when serving runs off the packed index, which is
        # cached regardless
        postings = postings.persist()

    # doc_map never needs Python: sha256 and the stopword-inclusive token
    # count are whole-stage-codegen expressions over the source (doc_len
    # parity with the Python tokenizer is pinned by tests).
    doc_map = runner.run(
        "doc_map",
        lambda: source_df.select(
            "doc_id",
            *meta_cols,
            F.sha2(F.col("content"), 256).alias("content_sha256"),
            doc_len_col("content").alias("doc_len"),
        ),
    )
    if cache and checkpoint_dir is None:
        # persisted BEFORE the stats action below: that one collect both
        # fills the doc_map cache and aggregates it — no separate doc_len
        # scan over the content column ever runs
        doc_map = doc_map.persist()

    def _stats_df():
        return doc_map.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("doc_len"), F.lit(0)).alias("total_tokens"),
            F.coalesce(F.avg("doc_len"), F.lit(0.0)).alias("avgdl"),
        )

    stats_row = runner.run("stats", _stats_df).collect()[0]
    stats = IndexStats(
        n_docs=stats_row["n_docs"],
        total_tokens=stats_row["total_tokens"],
        avgdl=float(stats_row["avgdl"]) or 1.0,
    )

    packed = None
    if build_packed:
        def _packed():
            # doc_len rides along from the postings pass — no doc_map join.
            # Hash-repartition on (term, doc_shard) + local sort groups each
            # posting run contiguously; the streaming packer then processes
            # whole Arrow batches (no per-group dispatch). This IS the
            # reference's sorted k-way merge (InvertedIndexMerger.java:34-112)
            # expressed as Spark's sort-shuffle.
            with_shard = postings.withColumn(
                "doc_shard", (F.col("doc_id") / F.lit(doc_shard_size)).cast("long")
            )
            return (
                with_shard.repartition("term", "doc_shard")
                .sortWithinPartitions("term", "doc_shard", "doc_id")
                .mapInPandas(
                    _pack_stream_factory(stats.avgdl, n_term_buckets), PACKED_SCHEMA
                )
            )

        packed = runner.run(
            "packed", _packed,
            partition_by=["term_bucket"], sort_within=["term", "doc_shard"],
        )
        if cache and checkpoint_dir is None:
            # without this, every packed-path query replays the whole
            # repartition+sort+pack pipeline (minutes at 10^6 docs)
            packed = packed.persist()

    if packed is not None:
        # the pack shuffle already grouped every posting by term: df/cf are a
        # cheap rollup of the (term, doc_shard) group rows — one aggregation
        # over #groups rows instead of a second full pass over #postings
        def _term_stats():
            return (
                packed.groupBy("term")
                .agg(
                    F.sum("n").cast("long").alias("df"),
                    F.sum("cf").alias("cf"),
                )
                .withColumn("term_bucket", term_bucket_col(F.col("term"), n_term_buckets))
            )
    else:
        # no packed table: two-level salted aggregation — partials on
        # (term, salt) bound any single reducer's input even for a term
        # present in most documents
        def _term_stats():
            partial = (
                postings.groupBy("term", F.pmod(F.col("doc_id"), F.lit(salt)).alias("_salt"))
                .agg(F.count(F.lit(1)).alias("pdf"), F.sum("tf").alias("pcf"))
            )
            return (
                partial.groupBy("term")
                .agg(F.sum("pdf").alias("df"), F.sum("pcf").alias("cf"))
                .withColumn("term_bucket", term_bucket_col(F.col("term"), n_term_buckets))
            )

    term_stats = runner.run(
        "term_stats", _term_stats,
        partition_by=["term_bucket"], sort_within=["term"],
    )

    if cache and checkpoint_dir is None:
        term_stats = term_stats.persist()

    return Index(
        doc_map=doc_map,
        postings=postings,
        term_stats=term_stats,
        packed=packed,
        stats=stats,
        do_stem=do_stem,
        build_metrics=runner.metrics,
        doc_shard_size=doc_shard_size,
    )
