"""Query executor: AST -> composed DataFrame plan -> top-k.

Spark-native rendition of the reference's QueryProcessor dispatch
(ref: src/querying/QueryProcessor.java:139-169, 194-331):

* keyword      -> postings filter (term-bucket pruned) + BM25 groupBy/agg
* AND/OR/NOT   -> inner join / unionByName+distinct / left_anti on doc_id
* phrase       -> chained doc_id joins with position-adjacency array algebra
* prefix tok*  -> range filter on the sorted term column
* LinkTo:ID    -> citation edge filter
* spelling     -> Damerau-Levenshtein correction when a term has no postings
* PRF #N       -> two-pass search, +10 most frequent tokens of the generated
                  snippets of the top-N docs at weight 0.25

Every plan stays declarative: term lookups prune partitions via term_bucket,
keyword scoring never touches the positions column (columnar pruning = the
reference's frequency/positional file split), small per-query tables are
broadcast.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import queries as Q
from . import scoring
from .build import Index, DEFAULT_TERM_BUCKETS, _py_term_bucket
from .spell import correct_terms
from .textproc import preprocess_query_terms, tokenize_text

PRF_MOST_FREQUENT_TOKENS = 10  # ref: QueryProcessor.java:44-46


class QueryExecutor:
    def __init__(
        self,
        spark: SparkSession,
        index: Index,
        *,
        citations: DataFrame | None = None,
        packed_citations: DataFrame | None = None,
        source_df: DataFrame | None = None,
        scorer: str = "bm25",
        n_term_buckets: int = DEFAULT_TERM_BUCKETS,
        use_packed: bool = False,
        fielded_index=None,
    ):
        self.spark = spark
        self.index = index
        # a fields.FieldedPackedIndex built over the SAME corpus: keyword
        # queries then rank zone-weighted (the reference's QueryProcessor
        # always applies ContentType weights, ref: DocumentRanker.java:
        # 138-167); spelling/vocab/snippets/PRF keep using ``index``
        self.fielded_index = fielded_index
        self.citations = citations
        self.packed_citations = packed_citations
        self.source_df = source_df
        self.scorer = scorer
        self.n_buckets = n_term_buckets
        self._corrections: dict[str, str] = {}
        self.last_corrections: dict[str, str] = {}  # surfaced to formatters
        self._query_terms: list[str] = []
        # driver-side vocabulary for O(1) existence checks (None = too big)
        self._vocab: frozenset[str] | None = None
        self._vocab_checked = False
        self._n_terms: int | None = None
        # past VOCAB_CACHE_MAX: a Bloom filter (built once) replaces the
        # per-query existence semi-filter — see bloom.py for the semantics
        self._bloom = None
        self._bloom_checked = False
        # serve pure keyword/phrase queries from the packed compressed index
        # (block-max WAND / positional decode) instead of the long table
        self.use_packed = use_packed and index.packed is not None

    # ---- term access -----------------------------------------------------

    def _tokenize_query(self, text: str) -> list[str]:
        return preprocess_query_terms(text, do_stem=self.index.do_stem)

    def _postings_for_terms(self, terms: list[str], *, with_positions: bool) -> DataFrame:
        """Exact-term postings with partition pruning on term_bucket."""
        buckets = sorted({_py_term_bucket(t, self.n_buckets) for t in terms})
        cols = ["term", "doc_id", "tf"] + (["positions"] if with_positions else [])
        return (
            self.index.postings
            .filter(F.col("term_bucket").isin(buckets))
            .filter(F.col("term").isin(terms))
            .select(*cols)
        )

    def _postings_for_prefix(self, prefix: str) -> DataFrame:
        """tok* -> all matching terms' postings (ref: QueryProcessor.java:382-385).
        Range filter on the term column; Parquet min/max stats prune files
        because postings are written sorted by term within partitions."""
        return (
            self.index.postings
            .filter((F.col("term") >= prefix) & (F.col("term") < prefix + "￿"))
            .filter(F.col("term").startswith(prefix))
            .select("term", "doc_id", "tf")
        )

    def resolve_terms(
        self, terms: list[str], dedupe: bool = True
    ) -> tuple[list[str], list[str], dict[str, str]]:
        """Split exact/prefix terms, applying the active correction map
        (ref: QueryProcessor.java:397-417 corrects tokens with no postings;
        ``search`` discovers corrections up front — cached-vocab O(1) or a
        per-query existence semi-filter). Returns
        (exact, prefixes, corrections_applied).
        ``dedupe=False`` preserves order+multiplicity (phrase semantics)."""
        exact, prefixes = [], []
        for t in terms:
            if t.endswith("*"):
                prefixes.append(t[:-1])
            else:
                exact.append(self._corrections.get(t, t))
        if dedupe:
            seen = set()
            exact = [t for t in exact if not (t in seen or seen.add(t))]
        return exact, prefixes, dict(self._corrections)

    VOCAB_CACHE_MAX = 1_000_000  # driver-side dictionary cutoff (~60MB)

    USE_VOCAB_BLOOM = True  # huge-vocab existence via a one-time Bloom build

    def _get_vocab(self) -> frozenset[str] | None:
        """Driver-cached term dictionary when it is small enough; the
        existence check then costs zero Spark actions per query. For huge
        vocabularies (10^8-term code corpora) this returns None and the
        existence check uses a Bloom filter built ONCE per index
        (``_get_bloom``) — still zero per-query actions; with the Bloom
        disabled it falls back to a per-query isin semi-filter."""
        if not self._vocab_checked:
            self._vocab_checked = True
            if self.index.stats.n_docs:
                self._n_terms = self.index.term_stats.count()
                if self._n_terms <= self.VOCAB_CACHE_MAX:
                    self._vocab = frozenset(
                        r["term"]
                        for r in self.index.term_stats.select("term").collect()
                    )
        return self._vocab

    def _get_bloom(self):
        """One-time md5 Bloom filter over the dictionary for vocabularies
        too big for the exact driver cache. No false negatives: typo'd
        tokens still always enter the correction job; a false positive
        (~2^-11) only suppresses one correction, never invents one
        (bloom.py has the full argument + the 100 TB build shape)."""
        if not self._bloom_checked:
            self._bloom_checked = True
            if self.USE_VOCAB_BLOOM and self._n_terms:
                from .bloom import build_term_bloom

                self._bloom = build_term_bloom(self.index.term_stats, self._n_terms)
        return self._bloom

    def _find_corrections(self, terms: list[str]) -> dict[str, str]:
        """For exact terms absent from the dictionary, find the best
        Damerau-Levenshtein correction (ref: SpellingCorrector.java:38-48)."""
        exact = sorted({t for t in terms if not t.endswith("*")})
        if not exact:
            return {}
        vocab = self._get_vocab()
        if vocab is not None:
            present = {t for t in exact if t in vocab}
        elif (bloom := self._get_bloom()) is not None:
            present = {t for t in exact if t in bloom}
        else:
            buckets = sorted({_py_term_bucket(t, self.n_buckets) for t in exact})
            present = {
                r["term"]
                for r in self.index.term_stats
                .filter(F.col("term_bucket").isin(buckets))
                .filter(F.col("term").isin(exact))
                .select("term").collect()
            }
        missing = [t for t in exact if t not in present]
        if not missing:
            return {}
        # ONE correction job regardless of typo count (batched dictionary
        # scan + pair-distance pass; ref corrects all tokens in one query
        # pass, QueryProcessor.java:397-417)
        return correct_terms(missing, self.index.term_stats)

    # ---- leaf/composite doc-set + match plans ---------------------------

    PREFIX_EXPAND_MAX = 1000

    def _keyword_matches(self, kw: Q.Keyword) -> DataFrame:
        exact, prefixes, _ = self.resolve_terms(kw.terms)
        parts = []
        if exact:
            parts.append(self._postings_for_terms(exact, with_positions=False))
        for p in prefixes:
            # dictionary-assisted expansion: resolve the matching terms from
            # the (cached) term dictionary, then do bucket-pruned exact
            # lookups instead of scanning the whole posting table; falls back
            # to the range scan for huge vocabularies or explosive prefixes
            vocab = self._get_vocab()
            if vocab is not None:
                matching = sorted(t for t in vocab if t.startswith(p))
                if not matching:
                    continue
                if len(matching) <= self.PREFIX_EXPAND_MAX:
                    parts.append(
                        self._postings_for_terms(matching, with_positions=False)
                    )
                    continue
            parts.append(self._postings_for_prefix(p))
        if not parts:
            return self._empty_matches()
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def _phrase_matches(self, ph: Q.Phrase) -> DataFrame:
        """Positional adjacency via array algebra (ref: QueryProcessor.java:
        223-293): doc survives if for each consecutive term pair some
        pos2 == pos1 + 1. Carries the running set of end-positions forward."""
        terms, _, _ = self.resolve_terms(ph.terms, dedupe=False)
        if not terms:
            return self._empty_matches()
        if len(terms) == 1:
            return self._postings_for_terms(terms, with_positions=False)
        base = (
            self._postings_for_terms([terms[0]], with_positions=True)
            .select("doc_id", F.col("positions").alias("_cur"))
        )
        for t in terms[1:]:
            nxt = self._postings_for_terms([t], with_positions=True).select(
                "doc_id", F.col("positions").alias("_next")
            )
            base = (
                base.join(nxt, "doc_id")
                .withColumn(
                    "_cur",
                    F.array_intersect(
                        F.transform(F.col("_cur"), lambda x: x + 1), F.col("_next")
                    ),
                )
                .filter(F.size("_cur") > 0)
                .drop("_next")
            )
        phrase_docs = base.select("doc_id")
        # score all phrase terms' postings restricted to surviving docs
        return self._postings_for_terms(terms, with_positions=False).join(
            phrase_docs, "doc_id", "left_semi"
        )

    def _doc_set(self, ast) -> DataFrame:
        """Boolean algebra on doc_id sets (ref: UnrankedQueryResult.java:170-240)."""
        if isinstance(ast, Q.Boolean):
            left = self._doc_set(ast.left)
            right = self._doc_set(ast.right)
            if ast.op == "AND":
                return left.join(right, "doc_id", "left_semi")
            if ast.op == "OR":
                return left.unionByName(right).distinct()
            if ast.op == "NOT":
                return left.join(right, "doc_id", "left_anti")
            raise ValueError(ast.op)
        if isinstance(ast, Q.LinkTo):
            return self._linkto_docs(ast)
        return self._matches(ast).select("doc_id").distinct()

    def _linkto_docs(self, ast: Q.LinkTo) -> DataFrame:
        """LinkTo serves off the PACKED citation index when present
        (delta+VByte citing lists, ref: CitationIndexReader.java:61-112 — the
        reference's serving path IS the compressed index): the dst filter
        prunes to the target's few rows before any decode. Plain edge rows
        are the fallback."""
        if self.packed_citations is not None:
            from .pagerank import citations_of_packed

            return citations_of_packed(self.packed_citations, ast.doc_id)
        if self.citations is None:
            raise ValueError("LinkTo query requires a citations DataFrame")
        return self.citations.filter(F.col("dst") == ast.doc_id).select(
            F.col("src").alias("doc_id")
        )

    def _matches(self, ast) -> DataFrame:
        if isinstance(ast, Q.Keyword):
            return self._keyword_matches(ast)
        if isinstance(ast, Q.Phrase):
            return self._phrase_matches(ast)
        if isinstance(ast, Q.Mixed):
            return self._phrase_matches(ast.phrase).unionByName(
                self._keyword_matches(ast.keyword)
            )
        raise ValueError(f"no matches plan for {type(ast)}")

    def _empty_matches(self) -> DataFrame:
        return self.spark.createDataFrame([], "term string, doc_id long, tf int")

    # ---- ranking ---------------------------------------------------------

    def _term_pred(self, extra_terms: list[str] | None = None):
        """Predicate restricting the broadcast term-stats side to this
        query's terms (exact + corrected + prefix ranges + PRF extras)."""
        terms = set(self._query_terms or [])
        terms |= {self._corrections.get(t, t) for t in terms}
        terms |= set(extra_terms or [])
        exact = sorted(t for t in terms if not t.endswith("*"))
        prefixes = sorted(t[:-1] for t in terms if t.endswith("*"))
        pred = None
        if exact:
            pred = F.col("term").isin(exact)
        for p in prefixes:
            cond = (F.col("term") >= p) & (F.col("term") < p + "￿")
            pred = cond if pred is None else (pred | cond)
        return pred

    def _score(
        self,
        matches: DataFrame,
        weight_col: str | None = None,
        extra_terms: list[str] | None = None,
    ) -> DataFrame:
        st = self.index.stats
        pred = self._term_pred(extra_terms)
        if self.scorer == "bm25":
            return scoring.bm25_score(
                matches, self.index.doc_map, self.index.term_stats,
                n_docs=st.n_docs, avgdl=st.avgdl, weight_col=weight_col,
                term_pred=pred,
            )
        return scoring.ql_jm_score(
            matches, self.index.doc_map, self.index.term_stats,
            total_tokens=st.total_tokens, weight_col=weight_col,
            term_pred=pred,
        )

    RESULT_SCHEMA = "doc_id long, score double"

    def _localize(self, rows) -> DataFrame:
        """k collected rows -> a local DataFrame via the Arrow/pandas path.

        createDataFrame(list) parallelizes into defaultParallelism (32)
        slices — a 32-task job costing ~0.5 s per query just to re-wrap 10
        rows; the Arrow conversion is one batch, ~15x faster (measured).
        score uses the NULLABLE Float64 pandas dtype so Boolean/LinkTo
        queries' NULL scores stay NULL (a float64 NaN would NOT equal the
        oracle's NULL). The trailing nan->NULL projection makes that hold
        under ANY caller session config: with
        spark.sql.execution.arrow.pyspark.enabled=false (the Spark default
        — the external driver's session is not ours to configure) the
        Float64 NA lands as NaN, which the when() folds back to NULL; real
        scores are finite BM25/QL sums, never NaN."""
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "doc_id": pd.array([r["doc_id"] for r in rows], dtype="int64"),
                "score": pd.array([r["score"] for r in rows], dtype="Float64"),
            }
        )
        df = self.spark.createDataFrame(pdf, self.RESULT_SCHEMA)
        return df.select(
            "doc_id",
            F.when(F.isnan("score"), F.lit(None).cast("double"))
            .otherwise(F.col("score"))
            .alias("score"),
        )

    def search(self, query: str, k: int = 10) -> DataFrame:
        """Full pipeline. Returns (doc_id, score) for ranked query types,
        (doc_id, score=NULL recency order) for Boolean/LinkTo
        (ref: QueryProcessor.java:110-127).

        Reference semantics at ANY vocabulary size: every token without
        postings is corrected, even when other tokens match
        (ref: QueryProcessor.java:397-417). With the cached dictionary the
        existence check is O(1) on the driver and the happy path stays ONE
        Spark action; past ``VOCAB_CACHE_MAX`` a Bloom filter built once
        per index keeps it at ONE action per query too (no false negatives
        on membership, so a wrong correction is never invented; a false
        positive (~2^-11/absent term) may rarely suppress one correction —
        see bloom.py; the cached-vocab and semi-filter paths are exact).
        Only with
        ``USE_VOCAB_BLOOM=False`` does it cost a per-query ``isin``
        semi-filter of the (tiny) query-term list against term_stats.
        Applied corrections are exposed as ``last_corrections``. The returned
        DataFrame is localized (k rows)."""
        pq = Q.parse(query, tokenize=self._tokenize_query)
        self._corrections = {}
        self._query_terms = Q.collect_terms(pq.ast)
        exact_q = [t for t in self._query_terms if not t.endswith("*")]
        if exact_q:
            # _find_corrections checks existence against the cached vocab or
            # the once-built Bloom filter (zero per-query actions either way)
            self._corrections = self._find_corrections(exact_q)
        self.last_corrections = dict(self._corrections)
        rows = self._run_once(pq, k)
        return self._localize(rows)

    def search_many(self, queries: dict[str, str], k: int = 10) -> DataFrame:
        """Batched serving: the whole workload in ONE Spark action.

        ``queries`` maps query_id -> query text; every ranked one-pass query
        type batches — keyword bags, exact phrases, and Mixed
        ('"phrase" extra words') queries, each running its single-query
        kernel per shard over ONE shared scan. Boolean/LinkTo (unranked) and
        PRF (inherently two-pass) go through ``search``. Spelling
        corrections for the ENTIRE batch resolve exactly like the
        single-query path and still cost zero extra actions on the happy
        path (existence via the cached vocab / once-built Bloom; one batched
        ``correct_terms`` job only when typos exist). Returns (query_id,
        rank, doc_id, score) — collecting it runs one job: a single
        bucket-pruned packed scan of the union of all terms, per-shard
        per-query kernels, one window for the global per-query top-k.
        Rank+score identical to calling ``search`` per query
        (tests/test_batch.py). Under ``scorer="ql"`` the batch serves
        keyword bags through ``wand.ql_topk_many`` (QL has no phrase/Mixed
        form — same as the single-query executor)."""
        if not self.use_packed or self.scorer not in ("bm25", "ql"):
            raise ValueError("search_many requires use_packed=True and bm25|ql")
        from . import wand as _wand

        batchable = (
            (Q.Keyword,) if self.scorer == "ql" else (Q.Keyword, Q.Phrase, Q.Mixed)
        )
        parsed: dict[str, Q.ParsedQuery] = {}
        all_terms: list[str] = []
        for qid, text in queries.items():
            pq = Q.parse(text, tokenize=self._tokenize_query)
            if pq.prf > 0 or not isinstance(pq.ast, batchable):
                raise ValueError(
                    f"search_many handles ranked one-pass queries only "
                    f"(keyword/phrase/mixed; keyword only under ql); "
                    f"{text!r} parsed to "
                    f"{'PRF' if pq.prf else type(pq.ast).__name__}"
                )
            parsed[qid] = pq
            all_terms.extend(Q.collect_terms(pq.ast))
        exact_q = [t for t in all_terms if not t.endswith("*")]
        self._corrections = self._find_corrections(exact_q) if exact_q else {}
        self.last_corrections = dict(self._corrections)

        def _kw_terms(terms: list[str], text: str) -> list[str]:
            exact, prefixes, _ = self.resolve_terms(terms)
            expanded = self._expand_prefixes(prefixes)
            if expanded is None:
                raise ValueError(
                    f"batch prefix term in {text!r} is not "
                    "dictionary-expandable (no cached vocab or explosive "
                    "prefix) — run it through search()"
                )
            return exact + expanded

        specs: dict[str, tuple[list[str], list[str]]] = {}
        for qid, pq in parsed.items():
            if isinstance(pq.ast, Q.Keyword):
                specs[qid] = ([], _kw_terms(pq.ast.terms, queries[qid]))
            elif isinstance(pq.ast, Q.Phrase):
                ph, _, _ = self.resolve_terms(pq.ast.terms, dedupe=False)
                specs[qid] = (ph, [])
            else:  # Mixed
                ph, _, _ = self.resolve_terms(pq.ast.phrase.terms, dedupe=False)
                specs[qid] = (ph, _kw_terms(pq.ast.keyword.terms, queries[qid]))
        if self.scorer == "ql":
            return _wand.ql_topk_many(
                self.spark, self.index,
                {qid: kw for qid, (_, kw) in specs.items()}, k=k,
                n_term_buckets=self.n_buckets,
            )
        if self.fielded_index is not None:
            # the fielded invariant holds for batches too: a fielded
            # executor never silently ranks unfielded — every query in the
            # batch scores zone-weighted off the packed fielded index
            from .fields import fielded_batch_topk

            return fielded_batch_topk(
                self.spark, self.fielded_index, specs, k=k,
                n_term_buckets=self.n_buckets,
            )
        return _wand.batch_topk(
            self.spark, self.index, specs, k=k,
            n_term_buckets=self.n_buckets,
        )

    def _run_once(self, pq: Q.ParsedQuery, k: int) -> list:
        if self.fielded_index is not None and self.scorer == "bm25":
            # EVERY ranked query type gets zone weights — the reference's
            # DocumentRanker.weightDocument iterates ContentType for
            # keyword, phrase, Mixed, and PRF results alike
            # (ref: DocumentRanker.java:138-167, ContentType.java:6-9).
            # Boolean/LinkTo are unranked (recency-ordered, score NULL), so
            # they fall through to the plain doc-set plans by design.
            from .fields import (
                fielded_mixed_topk,
                fielded_phrase_topk,
                fielded_wand_topk,
            )

            if isinstance(pq.ast, Q.Keyword):
                if pq.prf > 0:
                    rows = self._fielded_prf(pq, k)
                    if rows is not None:
                        return rows
                else:
                    exact, prefixes, _ = self.resolve_terms(pq.ast.terms)
                    expanded = self._expand_prefixes(prefixes)
                    # expanded is None only for a prefix query past the
                    # vocab cache (no dictionary to expand against): the
                    # query then falls through to the plain packed/
                    # long-table plan, i.e. UNFIELDED ranking — zone
                    # weights need enumerable prefix expansions
                    if expanded is not None:
                        return fielded_wand_topk(
                            self.spark, self.fielded_index, exact + expanded,
                            k=k, n_term_buckets=self.n_buckets,
                        ).collect()
            if pq.prf == 0 and isinstance(pq.ast, Q.Phrase):
                terms, _, _ = self.resolve_terms(pq.ast.terms, dedupe=False)
                return fielded_phrase_topk(
                    self.spark, self.fielded_index, terms, k=k,
                    n_term_buckets=self.n_buckets,
                ).collect()
            if pq.prf == 0 and isinstance(pq.ast, Q.Mixed):
                ph_terms, _, _ = self.resolve_terms(
                    pq.ast.phrase.terms, dedupe=False
                )
                exact, prefixes, _ = self.resolve_terms(pq.ast.keyword.terms)
                expanded = self._expand_prefixes(prefixes)
                if ph_terms and expanded is not None:
                    return fielded_mixed_topk(
                        self.spark, self.fielded_index, ph_terms,
                        exact + expanded, k=k, n_term_buckets=self.n_buckets,
                    ).collect()
        if self.use_packed and self.scorer == "ql":
            # QL/JM keyword queries serve off the packed index too (VERDICT
            # r4 #8): dl rides in dls_vb, cf arrives broadcast like idf
            from . import wand as _wand

            if pq.prf == 0 and isinstance(pq.ast, Q.Keyword):
                exact, prefixes, _ = self.resolve_terms(pq.ast.terms)
                expanded = self._expand_prefixes(prefixes)
                if expanded is not None:
                    return _wand.ql_topk(
                        self.spark, self.index, exact + expanded, k=k,
                        n_term_buckets=self.n_buckets,
                    ).collect()
        if self.use_packed and self.scorer == "bm25":
            from . import wand as _wand

            if pq.prf > 0 and isinstance(pq.ast, Q.Keyword):
                rows = self._packed_prf(pq, k)
                if rows is not None:
                    return rows
            if pq.prf == 0 and isinstance(pq.ast, Q.Keyword):
                exact, prefixes, _ = self.resolve_terms(pq.ast.terms)
                expanded = self._expand_prefixes(prefixes)
                if expanded is not None:
                    return _wand.wand_topk(
                        self.spark, self.index, exact + expanded, k=k,
                        n_term_buckets=self.n_buckets,
                    ).collect()
            if pq.prf == 0 and isinstance(pq.ast, Q.Phrase):
                terms, _, _ = self.resolve_terms(pq.ast.terms, dedupe=False)
                return _wand.phrase_topk(
                    self.spark, self.index, terms, k=k,
                    n_term_buckets=self.n_buckets,
                ).collect()
            if pq.prf == 0 and isinstance(pq.ast, Q.Mixed):
                ph_terms, _, _ = self.resolve_terms(
                    pq.ast.phrase.terms, dedupe=False
                )
                exact, prefixes, _ = self.resolve_terms(pq.ast.keyword.terms)
                expanded = self._expand_prefixes(prefixes)
                if ph_terms and expanded is not None:
                    return _wand.mixed_topk(
                        self.spark, self.index, ph_terms, exact + expanded,
                        k=k, n_term_buckets=self.n_buckets,
                    ).collect()
            if pq.prf == 0 and isinstance(pq.ast, Q.Boolean):
                spec = self._packed_bool_spec(pq.ast)
                if spec is not None:
                    return _wand.boolean_docs(
                        self.spark, self.index, spec, k=k,
                        n_term_buckets=self.n_buckets,
                    ).collect()
        if Q.is_unranked(pq.ast):
            docs = self._doc_set(pq.ast)
            return (
                docs.withColumn("score", F.lit(None).cast("double"))
                .orderBy(F.col("doc_id").desc())
                .limit(k)
                .collect()
            )
        matches = self._matches(pq.ast)
        scored = scoring.top_k(self._score(matches), k)
        if pq.prf > 0:
            top = scored.collect()
            prf_terms = self._prf_terms(pq, top, pq.prf)
            if prf_terms:
                pq.prf_terms = prf_terms
                all_matches = matches.withColumn("weight", F.lit(1.0)).unionByName(
                    self._postings_for_terms(prf_terms, with_positions=False)
                    .withColumn("weight", F.lit(scoring.PRF_WEIGHT))
                )
                scored = scoring.top_k(
                    self._score(all_matches, weight_col="weight", extra_terms=prf_terms),
                    k,
                )
            else:
                return top
        return scored.collect()

    def _packed_prf(self, pq: Q.ParsedQuery, k: int) -> list | None:
        """Two-pass pseudo-relevance feedback entirely off the packed index:
        pass-1 is block-max WAND, expansion terms come from the generated
        snippets (identical driver-side machinery as the DataFrame path),
        pass-2 is WAND again with expansion terms down-weighted to 0.25 —
        the weight folds into idf because BM25 contributions are linear in it
        (ref: DocumentRanker.java:175-185 weights PRF terms the same way).
        Returns None when a prefix can't be dictionary-expanded — the caller
        falls back to the long-table plan."""
        from . import wand as _wand

        exact, prefixes, _ = self.resolve_terms(pq.ast.terms)
        expanded = self._expand_prefixes(prefixes)
        if expanded is None:
            return None
        base = exact + expanded
        top = _wand.wand_topk(
            self.spark, self.index, base, k=k, n_term_buckets=self.n_buckets
        ).collect()
        prf_terms = self._prf_terms(pq, top, pq.prf)
        if not prf_terms:
            return top
        pq.prf_terms = prf_terms
        # _prf_terms filters against the RAW query tokens, so an expansion
        # term can coincide with a CORRECTED base term; the long-table plan
        # then scores it at weight 1.0 + 0.25 (both unioned posting sets) —
        # mirror that exactly
        base_set = set(base)
        weights = {
            t: (1.0 + scoring.PRF_WEIGHT) if t in base_set else scoring.PRF_WEIGHT
            for t in prf_terms
        }
        all_terms = base + [t for t in prf_terms if t not in base_set]
        return _wand.wand_topk(
            self.spark, self.index, all_terms, k=k,
            n_term_buckets=self.n_buckets, weights=weights,
        ).collect()

    def _fielded_prf(self, pq: Q.ParsedQuery, k: int) -> list | None:
        """Two-pass PRF with zone weights on BOTH passes (the reference
        weights PRF results by ContentType like any other ranked result —
        DocumentRanker.java:138-167): pass 1 is fielded block-max WAND,
        expansion terms come from the generated snippets (shared driver-side
        machinery), pass 2 folds the 0.25 expansion weight into the
        broadcast idf ON TOP of w_f. Returns None when a prefix can't be
        dictionary-expanded (caller falls back to unfielded plans)."""
        from .fields import fielded_wand_topk

        exact, prefixes, _ = self.resolve_terms(pq.ast.terms)
        expanded = self._expand_prefixes(prefixes)
        if expanded is None:
            return None
        base = exact + expanded
        top = fielded_wand_topk(
            self.spark, self.fielded_index, base, k=k,
            n_term_buckets=self.n_buckets,
        ).collect()
        prf_terms = self._prf_terms(pq, top, pq.prf)
        if not prf_terms:
            return top
        pq.prf_terms = prf_terms
        # same weight convention as _packed_prf: an expansion term that
        # coincides with a base term scores at 1.0 + 0.25 (the long-table
        # plan unions both posting sets)
        base_set = set(base)
        weights = {
            t: (1.0 + scoring.PRF_WEIGHT) if t in base_set else scoring.PRF_WEIGHT
            for t in prf_terms
        }
        all_terms = base + [t for t in prf_terms if t not in base_set]
        return fielded_wand_topk(
            self.spark, self.fielded_index, all_terms, k=k,
            n_term_buckets=self.n_buckets, term_weights=weights,
        ).collect()

    def _expand_prefixes(self, prefixes: list[str]) -> list[str] | None:
        """Resolve prefix terms against the cached dictionary. [] when there
        are none; None when expansion isn't possible (no cached vocab or an
        explosive prefix) — caller falls back to the range-scan plan."""
        if not prefixes:
            return []
        vocab = self._get_vocab()
        if vocab is None:
            return None
        out: list[str] = []
        for p in prefixes:
            matching = sorted(t for t in vocab if t.startswith(p))
            if len(matching) > self.PREFIX_EXPAND_MAX:
                return None
            out.extend(matching)
        return out

    def _packed_bool_spec(self, ast):
        """Boolean AST -> nested spec for wand.boolean_docs, or None when a
        leaf isn't a plain keyword bag (prefix/phrase/LinkTo fall back to the
        DataFrame doc-set plans)."""
        if isinstance(ast, Q.Keyword):
            exact, prefixes, _ = self.resolve_terms(ast.terms)
            if prefixes:
                return None
            return ("terms", exact)
        if isinstance(ast, Q.Boolean):
            left = self._packed_bool_spec(ast.left)
            right = self._packed_bool_spec(ast.right)
            if left is None or right is None:
                return None
            return (ast.op.lower(), left, right)
        return None

    def _prf_terms(self, pq: Q.ParsedQuery, top_rows: list, depth: int) -> list[str]:
        """Pseudo-relevance feedback: most frequent new tokens of the
        GENERATED SNIPPETS of the top-N docs, concatenated in rank order
        (ref: QueryProcessor.java:427-438 — extendPrfQuery feeds each top
        document through snippetGenerator.generate and tokenizes the joined
        snippets, NOT the full contents). Driver-side: N docs, k snippets.

        Tie-break: (-count, term) — the reference's HashMap + comparator
        ordering is JVM-iteration-dependent, so the rebuild pins the
        deterministic choice (highest count first, then term ASC; the
        reference's MapValueComparator.natural() ascending sort appears to be
        a bug against its own 'most frequent' docstring).

        Second deliberate deviation (filter order): base query terms are
        removed BEFORE taking the top-10 expansion tokens, so the expansion
        is always 10 NEW terms when available. The reference
        (QueryProcessor.extendPrfQuery) limits first and filters after,
        expanding by fewer than 10 whenever query terms rank in the snippet
        top-10 (the common case). The DuckDB oracle (prf_search) encodes the
        filter-then-limit choice — keep both sides in sync if changing."""
        if self.source_df is None:
            return []
        top_ids = [r["doc_id"] for r in top_rows[:depth]]
        if not top_ids:
            return []
        from .snippets import generate_snippet

        contents = {
            r["doc_id"]: r["content"]
            for r in self.source_df.filter(F.col("doc_id").isin(top_ids))
            .select("doc_id", "content").collect()
        }
        base = set(Q.collect_terms(pq.ast))
        query_terms = sorted(
            {self._corrections.get(t, t) for t in base if not t.endswith("*")}
        )
        concatenated = " ".join(
            generate_snippet(
                contents.get(doc_id, ""), query_terms, do_stem=self.index.do_stem
            )
            for doc_id in top_ids
        )
        _, pairs = tokenize_text(concatenated, do_stem=self.index.do_stem)
        counter: Counter[str] = Counter(t for t, _ in pairs)
        ranked = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
        return [t for t, _ in ranked if t not in base][:PRF_MOST_FREQUENT_TOKENS]
