"""PySpark wrappers for graft's LLM-data-pipeline operators.

Thin py4j shims over the Scala ``graft.ops`` objects — every operator
stays pure Catalyst dataflow on the JVM; Python passes DataFrames and
scalars and gets DataFrames back, so results, plans, and scale posture
are identical to the Scala API. Scala default arguments are not visible
through py4j, so each wrapper passes the full argument list with the
same defaults as the Scala side (asserted by the smoke test).

Covered here: the dedup family (exact keepers, MinHash near-dup +
transitive groups, leakage-safe splits, incremental ingest verdicts),
quality filtering (Gopher rule table, trainable logistic-regression
scoring), selection (hash sampling, deterministic splits, exact
top-fraction by score, exact rank bucketing, CCNet perplexity buckets,
per-domain caps), decontamination, and corpus cleaning/audit (frequent
n-grams, cross-doc boilerplate cut). For clustering estimators see
``graft.clustering``; for streaming k-means see ``graft.streaming``.
"""

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame

__all__ = [
    "exact_keepers",
    "minhash_dedup",
    "near_dup_groups",
    "leakage_safe_split",
    "ingest_verdict",
    "gopher_rules",
    "split_by_hash",
    "hash_sample",
    "select_top_by_score",
    "decontaminate",
    "frequent_ngrams",
    "boilerplate_cut",
    "perplexity_buckets",
    "bucket_by_score",
    "cap_per_domain",
    "logistic_fit",
    "logistic_score",
    "hard_negatives",
    "brute_force_top_k",
    "IvfIndexHandle",
    "IvfPqIndexHandle",
    "temperature_plan",
    "top_per_domain",
    "domain_quota",
    "rate_limit",
    "asof_join",
    "snapshot_diff",
    "snapshot_diff_stats",
    "collocations",
    "asof_lookup",
    "time_split",
    "sessionize_native",
    "range_join",
    "fill_forward",
    "prototypicality",
    "prune_prototypes",
    "pca_covariance",
    "fill_interpolate",
    "chunk_passages",
    "calibration",
    "assets_from_documents",
    "exact_binary_dedup",
    "orphan_refs",
    "extract_features",
    "jaccard_join",
    "jaccard_join_ab",
    "cms_build",
    "cms_estimate",
    "cms_heavy_hitters",
    "cms_heavy_hitters_exact",
    "cms_local_top_candidates",
    "cms_top_k_exact",
    "cms_build_grouped",
    "cms_merge_grouped",
    "cms_estimate_grouped",
    "CmsSketchHandle",
    "GroupedCmsSketchHandle",
    "GroupedHllSketchHandle",
    "hll_build",
    "hll_build_grouped",
    "hll_merge",
    "hll_estimate",
    "hll_estimate_grouped",
    "hll_estimate_grouped_stats",
    "hll_intersect_estimate_grouped_stats",
    "HllSketchHandle",
    "hll_union_estimate",
    "hll_intersect_estimate",
    "hll_union_estimate_grouped",
    "hll_intersect_estimate_grouped",
    "bloom_build",
    "bloom_build_grouped",
    "bloom_merge",
    "bloom_merge_grouped",
    "bloom_might_contain",
    "bloom_might_contain_grouped",
    "bloom_fill_ratio",
    "bloom_fill_ratio_grouped",
    "BloomSketchHandle",
    "GroupedBloomSketchHandle",
    "stream_bloom_windowed_words",
    "stream_bloom_from_window_words",
    "stream_hll_windowed_registers",
    "stream_hll_from_window_registers",
    "stream_cms_windowed_cells",
    "stream_cms_from_window_cells",
    "quantiles_exact_pct",
    "quantiles_exact_pct_double",
    "quantiles_exact_pct_weighted",
    "quantiles_at_ranks",
    "quantiles_exact_pct_by_group",
    "quantiles_exact_pct_by_group_double",
    "percentile_filter",
    "percentile_filter_double",
    "QuantileSketchHandle",
    "dedup_chunks_within",
    "corpus_drift",
    "bloom_size_for",
    "bloom_size_for_corpus",
    "SemDedupIndexHandle",
]


def _jvm(df: DataFrame):
    return df.sparkSession.sparkContext._jvm


def _wrap(df: DataFrame, jdf) -> DataFrame:
    return DataFrame(jdf, df.sparkSession)


def _to_seq(df: DataFrame, values: List):
    return _jvm(df).org.apache.spark.api.python.PythonUtils.toSeq(values)


def _to_seq_session(spark, values: List):
    """``_to_seq`` for call sites holding a SparkSession, not a frame
    (sketch-handle methods)."""
    return spark.sparkContext._jvm.org.apache.spark.api.python.PythonUtils.toSeq(
        values)


def exact_keepers(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Rows surviving exact dedup: the min-id row per distinct content."""
    return _wrap(df, _jvm(df).graft.ops.Dedup.exactKeepers(df._jdf, id_col, content_col))


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    shingle_size: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, jaccard): banded MinHash LSH
    candidates confirmed with exact word-shingle Jaccard >= threshold.
    Returned frame is persisted; call ``.unpersist()`` when done."""
    return _wrap(df, _jvm(df).graft.ops.Dedup.minhashDedup(
        df._jdf, id_col, text_col, float(threshold), shingle_size, num_hashes, bands))


def near_dup_groups(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Transitive dedup groups (comp, keeper_id, group_size) from pairs."""
    return _wrap(pairs, _jvm(pairs).graft.ops.Dedup.nearDupGroups(pairs._jdf, a_col, b_col))


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    labels: List[str],
    weights: List[float],
    threshold: float = 0.7,
    salt: str = "graft",
) -> DataFrame:
    """Train/val/test split where every near-dup group lands in ONE split
    (split key = dedup-group representative). Returns (doc_id, group_key,
    split)."""
    return _wrap(df, _jvm(df).graft.ops.Dedup.leakageSafeSplit(
        df._jdf, id_col, text_col, _to_seq(df, list(labels)),
        _to_seq(df, [float(w) for w in weights]), float(threshold), salt))


def ingest_verdict(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    shingle_size: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Incremental ingest dedup: per batch doc, the best near-dup match
    among the existing corpus and smaller-id batch docs — (doc_id,
    dup_of, jaccard_micro, n_dup_matches); dup_of null = novel. Work is
    proportional to the batch (see the Scala scaladoc for the persisted
    signature-store variant)."""
    jvm = _jvm(batch)
    none = jvm.scala.Option.apply(None)
    return _wrap(batch, jvm.graft.ops.IncrementalDedup.ingestVerdict(
        corpus._jdf, batch._jdf, id_col, text_col, float(threshold),
        shingle_size, num_hashes, bands, none))


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100000,
    min_mean_len: int = 3,
    max_mean_len: int = 10,
    max_symbols_per10: int = 1,
    min_alpha_per10: int = 8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher A.1.1 quality rule table: named boolean flags + ``keep``,
    every threshold an integer cross-multiplication."""
    return _wrap(df, _jvm(df).graft.ops.TextOps.gopherRules(
        df._jdf, id_col, text_col, min_words, max_words, min_mean_len,
        max_mean_len, max_symbols_per10, min_alpha_per10, min_stop_hits))


def assets_from_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Multimodal asset table from the documents table: (asset_id,
    modality, payload: binary, meta struct)."""
    return _wrap(df, _jvm(df).graft.ops.Multimodal.assetsFromDocuments(
        df._jdf, id_col, text_col))


def exact_binary_dedup(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Exact binary dedup over the payload md5: (fp, keeper_id, dup_count)."""
    return _wrap(df, _jvm(df).graft.ops.Multimodal.exactBinaryDedup(
        df._jdf, id_col, payload_col))


def orphan_refs(
    refs: DataFrame, ref_col: str, assets: DataFrame, asset_id_col: str
) -> DataFrame:
    """Rows of ``refs`` whose ``ref_col`` matches no asset (left anti)."""
    return _wrap(refs, _jvm(refs).graft.ops.Multimodal.orphanRefs(
        refs._jdf, ref_col, assets._jdf, asset_id_col))


def extract_features(
    df: DataFrame,
    payload_col: str,
    feat_col: str,
    target_dim: int = 16,
    meta_col: Optional[str] = None,
) -> DataFrame:
    """Per-row feature extraction from a binary payload column: real
    javax image/audio decode when ``meta_col`` carries a known format,
    the deterministic stub otherwise."""
    jvm = _jvm(df)
    opt = jvm.scala.Option.apply(meta_col)
    return _wrap(df, jvm.graft.ops.Multimodal.extractFeatures(
        df._jdf, payload_col, feat_col, int(target_dim), opt))


def calibration(
    scored: DataFrame,
    id_col: str,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Classifier calibration: exact equal-rank score buckets (no global
    sort) vs a binary label — (bucket, n, n_pos, pos_rate_micro,
    min_score, max_score); monotone-falling rates mean the score ranks
    the label."""
    return _wrap(scored, _jvm(scored).graft.ops.Classify.calibration(
        scored._jdf, id_col, score_col, label_col, int(n_buckets)))


def chunk_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int,
    stride_tokens: int,
) -> DataFrame:
    """Sliding-window passage chunking (RAG indexing / long-doc prep):
    (id, passage_id, start_tok, n_tok, passage) with overlap
    window - stride; one explode, zero shuffles."""
    return _wrap(df, _jvm(df).graft.ops.TextOps.chunkPassages(
        df._jdf, id_col, text_col, int(window_tokens), int(stride_tokens)))


def split_by_hash(
    df: DataFrame,
    id_col: str,
    labels: List[str],
    weights: List[float],
    salt: str = "graft",
) -> DataFrame:
    """Deterministic keyed split: adds a ``split`` column from the
    portable md5 hash of the id — stable across runs and partitionings."""
    return _wrap(df, _jvm(df).graft.ops.TextOps.splitByHash(
        df._jdf, id_col, _to_seq(df, list(labels)),
        _to_seq(df, [float(w) for w in weights]), salt))


def hash_sample(df: DataFrame, key_col: str, fraction: float, seed: str) -> DataFrame:
    """Deterministic Bernoulli sample by keyed portable hash — unlike
    ``df.sample``, reproducible across runs, partitionings, retries."""
    return _wrap(df, _jvm(df).graft.ops.Sampling.hashSample(
        df._jdf, key_col, float(fraction), seed))


def select_top_by_score(
    df: DataFrame, id_col: str, score_col: str, fraction: float
) -> DataFrame:
    """Exact top-fraction selection by an integer score — (score desc,
    id asc) order contract — without a global sort or single-partition
    window. Returned frame is persisted; ``.unpersist()`` when done."""
    return _wrap(df, _jvm(df).graft.ops.Sampling.selectTopByScore(
        df._jdf, id_col, score_col, float(fraction)))


def decontaminate(
    train: DataFrame,
    train_id_col: str,
    train_text_col: str,
    eval_docs: DataFrame,
    eval_text_col: str,
    n: int = 8,
    min_hits: int = 1,
    hash_shingles: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    n-gram with the eval set (eval side broadcast; the corpus side is
    one scan plus map-side aggregation)."""
    return _wrap(train, _jvm(train).graft.ops.Curate.decontaminate(
        train._jdf, train_id_col, train_text_col, eval_docs._jdf,
        eval_text_col, n, min_hits, hash_shingles))


def frequent_ngrams(df: DataFrame, text_col: str, n: int = 5, k: int = 100) -> DataFrame:
    """Corpus boilerplate audit: top-k word n-grams by occurrence count
    (within-doc repeats included), deterministic (cnt desc, ngram asc)."""
    return _wrap(df, _jvm(df).graft.ops.TextOps.frequentNgrams(df._jdf, text_col, n, k))


def boilerplate_cut(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_df: int = 10,
    hash_windows: bool = True,
) -> DataFrame:
    """Cross-document boilerplate removal (RefinedWeb line-dedup
    analogue): n-token windows appearing in >= min_df DISTINCT docs are
    merged into maximal spans and cut from every doc. Returns (doc_id,
    n_tokens, boiler_tokens, boiler_frac, clean_text)."""
    return _wrap(df, _jvm(df).graft.ops.Dedup.boilerplateCut(
        df._jdf, id_col, text_col, n, min_df, hash_windows))


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: List[int] = (1, 1, 1),
    labels: List[str] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style head/middle/tail split by the corpus's own bigram
    fluency score (integer micro-units). Returns (doc_id, score_micro,
    bucket); returned frame is persisted — ``.unpersist()`` when done."""
    return _wrap(df, _jvm(df).graft.ops.Curate.perplexityBuckets(
        df._jdf, id_col, text_col, _to_seq(df, [int(w) for w in weights]),
        _to_seq(df, list(labels))))


def bucket_by_score(
    df: DataFrame,
    id_col: str,
    score_col: str,
    weights: List[int],
    labels: List[str],
) -> DataFrame:
    """Exact global-rank bucketing by an integer score (score desc, id
    asc), integer-weight boundaries, no global sort. Returns (id, score,
    bucket); returned frame is persisted — ``.unpersist()`` when done."""
    return _wrap(df, _jvm(df).graft.ops.Sampling.bucketByScore(
        df._jdf, id_col, score_col, _to_seq(df, [int(w) for w in weights]),
        _to_seq(df, list(labels))))


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    max_docs: int,
    seed: str,
) -> DataFrame:
    """Keep at most max_docs docs per domain, chosen by seeded portable
    hash order — deterministic across runs, partitionings, engines.
    Returns the input columns plus ``rk`` (1-based keep rank)."""
    return _wrap(df, _jvm(df).graft.ops.Sampling.capPerDomain(
        df._jdf, domain_col, id_col, int(max_docs), seed))


def logistic_fit(
    labeled: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    buckets: int = 4096,
    iters: int = 5,
    lr: float = 0.5,
) -> DataFrame:
    """Binary LR quality classifier on portable-md5-hashed bag-of-words,
    trained by full-batch GD as pure dataflow. label_col must be numeric
    0/1. Returns (bucket, weight), bucket -1 the intercept."""
    return _wrap(labeled, _jvm(labeled).graft.ops.Classify.logisticFit(
        labeled._jdf, id_col, text_col, label_col, buckets, iters, float(lr)))


def logistic_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    buckets: int = 4096,
) -> DataFrame:
    """Apply a ``logistic_fit`` model: per-doc sigmoid score in one
    scan-shaped pass. Returns (doc_id, score)."""
    return _wrap(docs, _jvm(docs).graft.ops.Classify.logisticScore(
        docs._jdf, id_col, text_col, weights._jdf, buckets))


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
) -> DataFrame:
    """DPR-style hard-negative mining: per query vector, the top-k most
    similar corpus vectors with a DIFFERENT label. Returns (query_id,
    rank, corpus_id, neg_label, cosine)."""
    return _wrap(corpus, _jvm(corpus).graft.ops.Similarity.hardNegatives(
        corpus._jdf, queries._jdf, id_col, vec_col, label_col, k))


def brute_force_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query vector — the ANN baseline (map-side
    WindowGroupLimit partial top-k, never a global sort). Returns
    (query_id, rank, corpus_id, cosine)."""
    return _wrap(corpus, _jvm(corpus).graft.ops.Similarity.bruteForceTopK(
        corpus._jdf, queries._jdf, id_col, vec_col, int(k),
        bool(exclude_self)))


class IvfIndexHandle:
    """Materialized IVF (inverted-file) ANN index (wraps the JVM
    ``graft.ops.IvfIndex``): the corpus->cell assignment is built once
    (trained or caller-supplied coarse quantizer) and persisted
    PARTITIONED BY cell, so a search of ``n_probe`` cells is a
    partition-pruned scan reading n_probe/n_cells of the corpus.
    ``append`` ingests new batches against the frozen quantizer;
    ``health`` audits the drift; ``retrain`` rebuilds the quantizer on
    the stored corpus in place (stage-and-swap).

    Streaming from Python: the JVM-side ``IvfIndex.ingestStream``
    (marker-gated cell-partition appends per micro-batch) is driven
    from Scala; from Python, call ``append`` per batch inside
    ``foreachBatch`` and gate replays on your own batch-id marker, or
    run ``compact`` at maintenance cadence to drop crash-window
    duplicate rows."""

    def __init__(self, jindex, spark):
        self._j = jindex
        self._spark = spark

    @staticmethod
    def build(
        corpus: DataFrame, id_col: str, vec_col: str, n_cells: int,
        max_iter: int = 5, seed: int = 42,
    ) -> "IvfIndexHandle":
        j = _jvm(corpus).graft.ops.IvfIndex.build(
            corpus._jdf, id_col, vec_col, int(n_cells), int(max_iter),
            int(seed))
        return IvfIndexHandle(j, corpus.sparkSession)

    @staticmethod
    def build_with_centers(
        corpus: DataFrame, id_col: str, vec_col: str, centers: DataFrame,
    ) -> "IvfIndexHandle":
        """Caller-supplied coarse quantizer (a k-row (cluster 0..k-1, cv
        array<double>) frame — the SemDedupIndexHandle.build convention);
        the fully deterministic form, cell i = row i."""
        j = _jvm(corpus).graft.ops.IvfIndex.buildWithCentersDf(
            corpus._jdf, id_col, vec_col, centers._jdf)
        return IvfIndexHandle(j, corpus.sparkSession)

    @staticmethod
    def load(spark, path: str) -> "IvfIndexHandle":
        jvm = spark.sparkContext._jvm
        return IvfIndexHandle(
            jvm.graft.ops.IvfIndex.load(spark._jsparkSession, path), spark)

    @staticmethod
    def append(spark, path: str, batch: DataFrame, id_col: str,
               vec_col: str) -> int:
        """Ingest a batch into a WRITTEN index against its frozen
        quantizer — batch-proportional cost; returns rows appended.
        Batch ids must be new (dedup first; that is the pipeline order
        anyway)."""
        jvm = spark.sparkContext._jvm
        return int(jvm.graft.ops.IvfIndex.append(
            spark._jsparkSession, path, batch._jdf, id_col, vec_col))

    @staticmethod
    def retrain(spark, path: str, n_cells: int = 0, max_iter: int = 5,
                seed: int = 42) -> "IvfIndexHandle":
        """Rebuild the coarse quantizer on the CURRENT stored corpus and
        rewrite the index in place (stage-and-swap; n_cells=0 uses the
        recommended ~sqrt(n) sizing ``health`` reports)."""
        jvm = spark.sparkContext._jvm
        return IvfIndexHandle(jvm.graft.ops.IvfIndex.retrain(
            spark._jsparkSession, path, int(n_cells), int(max_iter),
            int(seed)), spark)

    @staticmethod
    def compact(spark, path: str) -> int:
        """Drop duplicate (corpus_id) rows from a WRITTEN index — the
        repair for a crash between a streaming append and its commit
        marker (duplicates are bit-identical; keep-any is exact).
        Whole-store stage-and-swap, maintenance cadence. Returns rows
        removed."""
        jvm = spark.sparkContext._jvm
        return int(jvm.graft.ops.IvfIndex.compact(
            spark._jsparkSession, path))

    @property
    def cells(self) -> DataFrame:
        return DataFrame(self._j.cells(), self._spark)

    def search(self, queries: DataFrame, id_col: str, vec_col: str,
               k: int = 5, n_probe: int = 2,
               exclude_self: bool = True) -> DataFrame:
        """Cell-pruned approximate cosine top-k: (query_id, rank,
        corpus_id, cosine)."""
        return DataFrame(self._j.search(queries._jdf, id_col, vec_col,
            int(k), int(n_probe), bool(exclude_self)), self._spark)

    def health(self) -> DataFrame:
        """(n_vectors, n_cells, max_cell, avg_cell, imbalance,
        recommended_cells) — retrain when recommended_cells is well
        above n_cells or imbalance grows (the frozen-quantizer drift
        audit)."""
        return DataFrame(self._j.health(), self._spark)

    def recall_curve(self, k: int = 10, sample_n: int = 256,
                     seed: int = 42) -> DataFrame:
        """Measured recall@k vs n_probe — (nProbe, recall) for
        n_probe = 1..n_cells, estimated from ONE all-cells pass over a
        seeded sample of stored vectors (cumulative histogram of each
        true neighbor's cell rank). recall(n_cells) = 1 by
        construction. Cost: sample_n x corpus dot products,
        maintenance-cadence."""
        return DataFrame(self._j.recallCurve(int(k), int(sample_n),
            int(seed)), self._spark)

    def probe_for(self, target_recall: float, k: int = 10,
                  sample_n: int = 256, seed: int = 42) -> int:
        """The smallest n_probe whose measured recall@k meets
        ``target_recall`` (always <= n_cells) — the one-call answer to
        "what nProbe do I need for recall >= 0.9?"."""
        return int(self._j.probeFor(float(target_recall), int(k),
            int(sample_n), int(seed)))

    def write(self, path: str) -> None:
        self._j.write(path)

    def unpersist(self) -> None:
        self._j.unpersist()


class IvfPqIndexHandle:
    """IVF-PQ (IVFADC) ANN index (wraps the JVM ``graft.ops.IvfPqIndex``):
    residual product-quantized codes (~30x compression) partitioned by
    coarse cell; ``search`` scores by ADC lookup tables over the probed
    cells only, ``search_rerank`` exact-reranks the top candidates
    against the raw corpus. ``append`` encodes new batches against the
    FROZEN quantizer+codebooks (codes from different codebooks cannot
    share an ADC table); ``health`` audits drift; ``retrain`` rebuilds
    in place FROM THE ORIGINAL CORPUS (stored codes are lossy by
    design — never retrain on reconstructions)."""

    def __init__(self, jindex, spark):
        self._j = jindex
        self._spark = spark

    @staticmethod
    def build(
        corpus: DataFrame, id_col: str, vec_col: str, n_cells: int,
        m: int = 8, ksub: int = 256, max_iter: int = 5,
        sample_size: int = 10000, seed: int = 42, residual: bool = True,
    ) -> "IvfPqIndexHandle":
        j = _jvm(corpus).graft.ops.IvfPqIndex.build(
            corpus._jdf, id_col, vec_col, int(n_cells), int(m), int(ksub),
            int(max_iter), int(sample_size), int(seed), bool(residual))
        return IvfPqIndexHandle(j, corpus.sparkSession)

    @staticmethod
    def load(spark, path: str) -> "IvfPqIndexHandle":
        jvm = spark.sparkContext._jvm
        return IvfPqIndexHandle(
            jvm.graft.ops.IvfPqIndex.load(spark._jsparkSession, path), spark)

    @staticmethod
    def append(spark, path: str, batch: DataFrame, id_col: str,
               vec_col: str) -> int:
        """Encode + append a batch against the written index's frozen
        state — batch-proportional; returns rows appended. Batch ids
        must be new (dedup first)."""
        jvm = spark.sparkContext._jvm
        return int(jvm.graft.ops.IvfPqIndex.append(
            spark._jsparkSession, path, batch._jdf, id_col, vec_col))

    @staticmethod
    def retrain(spark, path: str, corpus: DataFrame, id_col: str,
                vec_col: str, n_cells: int = 0, m: int = 0, ksub: int = 0,
                max_iter: int = 5, sample_size: int = 10000,
                seed: int = 42) -> "IvfPqIndexHandle":
        """Rebuild quantizer + codebooks on the ORIGINAL corpus and swap
        the index in place (n_cells=0 -> the ~sqrt(n) recommendation;
        m/ksub=0 keep the written geometry)."""
        jvm = spark.sparkContext._jvm
        return IvfPqIndexHandle(jvm.graft.ops.IvfPqIndex.retrain(
            spark._jsparkSession, path, corpus._jdf, id_col, vec_col,
            int(n_cells), int(m), int(ksub), int(max_iter),
            int(sample_size), int(seed)), spark)

    @property
    def cells(self) -> DataFrame:
        return DataFrame(self._j.cells(), self._spark)

    def search(self, queries: DataFrame, id_col: str, vec_col: str,
               k: int = 5, n_probe: int = 2,
               exclude_self: bool = True) -> DataFrame:
        """ADC-scored approximate cosine top-k: (query_id, rank,
        corpus_id, adc_cosine)."""
        return DataFrame(self._j.search(queries._jdf, id_col, vec_col,
            int(k), int(n_probe), bool(exclude_self)), self._spark)

    def search_rerank(self, queries: DataFrame, id_col: str, vec_col: str,
                      corpus: DataFrame, k: int = 5, n_probe: int = 2,
                      rerank_k: int = 50,
                      exclude_self: bool = True) -> DataFrame:
        """ADC candidates exact-reranked against the raw corpus:
        (query_id, rank, corpus_id, cosine)."""
        return DataFrame(self._j.searchRerank(queries._jdf, id_col,
            vec_col, corpus._jdf, int(k), int(n_probe), int(rerank_k),
            bool(exclude_self)), self._spark)

    def health(self) -> DataFrame:
        """(n_vectors, n_cells, max_cell, avg_cell, imbalance,
        recommended_cells) — the shared cell-population drift audit."""
        return DataFrame(self._j.health(), self._spark)

    @staticmethod
    def compact(spark, path: str) -> int:
        """Drop duplicate (corpus_id) coded rows from a WRITTEN index —
        the repair for a crash between a streaming append and its
        commit marker (codes are bit-identical under the frozen
        encoder; keep-any is exact). Whole-store stage-and-swap,
        maintenance cadence. Returns rows removed."""
        jvm = spark.sparkContext._jvm
        return int(jvm.graft.ops.IvfPqIndex.compact(
            spark._jsparkSession, path))

    def recall_curve(self, corpus: DataFrame, id_col: str, vec_col: str,
                     k: int = 10, n_probes: Optional[List[int]] = None,
                     rerank_k: int = 50, sample_n: int = 256,
                     seed: int = 42) -> DataFrame:
        """Measured recall@k vs n_probe for the search_rerank path
        against exact brute force on a seeded corpus sample — DIRECT
        measurement (unlike the IVF-flat one-pass curve: ADC ordering
        can drop a true neighbor inside a probed cell, so candidacy
        does not imply retrieval). (nProbe, recall) rows."""
        return DataFrame(self._j.recallCurve(corpus._jdf, id_col,
            vec_col, int(k),
            _to_seq(corpus, [int(p) for p in (n_probes or [1, 2, 4, 8])]),
            int(rerank_k), int(sample_n), int(seed)), self._spark)

    def probe_for(self, corpus: DataFrame, id_col: str, vec_col: str,
                  target_recall: float, k: int = 10,
                  n_probes: Optional[List[int]] = None, rerank_k: int = 50,
                  sample_n: int = 256, seed: int = 42) -> int:
        """Smallest of ``n_probes`` meeting ``target_recall``, or -1
        when none does — a -1 means the code budget (rerank_k/m/ksub),
        not the probe width, is the binding constraint."""
        return int(self._j.probeFor(corpus._jdf, id_col, vec_col,
            float(target_recall), int(k),
            _to_seq(corpus, [int(p) for p in (n_probes or [1, 2, 4, 8])]),
            int(rerank_k), int(sample_n), int(seed)))

    def write(self, path: str) -> None:
        self._j.write(path)

    def unpersist(self) -> None:
        self._j.unpersist()


def temperature_plan(
    df: DataFrame,
    domain_col: str,
    weight_col: str,
    temperature: float,
) -> DataFrame:
    """XLM-R/mT5 alpha-sampling plan: target share c_d^(1/tau)/sum,
    realized max-retention (binding domain keeps rate 1.0). weight_col
    names a column carrying each row's weight (e.g. a token count).
    Returns (domain, available, target_weight, rate, planned)."""
    jvm = _jvm(df)
    w = jvm.org.apache.spark.sql.functions.col(weight_col)
    return _wrap(df, jvm.graft.ops.Sampling.temperaturePlan(
        df._jdf, domain_col, w, float(temperature)))


def top_per_domain(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    score_col: str,
    k: int,
) -> DataFrame:
    """Keep the k BEST docs per domain by an integer score (score desc,
    id asc). Returns the input columns plus ``rk``."""
    return _wrap(df, _jvm(df).graft.ops.Sampling.topPerDomain(
        df._jdf, domain_col, id_col, score_col, int(k)))


def domain_quota(
    docs: DataFrame,
    ts_col: str,
    domain_col: str,
    id_col: str,
    max_docs: int,
) -> DataFrame:
    """Lifetime per-domain admission quota (streaming or batch): admit
    at most max_docs docs per domain in (ts, id) order, one long of
    state per domain. Returns (domain, id, ts, rk)."""
    return _wrap(docs, _jvm(docs).graft.streaming.StreamQuota.domainQuota(
        docs._jdf, ts_col, domain_col, id_col, int(max_docs)))


def rate_limit(
    docs: DataFrame,
    ts_col: str,
    domain_col: str,
    id_col: str,
    max_docs: int,
    window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-domain rate limit (streaming or batch): at most
    max_docs per domain per tumbling event-time window, state one long
    per live (domain, window). Returns (domain, id, ts, win_start_s, rk)."""
    return _wrap(docs, _jvm(docs).graft.streaming.StreamQuota.rateLimit(
        docs._jdf, ts_col, domain_col, id_col, int(max_docs),
        int(window_seconds), watermark))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: List[str],
    right_id_col: str,
    tolerance_ms=None,
    strict: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join (union-window form, ONE shuffle on the key):
    each left row picks the latest right row with right.ts <= left.ts
    (< when strict), within tolerance_ms staleness if given. ts_col must
    be integer-comparable (epoch millis as long). Output: the left
    columns plus {prefix}ts and {prefix}<col> for each right_col."""
    # the Ms overload takes a plain long (<= 0 = no tolerance): py4j
    # boxes python ints as Integer, which an Option[Long] cannot unbox
    jvm = _jvm(left)
    tol = 0 if tolerance_ms is None else int(tolerance_ms)
    return _wrap(left, jvm.graft.ops.AsofJoin.asofJoinMs(
        left._jdf, right._jdf, key_col, ts_col, _to_seq(left, right_cols),
        right_id_col, tol, bool(strict), prefix))


def snapshot_diff(
    old_snap: DataFrame,
    new_snap: DataFrame,
    id_col: str,
    content_cols: List[str],
    keep_unchanged: bool = True,
) -> DataFrame:
    """Row-level diff of two snapshots by md5 content digest:
    (id, status in {added, removed, changed, unchanged}, old_md5,
    new_md5). One full-outer join that only carries digests."""
    return _wrap(old_snap, _jvm(old_snap).graft.ops.SnapshotDiff.diff(
        old_snap._jdf, new_snap._jdf, id_col, _to_seq(old_snap, content_cols),
        bool(keep_unchanged)))


def snapshot_diff_stats(
    old_snap: DataFrame,
    new_snap: DataFrame,
    id_col: str,
    content_cols: List[str],
) -> DataFrame:
    """Per-status counts of :func:`snapshot_diff`."""
    return _wrap(old_snap, _jvm(old_snap).graft.ops.SnapshotDiff.diffStats(
        old_snap._jdf, new_snap._jdf, id_col, _to_seq(old_snap, content_cols)))


def collocations(
    docs: DataFrame,
    text_col: str,
    min_count: int = 5,
    k: int = 100,
) -> DataFrame:
    """Top-k adjacent word pairs by count with PMI (Church & Hanks):
    (w1, w2, c2, c_left, c_right, n_pairs, pmi). Returned frame is
    persisted; call ``.unpersist()`` when done."""
    return _wrap(docs, _jvm(docs).graft.ops.TextOps.collocations(
        docs._jdf, text_col, int(min_count), int(k)))


def asof_lookup(
    left: DataFrame,
    snapshots: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    right_id_col: str,
    tolerance_ms=None,
    prefix: str = "asof_",
) -> DataFrame:
    """Stream-safe as-of LOOKUP against a STATIC (dimension-sized,
    driver-capped) snapshot table: zero shuffle, zero state — runs
    identically in batch and streaming queries. Same contract as
    :func:`asof_join` for one value column."""
    tol = 0 if tolerance_ms is None else int(tolerance_ms)
    return _wrap(left, _jvm(left).graft.ops.AsofJoin.asofLookupMs(
        left._jdf, snapshots._jdf, key_col, ts_col, value_col, right_id_col,
        tol, prefix))


def time_split(
    df: DataFrame,
    ts_col: str,
    cutoff: int,
    embargo: int = 0,
) -> DataFrame:
    """Temporal train/embargo/test split: rows at or before cutoff are
    'train', rows in (cutoff, cutoff+embargo] are 'embargo', later rows
    'test'. Adds a ``split`` column; pure projection, stream-safe."""
    return _wrap(df, _jvm(df).graft.ops.Sampling.timeSplit(
        df._jdf, ts_col, int(cutoff), int(embargo)))


def sessionize_native(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap sessionization via Spark's native session_window (batch or
    streaming). Returns (key, startMs, endMs, numEvents, totalValue)."""
    return _wrap(events, _jvm(events).graft.streaming.EventOps.sessionizeNative(
        events._jdf, key_col, ts_col, value_col, gap, watermark))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    width_ms: int,
    prefix: str = "ivl_",
) -> DataFrame:
    """Interval-containment join as a bucketed EQUI-join (never a nested
    loop): each point matches the same-key intervals containing it;
    interval columns ride prefixed. Set width_ms near the typical
    interval span."""
    return _wrap(points, _jvm(points).graft.ops.RangeJoin.rangeJoin(
        points._jdf, intervals._jdf, key_col, ts_col, lo_col, hi_col,
        int(width_ms), prefix))


def fill_forward(
    obs: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: List[str],
    id_col: str,
    step_ms: int,
    tolerance_ms=None,
    prefix: str = "asof_",
) -> DataFrame:
    """Aligned time-grid resampling with last-observation-carried-forward
    per key (one shuffle, grid size conf-capped)."""
    tol = 0 if tolerance_ms is None else int(tolerance_ms)
    return _wrap(obs, _jvm(obs).graft.ops.AsofJoin.fillForwardMs(
        obs._jdf, key_col, ts_col, _to_seq(obs, value_cols), id_col,
        int(step_ms), tol, prefix))


def prototypicality(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centers: DataFrame,
    cluster_col: str = "cluster",
    centroid_col: str = "centroid",
) -> DataFrame:
    """SSL-prototypes scoring (Sorscher et al. 2022): nearest-centroid
    cluster, cosine to centroid, per-cluster rank (1 = most
    prototypical). centers is a k-row frame (cluster 0..k-1, centroid
    array)."""
    return _wrap(df, _jvm(df).graft.ops.Prototypes.prototypicalityDf(
        df._jdf, id_col, vec_col, centers._jdf, cluster_col, centroid_col))


def prune_prototypes(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centers: DataFrame,
    keep_num: int,
    keep_den: int,
    keep_hardest: bool = True,
    cluster_col: str = "cluster",
    centroid_col: str = "centroid",
) -> DataFrame:
    """Keep ceil(n*keep_num/keep_den) rows per cluster — the least
    prototypical (hardest) by default."""
    return _wrap(df, _jvm(df).graft.ops.Prototypes.prunePrototypesDf(
        df._jdf, id_col, vec_col, centers._jdf, cluster_col, centroid_col,
        int(keep_num), int(keep_den), bool(keep_hardest)))


def pca_covariance(df: DataFrame, vec_col: str, in_dim: int) -> DataFrame:
    """The one-pass covariance estimate behind Pca.fit, as a long-form
    (i, j, cov) upper-triangle frame."""
    return _wrap(df, _jvm(df).graft.ops.Pca.covarianceFrame(
        df._jdf, vec_col, int(in_dim)))


def fill_interpolate(
    obs: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    step_ms: int,
) -> DataFrame:
    """Aligned time-grid resampling with LINEAR INTERPOLATION between the
    neighboring observations (fill_forward's interpolating sibling; both
    window directions ride one exchange). Returns (key, ts, prev_ts,
    next_ts, value)."""
    return _wrap(obs, _jvm(obs).graft.ops.AsofJoin.fillInterpolate(
        obs._jdf, key_col, ts_col, value_col, id_col, int(step_ms)))


def jaccard_join(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold_pct: int = 80,
    shingle_size: int = 3,
) -> DataFrame:
    """EXACT-recall Jaccard self-join via prefix filtering (AllPairs/
    PPJoin): every pair with word-shingle Jaccard >= threshold_pct/100 is
    returned — no probabilistic recall loss (contrast ``minhash_dedup``).
    Refuses pathologically self-similar corpora instead of dropping
    pairs (``graft.setjoin.maxPrefixBucket``). Returns
    (id_a, id_b, jaccard); the frame is persisted — unpersist when done."""
    return _wrap(docs, _jvm(docs).graft.ops.SetSimJoin.jaccardJoin(
        docs._jdf, id_col, text_col, int(threshold_pct), int(shingle_size)))


def jaccard_join_ab(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    threshold_pct: int = 80,
    shingle_size: int = 3,
) -> DataFrame:
    """EXACT-recall CROSS-corpus Jaccard join: every (left doc, right doc)
    pair with word-shingle Jaccard >= threshold_pct/100 — the pairwise
    snapshot-vs-snapshot audit (``corpus_drift`` answers the aggregate
    form). Ids never compare across sides; shingle ranks come from the
    union so both corpora share one global prefix order. Returns
    (id_a, id_b, jaccard) with id_a from left; persisted — unpersist
    when done."""
    return _wrap(left, _jvm(left).graft.ops.SetSimJoin.jaccardJoinAB(
        left._jdf, right._jdf, id_col, text_col,
        int(threshold_pct), int(shingle_size)))


def cms_build(
    items: DataFrame,
    key_col: str,
    depth: int,
    width: int,
    seed: str,
    weight_col: Optional[str] = None,
    portable_hash: bool = True,
) -> DataFrame:
    """Build a count-min sketch over an item frame as a distributed
    (r, bucket, cnt) cell frame — mergeable, shuffle bounded by
    depth*width cells per partition at any corpus size.
    ``portable_hash=False`` switches the md5 oracle-replayable bucket
    scheme for codegen'd xxhash64 — same one-sided guarantees, but only
    ~10% cheaper at corpus scale (the build is scan-bound, not
    hash-bound) and not replayable in external engines."""
    jvm = _jvm(items)
    opt = jvm.scala.Option.apply(weight_col)
    return _wrap(items, jvm.graft.ops.Sketches.build(
        items._jdf, key_col, int(depth), int(width), seed, opt,
        bool(portable_hash)))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int,
    width: int,
    seed: str,
    portable_hash: bool = True,
) -> DataFrame:
    """One-sided frequency estimates (est >= true count, always) for a
    key frame against a ``cms_build`` sketch (same ``portable_hash`` as
    the build). Returns (key, est)."""
    return _wrap(keys, _jvm(keys).graft.ops.Sketches.estimate(
        sketch._jdf, keys._jdf, key_col, int(depth), int(width), seed,
        bool(portable_hash)))


def cms_heavy_hitters(
    items: DataFrame,
    key_col: str,
    depth: int,
    width: int,
    seed: str,
    threshold: int,
    candidates: Optional[DataFrame] = None,
    portable_hash: bool = True,
) -> DataFrame:
    """Keys whose CMS estimate reaches ``threshold`` — guaranteed to
    include every key whose TRUE count reaches it (collisions only add).
    Pass a restricted ``candidates`` frame at extreme key cardinality."""
    jvm = _jvm(items)
    opt = jvm.scala.Option.apply(candidates._jdf if candidates is not None else None)
    return _wrap(items, jvm.graft.ops.Sketches.heavyHitters(
        items._jdf, key_col, int(depth), int(width), seed, int(threshold), opt,
        bool(portable_hash)))


def cms_heavy_hitters_exact(
    items: DataFrame,
    key_col: str,
    depth: int,
    width: int,
    seed: str,
    threshold: int,
    candidates: Optional[DataFrame] = None,
    portable_hash: bool = True,
) -> DataFrame:
    """EXACT heavy hitters — (key, cnt), exactly
    {k : count(k) >= threshold}. With ``candidates=None`` the auto path
    is ONE fused per-partition Misra-Gries scan (counter budget sized
    from threshold so no true-heavy key is lost) plus one confirm scan
    over the candidate keys, and the returned frame comes back
    PERSISTED (the completeness check materializes it) — the CALLER
    OWNS THE RELEASE (``df.unpersist()``), like ``cms_top_k_exact``.
    With an explicit ``candidates`` frame the CMS parameters
    (depth/width/seed) drive a one-sided prefilter that thins the set
    before the confirm, and the result is a lazy frame."""
    jvm = _jvm(items)
    opt = jvm.scala.Option.apply(candidates._jdf if candidates is not None else None)
    return _wrap(items, jvm.graft.ops.Sketches.heavyHittersExact(
        items._jdf, key_col, int(depth), int(width), seed, int(threshold), opt,
        bool(portable_hash)))


def cms_local_top_candidates(
    items: DataFrame,
    key_col: str,
    m: int,
) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (bounded memory, no
    key-space shuffle): any key with global count > N/(m+1) is guaranteed
    present. Feed to ``cms_heavy_hitters`` / ``cms_heavy_hitters_exact``."""
    return _wrap(items, _jvm(items).graft.ops.Sketches.localTopCandidates(
        items._jdf, key_col, int(m)))


def cms_top_k_exact(
    items: DataFrame,
    key_col: str,
    k: int,
    m: int = 0,
) -> DataFrame:
    """EXACT top-k most frequent keys without sorting the key space:
    Misra-Gries candidates, exact counts on candidates only, and a
    completeness check (k-th count > N/(m+1)) that REFUSES rather than
    return a silently-approximate list. Returns (key, cnt, rank)."""
    return _wrap(items, _jvm(items).graft.ops.Sketches.topKExact(
        items._jdf, key_col, int(k), int(m)))


def cms_build_grouped(
    items: DataFrame,
    key_col: str,
    group_cols: List[str],
    depth: int,
    width: int,
    seed: str,
    weight_col: Optional[str] = None,
    portable_hash: bool = True,
) -> DataFrame:
    """One CMS per group in one aggregation: (group..., r, bucket, cnt),
    <= groups x depth*width rows — per-language/per-day frequency
    sketches without a per-group loop. Null groups retained."""
    jvm = _jvm(items)
    return _wrap(items, jvm.graft.ops.Sketches.buildGrouped(
        items._jdf, key_col, _to_seq(items, list(group_cols)), int(depth),
        int(width), seed, jvm.scala.Option.apply(weight_col),
        bool(portable_hash)))


def cms_merge_grouped(
    a: DataFrame, b: DataFrame, group_cols: List[str]
) -> DataFrame:
    """Cell-sum merge per group (same depth/width/seed on both sides)."""
    return _wrap(a, _jvm(a).graft.ops.Sketches.mergeGrouped(
        a._jdf, b._jdf, _to_seq(a, list(group_cols))))


def cms_estimate_grouped(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: List[str],
    depth: int,
    width: int,
    seed: str,
    portable_hash: bool = True,
) -> DataFrame:
    """One-sided point estimates per (group, key) pair against THAT
    group's sketch (null-safe group join; a group with no sketch
    estimates 0). Returns (group..., key, est)."""
    return _wrap(keys, _jvm(keys).graft.ops.Sketches.estimateGrouped(
        sketch._jdf, keys._jdf, key_col, _to_seq(keys, list(group_cols)),
        int(depth), int(width), seed, bool(portable_hash)))


class CmsSketchHandle:
    """Geometry-safe count-min sketch handle (wraps the JVM
    ``graft.ops.CmsSketch``): the cell frame travels WITH the
    (depth, width, seed, hash-mode) geometry, so probes can never
    desynchronize from the build, merge refuses mismatched geometries,
    and write/read persists the cells with a validated content digest
    (a corrupted payload refuses instead of under-estimating)."""

    def __init__(self, jsketch, spark):
        self._j = jsketch
        self._spark = spark

    @staticmethod
    def build(
        items: DataFrame,
        key_col: str,
        depth: int,
        width: int,
        seed: str,
        weight_col: Optional[str] = None,
        portable_hash: bool = True,
    ) -> "CmsSketchHandle":
        jvm = _jvm(items)
        opt = jvm.scala.Option.apply(weight_col)
        j = jvm.graft.ops.CmsSketch.build(
            items._jdf, key_col, int(depth), int(width), seed, opt,
            bool(portable_hash))
        return CmsSketchHandle(j, items.sparkSession)

    @staticmethod
    def read(spark, path: str) -> "CmsSketchHandle":
        jvm = spark.sparkContext._jvm
        return CmsSketchHandle(
            jvm.graft.ops.CmsSketch.read(spark._jsparkSession, path), spark)

    @property
    def cells(self) -> DataFrame:
        return DataFrame(self._j.cells(), self._spark)

    @property
    def depth(self) -> int:
        return self._j.depth()

    @property
    def width(self) -> int:
        return self._j.width()

    @property
    def seed(self) -> str:
        return self._j.seed()

    def estimate(self, keys: DataFrame, key_col: str) -> DataFrame:
        return DataFrame(self._j.estimate(keys._jdf, key_col), self._spark)

    def merge(self, other: "CmsSketchHandle") -> "CmsSketchHandle":
        return CmsSketchHandle(self._j.merge(other._j), self._spark)

    def write(self, path: str) -> None:
        self._spark.sparkContext._jvm.graft.ops.CmsSketch.write(self._j, path)


class GroupedCmsSketchHandle:
    """Geometry-safe PER-GROUP count-min sketch handle (wraps the JVM
    ``graft.ops.GroupedCmsSketch``): one cell grid per stratum; the
    stratification is part of the geometry, merge refuses mismatches,
    persistence validates a canonicalized digest + cell range checks."""

    def __init__(self, jsketch, spark):
        self._j = jsketch
        self._spark = spark

    @staticmethod
    def build(
        items: DataFrame,
        key_col: str,
        group_cols: List[str],
        depth: int,
        width: int,
        seed: str,
        weight_col: Optional[str] = None,
        portable_hash: bool = True,
    ) -> "GroupedCmsSketchHandle":
        jvm = _jvm(items)
        j = jvm.graft.ops.GroupedCmsSketch.build(
            items._jdf, key_col, _to_seq(items, list(group_cols)),
            int(depth), int(width), seed, jvm.scala.Option.apply(weight_col),
            bool(portable_hash))
        return GroupedCmsSketchHandle(j, items.sparkSession)

    @staticmethod
    def read(spark, path: str) -> "GroupedCmsSketchHandle":
        jvm = spark.sparkContext._jvm
        return GroupedCmsSketchHandle(
            jvm.graft.ops.GroupedCmsSketch.read(spark._jsparkSession, path),
            spark)

    @property
    def cells(self) -> DataFrame:
        return DataFrame(self._j.cells(), self._spark)

    @property
    def group_cols(self) -> List[str]:
        gc = self._j.groupCols()
        return [gc.apply(i) for i in range(gc.length())]

    def estimates(self, keys: DataFrame, key_col: str) -> DataFrame:
        return DataFrame(self._j.estimates(keys._jdf, key_col), self._spark)

    def merge(self, other: "GroupedCmsSketchHandle") -> "GroupedCmsSketchHandle":
        return GroupedCmsSketchHandle(self._j.merge(other._j), self._spark)

    def regroup(
        self, names: List[str], exprs: List[str]
    ) -> "GroupedCmsSketchHandle":
        """EXACT re-stratification (cell-sum associativity): equals a
        direct build over the coarser grouping bit for bit."""
        return GroupedCmsSketchHandle(
            self._j.regroupExpr(
                _to_seq_session(self._spark, list(names)),
                _to_seq_session(self._spark, list(exprs))),
            self._spark)

    def to_global(self) -> "CmsSketchHandle":
        return CmsSketchHandle(self._j.toGlobal(), self._spark)

    def write(self, path: str) -> None:
        self._spark.sparkContext._jvm.graft.ops.GroupedCmsSketch.write(
            self._j, path)


def hll_build(
    items: DataFrame,
    key_col: str,
    p: int,
    seed: str,
    portable_hash: bool = True,
) -> DataFrame:
    """Build a HyperLogLog register frame (bucket, maxrank) over an item
    frame: the distinct-count sibling of ``cms_build``. Mergeable by max
    (``hll_merge``), persistable (``HllSketchHandle``), duplicate- and
    shuffle-bounded by 2^p rows per partition at any corpus size.
    ``portable_hash=True`` (default) uses the md5 scheme replayable in
    external engines."""
    return _wrap(items, _jvm(items).graft.ops.Hll.build(
        items._jdf, key_col, int(p), seed, bool(portable_hash)))


def hll_build_grouped(
    items: DataFrame,
    group_cols: List[str],
    key_col: str,
    p: int,
    seed: str,
    portable_hash: bool = True,
) -> DataFrame:
    """Per-group HLL register frames (group..., bucket, maxrank) — at
    most 2^p register rows per group; feed to ``hll_estimate_grouped``."""
    return _wrap(items, _jvm(items).graft.ops.Hll.buildGrouped(
        items._jdf, _to_seq(items, list(group_cols)), key_col, int(p),
        seed, bool(portable_hash)))


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Max-merge two register frames built with IDENTICAL (p, seed,
    hash mode) — per-day/per-shard sketches compose associatively. Use
    ``HllSketchHandle`` for the geometry-checked form."""
    return _wrap(a, _jvm(a).graft.ops.Hll.merge(a._jdf, b._jdf))


def hll_estimate(registers: DataFrame, p: int) -> int:
    """Cardinality estimate from a (non-grouped) register frame:
    raw HLL with the linear-counting crossover; RSE ~= 1.04/sqrt(2^p)."""
    return int(_jvm(registers).graft.ops.Hll.estimate(registers._jdf, int(p)))


def hll_estimate_grouped(
    registers: DataFrame,
    group_cols: List[str],
    p: int,
) -> DataFrame:
    """Per-group cardinality estimates (group..., est) from a
    ``hll_build_grouped`` frame — one aggregation, never a per-group
    collect."""
    return _wrap(registers, _jvm(registers).graft.ops.Hll.estimateGrouped(
        registers._jdf, _to_seq(registers, list(group_cols)), int(p)))


def hll_estimate_grouped_stats(
    registers: DataFrame,
    group_cols: List[str],
    p: int,
) -> DataFrame:
    """``hll_estimate_grouped`` exposing the estimator's SUFFICIENT
    STATISTICS: (group..., touched BIGINT, sumscaled DECIMAL(38,0),
    est DOUBLE). touched and sumscaled (exact scaled register sum) are
    pure integers — the estimate is a fixed function of them — and
    touched/2^p is the sketch's saturation; ``est`` here is the raw
    continuous double (``hll_estimate_grouped`` stays the rounded
    integer surface)."""
    return _wrap(registers, _jvm(registers).graft.ops.Hll.estimateGroupedStats(
        registers._jdf, _to_seq(registers, list(group_cols)), int(p)))


def hll_intersect_estimate_grouped_stats(
    a: DataFrame,
    b: DataFrame,
    group_cols: List[str],
    p: int,
) -> DataFrame:
    """``hll_intersect_estimate_grouped`` exposing the three sketches'
    sufficient statistics: (group..., t_a, t_b, t_u BIGINT, s_a, s_b,
    s_u DECIMAL(38,0), est DOUBLE) — the A/B/union touched counts and
    exact scaled sums, plus the continuous inclusion-exclusion estimate
    clamped at 0."""
    return _wrap(a, _jvm(a).graft.ops.Hll.intersectEstimateGroupedStats(
        a._jdf, b._jdf, _to_seq(a, list(group_cols)), int(p)))


class HllSketchHandle:
    """Geometry-safe HyperLogLog handle (wraps the JVM
    ``graft.ops.HllSketch``): registers travel WITH the (p, seed,
    hash-mode) geometry, merge refuses mismatches, and write/read
    persists the registers with a validated content digest."""

    def __init__(self, jsketch, spark):
        self._j = jsketch
        self._spark = spark

    @staticmethod
    def build(
        items: DataFrame,
        key_col: str,
        p: int,
        seed: str,
        portable_hash: bool = True,
    ) -> "HllSketchHandle":
        j = _jvm(items).graft.ops.HllSketch.build(
            items._jdf, key_col, int(p), seed, bool(portable_hash))
        return HllSketchHandle(j, items.sparkSession)

    @staticmethod
    def read(spark, path: str) -> "HllSketchHandle":
        jvm = spark.sparkContext._jvm
        return HllSketchHandle(
            jvm.graft.ops.HllSketch.read(spark._jsparkSession, path), spark)

    @property
    def registers(self) -> DataFrame:
        return DataFrame(self._j.registers(), self._spark)

    @property
    def p(self) -> int:
        return self._j.p()

    @property
    def seed(self) -> str:
        return self._j.seed()

    def estimate(self) -> int:
        return int(self._j.estimate())

    def merge(self, other: "HllSketchHandle") -> "HllSketchHandle":
        return HllSketchHandle(self._j.merge(other._j), self._spark)

    def write(self, path: str) -> None:
        self._spark.sparkContext._jvm.graft.ops.HllSketch.write(self._j, path)


def hll_union_estimate(a: DataFrame, b: DataFrame, p: int) -> int:
    """|A union B| estimate from two register frames with identical
    geometry — the union sketch is lossless (single-sketch error)."""
    return int(_jvm(a).graft.ops.Hll.unionEstimate(a._jdf, b._jdf, int(p)))


def hll_intersect_estimate(a: DataFrame, b: DataFrame, p: int) -> int:
    """|A intersect B| estimate by inclusion-exclusion. Errors compound
    (~RSE * (|A|+|B|)); small true overlaps of large sets can be noise —
    use the exact paths (jaccard_join_ab, decontaminate) when the answer
    must be tight."""
    return int(_jvm(a).graft.ops.Hll.intersectEstimate(a._jdf, b._jdf, int(p)))


def hll_union_estimate_grouped(
    a: DataFrame,
    b: DataFrame,
    group_cols: List[str],
    p: int,
) -> DataFrame:
    """Per-group |A union B| estimates from two GROUPED register frames
    with identical geometry — one merge + one estimate aggregation,
    groups never collected. Returns (group..., est)."""
    return _wrap(a, _jvm(a).graft.ops.Hll.unionEstimateGrouped(
        a._jdf, b._jdf, _to_seq(a, list(group_cols)), int(p)))


def hll_intersect_estimate_grouped(
    a: DataFrame,
    b: DataFrame,
    group_cols: List[str],
    p: int,
) -> DataFrame:
    """Per-group |A intersect B| estimates by inclusion-exclusion over
    two grouped register frames — one call instead of a per-group loop.
    One-sided groups clamp to 0; null groups are retained. Errors
    compound per group exactly as in ``hll_intersect_estimate``."""
    return _wrap(a, _jvm(a).graft.ops.Hll.intersectEstimateGrouped(
        a._jdf, b._jdf, _to_seq(a, list(group_cols)), int(p)))


class GroupedHllSketchHandle:
    """Geometry-safe PER-GROUP HyperLogLog handle (wraps the JVM
    ``graft.ops.GroupedHllSketch``): one register set per stratum;
    per-group estimates and cross-snapshot overlap in one call, merge
    refuses geometry/stratification drift, persistence validates a
    canonicalized digest + bucket range checks."""

    def __init__(self, jsketch, spark):
        self._j = jsketch
        self._spark = spark

    @staticmethod
    def build(
        items: DataFrame,
        key_col: str,
        group_cols: List[str],
        p: int,
        seed: str,
        portable_hash: bool = True,
    ) -> "GroupedHllSketchHandle":
        j = _jvm(items).graft.ops.GroupedHllSketch.build(
            items._jdf, key_col, _to_seq(items, list(group_cols)), int(p),
            seed, bool(portable_hash))
        return GroupedHllSketchHandle(j, items.sparkSession)

    @staticmethod
    def read(spark, path: str) -> "GroupedHllSketchHandle":
        jvm = spark.sparkContext._jvm
        return GroupedHllSketchHandle(
            jvm.graft.ops.GroupedHllSketch.read(spark._jsparkSession, path),
            spark)

    @property
    def registers(self) -> DataFrame:
        return DataFrame(self._j.registers(), self._spark)

    @property
    def group_cols(self) -> List[str]:
        gc = self._j.groupCols()
        return [gc.apply(i) for i in range(gc.length())]

    @property
    def p(self) -> int:
        return int(self._j.p())

    def estimates(self) -> DataFrame:
        return DataFrame(self._j.estimates(), self._spark)

    def union_estimates(self, other: "GroupedHllSketchHandle") -> DataFrame:
        return DataFrame(self._j.unionEstimates(other._j), self._spark)

    def intersect_estimates(self, other: "GroupedHllSketchHandle") -> DataFrame:
        return DataFrame(self._j.intersectEstimates(other._j), self._spark)

    def merge(self, other: "GroupedHllSketchHandle") -> "GroupedHllSketchHandle":
        return GroupedHllSketchHandle(self._j.merge(other._j), self._spark)

    def regroup(
        self, names: List[str], exprs: List[str]
    ) -> "GroupedHllSketchHandle":
        """EXACT re-stratification (register-max idempotence): equals a
        direct build over the coarser grouping bit for bit."""
        return GroupedHllSketchHandle(
            self._j.regroupExpr(
                _to_seq_session(self._spark, list(names)),
                _to_seq_session(self._spark, list(exprs))),
            self._spark)

    def to_global(self) -> "HllSketchHandle":
        return HllSketchHandle(self._j.toGlobal(), self._spark)

    def write(self, path: str) -> None:
        self._spark.sparkContext._jvm.graft.ops.GroupedHllSketch.write(
            self._j, path)


def bloom_build(
    items: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = 7,
    portable_hash: bool = True,
) -> DataFrame:
    """Build a Bloom membership word frame (w, bits) over a key column:
    the membership sibling of ``cms_build`` / ``hll_build``, <= m/64
    rows at ANY corpus size. Mergeable by bitwise OR (``bloom_merge``),
    persistable (``BloomSketchHandle``), engine-replayable (md5
    Kirsch-Mitzenmacher positions). Size ``num_bits`` from the expected
    TOTAL cardinality across every filter you intend to merge
    (~10 bits/key ~= 0.8% FP at 7 hashes, or ``bloom_size_for``); the
    modulus must be fixed once, it cannot be derived per slice.
    ``portable_hash=False`` swaps md5 for codegen'd xxhash64 positions
    (faster; no external SQL replay) — build and probe must agree."""
    return _wrap(items, _jvm(items).graft.ops.Bloom.build(
        items._jdf, key_col, int(num_bits), int(num_hashes),
        bool(portable_hash)))


def bloom_build_grouped(
    items: DataFrame,
    key_col: str,
    group_cols: List[str],
    num_bits: int,
    num_hashes: int = 7,
    portable_hash: bool = True,
) -> DataFrame:
    """One filter PER GROUP in one aggregation: (group..., w, bits),
    <= groups x m/64 rows, groups never collected."""
    return _wrap(items, _jvm(items).graft.ops.Bloom.buildGrouped(
        items._jdf, key_col, _to_seq(items, list(group_cols)),
        int(num_bits), int(num_hashes), bool(portable_hash)))


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two word frames built with IDENTICAL (num_bits,
    num_hashes) — per-day/per-shard filters compose associatively. Use
    ``BloomSketchHandle`` for the geometry-checked form."""
    return _wrap(a, _jvm(a).graft.ops.Bloom.merge(a._jdf, b._jdf))


def bloom_merge_grouped(
    a: DataFrame, b: DataFrame, group_cols: List[str]
) -> DataFrame:
    """``bloom_merge`` per group over (group..., w, bits) frames."""
    return _wrap(a, _jvm(a).graft.ops.Bloom.mergeGrouped(
        a._jdf, b._jdf, _to_seq(a, list(group_cols))))


def bloom_might_contain(
    words: DataFrame,
    keys: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int,
    portable_hash: bool = True,
) -> DataFrame:
    """Membership verdicts (key, contained) for the DISTINCT non-null
    keys of ``key_col``: false negatives impossible for inserted keys,
    false positives deterministic (the positions are md5-derived).
    Geometry AND hash mode MUST match the build — use
    ``BloomSketchHandle`` to make that structural."""
    return _wrap(keys, _jvm(keys).graft.ops.Bloom.mightContain(
        words._jdf, keys._jdf, key_col, int(num_bits), int(num_hashes),
        bool(portable_hash)))


def bloom_might_contain_grouped(
    words: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: List[str],
    num_bits: int,
    num_hashes: int,
    portable_hash: bool = True,
) -> DataFrame:
    """Per-group membership verdicts (group..., key, contained): each
    distinct (group, key) pair probes ITS group's filter in one
    null-safe join (a NULL group probes the NULL group's filter; a
    group with no filter is False). One call instead of a per-group
    loop."""
    return _wrap(keys, _jvm(keys).graft.ops.Bloom.mightContainGrouped(
        words._jdf, keys._jdf, key_col, _to_seq(keys, list(group_cols)),
        int(num_bits), int(num_hashes), bool(portable_hash)))


def bloom_fill_ratio(words: DataFrame, num_bits: int) -> float:
    """Fraction of set bits; the realized expected FP rate is
    fill_ratio ** num_hashes."""
    return float(_jvm(words).graft.ops.Bloom.fillRatio(
        words._jdf, int(num_bits)))


class BloomSketchHandle:
    """Geometry-safe Bloom filter handle (wraps the JVM
    ``graft.ops.BloomSketch``): the word frame travels WITH the
    (num_bits, num_hashes) geometry — a mismatched probe could answer
    ``False`` for an inserted key, so the handle refuses geometry drift
    structurally. write/read persists the words with a validated
    content digest and a word-index range check."""

    def __init__(self, jsketch, spark):
        self._j = jsketch
        self._spark = spark

    @staticmethod
    def build(
        items: DataFrame,
        key_col: str,
        num_bits: int,
        num_hashes: int = 7,
        portable_hash: bool = True,
    ) -> "BloomSketchHandle":
        j = _jvm(items).graft.ops.BloomSketch.build(
            items._jdf, key_col, int(num_bits), int(num_hashes),
            bool(portable_hash))
        return BloomSketchHandle(j, items.sparkSession)

    @staticmethod
    def read(spark, path: str) -> "BloomSketchHandle":
        jvm = spark.sparkContext._jvm
        return BloomSketchHandle(
            jvm.graft.ops.BloomSketch.read(spark._jsparkSession, path), spark)

    @property
    def words(self) -> DataFrame:
        return DataFrame(self._j.words(), self._spark)

    @property
    def num_bits(self) -> int:
        return int(self._j.numBits())

    @property
    def num_hashes(self) -> int:
        return int(self._j.numHashes())

    @property
    def portable_hash(self) -> bool:
        return bool(self._j.portableHash())

    def might_contain(self, keys: DataFrame, key_col: str) -> DataFrame:
        return DataFrame(self._j.mightContain(keys._jdf, key_col), self._spark)

    def merge(self, other: "BloomSketchHandle") -> "BloomSketchHandle":
        return BloomSketchHandle(self._j.merge(other._j), self._spark)

    def fill_ratio(self) -> float:
        return float(self._j.fillRatio())

    def fpr_estimate(self) -> float:
        return float(self._j.fprEstimate())

    def write(self, path: str) -> None:
        self._spark.sparkContext._jvm.graft.ops.BloomSketch.write(self._j, path)


def bloom_fill_ratio_grouped(
    words: DataFrame, group_cols: List[str], num_bits: int
) -> DataFrame:
    """Per-group fill ratios (group..., fill) over a grouped word
    frame; a group's expected FP rate is fill ** num_hashes."""
    return _wrap(words, _jvm(words).graft.ops.Bloom.fillRatioGrouped(
        words._jdf, _to_seq(words, list(group_cols)), int(num_bits)))


class GroupedBloomSketchHandle:
    """Geometry-safe PER-GROUP Bloom filter handle (wraps the JVM
    ``graft.ops.GroupedBloomSketch``): one filter per stratum in one
    word frame, with the stratification part of the geometry. Rollups
    are EXACT (OR of subgroup filters == filter of the union):
    ``regroup`` / ``to_global`` equal direct builds bit for bit."""

    def __init__(self, jsketch, spark):
        self._j = jsketch
        self._spark = spark

    @staticmethod
    def build(
        items: DataFrame,
        key_col: str,
        group_cols: List[str],
        num_bits: int,
        num_hashes: int = 7,
        portable_hash: bool = True,
    ) -> "GroupedBloomSketchHandle":
        j = _jvm(items).graft.ops.GroupedBloomSketch.build(
            items._jdf, key_col, _to_seq(items, list(group_cols)),
            int(num_bits), int(num_hashes), bool(portable_hash))
        return GroupedBloomSketchHandle(j, items.sparkSession)

    @staticmethod
    def read(spark, path: str) -> "GroupedBloomSketchHandle":
        jvm = spark.sparkContext._jvm
        return GroupedBloomSketchHandle(
            jvm.graft.ops.GroupedBloomSketch.read(spark._jsparkSession, path),
            spark)

    @property
    def words(self) -> DataFrame:
        return DataFrame(self._j.words(), self._spark)

    @property
    def group_cols(self) -> List[str]:
        # a Scala Seq is not a Java collection: index it through py4j
        gc = self._j.groupCols()
        return [gc.apply(i) for i in range(gc.length())]

    @property
    def num_bits(self) -> int:
        return int(self._j.numBits())

    @property
    def num_hashes(self) -> int:
        return int(self._j.numHashes())

    @property
    def portable_hash(self) -> bool:
        return bool(self._j.portableHash())

    def might_contain(self, keys: DataFrame, key_col: str) -> DataFrame:
        return DataFrame(self._j.mightContain(keys._jdf, key_col), self._spark)

    def merge(self, other: "GroupedBloomSketchHandle") -> "GroupedBloomSketchHandle":
        return GroupedBloomSketchHandle(self._j.merge(other._j), self._spark)

    def regroup(
        self, names: List[str], exprs: List[str]
    ) -> "GroupedBloomSketchHandle":
        """Re-stratify to coarser groups via SQL expressions over the
        current group columns (exact — see class doc)."""
        return GroupedBloomSketchHandle(
            self._j.regroupExpr(
                _to_seq_session(self._spark, list(names)),
                _to_seq_session(self._spark, list(exprs))),
            self._spark)

    def to_global(self) -> "BloomSketchHandle":
        return BloomSketchHandle(self._j.toGlobal(), self._spark)

    def fill_ratios(self) -> DataFrame:
        return DataFrame(self._j.fillRatios(), self._spark)

    def write(self, path: str) -> None:
        self._spark.sparkContext._jvm.graft.ops.GroupedBloomSketch.write(
            self._j, path)


def quantiles_exact_pct(
    df: DataFrame,
    value_col: str,
    pcts: List[int],
) -> DataFrame:
    """EXACT integer percentiles of an integral column by iterative
    radix-histogram refinement — never a global sort, <= 5 column scans
    even for a full 64-bit value range. Returns (pct, k, value) with
    k = ceil(pct*n/100) over the non-null rows (nulls carry no rank)."""
    return _wrap(df, _jvm(df).graft.ops.Quantiles.exactPct(
        df._jdf, value_col, _to_seq(df, [int(x) for x in pcts])))


def quantiles_exact_pct_double(
    df: DataFrame,
    value_col: str,
    pcts: List[int],
) -> DataFrame:
    """EXACT percentiles of a DOUBLE column — the IEEE-754 sortable-bits
    transform maps double ordering onto the integer refinement, so the
    answer is a bit-exact element of the column (no approximation, no
    sort). NULL and NaN carry no rank; -0.0 normalizes to +0.0.
    Returns (pct, k, value DOUBLE)."""
    return _wrap(df, _jvm(df).graft.ops.Quantiles.exactPctDouble(
        df._jdf, value_col, _to_seq(df, [int(x) for x in pcts])))


def quantiles_exact_pct_weighted(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    pcts: List[int],
) -> DataFrame:
    """EXACT weighted percentiles: each row carries ``weight_col`` units
    of rank mass (integral, >= 0; null value/weight carries none) —
    identical to ``quantiles_exact_pct`` over the weight-expanded
    multiset, same refinement passes. Returns (pct, k, value) with
    k = ceil(pct*W/100) over the total weight W."""
    return _wrap(df, _jvm(df).graft.ops.Quantiles.exactPctWeighted(
        df._jdf, value_col, weight_col, _to_seq(df, [int(x) for x in pcts])))


def quantiles_at_ranks(
    df: DataFrame,
    value_col: str,
    ks: List[int],
) -> DataFrame:
    """EXACT order statistics at explicit 1-based ranks (k, value) —
    same refinement machinery as ``quantiles_exact_pct``. Ranks ride as
    doubles across py4j (exact below 2^53)."""
    return _wrap(df, _jvm(df).graft.ops.Quantiles.exactAtRanksPy(
        df._jdf, value_col, _to_seq(df, [float(x) for x in ks])))


def quantiles_exact_pct_by_group(
    df: DataFrame,
    group_cols: List[str],
    value_col: str,
    pcts: List[int],
) -> DataFrame:
    """EXACT per-group percentiles via group-partitioned rank windows —
    each group shuffles once, nothing collects. Returns
    (group..., pct, k, value); null group values are retained, null
    values carry no rank."""
    return _wrap(df, _jvm(df).graft.ops.Quantiles.exactPctByGroup(
        df._jdf, _to_seq(df, list(group_cols)), value_col,
        _to_seq(df, [int(x) for x in pcts])))


def percentile_filter(
    df: DataFrame,
    value_col: str,
    lo_pct: int,
    hi_pct: int,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies between the EXACT lo_pct-th and
    hi_pct-th percentile values (inclusive) — the one-call 'drop the
    shortest 5% / longest 1%' curation cut with no sampling error; null
    values are dropped (they carry no rank)."""
    return _wrap(df, _jvm(df).graft.ops.Quantiles.percentileFilter(
        df._jdf, value_col, int(lo_pct), int(hi_pct)))


def quantiles_exact_pct_by_group_double(
    df: DataFrame,
    group_cols: List[str],
    value_col: str,
    pcts: List[int],
) -> DataFrame:
    """EXACT per-group percentiles of a FLOAT/DOUBLE column — the double
    twin of ``quantiles_exact_pct_by_group`` (stored-bit-pattern
    ordering, bit-exact element answers). NULL/NaN values carry no rank;
    -0.0 normalizes; null groups are retained. Returns
    (group..., pct, k, value DOUBLE)."""
    return _wrap(df, _jvm(df).graft.ops.Quantiles.exactPctByGroupDouble(
        df._jdf, _to_seq(df, list(group_cols)), value_col,
        _to_seq(df, [int(x) for x in pcts])))


def percentile_filter_double(
    df: DataFrame,
    value_col: str,
    lo_pct: int,
    hi_pct: int,
) -> DataFrame:
    """Keep rows whose FLOAT/DOUBLE ``value_col`` lies between the EXACT
    lo_pct-th and hi_pct-th percentile values (inclusive) — 'drop the
    bottom 5% by float quality score' with bit-exact cutoffs and a
    pushed-down plain double band predicate. NULL and NaN rows are
    dropped (they carry no rank)."""
    return _wrap(df, _jvm(df).graft.ops.Quantiles.percentileFilterDouble(
        df._jdf, value_col, int(lo_pct), int(hi_pct)))


class QuantileSketchHandle:
    """Geometry-safe mergeable RANK sketch (wraps the JVM
    ``graft.ops.QuantileSketch``) — the third sketch leg after
    ``CmsSketchHandle`` (frequency) and ``HllSketchHandle``
    (cardinality): a deterministic bottom-k order-statistics sample.
    Summaries merge associatively (per-day sketches compose), quantile
    answers carry rank error ~ n/sqrt(s) (exact when n <= s), and
    write/read persists the summary with a validated content digest."""

    def __init__(self, jsketch, spark):
        self._j = jsketch
        self._spark = spark

    @staticmethod
    def build(
        items: DataFrame,
        id_col: str,
        value_col: str,
        s: int,
        seed: str,
        portable_hash: bool = True,
    ) -> "QuantileSketchHandle":
        """LONG-valued sketch over an integral column; ``id_col`` must
        uniquely identify rows (it is the sampling randomness).
        ``portable_hash=False`` draws rank keys with codegen'd xxhash64
        (faster; no external SQL replay) — summaries only merge within
        one mode."""
        j = _jvm(items).graft.ops.QuantileSketch.build(
            items._jdf, id_col, value_col, int(s), seed,
            bool(portable_hash))
        return QuantileSketchHandle(j, items.sparkSession)

    @staticmethod
    def build_double(
        items: DataFrame,
        id_col: str,
        value_col: str,
        s: int,
        seed: str,
        portable_hash: bool = True,
    ) -> "QuantileSketchHandle":
        """DOUBLE-valued sketch over a float/double column (NaN excluded,
        -0.0 normalized)."""
        j = _jvm(items).graft.ops.QuantileSketch.buildDouble(
            items._jdf, id_col, value_col, int(s), seed,
            bool(portable_hash))
        return QuantileSketchHandle(j, items.sparkSession)

    @staticmethod
    def read(spark, path: str) -> "QuantileSketchHandle":
        jvm = spark.sparkContext._jvm
        return QuantileSketchHandle(
            jvm.graft.ops.QuantileSketch.read(spark._jsparkSession, path), spark)

    @property
    def summary(self) -> DataFrame:
        return DataFrame(self._j.summary(), self._spark)

    @property
    def s(self) -> int:
        return self._j.s()

    @property
    def seed(self) -> str:
        return self._j.seed()

    @property
    def n(self) -> int:
        return int(self._j.n())

    @property
    def double_valued(self) -> bool:
        return bool(self._j.doubleValued())

    @property
    def portable_hash(self) -> bool:
        return bool(self._j.portableHash())

    def quantile(self, pct: int) -> int:
        return int(self._j.quantile(int(pct)))

    def quantile_double(self, pct: int) -> float:
        return float(self._j.quantileDouble(int(pct)))

    def rank_of(self, value: int) -> int:
        return int(self._j.rankOf(int(value)))

    def rank_of_double(self, value: float) -> int:
        return int(self._j.rankOfDouble(float(value)))

    def merge(self, other: "QuantileSketchHandle") -> "QuantileSketchHandle":
        return QuantileSketchHandle(self._j.merge(other._j), self._spark)

    def write(self, path: str) -> None:
        self._spark.sparkContext._jvm.graft.ops.QuantileSketch.write(
            self._j, path)


class GroupedQuantileSketchHandle:
    """GROUPED mergeable rank sketch (wraps the JVM
    ``graft.ops.GroupedQuantileSketch``) — the stratified twin of
    ``QuantileSketchHandle``: one deterministic bottom-s sample PER
    GROUP (per-language / per-day summaries in one frame), a counts
    frame riding along for scaled rank answers. Groups are never
    collected: the build cut is a map-side WindowGroupLimit, quantile
    answers are one window over the <= s rows/group summary, and merge
    re-cuts 2s rows per group. The summary doubles as a persisted
    stratified uniform sample."""

    def __init__(self, jsketch, spark):
        self._j = jsketch
        self._spark = spark

    @staticmethod
    def build_grouped(
        items: DataFrame,
        group_cols: List[str],
        id_col: str,
        value_col: str,
        s: int,
        seed: str,
        portable_hash: bool = True,
    ) -> "GroupedQuantileSketchHandle":
        """LONG-valued grouped sketch over an integral column; null
        groups are retained, null id/value rows are excluded."""
        j = _jvm(items).graft.ops.GroupedQuantileSketch.buildGrouped(
            items._jdf, _to_seq(items, list(group_cols)), id_col,
            value_col, int(s), seed, bool(portable_hash))
        return GroupedQuantileSketchHandle(j, items.sparkSession)

    @staticmethod
    def build_grouped_double(
        items: DataFrame,
        group_cols: List[str],
        id_col: str,
        value_col: str,
        s: int,
        seed: str,
        portable_hash: bool = True,
    ) -> "GroupedQuantileSketchHandle":
        """DOUBLE-valued grouped sketch (NaN excluded, -0.0 normalized)."""
        j = _jvm(items).graft.ops.GroupedQuantileSketch.buildGroupedDouble(
            items._jdf, _to_seq(items, list(group_cols)), id_col,
            value_col, int(s), seed, bool(portable_hash))
        return GroupedQuantileSketchHandle(j, items.sparkSession)

    @staticmethod
    def read(spark, path: str) -> "GroupedQuantileSketchHandle":
        jvm = spark.sparkContext._jvm
        return GroupedQuantileSketchHandle(
            jvm.graft.ops.GroupedQuantileSketch.read(
                spark._jsparkSession, path), spark)

    @staticmethod
    def from_window_summaries(
        summaries: DataFrame,
        s: int,
        seed: str,
        portable_hash: bool = True,
    ) -> "GroupedQuantileSketchHandle":
        """Rebuild the grouped-sketch surface from
        ``stream_rank_sketch_windowed`` emissions (windowStartMs becomes
        the group; the per-window ``n`` becomes the counts frame). Pass
        the STREAM's s/seed/portable_hash — they are not carried in the
        rows."""
        j = _jvm(summaries).graft.ops.GroupedQuantileSketch.fromWindowSummaries(
            summaries._jdf, int(s), seed, bool(portable_hash))
        return GroupedQuantileSketchHandle(j, summaries.sparkSession)

    @staticmethod
    def from_window_group_summaries(
        summaries: DataFrame,
        s: int,
        seed: str,
        portable_hash: bool = True,
    ) -> "GroupedQuantileSketchHandle":
        """``from_window_summaries`` for the by-group stream emissions —
        the rebuilt sketch is stratified by (windowStartMs, group)."""
        j = _jvm(summaries).graft.ops.GroupedQuantileSketch \
            .fromWindowGroupSummaries(summaries._jdf, int(s), seed,
                bool(portable_hash))
        return GroupedQuantileSketchHandle(j, summaries.sparkSession)

    @property
    def summary(self) -> DataFrame:
        return DataFrame(self._j.summary(), self._spark)

    @property
    def counts(self) -> DataFrame:
        return DataFrame(self._j.counts(), self._spark)

    @property
    def s(self) -> int:
        return self._j.s()

    @property
    def seed(self) -> str:
        return self._j.seed()

    @property
    def double_valued(self) -> bool:
        return bool(self._j.doubleValued())

    @property
    def portable_hash(self) -> bool:
        return bool(self._j.portableHash())

    def quantiles(self, pcts: List[int]) -> DataFrame:
        """Per-group percentile estimates (group..., pct, k, value) —
        k is the sample rank; rank error ~ n_g/sqrt(s) per group,
        exact for groups with <= s rows."""
        jdf = self._j.quantiles(
            _to_seq_session(self._spark, [int(x) for x in pcts]))
        return DataFrame(jdf, self._spark)

    def rank_of(self, threshold: int) -> DataFrame:
        """Per-group estimated count of rows with value <= threshold
        (group..., le_est)."""
        return DataFrame(self._j.rankOf(int(threshold)), self._spark)

    def rank_of_double(self, threshold: float) -> DataFrame:
        return DataFrame(self._j.rankOfDouble(float(threshold)), self._spark)

    def merge(self, other: "GroupedQuantileSketchHandle") -> "GroupedQuantileSketchHandle":
        return GroupedQuantileSketchHandle(self._j.merge(other._j), self._spark)

    def regroup(self, names: List[str], exprs: List[str]) -> "GroupedQuantileSketchHandle":
        """EXACT rollup to coarser strata without rescanning ("hourly ->
        daily"): each new group column is a SQL expression over the
        CURRENT group columns, e.g.
        ``regroup(["day"], ["windowStartMs - windowStartMs % 86400000"])``.
        Equals the direct coarse build (never an approximation)."""
        j = self._j.regroupExpr(
            _to_seq_session(self._spark, list(names)),
            _to_seq_session(self._spark, list(exprs)))
        return GroupedQuantileSketchHandle(j, self._spark)

    def to_global(self) -> "QuantileSketchHandle":
        """EXACT rollup to one global sketch — equals the scalar
        one-shot build over the whole corpus."""
        return QuantileSketchHandle(self._j.toGlobal(), self._spark)

    def write(self, path: str) -> None:
        self._spark.sparkContext._jvm.graft.ops.GroupedQuantileSketch.write(
            self._j, path)


def stream_bloom_windowed_words(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    window_duration: str,
    watermark: str,
    num_bits: int,
    num_hashes: int,
    group_cols: Optional[List[str]] = None,
    portable_hash: bool = True,
) -> DataFrame:
    """Per-event-time-window Bloom word frames (windowStartMs,
    windowEndMs, [group...,] w, bits, portable) from a watermarked stream — a
    declarative windowed bit_or aggregation, state <= m/64 word rows
    per open (window x group) at any stream volume; each window emits
    once on watermark close-out. Works on batch frames too."""
    return _wrap(events, _jvm(events).graft.streaming.StreamBloom.windowedWords(
        events._jdf, ts_col, key_col, window_duration, watermark,
        int(num_bits), int(num_hashes),
        _to_seq(events, list(group_cols or [])), bool(portable_hash)))


def stream_bloom_from_window_words(
    words: DataFrame, num_bits: int, num_hashes: int,
    group_cols: Optional[List[str]] = None,
    portable_hash: bool = True,
) -> "GroupedBloomSketchHandle":
    """Rebuild the per-(window x group) GroupedBloomSketchHandle from a
    sink of ``stream_bloom_windowed_words`` emissions — duplicates
    OR-collapse, so restarted-query re-emissions are harmless;
    ``regroup``/``to_global`` then roll windows up exactly.

    Geometry is on trust (pass the STREAM's exact
    ``num_bits``/``num_hashes``); the HASH MODE is NOT — every emission
    row carries the build's ``portable`` flag and the rebuild REFUSES a
    mixed or mismatched sink instead of silently false-negating every
    probe. Pass the recorded mode as ``portable_hash``."""
    j = _jvm(words).graft.streaming.StreamBloom.fromWindowWords(
        words._jdf, int(num_bits), int(num_hashes),
        _to_seq(words, list(group_cols or [])), bool(portable_hash))
    return GroupedBloomSketchHandle(j, words.sparkSession)


def stream_hll_windowed_registers(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    window_duration: str,
    watermark: str,
    p: int,
    seed: str,
    portable_hash: bool = True,
    group_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Per-event-time-window HLL register frames (windowStartMs,
    windowEndMs, [group...,] bucket, maxrank, portable) — declarative windowed
    max aggregation, state <= 2^p registers per open (window x group);
    each window emits once on watermark close-out. Batch frames take
    the same plan."""
    return _wrap(events, _jvm(events).graft.streaming.StreamSketches
        .hllWindowedRegisters(events._jdf, ts_col, key_col, window_duration,
            watermark, int(p), seed, bool(portable_hash),
            _to_seq(events, list(group_cols or []))))


def stream_hll_from_window_registers(
    registers: DataFrame, p: int, seed: str, portable_hash: bool = True,
    group_cols: Optional[List[str]] = None,
) -> "GroupedHllSketchHandle":
    """Rebuild the per-(window x group) GroupedHllSketchHandle from a
    sink of emissions — duplicate re-emissions max-collapse exactly.
    Refuses a sink whose recorded ``portable`` mode mixes or mismatches
    ``portable_hash``."""
    j = _jvm(registers).graft.streaming.StreamSketches.hllFromWindowRegisters(
        registers._jdf, int(p), seed, bool(portable_hash),
        _to_seq(registers, list(group_cols or [])))
    return GroupedHllSketchHandle(j, registers.sparkSession)


def stream_cms_windowed_cells(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    window_duration: str,
    watermark: str,
    depth: int,
    width: int,
    seed: str,
    portable_hash: bool = True,
    group_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Per-event-time-window CMS cell frames (windowStartMs,
    windowEndMs, [group...,] r, bucket, cnt, portable) — declarative windowed
    sum, state <= depth*width cells per open (window x group).
    Unweighted by design."""
    return _wrap(events, _jvm(events).graft.streaming.StreamSketches
        .cmsWindowedCells(events._jdf, ts_col, key_col, window_duration,
            watermark, int(depth), int(width), seed, bool(portable_hash),
            _to_seq(events, list(group_cols or []))))


def stream_cms_from_window_cells(
    cells: DataFrame, depth: int, width: int, seed: str,
    portable_hash: bool = True,
    group_cols: Optional[List[str]] = None,
) -> "GroupedCmsSketchHandle":
    """Rebuild the per-(window x group) GroupedCmsSketchHandle from a
    sink of emissions. Exact duplicate rows collapse; CONFLICTING
    counts for the same cell (a partially-reprocessed sink) refuse
    loudly, as does a sink whose recorded ``portable`` mode mixes or
    mismatches ``portable_hash``."""
    j = _jvm(cells).graft.streaming.StreamSketches.cmsFromWindowCells(
        cells._jdf, int(depth), int(width), seed, bool(portable_hash),
        _to_seq(cells, list(group_cols or [])))
    return GroupedCmsSketchHandle(j, cells.sparkSession)


def stream_rank_sketch_windowed(
    events: DataFrame,
    ts_col: str,
    id_col: str,
    value_col: str,
    window_duration: str,
    watermark: str,
    s: int,
    seed: str,
    portable_hash: bool = True,
) -> DataFrame:
    """Per-event-time-window bottom-s rank-sketch summaries with BOUNDED
    state (<= s rows per open window regardless of stream volume); each
    closed window emits its summary exactly once on watermark close-out.
    Works on streaming and batch frames (batch emits immediately, same
    fold). Returns (windowStartMs, windowEndMs, rk, value)."""
    jds = _jvm(events).graft.streaming.StreamRankSketch.windowedBottomK(
        events._jdf, ts_col, id_col, value_col, window_duration,
        watermark, int(s), seed, bool(portable_hash))
    return DataFrame(jds.toDF(), events.sparkSession)


def stream_rank_sketch_windowed_double(
    events: DataFrame,
    ts_col: str,
    id_col: str,
    value_col: str,
    window_duration: str,
    watermark: str,
    s: int,
    seed: str,
    portable_hash: bool = True,
) -> DataFrame:
    """``stream_rank_sketch_windowed`` for FLOAT/DOUBLE value columns —
    the value rides the bounded fold as its sortable-bits long and the
    emitted summary inverts back bit-exactly (NaN/NULL excluded, -0.0
    normalized). Returns (windowStartMs, windowEndMs, rk, value DOUBLE)."""
    jds = _jvm(events).graft.streaming.StreamRankSketch.windowedBottomKDouble(
        events._jdf, ts_col, id_col, value_col, window_duration,
        watermark, int(s), seed, bool(portable_hash))
    return DataFrame(jds.toDF(), events.sparkSession)


def stream_rank_sketch_windowed_by_group(
    events: DataFrame,
    ts_col: str,
    group_col: str,
    id_col: str,
    value_col: str,
    window_duration: str,
    watermark: str,
    s: int,
    seed: str,
    portable_hash: bool = True,
) -> DataFrame:
    """Per-(event-time window x group) bottom-s summaries ("p99 per
    language per hour"): bounded state per open (window, group) key,
    exactly-once emission on watermark close-out; the group rides as its
    string form (null group retained). Returns (windowStartMs,
    windowEndMs, group, rk, value, n); rebuild the sketch surface with
    ``GroupedQuantileSketchHandle.from_window_group_summaries``."""
    jds = _jvm(events).graft.streaming.StreamRankSketch.windowedBottomKByGroup(
        events._jdf, ts_col, group_col, id_col, value_col,
        window_duration, watermark, int(s), seed, bool(portable_hash))
    return DataFrame(jds.toDF(), events.sparkSession)


def stream_rank_sketch_windowed_by_group_double(
    events: DataFrame,
    ts_col: str,
    group_col: str,
    id_col: str,
    value_col: str,
    window_duration: str,
    watermark: str,
    s: int,
    seed: str,
    portable_hash: bool = True,
) -> DataFrame:
    """``stream_rank_sketch_windowed_by_group`` for FLOAT/DOUBLE value
    columns (sortable-bits ride, NaN/NULL excluded, -0.0 normalized)."""
    jds = _jvm(events).graft.streaming.StreamRankSketch \
        .windowedBottomKByGroupDouble(
            events._jdf, ts_col, group_col, id_col, value_col,
            window_duration, watermark, int(s), seed, bool(portable_hash))
    return DataFrame(jds.toDF(), events.sparkSession)


def dedup_chunks_within(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
) -> DataFrame:
    """Intra-document repetition removal: keep-first dedup over
    consecutive non-overlapping ``chunk_tokens``-token chunks, one O(len)
    per-row pass, zero shuffles. Returns (id, clean_text, n_chunks,
    n_kept, n_removed)."""
    return _wrap(docs, _jvm(docs).graft.ops.TextOps.dedupChunksWithin(
        docs._jdf, id_col, text_col, int(chunk_tokens)))


def bloom_size_for(
    spark, expected_distinct: int, target_fpr: float
) -> Tuple[int, int]:
    """Bloom geometry that meets ``target_fpr`` for ``expected_distinct``
    keys: returns (num_bits, num_hashes) — the textbook optimum,
    word-aligned, num_hashes clamped to the double-hashing range. Size
    from the TOTAL cardinality across every filter you will merge (get
    it from an HLL estimate when unknown); an undersized filter
    saturates toward answering True for everything, which the handle
    writes also audit at persist time."""
    t = spark.sparkContext._jvm.graft.ops.Bloom.sizeFor(
        int(expected_distinct), float(target_fpr))
    return int(t._1()), int(t._2())


def bloom_size_for_corpus(
    df: DataFrame, key_col: str, target_fpr: float, p: int = 12
) -> Tuple[int, int]:
    """``bloom_size_for`` with the distinct count ESTIMATED from the
    corpus itself (one fast-mode HLL pass, ~1.6% RSE at p=12, inflated
    3-sigma so the realized fill lands at-or-under the design point).
    Pass the UNION corpus you intend the merged filter to cover."""
    t = _jvm(df).graft.ops.Bloom.sizeForCorpus(
        df._jdf, key_col, float(target_fpr), int(p))
    return int(t._1()), int(t._2())


class SemDedupIndexHandle:
    """INCREMENTAL semantic dedup index (wraps the JVM
    ``graft.ops.SemDedupIndex``): persisted (centers, keeper vectors,
    epsilon) store answering "is this new doc a semantic dup of
    anything KEPT so far" with work proportional to the batch — the
    store-probe ingest shape of SemDeDup, sibling of the MinHash
    ``IncrementalDedup`` path. ``probe`` verdicts a batch read-only;
    ``ingest`` also appends the batch's novel docs (the store grows
    with novel mass, not arrival rate); write/read persists with
    validated content digests.

    Streaming from Python: the JVM-side ``SemDedupIndex.ingestStream``
    takes a Scala sink callback, which does not cross py4j — drive the
    same loop with pyspark's own ``foreachBatch``: in each batch, f =
    ``SemDedupIndexHandle.read(spark, path)``; anti-join the batch's
    ids out of ``f.keepers`` if re-delivery is possible; ``ingest`` the
    batch; ``write(path)`` the returned handle (the stage-and-swap
    write makes writing back to the path being read safe); then consume
    and ``unpersist()`` the verdicts."""

    def __init__(self, jindex, spark):
        self._j = jindex
        self._spark = spark

    @staticmethod
    def build(
        corpus: DataFrame,
        id_col: str,
        vec_col: str,
        centers: DataFrame,
        epsilon: float,
        keeper: str = "min_id",
        max_cluster_size: int = 20000,
    ) -> Tuple[DataFrame, "SemDedupIndexHandle"]:
        """Bootstrap from an initial corpus (full SemDeDup recipe:
        within-cluster components + keeper rule). ``centers`` is a
        k-row frame (cluster 0..k-1, cv array<double>) — the
        ``prototypicality`` convention. Returns (corpus audit verdicts,
        the index). Both the verdicts and the index's ``keepers`` come
        back PERSISTED; the caller owns both releases (unpersist the
        verdicts once consumed, ``index.keepers.unpersist()`` once the
        index is written or retired)."""
        jt = _jvm(corpus).graft.ops.SemDedupIndex.buildDf(
            corpus._jdf, id_col, vec_col, centers._jdf, float(epsilon),
            keeper, int(max_cluster_size))
        spark = corpus.sparkSession
        return (DataFrame(jt._1(), spark),
                SemDedupIndexHandle(jt._2(), spark))

    @staticmethod
    def train(
        corpus: DataFrame,
        id_col: str,
        vec_col: str,
        k: int,
        epsilon: float,
        seed: int = 42,
        max_iter: int = 10,
        keeper: str = "min_id",
        max_cluster_size: int = 20000,
    ) -> Tuple[DataFrame, "SemDedupIndexHandle"]:
        """One-call bootstrap: fit spherical k-means centers here (pick
        ``k`` with the balancedK rule: ~sqrt(n)/2) and build the index
        at them. The fitted centers FREEZE into the index; ``health``
        tells you when the store has outgrown them."""
        jt = _jvm(corpus).graft.ops.SemDedupIndex.train(
            corpus._jdf, id_col, vec_col, int(k), float(epsilon),
            int(seed), int(max_iter), keeper, int(max_cluster_size))
        spark = corpus.sparkSession
        return (DataFrame(jt._1(), spark),
                SemDedupIndexHandle(jt._2(), spark))

    @staticmethod
    def read(spark, path: str) -> "SemDedupIndexHandle":
        jvm = spark.sparkContext._jvm
        return SemDedupIndexHandle(
            jvm.graft.ops.SemDedupIndex.read(spark._jsparkSession, path),
            spark)

    @staticmethod
    def repair_manifest(spark, path: str) -> int:
        """Operator recovery for ``ingest_into``'s one refused crash
        window (died between the partition overwrite and the manifest
        merge): re-digest ALL cluster partitions from the CURRENT
        payload and rewrite the manifest. Explicit-intent tool — it
        blesses whatever keeper rows are on disk, so use only when the
        refusal traces to a crashed ingest; a corrupted quantizer still
        refuses. Returns changed digest entries."""
        jvm = spark.sparkContext._jvm
        return int(jvm.graft.ops.SemDedupIndex.repairManifest(
            spark._jsparkSession, path))

    @staticmethod
    def ingest_into(
        spark, path: str, batch: DataFrame, id_col: str, vec_col: str,
        max_cluster_size: int = 20000,
    ) -> DataFrame:
        """PARTITION-SCOPED ingest against a WRITTEN index at ``path``:
        probe the batch against only the cluster partitions it assigns
        to, admit the novel docs, and rewrite ONLY those partitions —
        O(batch + touched-cluster keepers) end to end, never O(store).
        The batch-cadence write-back (streaming ``ingestStream`` uses
        this per micro-batch); ``write`` remains the full-store path
        for bootstrap/rebalance. Idempotent on replay of the same
        batch. Returns the verdict frame (persisted; caller owns the
        release)."""
        jvm = spark.sparkContext._jvm
        return DataFrame(jvm.graft.ops.SemDedupIndex.ingestInto(
            spark._jsparkSession, path, batch._jdf, id_col, vec_col,
            int(max_cluster_size)), spark)

    def health(self) -> DataFrame:
        """(n_keepers, k, max_cluster, avg_cluster, recommended_k) —
        rebuild with fresh centers when recommended_k is well above k
        (the frozen-centers drift audit)."""
        return DataFrame(self._j.health(), self._spark)

    @property
    def keepers(self) -> DataFrame:
        return DataFrame(self._j.keepers(), self._spark)

    @property
    def epsilon(self) -> float:
        return float(self._j.epsilon())

    def probe(
        self, batch: DataFrame, id_col: str, vec_col: str,
        max_cluster_size: int = 20000,
    ) -> DataFrame:
        """Read-only verdicts (id, cluster, centroid_sim, dup_of,
        n_dup_matches, keep): dup_of = best same-cluster match (highest
        cosine, ties to the lowest id) among stored keepers and
        smaller-id co-batch docs at the round-6 threshold.

        The returned frame comes back PERSISTED (the skew guard
        materializes it) and the caller owns the release — call
        ``df.unpersist()`` when done, or a long-running probe loop
        accumulates cached verdict frames (the ``cms_top_k_exact``
        contract)."""
        return DataFrame(self._j.probe(batch._jdf, id_col, vec_col,
            int(max_cluster_size)), self._spark)

    def ingest(
        self, batch: DataFrame, id_col: str, vec_col: str,
        max_cluster_size: int = 20000,
    ) -> Tuple[DataFrame, "SemDedupIndexHandle"]:
        """``probe`` + append the novel docs to the keeper store;
        returns (verdicts, updated index). The verdict frame comes back
        PERSISTED and the caller owns the release — in an ingest loop,
        ``unpersist()`` each batch's verdicts once consumed."""
        jt = self._j.ingest(batch._jdf, id_col, vec_col,
            int(max_cluster_size))
        return (DataFrame(jt._1(), self._spark),
                SemDedupIndexHandle(jt._2(), self._spark))

    def rebalance_to(
        self, centers: DataFrame, max_cluster_size: int = 20000,
    ) -> "SemDedupIndexHandle":
        """Re-partition the keeper store at caller-supplied centers (a
        k-row (cluster 0..k-1, cv array<double>) frame) — the
        maintenance op ``health`` recommends. Keeper SET is preserved
        exactly (never a re-dedup of history); refuses if any new
        cluster exceeds ``max_cluster_size``. The returned index's
        keepers come back persisted (caller owns the release)."""
        jvm = self._spark.sparkContext._jvm
        j = jvm.graft.ops.SemDedupIndex.rebalanceToDf(
            self._j, centers._jdf, int(max_cluster_size))
        return SemDedupIndexHandle(j, self._spark)

    def rebalance(
        self, k: int = 0, seed: int = 42, max_iter: int = 10,
        max_cluster_size: int = 20000,
    ) -> "SemDedupIndexHandle":
        """One-call maintenance rebuild: train fresh spherical centers
        on the CURRENT keepers (k=0 -> the balancedK recommendation,
        exactly what ``health`` reports) and re-partition at them."""
        jvm = self._spark.sparkContext._jvm
        j = jvm.graft.ops.SemDedupIndex.rebalance(
            self._j, int(k), int(seed), int(max_iter),
            int(max_cluster_size))
        return SemDedupIndexHandle(j, self._spark)

    def write(self, path: str) -> None:
        self._spark.sparkContext._jvm.graft.ops.SemDedupIndex.write(
            self._j, path)


def corpus_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str,
    min_count: int = 5,
) -> DataFrame:
    """Token-level corpus drift by G2 log-likelihood frequency profiling
    (Rayson & Garside 2000): which tokens are over/under-represented in
    corpus ``a`` vs ``b``, with exact integer direction and support
    filtering. Returns (token, cnt_a, cnt_b, dir, llr)."""
    return _wrap(a, _jvm(a).graft.ops.TextOps.corpusDrift(
        a._jdf, b._jdf, text_col, int(min_count)))
