"""Training-corpus curation operators: benchmark decontamination,
Gopher-style quality rules, sequence packing, and dedup resolution.

These are the corpus-preparation stages a large-scale LLM data
pipeline runs between raw ingest and tokenization - the brief's
"operations a large-scale training-data pipeline would need" beyond
the reference's own surface. All four are pure DataFrame plans (no
UDFs) with DuckDB oracle twins.

Published rule sources (public papers only): the quality heuristics
follow Rae et al. 2021 (Gopher, Appendix A1.1) and Raffel et al. 2020
(C4); decontamination is the n-gram-overlap test-set filter described
in Brown et al. 2020 (GPT-3, Appendix C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table
from .text import md5_word_hash, tokens_col, xx_gram_slice_hashes, xx_word_hash

# --- benchmark decontamination --------------------------------------------

DECONTAM_N = 8  # gram width; GPT-3 used 13 on web-scale docs
BENCH_MOD = 50  # doc_id % BENCH_MOD == 0 plays the held-out benchmark


def _gram_hashes(text_toks) -> F.Column:
    """All DECONTAM_N-grams of a token array as per-doc-DISTINCT 60-bit
    xxhash64 SLICE hashes (r15: no gram string is ever built - see
    xx_gram_slice_hashes for the measured decomposition and the
    staging requirement: ``text_toks`` must be a materialized column).
    Every consumer (decontamination, corpus_dup_ngrams,
    curation_funnel, cross_corpus_overlap) only emits COUNTS derived
    from gram equality, never a hash value, so the md5-based DuckDB
    oracles still match under hash-injectivity."""
    return F.array_distinct(xx_gram_slice_hashes(text_toks, DECONTAM_N))


def decontamination_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training documents sharing any DECONTAM_N-gram with a
    benchmark set (here: every BENCH_MOD-th doc stands in for the
    held-out eval suite). Output per training doc: how many distinct
    grams leak, and the drop flag.

    Scale shape: both sides reduce to (doc, gram-hash) pairs that are
    per-doc DISTINCT before the join, the benchmark side is tiny by
    construction (eval suites are KBs against TBs of training data) so
    AQE broadcasts its distinct gram set, and the count is a
    map-combinable re-aggregation keyed by doc - one real shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialized once: the train and benchmark branches both derive
    # from this relation, and without a barrier each branch re-runs
    # the hash-per-gram projection against its own scan (plus the
    # isnotnull-pushdown substitution pathology documented in
    # operators/dedup.py). Narrow (doc_id, gram-hash) rows. The token
    # array is staged in its own select (xx_gram_slice_hashes
    # requirement: the slice lambda must see a column, not the split).
    with_grams = (
        docs.select("doc_id", tokens_col().alias("toks"))
        .select("doc_id", F.explode_outer(_gram_hashes(F.col("toks"))).alias("gram"))
        .localCheckpoint(eager=False)
    )
    train = with_grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    bench_grams = (
        with_grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("gram")
        .distinct()
    )
    leaks = (
        train.join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_leaked_grams"))
    )
    train_docs = docs.select("doc_id").filter(F.col("doc_id") % BENCH_MOD != 0)
    return train_docs.join(leaks, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_leaked_grams", F.lit(0)).alias("n_leaked_grams"),
        (F.coalesce("n_leaked_grams", F.lit(0)) > 0).alias("contaminated"),
    )


DECONTAMINATION_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents
),
grams AS (
  SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(w) - {DECONTAM_N} + 1, 0) + 1),
           i -> ('0x' || substr(md5(array_to_string(w[i:i+{DECONTAM_N}-1], ' ')), 1, 15))::BIGINT
         )) AS gs
  FROM tok
),
pairs AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
bench AS (SELECT DISTINCT gram FROM pairs WHERE doc_id % {BENCH_MOD} = 0),
leaks AS (
  SELECT p.doc_id, count(*) AS n FROM pairs p
  JOIN bench b ON p.gram = b.gram
  WHERE p.doc_id % {BENCH_MOD} != 0
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       coalesce(l.n, 0) AS n_leaked_grams,
       coalesce(l.n, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {BENCH_MOD} != 0) d
LEFT JOIN leaks l ON d.doc_id = l.doc_id
"""


# --- Gopher quality rules --------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule metrics + pass flags per document (Rae et
    al. 2021, Appendix A1.1), entirely as column expressions: word
    count in [50, 100k], mean word length in [3, 10], symbol-to-word
    ratio (# and ellipsis) <= 0.1, >= 80% of words contain an
    alphabetic character, and >= 2 distinct members of an 8-stopword
    list. The conjunction is the keep signal a C4/Gopher-style filter
    stage applies before tokenization; all-scan, zero-shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    # r15 (guide §1.2 step 2): the token array is staged in its own
    # select - five metric expressions each consumed the raw split()
    # - and the stopword count is one array_intersect pass instead of
    # a filter whose lambda referenced the transform(lower) array as
    # an OUTER expression, re-evaluating the full lowered-tokens pass
    # once per stopword (8x per doc; HOF lambdas re-evaluate outer
    # expressions per element - README lesson #1). array_intersect
    # returns the DISTINCT stopwords present, exactly the count the
    # old filter produced (the stopword list has no duplicates).
    # Measured 1.66 -> 0.xx s at sf0.1 (see OPTIMIZATION_r15.md).
    docs = docs.select("doc_id", "text", tokens_col().alias("toks"))
    toks = F.col("toks")
    n_words = F.size(toks)
    mean_len = (
        F.aggregate(F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x)
        / n_words
    )
    n_hash = F.length("text") - F.length(F.regexp_replace("text", "#", ""))
    n_ellipsis = (
        F.length("text") - F.length(F.regexp_replace("text", r"\.\.\.", ""))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis) / n_words
    alpha_frac = (
        F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]"))) / n_words
    )
    n_stop = F.size(
        F.array_intersect(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            F.transform(toks, lambda w: F.lower(w)),
        )
    )
    pass_words = (n_words >= 50) & (n_words <= 100_000)
    pass_mean = (mean_len >= 3) & (mean_len <= 10)
    pass_symbol = symbol_ratio <= 0.1
    pass_alpha = alpha_frac >= 0.8
    pass_stop = n_stop >= 2
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        (pass_words & pass_mean & pass_symbol & pass_alpha & pass_stop).alias(
            "gopher_pass"
        ),
    )


def _sw(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


GOPHER_QUALITY_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id, text, string_split_regex(text, '\\s+') AS w FROM documents
),
m AS (
  SELECT doc_id,
         len(w) AS n_words,
         CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) / len(w)
           AS mean_word_len,
         ((length(text) - length(replace(text, '#', '')))
          + (length(text) - length(replace(text, '...', ''))) / 3)
           / len(w) AS symbol_ratio,
         len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) / len(w)
           AS alpha_frac,
         len(list_filter([{_sw(GOPHER_STOPWORDS)}],
             s -> list_contains(list_transform(w, x -> lower(x)), s)))
           AS n_stopwords
  FROM tok
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stopwords,
       (n_words BETWEEN 50 AND 100000)
       AND (mean_word_len BETWEEN 3 AND 10)
       AND symbol_ratio <= 0.1
       AND alpha_frac >= 0.8
       AND n_stopwords >= 2 AS gopher_pass
FROM m
"""


# --- repetition rules (the other half of Gopher's filter) -----------------

TOP_GRAM_MAX_FRAC = 0.20  # most frequent 2-gram may cover <= 20% of grams
DUP_GRAM_MAX_FRAC = 0.30  # fraction of non-distinct 3-grams <= 30%
_REP_M = 1_000_000_000_000_037  # prime near 1e15: (h % M) * 31 stays in int64


def _gram2(wh):
    """2-gram integer hashes from a word-hash array (exact modular
    arithmetic; shared by repetition_filter and the curation funnel)."""
    M = _REP_M
    return F.zip_with(
        F.slice(wh, 1, F.greatest(F.size(wh) - 1, F.lit(0))),
        F.slice(wh, 2, F.greatest(F.size(wh) - 1, F.lit(0))),
        lambda a, b: ((a % M) * 31 + b) % M,
    )


def _gram3(wh):
    M = _REP_M
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(wh) - 2, F.lit(0))),
        lambda i: (
            (((F.element_at(wh, i) % M) * 31 + F.element_at(wh, i + 1)) % M) * 31
            + F.element_at(wh, i + 2)
        )
        % M,
    )


def _longest_run(arr):
    """Longest equal-adjacent run after sorting = the mode's count."""
    run_zero = F.struct(
        F.lit(-1).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(a, x):
        new_run = (
            F.when(x == a["prev"], a["run"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(a["best"], new_run).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), run_zero, step)["best"]


def repetition_filter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (Rae et al. 2021 A1.1, the
    repetition half of the Gopher filter): the coverage fraction of
    the single most-frequent 2-gram, and the fraction of 3-grams that
    are duplicates of an earlier 3-gram in the same document.

    Scale shape: ZERO shuffles. The duplicate fraction is per-row
    array algebra (size vs array_distinct size). The top-gram
    fraction - a per-document mode - is sort-the-array + one fold
    counting the longest equal run, all inside the scan projection:
    sorting groups equal grams adjacently, so the max run length IS
    the mode count. Grams are INTEGER hashes folded from per-word
    hashes with exact modular arithmetic (one hash per word, not
    per gram; no gram strings are ever built - string gram
    construction plus string sorts measured 3x slower), so for a
    100k-token document the per-row cost is one word-hash pass plus
    an O(n log n) long sort - strictly cheaper than shuffling 100k
    (doc, gram) rows through an exchange. Cross-engine equality:
    the oracle folds the identical arithmetic over md5 word hashes;
    only the run-length/distinct-count FRACTIONS reach the output,
    which agree across hash families under injectivity (r15)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()

    # Two selects, load-bearing (README lesson #1): downstream refers
    # to wh/g2/g3 as COLUMNS referenced more than once, so
    # CollapseProject keeps these projections separate and each array
    # is built once per row.
    hashed = docs.select(
        "doc_id",
        # xx_word_hash (r15): only run-length/distinct-count fractions
        # reach the output; the md5 oracle matches under injectivity.
        F.transform(toks, lambda w: xx_word_hash(w)).alias("wh"),
    )
    staged = hashed.select(
        "doc_id", _gram2(F.col("wh")).alias("g2"), _gram3(F.col("wh")).alias("g3")
    )
    base = staged.select(
        "doc_id",
        F.size("g2").alias("n_g2"),
        _longest_run(F.col("g2")).alias("top_c"),
        (
            (F.size("g3") - F.size(F.array_distinct("g3")))
            / F.greatest(F.size("g3"), F.lit(1))
        ).alias("dup_g3_frac"),
    )
    top_frac = F.col("top_c") / F.greatest("n_g2", F.lit(1))
    return base.select(
        "doc_id",
        top_frac.alias("top_g2_frac"),
        "dup_g3_frac",
        (
            (top_frac <= TOP_GRAM_MAX_FRAC)
            & (F.col("dup_g3_frac") <= DUP_GRAM_MAX_FRAC)
        ).alias("rep_pass"),
    )


REPETITION_FILTER_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(string_split_regex(text, '\\s+'),
           x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS wh
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(wh) - 1, 0) + 1),
           i -> ((wh[i] % {_REP_M}) * 31 + wh[i+1]) % {_REP_M}) AS g2,
         list_transform(range(1, greatest(len(wh) - 2, 0) + 1),
           i -> (((wh[i] % {_REP_M}) * 31 + wh[i+1]) % {_REP_M} * 31
                 + wh[i+2]) % {_REP_M}) AS g3
  FROM tok
),
base AS (
  -- mode count via count-each-distinct-gram: quadratic per doc but
  -- oracle-only. DuckDB 1.0.0's list_reduce with a struct
  -- accumulator returns WRONG results under batched evaluation
  -- (cross-row state leak; verified: correct row-at-a-time, wrong
  -- over the full table), so the sorted-run fold the Spark side uses
  -- cannot be mirrored here.
  SELECT doc_id, len(g2) AS n_g2,
         coalesce(list_max(list_transform(list_distinct(g2),
                    d -> len(list_filter(g2, x -> x = d)))), 0) AS top_c,
         (len(g3) - len(list_distinct(g3))) / greatest(len(g3), 1)
           AS dup_g3_frac
  FROM g
)
SELECT doc_id,
       top_c / greatest(n_g2, 1) AS top_g2_frac,
       dup_g3_frac,
       (top_c / greatest(n_g2, 1) <= {TOP_GRAM_MAX_FRAC})
       AND (dup_g3_frac <= {DUP_GRAM_MAX_FRAC}) AS rep_pass
FROM base
"""


# --- temperature-scaled source mixing --------------------------------------

MIX_TEMPERATURE = 0.5  # 1/T = 2: the weight power stays exact arithmetic


def source_mixture_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights for corpus mixing: raw token share
    per source, re-weighted with a sampling temperature
    (share^(1/T), renormalized - the multilingual/domain re-balancing
    scheme of Conneau & Lample 2019). T = 0.5 keeps the power integral
    (share^2), so both engines compute it as exact multiplication and
    the oracle hash-compares doubles safely.

    Scale shape: one map-combinable aggregation keyed by source plus a
    broadcastable totals row - the fact table is scanned once."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col())).alias("n_tokens"),
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("tot_tokens"),
    )
    # share^2 / sum(share^2) == n_tokens^2 / sum(n_tokens^2): the
    # total cancels, so the weight is ONE division of two exact
    # integers - no engine-order-dependent double summation anywhere
    # (a double sum of shares across sources can differ in the last
    # ulp between engines and flicker the oracle hash).
    powed = per_src.select(
        "*", (F.col("n_tokens") * F.col("n_tokens")).alias("p")
    )
    z = powed.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.sum("p").alias("z")
    )
    return (
        powed.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens") / F.col("tot_tokens")).alias("raw_share"),
            (F.col("p") / F.col("z")).alias("mix_weight"),
        )
    )


SOURCE_MIXTURE_ORACLE_SQL = """
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE)
         / CAST((SELECT sum(n_tokens) FROM per_src) AS DOUBLE) AS raw_share,
       CAST(n_tokens * n_tokens AS DOUBLE)
         / CAST((SELECT sum(n_tokens * n_tokens) FROM per_src) AS DOUBLE)
         AS mix_weight
FROM per_src
"""


# --- sequence packing ------------------------------------------------------

PACK_CTX = 128  # context length in whitespace tokens


def sequence_packing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing (the GPT-style
    tokenization layout): within each source shard, documents are laid
    end-to-end in doc_id order and cut into PACK_CTX-token training
    sequences; each document reports the sequence span it occupies.

    Scale shape: the running offset is a window cumsum PER SOURCE
    SHARD - this is deliberate. A corpus-global ordering would funnel
    the cumsum through one partition; real pipelines pack per shard
    (each shard's sequences are independent), so the plan is one
    shuffle keyed by shard and parallelism = shard count. Downstream
    chunk assembly groups by (source, seq) without re-shuffling the
    fact table."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens_col())
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (cum - F.col("n_tokens")).alias("tok_offset"),
            F.floor((cum - F.col("n_tokens")) / PACK_CTX).alias("first_seq"),
            F.floor((cum - 1) / PACK_CTX).alias("last_seq"),
        )
    )


SEQUENCE_PACKING_ORACLE_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(text, '\\s+')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS tok_offset,
       CAST((cum - n_tokens) // {PACK_CTX} AS BIGINT) AS first_seq,
       CAST((cum - 1) // {PACK_CTX} AS BIGINT) AS last_seq
FROM c
"""


PACK_CTX_SWEEP = (64, 128, 256, 512)  # context lengths to report


def packing_efficiency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste report across candidate context lengths - the
    sizing study a pipeline runs BEFORE committing to a packing layout
    (the cost model behind ``sequence_packing``). For each context
    length: sequences and exact wasted-token counts under (a) pad-per-doc
    (every document rounded up to a full context - the naive
    fine-tuning layout) and (b) concat-and-chunk per source shard
    (only each shard's final partial sequence is padding).

    Scale shape: one scan -> one map-combinable aggregate; the
    per-context arithmetic is a constant-width fold over the
    (n_docs, total_tokens, per-ctx ceil-sums) aggregate row, so the
    report costs the same at 100 TB as the token count itself. The
    per-doc ceil terms sum inside the same aggregate (sum of ceils,
    not ceil of sums), and the shard tails come from one tiny
    per-source subtotal unioned in broadcast range."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens_col())
    base = docs.select("source", n_tokens.alias("n"))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").alias("total_tokens"),
    ]
    for ctx in PACK_CTX_SWEEP:
        aggs.append(
            F.sum(F.ceil(F.col("n") / ctx)).alias(f"padded_seqs_{ctx}")
        )
    per_source = base.groupBy("source").agg(
        F.sum("n").alias("src_tokens")
    )
    packed = per_source.agg(
        *[
            F.sum(F.ceil(F.col("src_tokens") / ctx)).alias(f"packed_seqs_{ctx}")
            for ctx in PACK_CTX_SWEEP
        ]
    )
    totals = base.agg(*aggs).crossJoin(F.broadcast(packed))
    rows = []
    for ctx in PACK_CTX_SWEEP:
        padded = F.col(f"padded_seqs_{ctx}")
        packed_n = F.col(f"packed_seqs_{ctx}")
        tot = F.col("total_tokens")
        rows.append(
            F.struct(
                F.lit(ctx).alias("ctx"),
                F.col("n_docs").alias("n_docs"),
                tot.alias("total_tokens"),
                padded.alias("padded_seqs"),
                (padded * ctx - tot).alias("padded_pad_tokens"),
                packed_n.alias("packed_seqs"),
                (packed_n * ctx - tot).alias("packed_pad_tokens"),
            )
        )
    out = totals.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
    return out


PACKING_EFFICIENCY_ORACLE_SQL = f"""
WITH t AS (
  SELECT source, len(string_split_regex(text, '\\s+')) AS n FROM documents
),
ctx AS (SELECT unnest([{", ".join(str(c) for c in PACK_CTX_SWEEP)}]) AS ctx),
base AS (
  SELECT ctx,
         (SELECT count(*) FROM t) AS n_docs,
         (SELECT sum(n) FROM t) AS total_tokens,
         (SELECT CAST(sum(CAST(ceil(n * 1.0 / ctx) AS BIGINT)) AS BIGINT)
          FROM t) AS padded_seqs,
         (SELECT CAST(sum(CAST(ceil(src_tokens * 1.0 / ctx) AS BIGINT))
                 AS BIGINT)
          FROM (SELECT sum(n) AS src_tokens FROM t GROUP BY source))
           AS packed_seqs
  FROM ctx
)
SELECT ctx,
       n_docs,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       padded_seqs,
       CAST(padded_seqs * ctx - total_tokens AS BIGINT)
         AS padded_pad_tokens,
       packed_seqs,
       CAST(packed_seqs * ctx - total_tokens AS BIGINT)
         AS packed_pad_tokens
FROM base
"""


# --- dedup resolution ------------------------------------------------------


def dedup_resolution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve near-dup clusters to one KEPT document each: connected
    components over the MinHash-LSH pair graph (reuses
    ``dedup_clusters``'s CC), canonical = the longest document in the
    cluster (tie: lowest doc_id) - the "keep best, drop rest" policy a
    corpus dedup stage applies, where `best` is a quality signal
    rather than the arbitrary min-id. Singletons keep themselves.

    Scale shape: CC is the existing O(log^2 n) star-contraction; the
    canonical pick is one map-combinable max_by per cluster joined
    back - two narrow shuffles beyond the pair graph."""
    from .clustering import dedup_clusters_query

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    clusters = dedup_clusters_query(spark, sf_dir).select("doc_id", "cluster_id")
    membered = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        "n_chars",
    )
    canon = membered.groupBy("cluster_id").agg(
        F.max_by(
            F.col("doc_id"), F.struct(F.col("n_chars"), (-F.col("doc_id")))
        ).alias("canonical_id")
    )
    return membered.join(canon, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
    )


def _resolution_oracle() -> str:
    from .clustering import DEDUP_CLUSTERS_ORACLE_SQL

    # Reuse the recursive-CTE component assignment, then pick the
    # longest doc (tie: lowest id) per cluster.
    inner = DEDUP_CLUSTERS_ORACLE_SQL.strip()
    return f"""
WITH comp AS ({inner}),
membered AS (
  SELECT d.doc_id,
         coalesce(c.cluster_id, d.doc_id) AS cluster_id,
         d.n_chars
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
),
ranked AS (
  SELECT doc_id, cluster_id,
         first_value(doc_id) OVER (
             PARTITION BY cluster_id
             ORDER BY n_chars DESC, doc_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS canonical_id
  FROM membered
)
SELECT doc_id, cluster_id, canonical_id,
       doc_id = canonical_id AS keep
FROM ranked
"""


DEDUP_RESOLUTION_ORACLE_SQL = _resolution_oracle()


# --- corpus-level duplicated-n-gram fraction --------------------------------

DUP_NGRAM_N = DECONTAM_N  # same 8-gram family as decontamination
DUP_FRAC_MAX = 0.5  # drop docs more than half made of corpus-duplicated grams


def corpus_dup_ngrams_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of distinct 8-grams that occur in at
    least one OTHER document - the corpus-level duplication signal
    behind exact-substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): suffix-array
    dedup removes shared substrings; this operator measures the same
    sharing at fixed n-gram granularity, which is the shuffle-friendly
    spelling of it.

    Scale shape: documents reduce to per-doc-DISTINCT (doc, gram-hash)
    pairs once (localCheckpoint barrier - both the gram-frequency
    branch and the join-back branch reuse the relation without
    re-hashing). The gram document-frequency is ONE map-combinable
    shuffle keyed by gram; the join back is on the same gram key -
    under AQE the duplicated-gram side (web corpora: a small fraction
    of the distinct-gram space) broadcasts or co-partitions with the
    first shuffle's output. No pair of documents is ever compared
    directly: cost is linear in total grams at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    with_grams = (
        docs.select("doc_id", tokens_col().alias("toks"))
        .select("doc_id", F.explode_outer(_gram_hashes(F.col("toks"))).alias("gram"))
        .localCheckpoint(eager=False)
    )
    # one row per (doc, gram), grams per-doc distinct => count(*) is
    # the gram's document frequency
    dup_grams = (
        with_grams.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("gram", F.lit(1).alias("is_dup"))
    )
    per_doc = (
        with_grams.join(dup_grams, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").alias("n_grams"),
            F.count("is_dup").alias("n_dup_grams"),
        )
    )
    dup_frac = F.col("n_dup_grams") / F.greatest("n_grams", F.lit(1))
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        dup_frac.alias("dup_frac"),
        (dup_frac <= DUP_FRAC_MAX).alias("unique_pass"),
    )


CORPUS_DUP_NGRAMS_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents
),
grams AS (
  SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(w) - {DUP_NGRAM_N} + 1, 0) + 1),
           i -> ('0x' || substr(md5(array_to_string(w[i:i+{DUP_NGRAM_N}-1], ' ')), 1, 15))::BIGINT
         )) AS gs
  FROM tok
),
pairs AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
dup AS (SELECT gram FROM pairs GROUP BY gram HAVING count(*) >= 2),
per_doc AS (
  SELECT p.doc_id,
         count(p.gram) AS n_grams,
         count(d.gram) AS n_dup_grams
  FROM pairs p LEFT JOIN dup d ON p.gram = d.gram
  GROUP BY p.doc_id
)
SELECT doc_id, n_grams, n_dup_grams,
       n_dup_grams / greatest(n_grams, 1) AS dup_frac,
       n_dup_grams / greatest(n_grams, 1) <= {DUP_FRAC_MAX} AS unique_pass
FROM per_doc
"""


# --- unigram-LM rarity score (perplexity-filter proxy) ----------------------

IPF_SCALE = 1_000_000  # fixed-point scale for exact inverse-frequency
RARITY_MIN = 1.0  # mean inverse probability is >= 1 by construction
RARITY_MAX = 50_000.0  # drop gibberish tails


def lm_rarity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean inverse unigram probability - the engine's
    perplexity-filter stage (Wenzek et al. 2019, CCNet, filters on a
    KenLM score; the unsmoothed unigram arithmetic-mean variant keeps
    the same too-common/too-rare ranking while staying exactly
    portable across engines). For token w with corpus count c(w) and
    corpus size N, the token's inverse probability N/c(w) is computed
    in fixed-point integer arithmetic (floor(N*1e6 / c)), summed
    exactly as BIGINT, and divided ONCE at the end - no float sum
    whose order could differ between engines. Common-word boilerplate
    scores near 1; random strings score near N.

    Scale shape: tokens reduce to per-doc word counts (one
    map-combinable shuffle keyed by (doc, word-hash)); the corpus
    frequency table is a second map-combinable shuffle keyed by
    word-hash (vocab-sized output, Zipf-bounded); the join back is
    vocab x per-doc-distinct-words on the word key; the scalar N
    broadcasts. Nothing is ever per-token past the first combine."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        # xx_word_hash (r15): the word hash is a groupBy/join key only
        # (counts out); the md5 oracle matches under injectivity.
        F.explode_outer(
            F.transform(tokens_col(), lambda w: xx_word_hash(w))
        ).alias("w"),
    ).localCheckpoint(eager=False)
    doc_words = words.filter(F.col("w").isNotNull()).groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("c_dw")
    )
    freq = doc_words.groupBy("w").agg(F.sum("c_dw").alias("c_w"))
    total = freq.agg(F.sum("c_w").alias("n_total"))
    scored = (
        doc_words.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c_dw").alias("n_tokens"),
            F.sum(
                F.col("c_dw")
                * F.floor(F.lit(IPF_SCALE) * F.col("n_total") / F.col("c_w")).cast(
                    "long"
                )
            ).alias("ipf_sum"),
        )
    )
    rarity = F.col("ipf_sum") / (F.col("n_tokens") * F.lit(float(IPF_SCALE)))
    all_docs = docs.select("doc_id")
    return all_docs.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce(rarity, F.lit(0.0)).alias("mean_ipf"),
        (
            F.coalesce(rarity, F.lit(0.0)).between(RARITY_MIN, RARITY_MAX)
        ).alias("rarity_pass"),
    )


LM_RARITY_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_transform(string_split_regex(text, '\\s+'),
                x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS w
  FROM documents
),
doc_words AS (
  SELECT doc_id, w, count(*) AS c_dw FROM tok GROUP BY doc_id, w
),
freq AS (SELECT w, sum(c_dw) AS c_w FROM doc_words GROUP BY w),
total AS (SELECT sum(c_w) AS n_total FROM freq),
scored AS (
  SELECT doc_id,
         sum(c_dw) AS n_tokens,
         sum(c_dw * CAST(floor({IPF_SCALE} * n_total / c_w) AS BIGINT)) AS ipf_sum
  FROM doc_words JOIN freq USING (w) CROSS JOIN total
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       coalesce(s.ipf_sum / (s.n_tokens * {float(IPF_SCALE)}), 0.0) AS mean_ipf,
       coalesce(s.ipf_sum / (s.n_tokens * {float(IPF_SCALE)}), 0.0)
         BETWEEN {RARITY_MIN} AND {RARITY_MAX} AS rarity_pass
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


# --- end-to-end curation funnel --------------------------------------------


def curation_funnel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-curation decision per document: quality rules ->
    repetition rules -> exact dedup -> benchmark decontamination,
    composed in the order a production pipeline applies them, with the
    first failing stage named per doc. This is the end-to-end answer
    to "which of my 100 TB survives, and why was each drop dropped" -
    the drop-reason histogram is the first thing a curation run
    reports (C4, Gopher, RefinedWeb all publish exactly this funnel).

    Scale shape: ONE scan of the corpus. Every stage's signal is a
    per-row expression (gopher metrics, repetition gram algebra, the
    exact-dedup signature, the decontamination gram hashes), so a
    single projection computes them all and a localCheckpoint barrier
    holds the narrow derived relation (doc_id, two bools, one md5,
    gram-hash array - no text) for its three consumers. At 100 TB
    the naive per-stage composition re-reads and RE-TOKENIZES the
    corpus once per stage - four full passes of the most expensive
    CPU in the pipeline; sharing the scan is the difference between
    one tokenization pass and four. The dedup keep-set is a partial-
    agg groupBy on the signature joined back on doc_id (measured
    faster than a window min, which sorts the full relation); the
    contamination join is gram-keyed against the tiny benchmark side,
    AQE-broadcast.

    `benchmark` docs (the decontamination holdout) are excluded from
    training by definition - they fail first with 'benchmark'.

    The funnel's quality stage reuses :func:`gopher_quality_query`'s
    METRIC columns but drops the stopword rule from the conjunction:
    the synthetic corpus contains no English stopwords at all
    (measured 0% pass on that one rule), which would collapse the
    whole funnel into 'gopher' and leave every later stage untested.
    A real deployment keeps the full conjunction."""
    docs = load_table(spark, sf_dir, "documents")
    # Token array staged in its own select (r15): the gram slice hash
    # references `toks` inside an HOF lambda, which re-evaluates outer
    # EXPRESSIONS per element - a column reference is free (README
    # lesson #1 / xx_gram_slice_hashes contract).
    docs = docs.select("doc_id", "text", tokens_col().alias("toks"))
    toks = F.col("toks")

    # -- gopher metrics (per-row; stopword rule dropped, see above) --
    n_words = F.size(toks)
    mean_len = (
        F.aggregate(F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x)
        / n_words
    )
    n_hash = F.length("text") - F.length(F.regexp_replace("text", "#", ""))
    n_ellipsis = (
        F.length("text") - F.length(F.regexp_replace("text", r"\.\.\.", ""))
    ) / 3
    gopher_pass = (
        n_words.between(50, 100_000)
        & mean_len.between(3, 10)
        & (((n_hash + n_ellipsis) / n_words) <= 0.1)
        & ((F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]"))) / n_words) >= 0.8)
    )
    # -- exact-dedup signature + decontamination grams (per-row) --
    # Staged selects so wh/g2/g3 stay single-evaluation columns (same
    # CollapseProject constraint as repetition_filter_query).
    from .text import XX_HASH_MASK

    hashed = docs.select(
        "doc_id",
        gopher_pass.alias("gopher_pass"),
        # r15: the signature only feeds the groupBy(sig) keep-set
        # (injective-equivalent to the oracle's md5-of-joined-string
        # over the same sorted distinct word set), so hash the array
        # directly - no re-split, no joined string, no md5.
        F.xxhash64(F.array_sort(F.array_distinct(toks)))
        .bitwiseAND(F.lit(XX_HASH_MASK))
        .alias("sig"),
        _gram_hashes(toks).alias("grams"),
        # xx_word_hash (r15): wh feeds the repetition-gram algebra only
        # (fractions out); see xx_word_hash for the safety contract.
        F.transform(toks, lambda w: xx_word_hash(w)).alias("wh"),
    )
    grammed = hashed.select(
        "doc_id", "gopher_pass", "sig", "grams",
        _gram2(F.col("wh")).alias("g2"), _gram3(F.col("wh")).alias("g3"),
    )
    top_frac = _longest_run(F.col("g2")) / F.greatest(F.size("g2"), F.lit(1))
    dup_g3_frac = (
        (F.size("g3") - F.size(F.array_distinct("g3")))
        / F.greatest(F.size("g3"), F.lit(1))
    )
    base = grammed.select(
        "doc_id",
        "gopher_pass",
        ((top_frac <= TOP_GRAM_MAX_FRAC) & (dup_g3_frac <= DUP_GRAM_MAX_FRAC)).alias(
            "rep_pass"
        ),
        "sig",
        "grams",
    ).localCheckpoint(eager=False)

    # -- dedup keep: partial-agg groupBy to a tiny keep-set, broadcast
    # back (beats a window min: no sort of the full relation by sig) --
    keep_set = (
        base.groupBy("sig")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("in_keep"))
    )

    # -- decontamination: gram join against the tiny benchmark side --
    pairs = base.select("doc_id", F.explode_outer("grams").alias("gram"))
    bench_grams = (
        pairs.filter(F.col("doc_id") % BENCH_MOD == 0).select("gram").distinct()
    )
    leaked = (
        pairs.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(bench_grams, "gram")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    joined = (
        base.select("doc_id", "gopher_pass", "rep_pass")
        .join(keep_set, "doc_id", "left")
        .withColumn("dedup_keep", F.coalesce("in_keep", F.lit(False)))
        .drop("in_keep")
        .join(leaked, "doc_id", "left")
        .select(
            "doc_id",
            "gopher_pass",
            "rep_pass",
            "dedup_keep",
            (
                ~F.when(F.col("doc_id") % BENCH_MOD == 0, F.lit(True)).otherwise(
                    F.coalesce("contaminated", F.lit(False))
                )
            ).alias("decontam_pass"),
            (F.col("doc_id") % BENCH_MOD == 0).alias("benchmark"),
        )
    )
    first_fail = (
        F.when(F.col("benchmark"), "benchmark")
        .when(~F.col("gopher_pass"), "gopher")
        .when(~F.col("rep_pass"), "repetition")
        .when(~F.col("dedup_keep"), "duplicate")
        .when(~F.col("decontam_pass"), "contaminated")
        .otherwise("kept")
    )
    return joined.select(
        "doc_id",
        "gopher_pass",
        "rep_pass",
        "dedup_keep",
        "decontam_pass",
        first_fail.alias("first_fail"),
        (first_fail == "kept").alias("final_keep"),
    )


def _funnel_oracle() -> str:
    from .dedup import DEDUP_EXACT_ORACLE_SQL

    return f"""
WITH gq_full AS ({GOPHER_QUALITY_ORACLE_SQL.strip()}),
gq AS (
  SELECT doc_id,
         (n_words BETWEEN 50 AND 100000)
         AND (mean_word_len BETWEEN 3 AND 10)
         AND symbol_ratio <= 0.1
         AND alpha_frac >= 0.8 AS gopher_pass
  FROM gq_full
),
rep AS ({REPETITION_FILTER_ORACLE_SQL.strip()}),
de AS ({DEDUP_EXACT_ORACLE_SQL.strip()}),
dc AS ({DECONTAMINATION_ORACLE_SQL.strip()}),
flags AS (
  SELECT d.doc_id,
         gq.gopher_pass,
         rep.rep_pass,
         (k.keep_doc_id IS NOT NULL) AS dedup_keep,
         NOT coalesce(dc.contaminated, TRUE) AS decontam_pass,
         d.doc_id % {BENCH_MOD} = 0 AS benchmark
  FROM documents d
  JOIN gq USING (doc_id)
  JOIN rep USING (doc_id)
  LEFT JOIN (SELECT keep_doc_id FROM de) k ON d.doc_id = k.keep_doc_id
  LEFT JOIN dc ON d.doc_id = dc.doc_id
)
SELECT doc_id, gopher_pass, rep_pass, dedup_keep, decontam_pass,
       CASE WHEN benchmark THEN 'benchmark'
            WHEN NOT gopher_pass THEN 'gopher'
            WHEN NOT rep_pass THEN 'repetition'
            WHEN NOT dedup_keep THEN 'duplicate'
            WHEN NOT decontam_pass THEN 'contaminated'
            ELSE 'kept' END AS first_fail,
       CASE WHEN benchmark THEN 'benchmark'
            WHEN NOT gopher_pass THEN 'gopher'
            WHEN NOT rep_pass THEN 'repetition'
            WHEN NOT dedup_keep THEN 'duplicate'
            WHEN NOT decontam_pass THEN 'contaminated'
            ELSE 'kept' END = 'kept' AS final_keep
FROM flags
"""


CURATION_FUNNEL_ORACLE_SQL = _funnel_oracle()


# --- DSIR importance resampling --------------------------------------------

#: Hashed bag-of-words feature space (DSIR, Xie et al. 2023, "Data
#: Selection for Language Models via Importance Resampling" - the
#: paper hashes n-grams into 10^4 buckets; the principle is the bucket
#: count bounds the model size independent of vocabulary).
DSIR_BUCKETS = 128
#: Fixed-point scale for the per-bucket target/raw probability ratio.
DSIR_SCALE = 1 << 20
#: The target domain: English documents stand in for the paper's
#: high-quality target corpus (Wikipedia+books in the original).
DSIR_TARGET_LANG = "en"
#: How many documents the resampling keeps.
DSIR_TOP_K = 100


def importance_resampling_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): score every raw
    document by how target-like its hashed bag-of-words is, then keep
    the top-K. The paper computes log(p_target/p_raw) under two
    hashed-unigram models and Gumbel-resamples; this operator keeps
    the same estimator structure but replaces the float log-ratio
    with a fixed-point integer ratio (add-one smoothed,
    ``(tgt+1)*SCALE div (raw+1)``) and the stochastic resample with a
    deterministic top-K - every arithmetic step is BIGINT, so the
    ranking is bit-identical across engines (same reason lm_rarity
    avoids float perplexity).

    Per-doc score = mean per-token bucket ratio (sum div token count),
    so long documents are not favored by accumulation.

    Scale design: ONE pass over the corpus builds both bucket models
    (conditional count in the same aggregate - target docs are a
    subset of raw, no second scan); the model is DSIR_BUCKETS rows,
    broadcast back; per-doc scoring is a map-side join + one
    map-combinable sum; the final selection is TakeOrderedAndProject
    (per-partition top-K, never a global sort). At 100 TB the only
    shuffles are the bucket-count roll-up and the per-doc sum - both
    map-combinable on bounded key spaces (buckets / doc ids).

    Reference tie-in: no counterpart (the reference selects data by
    recency filters only, ``get_elastic_data.py:61-68``); this is part
    of the training-data curation family (SURVEY §2 extensions).
    """
    docs = load_table(spark, sf_dir, "documents")
    occ = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(tokens_col()).alias("tok"),
        )
        .select(
            "doc_id",
            "lang",
            (md5_word_hash(F.col("tok"), seed=F.lit("dsir")) % DSIR_BUCKETS)
            .cast("int")
            .alias("bucket"),
        )
    )
    model = occ.groupBy("bucket").agg(
        F.count("*").alias("raw_cnt"),
        F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias("tgt_cnt"),
    )
    weights = model.select(
        "bucket",
        F.expr(f"(tgt_cnt + 1) * {DSIR_SCALE} div (raw_cnt + 1)").alias("w"),
    )
    per_doc = (
        occ.groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("w")).alias("w_sum"),
            F.sum("cnt").alias("n_tok"),
        )
        .select(
            "doc_id", F.expr("w_sum div n_tok").alias("dsir_weight"), "n_tok"
        )
    )
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "dsir_weight", "n_tok")
        .orderBy(F.desc("dsir_weight"), "doc_id")
        .limit(DSIR_TOP_K)
    )


IMPORTANCE_RESAMPLING_ORACLE_SQL = f"""
WITH occ AS (
  SELECT doc_id, lang,
         CAST(CAST(('0x' || substr(md5('dsir' || '|' || tok), 1, 15)) AS BIGINT)
              % {DSIR_BUCKETS} AS INTEGER) AS bucket
  FROM (SELECT doc_id, lang, unnest(string_split_regex(text, '\\s+')) AS tok
        FROM documents)
),
model AS (
  SELECT bucket, count(*) AS raw_cnt,
         count(*) FILTER (lang = '{DSIR_TARGET_LANG}') AS tgt_cnt
  FROM occ GROUP BY bucket
),
weights AS (
  SELECT bucket, (tgt_cnt + 1) * {DSIR_SCALE} // (raw_cnt + 1) AS w
  FROM model
),
per_doc AS (
  -- sums cast to BIGINT: DuckDB widens sum(BIGINT) to HUGEINT
  SELECT doc_id, CAST(sum(cnt * w) AS BIGINT) AS w_sum,
         CAST(sum(cnt) AS BIGINT) AS n_tok
  FROM (SELECT doc_id, bucket, count(*) AS cnt FROM occ GROUP BY 1, 2)
  JOIN weights USING (bucket)
  GROUP BY doc_id
)
SELECT p.doc_id, d.lang, w_sum // n_tok AS dsir_weight, n_tok
FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
ORDER BY dsir_weight DESC, p.doc_id
LIMIT {DSIR_TOP_K}
"""


# --- adaptive per-language quality thresholds ------------------------------
#
# Fixed quality cutoffs (Gopher-style constants) systematically
# over-prune low-resource languages whose score distribution sits
# lower: a punctuation-ratio threshold tuned on English discards
# well-formed text in languages with different orthography. The
# adaptive filter instead computes the threshold per language from the
# corpus itself - drop the bottom decile *within each language* - so
# pruning pressure is uniform across languages (the per-language
# calibration argument in Laurencon et al. 2022, "The BigScience ROOTS
# Corpus", §3.1).
#
# Scale shape: quality features are pure column expressions over one
# scan; the decile is a window percent_rank partitioned by lang - ONE
# shuffle keyed by a low-cardinality column. At 100 TB the lang
# partition is skewed (English dominates); percent_rank needs a total
# sort per partition, so the scale path swaps the window for an
# approx_percentile(lang) aggregate broadcast back - same semantics
# within sketch error, no giant sort. The exact-rank form here is the
# oracle-checkable contract.

ADAPTIVE_QUALITY_DROP_PCT = 0.10


def adaptive_quality_filter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents at or above their language's 10th quality
    percentile; emit the per-doc percentile so downstream mixers can
    re-weight. percent_rank = (rank-1)/(n-1) is ANSI-identical in
    Spark and DuckDB, and the quality score is bit-identical
    float64 arithmetic in both engines, so assignment is exact.

    Null ordering is PINNED on both sides (asc_nulls_first here,
    NULLS FIRST in the oracle): quality_score is NULL for empty-text
    docs (0/0 in the punctuation ratio) and Spark's default NULLS
    FIRST differs from DuckDB's NULLS LAST - unpinned, rank parity
    would silently break on the first degenerate document. NULLs
    sorting first means empty docs land in the bottom decile and are
    pruned, which is the intended semantics for unscorable text."""
    from .text import quality_score_col

    scored = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", quality_score_col().alias("quality_score")
    )
    pct = F.percent_rank().over(
        Window.partitionBy("lang").orderBy(
            F.col("quality_score").asc_nulls_first(), F.col("doc_id").asc()
        )
    )
    return (
        scored.select("doc_id", "lang", "quality_score", pct.alias("quality_pct"))
        .where(F.col("quality_pct") >= ADAPTIVE_QUALITY_DROP_PCT)
    )


from .text import STOPWORDS as _STOPWORDS, _sw_list as _sw

ADAPTIVE_QUALITY_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, text, string_split_regex(text, '\\s+') AS w FROM documents
),
scored AS (
  SELECT doc_id, lang,
         least(1.0, len(w) / 100.0)
           * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) / length(text))
           * (0.25 + 0.75 * least(1.0,
                (len(list_filter(w, x -> x IN ({_sw(_STOPWORDS)}))) / len(w)) * 5))
           AS quality_score
  FROM tok
),
ranked AS (
  SELECT doc_id, lang, quality_score,
         percent_rank() OVER (PARTITION BY lang
                              ORDER BY quality_score ASC NULLS FIRST, doc_id ASC)
           AS quality_pct
  FROM scored
)
SELECT doc_id, lang, quality_score, quality_pct
FROM ranked WHERE quality_pct >= 0.10
"""


# --- bigram LM fluency scoring (stupid backoff) ----------------------------
#
# lm_rarity's unigram inverse-frequency catches too-rare vocabulary
# but not broken word ORDER - "the of and is a" scores as perfectly
# common unigrams. The CCNet recipe (Wenzek et al. 2019) trains an LM
# on a clean corpus and filters the crawl by perplexity; this is that
# stage with a bigram stupid-backoff model (Brants et al. 2007 - the
# web-scale LM designed for exactly this setting: no discounting
# hyperparameters, counts only, embarrassingly distributable).
#
# Portability design (same fixed-point discipline as lm_rarity):
# surprise of a transition is the inverse conditional probability as
# an exact BIGINT - floor(S*c(prev)/c(prev,cur)) on the bigram path,
# floor(5*S*N/(2*c(cur))) on the backoff path (1/0.4 = 5/2 exactly),
# floor(S*N/1) for OOV - summed exactly and divided once. Train/eval
# split by doc_id so held-out docs genuinely hit unseen bigrams and
# exercise the backoff (scoring the training corpus never would).
#
# Scale shape: counts are two map-combinable shuffles (bigram-keyed,
# unigram-keyed) producing Zipf-bounded model tables; the scoring
# joins are per-doc-DISTINCT bigram multisets against those tables
# (model side shrinks to the eval side's key set under AQE); the
# scalar N broadcasts. Nothing is per-token past the first combine.

LM_EVAL_MOD = 10  # doc_id % LM_EVAL_MOD == 0 is the held-out eval slice


def bigram_lm_score_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # The tokenize+hash pass is the expensive CPU; checkpoint the
    # hashed-token relation so the bigram AND unigram branches both
    # derive from one materialization (explodes are cheap, hashing
    # is not) - one corpus scan, one tokenization. xx_word_hash (r15):
    # word hashes are join/groupBy keys only (counts out); the md5
    # oracle matches under injectivity.
    hashed = docs.select(
        "doc_id", F.transform(tokens_col(), lambda w: xx_word_hash(w)).alias("wh")
    ).localCheckpoint(eager=False)
    n1 = F.greatest(F.size("wh") - 1, F.lit(0))
    pairs = hashed.select(
        "doc_id",
        F.explode_outer(
            F.zip_with(
                F.slice("wh", 1, n1),
                F.slice("wh", 2, n1),
                lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    is_train = F.col("doc_id") % LM_EVAL_MOD != 0

    train_words = (
        hashed.filter(is_train)
        .select(F.explode_outer("wh").alias("w"))
        .filter(F.col("w").isNotNull())
    )
    unis = train_words.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    total = unis.agg(F.sum("c_w").alias("n_total"))
    bigs = (
        pairs.filter(is_train & F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c_pc"))
    )

    doc_bg = (
        pairs.filter(~is_train & F.col("prev").isNotNull())
        .groupBy("doc_id", "prev", "cur")
        .agg(F.count(F.lit(1)).alias("c_db"))
    )
    S = IPF_SCALE
    scored = (
        doc_bg.join(bigs, ["prev", "cur"], "left")
        .join(unis.select(F.col("w").alias("prev"), F.col("c_w").alias("c_prev")), "prev", "left")
        .join(unis.select(F.col("w").alias("cur"), F.col("c_w").alias("c_cur")), "cur", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "c_db",
            F.when(
                F.col("c_pc").isNotNull(),
                F.floor(F.lit(S) * F.col("c_prev") / F.col("c_pc")),
            )
            .when(
                F.col("c_cur").isNotNull(),
                F.floor(F.lit(5 * S) * F.col("n_total") / (F.lit(2) * F.col("c_cur"))),
            )
            .otherwise(F.lit(S) * F.col("n_total"))
            .cast("long")
            .alias("surprise"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c_db").alias("n_bigrams"),
            F.sum(F.col("c_db") * F.col("surprise")).alias("surprise_sum"),
        )
    )
    eval_docs = docs.select("doc_id").filter(~is_train)
    mean_surprise = F.col("surprise_sum") / (F.col("n_bigrams") * F.lit(float(S)))
    return eval_docs.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce(mean_surprise, F.lit(0.0)).alias("mean_surprise"),
    )


BIGRAM_LM_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(string_split_regex(text, '\\s+'),
                        x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS wh
  FROM documents
),
pairs AS (
  SELECT doc_id, unnest(list_transform(
           range(2, len(wh) + 1),
           i -> struct_pack(prev := wh[i-1], cur := wh[i]))) AS bg
  FROM tok WHERE len(wh) >= 2
),
p2 AS (SELECT doc_id, bg.prev AS prev, bg.cur AS cur FROM pairs),
unis AS (
  SELECT w, count(*) AS c_w FROM (
    SELECT unnest(wh) AS w FROM tok WHERE doc_id % {LM_EVAL_MOD} != 0
  ) GROUP BY w
),
total AS (SELECT sum(c_w) AS n_total FROM unis),
bigs AS (
  SELECT prev, cur, count(*) AS c_pc FROM p2
  WHERE doc_id % {LM_EVAL_MOD} != 0 GROUP BY prev, cur
),
doc_bg AS (
  SELECT doc_id, prev, cur, count(*) AS c_db FROM p2
  WHERE doc_id % {LM_EVAL_MOD} = 0 GROUP BY doc_id, prev, cur
),
scored AS (
  SELECT d.doc_id, d.c_db,
         CASE
           WHEN b.c_pc IS NOT NULL
             THEN CAST(floor({IPF_SCALE} * up.c_w / b.c_pc) AS BIGINT)
           WHEN uc.c_w IS NOT NULL
             THEN CAST(floor({5 * IPF_SCALE} * t.n_total / (2 * uc.c_w)) AS BIGINT)
           ELSE {IPF_SCALE} * t.n_total
         END AS surprise
  FROM doc_bg d
  LEFT JOIN bigs b ON d.prev = b.prev AND d.cur = b.cur
  LEFT JOIN unis up ON d.prev = up.w
  LEFT JOIN unis uc ON d.cur = uc.w
  CROSS JOIN total t
),
agg AS (
  SELECT doc_id, CAST(sum(c_db) AS BIGINT) AS n_bigrams,
         CAST(sum(c_db * surprise) AS BIGINT) AS surprise_sum
  FROM scored GROUP BY doc_id
)
SELECT e.doc_id,
       coalesce(a.n_bigrams, 0) AS n_bigrams,
       coalesce(a.surprise_sum / (a.n_bigrams * {float(IPF_SCALE)}), 0.0)
         AS mean_surprise
FROM (SELECT doc_id FROM documents WHERE doc_id % {LM_EVAL_MOD} = 0) e
LEFT JOIN agg a ON e.doc_id = a.doc_id
"""


# --- cross-corpus overlap matrix -------------------------------------------
#
# Before mixing N sources into a training blend, measure how much they
# overlap: near-identical sources double-weight their content (the
# implicit-duplication failure mode source-mixture weighting cannot
# see). The overlap of two sources is the exact Jaccard similarity of
# their distinct DECONTAM_N-gram sets - corpus-level (not doc-level,
# which is corpus_dup_ngrams) and pairwise across sources.
#
# Scale shape: the corpus reduces to per-source-DISTINCT (source,
# gram) rows - one shuffle. The pair stage is a gram-keyed self-join:
# per gram the fanout is (sources containing it choose 2), bounded by
# the SOURCE cardinality (dozens), never by corpus size; the
# source-pair intersection counts are a map-combinable re-aggregation
# on a (|S| choose 2)-row output. Set sizes broadcast back. At 100 TB
# the only heavy operand is the distinct - exactly the same shape the
# dedup family already pays.


def cross_corpus_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, n_a, n_b, n_shared, jaccard) for every
    unordered source pair with at least one shared gram."""
    docs = load_table(spark, sf_dir, "documents")
    source_grams = (
        docs.select("source", tokens_col().alias("toks"))
        .select("source", F.explode_outer(_gram_hashes(F.col("toks"))).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = source_grams.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (
        source_grams.join(
            source_grams.select(
                F.col("source").alias("source_b"), F.col("gram").alias("gram")
            ),
            "gram",
        )
        .filter(F.col("source") < F.col("source_b"))
        .groupBy(F.col("source").alias("source_a"), "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes.select(F.col("source").alias("source_a"), F.col("n_grams").alias("n_a")), "source_a")
        .join(sizes.select(F.col("source").alias("source_b"), F.col("n_grams").alias("n_b")), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_shared",
            (
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


CROSS_CORPUS_OVERLAP_ORACLE_SQL = f"""
WITH tok AS (
  SELECT source, string_split_regex(text, '\\s+') AS w FROM documents
),
sg AS (
  SELECT DISTINCT source, gram FROM (
    SELECT source, unnest(list_distinct(list_transform(
             range(1, greatest(len(w) - {DECONTAM_N} + 1, 0) + 1),
             i -> ('0x' || substr(md5(array_to_string(w[i:i+{DECONTAM_N}-1], ' ')), 1, 15))::BIGINT
           ))) AS gram
    FROM tok
  )
),
sizes AS (SELECT source, count(*) AS n_grams FROM sg GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b, sa.n_grams AS n_a, sb.n_grams AS n_b,
       s.n_shared,
       s.n_shared / (sa.n_grams + sb.n_grams - s.n_shared) AS jaccard
FROM shared s
JOIN sizes sa ON s.source_a = sa.source
JOIN sizes sb ON s.source_b = sb.source
"""
