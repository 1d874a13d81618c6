"""SentencePiece-style subword vocabulary training (unigram-LM
family: Kudo 2018, "Subword Regularization") - the second tokenizer
trainer next to :mod:`.bpe`, completing the tokenizer-training pair an
LLM data pipeline needs (BPE learns merges bottom-up; the unigram
family starts from a LARGE seed vocabulary and iteratively SHRINKS it
by usefulness under the current segmentation).

Algorithm (the integer-exact miniature of SentencePiece's trainer):

  1. seed: every substring of length 1..`MAX_PIECE_LEN` of the
     distinct-word table, weighted by word count; the top
     `SEED_MULTIS` multi-char pieces by (corpus frequency, piece) form
     the starting vocabulary next to the protected single characters
     (SentencePiece seeds from frequent substrings the same way).
  2. EM-style refinement rounds, each: (E) segment every distinct word
     under the current vocabulary, (M) recount piece usage weighted by
     word counts, then PRUNE to the round's target size - the
     shrinking schedule `PRUNE_SCHEDULE`, mirroring SentencePiece's
     shrinking_factor loop.
  3. final segmentation under the surviving vocabulary yields the
     trained piece table and the corpus encoder.

Exactness across engines: true unigram-LM Viterbi scores are products
of probabilities - float order-of-evaluation poison for a value-hash
oracle. The E-step here is deterministic greedy longest-match
(WordPiece's MaxMatch inference rule) instead, which keeps every
number in the pipeline a BIGINT (usage sums) or a string compare, so
the DuckDB twin (recursive-CTE walk per round) is bit-identical. The
loop SHAPE (big seed -> segment -> recount -> shrink) is the
unigram-LM trainer's; only the segmentation scoring is the integer
stand-in - documented honestly here rather than hidden behind a
float tolerance.

Scale shape (the same argument as :mod:`.bpe`): the corpus collapses
once to the Zipf-bounded (word, cnt) relation - the only corpus-sized
shuffle. Every EM round then runs on the distinct-word table: a fold
per word (no shuffle), a piece-usage groupBy on a vocabulary-sized
relation, and a driver collect of at most `SEED_MULTIS` piece strings
(the broadcast-vocab pattern; SentencePiece itself holds the vocab in
memory). Encoding joins distinct words back to the corpus exactly
like bpe_encode: encode once per vocabulary entry, never once per
occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .bpe import _WORD_RE, _vocab
from .text import tokens_col

MAX_PIECE_LEN = 4
SEED_MULTIS = 48
PRUNE_SCHEDULE = (32, 24)  # per-round multi-char vocab targets


def _segment(words: DataFrame, vstr: str) -> DataFrame:
    """words(word, cnt) -> (word, cnt, pieces): greedy longest-match
    segmentation as a pure ``F.aggregate`` fold over the character
    positions - no UDF, no shuffle. ``vstr`` is the current
    multi-char vocabulary as a ``|piece|``-delimited literal (both
    delimiters owned per piece, so substring membership is exact);
    single characters are the implicit fallback, so the fold always
    advances and always terminates."""
    word = F.col("word")

    def has(piece):
        return F.contains(F.lit(vstr), F.concat(F.lit("|"), piece, F.lit("|")))

    def step(acc, i):
        cur = acc.getField("cur")
        # build the when-chain short-to-long so the LONGEST match ends
        # up outermost (checked first): greedy MaxMatch
        pick = F.lit(1)
        for ln in range(2, MAX_PIECE_LEN + 1):
            cand = F.substr(word, cur, F.lit(ln))
            pick = F.when((F.length(cand) == ln) & has(cand), ln).otherwise(pick)
        piece = F.substr(word, cur, pick)
        advanced = F.struct(
            (cur + pick).alias("cur"),
            F.concat(acc.getField("pieces"), F.array(piece)).alias("pieces"),
        )
        return F.when(i == cur, advanced).otherwise(acc)

    zero = F.struct(
        F.lit(1).alias("cur"),
        F.array().cast("array<string>").alias("pieces"),
    )
    folded = F.aggregate(
        F.sequence(F.lit(1), F.length(word)), zero, step, lambda a: a.getField("pieces")
    )
    return words.select("word", "cnt", folded.alias("pieces"))


def _usage(seg: DataFrame) -> DataFrame:
    """(piece, usage): piece occurrences over the segmentation,
    weighted by word count - the M-step recount."""
    return (
        seg.select("cnt", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("usage"))
    )


def _top_multis(ranked: DataFrame, by: str, k: int) -> list[str]:
    """The round's surviving multi-char pieces: top-k by (weight desc,
    piece asc) - a driver collect of at most SEED_MULTIS tiny strings
    (the broadcast-vocab pattern, same as bpe's best-pair collect)."""
    rows = (
        ranked.filter(F.length("piece") >= 2)
        .orderBy(F.col(by).desc(), "piece")
        .limit(k)
        .collect()
    )
    return [r["piece"] for r in rows]


def _vstr(multis: list[str]) -> str:
    return "|" + "|".join(sorted(multis)) + "|" if multis else "||"


_UNIGRAM_CACHE: dict = {}


def _train(spark: SparkSession, sf_dir: str):
    """Returns (final_seg, final_usage, final_multis): the segmented
    distinct-word table under the final vocabulary, its usage table,
    and the surviving multi-char pieces - shared by the train-table
    query and the corpus encoder (cached per session x corpus, like
    bpe's _TRAIN_CACHE)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _UNIGRAM_CACHE:
        return _UNIGRAM_CACHE[key]
    words = _vocab(spark, sf_dir).localCheckpoint(eager=True)

    # seed: all substrings len 1..MAX_PIECE_LEN of every distinct
    # word, weighted by word count
    n = F.length("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda s: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(MAX_PIECE_LEN), n - s + 1)),
                lambda ln: F.substr(F.col("word"), s, ln),
            ),
        )
    )
    seeds = (
        words.select("cnt", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("freq"))
    )
    multis = _top_multis(seeds, "freq", SEED_MULTIS)

    # EM-style shrink rounds: segment -> recount -> prune
    for target in PRUNE_SCHEDULE:
        seg = _segment(words, _vstr(multis))
        multis = _top_multis(_usage(seg), "usage", target)

    final_seg = _segment(words, _vstr(multis)).localCheckpoint(eager=True)
    final_usage = _usage(final_seg)
    _UNIGRAM_CACHE[key] = (final_seg, final_usage, multis)
    return _UNIGRAM_CACHE[key]


def unigram_train_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the trained subword vocabulary - every
    surviving multi-char piece plus the protected single characters,
    with its usage under the final segmentation and a deterministic
    rank. (usage can be legitimately 0: a piece or character wholly
    shadowed by longer pieces after the last prune.)"""
    final_seg, final_usage, multis = _train(spark, sf_dir)
    singles = final_seg.select(
        F.explode(F.split("word", "")).alias("piece")
    ).filter(F.col("piece") != "").distinct()
    multis_df = spark.createDataFrame(
        [(p,) for p in multis] or [(None,)], "piece string"
    ).filter(F.col("piece").isNotNull())
    vocab = singles.union(multis_df).distinct()
    ranked = (
        vocab.join(final_usage, "piece", "left")
        .select(
            "piece",
            F.length("piece").alias("piece_len"),
            F.coalesce("usage", F.lit(0)).alias("usage"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("usage").desc(), "piece")
    return ranked.withColumn("vocab_rank", F.row_number().over(w))


def tokenizer_fertility_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the tokenizer-evaluation twin the two trainers
    share (VERDICT r6 item 4's acceptance check as a first-class,
    oracle-checked entry, not just a pytest): per source, the corpus
    word count and the token counts + fertility (tokens per word)
    under BOTH the learned BPE merges and the trained unigram
    vocabulary. Both training passes are session-cached, and the
    corpus-sized work is one explode + two broadcastable vocab joins +
    one aggregation - no re-training, no re-folding."""
    from .bpe import _train as _bpe_train

    _, bpe_vocab = _bpe_train(spark, sf_dir)
    bpe_len = bpe_vocab.select("word", F.size("syms").alias("bpe_sub"))
    final_seg, _, _ = _train(spark, sf_dir)
    uni_len = final_seg.select("word", F.size("pieces").alias("uni_sub"))
    docs = load_table(spark, sf_dir, "documents")
    doc_words = (
        docs.select("source", F.explode_outer(tokens_col()).alias("tok"))
        .select("source", F.lower("tok").alias("word"))
        .filter(F.col("word").rlike(_WORD_RE))
    )
    return (
        doc_words.join(bpe_len, "word")
        .join(uni_len, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("bpe_sub").alias("bpe_tokens"),
            F.sum("uni_sub").alias("unigram_tokens"),
        )
        .select(
            "source",
            "n_words",
            "bpe_tokens",
            "unigram_tokens",
            (F.col("bpe_tokens") / F.col("n_words")).alias("bpe_fertility"),
            (F.col("unigram_tokens") / F.col("n_words")).alias(
                "unigram_fertility"
            ),
        )
    )


def unigram_encode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus under the trained unigram vocabulary: per
    document, subword-token count against its alphabetic word count -
    schema-identical to bpe_encode so fertility (tokens_per_word) is
    directly comparable between the two trainers."""
    final_seg, _, _ = _train(spark, sf_dir)
    word_len = final_seg.select("word", F.size("pieces").alias("n_subwords"))
    docs = load_table(spark, sf_dir, "documents")
    doc_words = (
        docs.select("doc_id", F.explode_outer(tokens_col()).alias("tok"))
        .select("doc_id", F.lower("tok").alias("word"))
        .filter(F.col("word").rlike(_WORD_RE))
    )
    return (
        doc_words.join(word_len, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            (F.col("n_tokens") / F.col("n_words")).alias("tokens_per_word"),
        )
    )


# --- DuckDB oracle -----------------------------------------------------------


def _seg_round(r: int, vocab_cte: str) -> str:
    """One E-step as a recursive walk: each word advances one greedy
    longest-match piece per recursion level; the completed state
    (cur = len+1) carries the |piece| segmentation string."""
    cases = "\n".join(
        f"        WHEN len(substr(word, cur, {ln})) = {ln} AND contains("
        f"(SELECT vs FROM vstr{r}), '|' || substr(word, cur, {ln}) || '|') "
        f"THEN {ln}"
        for ln in range(MAX_PIECE_LEN, 1, -1)
    )
    return f""",
vstr{r} AS MATERIALIZED (
  SELECT COALESCE('|' || string_agg(piece, '|' ORDER BY piece) || '|', '||') AS vs
  FROM {vocab_cte}
),
walk{r} AS (
  SELECT word, cnt, 1 AS cur, CAST('' AS VARCHAR) AS segs FROM uw1
  UNION ALL
  SELECT word, cnt, cur + l, segs || '|' || substr(word, cur, l) || '|'
  FROM (
    SELECT word, cnt, cur, segs,
      CASE
{cases}
        ELSE 1 END AS l
    FROM walk{r} WHERE cur <= len(word)
  )
),
usage{r} AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS usage
  FROM (
    SELECT cnt, unnest(list_filter(string_split(segs, '|'), x -> x != '')) AS piece
    FROM walk{r} WHERE cur = len(word) + 1
  )
  GROUP BY piece
)"""


def _unigram_oracle() -> str:
    """Unrolled DuckDB twin of the shrink loop. WITH RECURSIVE heads
    the chain because the per-round walks self-reference; every
    reused relation is MATERIALIZED (the bpe oracle's lesson: default
    CTE inlining re-executes the upstream chain per reference)."""
    parts = [
        f"""
WITH RECURSIVE uw1 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT lower(unnest(string_split_regex(text, '\\s+'))) AS word FROM documents
  )
  WHERE regexp_matches(word, '{_WORD_RE}')
  GROUP BY word
),
seeds AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq
  FROM (
    SELECT cnt,
           unnest(flatten(list_transform(
             range(1, len(word) + 1),
             s -> list_transform(
               range(1, least({MAX_PIECE_LEN}, len(word) - s + 1) + 1),
               l -> substr(word, s, l))))) AS piece
    FROM uw1
  )
  GROUP BY piece
),
multis1 AS MATERIALIZED (
  SELECT piece FROM seeds WHERE len(piece) >= 2
  ORDER BY freq DESC, piece LIMIT {SEED_MULTIS}
)"""
    ]
    vocab_cte = "multis1"
    r = 1
    for target in PRUNE_SCHEDULE:
        parts.append(_seg_round(r, vocab_cte))
        parts.append(
            f""",
multis{r + 1} AS MATERIALIZED (
  SELECT piece FROM usage{r} WHERE len(piece) >= 2
  ORDER BY usage DESC, piece LIMIT {target}
)"""
        )
        vocab_cte = f"multis{r + 1}"
        r += 1
    parts.append(_seg_round(r, vocab_cte))
    parts.append(
        f""",
singles AS (
  SELECT DISTINCT unnest(string_split(word, '')) AS piece FROM uw1
),
final_vocab AS (
  SELECT piece FROM {vocab_cte} UNION SELECT piece FROM singles
)"""
    )
    return "".join(parts), r


_ORACLE_BODY, _FINAL_R = _unigram_oracle()

UNIGRAM_TRAIN_ORACLE_SQL = (
    _ORACLE_BODY
    + f"""
SELECT v.piece,
       len(v.piece) AS piece_len,
       COALESCE(u.usage, 0) AS usage,
       CAST(row_number() OVER (ORDER BY COALESCE(u.usage, 0) DESC, v.piece)
            AS INT) AS vocab_rank
FROM final_vocab v LEFT JOIN usage{_FINAL_R} u USING (piece)
"""
)

def _fertility_oracle() -> str:
    """Both trainers' unrolled CTE chains in ONE statement (the bpe
    chain is v1../pc../b.., the unigram chain uw1/walk../usage.. -
    disjoint names by construction), joined per source at the end."""
    from .bpe import N_MERGES, _bpe_oracle

    bpe_body = _bpe_oracle().replace("WITH v1", "WITH RECURSIVE v1", 1)
    uni_body = _ORACLE_BODY.replace("WITH RECURSIVE uw1", "uw1", 1).lstrip("\n")
    return (
        bpe_body
        + ",\n"
        + uni_body
        + f""",
bpe_word_len AS MATERIALIZED (
  SELECT word,
         len(list_filter(string_split(s, '|'), x -> x != '')) AS bpe_sub
  FROM v{N_MERGES + 1}
),
uni_word_len AS MATERIALIZED (
  SELECT word,
         len(list_filter(string_split(segs, '|'), x -> x != '')) AS uni_sub
  FROM walk{_FINAL_R} WHERE cur = len(word) + 1
),
doc_words AS (
  SELECT source, lower(unnest(string_split_regex(text, '\\s+'))) AS word
  FROM documents
)
SELECT d.source,
       count(*) AS n_words,
       CAST(sum(b.bpe_sub) AS BIGINT) AS bpe_tokens,
       CAST(sum(u.uni_sub) AS BIGINT) AS unigram_tokens,
       CAST(sum(b.bpe_sub) AS BIGINT) / count(*) AS bpe_fertility,
       CAST(sum(u.uni_sub) AS BIGINT) / count(*) AS unigram_fertility
FROM doc_words d
JOIN bpe_word_len b USING (word)
JOIN uni_word_len u USING (word)
WHERE regexp_matches(d.word, '{_WORD_RE}')
GROUP BY d.source
"""
    )


TOKENIZER_FERTILITY_ORACLE_SQL = _fertility_oracle()

UNIGRAM_ENCODE_ORACLE_SQL = (
    _ORACLE_BODY
    + f""",
word_len AS MATERIALIZED (
  SELECT word,
         len(list_filter(string_split(segs, '|'), x -> x != '')) AS n_subwords
  FROM walk{_FINAL_R} WHERE cur = len(word) + 1
),
doc_words AS (
  SELECT doc_id, lower(unnest(string_split_regex(text, '\\s+'))) AS word
  FROM documents
),
agg AS (
  SELECT d.doc_id,
         count(*) AS n_words,
         CAST(sum(w.n_subwords) AS BIGINT) AS n_tokens
  FROM doc_words d JOIN word_len w ON d.word = w.word
  WHERE regexp_matches(d.word, '{_WORD_RE}')
  GROUP BY d.doc_id
)
SELECT doc_id, n_words, n_tokens, n_tokens / n_words AS tokens_per_word
FROM agg
"""
)
