"""Unigram-family (SentencePiece-style) tokenizer training: greedy
MaxMatch segmentation invariants, the shrink-loop vocabulary
contract, and the fertility comparison against the BPE trainer the
round-6 verdict asked for (the two trainers share the same
word-frequency table, so their token counts are directly
comparable)."""

from __future__ import annotations

import pytest

from data_pipeline_capstone_project_spark.operators.unigram import (
    MAX_PIECE_LEN,
    PRUNE_SCHEDULE,
    SEED_MULTIS,
    _segment,
    unigram_encode_query,
    unigram_train_query,
)


def test_segment_fold_greedy_longest_match(spark):
    """The fold must (a) cover the word exactly, (b) prefer the
    longest vocab piece at each position, (c) fall back to single
    chars off-vocabulary."""
    words = spark.createDataFrame(
        [("banana", 1), ("bandana", 1), ("zzz", 1)], "word string, cnt int"
    )
    vstr = "|an|ana|band|na|"
    got = {r["word"]: r["pieces"] for r in _segment(words, vstr).collect()}
    # at pos 2 of 'banana', 'ana' (len 3) beats 'an' (len 2)
    assert got["banana"] == ["b", "ana", "na"]
    # 'band' (len 4) consumes greedily even though 'an' is in vocab
    assert got["bandana"] == ["band", "ana"]
    # nothing matches: single-char fallback, always terminates
    assert got["zzz"] == ["z", "z", "z"]
    for w, pieces in got.items():
        assert "".join(pieces) == w


def test_segment_fold_empty_vocab(spark):
    words = spark.createDataFrame([("abc", 1)], "word string, cnt int")
    got = _segment(words, "||").collect()[0]["pieces"]
    assert got == ["a", "b", "c"]


def test_train_vocab_contract(spark, sf_dir):
    rows = unigram_train_query(spark, sf_dir).collect()
    pieces = {r["piece"]: r for r in rows}
    multis = [p for p in pieces if len(p) >= 2]
    singles = [p for p in pieces if len(p) == 1]
    # final prune target bounds the multi-char vocab; singles protected
    assert 0 < len(multis) <= PRUNE_SCHEDULE[-1] <= SEED_MULTIS
    assert len(singles) >= 20  # lowercase alphabetic corpus
    assert all(1 <= len(p) <= MAX_PIECE_LEN for p in pieces)
    # ranks are a dense 1..N permutation ordered by usage desc
    ranks = sorted(r["vocab_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r["vocab_rank"])
    usages = [r["usage"] for r in by_rank]
    assert usages == sorted(usages, reverse=True)
    assert all(r["piece_len"] == len(r["piece"]) for r in rows)


def test_fertility_vs_bpe(spark, sf_dir):
    """The r6 verdict's acceptance check: unigram_encode next to
    bpe_encode on the same corpus. Both must be valid tokenizations
    (>= 1 token per word); the unigram vocab (24 multi-char pieces up
    to length 4) should compress at least as well as 6 BPE merges -
    and neither should be degenerate (fertility below 1 or above the
    character-level ceiling)."""
    from data_pipeline_capstone_project_spark.operators.bpe import (
        bpe_encode_query,
    )

    uni = {
        r["doc_id"]: r for r in unigram_encode_query(spark, sf_dir).collect()
    }
    bpe = {r["doc_id"]: r for r in bpe_encode_query(spark, sf_dir).collect()}
    assert set(uni) == set(bpe)
    for doc_id in uni:
        assert uni[doc_id]["n_words"] == bpe[doc_id]["n_words"]
        assert uni[doc_id]["n_tokens"] >= uni[doc_id]["n_words"]
    mean_uni = sum(r["tokens_per_word"] for r in uni.values()) / len(uni)
    mean_bpe = sum(r["tokens_per_word"] for r in bpe.values()) / len(bpe)
    assert 1.0 <= mean_uni <= 8.0 and 1.0 <= mean_bpe <= 8.0
    # 24 pieces x len<=4 vs 6 merges: the unigram vocab is bigger and
    # its pieces longer, so its fertility should not be meaningfully
    # worse; allow slack rather than asserting strict dominance
    assert mean_uni <= mean_bpe * 1.10


def test_tokenizer_fertility_consistent_with_encoders(spark, sf_dir):
    """The per-source fertility report must re-aggregate to the same
    corpus totals the two per-doc encoders produce."""
    from data_pipeline_capstone_project_spark.operators.bpe import (
        bpe_encode_query,
    )
    from data_pipeline_capstone_project_spark.operators.unigram import (
        tokenizer_fertility_query,
    )

    fert = tokenizer_fertility_query(spark, sf_dir).collect()
    assert len(fert) >= 2  # several sources in every sf
    tot_words = sum(r["n_words"] for r in fert)
    tot_bpe = sum(r["bpe_tokens"] for r in fert)
    tot_uni = sum(r["unigram_tokens"] for r in fert)
    bpe_docs = bpe_encode_query(spark, sf_dir).collect()
    uni_docs = unigram_encode_query(spark, sf_dir).collect()
    assert tot_words == sum(r["n_words"] for r in bpe_docs)
    assert tot_bpe == sum(r["n_tokens"] for r in bpe_docs)
    assert tot_uni == sum(r["n_tokens"] for r in uni_docs)
    for r in fert:
        assert r["bpe_fertility"] >= 1.0 and r["unigram_fertility"] >= 1.0


def test_encode_matches_train_segmentation(spark, sf_dir):
    """n_tokens must be the sum of the per-word piece counts the
    trainer's final segmentation produces - the encoder may not
    re-segment differently."""
    from pyspark.sql import functions as F

    from data_pipeline_capstone_project_spark.operators.unigram import _train

    final_seg, _, _ = _train(spark, sf_dir)
    seg_sizes = {
        r["word"]: r["n"]
        for r in final_seg.select(
            "word", F.size("pieces").alias("n")
        ).collect()
    }
    assert all(n >= 1 for n in seg_sizes.values())
    # spot-check: every piece-size is within the single-char ceiling
    assert all(n <= len(w) for w, n in seg_sizes.items())
