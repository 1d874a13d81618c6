"""r15 gram-hash switch: the fast xxhash64 slice-hash family must be
injective-equivalent to the gram strings it replaced (the md5 oracles
only keep matching because gram EQUALITY structure is preserved), and
must stay inside the 60-bit non-negative domain the downstream modular
folds were sized for."""

from pyspark.sql import functions as F

from data_pipeline_capstone_project_spark.operators.text import (
    XX_HASH_MASK,
    xx_gram_slice_hashes,
    xx_word_hash,
)

TEXTS = [
    "a b c d e f g h i j",          # 3 distinct 8-grams
    "a b c d e f g h i j",          # exact dup of doc 0
    "z b c d e f g h i j",          # shares 2 of doc 0's grams
    "a b c d e f g h",              # exactly one 8-gram (prefix of doc 0)
    "short text",                   # too short: zero 8-grams
]


def _grams(text: str, n: int = 8) -> list[tuple[str, ...]]:
    toks = text.split()
    return [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_slice_hash_bijects_with_gram_content(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    out = (
        df.select("doc_id", F.split("text", r"\s+").alias("toks"))
        .select(
            "doc_id",
            F.explode_outer(xx_gram_slice_hashes(F.col("toks"), 8)).alias("h"),
        )
        .filter(F.col("h").isNotNull())
        .collect()
    )
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.h)

    # hash -> gram-content must be a bijection over everything observed
    gram_to_hash: dict[tuple, int] = {}
    hash_to_gram: dict[int, tuple] = {}
    for i, t in enumerate(TEXTS):
        gs = _grams(t)
        hs = by_doc.get(i, [])
        assert len(hs) == len(gs), (i, len(hs), len(gs))
        for g, h in zip(gs, hs):
            assert gram_to_hash.setdefault(g, h) == h
            assert hash_to_gram.setdefault(h, g) == g
            assert 0 <= h <= XX_HASH_MASK


def test_xx_word_hash_domain_and_determinism(spark):
    df = spark.createDataFrame(
        [("alpha",), ("beta",), ("alpha",), ("",)], "w string"
    )
    rows = df.select(xx_word_hash(F.col("w")).alias("h"), "w").collect()
    vals = {}
    for r in rows:
        assert 0 <= r.h <= XX_HASH_MASK
        assert vals.setdefault(r.w, r.h) == r.h
    assert vals["alpha"] != vals["beta"]
