"""Perceptual-hash near-duplicate image detection (dHash + Hamming LSH).

The reference pipeline stores Instagram image originals as opaque
S3 objects (s3Posts-to-ES-lambda/s3-to-es_aws.py:101-122) and decodes
them only for the palette job (spark/spark_image.py:182-191). A
training-data curation pass over the same store needs the operation
neither job provides: find the *near*-duplicate images - re-encodes,
brightness-shifted re-uploads, format-converted copies - so one
representative survives curation. This module adds that operator,
Spark-first:

- **dHash (difference hash)**: decode -> integer Rec.601 luma ->
  9x8 grid of exact 4x4-pixel cell means -> 64 bits, bit = "right
  cell brighter than left cell" (row-major, MSB first). Uniform
  brightness shifts and lossless format conversion leave every
  inter-cell *difference* unchanged, so true near-dups land at
  Hamming distance 0-handful while unrelated textures disagree on
  ~half the bits. All arithmetic is exact integer (floor division),
  so the hash is bit-reproducible across implementations.
- **Banded Hamming LSH**: the 64-bit hash splits into 4 x 16-bit
  bands; images sharing ANY band become a candidate pair (an
  equi-join on ``(band_idx, band_val)``). By the pigeonhole
  principle every pair within Hamming distance 6 with >= one clean
  band is caught; a pair at distance >= 4 spread evenly across all
  bands can escape - the standard LSH recall trade-off, and the
  operator's contract is explicitly "band-sharing pairs only"
  (exactly like ``dedup_minhash_lsh``).
- **Verify**: candidates are checked JVM-side -
  ``bit_count(phash_a XOR phash_b) <= 6`` - no Python in the
  pairwise stage at all.

Spark shape / 100 TB: the only Python is the per-file decode+hash
(``binaryFile`` scan -> Arrow ``mapInPandas``, zero exchanges, image
bytes never leave the executors - the same embarrassingly-parallel
map as every media entry). Everything pairwise runs on an 8-byte
hash per image: the band explode emits 4 tiny rows per image, the
candidate stage is one shuffle on ``(band_idx, band_val)``, and the
Hamming verify is ``bit_count``/``XOR`` inside whole-stage codegen.
At 100 TB of *images* the hash relation is ~10^-6 of the input
bytes; the known skew risk is degenerate bands (flat images share
the all-zero band), which a production run would cap with a
band-frequency filter before the self-join - at fixture scale the
corpus has no such band (asserted at oracle build).

Correctness gate: the DuckDB oracle is a closed-form VALUES literal
produced by an INDEPENDENT pure-Python scalar twin that computes
every hash straight from each fixture's pixel *formula* - it never
sees PNG/BMP bytes, numpy, or the banding DataFrame code - then
applies the same band/verify contract. A decode bug (channel swap,
filter/interlace/RLE error), a luma or cell-mean drift, a bit-order
or band-extraction mistake in the Spark path all change at least one
hash and fail the value-multiset compare. Fixture families are
chosen so the expected result exercises every verdict: exact
cross-format dups (Hamming 0), brightness-shifted dups (Hamming 0 by
dHash invariance), a local-patch near-dup (1..6), band-sharing
non-dups (candidate rows with ``dup = false``), and unrelated
patterns that never share a band (absent rows) - each asserted at
oracle-build time.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable, Iterator
from itertools import combinations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .gif import gif_frames, make_gif
from .images import make_bmp, make_bmp_indexed, make_png, png_pixels
from .images import bmp_pixels

#: fixture geometry: 9x8 grid of exact 4x4 cells -> no fractional
#: resampling anywhere (the sandbox has no PIL; production would
#: area-resample first and tolerate rounding via the Hamming budget)
PH_W, PH_H = 36, 32
GRID_W, GRID_H = 9, 8
CELL = 4
N_BANDS = 4
BAND_BITS = 16
HAMMING_T = 6

PixelFn = Callable[[int, int], tuple[int, int, int]]


def fixture_check(cond: bool, msg: str) -> None:
    """Oracle-build-time fixture invariant (ADVICE r11): an explicit
    raise, not ``assert``, so the check survives ``python -O`` and the
    failure carries a ``fixture drift`` marker. ``oracle_sql()``
    contains the raise to the one drifted entry via a never-matching
    sentinel oracle instead of letting it kill registry resolution."""
    if not cond:
        raise ValueError(f"fixture drift: {msg}")


# --- fixture pixel formulas (shared SPEC; the two hash twins never
# share code past this point) -----------------------------------------


def _pat_a(x: int, y: int) -> tuple[int, int, int]:
    """Quadratic texture A - mod-wraps create non-monotone structure
    so the dHash is informative (a pure gradient hashes to all-ones)."""
    return (
        (23 * x * x + 7 * y) % 199,
        (13 * y * y + 5 * x) % 199,
        (17 * x * y + 29) % 199,
    )


def _pat_b(x: int, y: int) -> tuple[int, int, int]:
    return (
        (31 * x * y + 11) % 199,
        (7 * x * x + 3 * y * y) % 199,
        (29 * y + 41 * x) % 199,
    )


def _bright(fn: PixelFn, d: int = 6) -> PixelFn:
    """Uniform brightness shift: +d on every channel adds exactly d
    to the integer luma ((299+587+114)*d/1000 = d), so cell
    differences - hence the dHash - are unchanged. Formula ranges
    stay < 250 so the shift never clips."""
    return lambda x, y: tuple(c + d for c in fn(x, y))


def _spot(fn: PixelFn) -> PixelFn:
    """White 8x8-pixel patch over cells (2..3, 1..2): flips only the
    comparisons that touch the patch boundary rows - at most 6 bits
    (2 grid rows x 3 adjacent-cell pairs), so the variant lands
    within the Hamming budget while bands 2-3 stay byte-identical."""
    return lambda x, y: (255, 255, 255) if 8 <= x < 16 and 4 <= y < 12 else fn(x, y)


def _heavy(fn: PixelFn) -> PixelFn:
    """White patch over the whole top half (grid rows 0..3): flips far
    more than HAMMING_T bits, but bands 2-3 (rows 4..7) stay
    byte-identical - so the pair IS a band-sharing candidate and the
    verify stage must reject it (``dup = false``)."""
    return lambda x, y: (255, 255, 255) if y < 16 else fn(x, y)


def _checker(x: int, y: int) -> tuple[int, int, int]:
    v = 30 + 180 * (((x // 4) + (y // 4)) % 2)
    return (v, v, v)


def _checker_inv(x: int, y: int) -> tuple[int, int, int]:
    v = 210 - 180 * (((x // 4) + (y // 4)) % 2)
    return (v, v, v)


def _radial(x: int, y: int) -> tuple[int, int, int]:
    v = ((x - 18) * (x - 18) + (y - 16) * (y - 16)) % 199 + 20
    return (v, v, v)


def _fixture_specs() -> list[tuple[str, PixelFn, str]]:
    """(file name, pixel formula, encoder key). Encoders span the
    repo's own still-image codec surface - truecolor / interlaced /
    grayscale PNG, 24-bit and RLE8-paletted BMP - so the entry
    re-verifies five decode paths end-to-end through the hash."""
    return [
        ("a1_base.png", _pat_a, "png"),
        ("a2_bright.png", _bright(_pat_a), "png_i7"),
        ("a3_copy.bmp", _pat_a, "bmp24"),
        ("a4_spot.png", _spot(_pat_a), "png"),
        ("a5_heavyedit.png", _heavy(_pat_a), "png"),
        ("b1_base.png", _pat_b, "png"),
        ("b2_bright.bmp", _bright(_pat_b), "bmp24"),
        ("c1_checker.png", _checker, "png_gray"),
        ("c2_checker_inv.png", _checker_inv, "png_gray"),
        ("c3_gifcopy.gif", _checker, "gif"),  # lossless GIF re-encode
        ("r1_radial.bmp", _radial, "bmp_rle8"),
        ("r2_radial_bright.bmp", _bright(_radial), "bmp24"),
    ]


def _pixels_np(fn: PixelFn) -> np.ndarray:
    px = np.empty((PH_H, PH_W, 3), dtype=np.uint8)
    for y in range(PH_H):
        for x in range(PH_W):
            px[y, x] = fn(x, y)
    return px


def _encode(fn: PixelFn, enc: str) -> bytes:
    px = _pixels_np(fn)
    if enc == "png":
        return make_png(px)
    if enc == "png_i7":
        return make_png(px, interlace=True)
    if enc == "png_gray":
        # formula is grayscale (r == g == b); luma of (v,v,v) is v
        return make_png(px[..., 0], color_type=0)
    if enc == "bmp24":
        return make_bmp(px)
    if enc == "bmp_rle8":
        palette = [(i, i, i) for i in range(256)]
        return make_bmp_indexed(px[..., 0], palette, rle=True, bpp=8)
    if enc == "gif":
        # palette-exact: grayscale formulas index a 256-gray table,
        # so the LZW round trip is lossless
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, 1)
        return make_gif(PH_W, PH_H, pal, [{"idx": px[..., 0]}])
    raise ValueError(f"unknown encoder {enc}")


def _stage_phash_store(root: str) -> None:
    for name, fn, enc in _fixture_specs():
        with open(os.path.join(root, name), "wb") as f:
            f.write(_encode(fn, enc))


# --- Spark-side hash (numpy, from DECODED BYTES) ----------------------


def dhash64(px: np.ndarray) -> int:
    """64-bit dHash of an (PH_H, PH_W, 3) uint8 RGB array: integer
    Rec.601 luma, exact 4x4 cell means (floor), row-major
    right-brighter-than-left bits, MSB first; returned as the SIGNED
    64-bit value Spark's LongType carries."""
    if px.shape[0] != PH_H or px.shape[1] != PH_W:
        raise ValueError(f"phash fixture must be {PH_W}x{PH_H}, got {px.shape}")
    c = px.astype(np.int64)
    luma = (299 * c[..., 0] + 587 * c[..., 1] + 114 * c[..., 2]) // 1000
    cells = luma.reshape(GRID_H, CELL, GRID_W, CELL).sum(axis=(1, 3)) // (CELL * CELL)
    bits = (cells[:, 1:] > cells[:, :-1]).ravel()
    h = 0
    for bit in bits:
        h = (h << 1) | int(bit)
    return h - (1 << 64) if h >= (1 << 63) else h


# --- oracle-side hash (pure Python, from the FORMULA) -----------------


def _dhash_scalar(fn: PixelFn) -> int:
    """Independent twin of :func:`dhash64`: pure-Python ints straight
    from the pixel formula - never decodes bytes, never touches
    numpy. Returns the UNSIGNED 64-bit value."""
    cells = [[0] * GRID_W for _ in range(GRID_H)]
    for cy in range(GRID_H):
        for cx in range(GRID_W):
            s = 0
            for dy in range(CELL):
                for dx in range(CELL):
                    r, g, b = fn(cx * CELL + dx, cy * CELL + dy)
                    s += (299 * r + 587 * g + 114 * b) // 1000
            cells[cy][cx] = s // (CELL * CELL)
    h = 0
    for cy in range(GRID_H):
        for cx in range(GRID_W - 1):
            h = (h << 1) | (1 if cells[cy][cx + 1] > cells[cy][cx] else 0)
    return h


def _bands_of(uh: int) -> list[int]:
    return [
        (uh >> (64 - BAND_BITS * (i + 1))) & ((1 << BAND_BITS) - 1)
        for i in range(N_BANDS)
    ]


# --- the generic banded-Hamming pair join (shared with vphash/afp) -----


def hamming_lsh_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    out_a: str,
    out_b: str,
    threshold: int,
) -> DataFrame:
    """Banded Hamming LSH self-join over an (id, 64-bit hash)
    relation: explode 4 x 16-bit bands, equi-join on (band_idx,
    band_val) for candidates, verify JVM-side with
    ``bit_count(a XOR b) <= threshold``. One row per band-sharing
    pair (id_a < id_b) with the exact Hamming distance and the
    ``dup`` verdict - all pairwise work runs on 8 bytes per item
    inside whole-stage codegen."""
    bands = hashes.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(
                            F.col(hash_col), 64 - BAND_BITS * (i + 1)
                        )
                        .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select(id_col, hash_col, "b.band_idx", "b.band_val")

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias(out_a),
            F.col(f"b.{id_col}").alias(out_b),
            F.col(f"a.{hash_col}").alias("ha"),
            F.col(f"b.{hash_col}").alias("hb"),
        )
        .distinct()  # pairs sharing >1 band collapse to one row
    )
    return cand.select(
        out_a,
        out_b,
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    ).withColumn("dup", F.col("hamming") <= F.lit(threshold))


# --- the registry query ------------------------------------------------


def image_phash_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: decode the staged PNG/BMP store with the repo's
    own codecs, dHash each image in one Arrow ``mapInPandas`` pass,
    then find near-duplicates with a banded Hamming LSH join and a
    JVM-side ``bit_count`` verify. Output: one row per band-sharing
    candidate pair - ``img_a < img_b``, the exact Hamming distance,
    and the ``dup`` verdict at threshold 6.

    Cluster note (ADVICE r11): the fixture store is staged in a
    driver-local temp dir, fine on ``local[*]``/shared-FS; on a real
    multi-node cluster the ``binaryFile`` load path must be
    executor-visible (object store / NFS)."""
    # driver-local staging: test scaffolding only (FIXTURES.md §6) -
    # multi-node clusters stage fixtures to shared storage first.
    work = tempfile.mkdtemp(prefix="phash_store_")
    try:
        _stage_phash_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("img_name"),
            F.col("content").alias("payload"),
        )

        def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                names, hashes = [], []
                for name, payload in zip(pdf["img_name"], pdf["payload"]):
                    raw = bytes(payload)
                    px = (
                        bmp_pixels(raw) if raw[:2] == b"BM"
                        else gif_frames(raw)[0]["rgb"] if raw[:3] == b"GIF"
                        else png_pixels(raw)
                    )
                    names.append(name)
                    hashes.append(dhash64(px))
                yield pd.DataFrame(
                    {"img_name": names, "phash": pd.array(hashes, dtype="int64")}
                )

        hashes = bin_df.mapInPandas(
            hash_batches, "img_name string, phash long"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # 4 x 16-bit bands per hash; shiftrightunsigned (inside
    # hamming_lsh_pairs) keeps the top band correct for negative
    # (sign-bit-set) hashes
    return hamming_lsh_pairs(
        hashes, "img_name", "phash", "img_a", "img_b", HAMMING_T
    )


def _family(name: str) -> str:
    return name[0]  # a/b/c/r prefix groups the fixture families


def image_phash_oracle() -> str:
    """Build the VALUES oracle from the scalar twin, asserting the
    fixture design delivers every verdict class it promises."""
    specs = _fixture_specs()
    uhash = {name: _dhash_scalar(fn) for name, fn, _enc in specs}
    names = sorted(uhash)

    rows = []
    seen_h0 = seen_near = seen_nondup_cand = 0
    for na, nb in combinations(names, 2):
        ha, hb = uhash[na], uhash[nb]
        if not any(x == y for x, y in zip(_bands_of(ha), _bands_of(hb))):
            continue
        ham = bin(ha ^ hb).count("1")
        dup = ham <= HAMMING_T
        if dup and _family(na) != _family(nb):
            fixture_check(
                False, f"cross-family dup {na}/{nb} at Hamming {ham}"
            )
        if ham == 0:
            seen_h0 += 1
        elif dup:
            seen_near += 1
        else:
            seen_nondup_cand += 1
        rows.append((na, nb, ham, dup))

    fixture_check(
        seen_h0 >= 3, "need exact/brightness/format dup pairs at Hamming 0"
    )
    fixture_check(seen_near >= 1, "need a 1..T near-dup pair (the spot variant)")
    fixture_check(
        seen_nondup_cand >= 1,
        "need a band-sharing pair the verify stage rejects (heavy edit)",
    )
    # checker vs inverse must never even be a candidate (all bits flip)
    fixture_check(
        not any(
            {a_, b_} == {"c1_checker.png", "c2_checker_inv.png"}
            for a_, b_, *_ in rows
        ),
        "inverted checkerboard shared a band",
    )
    # no degenerate all-images band (the documented production skew risk)
    from collections import Counter

    band_freq = Counter(
        (i, bv) for h in uhash.values() for i, bv in enumerate(_bands_of(h))
    )
    fixture_check(
        band_freq.most_common(1)[0][1] < len(names),
        "a single band value covers the whole corpus - fixtures degenerate",
    )

    literals = ", ".join(
        f"('{a_}', '{b_}', {ham}, {'true' if dup else 'false'})"
        for a_, b_, ham, dup in rows
    )
    return (
        "SELECT img_a, img_b, CAST(hamming AS INTEGER) AS hamming, dup "
        f"FROM (VALUES {literals}) AS t(img_a, img_b, hamming, dup)"
    )
