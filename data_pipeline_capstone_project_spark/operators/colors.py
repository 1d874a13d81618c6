"""Dominant-color extraction (the reference's one real Spark job,
SURVEY A7-A9 / U1-U3: ``spark/spark_image.py``).

Reference shape: per-user grouped-map pandas UDF - decode each image,
resize 75x75, concatenate all of a user's images into one pixel
matrix, KMeans(k=6, n_init=20), rank clusters by pixel count, emit 6
``{percentage, red, green, blue, hex}`` dicts as a string
(``spark_image.py:127-165``, output shape ``README.md:280-325``).

Engine version (modernized, same semantics):
- ``applyInPandas`` (the current GROUPED_MAP API); the explicit
  ``repartition('igId')`` the reference attempted (and accidentally
  discarded, ``spark_image.py:196-197``) is dropped entirely -
  ``groupBy().applyInPandas`` already shuffles by key exactly once
  (SURVEY O5).
- KMeans is implemented in numpy (no sklearn in this environment):
  20 deterministic restarts (seed = restart index; restart 0 is a
  quantile-spread init) x fixed-iteration Lloyd, best inertia kept -
  the reference's ``n_init=20`` robustness (``spark_image.py:23-26``)
  without RNG nondeterminism. "Many small fits in parallel", the
  reference's deliberate design (``README.md:346``, SURVEY O9), not
  one distributed fit.
- Clustering runs in HSV space: pixels are converted with a numpy
  twin of cv2's 8-bit BGR2HSV applied to the RGB-flipped array (the
  reference's exact call chain, ``spark_image.py:149,160``) and the
  ranked centers convert back via the HSV2RGB twin (``:40-56``), so
  palettes match the reference's hue-dominant cluster geometry.
- The reference's ``imageTypeByOrdinal`` NameError (U3: never
  imported, ``spark_image.py:148``) is fixed by construction: mode-16
  images are uint8 BGR by definition, hardcoded.
- Cluster ranking ties (U2's ``Counter.most_common`` insertion order)
  are pinned deterministically: (-count, cluster_center_sum) sort.

Input plumbing: synthetic deterministic "images" derived per
(user_id, event_id) - a seeded RandomState byte buffer standing in for
the binary store (FIXTURES.md §4); decode/resize happen where the
reference's cv2 calls sat.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

K_COLORS = 6
IMG_SIDE = 8  # synthetic stand-in for the 75x75 resize target
KMEANS_ITERS = 12
KMEANS_RESTARTS = 20  # reference n_init=20 (spark_image.py:23-26)


def synth_images(events: DataFrame) -> DataFrame:
    """Deterministic synthetic image store: one IMG_SIDE^2 x 3 uint8
    BGR buffer per (user, post), seeded by event_id (mapInPandas -
    generation happens executor-side, streaming Arrow batches)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = [
                np.random.RandomState(int(eid) % (2**31)).randint(
                    0, 256, size=IMG_SIDE * IMG_SIDE * 3, dtype=np.uint8
                ).tobytes()
                for eid in pdf["event_id"]
            ]
            yield pd.DataFrame(
                {
                    "igId": pdf["user_id"].astype(str),
                    "origin": "instagram_graph_image_store/"
                    + pdf["user_id"].astype(str)
                    + "/"
                    + pdf["event_id"].astype(str),
                    "height": IMG_SIDE,
                    "width": IMG_SIDE,
                    "mode": 16,
                    "nChannels": 3,
                    "data": data,
                }
            )

    return events.select("event_id", "user_id").mapInPandas(
        gen,
        schema="igId string, origin string, height int, width int, mode int, "
        "nChannels int, data binary",
    )


def _bgr2hsv_8u(px: np.ndarray) -> np.ndarray:
    """Vectorized twin of OpenCV's 8-bit ``COLOR_BGR2HSV`` (H in
    [0,180), S and V in [0,255]): channel 0 is read as Blue, 1 as
    Green, 2 as Red - exactly like ``cvtColor``, which trusts the
    caller's channel order. The reference calls this ON ITS RGB-
    FLIPPED ARRAY (``spark_image.py:149,160``), so feeding the flipped
    pixels here reproduces the reference's observable chain
    bit-for-bit, including its R/B channel-order quirk.

    Spec pinned (OpenCV color-conversion docs, 8U case):
      V = max(R,G,B); S = round(255*(V-min)/V) (0 if V=0);
      H = round(hue_degrees/2) mod 180, hue by the max-channel rule
      with the if-chain priority R, then G, then B."""
    px = px.astype(np.float64)
    b, g, r = px[:, 0], px[:, 1], px[:, 2]
    mx = px.max(axis=1)
    mn = px.min(axis=1)
    diff = mx - mn
    safe_diff = np.where(diff == 0, 1.0, diff)
    s = np.where(mx > 0, np.floor(255.0 * diff / np.where(mx == 0, 1.0, mx) + 0.5), 0.0)
    h = np.where(
        mx == r,
        60.0 * (g - b) / safe_diff,
        np.where(
            mx == g,
            120.0 + 60.0 * (b - r) / safe_diff,
            240.0 + 60.0 * (r - g) / safe_diff,
        ),
    )
    h = np.where(diff == 0, 0.0, np.where(h < 0, h + 360.0, h))
    h8 = np.mod(np.floor(h / 2.0 + 0.5), 180.0)
    return np.stack([h8, s, mx], axis=1)


def _hsv2rgb_8u(hsv: np.ndarray) -> np.ndarray:
    """Vectorized twin of OpenCV's 8-bit ``COLOR_HSV2RGB`` over
    integer-truncated cluster centers (the reference materializes each
    center with ``np.full(shape, center, dtype='uint8')`` - a float ->
    uint8 TRUNCATION - before converting, ``spark_image.py:40-56``;
    callers must truncate first to match). H in [0,180) -> degrees*2,
    standard sector conversion, round-half-up back to [0,255]."""
    h = hsv[:, 0] * 2.0
    s = hsv[:, 1] / 255.0
    v = hsv[:, 2] / 255.0
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - np.abs(np.mod(hp, 2.0) - 1.0))
    z = np.zeros_like(c)
    sector = np.floor(hp).astype(int) % 6
    r1 = np.choose(sector, [c, x, z, z, x, c])
    g1 = np.choose(sector, [x, c, c, x, z, z])
    b1 = np.choose(sector, [z, z, x, c, c, x])
    m = v - c
    rgb = np.stack([r1 + m, g1 + m, b1 + m], axis=1) * 255.0
    return np.floor(rgb + 0.5).astype(np.int64)


def _lloyd(pixels: np.ndarray, centers: np.ndarray, iters: int = KMEANS_ITERS) -> tuple:
    """Fixed-iteration Lloyd from a given init. Distances via the
    expanded form ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 (one matmul,
    no (n,k,3) broadcast temp); means via per-column bincount (no
    k boolean-mask passes). After the last center update, labels are
    REASSIGNED against the final centers (sklearn's fit performs this
    final E-step too), so the returned (centers, labels, inertia)
    triple is self-consistent - never a stale assignment paired with
    updated centers. Returns (centers, labels, inertia)."""
    k = len(centers)
    centers = centers.astype(np.float64)
    x_sq = (pixels**2).sum(axis=1, keepdims=True)
    for _ in range(iters):
        d = x_sq - 2.0 * pixels @ centers.T + (centers**2).sum(axis=1)
        labels = d.argmin(axis=1)
        counts = np.bincount(labels, minlength=k).astype(np.float64)
        sums = np.stack(
            [
                np.bincount(labels, weights=pixels[:, c], minlength=k)
                for c in range(pixels.shape[1])
            ],
            axis=1,
        )
        nonzero = counts > 0
        centers[nonzero] = sums[nonzero] / counts[nonzero, None]
    d = x_sq - 2.0 * pixels @ centers.T + (centers**2).sum(axis=1)
    labels = d.argmin(axis=1)
    inertia = float(((pixels - centers[labels]) ** 2).sum())
    return centers, labels, inertia


KMEANS_SAMPLE = 2048  # restart-selection subsample size (deterministic stride)
RACE_ITERS = 6  # Lloyd iterations per racing restart (winner gets the full 12)
# sklearn-faithful mode: every restart runs full-data full-iteration
# Lloyd (n_init=20 x 12 iters) instead of racing on the subsample.
# Measured at sf0.1 (BASELINE.md "Palette KMeans restart strategies"):
# identical palettes on all 20 users for ~8x the KMeans wall-time, so
# the racing subsample stays the default.
KMEANS_FULL_RESTARTS = False


def _kmeans(
    pixels: np.ndarray, k: int, full_restarts: bool | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Multi-restart deterministic KMeans (the reference fits with
    ``KMeans(6, n_init=20)``, ``spark_image.py:23-26`` - 20 restarts,
    keep the best inertia). Restart 0 is the quantile-spread init
    (centers at evenly spaced quantiles of pixel brightness - no RNG);
    restarts 1..KMEANS_RESTARTS-1 draw k distinct sample points with
    ``RandomState(restart)`` - the SEED IS THE RESTART INDEX, so the
    whole fit is deterministic and oracle-stable while recovering the
    reference's robustness to a single bad init.

    Scale shape: the 20 restarts race on a deterministic stride
    subsample (<= KMEANS_SAMPLE points) and only the winning restart's
    centers seed ONE full-data Lloyd refinement - sklearn's n_init
    runs every restart over all points, which at concat-all-images
    pixel counts is 20x the work for the same argmin; the subsample
    race preserves the robustness (a bad init loses on the sample too)
    at ~1 full fit of total cost. Ties keep the lowest restart index.
    ``full_restarts`` (default: module flag ``KMEANS_FULL_RESTARTS``)
    switches to the sklearn-faithful shape - every restart full-data,
    full iterations, best fit returned as-is.
    Returns (centers[k,3], labels[n])."""
    if full_restarts is None:
        full_restarts = KMEANS_FULL_RESTARTS
    pixels = pixels.astype(np.float64)
    if full_restarts:
        sample, race_iters = pixels, KMEANS_ITERS
    else:
        stride = max(1, len(pixels) // KMEANS_SAMPLE)
        sample, race_iters = pixels[::stride], RACE_ITERS
    uniq = np.unique(sample, axis=0)
    if len(uniq) < k:
        # degenerate subsample (fewer distinct values than clusters):
        # race on the full data instead - caller guarantees k distinct
        sample = pixels
        uniq = np.unique(sample, axis=0)
    order = np.argsort(sample.sum(axis=1), kind="stable")
    idx = order[np.linspace(0, len(order) - 1, k).astype(int)]
    best = _lloyd(sample, sample[idx], iters=race_iters)
    for restart in range(1, KMEANS_RESTARTS):
        if len(uniq) <= k:
            break  # every init converges to the same unique points
        rng = np.random.RandomState(restart)
        centers0 = uniq[rng.choice(len(uniq), size=k, replace=False)]
        cand = _lloyd(sample, centers0, iters=race_iters)
        if cand[2] < best[2]:
            best = cand
    if full_restarts:
        return best[0], best[1]
    centers, labels, _ = _lloyd(pixels, best[0])
    return centers, labels


def _palette(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map body: rebuild arrays from binary + shape, BGR->RGB
    flip (reference ``image[..., ::-1]``, ``spark_image.py:149``),
    concat all images (``:151-154``), convert to HSV, cluster IN HSV
    SPACE, convert the ranked centers back to RGB (``spark_image.py:
    160`` BGR2HSV before KMeans, ``:40-56`` HSV2RGB on each center).
    The reference applies COLOR_BGR2HSV to its already-RGB-flipped
    array; this chain reproduces that observable behavior exactly -
    the cluster geometry is HSV (hue-dominant separation, not
    euclidean RGB) and the emitted channels carry the reference's
    R/B ordering quirk through the same round trip."""
    # Columnwise numpy access, not iterrows(): per-row pandas object
    # construction dominated the UDF body at many-images-per-user
    # scale; zipping the three ndarrays keeps the loop near-free and
    # the per-image work is a zero-copy frombuffer view.
    keep = pdf["mode"].to_numpy() == 16  # F13: only 8-bit 3-channel BGR
    mats = [
        np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)[..., ::-1].reshape(-1, 3)
        for buf, h, w in zip(
            pdf["data"].to_numpy()[keep],
            pdf["height"].to_numpy()[keep],
            pdf["width"].to_numpy()[keep],
        )
    ]
    ig_id = pdf["igId"].iloc[0]
    if not mats:
        return pd.DataFrame({"igId": [ig_id], "colors": [""]})
    # HSV is the CLUSTER SPACE (reference spark_image.py:160); distinct
    # count and tie-breaks therefore run on HSV values too.
    pixels = _bgr2hsv_8u(np.concatenate(mats))
    k = min(K_COLORS, len(np.unique(pixels, axis=0)))
    centers, labels = _kmeans(pixels, k)
    counts = np.bincount(labels, minlength=k)
    total = counts.sum()
    rank = sorted(range(k), key=lambda j: (-counts[j], centers[j].sum()))
    # float centers truncate to uint8 before conversion, mirroring the
    # reference's np.full(..., dtype='uint8') materialization.
    rgb_centers = _hsv2rgb_8u(np.floor(np.clip(centers, 0, 255)))
    colors = []
    for j in rank:
        r, g, b = (int(c) for c in rgb_centers[j])
        colors.append(
            {
                "percentage": round(float(counts[j] / total), 4),
                "red": r,
                "green": g,
                "blue": b,
                "hex": f"#{r:02x}{g:02x}{b:02x}",
            }
        )
    return pd.DataFrame({"igId": [ig_id], "colors": [json.dumps(colors)]})


def color_palette(images: DataFrame) -> DataFrame:
    """Per-user dominant colors: one shuffle (the groupBy), Arrow
    batches to the Python workers, one output row per user."""
    return images.groupBy("igId").applyInPandas(
        _palette, schema="igId string, colors string"
    )


def color_palette_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query (no SQL oracle - iterative clustering is not
    SQL-expressible; property checks live in tests): the full weekly
    color pipeline over synthetic images for users 0..19."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return color_palette(synth_images(events)).orderBy("igId")


COLOR_SCHEMA = (
    "array<struct<percentage double, red int, green int, blue int, hex string>>"
)


def color_palette_props_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated property projection of the color pipeline (the KMeans
    content itself has no SQL oracle; these invariants do): per user -
    exactly K_COLORS clusters, percentages summing to 1 (2-decimal
    round absorbs the per-entry 4-decimal rounding), well-formed hex,
    and rank order non-increasing by percentage. The DuckDB oracle
    asserts the same closed-form row per user, so a regression in the
    UDF (wrong k, broken ranking, malformed hex, percentage drift)
    breaks the value hash."""
    palettes = color_palette_query(spark, sf_dir)
    colors = F.from_json("colors", COLOR_SCHEMA)
    pct = F.transform(colors, lambda c: c["percentage"])
    return palettes.select(
        "igId",
        F.size(colors).alias("n_colors"),
        F.round(F.aggregate(pct, F.lit(0.0), lambda a, x: a + x), 2).alias("pct_sum"),
        F.forall(colors, lambda c: c["hex"].rlike("^#[0-9a-f]{6}$")).alias("hex_ok"),
        F.coalesce(
            F.forall(
                F.zip_with(pct, F.slice(pct, 2, K_COLORS), lambda a, b: a >= b),
                lambda ok: ok,
            ),
            F.lit(True),
        ).alias("ranked_ok"),
    )


COLOR_PALETTE_PROPS_ORACLE_SQL = f"""
SELECT CAST(user_id AS VARCHAR) AS igId,
       {K_COLORS} AS n_colors,
       1.0 AS pct_sum,
       true AS hex_ok,
       true AS ranked_ok
FROM events WHERE user_id < 20 GROUP BY user_id
"""
