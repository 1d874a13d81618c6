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
  deterministic quantile-spread init + fixed-iteration Lloyd - "many
  small fits in parallel", the reference's deliberate design
  (``README.md:346``, SURVEY O9), not one distributed fit.
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


def _kmeans(pixels: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic Lloyd iterations: centers initialized at evenly
    spaced quantiles of pixel brightness (no RNG), fixed iteration
    count. Returns (centers[k,3], labels[n])."""
    order = np.argsort(pixels.sum(axis=1), kind="stable")
    idx = order[np.linspace(0, len(order) - 1, k).astype(int)]
    centers = pixels[idx].astype(np.float64)
    labels = np.zeros(len(pixels), dtype=np.int64)
    for _ in range(KMEANS_ITERS):
        d = ((pixels[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        labels = d.argmin(axis=1)
        for j in range(k):
            sel = pixels[labels == j]
            if len(sel):
                centers[j] = sel.mean(axis=0)
    return centers, labels


def _palette(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map body: rebuild arrays from binary + shape, BGR->RGB
    flip (reference ``image[..., ::-1]``, ``spark_image.py:149``),
    concat all images (``:151-154``), cluster, rank by frequency."""
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
    pixels = np.concatenate(mats).astype(np.float64)
    k = min(K_COLORS, len(np.unique(pixels, axis=0)))
    centers, labels = _kmeans(pixels, k)
    counts = np.bincount(labels, minlength=k)
    total = counts.sum()
    rank = sorted(range(k), key=lambda j: (-counts[j], centers[j].sum()))
    colors = []
    for j in rank:
        r, g, b = (int(round(c)) for c in centers[j])
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
