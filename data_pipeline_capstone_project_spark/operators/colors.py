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

#: Pixels per color inside every synthetic image, listed by the
#: color's rank in ASCENDING HSV-component-sum order. Chosen so that
#: (a) the six counts are distinct -> the palette ranking has no ties,
#: (b) for any image count m, `linspace(0, 64m-1, 6)` over the
#: HSV-sum-sorted pixel population lands EXACTLY ONE index inside each
#: color's run (cumulative boundaries 12,25,36,50,60 straddle the
#: five interior quantile points 12.8m, 25.6m, 38.4m, 51.2m with >=
#: 0.6m margin) -> `_kmeans`'s quantile-spread init starts with one
#: center ON each distinct HSV point and Lloyd converges to the global
#: optimum (inertia 0) in one step. That makes the whole palette
#: closed-form: counts are m*(these counts), centers are the fixture
#: colors themselves. Property (b) is proved by the margin arithmetic
#: only for the FULL population (subsample stride 1), hence the
#: MAX_IMAGES_PER_USER cap below; tests/test_colors_multimodal.py
#: sweeps m empirically.
COUNTS_BY_SUM_RANK = (12, 13, 11, 14, 10, 4)

#: Per-user image cap: 32 images x 64 px = 2048 px = KMEANS_SAMPLE,
#: so the restart race's deterministic stride stays 1 and the
#: quantile-init exactness argument above holds at every scale factor.
MAX_IMAGES_PER_USER = 32

N_PALETTE_USERS = 20  # the query's user_id < 20 slice


def _user_colors6(user: int) -> list[tuple[int, int, int]]:
    """Six deterministic (r, g, b) fixture colors for one user, drawn
    from RandomState(10000+user) and re-drawn until the guard family
    holds: six DISTINCT 8-bit HSV points with six DISTINCT HSV
    component sums (so the quantile-init landing argument applies and
    the oracle's tie-breaks never fire), AND the vectorized numpy
    conversion twins (`_bgr2hsv_8u` / `_hsv2rgb_8u`) agree with the
    independent stdlib-colorsys scalar twin on every color (rejecting
    the rare rounding-boundary colors where one twin could round a
    half differently keeps the accepted fixtures' oracle values
    derivable from colorsys alone)."""
    from .images import _hsv_roundtrip  # lazy: images lazily imports colors

    rng = np.random.RandomState(10_000 + user)
    while True:
        cand = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(6)]
        via_colorsys = [_hsv_roundtrip(r, g, b) for r, g, b in cand]
        hsvs = [hsv for hsv, _ in via_colorsys]
        sums = [sum(h) for h in hsvs]
        if len(set(hsvs)) != 6 or len(set(sums)) != 6:
            continue
        # numpy twin agreement (the pipeline's own conversions): the
        # pipeline hands _bgr2hsv_8u the (r,g,b)-ordered array (its
        # BGR buffer flipped), reproducing the reference's channel
        # quirk - feed the same order here
        np_hsv = _bgr2hsv_8u(np.array(cand, dtype=np.float64))
        if [tuple(int(v) for v in row) for row in np_hsv] != hsvs:
            continue
        np_rgb = _hsv2rgb_8u(np.array(hsvs, dtype=np.float64))
        if [tuple(int(v) for v in row) for row in np_rgb] != [
            rgb for _, rgb in via_colorsys
        ]:
            continue
        return cand


def _user_image_bgr(user: int) -> bytes:
    """The canonical 64-pixel BGR tile for one user: each fixture
    color repeated its COUNTS_BY_SUM_RANK share (assigned by the
    color's HSV-sum rank). Every image of a user carries this exact
    pixel MULTISET; per-event variation is a rotation (below), which
    is multiset-invariant."""
    from .images import _hsv_roundtrip

    cols = _user_colors6(user)
    order = sorted(range(6), key=lambda j: sum(_hsv_roundtrip(*cols[j])[0]))
    px = []
    for rank, j in enumerate(order):
        r, g, b = cols[j]
        px.extend([b, g, r] * COUNTS_BY_SUM_RANK[rank])
    return bytes(px)


def synth_images(events: DataFrame) -> DataFrame:
    """Deterministic synthetic image store: one IMG_SIDE^2 x 3 uint8
    BGR buffer per (user, post) from the closed-form fixture family
    above; per-event pixel-order rotation by event_id (mapInPandas -
    generation happens executor-side, streaming Arrow batches)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tiles: dict[int, np.ndarray] = {}
        for pdf in batches:
            data = []
            for uid, eid in zip(pdf["user_id"], pdf["event_id"]):
                base = tiles.get(int(uid))
                if base is None:
                    base = np.frombuffer(
                        _user_image_bgr(int(uid)), dtype=np.uint8
                    ).reshape(-1, 3)
                    tiles[int(uid)] = base
                data.append(
                    np.roll(base, int(eid) % len(base), axis=0).tobytes()
                )
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


def _gonzalez_init(sample: np.ndarray, k: int) -> np.ndarray:
    """Deterministic farthest-first traversal (Gonzalez 1985, public
    k-center literature): start at the point nearest the mean, then
    repeatedly add the point farthest from the chosen set. Guarantees
    every remote pixel mode gets an initial center - the failure case
    of pure random/quantile inits on adversarial multi-modal
    populations (a tiny far-away blob that no restart seeds can never
    be reached by Lloyd migration; measured up to 15x inertia loss vs
    sklearn-style full restarts before this candidate existed,
    <= ~1.15x after - tests/test_colors_multimodal.py property-gates
    it).
    O(k*n), no RNG."""
    mean = sample.mean(axis=0)
    first = int(((sample - mean) ** 2).sum(axis=1).argmin())
    idx = [first]
    dmin = ((sample - sample[first]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        j = int(dmin.argmax())
        idx.append(j)
        dmin = np.minimum(dmin, ((sample - sample[j]) ** 2).sum(axis=1))
    return sample[idx]


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
    if len(uniq) > k and not full_restarts:
        # farthest-first candidate: covers remote low-mass modes that
        # neither the quantile spread nor the seeded draws reach (a
        # strict-< replacement, so provable-optimum fixtures where the
        # quantile init already attains inertia 0 are unchanged).
        # Racing mode only - full_restarts stays the sklearn-faithful
        # bakeoff shape.
        cand = _lloyd(sample, _gonzalez_init(sample, k), iters=race_iters)
        if cand[2] < best[2]:
            best = cand
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
    """Registry query: the full weekly color pipeline over the
    closed-form synthetic image store for users 0..19, capped at
    MAX_IMAGES_PER_USER earliest-by-event_id images per user (the
    window orders event_id ascending; result-invariant for this
    fixture family because every image of a user is a rotation of one
    multiset-identical tile - the cap keeps the per-user pixel
    population <= KMEANS_SAMPLE, which is
    what makes the KMeans outcome provably exact - see
    COUNTS_BY_SUM_RANK). Because the fixture family has a provable
    Lloyd optimum, the palette JSON is closed-form per user and the
    DuckDB oracle hash-checks the EXACT output (the
    color_palette_png technique, images.py:455, applied to the
    flagship entry)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < N_PALETTE_USERS)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MAX_IMAGES_PER_USER)
        .drop("rn")
    )
    return color_palette(synth_images(events)).orderBy("igId")


def expected_palette_json(user: int) -> str:
    """Closed-form palette for one user of the fixture family,
    derived WITHOUT running KMeans: the per-user pixel population is
    six distinct HSV points whose global 6-means optimum is the points
    themselves, so counts are the COUNTS_BY_SUM_RANK shares and the
    emitted colors are the colorsys-twin round trips of the fixture
    colors. Ranking mirrors the operator: count desc (counts are
    distinct by construction, so the HSV-sum residual tie-break never
    fires)."""
    from .images import _hsv_roundtrip

    cols = _user_colors6(user)
    scored = [_hsv_roundtrip(r, g, b) for r, g, b in cols]
    by_sum = sorted(range(6), key=lambda j: sum(scored[j][0]))
    ranked = sorted(
        zip(COUNTS_BY_SUM_RANK, (scored[j][1] for j in by_sum)),
        key=lambda t: -t[0],
    )
    colors = []
    for count, (r, g, b) in ranked:
        colors.append(
            {
                "percentage": round(float(count / 64.0), 4),
                "red": r,
                "green": g,
                "blue": b,
                "hex": f"#{r:02x}{g:02x}{b:02x}",
            }
        )
    return json.dumps(colors)


def _color_palette_oracle() -> str:
    """DuckDB oracle: the closed-form palette JSON joined against the
    users that actually have events (the query derives its user set
    the same way)."""
    rows = ", ".join(
        "({}, '{}')".format(u, expected_palette_json(u))
        for u in range(N_PALETTE_USERS)
    )
    return (
        "SELECT CAST(e.user_id AS VARCHAR) AS igId, p.colors AS colors "
        f"FROM (SELECT DISTINCT user_id FROM events "
        f"WHERE user_id < {N_PALETTE_USERS}) e "
        f"JOIN (VALUES {rows}) AS p(u, colors) ON e.user_id = p.u"
    )


COLOR_PALETTE_ORACLE_SQL = _color_palette_oracle()


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
