"""Multimodal (binary) column operators.

Images/audio/video are opaque ``binary`` columns with typed metadata -
the Spark-side plumbing (schema, Arrow batch shape, partitioning) is
real and tested, and so are the codecs: no image/audio library exists
in this environment, so the repo carries its own pure-numpy PNG and
JPEG (baseline + progressive) pixel codecs, a GIF LZW/animation
codec, an MP4 moov parser, and a WAV container/PCM reader, each
oracle-checked by its own registry query.

- :func:`decode_media_meta` is the operator shape: ``mapInPandas``
  over Arrow batches of (id, payload binary) producing typed metadata.
  The decode callback defaults to :func:`fake_decode` (deterministic,
  derived from the byte stream - used where the registry query needs
  a length-only DuckDB oracle over the documents table); production
  routing is ``decoder=real_decode``, pinned end-to-end by the
  ``media_dispatch`` registry query.
- :func:`real_decode` dispatches on magic bytes to the in-repo
  codecs (the reference decoded with cv2 inside its grouped-map UDF,
  ``spark_image.py:140-160``); the remaining external-library seam is
  compressed-audio and H.264 FRAME decode, which raises clearly.

Scale notes: ``mapInPandas`` streams Arrow record batches - payload
bytes never materialize on the driver, and each task handles its
batches independently (binary-heavy tables should set small
``maxPartitionBytes`` so a partition of big blobs still fits in
executor memory).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

META_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, fmt string, thumb_bytes long"
)

THUMB_LIMIT = 64


def real_decode(payload: bytes) -> tuple[int, int]:
    """Real codec dispatch. PNG decodes with the in-repo pure-Python
    codec (:mod:`.images` - header parse here; full pixel decode via
    ``png_pixels``, cross-checked pixel-exact against the JVM image
    source by the ``image_decode`` registry query). Baseline JPEG -
    the reference store's dominant format (``s3-to-es_aws.py:92``) -
    decodes with :mod:`.jpeg` (SOF header parse here; full baseline
    AND progressive Huffman + IDCT decode via ``jpeg_pixels``,
    cross-checked against JVM ImageIO by the ``jpeg_decode`` registry
    query). MP4 video - the store's
    VIDEO/STORY originals (``s3-to-es_aws.py:101-122``) - parses
    container metadata with :mod:`.mp4` (moov/mvhd/tkhd walk,
    oracle-checked by ``mp4_meta``); H.264 FRAME decode still needs an
    external library this environment lacks - that seam stays
    explicit, as does audio."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .images import png_meta

        return png_meta(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import gif_meta

        return gif_meta(payload)
    if payload[:2] == b"BM":
        from .images import bmp_meta

        return bmp_meta(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from .jpeg import jpeg_meta

        return jpeg_meta(payload)
    if payload[4:8] == b"ftyp":
        from .mp4 import mp4_meta

        return mp4_meta(payload)[:2]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # audio has no pixel dims; the dispatcher's (width, height)
        # slots carry (channels, sample_rate) - the deeper per-codec
        # oracle (wav_stats) checks the full decode incl. the ADPCM
        # recurrences
        from .audio import wav_meta

        ch, rate, _bits, _dur = wav_meta(payload)
        return ch, rate
    raise NotImplementedError(
        "no codec for this format in this environment (PNG, baseline "
        "JPEG, MP4 container metadata and RIFF/WAVE are supported)"
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in decode: metadata derived from the byte
    stream only (so results are reproducible and oracle-checkable)."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1)


def decode_media_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fmt_col: str = "fmt",
    decoder: Callable[[bytes], tuple[int, int]] = fake_decode,
) -> DataFrame:
    """Binary payloads -> typed media metadata via Arrow-batched
    ``mapInPandas`` (decode + thumbnail-slice per record)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [decoder(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(p) for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "fmt": pdf[fmt_col],
                    "thumb_bytes": [len(p[:THUMB_LIMIT]) for p in payloads],
                }
            )

    return df.mapInPandas(decode_batches, schema=META_SCHEMA)


def multimodal_meta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: documents' text bytes stand in for media
    payloads (binary column built with ``encode``); the mapInPandas
    decode produces metadata the DuckDB oracle recomputes from
    lengths (corpus is ASCII, so n_bytes == n_chars)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.concat(F.lit("fake/"), F.col("source")).alias("fmt"),
    )
    return decode_media_meta(payloads)


MULTIMODAL_META_ORACLE_SQL = f"""
SELECT doc_id,
       length(text) AS n_bytes,
       length(text) % 640 + 1 AS width,
       (length(text) * 7) % 480 + 1 AS height,
       'fake/' || source AS fmt,
       least(length(text), {THUMB_LIMIT}) AS thumb_bytes
FROM documents
"""


def media_dispatch_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query for the ``real_decode`` DISPATCHER itself: one
    store mixing PNG, baseline JPEG, progressive JPEG, MP4, GIF, BMP,
    and MS-ADPCM WAV payloads, decoded through the same ``decode_media_meta`` plumbing
    production would use (``decoder=real_decode``), hash-checked
    against a closed-form oracle. The per-format codecs each have
    their own deeper oracle query (image_decode / jpeg_decode /
    mp4_meta); this one pins the magic-byte routing and the
    format-to-dims contract across formats in a single scan."""
    import os
    import shutil
    import tempfile

    import numpy as np

    from .audio import make_wav
    from .gif import _lcg_indices, _lcg_palette, make_gif
    from .images import make_bmp, make_bmp_indexed, make_png
    from .jpeg import make_jpeg
    from .mp4 import make_mp4

    work = tempfile.mkdtemp(prefix="media_mix_")
    try:
        for i in range(8):
            px = np.full((10 + i, 6 + i, 3), 40 + 9 * i, dtype=np.uint8)
            with open(os.path.join(work, f"m{i}_png.png"), "wb") as f:
                f.write(make_png(px))
            with open(os.path.join(work, f"m{i}_jpg.jpg"), "wb") as f:
                f.write(make_jpeg(px))
            with open(os.path.join(work, f"m{i}_pjpg.jpg"), "wb") as f:
                f.write(make_jpeg(px, progressive=True))
            with open(os.path.join(work, f"m{i}_mp4.mp4"), "wb") as f:
                f.write(make_mp4(320 + 2 * i, 180 + i, 1500 + 100 * i))
            with open(os.path.join(work, f"m{i}_gif.gif"), "wb") as f:
                f.write(
                    make_gif(
                        12 + i, 7 + i, _lcg_palette(8, i),
                        [{"idx": _lcg_indices(7 + i, 12 + i, 8, i)}],
                    )
                )
            with open(os.path.join(work, f"m{i}_bmp.bmp"), "wb") as f:
                f.write(make_bmp(px))
            # r11: 8-bit BI_RLE8 paletted BMP - same "bmp" magic, a
            # different on-disk encoding the dispatcher must route
            # through the same bmp_meta dims contract
            with open(os.path.join(work, f"m{i}_rbmp.bmp"), "wb") as f:
                f.write(
                    make_bmp_indexed(
                        np.array(
                            _lcg_indices(9 + i, 7 + i, 5 + i, 3 * i),
                            dtype=np.uint8,
                        ),
                        [tuple(int(v) for v in c)
                         for c in _lcg_palette(5 + i, 7 * i)],
                        rle=True,
                    )
                )
            with open(os.path.join(work, f"m{i}_wav.wav"), "wb") as f:
                f.write(
                    make_wav(
                        150 + 11 * i, sample_rate=8000 * (1 + i % 2),
                        channels=1 + i % 2, bits=4, seed=i, ms_adpcm=True,
                    )
                )
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.regexp_extract(
                F.element_at(F.split("path", "/"), -1), r"m(\d+)_", 1
            ).cast("long").alias("doc_id"),
            F.col("content").alias("payload"),
            F.element_at(
                F.split(F.element_at(F.split("path", "/"), -1), r"\."), -1
            ).alias("fmt"),
        )
        out = decode_media_meta(bin_df, decoder=real_decode)
        # doc_id/fmt/width alone is not unique (the baseline and
        # progressive JPEG of the same index share all three);
        # n_bytes differs between every fixture pair, making the key
        # a true unique key.
        return out.withColumn(
            "media_key",
            F.concat_ws(
                "/", F.col("doc_id").cast("string"), "fmt", "width", "n_bytes"
            ),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _media_dispatch_oracle() -> str:
    import numpy as np

    from .audio import make_wav
    from .gif import _lcg_indices, _lcg_palette, make_gif
    from .images import make_bmp, make_bmp_indexed, make_png
    from .jpeg import make_jpeg
    from .mp4 import make_mp4

    rows = []
    for i in range(8):
        px = np.full((10 + i, 6 + i, 3), 40 + 9 * i, dtype=np.uint8)
        gif_payload = make_gif(
            12 + i, 7 + i, _lcg_palette(8, i),
            [{"idx": _lcg_indices(7 + i, 12 + i, 8, i)}],
        )
        for fmt, payload, (w, h) in (
            ("png", make_png(px), (6 + i, 10 + i)),
            ("jpg", make_jpeg(px), (6 + i, 10 + i)),
            ("jpg", make_jpeg(px, progressive=True), (6 + i, 10 + i)),
            ("mp4", make_mp4(320 + 2 * i, 180 + i, 1500 + 100 * i), (320 + 2 * i, 180 + i)),
            ("gif", gif_payload, (12 + i, 7 + i)),
            ("bmp", make_bmp(px), (6 + i, 10 + i)),
            (
                "bmp",
                make_bmp_indexed(
                    np.array(
                        _lcg_indices(9 + i, 7 + i, 5 + i, 3 * i),
                        dtype=np.uint8,
                    ),
                    [tuple(int(v) for v in c)
                     for c in _lcg_palette(5 + i, 7 * i)],
                    rle=True,
                ),
                (7 + i, 9 + i),
            ),
            (
                "wav",
                make_wav(
                    150 + 11 * i, sample_rate=8000 * (1 + i % 2),
                    channels=1 + i % 2, bits=4, seed=i, ms_adpcm=True,
                ),
                (1 + i % 2, 8000 * (1 + i % 2)),
            ),
        ):
            rows.append(
                f"({i}, {len(payload)}, {w}, {h}, '{fmt}', "
                f"{min(len(payload), THUMB_LIMIT)}, "
                f"'{i}/{fmt}/{w}/{len(payload)}')"
            )
    return (
        "SELECT doc_id, n_bytes, width, height, fmt, thumb_bytes, media_key "
        f"FROM (VALUES {', '.join(rows)}) "
        "AS t(doc_id, n_bytes, width, height, fmt, thumb_bytes, media_key)"
    )


MEDIA_DISPATCH_ORACLE_SQL = _media_dispatch_oracle()


N_FRAMES = 4
FRAME_CHUNK = 256


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Frame sampling over binary payloads (the video-frame-extraction
    shape): N_FRAMES evenly-strided slices per payload, emitted as one
    row per frame via Arrow-batched ``mapInPandas``. The slicing runs
    on REAL bytes inside the worker (a codec would decode these
    slices); the emitted offsets/lengths are pure arithmetic so the
    oracle can verify the fan-out relationally. Batch shape: input
    rows -> variable rows out (<= N_FRAMES per input), the generator
    contract a frame extractor needs."""

    def frame_batches(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_len": []}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(payload)
                stride = max(n // N_FRAMES, 1)
                chunk = min(FRAME_CHUNK, stride)
                for k in range(N_FRAMES):
                    off = k * stride
                    if off >= n:
                        break
                    frame = payload[off : off + chunk]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(k)
                    out["frame_off"].append(off)
                    out["frame_len"].append(len(frame))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        frame_batches, "doc_id long, frame_idx int, frame_off long, frame_len long"
    )


def frame_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: frame-sample the stand-in binary payloads."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return sample_frames(payloads)


FRAME_SAMPLE_ORACLE_SQL = f"""
WITH p AS (SELECT doc_id, length(text) AS n FROM documents),
f AS (SELECT doc_id, n, unnest(range(0, {N_FRAMES})) AS frame_idx FROM p)
SELECT doc_id,
       frame_idx::INT AS frame_idx,
       frame_idx * greatest(n // {N_FRAMES}, 1) AS frame_off,
       least(least({FRAME_CHUNK}, greatest(n // {N_FRAMES}, 1)),
             n - frame_idx * greatest(n // {N_FRAMES}, 1)) AS frame_len
FROM f
WHERE frame_idx * greatest(n // {N_FRAMES}, 1) < n
"""
