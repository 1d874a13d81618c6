"""Independent cross-check of the from-scratch GIF and BMP decoders
against the JVM's ImageIO via Spark's native image source: the same
fixture bytes must decode to pixel-identical images in both
implementations (the same contract the PNG codec carries in
``test_image_source.py`` / the ``image_decode`` registry entry)."""

from __future__ import annotations

import numpy as np

from data_pipeline_capstone_project_spark.operators.gif import (
    _lcg_indices,
    _lcg_palette,
    gif_frames,
    make_gif,
)
from data_pipeline_capstone_project_spark.operators.images import (
    bmp_pixels,
    make_bmp,
)


def _jvm_decode(spark, store: str) -> dict[str, np.ndarray]:
    """name -> (h, w, 3) RGB via the image source (ImageIO decode,
    OpenCV-style BGR byte layout)."""
    rows = (
        spark.read.format("image")
        .option("dropInvalid", True)
        .load(store)
        .select("image.*")
        .collect()
    )
    out = {}
    for r in rows:
        assert r["nChannels"] in (3, 4), r["origin"]
        arr = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(
            r["height"], r["width"], r["nChannels"]
        )
        out[r["origin"].rsplit("/", 1)[-1]] = arr[:, :, [2, 1, 0]]
    return out


def test_gif_decoder_matches_jvm_imageio(spark, tmp_path):
    store = tmp_path / "gifs"
    store.mkdir()
    ours = {}
    for i in range(4):
        w, h = 9 + 3 * i, 6 + 2 * i
        pal_n = (8, 4, 256, 2)[i]
        frames = [
            {
                "idx": _lcg_indices(h, w, pal_n, 17 * i),
                "interlace": i % 2 == 1,
            }
        ]
        payload = make_gif(w, h, _lcg_palette(pal_n, i), frames)
        (store / f"x{i}.gif").write_bytes(payload)
        ours[f"x{i}.gif"] = gif_frames(payload)[0]["rgb"]
    theirs = _jvm_decode(spark, str(store))
    assert set(theirs) == set(ours)
    for name, rgb in ours.items():
        assert np.array_equal(theirs[name], rgb), name


def test_bmp_decoder_matches_jvm_imageio(spark, tmp_path):
    store = tmp_path / "bmps"
    store.mkdir()
    ours = {}
    for i in range(3):
        h, w = 5 + 2 * i, 8 + 3 * i
        img = np.random.RandomState(40 + i).randint(
            0, 256, (h, w, 3)
        ).astype(np.uint8)
        payload = make_bmp(img)
        (store / f"b{i}.bmp").write_bytes(payload)
        ours[f"b{i}.bmp"] = bmp_pixels(payload)
        assert np.array_equal(ours[f"b{i}.bmp"], img)
    theirs = _jvm_decode(spark, str(store))
    assert set(theirs) == set(ours)
    for name, rgb in ours.items():
        assert np.array_equal(theirs[name], rgb), name
