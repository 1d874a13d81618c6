"""MP4 (ISO BMFF) container metadata: the box walker against its own
fixture writer, layout variants the writer does not emit (version-1
mvhd, 64-bit largesize, audio-track ordering), the real_decode
dispatch seam, and the Spark registry query end-to-end."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.mp4 import (
    _box,
    make_mp4,
    mp4_meta,
    mp4_meta_query,
)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(16, 4096),
    st.integers(16, 4096),
    st.integers(0, 10_000_000).map(lambda x: x * 5),  # exact under ts=600
    st.sampled_from([600, 1000, 90000]),
)
def test_roundtrip(w, h, dur_ms, ts):
    assert mp4_meta(make_mp4(w, h, dur_ms, timescale=ts)) == (w, h, dur_ms)


def test_version1_mvhd_and_largesize():
    """Layouts the fixture writer never emits: a version-1 mvhd
    (64-bit times) and an mdat using the size==1 largesize escape -
    both appear in real large/recent files."""
    w, h, ts, dur = 1920, 1080, 90000, 9_000_000  # 100 s
    mvhd_v1 = _box(
        b"mvhd",
        struct.pack(">B3x", 1)
        + struct.pack(">QQIQ", 0, 0, ts, dur)
        + b"\x00" * 80,
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B2xB", 0, 7)
        + struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 52
        + struct.pack(">II", w << 16, h << 16),
    )
    moov = _box(b"moov", mvhd_v1 + _box(b"trak", tkhd))
    mdat_body = b"z" * 10
    largesize_mdat = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(mdat_body))
        + mdat_body
    )
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512))
    assert mp4_meta(ftyp + moov + largesize_mdat) == (w, h, 100_000)


def test_audio_track_before_video():
    """Audio tkhd carries width 0x0 - the walker must skip it and read
    dims from the video track that follows."""
    dur, ts = 3000, 1000
    base = make_mp4(640, 360, dur, timescale=ts)
    audio_tkhd = _box(
        b"tkhd",
        struct.pack(">B2xB", 0, 7)
        + struct.pack(">IIIII", 0, 0, 2, 0, dur)
        + b"\x00" * 52
        + struct.pack(">II", 0, 0),
    )
    audio_trak = _box(b"trak", audio_tkhd)
    # splice the audio trak in as moov's first child
    (moov_size,) = struct.unpack(">I", base[base.find(b"moov") - 4 :][:4])
    moov_off = base.find(b"moov") - 4
    moov_body = base[moov_off + 8 : moov_off + moov_size]
    mvhd_len = struct.unpack(">I", moov_body[:4])[0]
    new_body = moov_body[:mvhd_len] + audio_trak + moov_body[mvhd_len:]
    rebuilt = base[:moov_off] + _box(b"moov", new_body) + base[moov_off + moov_size :]
    assert mp4_meta(rebuilt) == (640, 360, dur)


def test_no_moov_rejected():
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512))
    with pytest.raises(ValueError):
        mp4_meta(ftyp + _box(b"mdat", b"xx"))
    with pytest.raises(ValueError):
        mp4_meta(b"\x1aE\xdf\xa3webm-ish")


def test_real_decode_dispatches_mp4():
    from data_pipeline_capstone_project_spark.operators.multimodal import (
        real_decode,
    )

    assert real_decode(make_mp4(854, 480, 7000)) == (854, 480)


def test_mp4_meta_query_spark(spark, sf_dir):
    rows = {r["video_name"]: r for r in mp4_meta_query(spark, sf_dir).collect()}
    assert len(rows) == 30  # 24 classic + 6 fragmented
    r0 = rows["v00.mp4"]
    assert (r0["width"], r0["height"], r0["duration_ms"]) == (320, 240, 1000)
    # fragmented fixtures: duration reconstructed from mehd (f00) and
    # from the trun sample-duration sum (f01 - no mehd)
    assert (rows["f00.mp4"]["duration_ms"], rows["f01.mp4"]["duration_ms"]) == (
        500,
        750,
    )
    assert all(r["n_bytes"] > 0 for r in rows.values())


def test_fragmented_mjpeg_equals_classic():
    """The fMP4 mux of the same frames must demux to byte-identical
    sample ranges' content and decode to identical pixels; duration
    must match whether it comes from mehd, trun sums, or the classic
    mvhd path."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.mp4 import (
        make_mjpeg_mp4,
        mp4_frames,
        mp4_sample_table,
    )

    rng = np.random.RandomState(9)
    frames = [
        rng.randint(0, 256, (16, 16, 3)).astype(np.uint8) for _ in range(5)
    ]
    classic = make_mjpeg_mp4(frames)
    for use_mehd in (True, False):
        for fpf in (1, 2, 3):
            frag = make_mjpeg_mp4(
                frames, fragmented=True, frames_per_frag=fpf, use_mehd=use_mehd
            )
            assert mp4_meta(frag) == mp4_meta(classic)
            codec, table = mp4_sample_table(frag)
            assert codec == b"jpeg" and len(table) == 5
            for off, size in table:
                assert frag[off : off + 2] == b"\xff\xd8"
            for a, b in zip(mp4_frames(classic), mp4_frames(frag)):
                assert np.array_equal(a, b)


def test_mjpeg_frames_roundtrip():
    """MJPEG mp4: demux via the real sample tables (stsd/stsz/stsc/
    stco) and decode every frame with the in-repo JPEG codec - frames
    come back in order, at full size, within the codec's quantization
    tolerance."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.mp4 import (
        make_mjpeg_mp4,
        mp4_frames,
        mp4_meta,
        mp4_sample_table,
    )

    rng = np.random.RandomState(3)
    frames = [
        rng.randint(0, 256, (24, 16, 3)).astype(np.uint8) for _ in range(5)
    ]
    payload = make_mjpeg_mp4(frames)
    assert mp4_meta(payload)[:2] == (16, 24)
    codec, table = mp4_sample_table(payload)
    assert codec == b"jpeg" and len(table) == 5
    # every sample range starts with a JPEG SOI inside mdat
    for off, size in table:
        assert payload[off : off + 2] == b"\xff\xd8" and size > 2
    decoded = mp4_frames(payload)
    assert len(decoded) == 5
    for f, d in zip(frames, decoded):
        assert d.shape == f.shape
        # baseline-JPEG round trip bound for noise content
        assert int(np.abs(d.astype(int) - f.astype(int)).max()) <= 20


def test_non_mjpeg_codec_raises_cleanly():
    import numpy as np
    import pytest

    from data_pipeline_capstone_project_spark.operators.mp4 import (
        make_mjpeg_mp4,
        mp4_frames,
    )

    payload = bytearray(make_mjpeg_mp4([np.zeros((8, 8, 3), np.uint8)]))
    i = payload.find(b"jpeg", payload.find(b"stsd"))
    payload[i : i + 4] = b"avc1"  # relabel the sample entry H.264
    with pytest.raises(NotImplementedError):
        mp4_frames(bytes(payload))
