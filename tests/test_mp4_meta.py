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


def test_multitrack_fragment_skips_foreign_trafs():
    """A/V fragmented layout: trafs whose tfhd track_ID is not the
    video track's must contribute neither sample ranges (mp4_frames
    would hand audio bytes to the JPEG decoder) nor trun durations
    (audio runs in a different media timescale, inflating
    duration_ms). Appends an audio-track fragment (track_ID 2, 48 kHz
    timescale durations) to a video-only fMP4 and requires every
    video-facing answer to be unchanged."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.mp4 import (
        make_mjpeg_mp4,
        mp4_frames,
        mp4_meta,
        mp4_sample_table,
    )

    rng = np.random.RandomState(17)
    frames = [
        rng.randint(0, 256, (16, 16, 3)).astype(np.uint8) for _ in range(4)
    ]
    # no mehd: duration must come from the VIDEO trun sum only
    video = make_mjpeg_mp4(frames, fragmented=True, use_mehd=False)

    # one audio fragment: 10 AAC-sized samples of junk, track_ID 2,
    # per-sample durations of 1024 ticks (the AAC frame length) - in a
    # 48 kHz media timescale these would add ~213 ms if mis-summed
    # into the video track's 1000 Hz timescale.
    n_samp, samp_size, samp_dur = 10, 64, 1024
    tfhd = _box(
        b"tfhd", bytes([0]) + (0x020000).to_bytes(3, "big") + struct.pack(">I", 2)
    )
    trun_flags = 0x000001 | 0x000100 | 0x000200

    def build_audio_trun(doff: int) -> bytes:
        body = bytes([0]) + trun_flags.to_bytes(3, "big")
        body += struct.pack(">Ii", n_samp, doff)
        for _ in range(n_samp):
            body += struct.pack(">II", samp_dur, samp_size)
        return _box(b"trun", body)

    mfhd = _box(b"mfhd", struct.pack(">B3xI", 0, 99))
    probe = _box(b"moof", mfhd + _box(b"traf", tfhd + build_audio_trun(0)))
    moof = _box(
        b"moof", mfhd + _box(b"traf", tfhd + build_audio_trun(len(probe) + 8))
    )
    mdat = _box(b"mdat", b"\xde" * (n_samp * samp_size))
    av = video + moof + mdat

    assert mp4_meta(av) == mp4_meta(video)
    codec, table = mp4_sample_table(av)
    assert (codec, table) == mp4_sample_table(video)
    for a, b in zip(mp4_frames(av), mp4_frames(video)):
        assert np.array_equal(a, b)


def test_trun_without_data_offset_continues_after_previous_run():
    """14496-12 8.8.8.1: a trun without data-offset-present starts
    where the previous run's data ended. Build one moof whose second
    trun omits the offset; both samples must still demux and decode."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.mp4 import (
        make_mjpeg_mp4,
        mp4_frames,
    )

    rng = np.random.RandomState(23)
    frames = [
        rng.randint(0, 256, (16, 16, 3)).astype(np.uint8) for _ in range(2)
    ]
    # Reference result: the standard muxer's fragment layout.
    ref = mp4_frames(make_mjpeg_mp4(frames, fragmented=True, use_mehd=True))

    # Surgery: take the muxer's single-fragment file (both samples in
    # one trun) and split that trun in two, dropping the second trun's
    # data offset - content is byte-identical, only the run structure
    # changes.
    onefrag = make_mjpeg_mp4(
        frames, fragmented=True, use_mehd=True, frames_per_frag=2
    )
    moof_off = onefrag.find(b"moof") - 4
    (moof_size,) = struct.unpack(">I", onefrag[moof_off : moof_off + 4])
    moof_body = onefrag[moof_off + 8 : moof_off + moof_size]
    trun_off = moof_body.find(b"trun") - 4
    (trun_size,) = struct.unpack(">I", moof_body[trun_off : trun_off + 4])
    trun = moof_body[trun_off + 4 : trun_off + trun_size]
    flags = int.from_bytes(trun[5:8], "big")
    assert flags & 0x000001 and flags & 0x000200  # data-offset + sizes
    per_dur = 4 if flags & 0x000100 else 0
    (count,) = struct.unpack(">I", trun[8:12])
    assert count == 2
    (doff,) = struct.unpack(">i", trun[12:16])
    rows = trun[16:]
    row_w = per_dur + 4
    row1, row2 = rows[:row_w], rows[row_w : 2 * row_w]
    trun1 = (
        b"trun" + trun[4:8] + struct.pack(">Ii", 1, doff) + row1
    )
    trun1 = struct.pack(">I", 4 + len(trun1)) + trun1
    # second run: NO data-offset-present - must continue after row1
    flags2 = flags & ~0x000001
    trun2 = (
        b"trun" + bytes([trun[4]]) + flags2.to_bytes(3, "big")
        + struct.pack(">I", 1) + row2
    )
    trun2 = struct.pack(">I", 4 + len(trun2)) + trun2
    # moof grew: every moof-relative data offset shifts by the delta,
    # and the enclosing traf's size field must grow with its new child
    delta = (len(trun1) + len(trun2)) - trun_size
    (d1,) = struct.unpack(">i", trun1[16:20])
    trun1 = trun1[:16] + struct.pack(">i", d1 + delta) + trun1[20:]
    new_moof_body = bytearray(
        moof_body[:trun_off] + trun1 + trun2 + moof_body[trun_off + trun_size :]
    )
    traf_off = new_moof_body.find(b"traf") - 4
    (traf_size,) = struct.unpack(
        ">I", new_moof_body[traf_off : traf_off + 4]
    )
    new_moof_body[traf_off : traf_off + 4] = struct.pack(
        ">I", traf_size + delta
    )
    new_moof_body = bytes(new_moof_body)
    new_moof = struct.pack(">I", 8 + len(new_moof_body)) + b"moof" + new_moof_body
    patched = (
        onefrag[:moof_off] + new_moof + onefrag[moof_off + moof_size :]
    )
    got = mp4_frames(patched)
    assert len(got) == 2
    for a, b in zip(got, ref):
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
