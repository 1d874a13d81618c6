"""WAV (RIFF) container metadata + PCM stats: writer/parser round
trip, RIFF quirks the writer does not emit (unknown chunks, odd-size
word padding), rejection, and the Spark registry query end-to-end."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.audio import (
    make_wav,
    wav_meta,
    wav_pcm,
    wav_stats_query,
)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 5000),
    st.sampled_from([8000, 16000, 22050, 44100]),
    st.integers(1, 2),
    st.sampled_from([8, 16, 24]),
    st.integers(0, 99),
)
def test_roundtrip(ns, rate, ch, bits, seed):
    p = make_wav(ns, sample_rate=rate, channels=ch, bits=bits, seed=seed)
    pch, prate, pbits, pdur = wav_meta(p)
    assert (pch, prate, pbits) == (ch, rate, bits)
    assert pdur == round(ns * 1000 / rate)
    pcm = wav_pcm(p)
    assert pcm.shape == (ns, ch)
    lim = 1 << (bits - 1)
    assert pcm.min() >= -lim and pcm.max() < lim


def test_unknown_chunks_and_padding_skipped():
    """A LIST chunk before fmt and an odd-sized junk chunk (word-
    padded per RIFF) must not derail the walk - real recorders emit
    both."""
    base = make_wav(100, sample_rate=8000, channels=1, bits=16, seed=7)
    body = base[12:]
    junk_odd = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    rebuilt = (
        b"RIFF"
        + struct.pack("<I", 4 + len(lst) + len(junk_odd) + len(body))
        + b"WAVE"
        + lst
        + junk_odd
        + body
    )
    assert wav_meta(rebuilt) == wav_meta(base)
    assert np.array_equal(wav_pcm(rebuilt), wav_pcm(base))


def test_non_riff_rejected():
    with pytest.raises(ValueError):
        wav_meta(b"OggS" + b"\x00" * 40)
    with pytest.raises(ValueError):
        wav_meta(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_24bit_sign_extension_exact():
    """The 3-byte packing must survive the full signed range: craft a
    data chunk holding the exact extremes and known mid values."""
    vals = np.array([-(1 << 23), (1 << 23) - 1, -1, 0, 1, -483210, 777777])
    u = (vals & 0xFFFFFF).astype("<u4")
    raw = np.ascontiguousarray(u.view(np.uint8).reshape(-1, 4)[:, :3]).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert np.array_equal(wav_pcm(payload).reshape(-1), vals)


def test_float32_wav_roundtrip_exact():
    """IEEE-float WAV (format tag 3): the writer emits dyadic Q8.23
    values, so the parse must return bit-identical float32 samples
    and the Q23 rescale must be integer-exact."""
    p = make_wav(500, sample_rate=16000, channels=2, bits=32, seed=11,
                 float_fmt=True)
    assert wav_meta(p) == (2, 16000, 32, round(500 * 1000 / 16000))
    pcm = wav_pcm(p)
    assert pcm.dtype == np.float32 and pcm.shape == (500, 2)
    assert np.abs(pcm).max() < 1.0
    q23 = pcm.astype(np.float64) * (1 << 23)
    assert np.array_equal(q23, np.round(q23))  # exact lattice


def test_misaligned_24bit_rejected():
    """A 24-bit data chunk that is not a whole number of frames is
    corruption and must raise, matching the other widths' strictness
    (ADVICE r6): silent truncation would hide real file damage."""
    base = make_wav(10, sample_rate=8000, channels=1, bits=24, seed=3)
    doff = base.find(b"data")
    (dsize,) = struct.unpack("<I", base[doff + 4 : doff + 8])
    clipped = (
        base[: doff + 4]
        + struct.pack("<I", dsize - 1)
        + base[doff + 8 : doff + 8 + dsize - 1]
    )
    with pytest.raises(ValueError):
        wav_pcm(clipped)


def test_unsupported_format_tag_is_honest_seam():
    """MP3-in-WAV (tag 0x55) and friends: metadata still parses,
    sample decode raises NotImplementedError - the documented seam,
    not a crash. (MS-ADPCM, the former seam, decodes for real now;
    a tag-2 file without its fmt extension is CORRUPTION, ValueError.)"""
    base = make_wav(10, sample_rate=8000, channels=1, bits=16, seed=5)
    foff = base.find(b"fmt ")
    patched = base[: foff + 8] + struct.pack("<H", 0x55) + base[foff + 10 :]
    assert wav_meta(patched)[0] == 1
    with pytest.raises(NotImplementedError):
        wav_pcm(patched)
    ms_no_ext = base[: foff + 8] + struct.pack("<H", 2) + base[foff + 10 :]
    with pytest.raises(ValueError):
        wav_pcm(ms_no_ext)


def test_g711_expansion_matches_published_values():
    """The expansion tables against ITU-T G.711 reference points (the
    classic CCITT ulaw2linear/alaw2linear values): full-scale
    negative, zero codes, and a mid-segment sample for each law."""
    from data_pipeline_capstone_project_spark.operators.audio import (
        _ALAW_TABLE,
        _ULAW_TABLE,
    )

    # mu-law: code 0x00 -> -32124 (full-scale), 0xFF -> 0, 0x7F -> 0
    assert _ULAW_TABLE[0x00] == -32124
    assert _ULAW_TABLE[0xFF] == 0
    assert _ULAW_TABLE[0x7F] == 0
    # a-law: code 0x55 (^0x55 = 0, seg 0) -> -8; 0xD5 -> +8;
    # 0x2A (^0x55 = 0x7F: seg 7 mantissa 15) -> -32256 full-scale
    assert _ALAW_TABLE[0x55] == -8
    assert _ALAW_TABLE[0xD5] == 8
    assert _ALAW_TABLE[0x2A] == -32256
    # symmetry: flipping the sign bit of the COMPLEMENTED/XORed code
    # negates the magnitude
    assert np.array_equal(
        _ULAW_TABLE[:128], -_ULAW_TABLE[128:]
    )


def test_g711_wav_roundtrip():
    """A G.711 WAV decodes through the same wav_pcm path: 8-bit
    container metadata, int32 samples in the 13/14-bit expanded
    range."""
    for law, lim in (("ulaw", 32124), ("alaw", 32256)):
        p = make_wav(300, sample_rate=8000, channels=1, bits=8, seed=9,
                     g711=law)
        assert wav_meta(p) == (1, 8000, 8, round(300 * 1000 / 8000))
        pcm = wav_pcm(p)
        assert pcm.shape == (300, 1) and pcm.dtype == np.int32
        assert np.abs(pcm).max() <= lim
        assert np.abs(pcm).max() > 255  # expanded, not raw bytes


def test_wav_stats_query_spark(spark, sf_dir):
    rows = {r["clip_name"]: r for r in wav_stats_query(spark, sf_dir).collect()}
    assert len(rows) == 30
    r0 = rows["a00.wav"]
    assert (r0["channels"], r0["sample_rate"], r0["bits"]) == (1, 8000, 16)
    by_codec = {}
    for r in rows.values():
        by_codec.setdefault(r["codec"], []).append(r)
    # every decodable codec family present: integer PCM at three
    # widths, IEEE float, both G.711 laws, and both ADPCM variants
    assert set(by_codec) == {
        "pcm", "float", "alaw", "ulaw", "ima_adpcm", "ms_adpcm",
    }
    # the 24-bit studio width's peaks use the widened range
    w24 = [r for r in by_codec["pcm"] if r["bits"] == 24]
    assert len(w24) == 3
    assert max(r["peak"] for r in w24) > (1 << 15)
    # IEEE float clips: Q23 integer probes on the same lattice.
    # r11 adds two float64 clips and an EXTENSIBLE-wrapped float32
    # (its codec resolves through the SubFormat GUID) next to the
    # three plain float32.
    fl = by_codec["float"]
    assert len(fl) == 6
    assert sorted(r["bits"] for r in fl) == [32, 32, 32, 32, 64, 64]
    assert all(0 < r["peak"] < (1 << 23) for r in fl)
    # r11: full-scale int32 PCM - peaks beyond the 24-bit range
    w32 = [r for r in by_codec["pcm"] if r["bits"] == 32]
    assert len(w32) == 2
    assert all(r["peak"] > (1 << 24) for r in w32)
    # G.711: 8-bit container, expanded 13/14-bit sample range
    for law, lim in (("ulaw", 32124), ("alaw", 32256)):
        clips = by_codec[law]
        assert len(clips) == 3
        assert all(r["bits"] == 8 for r in clips)
        assert all(255 < r["peak"] <= lim for r in clips)
    # IMA ADPCM: 4-bit container, full int16 expanded range
    ima = by_codec["ima_adpcm"]
    assert len(ima) == 3
    assert all(r["bits"] == 4 for r in ima)
    assert all(255 < r["peak"] <= 32768 for r in ima)
    # MS-ADPCM: 4-bit container, full int16 expanded range
    ms = by_codec["ms_adpcm"]
    assert len(ms) == 3
    assert all(r["bits"] == 4 for r in ms)
    assert all(255 < r["peak"] <= 32768 for r in ms)
    # metadata and samples agree: duration from the actual PCM length
    assert all(r["peak"] > 0 for r in rows.values())


def test_ima_adpcm_matches_scalar_reference():
    """The block decoder against an independent from-the-spec scalar
    implementation (classic step/index tables, written here without
    numpy): same nibble order, same clamping, same header-predictor
    first sample."""
    from data_pipeline_capstone_project_spark.operators.audio import (
        _IMA_SPB,
    )

    steps = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ]
    itab = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]

    for ch in (1, 2):
        ns = 2 * _IMA_SPB + 17  # two full blocks + a trimmed third
        payload = make_wav(ns, sample_rate=8000, channels=ch, bits=4,
                           seed=31, ima_adpcm=True)
        got = wav_pcm(payload)
        assert got.shape == (ns, ch)

        # scalar reference decode straight off the container bytes
        doff = payload.find(b"data")
        raw = payload[doff + 8 :]
        ba = 64 * ch
        ref = [[] for _ in range(ch)]
        for boff in range(0, len(raw), ba):
            block = raw[boff : boff + ba]
            for c in range(ch):
                pred = struct.unpack("<h", block[4 * c : 4 * c + 2])[0]
                idx = block[4 * c + 2]
                ref[c].append(pred)
                nibs = []
                data = block[4 * ch :]
                # 4-byte groups alternate channels, low nibble first
                for g in range(len(data) // 4):
                    if g % ch != c:
                        continue
                    for byte in data[4 * g : 4 * g + 4]:
                        nibs += [byte & 0x0F, byte >> 4]
                for n in nibs:
                    step = steps[idx]
                    diff = step >> 3
                    if n & 1:
                        diff += step >> 2
                    if n & 2:
                        diff += step >> 1
                    if n & 4:
                        diff += step
                    pred = pred - diff if n & 8 else pred + diff
                    pred = max(-32768, min(32767, pred))
                    idx = max(0, min(88, idx + itab[n]))
                    ref[c].append(pred)
        for c in range(ch):
            assert list(got[:, c]) == ref[c][:ns]


def test_ms_adpcm_matches_scalar_reference():
    """The MS-ADPCM block decoder against an independent from-the-spec
    scalar implementation (the published 7 coefficient pairs and
    16-entry adaptation table, written here without numpy): HIGH
    nibble first, header sample2-then-sample1 output order, >>8 floor
    prediction (Windows DDK / libsndfile semantics), delta floor 16."""
    from data_pipeline_capstone_project_spark.operators.audio import (
        _MS_SPB,
    )

    c1t = [256, 512, 0, 192, 240, 460, 392]
    c2t = [0, -256, 0, 64, 0, -208, -232]
    adapt = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]

    for ch in (1, 2):
        ns = 2 * _MS_SPB + 23  # two full blocks + a trimmed third
        payload = make_wav(ns, sample_rate=8000, channels=ch, bits=4,
                           seed=47, ms_adpcm=True)
        got = wav_pcm(payload)
        assert got.shape == (ns, ch)

        # scalar reference decode straight off the container bytes
        doff = payload.find(b"data")
        raw = payload[doff + 8 :]
        ba = 70 * ch
        ref = [[] for _ in range(ch)]
        for boff in range(0, len(raw), ba):
            block = raw[boff : boff + ba]
            for c in range(ch):
                pidx = block[c]
                delta = struct.unpack("<h", block[ch + 2 * c : ch + 2 * c + 2])[0]
                s1 = struct.unpack(
                    "<h", block[3 * ch + 2 * c : 3 * ch + 2 * c + 2]
                )[0]
                s2 = struct.unpack(
                    "<h", block[5 * ch + 2 * c : 5 * ch + 2 * c + 2]
                )[0]
                ref[c] += [s2, s1]
                nibs = []
                for k, byte in enumerate(block[7 * ch :]):
                    for j, n in enumerate((byte >> 4, byte & 0x0F)):
                        if (2 * k + j) % ch == c:
                            nibs.append(n)
                for n in nibs:
                    signed = n - 16 if n & 8 else n
                    pred = ((s1 * c1t[pidx]) + (s2 * c2t[pidx])) >> 8
                    pred += signed * delta
                    pred = max(-32768, min(32767, pred))
                    s2, s1 = s1, pred
                    delta = max(16, (adapt[n] * delta) >> 8)
                    ref[c].append(pred)
        for c in range(ch):
            assert list(got[:, c]) == ref[c][:ns]


def test_audio_features_hand_case():
    """A constructed clip: half a window of dead silence, a clipped
    rail sample, and an alternating-sign tail with known crossing
    count - every feature verified by hand arithmetic."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.audio import (
        audio_clip_features,
    )

    rate = 2000  # -> 100-sample windows (rate // 20)
    silence = np.zeros(100, dtype=np.int64)
    clipped = np.full(100, 32767, dtype=np.int64)  # one all-rail window
    alternating = np.tile([1000, -1000], 50).astype(np.int64)  # 99 crossings
    pcm = np.concatenate([silence, clipped, alternating]).reshape(-1, 1)
    f = audio_clip_features(pcm, rate, "pcm", 16)
    assert f["n_windows"] == 3
    assert f["silent_windows"] == 1
    assert f["clipped_samples"] == 100
    # crossings: silence->clipped edge is 0->32767 (no sign flip, both
    # non-negative), clipped->alternating is 32767->1000 (none), then
    # 99 flips inside the alternating tail
    assert f["zero_crossings"] == 99
    assert f["total_energy"] == 100 * 32767**2 + 100 * 1000**2
    assert f["peak_window_energy"] == 100 * 32767**2


def test_audio_features_float_lattice_matches_int():
    """The same waveform as int16 PCM and as Q8.23-lattice float must
    produce identical window/silence/crossing counts (energies scale
    by (2^23 / 2^15)^2 exactly)."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.audio import (
        audio_clip_features,
    )

    rng = np.random.RandomState(3)
    ints = rng.randint(-32768, 32768, size=(500, 2)).astype(np.int64)
    fi = audio_clip_features(ints, 8000, "pcm", 16)
    floats = (ints.astype(np.float64) * 256 / (1 << 23)).astype(np.float32)
    ff = audio_clip_features(floats, 8000, "float", 32)
    for k in ("n_windows", "silent_windows", "zero_crossings"):
        assert fi[k] == ff[k], k
    assert ff["total_energy"] == fi["total_energy"] * 256 * 256


def test_resample_2to1_dc_and_alignment():
    """DC passes at unity (tap sum 32 >> 5), output is every second
    center-aligned sample, and edges use zero padding."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.audio import (
        resample_2to1,
    )

    dc = np.full((64, 1), 1000, dtype=np.int64)
    y = resample_2to1(dc)
    assert y.shape == (32, 1)
    assert (y[2:-2] == 1000).all()  # interior: exact unity DC gain
    # hand-checked edge: y[0] = (-1*0 + 0 + 9*0 + 16*1000 + 9*1000
    #                            + 0 - 1*1000) >> 5
    assert y[0, 0] == (16 * 1000 + 9 * 1000 - 1000) >> 5

    # alternating +/-A at the input Nyquist rate must cancel to ~0:
    # taps are a half-band lowpass with a null at fs/2
    nyq = np.tile([2000, -2000], 32).reshape(-1, 1).astype(np.int64)
    y2 = resample_2to1(nyq)
    assert (np.abs(y2[2:-2]) <= 63).all()  # 2000 -> sub-LSB leakage


# --- MS-ADPCM adversarial edges (r10, VERDICT r9 item 6) ------------------------

_MS_C1 = [256, 512, 0, 192, 240, 460, 392]
_MS_C2 = [0, -256, 0, 64, 0, -208, -232]
_MS_ADAPT_REF = [230, 230, 230, 230, 307, 409, 512, 614,
                 768, 614, 512, 409, 307, 230, 230, 230]


def _ms_scalar_ref(pidx, delta, s1, s2, codes):
    """From-the-spec scalar recurrence, independent of the numpy
    decoder (mirrors test_ms_adpcm_matches_scalar_reference)."""
    out = []
    for n in codes:
        # exact Python ints: list(np.uint8 array) yields numpy scalars
        # whose fixed-width arithmetic wraps once delta grows past 2^59
        n = int(n)
        signed = n - 16 if n & 8 else n
        pred = ((s1 * _MS_C1[pidx]) + (s2 * _MS_C2[pidx])) >> 8
        pred += signed * delta
        pred = max(-32768, min(32767, pred))
        s2, s1 = s1, pred
        delta = max(16, (_MS_ADAPT_REF[n] * delta) >> 8)
        out.append(pred)
    return out


def test_ms_adpcm_delta_clamp_at_16():
    """delta 16 with shrink codes (adapt 230: (230*16)>>8 = 14 -> the
    16 floor) stays clamped forever; the decoder must agree with the
    scalar reference sample-for-sample through the clamp."""
    from data_pipeline_capstone_project_spark.operators.audio import (
        _ms_decode_channel,
    )

    codes = np.array([0, 1, 2, 3, 13, 14, 15] * 9, dtype=np.uint8)
    got = _ms_decode_channel(256, 0, 16, 100, 90, codes)
    assert list(got) == _ms_scalar_ref(0, 16, 100, 90, list(codes))


def test_ms_adpcm_pair7_rail_extremes():
    """Coefficient pair 7 (392, -232) with rail-valued header samples
    and a huge delta: predictions clamp at both rails and the delta
    adaptation walks through its full growth (768) and shrink (230)
    entries; decoder == scalar reference exactly."""
    from data_pipeline_capstone_project_spark.operators.audio import (
        _ms_decode_channel,
    )

    for delta, s1, s2 in [
        (32767, 32767, -32768),
        (32767, -32768, 32767),
        (16, -32768, -32768),
        (17, 32767, 32767),  # (230*17)>>8 = 15 -> clamps next step
    ]:
        codes = np.array([7, 8, 0, 15, 8, 7, 4, 11] * 8, dtype=np.uint8)
        got = _ms_decode_channel(392, -232, delta, s1, s2, codes)
        assert list(got) == _ms_scalar_ref(6, delta, s1, s2, list(codes))


@settings(max_examples=60, deadline=None)
@given(
    st.integers(0, 6),
    st.integers(16, 32767),
    st.integers(-32768, 32767),
    st.integers(-32768, 32767),
    st.lists(st.integers(0, 15), min_size=1, max_size=128),
)
def test_ms_adpcm_channel_fuzz(pidx, delta, s1, s2, codes):
    """Hypothesis sweep of the per-channel recurrence over the whole
    header parameter space against the independent scalar reference."""
    from data_pipeline_capstone_project_spark.operators.audio import (
        _ms_decode_channel,
    )

    got = _ms_decode_channel(
        _MS_C1[pidx], _MS_C2[pidx], delta, s1, s2,
        np.array(codes, dtype=np.uint8),
    )
    assert list(got) == _ms_scalar_ref(pidx, delta, s1, s2, codes)


def test_ms_adpcm_truncated_final_block():
    """ADVICE r9: a data chunk ending mid-block still decodes when the
    full per-channel header is present - emitting exactly the samples
    the truncated nibble bytes hold - and a tail shorter than the
    header raises."""
    from data_pipeline_capstone_project_spark.operators.audio import (
        _MS_SPB,
    )

    for ch in (1, 2):
        full = make_wav(2 * _MS_SPB, sample_rate=8000, channels=ch,
                        bits=4, seed=11, ms_adpcm=True)
        want = wav_pcm(full)
        doff = full.find(b"data")
        dlen = struct.unpack("<I", full[doff + 4 : doff + 8])[0]
        ba = 70 * ch

        def rebuild(cut):
            raw = full[doff + 8 : doff + 8 + dlen][:cut]
            head = full[:doff]
            # drop the fact chunk (it pins the full-length frame count)
            foff = head.find(b"fact")
            head = head[:foff] + head[foff + 16 :]
            out = head + b"data" + struct.pack("<I", len(raw)) + raw
            return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]

        # cut 10 code bytes into block 2: header (7*ch) + 10 bytes of
        # nibbles -> 2 header samples + floor(20/ch) decoded per channel
        cut = ba + 7 * ch + 10
        got = wav_pcm(rebuild(cut))
        n_extra = (2 * 10) // ch
        assert got.shape == (_MS_SPB + 2 + n_extra, ch)
        assert np.array_equal(got, want[: len(got)])

        # tail shorter than the per-channel header: corrupt
        with pytest.raises(ValueError, match="shorter than its header"):
            wav_pcm(rebuild(ba + 7 * ch - 1))
