"""H.264 avcC/SPS configuration parsing: Exp-Golomb codec properties,
SPS build<->parse round-trip across every profile branch, emulation
prevention actually firing, avcC record round-trip, malformed-input
hardening, and the Spark registry query against its VALUES oracle."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.h264 import (
    H264_META_ORACLE_SQL,
    H264Error,
    _BitReader,
    _BitWriter,
    _ebsp,
    _h264_fixtures,
    _rbsp,
    h264_meta,
    h264_meta_query,
    make_avc_mp4,
    make_avcc,
    make_sps,
    parse_avcc,
    parse_sps,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 2**20), min_size=1, max_size=20))
def test_exp_golomb_ue_roundtrip(values):
    w = _BitWriter()
    for v in values:
        w.ue(v)
    r = _BitReader(w.rbsp())
    assert [r.ue() for _ in values] == values


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-(2**19), 2**19), min_size=1, max_size=20))
def test_exp_golomb_se_roundtrip(values):
    w = _BitWriter()
    for v in values:
        w.se(v)
    r = _BitReader(w.rbsp())
    assert [r.se() for _ in values] == values


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_emulation_prevention_roundtrip(raw):
    assert _rbsp(_ebsp(raw)) == raw


@settings(max_examples=100, deadline=None)
@given(
    st.integers(1, 256).map(lambda x: x * 16),
    st.integers(1, 135).map(lambda x: x * 16),
    st.sampled_from([66, 77, 100, 110, 122, 244]),
    st.booleans(),
    st.integers(0, 16),
)
def test_sps_roundtrip_mb_aligned(w16, h16, profile, fmof, refs):
    # heights must align to 32 for interlaced streams
    h = h16 if fmof else -(-h16 // 32) * 32
    sps = make_sps(w16, h, profile, 40, frame_mbs_only=fmof,
                   max_num_ref_frames=refs)
    m = parse_sps(sps)
    assert (m["width"], m["height"]) == (w16, h)
    assert m["profile_idc"] == profile
    assert m["interlaced"] is (not fmof)
    assert m["max_num_ref_frames"] == refs


@pytest.mark.parametrize(
    "w,h,chroma,fmof",
    [
        (640, 360, 1, True),     # 4:2:0 bottom crop
        (1920, 1080, 1, True),   # the canonical 1080 crop
        (1919, 1079, 3, True),   # 4:4:4 unit crops
        (854, 480, 1, True),     # odd width -> left/right crop units
        (720, 480, 1, False),    # interlaced + no crop
        (1280, 688, 2, True),    # 4:2:2 (CropUnitY=1)
        (511, 511, 0, True),     # monochrome unit crops
    ],
)
def test_sps_cropping_exact(w, h, chroma, fmof):
    profile = 100 if chroma != 1 else 77
    sps = make_sps(w, h, profile, 40, chroma_format_idc=chroma,
                   frame_mbs_only=fmof)
    m = parse_sps(sps)
    assert (m["width"], m["height"]) == (w, h)
    assert m["chroma_format_idc"] == chroma


def test_unreachable_crop_rejected():
    # 4:2:0 progressive CropUnitY=2: an odd vertical pad is impossible
    with pytest.raises(H264Error, match="not reachable"):
        make_sps(640, 367, 66, 30)


def test_emulation_prevention_fires_in_poc1_fixture():
    sps = make_sps(320, 240, 77, 21, pic_order_cnt_type=1,
                   poc_cycle_offsets=(16384,) * 4)
    assert b"\x00\x00\x03" in sps[1:]
    assert _rbsp(sps[1:]) != sps[1:]  # an escape was really stripped
    m = parse_sps(sps)
    assert (m["width"], m["height"], m["pic_order_cnt_type"]) == (320, 240, 1)


def test_scaling_matrix_skip_is_bit_exact():
    sps = make_sps(1280, 544, 100, 41, scaling_matrix=True)
    m = parse_sps(sps)
    # fields AFTER the matrix parse correctly only if the skip consumed
    # exactly the matrix's bits
    assert (m["width"], m["height"], m["profile"]) == (1280, 544, "high")


def test_avcc_roundtrip():
    sps = make_sps(1920, 1080, 100, 40)
    rec = parse_avcc(make_avcc([sps], nal_length_size=2))
    assert rec["nal_length_size"] == 2
    assert rec["sps"] == [sps]
    assert len(rec["pps"]) == 1
    assert (rec["profile_idc"], rec["level_idc"]) == (100, 40)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"",                        # empty
        lambda b: b[:5],                      # truncated record
        lambda b: b"\x02" + b[1:],            # bad version
        lambda b: b[:6] + b"\xff\xff" + b[8:],  # SPS length overrun
    ],
)
def test_avcc_malformed_rejected(mutate):
    sps = make_sps(320, 240, 66, 30)
    with pytest.raises(H264Error):
        parse_avcc(mutate(make_avcc([sps])))


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_sps_fuzz_never_crashes_uncontrolled(junk):
    """Arbitrary bytes after a valid SPS NAL header byte either parse
    or raise H264Error - no IndexError/struct.error leaks."""
    try:
        parse_sps(bytes([0x67]) + junk)
    except H264Error:
        pass


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=256))
def test_container_fuzz_controlled_errors(junk):
    try:
        h264_meta(junk)
    except (H264Error, ValueError):  # ValueError: malformed box walk
        pass


def test_fixture_expectations_hold():
    for name, payload, expect in _h264_fixtures():
        m = h264_meta(payload)
        for k, want in expect.items():
            assert m[k] == want, (name, k, m[k], want)


def test_non_avc_entry_rejected():
    from data_pipeline_capstone_project_spark.operators.mp4 import make_mp4

    with pytest.raises(H264Error):
        h264_meta(make_mp4(320, 240, 1000))  # no stbl at all
    sps = make_sps(16, 16, 66, 10)
    payload = make_avc_mp4(sps, 16, 16, fourcc=b"hvc1")
    with pytest.raises(H264Error, match="not an AVC"):
        h264_meta(payload)


def test_h264_meta_query_matches_oracle(spark, sf_dir):
    got = h264_meta_query(spark, sf_dir).toPandas()
    want = duckdb.sql(H264_META_ORACLE_SQL).df()
    got = got.sort_values("video_name").reset_index(drop=True)
    want = want.sort_values("video_name").reset_index(drop=True)
    assert list(got["video_name"]) == list(want["video_name"])
    for col in ("profile", "level_idc", "width", "height", "note"):
        assert [None if pd_isna(v) else v for v in got[col]] == [
            None if pd_isna(v) else v for v in want[col]
        ], col


def pd_isna(v) -> bool:
    import pandas as pd

    return v is None or (isinstance(v, float) and pd.isna(v))


# --- NAL census --------------------------------------------------------------

from data_pipeline_capstone_project_spark.operators.h264 import (  # noqa: E402
    H264_NAL_CENSUS_ORACLE_SQL,
    _census_build,
    _census_expected,
    _census_fixtures,
    h264_nal_census,
    h264_nal_census_query,
    make_aud_nal,
    make_sei_nal,
    make_slice_nal,
    parse_slice_kind,
    split_sample_nals,
)


def test_census_matches_spec_arithmetic():
    """Parser output over the built bytes == hand arithmetic over the
    fixture descriptors, for every fixture and every column."""
    for spec in _census_fixtures():
        got = {"video_name": spec[0], **h264_nal_census(_census_build(spec))}
        assert got == _census_expected(spec), spec[0]


def test_census_emulation_prevention_fires_in_slice():
    nal = make_slice_nal(0, pad=4, zero_run=True)
    assert b"\x00\x00\x03" in nal[1:]
    assert _rbsp(nal[1:]) != nal[1:]


@pytest.mark.parametrize(
    "code,kind", [(0, "P"), (1, "B"), (2, "I"), (3, "P"), (4, "I"),
                  (5, "P"), (6, "B"), (7, "I"), (8, "P"), (9, "I")]
)
def test_parse_slice_kind_all_codes(code, kind):
    assert parse_slice_kind(make_slice_nal(code)) == kind


def test_split_sample_nals_rejects_malformed():
    nal = make_aud_nal()
    sample = len(nal).to_bytes(4, "big") + nal
    assert split_sample_nals(sample, 4) == [nal]
    with pytest.raises(H264Error, match="overruns"):
        split_sample_nals((len(nal) + 9).to_bytes(4, "big") + nal, 4)
    with pytest.raises(H264Error, match="truncated"):
        split_sample_nals(sample + b"\x00\x00", 4)
    with pytest.raises(H264Error, match="overruns"):
        split_sample_nals(b"\x00\x00\x00\x00" + nal, 4)  # zero length


def test_census_no_idr_spans_one_open_gop():
    from data_pipeline_capstone_project_spark.operators.h264 import (
        _CENSUS_SPS,
        make_avc_stream_mp4,
    )

    payload = make_avc_stream_mp4(
        _CENSUS_SPS,
        [[make_slice_nal(2, pad=3)], [make_slice_nal(0, pad=3)],
         [make_slice_nal(0, pad=3)]],
        640, 368,
    )
    m = h264_nal_census(payload)
    assert (m["n_keyframes"], m["max_gop"]) == (0, 3)
    assert (m["n_i"], m["n_p"]) == (1, 2)


def test_census_sample_without_slice_rejected():
    from data_pipeline_capstone_project_spark.operators.h264 import (
        _CENSUS_SPS,
        make_avc_stream_mp4,
    )

    payload = make_avc_stream_mp4(
        _CENSUS_SPS, [[make_sei_nal(3)]], 640, 368
    )
    with pytest.raises(H264Error, match="no coded slice"):
        h264_nal_census(payload)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=256))
def test_census_fuzz_controlled_errors(junk):
    try:
        h264_nal_census(junk)
    except (H264Error, ValueError):
        pass


def test_census_query_matches_oracle(spark, sf_dir):
    got = h264_nal_census_query(spark, sf_dir).toPandas()
    want = duckdb.sql(H264_NAL_CENSUS_ORACLE_SQL).df()
    got = got.sort_values("video_name").reset_index(drop=True)
    want = want.sort_values("video_name").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.astype("object"), want.astype("object"), check_dtype=False
    )


# --- PPS parse + CABAC dispatch (VERDICT r11 item 4) -----------------------


def test_parse_pps_cavlc_and_cabac():
    from data_pipeline_capstone_project_spark.operators.h264 import (
        _minimal_pps,
        parse_pps,
    )

    cavlc = parse_pps(_minimal_pps())
    assert cavlc["entropy_coding_mode_flag"] == 0
    assert cavlc["pps_id"] == 0 and cavlc["sps_id"] == 0
    assert cavlc["deblocking_filter_control_present_flag"] == 0
    cabac = parse_pps(_minimal_pps(entropy_coding=1))
    assert cabac["entropy_coding_mode_flag"] == 1


def test_h264_meta_classifies_entropy_mode():
    from data_pipeline_capstone_project_spark.operators.h264 import (
        _h264_fixtures,
        h264_meta,
    )

    by_name = {n: h264_meta(p) for n, p, _ in _h264_fixtures()}
    assert by_name["cabac_high_1280x720.mp4"]["entropy_coding"] == "cabac"
    assert by_name["baseline_640x360.mp4"]["entropy_coding"] == "cavlc"
    assert by_name["inband_avc3.mp4"]["entropy_coding"] is None


def test_h264_meta_fmo_pps_classifies_as_unknown():
    """FMO (num_slice_groups > 1) is valid H.264 the PPS parser
    refuses; the META path must still return a row with
    entropy_coding=None instead of propagating H264Error
    (ADVICE r12, h264.py:654)."""
    from data_pipeline_capstone_project_spark.operators.h264 import (
        _BitWriter,
        _ebsp,
        h264_meta,
        make_avc_mp4,
        make_sps,
    )

    w = _BitWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(0, 1)  # entropy_coding_mode_flag
    w.u(0, 1)  # bottom_field...
    w.ue(1)  # num_slice_groups_minus1 = 1 -> FMO
    w.ue(6)  # slice_group_map_type (interleaved run-length etc.)
    fmo_pps = bytes([0x68]) + _ebsp(w.rbsp())
    payload = make_avc_mp4(
        make_sps(640, 360, 66, 30), 640, 368, pps_nal=fmo_pps
    )
    m = h264_meta(payload)
    assert m["entropy_coding"] is None
    assert m["profile"] == "baseline" and m["width"] == 640


def test_decode_frames_rejects_cabac_beyond_envelope():
    """r13/r14: CABAC I_PCM and DC-only I_16x16 streams DECODE (real
    §9.3 engine); anything beyond the envelope still rejects honestly
    BEFORE any residual bin is mis-read - (a) an I_NxN macroblock
    (mb_type bin0 = 0) and (b) an I_16x16 with CodedBlockPatternLuma
    != 0 (AC contexts untranscribed) must raise, not decode
    garbage."""
    import pytest as _pytest

    from data_pipeline_capstone_project_spark.operators.cabac import (
        CTX_INIT_I16,
        CTX_INIT_I_MB_TYPE,
        CabacEncoder,
        init_context,
    )
    from data_pipeline_capstone_project_spark.operators.h264 import (
        _ebsp,
        _minimal_pps,
        make_avc_stream_mp4,
        make_sps,
    )
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _BitWriter,
        decode_frames,
    )

    def build(mb_bins):
        """Hand-build a CABAC I slice whose first MB codes the given
        (kind, bins...) and wrap it in an MP4."""
        w = _BitWriter()
        w.ue(0); w.ue(7); w.ue(0)      # first_mb, slice_type I, pps
        w.u(0, 8); w.ue(0); w.u(0, 8)  # frame_num, idr_pic_id, poc
        w.u(0, 2); w.se(0)             # dec_ref_pic_marking, qp_delta
        bits = w._bits
        while len(bits) % 8:
            bits.append(1)             # cabac_alignment_one_bit
        enc = CabacEncoder(bits)
        ctx = {3: init_context(*CTX_INIT_I_MB_TYPE[3], 26)}
        ctx.update(
            {i: init_context(*CTX_INIT_I16[i], 26) for i in (6, 7, 9, 10)}
        )
        mb_bins(enc, ctx)
        enc.encode_terminate(1)        # flush so the NAL closes
        bits.extend([0] * (-len(bits) % 8))
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for v in bits[i : i + 8]:
                b = (b << 1) | v
            out.append(b)
        nal = bytes([0x65]) + _ebsp(bytes(out))
        return make_avc_stream_mp4(
            make_sps(48, 32, 77, 30), [[nal]], 48, 32,
            pps_nal=_minimal_pps(entropy_coding=1),
        )

    def inxn(enc, ctx):
        enc.encode_decision(ctx[3], 0)  # mb_type bin0 = 0: I_NxN

    with _pytest.raises(NotImplementedError, match="CABAC I_NxN"):
        decode_frames(build(inxn))

    def i16_cbp15(enc, ctx):
        enc.encode_decision(ctx[3], 1)   # not I_NxN
        enc.encode_terminate(0)          # not I_PCM -> I_16x16
        enc.encode_decision(ctx[6], 1)   # CodedBlockPatternLuma = 15
        enc.encode_decision(ctx[7], 0)   # CodedBlockPatternChroma = 0
        enc.encode_decision(ctx[9], 0)   # pred mode bins
        enc.encode_decision(ctx[10], 0)

    with _pytest.raises(
        NotImplementedError, match="AC/chroma residual"
    ):
        decode_frames(build(i16_cbp15))


def test_decode_frames_cabac_i16_dc_decodes():
    """The r14 CABAC Intra_16x16 DC-residual envelope end-to-end
    (VERDICT r13 item 4): the cabac_i16_dc fixture - REAL coded
    residuals through coded_block_flag, significance/last maps, UEG0
    levels (one deep enough for the bypass suffix), signs and the
    mb_qp_delta chain - decodes bit-exact against the
    entropy-independent simulator."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        build_fixture_mp4,
        decode_frames,
        h264_frame_fixtures,
        simulate_stream,
    )

    spec = next(
        f for f in h264_frame_fixtures() if f["name"] == "cabac_i16_dc.mp4"
    )
    frames = decode_frames(build_fixture_mp4(spec))
    sims = simulate_stream(spec)
    assert len(frames) == len(sims) == 2
    h, w = spec["h"], spec["w"]
    for fr, (sl, scb, scr), (n16, npcm) in zip(
        frames, sims, ((5, 1), (4, 2))
    ):
        assert fr["n_i16"] == n16 and fr["n_pcm"] == npcm
        assert np.array_equal(fr["luma"], sl[:h, :w])
        assert np.array_equal(fr["cb"], scb[: h // 2, : w // 2])
        assert np.array_equal(fr["cr"], scr[: h // 2, : w // 2])


def test_cabac_and_cavlc_i16_decode_identically():
    """Entropy-coder cross-check: the SAME macroblock grid coded as a
    CAVLC I slice and as a CABAC I slice must decode to IDENTICAL
    pixels - the two entropy paths share nothing below the syntax
    layer (different bit parsers, different residual decoders), so
    agreement pins the CABAC syntax plumbing against the r10-proven
    CAVLC twin."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.h264 import (
        _minimal_pps,
        make_avc_stream_mp4,
        make_sps,
    )
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        decode_frames,
        make_cabac_ipcm_slice_nal,
        make_i_slice_nal,
    )

    mbs = [
        [("i16", 2, 0, [3, 0, -2, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0]),
         ("pcm", "grad", 5)],
        [("i16", 0, 2, [0, 0, 17, 0, 0, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
          -4),
         ("i16", 3, 1, [0] * 16)],
    ]
    w, h = 32, 32
    cavlc = decode_frames(
        make_avc_stream_mp4(
            make_sps(w, h, 66, 30), [[make_i_slice_nal(mbs)]], w, h
        )
    )
    cabac = decode_frames(
        make_avc_stream_mp4(
            make_sps(w, h, 77, 30),
            [[make_cabac_ipcm_slice_nal(mbs)]],
            w, h,
            pps_nal=_minimal_pps(entropy_coding=1),
        )
    )
    for a, b in zip(cavlc, cabac):
        assert np.array_equal(a["luma"], b["luma"])
        assert np.array_equal(a["cb"], b["cb"])
        assert np.array_equal(a["cr"], b["cr"])
    assert cavlc[0]["n_i16"] == cabac[0]["n_i16"] == 3


def test_cabac_i16_property_roundtrip():
    """Property fuzz over the DC-only CABAC envelope: random grids of
    I_PCM / I_16x16 macroblocks with random legal pred modes, DC
    levels (spanning the UEG0 suffix), and mb_qp_delta chains encode
    via the §9.3.4 twin and decode bit-exact against the simulator."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        build_fixture_mp4,
        decode_frames,
        simulate_stream,
    )

    @st.composite
    def grids(draw):
        mb_w = draw(st.integers(1, 3))
        mb_h = draw(st.integers(1, 2))
        rows = []
        for my in range(mb_h):
            row = []
            for mx in range(mb_w):
                if draw(st.booleans()) and draw(st.booleans()):
                    row.append(
                        ("pcm",
                         draw(st.sampled_from(["grad", "rampx", "zeros"])),
                         draw(st.integers(0, 9)))
                    )
                    continue
                luma_ok = [2]
                if my > 0:
                    luma_ok.append(0)
                if mx > 0:
                    luma_ok.append(1)
                if my > 0 and mx > 0:
                    luma_ok.append(3)
                chroma_ok = [0]
                if mx > 0:
                    chroma_ok.append(1)
                if my > 0:
                    chroma_ok.append(2)
                n_lvls = draw(st.integers(0, 4))
                dc16 = [0] * 16
                for _ in range(n_lvls):
                    dc16[draw(st.integers(0, 15))] = draw(
                        st.sampled_from([-40, -17, -2, -1, 1, 2, 14, 15,
                                         16, 33])
                    )
                row.append(
                    ("i16",
                     draw(st.sampled_from(luma_ok)),
                     draw(st.sampled_from(chroma_ok)),
                     dc16 if any(dc16) else None,
                     draw(st.integers(-6, 6)))
                )
            rows.append(row)
        return {"w": mb_w * 16, "h": mb_h * 16, "mbs": rows,
                "cabac": True}

    @settings(max_examples=30, deadline=None)
    @given(grids())
    def run(spec):
        frames = decode_frames(build_fixture_mp4(spec))
        sl, scb, scr = simulate_stream(spec)[0]
        h, w = spec["h"], spec["w"]
        assert np.array_equal(frames[0]["luma"], sl[:h, :w])
        assert np.array_equal(frames[0]["cb"], scb[: h // 2, : w // 2])
        assert np.array_equal(frames[0]["cr"], scr[: h // 2, : w // 2])

    run()


def test_cabac_writer_refuses_ac_and_chroma_residual():
    """The encoder twin enforces the same envelope as the decoder: an
    i16 desc carrying AC (slot 5) or chroma residual (slot 6) is
    refused outright (those context tables are untranscribed)."""
    import pytest as _pytest

    from data_pipeline_capstone_project_spark.operators.h264 import (
        H264Error,
    )
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        make_cabac_ipcm_slice_nal,
    )

    ac = {0: [1] + [0] * 14}
    with _pytest.raises(H264Error, match="AC or chroma"):
        make_cabac_ipcm_slice_nal([[("i16", 2, 0, None, 0, ac)]])
    with _pytest.raises(H264Error, match="AC or chroma"):
        make_cabac_ipcm_slice_nal(
            [[("i16", 2, 0, None, 0, None, (1, [1, 0, 0, 0], [0] * 4))]]
        )
    with _pytest.raises(H264Error, match="I_PCM and DC-only"):
        make_cabac_ipcm_slice_nal([[("i4", [2] * 16, 0)]])


def test_decode_frames_cabac_ipcm_decodes():
    """The r13 CABAC envelope end-to-end: the cabac_ipcm fixture
    decodes bit-exact against the entropy-independent simulator."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        build_fixture_mp4,
        decode_frames,
        h264_frame_fixtures,
        simulate_stream,
    )

    spec = next(
        f for f in h264_frame_fixtures() if f["name"] == "cabac_ipcm.mp4"
    )
    frames = decode_frames(build_fixture_mp4(spec))
    sims = simulate_stream(spec)
    assert len(frames) == len(sims) == 2
    h, w = spec["h"], spec["w"]
    for fr, (sl, scb, scr) in zip(frames, sims):
        assert fr["n_pcm"] == 6 and fr["n_i16"] == 0
        assert np.array_equal(fr["luma"], sl[:h, :w])
        assert np.array_equal(fr["cb"], scb[: h // 2, : w // 2])
        assert np.array_equal(fr["cr"], scr[: h // 2, : w // 2])
