"""I-frame decoder: bitstream round-trips vs the spec simulator,
hand-computed §8.3.3 pins, nC neighbour rules, emulation prevention,
and the honest unsupported-feature seams."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_capstone_project_spark.operators.h264 import (
    make_avc_stream_mp4,
    make_sps,
)
from data_pipeline_capstone_project_spark.operators.h264_decode import (
    H264DecodeError,
    _nc_at,
    _simulate_luma,
    build_fixture_mp4,
    decode_first_i_frame,
    h264_frame_fixtures,
    h264_frames_query,
    make_i_slice_nal,
    pcm_luma,
)


def _nodb(spec):
    """Spec copy with deblocking explicitly disabled (idc=1): the
    prediction/residual hand-arithmetic tests pin UNFILTERED pixels,
    and coding the §7.3.3 idc keeps the stream conformant while
    exercising the control-field parse path."""
    return {**spec, "deblock": (1, 0, 0)}


def _sim_first(spec):
    """Simulator's first frame (deblocked per spec), display-cropped
    - the r12 conformant expectation for fixture-store decodes."""
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        simulate_stream,
    )

    lu, cbp, crp = simulate_stream(spec)[0]
    h, w = spec["h"], spec["w"]
    return lu[:h, :w], cbp[: h // 2, : w // 2], crp[: h // 2, : w // 2]


def test_every_fixture_decodes_to_simulator_plane():
    """The oracle's claim, re-proved plane-by-plane (not just CRC):
    the bit-level decode of every staged fixture equals the numpy
    spec simulator pixel-for-pixel - both sides through the §8.7
    in-loop filter since r12."""
    for spec in h264_frame_fixtures():
        got = decode_first_i_frame(build_fixture_mp4(spec))
        want = _sim_first(spec)[0]
        assert got["luma"].shape == want.shape, spec["name"]
        assert np.array_equal(got["luma"], want), spec["name"]


def test_plane_mode_hand_arithmetic():
    """§8.3.3.4 pinned by hand, independently of both twins. In
    plane_ramps.mp4 the plane MB at (1,1) sees top row p[x,-1]=17x
    (rampx bottom row), left col p[-1,y]=17y (rampy right col), and
    corner p[-1,-1]=255 (rampx bottom-right). By hand:
      H = sum_{x'=0..6} (x'+1)*17*((8+x')-(6-x')) + 8*(255-255)
        = sum 34*(x'+1)^2 for x'=0..6 = 34*140 = 4760;  V = 4760
      b = (5*4760+32)>>6 = 372 = c;  a = 16*(255+255) = 8160
      pred[0,0]  = (8160 - 7*372 - 7*372 + 16) >> 5 = 2968>>5 = 92
      pred[15,15]= (8160 + 8*372 + 8*372 + 16) >> 5 = 441 -> clip 255
      pred[7,7]  = (8160 + 16) >> 5 = 255
    """
    spec = next(
        s for s in h264_frame_fixtures() if s["name"] == "plane_ramps.mp4"
    )
    luma = decode_first_i_frame(build_fixture_mp4(spec))["luma"]
    assert luma[16, 16] == 92
    assert luma[31, 31] == 255
    assert luma[16 + 7, 16 + 7] == 255


def test_dc_fallback_variants():
    """§8.3.3.3 DC availability ladder over the all-DC fixture:
    (0,0) no neighbours -> 128; then every later MB sees only 128s ->
    128 everywhere."""
    spec = next(
        s for s in h264_frame_fixtures() if s["name"] == "i16_dc_flat.mp4"
    )
    luma = decode_first_i_frame(build_fixture_mp4(spec))["luma"]
    assert (luma == 128).all()


def test_dc_left_only_hand_value():
    """DC with only the left neighbour: left col is rampx's right
    column = 255 sixteen times -> (16*255+8)>>4 = 255."""
    mbs = [[("pcm", "rampx"), ("i16", 2)]]
    sps_w, sps_h = 32, 16
    payload = make_avc_stream_mp4(
        make_sps(sps_w, sps_h), [[make_i_slice_nal(mbs)]], sps_w, sps_h
    )
    luma = decode_first_i_frame(payload)["luma"]
    assert (luma[:, 16:] == 255).all()


def test_nc_neighbour_rule():
    """§9.2.1: I_PCM neighbours count as TotalCoeff=16; averaged with
    round-up when both sides exist. tc_map is in 4x4-block units, so
    MB (mx,my)'s DC block reads (mx*4, my*4)."""
    tc = np.zeros((12, 12), dtype=np.int16)
    for my, row in enumerate(
        [["pcm", "i16", "pcm"], ["i16", "i16", "i16"], ["pcm", "pcm", "i16"]]
    ):
        for mx, kind in enumerate(row):
            if kind == "pcm":
                tc[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 16
    assert _nc_at(tc, 0, 0) == 0  # no neighbours
    assert _nc_at(tc, 4, 0) == 16  # left PCM only
    assert _nc_at(tc, 0, 4) == 16  # top PCM only
    assert _nc_at(tc, 4, 4) == (0 + 0 + 1) >> 1  # both i16 -> 0
    assert _nc_at(tc, 8, 4) == (0 + 16 + 1) >> 1  # left i16, top pcm -> 8
    assert _nc_at(tc, 8, 8) == (16 + 0 + 1) >> 1  # left pcm, top i16 -> 8


def test_nc_per_block_from_decoded_totalcoeff():
    """§9.2.1 at 4x4 grain: a coded AC block's TotalCoeff feeds its
    right and below neighbours' nC (tc_map indexed [gy, gx])."""
    tc = np.zeros((8, 8), dtype=np.int16)
    tc[0, 0] = 3  # block (x=0, y=0): TC 3
    assert _nc_at(tc, 1, 0) == 3  # right neighbour: left=3, no top
    assert _nc_at(tc, 0, 1) == 3  # below neighbour: top=3, no left
    assert _nc_at(tc, 1, 1) == 0  # diagonal: left (0,1)=0, top (1,0)=0
    tc[1, 0] = 3  # block (x=0, y=1)
    tc[0, 1] = 1  # block (x=1, y=0)
    # (1,1): left is (0,1) -> tc[1,0]=3, top is (1,0) -> tc[0,1]=1
    assert _nc_at(tc, 1, 1) == (3 + 1 + 1) >> 1


def test_emulation_prevention_actually_fires():
    """ep_zeros.mp4's all-zero PCM rows must force 00 00 03 escapes
    on the wire (and the decode still round-trips)."""
    mbs = next(
        s for s in h264_frame_fixtures() if s["name"] == "ep_zeros.mp4"
    )["mbs"]
    nal = make_i_slice_nal(mbs)
    assert b"\x00\x00\x03" in nal
    # and a decode through the full container still matches
    spec = next(
        s for s in h264_frame_fixtures() if s["name"] == "ep_zeros.mp4"
    )
    got = decode_first_i_frame(build_fixture_mp4(spec))["luma"]
    assert np.array_equal(got, _simulate_luma(spec))


def test_pcm_patterns_are_the_decoded_pixels():
    spec = next(
        s for s in h264_frame_fixtures() if s["name"] == "pcm_grad.mp4"
    )
    luma = decode_first_i_frame(build_fixture_mp4(spec))["luma"]
    assert np.array_equal(luma[0:16, 0:16], pcm_luma("grad", 0))
    assert np.array_equal(luma[16:32, 16:32], pcm_luma("grad", 4))


def test_crop_is_applied():
    spec = next(s for s in h264_frame_fixtures() if s["name"] == "cropped.mp4")
    d = decode_first_i_frame(build_fixture_mp4(spec))
    assert d["width"] == 44 and d["height"] == 28
    assert d["luma"].shape == (28, 44)
    assert d["n_mbs"] == 6  # census counts the full coded grid


def test_unsupported_seams_raise_decode_error():
    from data_pipeline_capstone_project_spark.operators.h264 import (
        _BitWriter,
        _ebsp,
    )

    sps = make_sps(16, 16)

    # I_4x4 macroblock with a PARTIAL-luma CBP (codeNum 5 -> one of
    # the 44 untranscribed Table 9-4 rows; codeNums 0..3 decode for
    # real since r11)
    w = _BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 8); w.ue(0); w.u(0, 8); w.u(0, 2)
    w.se(0)
    w.ue(0)  # mb_type I_4x4
    for _ in range(16):
        w.u(1, 1)  # prev_intra4x4_pred_mode_flag (all predicted: DC)
    w.ue(0)  # intra_chroma_pred_mode DC
    w.ue(5)  # coded_block_pattern codeNum 5: untranscribed row
    nal = bytes([0x65]) + _ebsp(w.rbsp())
    payload = make_avc_stream_mp4(sps, [[nal]], 16, 16)
    with pytest.raises(H264DecodeError, match="Table 9-4"):
        decode_first_i_frame(payload)

    # P slice as the FIRST access unit: decodes for real since the
    # r11 eighth pass, but only against a previously decoded picture
    w = _BitWriter()
    w.ue(0); w.ue(5); w.ue(0)  # slice_type 5 = P (all-P form)
    nal = bytes([0x41]) + _ebsp(w.rbsp())
    payload = make_avc_stream_mp4(sps, [[nal]], 16, 16)
    with pytest.raises(H264DecodeError, match="reference"):
        decode_first_i_frame(payload)

    # B slice as the FIRST access unit: decodes for real since the
    # r11 ninth pass, but needs a past AND a future reference
    w = _BitWriter()
    w.ue(0); w.ue(6); w.ue(0)  # slice_type 6 = B
    w.u(0, 8); w.u(2, 8)  # frame_num, poc lsb
    w.u(1, 1); w.u(0, 3)  # direct flag, override/modification flags
    w.se(0)  # slice_qp_delta
    nal = bytes([0x01]) + _ebsp(w.rbsp())
    payload = make_avc_stream_mp4(sps, [[nal]], 16, 16)
    with pytest.raises(H264DecodeError, match="reference pair"):
        decode_first_i_frame(payload)

    # SP slice: a true remaining seam
    w = _BitWriter()
    w.ue(0); w.ue(8); w.ue(0)  # slice_type 8 = SP
    nal = bytes([0x41]) + _ebsp(w.rbsp())
    payload = make_avc_stream_mp4(sps, [[nal]], 16, 16)
    with pytest.raises(H264DecodeError, match="SP/SI"):
        decode_first_i_frame(payload)

    # chroma PLANE prediction (intra_chroma_pred_mode 3) - the one
    # §8.3.4 mode still outside the subset (luma AND chroma CBP now
    # decode for real since r11, so a lone MB's mode-3 read is the
    # first seam hit)
    w = _BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 8); w.ue(0); w.u(0, 8); w.u(0, 2)
    w.se(0)
    w.ue(3)  # I_16x16 predMode 2 (DC), cbp 0
    w.ue(3)  # intra_chroma_pred_mode Plane
    w.se(0)  # mb_qp_delta
    w.u(1, 1)  # DC coeff_token TotalCoeff=0 (lone MB: nC=0 -> '1')
    nal = bytes([0x65]) + _ebsp(w.rbsp())
    payload = make_avc_stream_mp4(sps, [[nal]], 16, 16)
    with pytest.raises(H264DecodeError, match="plane prediction"):
        decode_first_i_frame(payload)


def test_spark_entry_matches_simulator(spark):
    rows = {r["video_name"]: r for r in h264_frames_query(spark, "").collect()}
    specs = h264_frame_fixtures()
    assert len(rows) == len(specs)
    import zlib

    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _simulate_chroma,
    )

    for spec in specs:
        sim, scb, scr = _sim_first(spec)
        r = rows[spec["name"]]
        assert r["luma_crc32"] == zlib.crc32(sim.tobytes())
        assert r["cb_crc32"] == zlib.crc32(scb.tobytes())
        assert r["cr_crc32"] == zlib.crc32(scr.tobytes())
        assert r["luma_sum"] == int(sim.astype(np.int64).sum())
        assert (r["width"], r["height"]) == (spec["w"], spec["h"])


# --- chroma (r8 extension) ----------------------------------------------------


def test_chroma_planes_match_simulator():
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _simulate_chroma,
    )

    for spec in h264_frame_fixtures():
        got = decode_first_i_frame(build_fixture_mp4(spec))
        _, scb, scr = _sim_first(spec)
        for key, want in (("cb", scb), ("cr", scr)):
            assert got[key].shape == want.shape, (spec["name"], key)
            assert np.array_equal(got[key], want), (spec["name"], key)


def test_chroma_dc_corner_preferences_hand_values():
    """§8.3.4.1 DC sub-block source preferences pinned by hand. In
    chroma_modes.mp4, MB (row 0, col 1) is chroma-DC with ONLY a left
    neighbour (PCM grad seed 9). Its Cb left column (x=7 of the PCM
    tile) is (7*11 + 5y + 9*17) % 256 = (230 + 5y) % 256:
      y=0..3 -> 230,235,240,245, sum 950 -> dc (950+2)>>2 = 238
      y=4..7 -> 250,255,4,9,     sum 518 -> dc (518+2)>>2 = 130
    Blocks (0,0) and (4,0) both resolve to the left run y=0..3 (top
    unavailable) -> 238; blocks (0,4)/(4,4) use y=4..7 -> 130."""
    spec = next(
        s for s in h264_frame_fixtures() if s["name"] == "chroma_modes.mp4"
    )
    cb = decode_first_i_frame(build_fixture_mp4(spec))["cb"]
    mb = cb[0:8, 8:16]  # chroma block of MB (0, 1)
    assert (mb[0:4, :] == 238).all()
    assert (mb[4:8, :] == 130).all()


def test_chroma_hv_copy_modes():
    """H copies the left chroma column across; V copies the top
    chroma row down (modes 1/2 of §8.3.4)."""
    spec = next(
        s for s in h264_frame_fixtures() if s["name"] == "chroma_modes.mp4"
    )
    d = decode_first_i_frame(build_fixture_mp4(_nodb(spec)))
    for key in ("cb", "cr"):
        plane = d[key]
        # MB (1,0): chroma V -> every row equals the bottom row of the
        # PCM above it
        assert (plane[8:16, 0:8] == plane[7, 0:8]).all()
        # MB (1,1): chroma H -> every column equals MB(1,0)'s right col
        assert (plane[8:16, 8:16] == plane[8:16, 7][:, None]).all()


def test_chroma_plane_mode_is_a_seam():
    from data_pipeline_capstone_project_spark.operators.h264 import (
        make_avc_stream_mp4 as _mk,
        make_sps as _sps,
    )

    nal = make_i_slice_nal([[("pcm", "grad", 0), ("i16", 2, 3)]])
    payload = _mk(_sps(32, 16), [[nal]], 32, 16)
    with pytest.raises(H264DecodeError, match="chroma plane"):
        decode_first_i_frame(payload)


# --- property fuzz: random legal MB grids ---------------------------------------


def test_random_legal_grids_roundtrip():
    """Hypothesis sweep over random legal macroblock grids (any mix of
    PCM patterns/seeds and I16 modes whose required neighbours exist):
    encode -> container -> decode must equal both spec simulators on
    every plane. Catches nC/alignment/prediction interactions the
    fixed fixtures don't cover."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        PCM_PATTERNS,
        _I4_SCAN,
        _simulate_chroma,
    )

    @st.composite
    def grids(draw):
        mb_w = draw(st.integers(1, 4))
        mb_h = draw(st.integers(1, 4))
        rows = []
        for my in range(mb_h):
            row = []
            for mx in range(mb_w):
                kind = draw(st.sampled_from(["pcm", "i16", "i4"]))
                if kind == "pcm":
                    row.append(
                        (
                            "pcm",
                            draw(st.sampled_from(PCM_PATTERNS)),
                            draw(st.integers(0, 9)),
                        )
                    )
                elif kind == "i4":
                    modes = []
                    for sx, sy in _I4_SCAN:
                        has_top = my > 0 or sy > 0
                        has_left = mx > 0 or sx > 0
                        ok = [2]
                        if has_top:
                            ok += [0, 3, 7]
                        if has_left:
                            ok += [1, 8]
                        if has_top and has_left:
                            ok += [4, 5, 6]
                        modes.append(draw(st.sampled_from(ok)))
                    chroma_ok = [0]
                    if mx > 0:
                        chroma_ok.append(1)
                    if my > 0:
                        chroma_ok.append(2)
                    row.append(
                        ("i4", modes, draw(st.sampled_from(chroma_ok)))
                    )
                else:
                    luma_ok = [2]  # DC always legal
                    if my > 0:
                        luma_ok.append(0)  # V
                    if mx > 0:
                        luma_ok.append(1)  # H
                    if my > 0 and mx > 0:
                        luma_ok.append(3)  # Plane
                    chroma_ok = [0]  # DC always legal
                    if mx > 0:
                        chroma_ok.append(1)  # H
                    if my > 0:
                        chroma_ok.append(2)  # V
                    row.append(
                        (
                            "i16",
                            draw(st.sampled_from(luma_ok)),
                            draw(st.sampled_from(chroma_ok)),
                        )
                    )
            rows.append(row)
        spec = {"w": mb_w * 16, "h": mb_h * 16, "mbs": rows}
        # r12: a random subset also draws §7.3.3 filter-control fields
        # (idc 0/1/2, alpha/beta offset_div2 over the legal -6..6
        # range) so the fuzz sweeps the deblocking parameter space
        if draw(st.booleans()):
            spec["deblock"] = (
                draw(st.sampled_from([0, 1, 2])),
                draw(st.integers(-6, 6)),
                draw(st.integers(-6, 6)),
            )
        return spec

    @settings(max_examples=40, deadline=None)
    @given(grids())
    def run(spec):
        got = decode_first_i_frame(build_fixture_mp4(spec))
        sim, scb, scr = _sim_first(spec)
        assert np.array_equal(got["luma"], sim)
        assert np.array_equal(got["cb"], scb)
        assert np.array_equal(got["cr"], scr)

    run()


def test_i4_hand_arithmetic():
    """Three I_4x4 modes pinned by hand off the §8.3.1.2 formulas (a
    third check independent of BOTH the decoder and the simulator):
    t = [10,20,30,40,50,60,70,80], l = [90,100,110,120], c = 5."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _sim_i4_block,
    )

    t = np.array([10, 20, 30, 40, 50, 60, 70, 80], dtype=np.int64)
    l = np.array([90, 100, 110, 120], dtype=np.int64)
    c = 5

    # DDL (mode 3): anti-diagonals of the 3-tap filtered top row;
    # (3,3) is the (t6 + 3*t7 + 2) >> 2 = 78 special
    want_ddl = np.array(
        [
            [20, 30, 40, 50],
            [30, 40, 50, 60],
            [40, 50, 60, 70],
            [50, 60, 70, 78],
        ]
    )
    assert np.array_equal(_sim_i4_block(t, l, c, 3), want_ddl)

    # DDR (mode 4): constant along x-y diagonals; centre
    # (t0 + 2c + l0 + 2) >> 2 = 28
    want_ddr = np.array(
        [
            [28, 11, 20, 30],
            [71, 28, 11, 20],
            [100, 71, 28, 11],
            [110, 100, 71, 28],
        ]
    )
    assert np.array_equal(_sim_i4_block(t, l, c, 4), want_ddr)

    # HU (mode 8): left-column interpolation saturating at l[3]
    want_hu = np.array(
        [
            [95, 100, 105, 110],
            [105, 110, 115, 118],
            [115, 118, 120, 120],
            [120, 120, 120, 120],
        ]
    )
    assert np.array_equal(_sim_i4_block(t, l, c, 8), want_hu)


def test_i4_mode_prediction_signalling():
    """§8.3.1.1 most-probable-mode coding: a block whose mode equals
    min(left, top) costs 1 bit; re-decoding must reproduce the exact
    modes. Pinned by an MB whose scan walks both flag branches."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _I4_SCAN,
        _simulate_luma,
        build_fixture_mp4,
        decode_first_i_frame,
    )

    # lone MB: block (0,0) must be DC (both neighbours outside ->
    # predicted mode 2, flag=1 path); the rest alternate between the
    # predicted mode and an explicit rem_intra4x4_pred_mode
    modes = []
    for sx, sy in _I4_SCAN:
        if sx == 0 and sy == 0:
            modes.append(2)
        elif sy == 0:
            modes.append(2 if sx % 2 else 8)
        elif sx == 0:
            modes.append(2 if sy % 2 else 7)
        else:
            modes.append((sx + sy) % 9)
    spec = {"w": 16, "h": 16, "mbs": [[("i4", modes)]]}
    got = decode_first_i_frame(build_fixture_mp4(spec))
    assert got["n_i4"] == 1 and got["n_i16"] == 0 and got["n_pcm"] == 0
    assert np.array_equal(got["luma"], _simulate_luma(spec))


def test_i4_topright_availability_rule():
    """§6.4.12 above-right availability over the §6.4.3 scan: blocks
    3/7/11/13/15 never see their above-right decoded (in-MB future or
    the right-hand MB); 1/4/5 at an MB's top row see the MB(s) above;
    the picture's rightmost column never does."""
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _I4_SCAN,
        _i4_topright_avail,
    )

    # centre MB of a 3x3-MB picture (mb coords (1,1)), blocks by scan
    for scan_idx, (sx, sy) in enumerate(_I4_SCAN):
        bx, by = 4 + sx, 4 + sy
        avail = _i4_topright_avail(bx, by, scan_idx, mb_w=3)
        want = scan_idx not in (3, 7, 11, 13, 15)
        assert avail == want, (scan_idx, sx, sy)
    # top picture row: no samples above at all
    assert not _i4_topright_avail(1, 0, 1, mb_w=3)
    # picture's rightmost block column: off the right edge
    assert not _i4_topright_avail(11, 4, 5, mb_w=3)


def test_i4_topright_substitution_changes_pixels():
    """The §8.3.1.2 p[3,-1] substitution is load-bearing: DDL over a
    non-constant top row differs between tr_avail True/False, and the
    False case equals running with t[4..7] literally replaced by
    t[3]."""
    import numpy as np

    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _predict_i4,
        _sim_i4_block,
    )

    def fresh_plane():
        plane = np.zeros((8, 12), dtype=np.uint8)
        plane[3, :] = np.arange(12) * 9 % 256  # non-constant top row
        return plane

    # block at (bx, by) = (1, 1): px=4..7, py=4..7, top row = row 3
    pa = fresh_plane()
    _predict_i4(pa, 1, 1, 3, tr_avail=True)
    pb = fresh_plane()
    _predict_i4(pb, 1, 1, 3, tr_avail=False)
    assert not np.array_equal(pa[4:8, 4:8], pb[4:8, 4:8])
    # the substituted result == simulator fed an explicitly-pinned row
    t = pa[3, 4:12].astype(np.int64).copy()
    t_sub = np.concatenate([t[:4], np.full(4, t[3], dtype=np.int64)])
    l = pa[4:8, 3].astype(np.int64)
    want = _sim_i4_block(t_sub, l, int(pa[3, 3]), 3)
    assert np.array_equal(pb[4:8, 4:8].astype(np.int64), want)


# --- Intra_16x16 DC residuals (r10) ---------------------------------------------


def test_dc_residual_hand_arithmetic():
    """§8.5.10 scaling pinned by hand, independent of BOTH twins. A
    lone I_16x16 DC-mode MB predicts flat 128; with a single DC
    coefficient L at zig-zag position 0, f[i][j] = L everywhere, so:

      qp 26 (e=4, LS=16*13=208), L=+2:
        dcY = (2*208 + 2) >> 2 = 104;  r = (104+32) >> 6 = 2 -> 130
      qp 26, L=-1:
        dcY = (-208 + 2) >> 2 = -52;   r = (-52+32) >> 6 = -1 -> 127
      qp 40 via mb_qp_delta +14 (e=6, 40%6=4 -> LS=256), L=+1:
        dcY = 256 << 0 = 256;          r = (256+32) >> 6 = 4 -> 132
    """
    cases = [
        ([2] + [0] * 15, 0, 130),
        ([-1] + [0] * 15, 0, 127),
        ([1] + [0] * 15, 14, 132),
    ]
    for dc16, qpd, want in cases:
        spec = {"w": 16, "h": 16, "mbs": [[("i16", 2, 0, dc16, qpd)]]}
        got = decode_first_i_frame(build_fixture_mp4(spec))
        assert (got["luma"] == want).all(), (dc16, qpd, got["luma"][0, 0])
        assert np.array_equal(got["luma"], _simulate_luma(spec))


def test_dc_residual_fixtures_roundtrip():
    """The three r10 fixture files decode bit-exactly against the
    independent simulator on every plane."""
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _simulate_chroma,
    )

    for name in ("i16_dc_residual.mp4", "i16_dc_nc8.mp4", "i16_dc_mixed.mp4"):
        spec = next(s for s in h264_frame_fixtures() if s["name"] == name)
        got = decode_first_i_frame(build_fixture_mp4(spec))
        sim, scb, scr = _sim_first(spec)
        assert np.array_equal(got["luma"], sim), name
        assert np.array_equal(got["cb"], scb), name
        assert np.array_equal(got["cr"], scr), name


def test_dc_residual_changes_pixels():
    """The residual is load-bearing: the same grid without dc16
    decodes to a different luma plane."""
    with_dc = {"w": 16, "h": 16, "mbs": [[("i16", 2, 0, [3] + [0] * 15)]]}
    without = {"w": 16, "h": 16, "mbs": [[("i16", 2)]]}
    a = decode_first_i_frame(build_fixture_mp4(with_dc))["luma"]
    b = decode_first_i_frame(build_fixture_mp4(without))["luma"]
    assert not np.array_equal(a, b)
    assert (b == 128).all()


def test_cavlc_roundtrip_all_encodable_blocks():
    """Bit-level CAVLC round-trip across the ENTIRE encodable residual
    grammar at both supported nC columns: every single-coefficient
    block (16 positions x levels ±1..±7) and every packed all-±1 set
    of size 2 and 3."""
    from itertools import product

    from data_pipeline_capstone_project_spark.operators.h264 import (
        _BitReader,
        _BitWriter,
    )
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _read_residual_16,
        _write_residual_16,
    )

    blocks = [[0] * 16]
    for pos in range(16):
        for lvl in (1, -1, 2, -2, 7, -7):
            b = [0] * 16
            b[pos] = lvl
            blocks.append(b)
    for s0, s1 in product((1, -1), repeat=2):
        blocks.append([s0, s1] + [0] * 14)
        for s2 in (1, -1):
            blocks.append([s0, s1, s2] + [0] * 13)
    for nc in (0, 8, 16):
        for b in blocks:
            w = _BitWriter()
            _write_residual_16(w, nc, b)
            w.u(1, 1)  # stop bit: the reader must not over-consume
            r = _BitReader(w.rbsp())
            assert _read_residual_16(r, nc) == b, (nc, b)
            assert r.u(1) == 1, (nc, b)


def test_cavlc_roundtrip_general_grammar():
    """r11 grammar widening: interleaved zeros (Table 9-10 run_before,
    every zerosLeft column incl. the >6 formulaic tail), large levels
    through the adaptive suffixLength schedule and both escape rows,
    and maxNumCoeff 15 — write/read must be inverse bijections with
    no bit over/under-consumption."""
    import random

    from data_pipeline_capstone_project_spark.operators.h264 import (
        _BitReader,
        _BitWriter,
    )
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _read_residual_block,
        _write_residual_block,
    )

    rng = random.Random(0xAC11)
    cases = []
    # hand-picked: gap layouts at every zerosLeft column
    for max_coeff in (15, 16):
        for gap in range(1, 15):
            b = [0] * max_coeff
            b[0] = 1
            hi = min(max_coeff - 1, 1 + gap)
            b[hi] = -1
            cases.append((max_coeff, b))
        # three ±1s maximally spread (runs through the >6 column)
        b = [0] * max_coeff
        b[0], b[max_coeff // 2], b[max_coeff - 1] = 1, -1, 1
        cases.append((max_coeff, b))
        # big levels: suffixLength growth + the lp=14/15 escapes
        for lvl in (8, -30, 100, -1000, 2000):
            b = [0] * max_coeff
            b[rng.randrange(max_coeff)] = lvl
            cases.append((max_coeff, b))
        # a FULL block (TotalCoeff == maxNumCoeff skips total_zeros;
        # nC>=8 FLC carries TC up to 16) with mixed magnitudes
        b = [(-1) ** i * (1 + i % 5) for i in range(max_coeff)]
        cases.append((max_coeff, b))
    # random sparse blocks, TC <= 3 (encodable at nC < 2 too)
    for _ in range(300):
        max_coeff = rng.choice((15, 16))
        b = [0] * max_coeff
        for pos in rng.sample(range(max_coeff), rng.randint(1, 3)):
            b[pos] = rng.choice(
                (1, -1, 2, -2, 7, -9, 31, -64, 500, -2047)
            )
        cases.append((max_coeff, b))
    for max_coeff, b in cases:
        tc = sum(1 for v in b if v)
        for nc in ((0, 1, 8, 16) if tc <= 3 else (8, 16)):
            w = _BitWriter()
            _write_residual_block(w, nc, b, max_coeff)
            w.u(1, 1)  # stop bit: the reader must not over-consume
            r = _BitReader(w.rbsp())
            assert _read_residual_block(r, nc, max_coeff) == b, (nc, b)
            assert r.u(1) == 1, (nc, b)


def test_ac_residual_hand_arithmetic():
    """§8.5.12 pinned by hand, independent of BOTH twins. A lone
    I_16x16 DC-mode MB (pred flat 128) at qp 26 (m=2, e=4) with one
    AC level +2 at zig-zag position 1 = (row 0, col 1) of block 0:

      LevelScale(2, 0, 1) = 16 * normAdjust(2, mixed) = 16*16 = 256
      d[0][1] = (2*256) << (4-4) = 512
      horizontal: f row0 = [512, 256, -256, -512]; vertical copies
      row0 into all rows -> r = [(512+32)>>6, (256+32)>>6,
      (-256+32)>>6, (-512+32)>>6] = [8, 4, -4, -8] per row
      -> block 0 columns = 136, 132, 124, 120; rest of MB stays 128.
    """
    ac = {0: [2] + [0] * 14}
    spec = _nodb({"w": 16, "h": 16, "mbs": [[("i16", 2, 0, [0] * 16, 0, ac)]]})
    got = decode_first_i_frame(build_fixture_mp4(spec))["luma"]
    assert got[0, 0] == 136 and got[3, 0] == 136
    assert got[0, 1] == 132
    assert got[0, 2] == 124
    assert got[0, 3] == 120
    assert (got[:, 4:] == 128).all()
    assert (got[4:, :4] == 128).all()
    assert np.array_equal(got, _simulate_luma(spec))


def test_ac_low_qp_rounding_regime():
    """qp < 24 exercises §8.5.12.1's rounding-add branch (the decoder
    codes it; the simulator uses the collapsed flat-matrix identity -
    agreement IS the check), and the DC substitution still applies."""
    ac = {5: [0, 0, 1, 0, -1] + [0] * 10}
    dc16 = [1, -1] + [0] * 14
    spec = {
        "w": 32, "h": 16,
        "mbs": [[("i16", 2, 0, dc16, -16, ac), ("i16", 1, 0)]],
    }
    got = decode_first_i_frame(build_fixture_mp4(spec))
    assert np.array_equal(got["luma"], _simulate_luma(spec))


def test_ac_neighbour_nc_chain_roundtrip():
    """AC TotalCoeff feeds the NEXT block's nC (in-MB and cross-MB):
    a two-MB row where the first MB's right-column blocks carry TC=3,
    pushing the second MB's left-column AC blocks to nC=2..3 - which
    forces them to TotalCoeff 0 in the encodable grammar - plus a PCM
    MB above forcing the nC>=8 FLC on the top row."""
    ac_a = {
        1: [1, -1, 1] + [0] * 12,  # blk (1,0)
        5: [1, 1, -1] + [0] * 12,  # blk (3,0): right column
        13: [-1] + [0] * 14,       # blk (3,1)
    }
    ac_b = {
        2: [0, 2] + [0] * 13,      # blk (0,1): left col, nC from A's (3,1)=1 -> (1+?); in-MB top
        12: [1, 1] + [0] * 13,     # blk (2,2)
    }
    mbs = [
        [("pcm", "grad", 7), ("i16", 2, 0, [0] * 16, 0, {})],
        [("i16", 2, 0, [1] + [0] * 15, 0, ac_a), ("i16", 1, 2, [0] * 16, 0, ac_b)],
    ]
    spec = _nodb({"w": 32, "h": 32, "mbs": mbs})
    got = decode_first_i_frame(build_fixture_mp4(spec))
    assert np.array_equal(got["luma"], _simulate_luma(spec))


def test_chroma_dc_hand_arithmetic():
    """§8.5.11 pinned by hand, independent of BOTH twins. A lone
    I_16x16 DC-mode MB (chroma pred flat 128) at qp 26 (qPc 26, m=2,
    e=4, LS = 16*13 = 208) with Cb DC coefficients [2,0,0,0]:

      2x2 Hadamard of [[2,0],[0,0]] -> f = 2 everywhere
      dcC = ((2*208) << 4) >> 5 = 208 per block
      r = (208+32) >> 6 = 3 -> every Cb sample 131; Cr [ -1,1,0,0 ]
      -> f = [[0,-2],[0,-2]] -> dcC column 0 = 0, column 1 =
      ((-2*208)<<4)>>5 = -208 -> r = (-208+32)>>6 = -3 (floor) ->
      right half 125, left half 128.
    """
    cres = (1, [2, 0, 0, 0], [-1, 1, 0, 0])
    spec = _nodb(
        {"w": 16, "h": 16, "mbs": [[("i16", 2, 0, [0] * 16, 0, None, cres)]]}
    )
    got = decode_first_i_frame(build_fixture_mp4(spec))
    assert (got["cb"] == 131).all()
    assert (got["cr"][:, :4] == 128).all()
    assert (got["cr"][:, 4:] == 125).all()
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _simulate_chroma,
    )

    assert np.array_equal(got["cb"], _simulate_chroma(spec, 0))
    assert np.array_equal(got["cr"], _simulate_chroma(spec, 1))


def test_chroma_qp_table_8_15():
    """Table 8-15 pinned at the bend points."""
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _chroma_qp,
    )

    assert _chroma_qp(0) == 0
    assert _chroma_qp(29) == 29
    assert _chroma_qp(30) == 29
    assert _chroma_qp(37) == 34
    assert _chroma_qp(43) == 37
    assert _chroma_qp(51) == 39


def test_chroma_dc_cavlc_roundtrip_complete():
    """The nC=-1 column is a COMPLETE code: every (T1, TC) pair and
    every chroma-DC coefficient layout (all 3^4 - with |level|<=2 -
    plus larger singles) must round-trip bit-exactly with maxNumCoeff
    4 and Table 9-9(a) total_zeros."""
    from itertools import product

    from data_pipeline_capstone_project_spark.operators.h264 import (
        _BitReader,
        _BitWriter,
    )
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _read_residual_block,
        _write_residual_block,
    )

    blocks = [list(b) for b in product((0, 1, -1, 2), repeat=4)]
    for pos in range(4):
        for lvl in (7, -30, 500):
            b = [0] * 4
            b[pos] = lvl
            blocks.append(b)
    for b in blocks:
        w = _BitWriter()
        _write_residual_block(w, -1, b, 4)
        w.u(1, 1)
        r = _BitReader(w.rbsp())
        assert _read_residual_block(r, -1, 4) == b, b
        assert r.u(1) == 1, b


def test_chroma_ac_nc_chain_roundtrip():
    """Chroma AC nC derives from the component's own 2x2-per-MB block
    grid: PCM neighbours force the nC>=8 FLC, in-MB TotalCoeff feeds
    the next block - a grid mixing CBP chroma 0/1/2 decodes
    bit-exactly on all planes."""
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _simulate_chroma,
    )

    mbs = [
        [
            ("pcm", "rampx"),
            ("i16", 2, 0, [0] * 16, 0, None,
             (2, [1, 0, 0, 0], [0, 0, 0, -1],
              {0: [4, -1, 1] + [0] * 12, 3: [0, 1] + [0] * 13},
              {2: [-2] + [0] * 14})),
        ],
        [
            ("i16", 0, 2, [0] * 16, 4, None, (1, [2, -2, 2, -2], [0] * 4)),
            ("i16", 1, 1, [1] + [0] * 15, -10, None,
             (2, [0, 1, 0, 0], [1, 1, 1, 1], {}, {0: [0, 0, 3] + [0] * 12})),
        ],
    ]
    spec = _nodb({"w": 32, "h": 32, "mbs": mbs})
    got = decode_first_i_frame(build_fixture_mp4(spec))
    assert np.array_equal(got["luma"], _simulate_luma(spec))
    assert np.array_equal(got["cb"], _simulate_chroma(spec, 0))
    assert np.array_equal(got["cr"], _simulate_chroma(spec, 1))


def test_i4_residual_hand_arithmetic():
    """§8.5.12 for a LumaLevel4x4 block pinned by hand: a lone I_4x4
    MB (all-DC modes, pred 128) at qp 30 via mb_qp_delta +4 (m=0,
    e=5) with one coefficient +3 at zig-zag position 0 of block 0:

      LevelScale(0, 0, 0) = 16*10 = 160
      d[0][0] = (3*160) << (5-4) = 960   (no DC substitution)
      DC-only transform -> r = (960+32) >> 6 = 15 everywhere
      -> block 0 reconstructs 143 - and every LATER all-DC block
      predicts from reconstructed 143 neighbours, so the whole MB
      lands on 143 (itself evidence that reconstruction, not
      prediction, feeds §8.3.1).
    """
    lres = {0: [3] + [0] * 15}
    spec = {"w": 16, "h": 16,
            "mbs": [[("i4", [2] * 16, 0, lres, 4)]]}
    got = decode_first_i_frame(build_fixture_mp4(spec))["luma"]
    assert (got == 143).all()
    assert np.array_equal(got, _simulate_luma(spec))


def test_i4_residual_feeds_next_block_prediction():
    """The §8.3.1 ordering invariant is load-bearing: block 1
    predicts HORIZONTAL from block 0's samples, so block 0's residual
    must change block 1's pixels - reconstruction, not prediction,
    feeds the neighbour."""
    modes = [2] * 16
    modes[1] = 1  # blk (1,0): H from blk 0's right column
    with_res = {"w": 16, "h": 16,
                "mbs": [[("i4", modes, 0, {0: [3] + [0] * 15}, 4)]]}
    without = {"w": 16, "h": 16, "mbs": [[("i4", modes, 0)]]}
    a = decode_first_i_frame(build_fixture_mp4(with_res))["luma"]
    b = decode_first_i_frame(build_fixture_mp4(without))["luma"]
    # block 1 carries NO residual of its own, yet differs: it copied
    # block 0's reconstructed (128+15) column
    assert (a[:4, 4:8] == 143).all()
    assert (b[:4, 4:8] == 128).all()
    assert np.array_equal(a, _simulate_luma(with_res))


def test_i4_cbp_table_9_4_seam():
    """A partial-luma coded_block_pattern codeNum (outside the
    transcribed {0,1,2,3} head of Table 9-4) raises the honest seam
    instead of guessing a mapping."""
    from data_pipeline_capstone_project_spark.operators.h264 import (
        _BitWriter,
        _ebsp,
    )

    sps = make_sps(16, 16)
    w = _BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 8); w.ue(0); w.u(0, 8); w.u(0, 2)
    w.se(0)
    w.ue(0)  # mb_type I_NxN
    for _ in range(16):
        w.u(1, 1)  # all predicted modes
    w.ue(0)  # chroma DC
    w.ue(4)  # coded_block_pattern codeNum 4: partial luma, a seam
    nal = bytes([0x65]) + _ebsp(w.rbsp())
    payload = make_avc_stream_mp4(sps, [[nal]], 16, 16)
    with pytest.raises(H264DecodeError, match="Table 9-4"):
        decode_first_i_frame(payload)


def test_i4_residual_fixture_roundtrip():
    """The i4_residual.mp4 fixture decodes bit-exactly on all planes
    (full-TC-16 block, low-QP regime, chroma CBP 47, the CBP-0 twin
    MB beside coded ones)."""
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _simulate_chroma,
    )

    spec = next(
        s for s in h264_frame_fixtures() if s["name"] == "i4_residual.mp4"
    )
    got = decode_first_i_frame(build_fixture_mp4(spec))
    sim, scb, scr = _sim_first(spec)
    assert np.array_equal(got["luma"], sim)
    assert np.array_equal(got["cb"], scb)
    assert np.array_equal(got["cr"], scr)


def test_multi_frame_distinct_pictures():
    """decode_i_frames returns every access unit's picture: the
    multi_iframe fixture's three frames (IDR + two non-IDR I slices
    with their own frame_num) decode to three DIFFERENT planes, each
    equal to its own simulator render."""
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        decode_i_frames,
    )

    spec = next(
        s for s in h264_frame_fixtures() if s["name"] == "multi_iframe.mp4"
    )
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        simulate_stream,
    )

    frames = decode_i_frames(build_fixture_mp4(spec))
    assert len(frames) == 3
    h, w = spec["h"], spec["w"]
    sims = [lu[:h, :w] for lu, _, _ in simulate_stream(spec)]
    for f, sim in zip(frames, sims):
        assert np.array_equal(f["luma"], sim)
    assert not np.array_equal(sims[0], sims[1])
    assert not np.array_equal(sims[1], sims[2])


def test_cavlc_seams_raise():
    """Codes outside the transcribed subset raise the honest seam, and
    never mis-decode: (a) TotalCoeff=4 via the nC>=8 FLC hits the
    missing total_zeros column; (b) level_prefix >= 16 is beyond the
    lp==15 escape; (c) an unknown 0<=nC<2 coeff_token codeword fails
    the prefix match. A corrupt run_before that overruns zerosLeft is
    a stream error (d), not a seam."""
    from data_pipeline_capstone_project_spark.operators.h264 import (
        H264Error,
        _BitReader,
        _BitWriter,
    )
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _read_residual_16,
    )

    # (a) FLC (tc=4, t1=0) = (4-1)<<2 = 12: levels then the missing
    # total_zeros column 4
    w = _BitWriter()
    w.u(12, 6)
    for _ in range(4):  # four level_prefix=0 unary codes (level +1... )
        w.u(0, 2)
        w.u(1, 1)
    w.u(1, 1)
    with pytest.raises(H264DecodeError, match="total_zeros column"):
        _read_residual_16(_BitReader(w.rbsp()), 8)

    # (b) FLC (tc=1, t1=0): level_prefix of 16 zeros then the marker
    w = _BitWriter()
    w.u(0, 6)  # FLC code 0 -> (tc=1, t1=0)
    w.u(0, 16)
    w.u(1, 1)
    with pytest.raises(H264DecodeError, match="level_prefix"):
        _read_residual_16(_BitReader(w.rbsp()), 8)

    # (c) 0<=nC<2: '0000100' is no transcribed codeword and no prefix
    # of one once 9 bits are consumed
    w = _BitWriter()
    for bit in "000010011":
        w.u(int(bit), 1)
    with pytest.raises(H264DecodeError, match="coeff_token"):
        _read_residual_16(_BitReader(w.rbsp()), 0)

    # (d) corrupt-stream guard: maxNumCoeff=15 with tc=1 and
    # total_zeros=15 (legal bits in the shared TotalCoeff=1 column,
    # impossible for an AC block) -> stream error, not a seam
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _read_residual_block,
    )

    w = _BitWriter()
    w.u(0, 6)  # FLC (tc=1, t1=0)
    w.u(0, 1)
    w.u(1, 1)  # level_prefix 1 -> level +2... (level_code 1+? ) sign
    for bit in "000000001":  # total_zeros=15 (TotalCoeff=1 column)
        w.u(int(bit), 1)
    with pytest.raises(H264Error, match="overruns maxNumCoeff"):
        _read_residual_block(_BitReader(w.rbsp()), 8, 15)


def test_vlc_tables_structurally_sound():
    """The transcribed VLC tables are prefix-free with Kraft <= 1
    (asserted at import - this test documents the negative case)."""
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        _assert_prefix_free,
    )

    _assert_prefix_free(["1", "01", "00"], "complete")
    with pytest.raises(AssertionError, match="prefix"):
        _assert_prefix_free(["1", "10"], "aliased")
    with pytest.raises(AssertionError, match="Kraft"):
        _assert_prefix_free(["1", "0", "00"], "overfull")


def test_random_residual_grids_roundtrip():
    """Hypothesis sweep over legal grids where I_16x16 MBs carry
    random encodable DC residuals, mb_qp_delta walks the running-QP
    chain, and (r11) a random subset carries CBP-15 AC residuals on a
    checkerboard of 4x4 blocks - the parity rule keeps every coded
    block's neighbour TotalCoeffs in {0, 16}, so nC always lands in
    the encodable nC<2 / nC>=8 coeff_token columns. Decode must equal
    the independent simulator bit-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        PCM_PATTERNS,
        _I4_SCAN,
        _simulate_chroma,
    )

    @st.composite
    def ac_dicts(draw):
        if draw(st.booleans()):
            return None  # CBP luma 0 (mb_type 1..12)
        ac = {}
        for blk_idx, (sx, sy) in enumerate(_I4_SCAN):
            if (sx + sy) % 2:
                continue  # checkerboard: keep neighbour nC encodable
            shape = draw(st.sampled_from(["zero", "zero", "single", "multi"]))
            if shape == "zero":
                continue
            b = [0] * 15
            if shape == "single":
                b[draw(st.integers(0, 14))] = draw(
                    st.sampled_from([1, -1, 2, -3, 9, -20, 150])
                )
            else:
                n = draw(st.integers(2, 3))
                positions = draw(
                    st.lists(
                        st.integers(0, 14), min_size=n, max_size=n,
                        unique=True,
                    )
                )
                for pos in positions:
                    b[pos] = draw(st.sampled_from([1, -1, 4, -7, 33]))
            ac[blk_idx] = b
        return ac or None

    @st.composite
    def chroma_res(draw):
        if draw(st.booleans()):
            return None  # CBP chroma 0
        dcs = []
        for _ in range(2):
            # the nC=-1 column is complete: any TC 0..4 encodes
            dcs.append(
                [draw(st.sampled_from([0, 0, 1, -1, 2, -9]))
                 for _ in range(4)]
            )
        if draw(st.booleans()):
            return (1, dcs[0], dcs[1])
        acs = []
        for _ in range(2):
            d = {}
            for blk in (0, 3):  # checkerboard of the 2x2 chroma grid
                if draw(st.booleans()):
                    continue
                b = [0] * 15
                for pos in draw(
                    st.lists(st.integers(0, 14), min_size=1, max_size=3,
                             unique=True)
                ):
                    b[pos] = draw(st.sampled_from([1, -1, 2, -5, 40]))
                d[blk] = b
            acs.append(d)
        return (2, dcs[0], dcs[1], acs[0], acs[1])

    @st.composite
    def dc_blocks(draw):
        shape = draw(st.sampled_from(["zero", "single", "pair", "triple"]))
        if shape == "zero":
            return [0] * 16
        if shape == "single":
            b = [0] * 16
            b[draw(st.integers(0, 15))] = draw(
                st.sampled_from([1, -1, 2, -2, 3, -3, 7, -7])
            )
            return b
        n = 2 if shape == "pair" else 3
        return [draw(st.sampled_from([1, -1])) for _ in range(n)] + [0] * (
            16 - n
        )

    @st.composite
    def grids(draw):
        mb_w = draw(st.integers(1, 3))
        mb_h = draw(st.integers(1, 3))
        rows = []
        for my in range(mb_h):
            row = []
            for mx in range(mb_w):
                if draw(st.booleans()) and (my + mx) % 3 == 2:
                    row.append(
                        ("pcm", draw(st.sampled_from(PCM_PATTERNS)),
                         draw(st.integers(0, 9)))
                    )
                    continue
                if draw(st.booleans()) and (my + mx) % 2 == 1:
                    # coded I_4x4: all-DC modes (always legal), a
                    # checkerboard LumaLevel4x4 set (same parity
                    # argument as the i16 AC strategy, now over all
                    # 16 zig-zag positions), optional chroma residual
                    lres = {}
                    for blk_idx, (sx, sy) in enumerate(_I4_SCAN):
                        if (sx + sy) % 2 or draw(st.booleans()):
                            continue
                        b = [0] * 16
                        for pos in draw(
                            st.lists(st.integers(0, 15), min_size=1,
                                     max_size=3, unique=True)
                        ):
                            b[pos] = draw(
                                st.sampled_from([1, -1, 2, -6, 75])
                            )
                        lres[blk_idx] = b
                    if lres:
                        row.append(
                            ("i4", [2] * 16, 0, lres,
                             draw(st.integers(-10, 12)),
                             draw(chroma_res()))
                        )
                        continue
                luma_ok = [2] + ([0] if my > 0 else []) + ([1] if mx > 0 else [])
                if my > 0 and mx > 0:
                    luma_ok.append(3)
                chroma_ok = [0] + ([1] if mx > 0 else []) + (
                    [2] if my > 0 else []
                )
                row.append(
                    (
                        "i16",
                        draw(st.sampled_from(luma_ok)),
                        draw(st.sampled_from(chroma_ok)),
                        draw(dc_blocks()),
                        draw(st.integers(-10, 12)),
                        draw(ac_dicts()),
                        draw(chroma_res()),
                    )
                )
            rows.append(row)
        spec = {"w": mb_w * 16, "h": mb_h * 16, "mbs": rows}
        # r12: a random subset also draws §7.3.3 filter-control fields
        # (idc 0/1/2, alpha/beta offset_div2 over the legal -6..6
        # range) so the fuzz sweeps the deblocking parameter space
        if draw(st.booleans()):
            spec["deblock"] = (
                draw(st.sampled_from([0, 1, 2])),
                draw(st.integers(-6, 6)),
                draw(st.integers(-6, 6)),
            )
        return spec

    @settings(max_examples=40, deadline=None)
    @given(grids())
    def run(spec):
        got = decode_first_i_frame(build_fixture_mp4(spec))
        sim, scb, scr = _sim_first(spec)
        assert np.array_equal(got["luma"], sim)
        assert np.array_equal(got["cb"], scb)
        assert np.array_equal(got["cr"], scr)

    run()
