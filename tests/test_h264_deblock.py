"""§8.7 in-loop deblocking: hand-computed filter vectors (independent
of both twins), boundary-strength derivation, threshold-table sanity,
the I_PCM QP-0 rule, and the in-loop property (filtered pictures feed
inter prediction). The decoder-vs-simulator bit-exactness of whole
deblocked streams is covered by tests/test_h264_decode.py and the
h264_frames oracle; this file pins the §8.7 arithmetic itself."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_capstone_project_spark.operators.h264_decode import (
    _DB_ALPHA,
    _DB_BETA,
    _DB_TC0,
    _edge_bs,
    _filter_seg,
    build_fixture_mp4,
    decode_frames,
    h264_frame_fixtures,
    simulate_stream,
)


def _seg(p3, p2, p1, p0, q0, q1, q2, q3):
    return np.array(
        [[p3], [p2], [p1], [p0], [q0], [q1], [q2], [q3]], dtype=np.int32
    )


def test_threshold_tables_shape_and_spec_values():
    assert len(_DB_ALPHA) == len(_DB_BETA) == len(_DB_TC0) == 52
    # zero below index 16 (why QP-0 PCM edges never filter)
    assert all(_DB_ALPHA[i] == 0 and _DB_BETA[i] == 0 for i in range(16))
    assert all(_DB_TC0[i] == (0, 0, 0) for i in range(17))
    # Table 8-16 spot values
    assert _DB_ALPHA[16] == 4 and _DB_ALPHA[26] == 15
    assert _DB_ALPHA[40] == 80 and _DB_ALPHA[51] == 255
    assert _DB_BETA[16] == 2 and _DB_BETA[26] == 6 and _DB_BETA[51] == 18
    # Table 8-17 spot values
    assert _DB_TC0[26] == (1, 1, 1)
    assert _DB_TC0[40] == (4, 5, 7)
    assert _DB_TC0[51] == (13, 17, 25)
    # monotone non-decreasing
    for t in (_DB_ALPHA, _DB_BETA):
        assert all(a <= b for a, b in zip(t, t[1:]))
    for c in range(3):
        col = [row[c] for row in _DB_TC0]
        assert all(a <= b for a, b in zip(col, col[1:]))


def test_bs4_weak_arm_hand_values():
    """qp_av 40 (alpha 80, beta 13): a 40-step edge fails the
    |p0-q0| < (alpha>>2)+2 = 22 strong-arm cut, so only p0/q0 move:
    p0' = (2*60+60+100+2)>>2 = 70, q0' = (2*100+100+60+2)>>2 = 90."""
    s = _seg(60, 60, 60, 60, 100, 100, 100, 100)
    _filter_seg(s, 4, 40, 0, 0, False)
    assert s[:, 0].tolist() == [60, 60, 60, 70, 90, 100, 100, 100]


def test_bs4_strong_arm_hand_values():
    """qp_av 40, 10-step edge (< 22): full strong filter.
      p0' = (60+120+120+140+70+4)>>3 = 64
      p1' = (60+60+60+70+2)>>2 = 63
      p2' = (120+180+60+60+70+4)>>3 = 61
      q0' = (70+140+140+120+60+4)>>3 = 66
      q1' = (70+70+70+60+2)>>2 = 68
      q2' = (140+210+70+70+60+4)>>3 = 69"""
    s = _seg(60, 60, 60, 60, 70, 70, 70, 70)
    _filter_seg(s, 4, 40, 0, 0, False)
    assert s[:, 0].tolist() == [60, 61, 63, 64, 66, 68, 69, 70]


def test_bs1_clipped_arm_hand_values():
    """qp_av 30 (alpha 25, beta 8, tC0[30][0] = 1), samples
    p3..q3 = 70,70,72,74,80,78,76,76: ap=4<8 and aq=4<8 so
    tC = 1+1+1 = 3; delta = ((6<<2) + (72-78) + 4)>>3 = 2;
    p0' 76, q0' 78; p1' = 72 + clip(((70+77-144)>>1), ±1) = 73;
    q1' = 78 + clip(((76+77-156)>>1) = -2 -> -1, ±1) = 77."""
    s = _seg(70, 70, 72, 74, 80, 78, 76, 76)
    _filter_seg(s, 1, 30, 0, 0, False)
    assert s[:, 0].tolist() == [70, 70, 73, 76, 78, 77, 76, 76]


def test_bs1_chroma_only_p0_q0():
    """Chroma arm: tC = tC0+1 fixed, p1/q1 NEVER modified."""
    s = _seg(70, 70, 72, 74, 80, 78, 76, 76)
    _filter_seg(s, 1, 30, 0, 0, True)
    # tC = 1+1 = 2 -> delta clip(2, ±2) = 2
    assert s[:, 0].tolist() == [70, 70, 72, 76, 78, 78, 76, 76]


def test_bs4_chroma_hand_values():
    s = _seg(0, 0, 60, 60, 100, 100, 0, 0)
    _filter_seg(s, 4, 40, 0, 0, True)
    # p0' = (2*60+60+100+2)>>2 = 70; q0' = (2*100+100+60+2)>>2 = 90
    assert s[3, 0] == 70 and s[4, 0] == 90
    assert s[2, 0] == 60 and s[5, 0] == 100


def test_filter_identity_cases():
    # alpha gate: |p0-q0| >= alpha leaves everything untouched
    s = _seg(0, 0, 0, 0, 255, 255, 255, 255)
    before = s.copy()
    _filter_seg(s, 4, 30, 0, 0, False)
    assert np.array_equal(s, before)
    # index below 16: alpha 0 -> nothing ever filters
    s = _seg(60, 60, 60, 60, 70, 70, 70, 70)
    before = s.copy()
    _filter_seg(s, 4, 15, 0, 0, False)
    assert np.array_equal(s, before)


def test_offsets_shift_threshold_index():
    """alpha offset -8 drops indexA from 20 to 12 -> alpha 0 -> edge
    unfiltered; +0 filters it."""
    s1 = _seg(60, 60, 60, 60, 64, 64, 64, 64)
    s2 = s1.copy()
    _filter_seg(s1, 4, 20, 0, 0, False)
    _filter_seg(s2, 4, 20, -8, -8, False)
    assert not np.array_equal(s1, s2)
    assert s2[:, 0].tolist() == [60, 60, 60, 60, 64, 64, 64, 64]


def _meta(kinds, qp=26, tc=None, mv0=None, mv1=None):
    mb_h, mb_w = len(kinds), len(kinds[0])
    return {
        "kinds": kinds,
        "qp": np.full((mb_h, mb_w), qp, dtype=np.int32),
        "tc": (
            tc if tc is not None
            else np.zeros((mb_h * 4, mb_w * 4), dtype=bool)
        ),
        "mv0": mv0 or {},
        "mv1": mv1 or {},
    }


def test_bs_derivation_ladder():
    # intra at an MB edge -> 4; internal -> 3
    m = _meta([["i16", "i16"]])
    assert _edge_bs(m, 3, 0, 4, 0, True) == 4
    assert _edge_bs(m, 0, 0, 1, 0, False) == 3
    # inter both, coefficients on one side -> 2
    tc = np.zeros((4, 8), dtype=bool)
    tc[0, 4] = True
    mv = {(bx, by): (0, 0) for bx in range(8) for by in range(4)}
    m = _meta([["p16", "p16"]], tc=tc, mv0=mv)
    assert _edge_bs(m, 3, 0, 4, 0, True) == 2
    # MV divergence >= 4 quarter-pel -> 1; below -> 0
    mv = {(bx, by): ((0, 0) if bx < 4 else (4, 0))
          for bx in range(8) for by in range(4)}
    m = _meta([["p16", "p16"]], mv0=mv)
    assert _edge_bs(m, 3, 0, 4, 0, True) == 1
    mv = {(bx, by): ((0, 0) if bx < 4 else (3, 0))
          for bx in range(8) for by in range(4)}
    m = _meta([["p16", "p16"]], mv0=mv)
    assert _edge_bs(m, 3, 0, 4, 0, True) == 0
    # different number of MVs (L0-only vs BI) -> 1
    mv0 = {(bx, by): (0, 0) for bx in range(8) for by in range(4)}
    mv1 = {(bx, by): (0, 0) for bx in range(4, 8) for by in range(4)}
    m = _meta([["b16", "b16"]], mv0=mv0, mv1=mv1)
    assert _edge_bs(m, 3, 0, 4, 0, True) == 1


def test_pcm_qp_zero_never_filters():
    """The I_PCM QP-0 rule (§8.7.2): a PCM/PCM MB edge averages QP 0
    -> indexA 0 -> alpha 0, so even a hard step between PCM tiles
    survives filtering; decoded PCM pixels ARE the coded bytes."""
    from data_pipeline_capstone_project_spark.operators.h264_decode import (
        decode_first_i_frame,
        pcm_luma,
    )

    spec = next(
        s for s in h264_frame_fixtures() if s["name"] == "pcm_grad.mp4"
    )
    luma = decode_first_i_frame(build_fixture_mp4(spec))["luma"]
    assert np.array_equal(luma[0:16, 0:16], pcm_luma("grad", 0))
    assert np.array_equal(luma[16:32, 16:32], pcm_luma("grad", 4))


def test_deblock_fixture_store_covers_idc_and_offsets():
    fx = {s["name"]: s for s in h264_frame_fixtures()}
    on = decode_frames(build_fixture_mp4(fx["deblock_idc0.mp4"]))[0]
    off = decode_frames(build_fixture_mp4(fx["deblock_idc1_off.mp4"]))[0]
    shifted = decode_frames(build_fixture_mp4(fx["deblock_offsets.mp4"]))[0]
    assert not np.array_equal(on["luma"], off["luma"])
    assert not np.array_equal(on["luma"], shifted["luma"])
    # the step edge itself must have been smoothed by idc=0
    mid = on["luma"][:, 14:18].astype(int)
    mid_off = off["luma"][:, 14:18].astype(int)
    assert np.abs(np.diff(mid, axis=1)).max() < np.abs(
        np.diff(mid_off, axis=1)
    ).max()


def test_filter_is_in_loop_not_output_only():
    """deblock_p_bs.mp4 ends in an all-skip picture that copies its
    reference: if either twin filtered only at output (not into the
    DPB), the third frame would diverge from the other twin's."""
    spec = next(
        s for s in h264_frame_fixtures() if s["name"] == "deblock_p_bs.mp4"
    )
    got = decode_frames(build_fixture_mp4(spec))
    want = simulate_stream(spec)
    assert len(got) == 3
    h, w = spec["h"], spec["w"]
    # frame 2 (the skip copy) equals frame 1 AND the simulator
    assert np.array_equal(got[2]["luma"], got[1]["luma"])
    assert np.array_equal(got[2]["luma"], want[2][0][:h, :w])
    # and frame 1 was actually modified by the filter somewhere
    unfiltered_changed = not np.array_equal(got[1]["luma"], got[0]["luma"])
    assert unfiltered_changed


def test_slice_header_rejects_bad_idc():
    from data_pipeline_capstone_project_spark.operators.h264 import H264Error

    spec = {
        "w": 32, "h": 16,
        "mbs": [[("i16", 2), ("i16", 2)]],
        "deblock": (3, 0, 0),
    }
    with pytest.raises(H264Error, match="disable_deblocking_filter_idc"):
        decode_frames(build_fixture_mp4(spec))
