"""P-slice machinery: interpolation twins, MV prediction, round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_capstone_project_spark.operators.h264 import H264Error
from data_pipeline_capstone_project_spark.operators.h264_decode import (
    build_fixture_mp4,
    decode_frames,
    make_i_slice_nal,
    make_p_slice_nal,
    simulate_stream,
)
from data_pipeline_capstone_project_spark.operators.h264_inter import (
    CBP_INTER_CODENUM,
    CBP_INTER_DECODE,
    check_mv_bounds,
    mark_decoded,
    mc_chroma_8x8,
    mc_luma,
    mc_luma_16x16,
    mv_pred_part,
    p_skip_mv,
    set_part_mv,
    sim_mc_chroma,
    sim_mc_luma,
    sim_quarter_luma,
)


# --- hand-pinned spec arithmetic (guards a SHARED misreading of
# §8.4.2.2 in both interpolation transcriptions) -------------------------


def test_halfpel_six_tap_hand_computed():
    """b = Clip1(((E -5F +20G +20H -5I +J) + 16) >> 5) for the row
    (10, 250, 30, 90, 200, 5): 10-1250+600+1800-1000+5 = 165,
    (165+16)>>5 = 5 - worked by hand from §8.4.2.2.1."""
    row = np.array([10, 250, 30, 90, 200, 5], dtype=np.uint8)
    # place the window so the (2,0)-fraction output at x0=2 reads it:
    # the 6-tap span for output col 0 is integer cols x0-2 .. x0+3
    ref = np.zeros((16, 24), dtype=np.uint8)
    ref[:, 0:6] = row
    out = mc_luma_16x16(ref, 2, 0, 2, 0)  # xInt=2 -> window cols 0..5
    assert int(out[0, 0]) == 5


def test_quarter_is_average_of_pinned_halves():
    """a = (G + b + 1) >> 1 at the hand-pinned window: G = 30 (the
    integer sample left of the half), b = 5 -> a = 18."""
    row = np.array([10, 250, 30, 90, 200, 5], dtype=np.uint8)
    ref = np.zeros((16, 24), dtype=np.uint8)
    ref[:, 0:6] = row
    out = mc_luma_16x16(ref, 2, 0, 1, 0)
    assert int(out[0, 0]) == (30 + 5 + 1) >> 1


def test_chroma_bilinear_hand_computed():
    """predC = ((8-xF)(8-yF)A + xF(8-yF)B + (8-xF)yF C + xF yF D + 32)
    >> 6 with (A,B,C,D) = (100,200,50,10) and (xF,yF) = (3,5):
    (1500 + 1800 + 1250 + 150 + 32) >> 6 = 73 - worked by hand from
    §8.4.2.2.2."""
    refc = np.zeros((8, 8), dtype=np.uint8)
    refc[2, 3], refc[2, 4], refc[3, 3], refc[3, 4] = 100, 200, 50, 10
    out = mc_chroma_8x8(refc, 3, 2, 3, 5)
    assert int(out[0, 0]) == 73


# --- the two transcriptions agree everywhere ----------------------------


def test_interpolation_twins_full_fraction_grid():
    rng = np.random.default_rng(17)
    ref = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    q, pad = sim_quarter_luma(ref, 10)
    for yf in range(4):
        for xf in range(4):
            for x0, y0, ix, iy in ((16, 16, 0, 0), (0, 0, -3, -2),
                                   (48, 32, 5, 3)):
                mv = (4 * ix + xf, 4 * iy + yf)
                a = mc_luma_16x16(ref, x0, y0, *mv)
                b = sim_mc_luma(q, pad, x0, y0, *mv)
                assert np.array_equal(a, b), (xf, yf, x0, y0)


def test_chroma_twins_random():
    rng = np.random.default_rng(19)
    for _ in range(50):
        refc = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
        cx0, cy0 = int(rng.integers(0, 16)), int(rng.integers(0, 8))
        mv = (int(rng.integers(-20, 21)), int(rng.integers(-20, 21)))
        assert np.array_equal(
            mc_chroma_8x8(refc, cx0, cy0, *mv),
            sim_mc_chroma(refc, 8, cx0, cy0, *mv),
        )


def test_edge_clamp_matches_edge_pad():
    """A MV pointing entirely outside the picture: clamped-index
    fetch (decoder) == edge padding (simulator), and the prediction
    is the replicated corner."""
    ref = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)
    out = mc_luma_16x16(ref, 0, 0, -400, -400)
    assert (out == ref[0, 0]).all()


# --- §8.4.1.3 / §8.4.1.1 rules ------------------------------------------


def _state(mb_w: int, mb_h: int, mb_mvs: dict, intra: set = frozenset()):
    """Build block-granular (mvb, decoded) from MB-granular fixtures:
    every listed MB (inter or intra) is decoded."""
    import numpy as np

    mvb: dict = {}
    decoded = np.zeros((mb_h * 4, mb_w * 4), dtype=bool)
    for (mx, my), mv in mb_mvs.items():
        set_part_mv(mvb, mx * 4, my * 4, 4, 4, mv)
        mark_decoded(decoded, mx * 4, my * 4, 4, 4)
    for mx, my in intra:
        mark_decoded(decoded, mx * 4, my * 4, 4, 4)
    return mvb, decoded


def test_mv_pred_median_and_special_cases():
    # first MB: nothing available -> (0,0)
    mvb, dec = _state(4, 4, {})
    assert mv_pred_part(mvb, dec, 0, 0, 4) == (0, 0)
    # top row, only A available (B/C/D out of picture) -> mvA
    mvb, dec = _state(4, 4, {(0, 0): (12, -4)})
    assert mv_pred_part(mvb, dec, 4, 0, 4) == (12, -4)
    # exactly one inter neighbour -> its MV (A intra/undecoded, C inter)
    mvb, dec = _state(4, 4, {(2, 0): (8, 8)}, intra={(0, 1), (1, 0)})
    assert mv_pred_part(mvb, dec, 4, 4, 4) == (8, 8)
    # three inter neighbours -> component-wise median
    mvb, dec = _state(4, 4, {(0, 1): (-4, 0), (1, 0): (8, 4), (2, 0): (2, -8)})
    assert mv_pred_part(mvb, dec, 4, 4, 4) == (2, 0)
    # C outside the picture -> D substitutes
    mvb, dec = _state(
        4, 4, {(2, 1): (-4, 0), (3, 0): (8, 4), (2, 0): (2, -8)}
    )
    assert mv_pred_part(mvb, dec, 12, 4, 4) == (2, 0)


def test_mv_pred_directional_hints():
    """Table-direction rules for 16x8/8x16 partitions: the hinted
    neighbour wins when it references refIdx 0, else the general
    process runs."""
    # upper 16x8 takes B even when A/C disagree
    mvb, dec = _state(
        4, 4, {(0, 1): (-4, 0), (1, 0): (8, 4), (2, 0): (2, -8)}
    )
    assert mv_pred_part(mvb, dec, 4, 4, 4, hint="B") == (8, 4)
    # lower 16x8 takes A (here: the left MB's bottom half)
    assert mv_pred_part(mvb, dec, 4, 6, 4, hint="A") == (-4, 0)
    # right 8x16 takes C (above-right)
    assert mv_pred_part(mvb, dec, 6, 4, 2, hint="C") == (2, -8)
    # hinted neighbour intra -> falls back to the general process
    mvb, dec = _state(
        4, 4, {(0, 1): (-4, 0), (2, 0): (2, -8)}, intra={(1, 0)}
    )
    assert mv_pred_part(mvb, dec, 4, 4, 4, hint="B") == (0, 0)


def test_skip_mv_rules():
    # left/top edge -> zero
    mvb, dec = _state(4, 4, {(0, 0): (4, 4)})
    assert p_skip_mv(mvb, dec, 0, 4) == (0, 0)
    assert p_skip_mv(mvb, dec, 4, 0) == (0, 0)
    # zero-MV refIdx-0 neighbour -> zero
    mvb, dec = _state(
        4, 4, {(0, 1): (0, 0), (1, 0): (8, 4), (2, 0): (8, 4)}
    )
    assert p_skip_mv(mvb, dec, 4, 4) == (0, 0)
    # intra A (refIdx -1, not a zero trigger) -> median path
    mvb, dec = _state(
        4, 4, {(1, 0): (8, 4), (2, 0): (8, 4)}, intra={(0, 1)}
    )
    assert p_skip_mv(mvb, dec, 4, 4) == (8, 4)


def test_cbp_inter_tables_are_inverse():
    assert CBP_INTER_CODENUM == {v: k for k, v in CBP_INTER_DECODE.items()}
    assert set(CBP_INTER_DECODE.values()) == {0, 15, 16, 31, 32, 47}


def test_mv_bounds_guard():
    with pytest.raises(H264Error, match="simulator pad"):
        check_mv_bounds((400, 0), 8)


# --- encoder guards ------------------------------------------------------


def test_encoder_rejects_wrong_skip_derivation():
    """The fixture author's hand-derived P_Skip MV is asserted against
    the implementation's §8.4.1.1 at build time."""
    with pytest.raises(H264Error, match="8.4.1.1"):
        make_p_slice_nal([[("skip", (4, 0)), ("skip", (0, 0))]])


def test_encoder_rejects_qp_delta_without_cbp():
    with pytest.raises(H264Error, match="no mb_qp_delta"):
        make_p_slice_nal([[("p16", (0, 0), None, 4)]])


# --- property fuzz: random P streams round-trip through the decoder ------


def _rand_residual(rng) -> dict:
    blocks = {}
    for blk in rng.choice(16, size=rng.integers(1, 4), replace=False):
        levels = [0] * 16
        for pos in rng.choice(16, size=rng.integers(1, 3), replace=False):
            levels[int(pos)] = int(rng.integers(1, 4)) * (
                1 if rng.integers(2) else -1
            )
        blocks[int(blk)] = levels
    return blocks


def test_fuzz_random_p_streams_match_simulator():
    """Random I+P+P streams over random MVs (all fractions, edge
    excursions), random 16x16/16x8/8x16 partitions, random skips, and
    sparse inter residuals: the bit-level decode must equal the
    independent simulator on every frame, luma and chroma."""
    import numpy as np

    rng = np.random.default_rng(23)
    for trial in range(6):
        mb_w, mb_h = int(rng.integers(2, 4)), int(rng.integers(1, 3))
        idr = [
            [("pcm", "grad", int(rng.integers(0, 50)))
             for _ in range(mb_w)]
            for _ in range(mb_h)
        ]
        p_frames = []
        for _ in range(2):
            grid = []
            mvb: dict = {}
            dec = np.zeros((mb_h * 4, mb_w * 4), dtype=bool)
            for my in range(mb_h):
                row = []
                for mx in range(mb_w):
                    px, py = mx * 4, my * 4
                    pick = int(rng.integers(6))
                    if pick == 0:
                        mv = p_skip_mv(mvb, dec, px, py)
                        set_part_mv(mvb, px, py, 4, 4, mv)
                        mark_decoded(dec, px, py, 4, 4)
                        row.append(("skip", mv))
                        continue

                    def rand_mv():
                        return (int(rng.integers(-24, 25)),
                                int(rng.integers(-24, 25)))

                    def place(dx4, dy4, pw4, ph4):
                        mv = rand_mv()
                        set_part_mv(mvb, px + dx4, py + dy4, pw4, ph4, mv)
                        mark_decoded(dec, px + dx4, py + dy4, pw4, ph4)
                        return mv

                    if pick == 1:
                        kind = "p16x8"
                        mv_field = (place(0, 0, 4, 2), place(0, 2, 4, 2))
                    elif pick == 2:
                        kind = "p8x16"
                        mv_field = (place(0, 0, 2, 4), place(2, 0, 2, 4))
                    elif pick == 3:
                        kind = "p8x8"
                        subs = []
                        for i in range(4):
                            qx, qy = 2 * (i % 2), 2 * (i // 2)
                            sk = ("8x8", "8x4", "4x8", "4x4")[
                                int(rng.integers(4))
                            ]
                            rects = {
                                "8x8": [(0, 0, 2, 2)],
                                "8x4": [(0, 0, 2, 1), (0, 1, 2, 1)],
                                "4x8": [(0, 0, 1, 2), (1, 0, 1, 2)],
                                "4x4": [(0, 0, 1, 1), (1, 0, 1, 1),
                                        (0, 1, 1, 1), (1, 1, 1, 1)],
                            }[sk]
                            got = [
                                place(qx + dx4, qy + dy4, pw4, ph4)
                                for dx4, dy4, pw4, ph4 in rects
                            ]
                            subs.append(
                                (sk, got[0] if len(got) == 1
                                 else tuple(got))
                            )
                        mv_field = tuple(subs)
                    else:
                        kind = "p16"
                        mv_field = place(0, 0, 4, 4)
                    if rng.integers(3) == 0:
                        row.append(
                            (kind, mv_field, _rand_residual(rng),
                             int(rng.integers(-6, 7)))
                        )
                    else:
                        row.append((kind, mv_field))
                grid.append(row)
            p_frames.append(grid)
        spec = {
            "name": f"fuzz{trial}.mp4", "w": mb_w * 16, "h": mb_h * 16,
            "mbs": idr, "p_frames": p_frames,
        }
        try:
            payload = build_fixture_mp4(spec)
        except H264Error:
            # a random residual landed on a block whose neighbour
            # TotalCoeff puts nC in the untranscribed 2..7 coeff_token
            # columns - strip residuals, keep the partition/MV layout
            spec["p_frames"] = [
                [[d[:2] for d in row] for row in grid]
                for grid in p_frames
            ]
            payload = build_fixture_mp4(spec)
        frames = decode_frames(payload)
        sims = simulate_stream(spec)
        assert len(frames) == len(sims)
        for i, (f, (lu, cbp, crp)) in enumerate(zip(frames, sims)):
            assert np.array_equal(f["luma"], lu), (trial, i)
            assert np.array_equal(f["cb"], cbp), (trial, i)
            assert np.array_equal(f["cr"], crp), (trial, i)


def test_p_after_nonidr_i_uses_latest_reference():
    """P frames reference the most recent decoded picture - here a
    non-IDR I frame that differs from the IDR, so a wrong (IDR)
    reference would show in the skip-copied plane."""
    spec = {
        "name": "chain.mp4", "w": 16, "h": 16,
        "mbs": [[("pcm", "grad", 1)]],
        "extra_frames": [[[("pcm", "rampx")]]],
        "p_frames": [[[("skip", (0, 0))]]],
    }
    frames = decode_frames(build_fixture_mp4(spec))
    assert len(frames) == 3
    assert np.array_equal(frames[2]["luma"], frames[1]["luma"])
    assert not np.array_equal(frames[2]["luma"], frames[0]["luma"])


# --- B slices -------------------------------------------------------------


def test_b_fuzz_random_streams_match_simulator():
    """Random I-P-B-P-B streams: every list selection (L0/L1/BI),
    random sub-pel MVs in both lists, sparse residuals on B MBs - the
    bit-level decode must equal the independent simulator, and the
    second B must resolve its POC window against the slid DPB."""
    rng = np.random.default_rng(31)
    for trial in range(4):
        mb_w, mb_h = int(rng.integers(2, 4)), int(rng.integers(1, 3))
        idr = [
            [("pcm", "grad", int(rng.integers(0, 50)))
             for _ in range(mb_w)]
            for _ in range(mb_h)
        ]

        def p_grid():
            return [
                [("p16", (int(rng.integers(-16, 17)),
                          int(rng.integers(-16, 17))))
                 for _ in range(mb_w)]
                for _ in range(mb_h)
            ]

        def b_grid():
            rows = []
            for _ in range(mb_h):
                row = []
                for _ in range(mb_w):
                    sel = ("L0", "L1", "BI")[int(rng.integers(3))]
                    def mv():
                        return (int(rng.integers(-16, 17)),
                                int(rng.integers(-16, 17)))
                    row.append(
                        ("b16", sel, (mv(), mv()) if sel == "BI" else mv())
                    )
                rows.append(row)
            return rows

        spec = {
            "name": f"bfuzz{trial}.mp4", "w": mb_w * 16, "h": mb_h * 16,
            "mbs": idr,
            "seq": [("P", p_grid()), ("B", b_grid()),
                    ("P", p_grid()), ("B", b_grid())],
        }
        frames = decode_frames(build_fixture_mp4(spec))
        sims = simulate_stream(spec)
        assert len(frames) == 5
        for i, (f, (lu, cbp, crp)) in enumerate(zip(frames, sims)):
            assert np.array_equal(f["luma"], lu), (trial, i)
            assert np.array_equal(f["cb"], cbp), (trial, i)
            assert np.array_equal(f["cr"], crp), (trial, i)


def test_b_frames_are_not_references():
    """A P frame AFTER a B frame must reference the last I/P picture,
    not the B (nal_ref_idc 0 keeps B out of the DPB)."""
    spec = {
        "name": "bref.mp4", "w": 16, "h": 16,
        "mbs": [[("pcm", "grad", 7)]],
        "seq": [
            ("P", [[("p16", (0, 0), {0: [4] + [0] * 15}, 2)]]),
            ("B", [[("b16", "L0", (0, 0))]]),  # copies the IDR
            ("P", [[("p16", (0, 0))]]),  # zero-MV copy of... which?
        ],
    }
    frames = decode_frames(build_fixture_mp4(spec))
    # frame 3 copies frame 1 (the last REFERENCE), not frame 2 (the B)
    assert np.array_equal(frames[3]["luma"], frames[1]["luma"])
    assert not np.array_equal(frames[3]["luma"], frames[2]["luma"])


def test_bi_average_is_rounded_mean():
    """§8.4.2.3 default bi-prediction: a BI MB with zero MVs over two
    constant references lands at the rounded mean."""
    spec = {
        "name": "bavg.mp4", "w": 16, "h": 16,
        "mbs": [[("pcm", "zeros")]],  # luma 0
        "seq": [
            # future ref: +35 uniform via the lone-DC residual at QP 28
            ("P", [[("p16", (0, 0), {k: [9] + [0] * 15
                                     for k in range(16)}, 2)]]),
            ("B", [[("b16", "BI", ((0, 0), (0, 0)))]]),
        ],
    }
    frames = decode_frames(build_fixture_mp4(spec))
    past = frames[0]["luma"].astype(int)
    future = frames[1]["luma"].astype(int)
    assert (frames[2]["luma"] == ((past + future + 1) >> 1)).all()
