"""H.264 inter-prediction primitives for the P-slice decode subset.

From the published spec (ITU-T H.264): §8.4.1.3 luma motion-vector
prediction (the 16x16-partition median process), §8.4.1.1 P_Skip
motion-vector derivation, §8.4.2.2.1 quarter-sample luma
interpolation (6-tap (1,-5,20,20,-5,1) half-sample filter, Table 8-12
quarter-sample averages), §8.4.2.2.2 eighth-sample bilinear chroma
interpolation, and the Table 9-4 *inter* coded_block_pattern me(v)
column (transcribed subset, same philosophy as the intra subset in
`h264_decode`: only externally-anchorable rows land, the rest stay an
explicit seam).

Two independent transcriptions of the interpolation live here on
purpose (the `h264_frames` twin scheme):

- the DECODER form (`mc_luma_16x16` / `mc_chroma_8x8`): per-block
  windowed fetch with coordinate CLAMPING via clipped index arrays -
  what `_decode_slice` runs on the bitstream;
- the SIMULATOR form (`sim_quarter_luma` / `sim_mc_chroma`):
  whole-plane edge-PADDED arrays, the full quarter-resolution sample
  grid built once per reference frame with strided slicing - what the
  expected-plane simulator samples with plain array indexing.

Both transcribe the same spec clauses, so a shared misreading remains
possible exactly as for the CAVLC tables; the mitigation is the same:
hand-computed literals in tests (a 6-tap value worked by hand, the
Table 8-12 position identities) plus property fuzz comparing the two
forms over random planes and the full MV fraction grid.

Reference parity note: the reference pipeline's Instagram ``.mp4``
originals (s3Posts-to-ES-lambda/s3-to-es_aws.py:101-122) are
overwhelmingly P-slice-coded; this module is what upgrades the
repo's AVC decode from "all-intra streams" to "I+P streams".
"""

from __future__ import annotations

import numpy as np

from .h264 import H264Error

#: Table 9-4 coded_block_pattern me(v), INTER column - transcribed
#: subset (luma all-or-nothing + any chroma, PLUS the chroma-only
#: patterns inter coding makes cheap): codeNum <-> cbp. The other 42
#: rows stay an explicit seam, exactly like the intra subset.
CBP_INTER_DECODE = {0: 0, 1: 16, 6: 32, 11: 15, 12: 47, 19: 31}
CBP_INTER_CODENUM = {v: k for k, v in CBP_INTER_DECODE.items()}


# --- §8.4.1.3 motion-vector prediction ---------------------------------
#
# State is 4x4-BLOCK-granular (the spec's native granularity), carried
# as two structures the encoder and decoder maintain identically:
# ``mvb`` maps a 4x4 block (bx, by) to its (mvx, mvy) when the block
# is inter-coded; ``decoded`` is the boolean plane of blocks already
# reconstructed in raster-MB + partition order. A block that is
# decoded but absent from ``mvb`` is intra (refIdx -1, mv (0,0)).


def _blk_neighbour(
    mvb: dict, decoded, bx: int, by: int
) -> tuple[bool, tuple[int, int], int]:
    """(available, mvLXN, refIdxLXN) for the 4x4 block (bx, by):
    available = inside the picture and already decoded; an intra
    block carries mv (0,0) and refIdx -1 (§8.4.1.3 derivation
    inputs)."""
    h4, w4 = decoded.shape
    if bx < 0 or by < 0 or bx >= w4 or by >= h4 or not decoded[by, bx]:
        return False, (0, 0), -1
    mv = mvb.get((bx, by))
    if mv is None:
        return True, (0, 0), -1
    return True, mv, 0


def mv_pred_part(
    mvb: dict,
    decoded,
    px: int,
    py: int,
    pw4: int,
    hint: "str | None" = None,
) -> tuple[int, int]:
    """§8.4.1.3 luma MV prediction for the partition whose top-left
    4x4 block is (px, py) and whose width is ``pw4`` blocks, refIdxL0
    0 (single-reference streams): neighbours A (left of the corner),
    B (above), C (above the right end, D above-left substituting an
    unavailable C). ``hint`` carries the 16x8/8x16 directional rule -
    'B' (upper 16x8), 'A' (lower 16x8 / left 8x16), 'C' (right 8x16)
    - which short-circuits to that neighbour's MV when it references
    the current picture's refIdx; otherwise the §8.4.1.3.2 process:
    mvA when B, C and D are all unavailable; the single
    same-refIdx neighbour's MV when exactly one matches; else the
    component-wise median of A, B, C."""
    avail_a, mv_a, ref_a = _blk_neighbour(mvb, decoded, px - 1, py)
    avail_b, mv_b, ref_b = _blk_neighbour(mvb, decoded, px, py - 1)
    avail_c, mv_c, ref_c = _blk_neighbour(mvb, decoded, px + pw4, py - 1)
    avail_d, mv_d, ref_d = _blk_neighbour(mvb, decoded, px - 1, py - 1)
    if not avail_c:  # §8.4.1.3.1: D substitutes an unavailable C
        avail_c, mv_c, ref_c = avail_d, mv_d, ref_d
    if hint == "A" and ref_a == 0:
        return mv_a
    if hint == "B" and ref_b == 0:
        return mv_b
    if hint == "C" and ref_c == 0:
        return mv_c
    if not avail_b and not avail_c and not avail_d and avail_a:
        return mv_a
    matches = [
        mv for ref, mv in ((ref_a, mv_a), (ref_b, mv_b), (ref_c, mv_c))
        if ref == 0
    ]
    if len(matches) == 1:
        return matches[0]
    xs = sorted((mv_a[0], mv_b[0], mv_c[0]))
    ys = sorted((mv_a[1], mv_b[1], mv_c[1]))
    return xs[1], ys[1]


def p_skip_mv(
    mvb: dict, decoded, px: int, py: int
) -> tuple[int, int]:
    """§8.4.1.1 P_Skip luma MV for the MB whose top-left 4x4 block is
    (px, py): zero when either the left or above neighbour partition
    is outside the picture, or when either is an inter partition
    referencing index 0 with a zero MV; otherwise the §8.4.1.3
    median prediction for the full 16x16 partition."""
    avail_a, mv_a, ref_a = _blk_neighbour(mvb, decoded, px - 1, py)
    avail_b, mv_b, ref_b = _blk_neighbour(mvb, decoded, px, py - 1)
    if not avail_a or not avail_b:
        return 0, 0
    if ref_a == 0 and mv_a == (0, 0):
        return 0, 0
    if ref_b == 0 and mv_b == (0, 0):
        return 0, 0
    return mv_pred_part(mvb, decoded, px, py, 4)


#: (partition rects, mvp hints) per inter mb_type: list of
#: (dx4, dy4, pw4, ph4, hint) in partition order, offsets in 4x4
#: blocks from the MB corner
P_PARTITIONS = {
    "p16": [(0, 0, 4, 4, None)],
    "p16x8": [(0, 0, 4, 2, "B"), (0, 2, 4, 2, "A")],
    "p8x16": [(0, 0, 2, 4, "A"), (2, 0, 2, 4, "C")],
}
P_MB_TYPE = {"p16": 0, "p16x8": 1, "p8x16": 2}

#: §7.3.5.2 sub-macroblock partitions (P_8x8, mb_type 3): rects in
#: 4x4 blocks relative to the 8x8's corner, in sub-partition order.
#: No Table-direction shortcuts apply below the MB level - every
#: sub-partition predicts through the general §8.4.1.3.2 process.
SUB_PARTITIONS = {
    "8x8": [(0, 0, 2, 2)],
    "8x4": [(0, 0, 2, 1), (0, 1, 2, 1)],
    "4x8": [(0, 0, 1, 2), (1, 0, 1, 2)],
    "4x4": [(0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1), (1, 1, 1, 1)],
}
SUB_MB_TYPE = {"8x8": 0, "8x4": 1, "4x8": 2, "4x4": 3}
SUB_MB_KIND = {v: k for k, v in SUB_MB_TYPE.items()}


def mark_decoded(decoded, px: int, py: int, pw4: int, ph4: int) -> None:
    decoded[py : py + ph4, px : px + pw4] = True


def set_part_mv(
    mvb: dict, px: int, py: int, pw4: int, ph4: int, mv: tuple[int, int]
) -> None:
    for by in range(py, py + ph4):
        for bx in range(px, px + pw4):
            mvb[(bx, by)] = mv


# --- §8.4.2.2 decoder-form interpolation (windowed, clamped) -----------


def _filt6_h(e: np.ndarray) -> np.ndarray:
    """§8.4.2.2.1 6-tap (1,-5,20,20,-5,1) along the last axis: one
    raw half-sample value per window of six."""
    return (
        e[..., :-5] - 5 * e[..., 1:-4] + 20 * e[..., 2:-3]
        + 20 * e[..., 3:-2] - 5 * e[..., 4:-1] + e[..., 5:]
    )


def mc_luma(
    ref: np.ndarray,
    x0: int,
    y0: int,
    mvx: int,
    mvy: int,
    w: int = 16,
    h: int = 16,
) -> np.ndarray:
    """§8.4.2.2.1 quarter-sample luma prediction for the (w, h) block
    at picture position (x0, y0) with MV (mvx, mvy) in quarter-pel
    units against the uncropped reference plane: integer samples are
    fetched with coordinates clamped to the picture (the spec's
    Clip3), half samples run the 6-tap filter ((v+16)>>5 single-pass,
    (v+512)>>10 for the centre j via raw intermediates), quarter
    samples average per Table 8-12. Returns the (h, w) int64
    predicted block."""
    h_pix, w_pix = ref.shape
    xi, yi = x0 + (mvx >> 2), y0 + (mvy >> 2)
    xf, yf = mvx & 3, mvy & 3
    iy = np.clip(np.arange(yi - 2, yi + h + 3), 0, h_pix - 1)
    ix = np.clip(np.arange(xi - 2, xi + w + 3), 0, w_pix - 1)
    e = ref[np.ix_(iy, ix)].astype(np.int64)  # (h+5, w+5) clamped
    g = e[2 : 2 + h, 2 : 2 + w]
    if xf == 0 and yf == 0:
        return g
    b1 = _filt6_h(e)  # (h+5, w): raw half between cols c+2 / c+3
    h1 = _filt6_h(np.swapaxes(e, 0, 1))  # (w+5, h): [col, half-row]
    bq = np.clip((b1 + 16) >> 5, 0, 255)
    hq_t = np.clip((h1 + 16) >> 5, 0, 255)  # transposed: [col, row]
    j1 = _filt6_h(np.swapaxes(b1, 0, 1))  # (w, h) [col-half, row-half]
    jq = np.clip((j1 + 512) >> 10, 0, 255).T
    b_s = bq[2 : 2 + h, :]  # b at the output grid
    s_s = bq[3 : 3 + h, :]  # the half-row below (Table 8-12's s)
    h_s = hq_t[2 : 2 + w, :].T  # h at the output grid
    m_s = hq_t[3 : 3 + w, :].T  # the half-col to the right (m)
    right = e[2 : 2 + h, 3 : 3 + w]  # integer H
    down = e[3 : 3 + h, 2 : 2 + w]  # integer M
    table = {
        (1, 0): (g, b_s), (3, 0): (right, b_s),
        (0, 1): (g, h_s), (0, 3): (down, h_s),
        (1, 1): (b_s, h_s), (3, 1): (b_s, m_s),
        (1, 3): (s_s, h_s), (3, 3): (s_s, m_s),
        (2, 1): (b_s, jq), (2, 3): (s_s, jq),
        (1, 2): (h_s, jq), (3, 2): (m_s, jq),
    }
    if (xf, yf) == (2, 0):
        return b_s
    if (xf, yf) == (0, 2):
        return h_s
    if (xf, yf) == (2, 2):
        return jq
    u, v = table[(xf, yf)]
    return (u + v + 1) >> 1


def mc_luma_16x16(
    ref: np.ndarray, x0: int, y0: int, mvx: int, mvy: int
) -> np.ndarray:
    """Full-MB convenience wrapper over :func:`mc_luma`."""
    return mc_luma(ref, x0, y0, mvx, mvy, 16, 16)


def mc_chroma(
    refc: np.ndarray,
    cx0: int,
    cy0: int,
    mvx: int,
    mvy: int,
    w: int = 8,
    h: int = 8,
) -> np.ndarray:
    """§8.4.2.2.2 eighth-sample bilinear chroma prediction for the
    (w, h) block at chroma position (cx0, cy0): the luma quarter-pel
    MV reads directly as a chroma eighth-pel MV in 4:2:0 frames;
    corner samples fetch with clamped coordinates. Returns (h, w)
    int64."""
    h_pix, w_pix = refc.shape
    xi, yi = cx0 + (mvx >> 3), cy0 + (mvy >> 3)
    xf, yf = mvx & 7, mvy & 7
    iy0 = np.clip(np.arange(yi, yi + h), 0, h_pix - 1)
    iy1 = np.clip(np.arange(yi + 1, yi + h + 1), 0, h_pix - 1)
    ix0 = np.clip(np.arange(xi, xi + w), 0, w_pix - 1)
    ix1 = np.clip(np.arange(xi + 1, xi + w + 1), 0, w_pix - 1)
    a = refc[np.ix_(iy0, ix0)].astype(np.int64)
    b = refc[np.ix_(iy0, ix1)].astype(np.int64)
    c = refc[np.ix_(iy1, ix0)].astype(np.int64)
    d = refc[np.ix_(iy1, ix1)].astype(np.int64)
    return (
        (8 - xf) * (8 - yf) * a + xf * (8 - yf) * b
        + (8 - xf) * yf * c + xf * yf * d + 32
    ) >> 6


def mc_chroma_8x8(
    refc: np.ndarray, cx0: int, cy0: int, mvx: int, mvy: int
) -> np.ndarray:
    """Full-MB convenience wrapper over :func:`mc_chroma`."""
    return mc_chroma(refc, cx0, cy0, mvx, mvy, 8, 8)


# --- simulator-form interpolation (whole-plane, edge-padded) ------------


def sim_quarter_luma(ref: np.ndarray, pad: int) -> tuple[np.ndarray, int]:
    """The SIMULATOR twin of `mc_luma_16x16`: edge-pad the whole
    reference plane by ``pad`` integer samples, then build the full
    quarter-resolution grid Q where
    ``Q[4*(y+pad) + yFrac, 4*(x+pad) + xFrac]`` is the §8.4.2.2.1
    predicted sample for picture position (x, y) at that fraction.
    Returns (Q, pad). Fixture MVs must satisfy |mv|//4 + 3 <= pad."""
    p = np.pad(ref.astype(np.int64), pad, mode="edge")
    hh = _filt6_h(p)  # raw half between cols c+2/c+3
    vv = _filt6_h(p.T).T  # raw half between rows r+2/r+3
    jj = _filt6_h(hh.T).T  # centre: vertical filter of raw halves
    b = np.clip((hh + 16) >> 5, 0, 255)
    h = np.clip((vv + 16) >> 5, 0, 255)
    j = np.clip((jj + 512) >> 10, 0, 255)
    n_r, n_c = p.shape
    q = np.zeros((4 * n_r, 4 * n_c), dtype=np.int64)
    # valid integer region: rows/cols 2 .. n-4 (full 6-tap support)
    ys = np.arange(2, n_r - 3)
    xs = np.arange(2, n_c - 3)
    yy, xx = np.ix_(ys, xs)
    g_ = p[yy, xx]
    b_ = b[yy, xx - 2]
    s_ = b[yy + 1, xx - 2]
    h_ = h[yy - 2, xx]
    m_ = h[yy - 2, xx + 1]
    j_ = j[yy - 2, xx - 2]
    right = p[yy, xx + 1]
    down = p[yy + 1, xx]
    grid = {
        (0, 0): g_, (2, 0): b_, (0, 2): h_, (2, 2): j_,
        (1, 0): (g_ + b_ + 1) >> 1, (3, 0): (right + b_ + 1) >> 1,
        (0, 1): (g_ + h_ + 1) >> 1, (0, 3): (down + h_ + 1) >> 1,
        (1, 1): (b_ + h_ + 1) >> 1, (3, 1): (b_ + m_ + 1) >> 1,
        (1, 3): (s_ + h_ + 1) >> 1, (3, 3): (s_ + m_ + 1) >> 1,
        (2, 1): (b_ + j_ + 1) >> 1, (2, 3): (s_ + j_ + 1) >> 1,
        (1, 2): (h_ + j_ + 1) >> 1, (3, 2): (m_ + j_ + 1) >> 1,
    }
    for (xfr, yfr), vals in grid.items():
        q[4 * ys[0] + yfr :: 4, 4 * xs[0] + xfr :: 4][
            : len(ys), : len(xs)
        ] = vals
    return q, pad


def sim_mc_luma(
    q: np.ndarray,
    pad: int,
    x0: int,
    y0: int,
    mvx: int,
    mvy: int,
    w: int = 16,
    h: int = 16,
) -> np.ndarray:
    """Sample a (w, h) predicted block out of a `sim_quarter_luma`
    grid."""
    r0 = 4 * (y0 + pad) + mvy
    c0 = 4 * (x0 + pad) + mvx
    return q[r0 : r0 + 4 * h : 4, c0 : c0 + 4 * w : 4]


def sim_mc_chroma(
    refc: np.ndarray,
    pad: int,
    cx0: int,
    cy0: int,
    mvx: int,
    mvy: int,
    w: int = 8,
    h: int = 8,
) -> np.ndarray:
    """Simulator twin of `mc_chroma_8x8`: whole-plane edge padding
    instead of clamped index fetches, same §8.4.2.2.2 bilinear."""
    p = np.pad(refc.astype(np.int64), pad, mode="edge")
    xi, yi = cx0 + pad + (mvx >> 3), cy0 + pad + (mvy >> 3)
    xf, yf = mvx & 7, mvy & 7
    a = p[yi : yi + h, xi : xi + w]
    b = p[yi : yi + h, xi + 1 : xi + w + 1]
    c = p[yi + 1 : yi + h + 1, xi : xi + w]
    d = p[yi + 1 : yi + h + 1, xi + 1 : xi + w + 1]
    return (
        (8 - xf) * (8 - yf) * a + xf * (8 - yf) * b
        + (8 - xf) * yf * c + xf * yf * d + 32
    ) >> 6


def check_mv_bounds(mv: tuple[int, int], pad: int) -> None:
    """Fixture-side guard: the simulator's padded grid covers MV
    excursions up to (pad-3) integer samples; the DECODER clamps any
    MV, but a fixture outside the simulator's build region would
    compare garbage."""
    if max(abs(mv[0]), abs(mv[1])) // 4 + 3 > pad:
        raise H264Error(f"fixture MV {mv} exceeds simulator pad {pad}")
