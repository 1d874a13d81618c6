"""H.264 baseline-profile I-frame YCbCr decode, from the published
spec (ITU-T H.264: §7.3.3/§7.3.4 slice header+data, §7.3.5
macroblock layer, §8.3.3 Intra_16x16 luma prediction, §8.3.4 intra
chroma prediction, §9.2 CAVLC coeff_token, §7.4.5 I_PCM).

Reference parity: the reference pipeline stores Instagram ``.mp4``
originals (s3Posts-to-ES-lambda/s3-to-es_aws.py:101-122) whose video
tracks are H.264. `operators.mp4.video_frames` decodes MJPEG tracks
for real and has carried an honest NotImplementedError seam for AVC
pixel data since r6; this module upgrades that seam to a real -
still partial, and documented as such - decoder:

SUPPORTED (decoded bit-exactly):
* IDR / I slices, CAVLC entropy coding, 4:2:0 8-bit, single slice
  per picture, frame_mbs_only;
* I_PCM macroblocks (§7.4.5: full raw luma+chroma sample copy,
  pcm_alignment, and the §9.2.1 nC=16 neighbour rule they impose);
* Intra_16x16 macroblocks with CodedBlockPattern 0 and all-zero DC
  coefficients: all four §8.3.3 luma prediction modes (vertical,
  horizontal, DC with the one/none-available fallbacks, plane) -
  reconstruction equals prediction when the residual is zero, so
  these decode exactly;
* chroma planes (r8 second pass): I_PCM Cb/Cr sample copy and §8.3.4
  intra chroma prediction modes DC (per-4x4 sub-block with the
  spec's corner-source preferences), horizontal, and vertical - the
  entry emits full-frame YCbCr CRCs;
* the §9.2 coeff_token read for the always-present Intra16x16DCLevel
  block, across all four nC ranges, with neighbour-derived nC.

NOT supported - honest seams, each a NotImplementedError that the
Spark entry surfaces as a decode error row rather than silently
wrong pixels: P/B slices, I_4x4 / I_8x8 prediction, nonzero CAVLC
residual levels (the full Table 9-5/9-7/9-10 VLC data is lookup
content that CANNOT be externally verified in this sandbox - no
ffmpeg/cv2/PyAV - and a misremembered codeword would round-trip
self-consistently while breaking real-world interop, so it stays a
seam rather than a gamble), CABAC, chroma plane prediction,
deblocking (moot: zero-residual intra frames hit the filter's skip
conditions only at quant edges we never produce; the fixtures
assert bit-exactness without it).

Correctness gate: every fixture's expected luma plane is computed by
an INDEPENDENT numpy simulator (`_simulate_luma`) straight from the
fixture's macroblock spec - it never touches the bitstream - while
the Spark entry runs the real bit-level decode over staged MP4s.
The DuckDB oracle pins the simulator's plane CRC/statistics as a
closed-form VALUES literal, asserted against the live decoder at
oracle-build time (the h264_meta / color_palette_png scheme). Plane-
mode arithmetic is additionally pinned by hand-computed literals in
tests (tests/test_h264_decode.py), so a shared misreading of §8.3.3
in both twins would still be caught.

Spark shape: staged fixture store -> ``binaryFile`` scan -> Arrow
``mapInPandas`` -> one census row per video. Zero exchanges; sample
bytes and pixel planes never leave the executors; at 100 TB this is
the same embarrassingly-parallel per-file map as every other media
entry.
"""

from __future__ import annotations

import os
import shutil
import struct
import tempfile
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .h264 import (
    H264Error,
    _BitReader,
    _BitWriter,
    _ebsp,
    _find_stsd_entry,
    _minimal_pps,
    _rbsp,
    make_aud_nal,
    make_avc_stream_mp4,
    make_sei_nal,
    make_sps,
    parse_avcc,
    parse_sps,
    split_sample_nals,
)
from .mp4 import _children_at, mp4_sample_table


class H264DecodeError(H264Error):
    """Valid-but-unsupported H.264 feature (the documented seams)."""


# --- CAVLC coeff_token, TotalCoeff=0 row (Table 9-5) --------------------------
#
# (TrailingOnes=0, TotalCoeff=0) per nC range: the only residual code
# the zero-coefficient subset ever produces. nC >= 8 is the 6-bit FLC
# whose (0,0) escape value is 3.

_COEFF_TOKEN_00 = (  # (nC_lo, nC_hi, bits, length)
    (0, 2, 0b1, 1),
    (2, 4, 0b11, 2),
    (4, 8, 0b1111, 4),
    (8, 1 << 30, 0b000011, 6),
)


def _token00_for_nc(nc: int) -> tuple[int, int]:
    for lo, hi, bits, length in _COEFF_TOKEN_00:
        if lo <= nc < hi:
            return bits, length
    raise H264Error(f"negative nC {nc}")


def _write_coeff_token_zero(w: _BitWriter, nc: int) -> None:
    bits, length = _token00_for_nc(nc)
    w.u(bits, length)


def _read_coeff_token_zero(r: _BitReader, nc: int) -> None:
    """Consume one coeff_token and require TotalCoeff=0; any other
    code is the nonzero-residual seam."""
    bits, length = _token00_for_nc(nc)
    if r.u(length) != bits:
        raise H264DecodeError(
            "CAVLC residual levels not supported (TotalCoeff > 0)"
        )


def _dc_nc(mb_x: int, mb_y: int, kinds: list[list[str]]) -> int:
    """nC for the Intra16x16DCLevel block at macroblock (mb_x, mb_y)
    (§9.2.1): averaged from the left/top neighbouring 4x4 blocks'
    TotalCoeff. In the supported subset every 4x4 block of a
    macroblock has the same count - 0 for zero-residual I_16x16, 16
    for I_PCM (the spec's explicit I_PCM rule)."""

    def count(kind: str) -> int:
        return 16 if kind == "pcm" else 0

    avail_a = mb_x > 0
    avail_b = mb_y > 0
    if avail_a and avail_b:
        na = count(kinds[mb_y][mb_x - 1])
        nb = count(kinds[mb_y - 1][mb_x])
        return (na + nb + 1) >> 1
    if avail_a:
        return count(kinds[mb_y][mb_x - 1])
    if avail_b:
        return count(kinds[mb_y - 1][mb_x])
    return 0


# --- fixture pixel patterns (shared INPUT data, not a twin) -------------------

PCM_PATTERNS = ("grad", "zeros", "rampx", "rampy")


def pcm_luma(kind: str, seed: int = 0) -> np.ndarray:
    """Deterministic 16x16 uint8 luma tile for an I_PCM macroblock."""
    y, x = np.mgrid[0:16, 0:16]
    if kind == "grad":
        return ((x * 7 + y * 13 + seed * 31) % 256).astype(np.uint8)
    if kind == "zeros":
        return np.zeros((16, 16), dtype=np.uint8)
    if kind == "rampx":
        return (x * 17).astype(np.uint8)
    if kind == "rampy":
        return (y * 17).astype(np.uint8)
    raise ValueError(f"unknown pcm pattern {kind!r}")


def pcm_chroma(kind: str, seed: int, plane: int) -> np.ndarray:
    """Deterministic 8x8 uint8 chroma tile (plane 0 = Cb, 1 = Cr) for
    an I_PCM macroblock - same pattern family as the luma, offset per
    plane so Cb and Cr differ."""
    y, x = np.mgrid[0:8, 0:8]
    if kind == "grad":
        return ((x * 11 + y * 5 + seed * 17 + plane * 71) % 256).astype(
            np.uint8
        )
    if kind == "zeros":
        return np.zeros((8, 8), dtype=np.uint8)
    if kind == "rampx":
        return (x * 36 + plane * 3).astype(np.uint8)
    if kind == "rampy":
        return (y * 36 + plane * 3).astype(np.uint8)
    raise ValueError(f"unknown pcm pattern {kind!r}")


# --- encoder: I slice with I_PCM / zero-residual I_16x16 macroblocks ----------

I16_MODE_NAMES = ("V", "H", "DC", "Plane")


#: intra_chroma_pred_mode values (§7.4.5.1 / §8.3.4): DC, Horizontal,
#: Vertical, Plane. Note luma 16x16 numbers V/H/DC/Plane differently.
CHROMA_MODE_NAMES = ("DC", "H", "V", "Plane")


def make_i_slice_nal(
    mbs: list[list[tuple]], idr: bool = True, frame_num: int = 0
) -> bytes:
    """One complete coded I slice covering the whole picture.
    ``mbs[row][col]`` is ``("pcm", pattern, seed)`` or
    ``("i16", luma_mode[, chroma_mode])`` with luma_mode in 0..3
    (§8.3.3 order V/H/DC/Plane) and chroma_mode in 0..2 (§8.3.4
    order DC/H/V; plane stays a decoder seam, default DC).
    Slice header per §7.3.3 against this package's SPS (poc_type 0,
    8-bit frame_num, 8-bit poc lsb) and `_minimal_pps` (CAVLC, no
    deblocking-control fields, qp offsets 0)."""
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type: I (all-I coded stream form)
    w.ue(0)  # pic_parameter_set_id
    w.u(frame_num & 0xFF, 8)
    if idr:
        w.ue(0)  # idr_pic_id
    w.u(0, 8)  # pic_order_cnt_lsb (poc_type 0)
    # dec_ref_pic_marking (nal_ref_idc > 0)
    if idr:
        w.u(0, 2)  # no_output_of_prior_pics, long_term_reference
    else:
        w.u(0, 1)  # adaptive_ref_pic_marking_mode_flag
    w.se(0)  # slice_qp_delta
    kinds = [[d[0] for d in row] for row in mbs]
    for mb_y, row in enumerate(mbs):
        for mb_x, desc in enumerate(row):
            if desc[0] == "pcm":
                w.ue(25)  # mb_type I_PCM
                w.byte_align_zero()
                seed = desc[2] if len(desc) > 2 else 0
                tile = pcm_luma(desc[1], seed)
                for v in tile.reshape(-1):
                    w.u(int(v), 8)
                # §7.4.5 sample order: all Cb, then all Cr (4:2:0 8x8)
                for plane in (0, 1):
                    for v in pcm_chroma(desc[1], seed, plane).reshape(-1):
                        w.u(int(v), 8)
            else:
                mode = desc[1]
                chroma_mode = desc[2] if len(desc) > 2 else 0
                if not 0 <= mode <= 3:
                    raise H264Error(f"I_16x16 mode {mode}")
                if not 0 <= chroma_mode <= 3:
                    raise H264Error(f"chroma mode {chroma_mode}")
                # mb_type 1..4: predMode=mode, cbp_chroma=0, cbp_luma=0
                w.ue(1 + mode)
                w.ue(chroma_mode)  # intra_chroma_pred_mode
                w.se(0)  # mb_qp_delta (present for I_16x16)
                _write_coeff_token_zero(w, _dc_nc(mb_x, mb_y, kinds))
    nal_type = 5 if idr else 1
    return bytes([0x60 | nal_type]) + _ebsp(w.rbsp())


# --- decoder ------------------------------------------------------------------


def _clip1(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict_i16(
    plane: np.ndarray, mb_x: int, mb_y: int, mode: int
) -> None:
    """§8.3.3 Intra_16x16 luma prediction written per-pixel to mirror
    the spec pseudocode (the vectorized twin lives in
    `_simulate_luma`). Availability: single slice, so neighbours are
    available exactly when inside the picture."""
    x0, y0 = mb_x * 16, mb_y * 16
    has_top = mb_y > 0
    has_left = mb_x > 0
    if mode == 0:  # Intra_16x16_Vertical
        if not has_top:
            raise H264Error("V prediction without top neighbour")
        for x in range(16):
            p = plane[y0 - 1, x0 + x]
            for y in range(16):
                plane[y0 + y, x0 + x] = p
    elif mode == 1:  # Intra_16x16_Horizontal
        if not has_left:
            raise H264Error("H prediction without left neighbour")
        for y in range(16):
            p = plane[y0 + y, x0 - 1]
            for x in range(16):
                plane[y0 + y, x0 + x] = p
    elif mode == 2:  # Intra_16x16_DC
        if has_top and has_left:
            s = 0
            for x in range(16):
                s += int(plane[y0 - 1, x0 + x])
            for y in range(16):
                s += int(plane[y0 + y, x0 - 1])
            dc = (s + 16) >> 5
        elif has_left:
            s = sum(int(plane[y0 + y, x0 - 1]) for y in range(16))
            dc = (s + 8) >> 4
        elif has_top:
            s = sum(int(plane[y0 - 1, x0 + x]) for x in range(16))
            dc = (s + 8) >> 4
        else:
            dc = 128
        plane[y0 : y0 + 16, x0 : x0 + 16] = dc
    else:  # Intra_16x16_Plane
        if not (has_top and has_left):
            raise H264Error("Plane prediction needs top+left+corner")
        h = 0
        v = 0
        for i in range(8):
            top_hi = int(plane[y0 - 1, x0 + 8 + i])
            top_lo = int(
                plane[y0 - 1, x0 + 6 - i] if i < 7 else plane[y0 - 1, x0 - 1]
            )
            h += (i + 1) * (top_hi - top_lo)
            left_hi = int(plane[y0 + 8 + i, x0 - 1])
            left_lo = int(
                plane[y0 + 6 - i, x0 - 1] if i < 7 else plane[y0 - 1, x0 - 1]
            )
            v += (i + 1) * (left_hi - left_lo)
        a = 16 * (int(plane[y0 + 15, x0 - 1]) + int(plane[y0 - 1, x0 + 15]))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        for y in range(16):
            for x in range(16):
                plane[y0 + y, x0 + x] = _clip1(
                    (a + b * (x - 7) + c * (y - 7) + 16) >> 5
                )


def _predict_chroma(
    plane: np.ndarray, mb_x: int, mb_y: int, mode: int
) -> None:
    """§8.3.4 intra chroma prediction on one 8x8 chroma plane,
    per-pixel to mirror the spec (vectorized twin in
    `_simulate_chroma`). DC (mode 0) runs per 4x4 sub-block with the
    spec's corner-block source preferences; H/V are full-block
    copies; Plane (mode 3) is an honest seam."""
    x0, y0 = mb_x * 8, mb_y * 8
    has_top = mb_y > 0
    has_left = mb_x > 0
    if mode == 0:  # DC, per 4x4 sub-block (§8.3.4.1)
        for yo in (0, 4):
            for xo in (0, 4):
                top_sum = (
                    sum(int(plane[y0 - 1, x0 + xo + i]) for i in range(4))
                    if has_top
                    else None
                )
                left_sum = (
                    sum(int(plane[y0 + yo + i, x0 - 1]) for i in range(4))
                    if has_left
                    else None
                )
                if (xo, yo) in ((0, 0), (4, 4)):
                    if top_sum is not None and left_sum is not None:
                        dc = (top_sum + left_sum + 4) >> 3
                    elif left_sum is not None:
                        dc = (left_sum + 2) >> 2
                    elif top_sum is not None:
                        dc = (top_sum + 2) >> 2
                    else:
                        dc = 128
                elif (xo, yo) == (4, 0):  # prefers its own top run
                    if top_sum is not None:
                        dc = (top_sum + 2) >> 2
                    elif left_sum is not None:
                        dc = (left_sum + 2) >> 2
                    else:
                        dc = 128
                else:  # (0, 4) prefers its own left run
                    if left_sum is not None:
                        dc = (left_sum + 2) >> 2
                    elif top_sum is not None:
                        dc = (top_sum + 2) >> 2
                    else:
                        dc = 128
                for y in range(4):
                    for x in range(4):
                        plane[y0 + yo + y, x0 + xo + x] = dc
    elif mode == 1:  # Horizontal
        if not has_left:
            raise H264Error("chroma H prediction without left neighbour")
        for y in range(8):
            p = plane[y0 + y, x0 - 1]
            for x in range(8):
                plane[y0 + y, x0 + x] = p
    elif mode == 2:  # Vertical
        if not has_top:
            raise H264Error("chroma V prediction without top neighbour")
        for x in range(8):
            p = plane[y0 - 1, x0 + x]
            for y in range(8):
                plane[y0 + y, x0 + x] = p
    else:
        raise H264DecodeError("chroma plane prediction not supported")


def decode_i_slice(
    nal: bytes, sps: dict
) -> tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
    """Decode one IDR/I coded-slice NAL against a parsed SPS and this
    package's PPS values -> (luma, cb, cr coded-size uint8 planes,
    stats). Raises H264DecodeError on the documented seams."""
    nal_type = nal[0] & 0x1F
    if nal_type not in (1, 5):
        raise H264Error(f"not a coded slice NAL (type {nal_type})")
    if sps["chroma_format_idc"] != 1 or sps["bit_depth"] != 8:
        raise H264DecodeError("only 4:2:0 8-bit decode supported")
    if sps["interlaced"]:
        raise H264DecodeError("interlaced decode not supported")
    idr = nal_type == 5
    r = _BitReader(_rbsp(nal[1:]))
    if r.ue() != 0:
        raise H264DecodeError("multi-slice pictures not supported")
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise H264DecodeError(f"non-I slice_type {slice_type}")
    if r.ue() != 0:
        raise H264Error("pic_parameter_set_id != 0")
    r.u(sps["log2_max_frame_num"])  # frame_num
    if idr:
        r.ue()  # idr_pic_id
    if sps["pic_order_cnt_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
    # dec_ref_pic_marking (nal_ref_idc > 0 on all our fixtures)
    if nal[0] & 0x60:
        if idr:
            r.u(2)
        elif r.u(1):
            raise H264DecodeError("adaptive ref pic marking")
    r.se()  # slice_qp_delta (qp unused: zero-residual subset)
    mb_w, mb_h = sps["mb_width"], sps["mb_height"]
    plane = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    cb = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    cr = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    kinds: list[list[str]] = [["?"] * mb_w for _ in range(mb_h)]
    n_pcm = n_i16 = 0
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            mb_type = r.ue()
            if mb_type == 25:  # I_PCM
                r.byte_align()
                tile = np.empty((16, 16), dtype=np.uint8)
                for y in range(16):
                    for x in range(16):
                        tile[y, x] = r.u(8)
                plane[mb_y * 16 : mb_y * 16 + 16, mb_x * 16 : mb_x * 16 + 16] = tile
                # §7.4.5: all Cb samples, then all Cr
                for cplane in (cb, cr):
                    ctile = np.empty((8, 8), dtype=np.uint8)
                    for y in range(8):
                        for x in range(8):
                            ctile[y, x] = r.u(8)
                    cplane[
                        mb_y * 8 : mb_y * 8 + 8, mb_x * 8 : mb_x * 8 + 8
                    ] = ctile
                kinds[mb_y][mb_x] = "pcm"
                n_pcm += 1
            elif mb_type == 0:
                raise H264DecodeError("I_4x4 prediction not supported")
            elif 1 <= mb_type <= 24:
                pred_mode = (mb_type - 1) % 4
                cbp_chroma = ((mb_type - 1) // 4) % 3
                cbp_luma = 15 if mb_type > 12 else 0
                if cbp_chroma or cbp_luma:
                    raise H264DecodeError(
                        "coded residual blocks not supported (CBP != 0)"
                    )
                chroma_mode = r.ue()  # intra_chroma_pred_mode
                r.se()  # mb_qp_delta
                kinds[mb_y][mb_x] = "i16"
                _read_coeff_token_zero(r, _dc_nc(mb_x, mb_y, kinds))
                _predict_i16(plane, mb_x, mb_y, pred_mode)
                _predict_chroma(cb, mb_x, mb_y, chroma_mode)
                _predict_chroma(cr, mb_x, mb_y, chroma_mode)
                n_i16 += 1
            else:
                raise H264Error(f"I-slice mb_type {mb_type} > 25")
    return plane, cb, cr, {"n_pcm": n_pcm, "n_i16": n_i16, "n_mbs": mb_w * mb_h}


def decode_first_i_frame(payload: bytes) -> dict:
    """ISO BMFF bytes -> decode the first I/IDR frame of the first AVC
    track; returns the cropped display-size luma plane and census
    fields."""
    fourcc, entry = _find_stsd_entry(payload)
    if fourcc not in (b"avc1", b"avc3"):
        raise H264Error(f"not an AVC sample entry: {fourcc!r}")
    avcc = None
    for kind, p, _ in _children_at(entry[78:]):
        if kind == b"avcC":
            avcc = p
            break
    if avcc is None:
        raise H264Error("no avcC record")
    cfg = parse_avcc(avcc)
    sps = parse_sps(cfg["sps"][0])
    _, table = mp4_sample_table(payload)
    for off, size in table:
        sample = payload[off : off + size]
        for nal in split_sample_nals(sample, cfg["nal_length_size"]):
            if nal[0] & 0x1F in (1, 5):
                plane, cb, cr, stats = decode_i_slice(nal, sps)
                w, h = sps["width"], sps["height"]
                x0, y0 = sps["crop_left_px"], sps["crop_top_px"]
                luma = np.ascontiguousarray(plane[y0 : y0 + h, x0 : x0 + w])
                cw, ch = w // 2, h // 2  # 4:2:0 chroma crop
                cx, cy = x0 // 2, y0 // 2
                return {
                    "width": w,
                    "height": h,
                    "luma": luma,
                    "cb": np.ascontiguousarray(cb[cy : cy + ch, cx : cx + cw]),
                    "cr": np.ascontiguousarray(cr[cy : cy + ch, cx : cx + cw]),
                    **stats,
                }
    raise H264Error("no coded slice in any sample")


# --- the independent expected-plane simulator ---------------------------------


def _simulate_luma(spec: dict) -> np.ndarray:
    """Vectorized numpy twin of §8.3.3 over the fixture's macroblock
    SPEC (never reads the bitstream): builds the expected cropped luma
    plane the decoder must reproduce bit-exactly."""
    mbs = spec["mbs"]
    mb_h, mb_w = len(mbs), len(mbs[0])
    plane = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int64)
    for my, row in enumerate(mbs):
        for mx, desc in enumerate(row):
            y0, x0 = my * 16, mx * 16
            blk = plane[y0 : y0 + 16, x0 : x0 + 16]
            if desc[0] == "pcm":
                blk[:] = pcm_luma(desc[1], desc[2] if len(desc) > 2 else 0)
                continue
            mode = desc[1]
            top = plane[y0 - 1, x0 : x0 + 16] if my > 0 else None
            left = plane[y0 : y0 + 16, x0 - 1] if mx > 0 else None
            if mode == 0:
                blk[:] = np.broadcast_to(top, (16, 16))
            elif mode == 1:
                blk[:] = np.broadcast_to(left[:, None], (16, 16))
            elif mode == 2:
                if top is not None and left is not None:
                    dc = (int(top.sum()) + int(left.sum()) + 16) >> 5
                elif left is not None:
                    dc = (int(left.sum()) + 8) >> 4
                elif top is not None:
                    dc = (int(top.sum()) + 8) >> 4
                else:
                    dc = 128
                blk[:] = dc
            else:
                corner = int(plane[y0 - 1, x0 - 1])
                i = np.arange(8)
                hh = int(
                    ((i + 1) * (top[8 + i] - np.where(i < 7, top[6 - i], corner))).sum()
                )
                vv = int(
                    (
                        (i + 1)
                        * (left[8 + i] - np.where(i < 7, left[6 - i], corner))
                    ).sum()
                )
                a = 16 * (int(left[15]) + int(top[15]))
                b = (5 * hh + 32) >> 6
                c = (5 * vv + 32) >> 6
                xg, yg = np.meshgrid(np.arange(16), np.arange(16))
                blk[:] = np.clip(
                    (a + b * (xg - 7) + c * (yg - 7) + 16) >> 5, 0, 255
                )
    h, w = spec["h"], spec["w"]
    return plane[:h, :w].astype(np.uint8)


def _simulate_chroma(spec: dict, plane_idx: int) -> np.ndarray:
    """Vectorized numpy twin of §8.3.4 (DC per 4x4 sub-block with
    corner-source preferences, H/V copies) over the fixture SPEC -
    one 8x8-per-MB chroma plane (0 = Cb, 1 = Cr), cropped."""
    mbs = spec["mbs"]
    mb_h, mb_w = len(mbs), len(mbs[0])
    plane = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int64)
    for my, row in enumerate(mbs):
        for mx, desc in enumerate(row):
            y0, x0 = my * 8, mx * 8
            blk = plane[y0 : y0 + 8, x0 : x0 + 8]
            if desc[0] == "pcm":
                blk[:] = pcm_chroma(
                    desc[1], desc[2] if len(desc) > 2 else 0, plane_idx
                )
                continue
            cmode = desc[2] if len(desc) > 2 else 0
            top = plane[y0 - 1, x0 : x0 + 8] if my > 0 else None
            left = plane[y0 : y0 + 8, x0 - 1] if mx > 0 else None
            if cmode == 1:
                blk[:] = np.broadcast_to(left[:, None], (8, 8))
            elif cmode == 2:
                blk[:] = np.broadcast_to(top, (8, 8))
            else:  # DC per 4x4 sub-block
                for yo in (0, 4):
                    for xo in (0, 4):
                        ts = int(top[xo : xo + 4].sum()) if top is not None else None
                        ls = (
                            int(left[yo : yo + 4].sum())
                            if left is not None
                            else None
                        )
                        if (xo, yo) in ((0, 0), (4, 4)):
                            if ts is not None and ls is not None:
                                dc = (ts + ls + 4) >> 3
                            elif ls is not None:
                                dc = (ls + 2) >> 2
                            elif ts is not None:
                                dc = (ts + 2) >> 2
                            else:
                                dc = 128
                        elif (xo, yo) == (4, 0):
                            dc = (
                                (ts + 2) >> 2
                                if ts is not None
                                else (ls + 2) >> 2
                                if ls is not None
                                else 128
                            )
                        else:
                            dc = (
                                (ls + 2) >> 2
                                if ls is not None
                                else (ts + 2) >> 2
                                if ts is not None
                                else 128
                            )
                        blk[yo : yo + 4, xo : xo + 4] = dc
    h, w = spec["h"] // 2, spec["w"] // 2
    return plane[:h, :w].astype(np.uint8)


# --- fixtures ------------------------------------------------------------------


def _grid(mb_w: int, mb_h: int, fill: tuple) -> list[list[tuple]]:
    return [[fill for _ in range(mb_w)] for _ in range(mb_h)]


def h264_frame_fixtures() -> list[dict]:
    """The staged decode corpus: every supported macroblock kind,
    every prediction mode, crop, fragmentation, multi-frame, extra
    NALs before the slice, and an emulation-prevention stress (zero
    PCM rows force 00 00 00 runs in the slice data)."""
    fixtures: list[dict] = []

    mbs = _grid(3, 2, ("pcm", "grad", 0))
    for my in range(2):
        for mx in range(3):
            mbs[my][mx] = ("pcm", "grad", my * 3 + mx)
    fixtures.append({"name": "pcm_grad.mp4", "w": 48, "h": 32, "mbs": mbs})

    fixtures.append(
        {
            "name": "i16_dc_flat.mp4",
            "w": 32,
            "h": 32,
            "mbs": _grid(2, 2, ("i16", 2)),
        }
    )

    # top row PCM gradients; second row V-predicts (copies PCM bottom
    # rows); third row H-predicts (propagates left column)
    mbs = [
        [("pcm", "grad", 1), ("pcm", "rampx"), ("pcm", "rampy")],
        [("i16", 0), ("i16", 0), ("i16", 0)],
        [("pcm", "grad", 7), ("i16", 1), ("i16", 1)],
    ]
    fixtures.append({"name": "mixed_vh.mp4", "w": 48, "h": 48, "mbs": mbs})

    # plane prediction fed by PCM ramps (the hand-pinned case in tests)
    mbs = [
        [("pcm", "rampx"), ("pcm", "rampx")],
        [("pcm", "rampy"), ("i16", 3)],
    ]
    fixtures.append({"name": "plane_ramps.mp4", "w": 32, "h": 32, "mbs": mbs})

    # cropped display size: coded 48x32, display 44x28 (even crop pads);
    # modes chosen so every MB's required neighbours exist (row 0 DC
    # falls back to left-only / none-available variants)
    mbs = [
        [("pcm", "grad", 3), ("i16", 2), ("i16", 2)],
        [("i16", 0), ("i16", 2), ("i16", 3)],
    ]
    fixtures.append({"name": "cropped.mp4", "w": 44, "h": 28, "mbs": mbs})

    # fragmented container, 3 identical access units
    fixtures.append(
        {
            "name": "fragmented.mp4",
            "w": 32,
            "h": 16,
            "mbs": [[("pcm", "rampy"), ("i16", 1)]],
            "fragmented": True,
            "n_frames": 3,
        }
    )

    # SEI + AUD NALs precede the slice inside the access unit
    fixtures.append(
        {
            "name": "lead_nals.mp4",
            "w": 16,
            "h": 16,
            "mbs": [[("pcm", "grad", 5)]],
            "lead_nals": True,
        }
    )

    # emulation-prevention stress: all-zero PCM rows produce long
    # 0x00 runs inside slice data -> §7.4.1 escapes on the wire
    mbs = [
        [("pcm", "zeros"), ("pcm", "zeros")],
        [("pcm", "zeros"), ("i16", 2)],
    ]
    fixtures.append({"name": "ep_zeros.mp4", "w": 32, "h": 32, "mbs": mbs})

    # chroma prediction modes: PCM gradients feed H (copies the left
    # chroma column) and V (copies the top chroma row) I16 neighbours;
    # DC corner-preference sub-blocks get mixed pcm/i16 context
    mbs = [
        [("pcm", "grad", 9), ("i16", 2, 0), ("pcm", "rampx")],
        [("i16", 0, 2), ("i16", 1, 1), ("i16", 1, 1)],
    ]
    fixtures.append({"name": "chroma_modes.mp4", "w": 48, "h": 32, "mbs": mbs})

    return fixtures


def build_fixture_mp4(spec: dict) -> bytes:
    """Encode one fixture spec into a complete MP4 payload."""
    mbs = spec["mbs"]
    mb_w, mb_h = len(mbs[0]), len(mbs)
    sps = make_sps(spec["w"], spec["h"])
    slice_nal = make_i_slice_nal(mbs)
    au = [slice_nal]
    if spec.get("lead_nals"):
        au = [make_aud_nal(), make_sei_nal(6), slice_nal]
    samples = [au for _ in range(spec.get("n_frames", 1))]
    return make_avc_stream_mp4(
        sps,
        samples,
        mb_w * 16,
        mb_h * 16,
        fragmented=spec.get("fragmented", False),
    )


def _stage_frame_store(root: str) -> None:
    for spec in h264_frame_fixtures():
        with open(os.path.join(root, spec["name"]), "wb") as f:
            f.write(build_fixture_mp4(spec))


# --- registry query + oracle ---------------------------------------------------

_SCHEMA = (
    "video_name string, width int, height int, n_mbs int, n_pcm int, "
    "n_i16 int, luma_sum bigint, luma_crc32 bigint, "
    "cb_crc32 bigint, cr_crc32 bigint, "
    "px_tl int, px_tr int, px_bl int, px_br int"
)


def _plane_row(
    name: str, luma: np.ndarray, cb: np.ndarray, cr: np.ndarray, stats: dict
) -> dict:
    h, w = luma.shape
    return {
        "video_name": name,
        "width": w,
        "height": h,
        "n_mbs": stats["n_mbs"],
        "n_pcm": stats["n_pcm"],
        "n_i16": stats["n_i16"],
        "luma_sum": int(luma.astype(np.int64).sum()),
        "luma_crc32": int(zlib.crc32(luma.tobytes())),
        "cb_crc32": int(zlib.crc32(cb.tobytes())),
        "cr_crc32": int(zlib.crc32(cr.tobytes())),
        "px_tl": int(luma[0, 0]),
        "px_tr": int(luma[0, w - 1]),
        "px_bl": int(luma[h - 1, 0]),
        "px_br": int(luma[h - 1, w - 1]),
    }


def h264_frames_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: staged AVC store -> binaryFile -> mapInPandas
    -> real bit-level I-frame YCbCr decode -> one census row per
    video (per-plane CRCs + stats; the planes stay executor-side)."""
    work = tempfile.mkdtemp(prefix="h264_frames_")
    try:
        _stage_frame_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("video_name"),
            F.col("content").alias("payload"),
        )

        def decode_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out: list[dict] = []
                for name, p in zip(pdf["video_name"], pdf["payload"]):
                    d = decode_first_i_frame(bytes(p))
                    out.append(
                        _plane_row(name, d["luma"], d["cb"], d["cr"], d)
                    )
                yield pd.DataFrame(out)

        out = bin_df.mapInPandas(decode_batches, _SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _frames_oracle() -> str:
    """Closed-form VALUES oracle: rows computed by the numpy SPEC
    simulator; the live bitstream decoder is asserted to agree over
    the exact fixture bytes at oracle-build time."""
    rows = []
    for spec in h264_frame_fixtures():
        sim = _simulate_luma(spec)
        sim_cb = _simulate_chroma(spec, 0)
        sim_cr = _simulate_chroma(spec, 1)
        mb_count = len(spec["mbs"]) * len(spec["mbs"][0])
        n_pcm = sum(1 for row in spec["mbs"] for d in row if d[0] == "pcm")
        want = _plane_row(
            spec["name"],
            sim,
            sim_cb,
            sim_cr,
            {"n_mbs": mb_count, "n_pcm": n_pcm, "n_i16": mb_count - n_pcm},
        )
        got = decode_first_i_frame(build_fixture_mp4(spec))
        got_row = _plane_row(spec["name"], got["luma"], got["cb"], got["cr"], got)
        if got_row != want:
            raise AssertionError(
                f"{spec['name']}: decoder {got_row} != simulator {want}"
            )
        rows.append(
            "(" + ", ".join(
                f"'{v}'" if isinstance(v, str) else str(v)
                for v in want.values()
            ) + ")"
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(video_name, width, height, n_mbs, n_pcm, n_i16, "
        "luma_sum, luma_crc32, cb_crc32, cr_crc32, "
        "px_tl, px_tr, px_bl, px_br)"
    )


H264_FRAMES_ORACLE_SQL = _frames_oracle()
