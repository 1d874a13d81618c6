"""H.264 codec-configuration parsing: avcC + SPS, from the published
specs (ISO/IEC 14496-15 §5.3.3 AVCDecoderConfigurationRecord; ITU-T
H.264 §7.3.2.1.1 seq_parameter_set_data, §7.4.2.1.1 semantics).

Reference parity: the reference pipeline stores Instagram ``.mp4``
originals (s3Posts-to-ES-lambda/s3-to-es_aws.py:101-122) which are
H.264 in practice. A from-scratch H.264 *sample* decoder is out of
scope (the documented NotImplementedError seam in
:mod:`operators.mp4`), but the codec CONFIGURATION - profile, level,
chroma format, bit depth, exact cropped display dimensions, reference
frame count - lives entirely in the SPS, a few hundred bits of
Exp-Golomb-coded header that this module round-trips bit-exactly:

* :func:`make_sps` / :func:`parse_sps` - build + parse
  seq_parameter_set RBSP, including the profile-conditioned chroma
  block, scaling-matrix skip, all three pic_order_cnt_type layouts,
  frame cropping with spec CropUnitX/Y, and interlaced
  (frame_mbs_only_flag=0) streams.
* emulation prevention (§7.3.1 / §7.4.1): RBSP -> EBSP inserts
  0x03 after 0x0000 when the next byte is <= 0x03; the parser strips
  it. At least one fixture is asserted (in tests) to actually
  trigger an insertion so the path is exercised end to end.
* :func:`make_avcc` / :func:`parse_avcc` - the
  AVCDecoderConfigurationRecord carried in the ``avcC`` box of an
  ``avc1``/``avc3`` sample entry.
* :func:`h264_meta` - walk an ISO BMFF payload to the video track's
  ``stsd``, find the AVC sample entry, parse its first SPS.

Spark side (``h264_meta`` registry query): staged fixture store ->
``binaryFile`` scan -> Arrow ``mapInPandas`` -> per-file metadata
row. Zero exchanges, payload bytes never on the driver; the DuckDB
oracle is a closed-form VALUES literal asserted against the pure
Python parser at oracle-build time (same scheme as mp4_meta).
"""

from __future__ import annotations

import os
import shutil
import struct
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .mp4 import (
    _box,
    _build_classic_mp4,
    _build_fmp4,
    _children_at,
    mp4_sample_table,
)

# profile_idc values that carry the chroma/bit-depth block
# (H.264 §7.3.2.1.1, the "if( profile_idc == ..." list).
_HIGH_PROFILES = frozenset(
    {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}
)

_PROFILE_NAMES = {
    66: "baseline",
    77: "main",
    88: "extended",
    100: "high",
    110: "high10",
    122: "high422",
    244: "high444",
    44: "cavlc444",
}

# SubWidthC / SubHeightC per chroma_format_idc (H.264 table 6-1).
_SUB_WH = {1: (2, 2), 2: (2, 1), 3: (1, 1)}


class H264Error(ValueError):
    """Malformed avcC / SPS bitstream."""


# --- bit-level Exp-Golomb I/O ------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        if value < 0 or value >> n:
            raise H264Error(f"u({n}) overflow: {value}")
        for i in range(n - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        """Unsigned Exp-Golomb (§9.1): leadingZeros zeros, 1, then
        leadingZeros info bits of (value+1)."""
        if value < 0:
            raise H264Error(f"ue() negative: {value}")
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, value: int) -> None:
        """Signed Exp-Golomb (§9.1.1): k>0 -> 2k-1, k<=0 -> -2k."""
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def byte_align_zero(self) -> None:
        """pcm_alignment_zero_bit run (§7.3.5): zero bits to the next
        byte boundary."""
        while len(self._bits) % 8:
            self._bits.append(0)

    def rbsp(self) -> bytes:
        """Close with rbsp_trailing_bits (stop bit + zero pad)."""
        bits = self._bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0

    def u(self, n: int) -> int:
        end = self._pos + n
        if end > len(self._data) * 8:
            raise H264Error("SPS truncated mid-field")
        value = 0
        for i in range(self._pos, end):
            value = (value << 1) | ((self._data[i >> 3] >> (7 - (i & 7))) & 1)
        self._pos = end
        return value

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise H264Error("Exp-Golomb run > 31 zeros")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        """Skip pcm_alignment_zero_bit run to the next byte boundary;
        the skipped bits must be zero (§7.4.5)."""
        pad = (-self._pos) % 8
        if pad and self.u(pad) != 0:
            raise H264Error("nonzero pcm_alignment bits")


def _ebsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte (§7.4.1): after two
    consecutive zero bytes, a byte <= 0x03 must be escaped."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 0x03:
            out.append(0x03)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _rbsp(ebsp: bytes) -> bytes:
    """Strip emulation prevention: 00 00 03 -> 00 00."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 0x03:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# --- SPS build / parse -------------------------------------------------------


def make_sps(
    width: int,
    height: int,
    profile_idc: int = 66,
    level_idc: int = 30,
    chroma_format_idc: int = 1,
    bit_depth: int = 8,
    frame_mbs_only: bool = True,
    max_num_ref_frames: int = 1,
    pic_order_cnt_type: int = 0,
    poc_cycle_offsets: tuple[int, ...] = (),
    scaling_matrix: bool = False,
    sps_id: int = 0,
) -> bytes:
    """Build a complete SPS NAL unit (header byte + EBSP) whose parsed
    display size is exactly ``width`` x ``height``, deriving the mb
    grid and frame-cropping offsets the way an encoder does. Fixture
    generator for the parser - every branch the parser has is
    reachable through these arguments."""
    if profile_idc not in _HIGH_PROFILES and (
        chroma_format_idc != 1 or bit_depth != 8 or scaling_matrix
    ):
        raise H264Error("chroma/bit-depth block needs a high profile")
    mb_w = -(-width // 16)
    unit_h = 16 if frame_mbs_only else 32
    map_h = -(-height // unit_h)
    # CropUnit (§7.4.2.1.1): ChromaArrayType 0 -> (1, 2-fmof);
    # else (SubWidthC, SubHeightC*(2-fmof)).
    fmof = 1 if frame_mbs_only else 0
    if chroma_format_idc == 0:
        cux, cuy = 1, 2 - fmof
    else:
        sw, sh = _SUB_WH[chroma_format_idc]
        cux, cuy = sw, sh * (2 - fmof)
    pad_x = mb_w * 16 - width
    pad_y = map_h * unit_h - height
    if pad_x % cux or pad_y % cuy:
        raise H264Error(
            f"{width}x{height} not reachable: crop pad ({pad_x},{pad_y}) "
            f"not divisible by CropUnit ({cux},{cuy})"
        )
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint_set flags + reserved_zero_2bits
    w.u(level_idc, 8)
    w.ue(sps_id)
    if profile_idc in _HIGH_PROFILES:
        w.ue(chroma_format_idc)
        if chroma_format_idc == 3:
            w.u(0, 1)  # separate_colour_plane_flag
        w.ue(bit_depth - 8)
        w.ue(bit_depth - 8)
        w.u(0, 1)  # qpprime_y_zero_transform_bypass_flag
        w.u(1 if scaling_matrix else 0, 1)
        if scaling_matrix:
            n_lists = 12 if chroma_format_idc == 3 else 8
            for i in range(n_lists):
                if i == 0:
                    w.u(1, 1)  # seq_scaling_list_present_flag[0]
                    # flat 4x4 list: first delta lands on 16, then a
                    # delta of 0 ends the run (nextScale==0 freezes).
                    w.se(8)
                    w.se(-16)
                else:
                    w.u(0, 1)
    w.ue(4)  # log2_max_frame_num_minus4 -> 256 frame numbers
    w.ue(pic_order_cnt_type)
    if pic_order_cnt_type == 0:
        w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    elif pic_order_cnt_type == 1:
        w.u(0, 1)  # delta_pic_order_always_zero_flag
        w.se(0)  # offset_for_non_ref_pic
        w.se(0)  # offset_for_top_to_bottom_field
        w.ue(len(poc_cycle_offsets))
        for off in poc_cycle_offsets:
            w.se(off)
    w.ue(max_num_ref_frames)
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)
    w.ue(map_h - 1)
    w.u(fmof, 1)
    if not frame_mbs_only:
        w.u(0, 1)  # mb_adaptive_frame_field_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    if pad_x or pad_y:
        w.u(1, 1)  # frame_cropping_flag
        w.ue(0)  # left
        w.ue(pad_x // cux)  # right
        w.ue(0)  # top
        w.ue(pad_y // cuy)  # bottom
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    # NAL header: forbidden_zero=0, nal_ref_idc=3, nal_unit_type=7.
    return bytes([0x67]) + _ebsp(w.rbsp())


def _skip_scaling_list(r: _BitReader, size: int) -> None:
    """scaling_list() (§7.3.2.1.1.1) - values discarded, bit cursor
    advanced exactly."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        if nxt != 0:
            last = nxt


def parse_sps(nal: bytes) -> dict:
    """Parse one SPS NAL unit -> metadata dict. Field names follow the
    spec; ``width``/``height`` are the cropped display dimensions."""
    if not nal:
        raise H264Error("empty NAL")
    if nal[0] & 0x80:
        raise H264Error("forbidden_zero_bit set")
    if nal[0] & 0x1F != 7:
        raise H264Error(f"not an SPS NAL (type {nal[0] & 0x1F})")
    r = _BitReader(_rbsp(nal[1:]))
    profile_idc = r.u(8)
    constraint_flags = r.u(8) >> 2
    level_idc = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    separate_colour_plane = False
    bit_depth = 8
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc > 3:
            raise H264Error(f"chroma_format_idc {chroma_format_idc} > 3")
        if chroma_format_idc == 3:
            separate_colour_plane = bool(r.u(1))
        bit_depth = r.ue() + 8
        bit_depth_chroma = r.ue() + 8
        if bit_depth != bit_depth_chroma:
            # legal but rare; surface the luma depth, keep parsing
            pass
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            n_lists = 12 if chroma_format_idc == 3 else 8
            for i in range(n_lists):
                if r.u(1):
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    elif poc_type > 2:
        raise H264Error(f"pic_order_cnt_type {poc_type} > 2")
    max_num_ref_frames = r.ue()
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    mb_w = r.ue() + 1
    map_h = r.ue() + 1
    fmof = r.u(1)
    if not fmof:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    chroma_array_type = 0 if separate_colour_plane else chroma_format_idc
    if chroma_array_type == 0:
        cux, cuy = 1, 2 - fmof
    else:
        sw, sh = _SUB_WH[chroma_array_type]
        cux, cuy = sw, sh * (2 - fmof)
    width = mb_w * 16 - cux * (crop_l + crop_r)
    height = (2 - fmof) * map_h * 16 - cuy * (crop_t + crop_b)
    if width <= 0 or height <= 0:
        raise H264Error(f"cropping exceeds coded size ({width}x{height})")
    return {
        "profile_idc": profile_idc,
        "profile": _PROFILE_NAMES.get(profile_idc, f"profile_{profile_idc}"),
        "constraint_flags": constraint_flags,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "bit_depth": bit_depth,
        "width": width,
        "height": height,
        "interlaced": not fmof,
        "max_num_ref_frames": max_num_ref_frames,
        "pic_order_cnt_type": poc_type,
        # coded grid + pixel crop offsets, consumed by the I-slice
        # decoder (operators.h264_decode); display w/h above stay the
        # h264_meta output surface
        "mb_width": mb_w,
        "mb_height": (2 - fmof) * map_h,
        "crop_left_px": cux * crop_l,
        "crop_top_px": cuy * crop_t,
        "log2_max_frame_num": log2_max_frame_num,
        "log2_max_poc_lsb": log2_max_poc_lsb,
    }


def _minimal_pps(entropy_coding: int = 0, deblock_control: int = 0) -> bytes:
    """Minimal well-formed PPS NAL (§7.3.2.2): pps_id=0, sps_id=0,
    CAVLC (or CABAC with ``entropy_coding=1`` - used by the
    entropy-mode classification fixtures; the pixel decoder rejects
    it as a seam), one slice group, ref idx 0/0, all flags/deltas 0.
    The I-slice decoder in :mod:`operators.h264_decode` consumes the
    values this encodes (qp offsets, deblocking/constrained-intra
    flags)."""
    w = _BitWriter()
    w.ue(0)  # pic_parameter_set_id
    w.ue(0)  # seq_parameter_set_id
    w.u(entropy_coding & 1, 1)  # entropy_coding_mode_flag (§9: CABAC)
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(0, 3)  # weighted_pred_flag, weighted_bipred_idc(2)
    w.se(0)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    # deblocking_filter_control_present_flag (1 when slices code the
    # §7.3.3 idc/offset fields - r12 deblocking fixtures),
    # constrained_intra_pred_flag, redundant_pic_cnt_present_flag
    w.u(deblock_control & 1, 1)
    w.u(0, 2)
    return bytes([0x68]) + _ebsp(w.rbsp())


def parse_pps(nal: bytes) -> dict:
    """PPS NAL -> the §7.3.2.2 fields up to the trailing flag triple.
    The one consumer-critical field is ``entropy_coding_mode_flag``
    (CAVLC=0 / CABAC=1): real-world High-profile files (the Instagram
    ``.mp4``s the reference stores, s3-to-es_aws.py:101-122) are
    overwhelmingly CABAC, which the pixel decoder must REJECT cleanly
    rather than mis-parse as CAVLC bits (VERDICT r11 item 4). FMO
    (num_slice_groups > 1) raises - no fixture nor the decoder
    supports slice groups."""
    if (nal[0] & 0x1F) != 8:
        raise H264Error(f"not a PPS NAL (type {nal[0] & 0x1F})")
    r = _BitReader(_rbsp(nal[1:]))
    out = {
        "pps_id": r.ue(),
        "sps_id": r.ue(),
        "entropy_coding_mode_flag": r.u(1),
        "bottom_field_pic_order_present": r.u(1),
    }
    n_groups = r.ue() + 1
    if n_groups != 1:
        raise H264Error(f"FMO slice groups unsupported ({n_groups})")
    out["num_ref_idx_l0_default"] = r.ue() + 1
    out["num_ref_idx_l1_default"] = r.ue() + 1
    out["weighted_pred_flag"] = r.u(1)
    out["weighted_bipred_idc"] = r.u(2)
    out["pic_init_qp"] = 26 + r.se()
    out["pic_init_qs"] = 26 + r.se()
    out["chroma_qp_index_offset"] = r.se()
    out["deblocking_filter_control_present_flag"] = r.u(1)
    out["constrained_intra_pred_flag"] = r.u(1)
    out["redundant_pic_cnt_present_flag"] = r.u(1)
    return out


def _classify_entropy(pps_nals: list[bytes]) -> "str | None":
    """CAVLC/CABAC routing label from the first PPS, or None when no
    PPS is available OR the PPS parser refuses the stream (FMO etc.):
    the metadata path exists to ROUTE files the pixel decoder can't
    handle, so a parse failure here must classify as unknown, not
    propagate (ADVICE r12, h264.py:654)."""
    if not pps_nals:
        return None
    try:
        flag = parse_pps(pps_nals[0])["entropy_coding_mode_flag"]
    except H264Error:
        return None
    return "cabac" if flag else "cavlc"


# --- avcC (AVCDecoderConfigurationRecord) ------------------------------------


def make_avcc(sps_nals: list[bytes], pps_nals: list[bytes] | None = None,
              nal_length_size: int = 4) -> bytes:
    """AVCDecoderConfigurationRecord (14496-15 §5.3.3.1). Profile /
    compat / level bytes are copied from the first SPS as the spec
    requires."""
    if pps_nals is None:
        pps_nals = [_minimal_pps()]
    head = sps_nals[0][1:4] if sps_nals else b"\x42\x00\x1e"
    out = bytearray()
    out.append(1)  # configurationVersion
    out += head  # AVCProfileIndication, profile_compatibility, level
    out.append(0xFC | (nal_length_size - 1))
    out.append(0xE0 | len(sps_nals))
    for nal in sps_nals:
        out += struct.pack(">H", len(nal)) + nal
    out.append(len(pps_nals))
    for nal in pps_nals:
        out += struct.pack(">H", len(nal)) + nal
    return bytes(out)


def parse_avcc(buf: bytes) -> dict:
    """avcC payload -> record fields + the raw SPS/PPS NAL lists."""
    if len(buf) < 7:
        raise H264Error("avcC shorter than fixed header")
    if buf[0] != 1:
        raise H264Error(f"avcC configurationVersion {buf[0]} != 1")
    nal_length_size = (buf[4] & 0x03) + 1
    n_sps = buf[5] & 0x1F
    pos = 6
    sps: list[bytes] = []
    for _ in range(n_sps):
        if pos + 2 > len(buf):
            raise H264Error("avcC truncated in SPS list")
        ln = struct.unpack_from(">H", buf, pos)[0]
        pos += 2
        if pos + ln > len(buf):
            raise H264Error("avcC SPS overruns record")
        sps.append(buf[pos : pos + ln])
        pos += ln
    if pos >= len(buf):
        raise H264Error("avcC truncated before PPS count")
    n_pps = buf[pos]
    pos += 1
    pps: list[bytes] = []
    for _ in range(n_pps):
        if pos + 2 > len(buf):
            raise H264Error("avcC truncated in PPS list")
        ln = struct.unpack_from(">H", buf, pos)[0]
        pos += 2
        if pos + ln > len(buf):
            raise H264Error("avcC PPS overruns record")
        pps.append(buf[pos : pos + ln])
        pos += ln
    return {
        "profile_idc": buf[1],
        "profile_compat": buf[2],
        "level_idc": buf[3],
        "nal_length_size": nal_length_size,
        "sps": sps,
        "pps": pps,
    }


# --- ISO BMFF plumbing: avc1 sample entry + minimal container ---------------


def make_avc_mp4(sps_nal: bytes, coded_w: int, coded_h: int,
                 fourcc: bytes = b"avc1", include_sps: bool = True,
                 pps_nal: "bytes | None" = None) -> bytes:
    """Minimal ISO BMFF with an AVC video track: ftyp + moov(mvhd,
    trak(tkhd, mdia(mdhd, hdlr, minf(stbl(stsd(avc1(avcC))))))) +
    empty mdat. ``include_sps=False`` models the ``avc3`` in-band
    parameter-set layout (empty SPS list in avcC); ``pps_nal``
    overrides the default CAVLC `_minimal_pps` (the CABAC
    classification fixture injects an entropy_coding=1 PPS)."""
    avcc = make_avcc(
        [sps_nal] if include_sps else [],
        pps_nals=(
            [pps_nal] if pps_nal is not None
            else None if include_sps else []
        ),
    )
    # VisualSampleEntry fixed fields (14496-12 §12.1.3.2): 78 bytes.
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_index
        + b"\x00" * 16  # pre_defined/reserved/pre_defined[3]
        + struct.pack(">HH", coded_w, coded_h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 0x0018, -1)  # depth, pre_defined
        + _box(b"avcC", avcc)
    )
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + _box(fourcc, entry))
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdhd = _box(
        b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, 90000, 90000, 0x55C4, 0)
    )
    hdlr = _box(
        b"hdlr", struct.pack(">B3xI", 0, 0) + b"vide" + b"\x00" * 12 + b"v\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3xIIIII", 0, 0, 0, 1, 0, 1000)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", coded_w << 16, coded_h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, 1000, 1000)
        + struct.pack(">iH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    return ftyp + moov + _box(b"mdat", b"")


def _find_stsd_entry(payload: bytes) -> tuple[bytes, bytes]:
    """Walk to the FIRST video track's stsd -> (fourcc, entry body
    past the 78 VisualSampleEntry bytes, i.e. the child-box region)."""

    def find(body: bytes, kind: bytes) -> bytes | None:
        for k, p, _ in _children_at(body):
            if k == kind:
                return p
        return None

    moov = find(payload, b"moov")
    if moov is None:
        raise H264Error("no moov box")
    for k, trak, _ in _children_at(moov):
        if k != b"trak":
            continue
        mdia = find(trak, b"mdia")
        if mdia is None:
            continue
        hdlr = find(mdia, b"hdlr")
        if hdlr is None or hdlr[8:12] != b"vide":
            continue
        minf = find(mdia, b"minf")
        stbl = find(minf, b"stbl") if minf is not None else None
        stsd = find(stbl, b"stsd") if stbl is not None else None
        if stsd is None or len(stsd) < 16:
            raise H264Error("video track without stsd")
        # stsd: version/flags + entry_count, then the first entry box
        size = struct.unpack_from(">I", stsd, 8)[0]
        fourcc = stsd[12:16]
        entry = stsd[16 : 8 + size]
        return fourcc, entry
    raise H264Error("no video track")


def h264_meta(payload: bytes) -> dict:
    """ISO BMFF bytes -> H.264 configuration metadata of the first
    video track. ``note`` is 'ok', or 'no-sps-in-avcC' for in-band
    (avc3-style) files where only record-level fields are known."""
    fourcc, entry = _find_stsd_entry(payload)
    if fourcc not in (b"avc1", b"avc3"):
        raise H264Error(f"not an AVC sample entry: {fourcc!r}")
    if len(entry) < 78:
        raise H264Error("VisualSampleEntry shorter than 78 bytes")
    avcc = None
    for k, p, _ in _children_at(entry[78:]):
        if k == b"avcC":
            avcc = p
            break
    if avcc is None:
        raise H264Error("AVC sample entry without avcC box")
    rec = parse_avcc(avcc)
    base = {
        "codec": fourcc.decode(),
        "nal_length_size": rec["nal_length_size"],
        "n_sps": len(rec["sps"]),
        "n_pps": len(rec["pps"]),
        # CAVLC/CABAC classification (VERDICT r11 item 4): the meta
        # path must tell a curation pipeline which files the pixel
        # path can decode vs which hit a seam - None for in-band
        # (avc3) files that ship no PPS in avcC, and None for PPSes
        # the parser itself refuses (e.g. FMO, num_slice_groups > 1):
        # those are valid H.264, and the meta/routing path must
        # classify them, not throw (ADVICE r12).
        "entropy_coding": _classify_entropy(rec["pps"]),
    }
    if not rec["sps"]:
        return {
            **base,
            "profile": _PROFILE_NAMES.get(
                rec["profile_idc"], f"profile_{rec['profile_idc']}"
            ),
            "level_idc": rec["level_idc"],
            "chroma_format_idc": None,
            "bit_depth": None,
            "width": None,
            "height": None,
            "interlaced": None,
            "max_num_ref_frames": None,
            "note": "no-sps-in-avcC",
        }
    sps = parse_sps(rec["sps"][0])
    if sps["profile_idc"] != rec["profile_idc"]:
        raise H264Error(
            f"avcC profile {rec['profile_idc']} != SPS {sps['profile_idc']}"
        )
    return {
        **base,
        "profile": sps["profile"],
        "level_idc": sps["level_idc"],
        "chroma_format_idc": sps["chroma_format_idc"],
        "bit_depth": sps["bit_depth"],
        "width": sps["width"],
        "height": sps["height"],
        "interlaced": sps["interlaced"],
        "max_num_ref_frames": sps["max_num_ref_frames"],
        "note": "ok",
    }


# --- fixtures + registry query ----------------------------------------------


#: (name, payload, expected metadata). Expected values are written BY
#: HAND from the construction parameters (profile/level/chroma/crop
#: arithmetic per the spec) so the oracle is independent of parser
#: bugs: `_h264_oracle` asserts `h264_meta(payload) == expected` at
#: build time and a drift in either builder or parser breaks the hash.
def _h264_fixtures() -> list[tuple[str, bytes, dict]]:
    """Deterministic fixture store covering every parser branch:
    baseline/main (no chroma block), high 4:2:0 with 1080 crop,
    High10 10-bit, High444 with unit crops, monochrome, interlaced,
    scaling-matrix skip, poc_type=1 cycle (crafted to force an
    emulation-prevention byte), and an avc3 in-band file."""
    fx: list[tuple[str, bytes, dict]] = []

    def add(name: str, sps: bytes, w: int, h: int, expect: dict,
            fourcc: bytes = b"avc1", include_sps: bool = True,
            pps_nal: "bytes | None" = None) -> None:
        full = {
            "codec": fourcc.decode(), "nal_length_size": 4,
            "n_sps": 1 if include_sps else 0,
            "n_pps": 1 if include_sps else 0,
            "interlaced": False, "max_num_ref_frames": 1,
            "chroma_format_idc": 1, "bit_depth": 8, "note": "ok",
            "entropy_coding": (
                "cavlc" if include_sps or pps_nal is not None else None
            ),
            **expect,
        }
        fx.append((
            name,
            make_avc_mp4(sps, w, h, fourcc, include_sps, pps_nal=pps_nal),
            full,
        ))

    add("baseline_640x360.mp4", make_sps(640, 360, 66, 30), 640, 368,
        {"profile": "baseline", "level_idc": 30, "width": 640,
         "height": 360})
    add("main_1280x720.mp4",
        make_sps(1280, 720, 77, 31, max_num_ref_frames=4), 1280, 720,
        {"profile": "main", "level_idc": 31, "width": 1280, "height": 720,
         "max_num_ref_frames": 4})
    add("high_1920x1080.mp4",
        make_sps(1920, 1080, 100, 40, max_num_ref_frames=4), 1920, 1088,
        {"profile": "high", "level_idc": 40, "width": 1920, "height": 1080,
         "max_num_ref_frames": 4})
    add("high10_3840x2160.mp4",
        make_sps(3840, 2160, 110, 51, bit_depth=10), 3840, 2160,
        {"profile": "high10", "level_idc": 51, "width": 3840,
         "height": 2160, "bit_depth": 10})
    add("high444_1919x1079.mp4",
        make_sps(1919, 1079, 244, 50, chroma_format_idc=3), 1920, 1088,
        {"profile": "high444", "level_idc": 50, "width": 1919,
         "height": 1079, "chroma_format_idc": 3})
    add("mono_512x512.mp4",
        make_sps(512, 512, 100, 32, chroma_format_idc=0), 512, 512,
        {"profile": "high", "level_idc": 32, "width": 512, "height": 512,
         "chroma_format_idc": 0})
    add("interlaced_720x576.mp4",
        make_sps(720, 576, 77, 30, frame_mbs_only=False), 720, 576,
        {"profile": "main", "level_idc": 30, "width": 720, "height": 576,
         "interlaced": True})
    add("scaling_1280x544.mp4",
        make_sps(1280, 544, 100, 41, scaling_matrix=True), 1280, 544,
        {"profile": "high", "level_idc": 41, "width": 1280, "height": 544})
    # poc_type=1 with offset_for_ref_frame values of 16384: each
    # se(16384) codes as ue(32767) = 15 zeros + '1' + 15 zeros, and
    # two adjacent ones align a >=16-bit zero run on byte boundaries -
    # the 0x00 0x00 pair that REQUIRES the 0x03 escape. Asserted to
    # actually fire in tests/test_h264.py.
    add("poc1_320x240.mp4",
        make_sps(320, 240, 77, 21, pic_order_cnt_type=1,
                 poc_cycle_offsets=(16384,) * 4), 320, 240,
        {"profile": "main", "level_idc": 21, "width": 320, "height": 240})
    # CABAC classification fixture (VERDICT r11 item 4): a High
    # profile file with entropy_coding_mode_flag=1 - the shape of a
    # real Instagram-style .mp4. The meta path classifies it; the
    # pixel path (decode_frames) must REJECT it with the seam message,
    # never mis-decode its bits as CAVLC.
    add("cabac_high_1280x720.mp4",
        make_sps(1280, 720, 100, 31, max_num_ref_frames=4), 1280, 720,
        {"profile": "high", "level_idc": 31, "width": 1280,
         "height": 720, "max_num_ref_frames": 4,
         "entropy_coding": "cabac"},
        pps_nal=_minimal_pps(entropy_coding=1))
    add("inband_avc3.mp4",
        make_sps(16, 16, 66, 10), 16, 16,
        {"profile": "baseline", "level_idc": 30, "width": None,
         "height": None, "chroma_format_idc": None, "bit_depth": None,
         "interlaced": None, "max_num_ref_frames": None,
         "entropy_coding": None, "note": "no-sps-in-avcC"},
        fourcc=b"avc3", include_sps=False)
    # FMO fixture (ADVICE r12): num_slice_groups > 1 is valid H.264
    # the PPS parser refuses; the META path must still return a row,
    # with entropy_coding classified as unknown (None), because its
    # whole purpose is ROUTING files the pixel decoder can't handle.
    fmo = _BitWriter()
    fmo.ue(0)  # pps_id
    fmo.ue(0)  # sps_id
    fmo.u(0, 1)  # entropy_coding_mode_flag
    fmo.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    fmo.ue(1)  # num_slice_groups_minus1 = 1 -> FMO
    fmo.ue(6)  # slice_group_map_type: explicit assignment
    add("fmo_640x360.mp4",
        make_sps(640, 360, 66, 30), 640, 368,
        {"profile": "baseline", "level_idc": 30, "width": 640,
         "height": 360, "entropy_coding": None},
        pps_nal=bytes([0x68]) + _ebsp(fmo.rbsp()))
    return fx


def _stage_h264_store(root: str) -> None:
    for name, payload, _expect in _h264_fixtures():
        with open(os.path.join(root, name), "wb") as f:
            f.write(payload)


_SCHEMA = (
    "video_name string, codec string, profile string, level_idc int, "
    "chroma_format_idc int, bit_depth int, width int, height int, "
    "interlaced boolean, ref_frames int, nal_length_size int, "
    "entropy_coding string, note string"
)


def h264_meta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: staged AVC store -> binaryFile -> mapInPandas
    -> one codec-configuration row per file. Same zero-shuffle shape
    as mp4_meta_query; payload bytes stay executor-side."""
    # driver-local staging: test scaffolding only (FIXTURES.md §6) -
    # multi-node clusters stage fixtures to shared storage first.
    work = tempfile.mkdtemp(prefix="h264_store_")
    try:
        _stage_h264_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("video_name"),
            F.col("content").alias("payload"),
        )

        def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out: list[dict] = []
                for name, p in zip(pdf["video_name"], pdf["payload"]):
                    m = h264_meta(bytes(p))
                    out.append(
                        {
                            "video_name": name,
                            "codec": m["codec"],
                            "profile": m["profile"],
                            "level_idc": m["level_idc"],
                            "chroma_format_idc": m["chroma_format_idc"],
                            "bit_depth": m["bit_depth"],
                            "width": m["width"],
                            "height": m["height"],
                            "interlaced": m["interlaced"],
                            "ref_frames": m["max_num_ref_frames"],
                            "nal_length_size": m["nal_length_size"],
                            "entropy_coding": m["entropy_coding"],
                            "note": m["note"],
                        }
                    )
                yield pd.DataFrame(out)

        out = bin_df.mapInPandas(parse_batches, _SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _h264_oracle() -> str:
    """Closed-form VALUES oracle from the HAND-WRITTEN expected rows;
    the parser is asserted to agree over the exact fixture bytes at
    oracle-build time, so builder and parser cross-check each other."""
    rows = []
    for name, payload, expect in _h264_fixtures():
        m = h264_meta(payload)
        for key, want in expect.items():
            if m[key] != want:
                raise AssertionError(
                    f"{name}: parsed {key}={m[key]!r}, expected {want!r}"
                )

        def lit(v) -> str:
            if v is None:
                return "NULL"
            if isinstance(v, bool):
                return "TRUE" if v else "FALSE"
            if isinstance(v, str):
                return f"'{v}'"
            return str(v)

        rows.append(
            "(" + ", ".join(
                lit(v)
                for v in (
                    name, m["codec"], m["profile"], m["level_idc"],
                    m["chroma_format_idc"], m["bit_depth"], m["width"],
                    m["height"], m["interlaced"],
                    m["max_num_ref_frames"], m["nal_length_size"],
                    m["entropy_coding"], m["note"],
                )
            ) + ")"
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(video_name, codec, profile, level_idc, chroma_format_idc, "
        "bit_depth, width, height, interlaced, ref_frames, "
        "nal_length_size, entropy_coding, note)"
    )


H264_META_ORACLE_SQL = _h264_oracle()


# --- NAL census: per-video frame-type / keyframe / GOP statistics -----------
#
# Reference parity: the reference pipeline stores Instagram ``.mp4``
# originals (s3Posts-to-es_aws.py:101-122) whose tracks are H.264; a
# curation pipeline needs keyframe density and GOP structure (thumbnail
# extraction cost, seekability, re-encode need) WITHOUT decoding
# pictures. Everything below stops at the slice HEADER - the first two
# Exp-Golomb fields (§7.3.3: first_mb_in_slice, slice_type) - which is
# deterministic and spec-complete; no pixel decode is attempted.

#: slice_type (§7.4.3 table 7-6) -> frame kind. Codes 5-9 are the
#: "all slices in this picture share this type" variants of 0-4. SP/SI
#: switching pictures are the streaming-switch variants of P/I and are
#: folded into those buckets.
_SLICE_KIND = {0: "P", 1: "B", 2: "I", 3: "P", 4: "I"}


def make_slice_nal(
    code: int, idr: bool = False, pad: int = 0, seed: int = 1,
    zero_run: bool = False,
) -> bytes:
    """One slice NAL unit: header byte (nal_ref_idc=3, type 5 for IDR
    else 1), then slice-header fields per §7.3.3 (first_mb_in_slice=0,
    slice_type=``code``, pps_id=0, 8-bit frame_num, idr_pic_id when
    IDR) followed by ``pad`` bytes of LCG filler standing in for slice
    data. ``zero_run=True`` appends 32 zero bits, which guarantees at
    least three consecutive 0x00 bytes in the RBSP at any bit
    alignment - forcing the §7.4.1 emulation-prevention escape."""
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(code)  # slice_type
    w.ue(0)  # pic_parameter_set_id
    w.u(seed & 0xFF, 8)  # frame_num (log2_max_frame_num = 8 in our SPS)
    if idr:
        w.ue(0)  # idr_pic_id
    x = seed * 2 + 1
    for _ in range(pad):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        w.u((x >> 16) & 0xFF, 8)
    if zero_run:
        w.u(0, 32)
    return bytes([0x65 if idr else 0x41]) + _ebsp(w.rbsp())


def make_sei_nal(n: int = 4) -> bytes:
    """SEI NAL (type 6) with one user-data payload of ``n`` bytes."""
    w = _BitWriter()
    w.u(5, 8)  # payloadType: user_data_unregistered
    w.u(n, 8)  # payloadSize
    for i in range(n):
        w.u((i * 37 + 11) & 0xFF, 8)
    return bytes([0x06]) + _ebsp(w.rbsp())


def make_aud_nal() -> bytes:
    """Access-unit delimiter (type 9): primary_pic_type only."""
    w = _BitWriter()
    w.u(0, 3)
    return bytes([0x09]) + _ebsp(w.rbsp())


def make_avc_stream_mp4(
    sps_nal: bytes,
    sample_nals: list[list[bytes]],
    coded_w: int,
    coded_h: int,
    fragmented: bool = False,
    nal_length_size: int = 4,
    frames_per_frag: int = 3,
    pps_nal: "bytes | None" = None,
) -> bytes:
    """ISO BMFF file whose mdat carries real AVC samples: each sample
    (access unit) is the concatenation of ``nal_length_size``-prefixed
    NAL units per 14496-15 §5.3.4.2. Classic layout gets true
    stts/stsc/stsz/stco tables; fragmented gets moof/traf/trun pairs -
    both via the shared builders in :mod:`operators.mp4`."""
    avcc = make_avcc(
        [sps_nal],
        [pps_nal if pps_nal is not None else _minimal_pps()],
        nal_length_size=nal_length_size,
    )
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", coded_w, coded_h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 0x0018, -1)
        + _box(b"avcC", avcc)
    )
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + _box(b"avc1", entry))
    samples = [
        b"".join(len(nal).to_bytes(nal_length_size, "big") + nal
                 for nal in nals)
        for nals in sample_nals
    ]
    if fragmented:
        return _build_fmp4(
            stsd, samples, coded_w, coded_h, 90000, 3000, frames_per_frag,
            use_mehd=True,
        )
    return _build_classic_mp4(stsd, samples, coded_w, coded_h, 90000, 3000)


def split_sample_nals(sample: bytes, length_size: int) -> list[bytes]:
    """Split one AVC sample into NAL units by its length prefixes."""
    out: list[bytes] = []
    pos = 0
    n = len(sample)
    while pos < n:
        if pos + length_size > n:
            raise H264Error("truncated NAL length prefix")
        ln = int.from_bytes(sample[pos : pos + length_size], "big")
        pos += length_size
        if ln == 0 or pos + ln > n:
            raise H264Error("NAL unit overruns sample")
        out.append(sample[pos : pos + ln])
        pos += ln
    return out


def parse_slice_kind(nal: bytes) -> str:
    """Frame kind ('I'/'P'/'B') from a coded-slice NAL's header: skip
    first_mb_in_slice, read slice_type (§7.3.3), fold per
    ``_SLICE_KIND``."""
    r = _BitReader(_rbsp(nal[1:]))
    r.ue()  # first_mb_in_slice
    code = r.ue()
    if code > 9:
        raise H264Error(f"slice_type {code} > 9")
    return _SLICE_KIND[code % 5]


def h264_nal_census(payload: bytes) -> dict:
    """ISO BMFF bytes -> NAL/frame census of the first video track.

    Walks the sample table (classic stbl or moof/traf/trun fragments,
    via :func:`operators.mp4.mp4_sample_table`), splits every sample
    into length-prefixed NAL units using the avcC record's
    lengthSizeMinusOne, classifies frames from slice headers, and
    reports keyframe (IDR) density and the maximum GOP length in
    samples. ``max_gop`` is the largest gap between consecutive IDR
    samples, counting the tail after the last IDR; a file with no IDR
    at all spans one open GOP of ``n_samples``."""
    fourcc, entry = _find_stsd_entry(payload)
    if fourcc not in (b"avc1", b"avc3"):
        raise H264Error(f"not an AVC sample entry: {fourcc!r}")
    avcc = None
    for k, p, _ in _children_at(entry[78:]):
        if k == b"avcC":
            avcc = p
            break
    if avcc is None:
        raise H264Error("AVC sample entry without avcC box")
    length_size = parse_avcc(avcc)["nal_length_size"]
    layout = "classic"
    for k, _, _ in _children_at(payload):
        if k == b"moof":
            layout = "fragmented"
            break
    _, table = mp4_sample_table(payload)
    frames = {"I": 0, "P": 0, "B": 0}
    n_sei = n_aud = n_param = n_nals = 0
    nal_bytes = 0
    keyframe_at: list[int] = []
    for idx, (off, size) in enumerate(table):
        nals = split_sample_nals(payload[off : off + size], length_size)
        kind = None
        idr = False
        for nal in nals:
            n_nals += 1
            nal_bytes += len(nal)
            ntype = nal[0] & 0x1F
            if ntype in (1, 5):
                if kind is None:
                    kind = parse_slice_kind(nal)
                idr = idr or ntype == 5
            elif ntype == 6:
                n_sei += 1
            elif ntype == 9:
                n_aud += 1
            elif ntype in (7, 8):
                n_param += 1
            else:
                raise H264Error(f"unexpected NAL type {ntype}")
        if kind is None:
            raise H264Error(f"sample {idx} carries no coded slice")
        frames[kind] += 1
        if idr:
            keyframe_at.append(idx)
    n_samples = len(table)
    if not keyframe_at:
        max_gop = n_samples
    else:
        gaps = [
            b - a for a, b in zip(keyframe_at, keyframe_at[1:])
        ] + [n_samples - keyframe_at[-1]]
        max_gop = max(gaps)
    return {
        "layout": layout,
        "nal_length_size": length_size,
        "n_samples": n_samples,
        "n_keyframes": len(keyframe_at),
        "n_i": frames["I"],
        "n_p": frames["P"],
        "n_b": frames["B"],
        "n_sei": n_sei,
        "n_aud": n_aud,
        "n_param": n_param,
        "n_nals": n_nals,
        "nal_bytes": nal_bytes,
        "max_gop": max_gop,
    }


#: Fixture spec: (name, fragmented, nal_length_size, samples) where
#: each sample is a list of NAL descriptors -
#:   ("slice", wire_code, idr, pad, zero_run) with the EXPECTED frame
#:   kind written next to it by hand, ("sei", n), ("aud",), ("sps",),
#:   ("pps",). Expected census values are derived from these
#: descriptors by plain arithmetic in `_census_expected` - never by
#: running the parser - so builder and parser cross-check each other
#: through the container round-trip.
def _census_fixtures() -> list[tuple[str, bool, int, list[list[tuple]]]]:
    def slc(kind: str, code: int, idr: bool = False, pad: int = 0,
            zero: bool = False) -> tuple:
        return ("slice", kind, code, idr, pad, zero)

    fx: list[tuple[str, bool, int, list[list[tuple]]]] = []

    # 1. all-IDR classic (intra-only screen-capture style), gop 1
    fx.append((
        "classic_all_idr.mp4", False, 4,
        [[slc("I", 7, idr=True, pad=5 + i)] for i in range(8)],
    ))
    # 2. closed-GOP IPPP x3 (IDR every 4), AUD-prefixed samples
    fx.append((
        "classic_ippp.mp4", False, 4,
        [
            [("aud",)] + (
                [slc("I", 2, idr=True, pad=9 + i)]
                if i % 4 == 0 else [slc("P", 0, pad=3 + i)]
            )
            for i in range(12)
        ],
    ))
    # 3. one IDR then IBBP..., SEI on the keyframe, B via code 6
    fx.append((
        "classic_ibbp.mp4", False, 4,
        [[("sei", 6), slc("I", 7, idr=True, pad=12)]]
        + [
            [slc("B", 6, pad=2 + i)] if i % 3 else [slc("P", 5, pad=4 + i)]
            for i in range(1, 9)
        ],
    ))
    # 4. open GOP: non-IDR I-frames (type-1 NAL, I slice_type) - the
    #    recovery-point layout; only sample 0 is a true IDR
    fx.append((
        "classic_open_gop.mp4", False, 4,
        [[slc("I", 2, idr=True, pad=8)]]
        + [
            [slc("I", 2, pad=6)] if i == 5 else [slc("P", 0, pad=2 + i)]
            for i in range(1, 10)
        ],
    ))
    # 5. in-band parameter sets repeated at each IDR (broadcast style)
    fx.append((
        "classic_inband_ps.mp4", False, 4,
        [
            [("sps",), ("pps",), ("sei", 3), slc("I", 7, idr=True, pad=7)]
            if i % 5 == 0 else [slc("P", 5, pad=1 + i)]
            for i in range(10)
        ],
    ))
    # 6. fragmented IPPPP x2 (DASH segment layout), 3 samples per frag
    fx.append((
        "frag_ippp.mp4", True, 4,
        [
            [slc("I", 2, idr=True, pad=10)] if i % 5 == 0
            else [slc("P", 0, pad=3 + i)]
            for i in range(10)
        ],
    ))
    # 7. fragmented all-IDR, AUD per access unit
    fx.append((
        "frag_all_idr.mp4", True, 4,
        [[("aud",), slc("I", 7, idr=True, pad=4 + i)] for i in range(6)],
    ))
    # 8. 2-byte NAL length prefixes (low-latency recorder layout)
    fx.append((
        "classic_nal2.mp4", False, 2,
        [
            [slc("I", 2, idr=True, pad=5)] if i == 0
            else [slc("P", 0, pad=2 + i)]
            for i in range(6)
        ],
    ))
    # 9. emulation-prevention escape inside slice data (zero_run
    #    forces >=3 consecutive 0x00 RBSP bytes; asserted in tests)
    fx.append((
        "classic_emu.mp4", False, 4,
        [[slc("I", 7, idr=True, pad=6, zero=True)],
         [slc("P", 0, pad=6, zero=True)]],
    ))
    # 10. multi-slice access units (2 slice NALs per frame: the
    #     slice-per-tile encoder layout); SP/SI wire codes fold to P/I
    fx.append((
        "classic_multislice.mp4", False, 4,
        [
            [slc("I", 9, idr=True, pad=5), slc("I", 4, idr=True, pad=5)]
            if i == 0 else
            [slc("P", 3, pad=2 + i), slc("P", 8, pad=3 + i)]
            for i in range(7)
        ],
    ))
    return fx


def _census_nal(desc: tuple, seed: int):
    if desc[0] == "slice":
        _, _kind, code, idr, pad, zero = desc
        return make_slice_nal(code, idr=idr, pad=pad, seed=seed, zero_run=zero)
    if desc[0] == "sei":
        return make_sei_nal(desc[1])
    if desc[0] == "aud":
        return make_aud_nal()
    if desc[0] == "sps":
        return _CENSUS_SPS
    if desc[0] == "pps":
        return _minimal_pps()
    raise AssertionError(desc)


_CENSUS_SPS = make_sps(640, 360, 100, 31)


def _census_build(spec) -> bytes:
    name, fragmented, nls, samples = spec
    nals = [
        [_census_nal(d, seed=17 * si + ni + 1) for ni, d in enumerate(s)]
        for si, s in enumerate(samples)
    ]
    return make_avc_stream_mp4(
        _CENSUS_SPS, nals, 640, 368, fragmented=fragmented,
        nal_length_size=nls,
    )


def _census_expected(spec) -> dict:
    """Expected census row from the DESCRIPTORS (hand arithmetic over
    the spec, no parsing): frame kind is the hand-written kind of the
    first slice descriptor; keyframe = any idr flag; nal_bytes sums
    the BUILT NAL lengths (builder-derived, parser-independent)."""
    name, fragmented, nls, samples = spec
    frames = {"I": 0, "P": 0, "B": 0}
    n_sei = n_aud = n_param = n_nals = 0
    nal_bytes = 0
    keyframe_at = []
    for si, s in enumerate(samples):
        kinds = [d[1] for d in s if d[0] == "slice"]
        frames[kinds[0]] += 1
        if any(d[0] == "slice" and d[3] for d in s):
            keyframe_at.append(si)
        for ni, d in enumerate(s):
            n_nals += 1
            nal_bytes += len(_census_nal(d, seed=17 * si + ni + 1))
            if d[0] == "sei":
                n_sei += 1
            elif d[0] == "aud":
                n_aud += 1
            elif d[0] in ("sps", "pps"):
                n_param += 1
    n = len(samples)
    if not keyframe_at:
        max_gop = n
    else:
        max_gop = max(
            [b - a for a, b in zip(keyframe_at, keyframe_at[1:])]
            + [n - keyframe_at[-1]]
        )
    return {
        "video_name": name,
        "layout": "fragmented" if fragmented else "classic",
        "nal_length_size": nls,
        "n_samples": n,
        "n_keyframes": len(keyframe_at),
        "n_i": frames["I"],
        "n_p": frames["P"],
        "n_b": frames["B"],
        "n_sei": n_sei,
        "n_aud": n_aud,
        "n_param": n_param,
        "n_nals": n_nals,
        "nal_bytes": nal_bytes,
        "max_gop": max_gop,
    }


def _stage_census_store(root: str) -> None:
    for spec in _census_fixtures():
        with open(os.path.join(root, spec[0]), "wb") as f:
            f.write(_census_build(spec))


_CENSUS_SCHEMA = (
    "video_name string, layout string, nal_length_size int, "
    "n_samples int, n_keyframes int, n_i int, n_p int, n_b int, "
    "n_sei int, n_aud int, n_param int, n_nals int, nal_bytes bigint, "
    "max_gop int"
)

_CENSUS_COLS = [
    "video_name", "layout", "nal_length_size", "n_samples",
    "n_keyframes", "n_i", "n_p", "n_b", "n_sei", "n_aud", "n_param",
    "n_nals", "nal_bytes", "max_gop",
]


def h264_nal_census_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: staged AVC store -> binaryFile -> mapInPandas
    -> one census row per file. Zero-shuffle scan shape (same as
    mp4_meta/h264_meta); sample payloads stay executor-side and only
    the fixed-width census row crosses to the plan."""
    work = tempfile.mkdtemp(prefix="h264_census_")
    try:
        _stage_census_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("video_name"),
            F.col("content").alias("payload"),
        )

        def census_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out: list[dict] = []
                for name, p in zip(pdf["video_name"], pdf["payload"]):
                    m = h264_nal_census(bytes(p))
                    out.append({"video_name": name, **m})
                yield pd.DataFrame(out)[_CENSUS_COLS]

        out = bin_df.mapInPandas(census_batches, _CENSUS_SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _census_oracle() -> str:
    """Closed-form VALUES oracle from `_census_expected`'s spec
    arithmetic; the census parser is asserted to agree over the exact
    fixture bytes at oracle-build time."""
    rows = []
    for spec in _census_fixtures():
        want = _census_expected(spec)
        got = {"video_name": spec[0], **h264_nal_census(_census_build(spec))}
        if got != want:
            raise AssertionError(
                f"{spec[0]}: census {got!r} != expected {want!r}"
            )
        rows.append(
            "(" + ", ".join(
                f"'{v}'" if isinstance(v, str) else str(v)
                for v in (want[c] for c in _CENSUS_COLS)
            ) + ")"
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(" + ", ".join(_CENSUS_COLS) + ")"
    )


H264_NAL_CENSUS_ORACLE_SQL = _census_oracle()
