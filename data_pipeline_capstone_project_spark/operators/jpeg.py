"""Baseline JPEG (JFIF) through the multimodal path - the PNG story
(:mod:`.images`) extended to the reference's dominant format: its
image store is predominantly ``.jpg``
(``/root/reference/lambda/s3Posts-to-ES-lambda/s3-to-es_aws.py:92``),
decoded there with cv2 inside the grouped-map UDF
(``spark/spark_image.py:140-160``). This container has no image
library, but baseline JPEG needs nothing beyond numpy: FDCT/IDCT are
8x8 matrix products, Huffman coding is table-driven, and the JFIF
container is plain struct packing.

- :func:`make_jpeg`: encoder for baseline (SOF0) AND progressive
  (SOF2, libjpeg's canonical 10-scan simple-progression script with
  spectral selection, successive approximation and EOB runs), 4:4:4 /
  4:2:2 / 4:2:0 chroma layouts, optional restart intervals. The
  Huffman tables are SELF-DEFINED canonical tables (4-bit DC codes,
  8-bit AC codes) written into the DHT segment - every decoder reads
  its tables from the stream, so simple valid tables beat
  transcribing Annex K from memory; compression ratio is irrelevant
  for fixtures.
- :func:`jpeg_meta`: (width, height) from any SOFn frame header -
  the metadata-parse path used by ``decode_media_meta``; dims parse
  even for lossless/arithmetic streams whose pixel decode raises.
- :func:`jpeg_pixels`: full decoder - multi-scan marker parse,
  stream-defined DQT/DHT, bit-unstuffing, baseline per-MCU Huffman
  decode AND progressive DC/AC first+refinement scans (T.81 G.2) with
  EOB runs, arbitrary sampling factors (4:4:4, 4:2:0, 4:2:2, ...),
  restart markers, dequantize, dezigzag, float IDCT, triangle-filter
  chroma upsampling over the true sample extent (libjpeg's "fancy"
  kernel and border discipline), YCbCr->RGB. Only lossless /
  hierarchical / arithmetic-coded variants still raise (the honest
  seam, like non-truecolor PNG in :mod:`.images`) - ``jpeg_meta``
  still reads their dims.
- :func:`jpeg_decode_query`: registry entry - stages deterministic
  JPEG fixtures, decodes them BOTH ways (this codec via ``binaryFile``
  + Arrow-batched ``mapInPandas``; JVM ImageIO via ``format("image")``)
  and cross-checks. JPEG IDCTs are implementation-defined (libjpeg
  integer vs float paths differ in the last unit), so unlike the PNG
  twin the cross-check asserts a +-{TOL} per-channel bound rather than
  bit equality - the bound itself is the pinned, oracle-checked
  contract.

Scale: identical to the PNG path - binaryFile/image scans partition by
file, payloads stream through Arrow batches and never touch the
driver; the per-image decode is embarrassingly parallel.
"""

from __future__ import annotations

import os
import shutil
import struct
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- constants --------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
)  # scan position -> row-major block position

# Quantization: a uniform table of 4 keeps solid blocks EXACT through
# the DCT (orthonormal S(0,0) = 8*(v-128); 8/4 integral), which makes
# the solid-tile fixtures closed-form up to YCbCr rounding.
QTABLE_LUM = np.full(64, 4, dtype=np.int32)
QTABLE_CHROM = np.full(64, 4, dtype=np.int32)

# Canonical Huffman tables, self-defined: DC symbols 0..11 as 4-bit
# codes (12 of 16; all-ones stays unused), AC symbols as 8-bit codes
# (162 of 256). Valid prefix codes; written to DHT, read back by any
# baseline decoder.
DC_SYMBOLS = list(range(12))
AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]  # EOB, ZRL, then (run, size) for size 1..10

_DCT = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _DCT[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

TOL = 2  # max per-channel difference tolerated between decoders


def _canonical_codes(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    """All symbols at one code length -> {symbol: (code, length)}."""
    return {sym: (i, length) for i, sym in enumerate(symbols)}


DC_CODES = _canonical_codes(DC_SYMBOLS, 4)
AC_CODES = _canonical_codes(AC_SYMBOLS, 8)

# Progressive AC scans additionally need the end-of-band-run symbols
# (r<<4 for r = 1..14: EOBRUN lengths 2..32767); 176 symbols still fit
# one 8-bit canonical table.
PROG_AC_SYMBOLS = AC_SYMBOLS + [r << 4 for r in range(1, 15)]
PROG_AC_CODES = _canonical_codes(PROG_AC_SYMBOLS, 8)


# --- bit I/O ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)

    def emit_marker(self, byte2: int) -> None:
        """1-pad to the byte boundary (stuffing if the pad byte lands
        on 0xFF, as libjpeg's flush_bits does) and emit a raw marker
        into the entropy stream (RSTn)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, byte2])


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                # stuffed zero must follow inside entropy data
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("unexpected marker in entropy data")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker: discard bits to the byte boundary,
        skip any not-yet-consumed entropy bytes (the spec-legal
        1-padding can itself be a stuffed 0xFF 0x00 pair) and 0xFF
        fill bytes, then the two marker bytes - libjpeg's
        next_marker() discipline."""
        self.nbits = 0
        pos = self.pos
        while pos + 1 < len(self.data):
            if self.data[pos] != 0xFF:
                pos += 1  # leftover pad/data byte
            elif self.data[pos + 1] == 0x00:
                pos += 2  # stuffed data byte
            elif self.data[pos + 1] == 0xFF:
                pos += 1  # fill byte
            elif 0xD0 <= self.data[pos + 1] <= 0xD7:
                self.pos = pos + 2
                return
            else:
                break
        raise ValueError("expected restart marker")


# --- encoder ----------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y, cb, cr = planes[..., 0], planes[..., 1] - 128.0, planes[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_coef(w: _BitWriter, v: int, codes: dict, sym_high: int = 0) -> None:
    s = _size_cat(v)
    code, length = codes[(sym_high << 4) | s] if sym_high else codes[s]
    w.write(code, length)
    if s:
        amp = v if v >= 0 else v + (1 << s) - 1
        w.write(amp, s)


def _block_coefs(block: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """8x8 spatial block -> 64 quantized coefficients in zigzag order."""
    coefs = _DCT @ (block - 128.0) @ _DCT.T
    q = np.round(coefs.reshape(64)[ZIGZAG] / qtable).astype(np.int64)
    return q


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def _emit_block(writer: _BitWriter, q: np.ndarray, prev_dc: int) -> int:
    """Entropy-encode one quantized zigzag block; returns its DC for
    the next block's predictor."""
    _encode_coef(writer, int(q[0]) - prev_dc, DC_CODES)
    run = 0
    last_nz = max((i for i in range(1, 64) if q[i]), default=0)
    for i in range(1, last_nz + 1):
        if q[i] == 0:
            run += 1
            continue
        while run >= 16:
            code, length = AC_CODES[0xF0]
            writer.write(code, length)
            run -= 16
        _encode_coef(writer, int(q[i]), AC_CODES, sym_high=run)
        run = 0
    if last_nz < 63:
        code, length = AC_CODES[0x00]  # EOB
        writer.write(code, length)
    return int(q[0])


SAMPLINGS = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def make_jpeg(
    pixels: np.ndarray,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    interleave: bool = True,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as JFIF with stream-defined
    quant + Huffman tables. ``subsampling`` picks the chroma layout:
    "444" (the default; bit-stream unchanged from the 4:4:4-only
    encoder), "422", or "420" (2x2 box-mean chroma downsample, the
    layout real camera / CDN JPEGs overwhelmingly use).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every N MCUs (DC predictors reset), the error-resilience layout
    real encoders default to. ``progressive`` emits SOF2 with
    libjpeg's canonical 10-scan simple-progression script (spectral
    selection + successive approximation, EOB runs) instead of one
    baseline scan - LOSSLESSLY re-ordered: the decoded image is
    bit-identical to the baseline encoding of the same pixels.
    ``interleave=False`` (baseline only) emits three single-component
    scans instead of one interleaved scan, each walking that
    component's TRUE data-unit grid per T.81 A.2.2 - a spec-legal
    layout some encoders use; the coefficients (hence the decode) are
    bit-identical to the interleaved encoding of the same pixels."""
    samp = SAMPLINGS[subsampling]
    h, w = pixels.shape[:2]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    padded = np.pad(pixels, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded)

    planes = []
    for ci, (sh, sv) in enumerate(samp):
        plane = ycc[..., ci]
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            plane = plane.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        planes.append(plane)

    # Precompute per-component quantized coefficient arrays (zigzag
    # order): the baseline writer streams them in MCU order; the
    # progressive writer re-walks them once per scan.
    coef: list[np.ndarray] = []
    for ci, (sh, sv) in enumerate(samp):
        qt = QTABLE_LUM if ci == 0 else QTABLE_CHROM
        plane = planes[ci]
        by_n, bx_n = plane.shape[0] // 8, plane.shape[1] // 8
        arr = np.empty((by_n, bx_n, 64), dtype=np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                arr[by, bx] = _block_coefs(
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qt
                )
        coef.append(arr)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _marker(
        0xFFE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _marker(0xFFDB, bytes([0]) + bytes(QTABLE_LUM.tolist()))
    out += _marker(0xFFDB, bytes([1]) + bytes(QTABLE_CHROM.tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for (cid, qid), (sh, sv) in zip(((1, 0), (2, 1), (3, 1)), samp):
        sof += bytes([cid, (sh << 4) | sv, qid])
    out += _marker(0xFFC2 if progressive else 0xFFC0, sof)
    ac_codes = PROG_AC_CODES if progressive else AC_CODES
    out += _marker(0xFFC4, _dht(0, 0, DC_CODES))
    out += _marker(0xFFC4, _dht(1, 0, ac_codes))
    out += _marker(0xFFC4, _dht(0, 1, DC_CODES))
    out += _marker(0xFFC4, _dht(1, 1, ac_codes))
    if restart_interval:
        out += _marker(0xFFDD, struct.pack(">H", restart_interval))

    if progressive:
        for scan_comps, ss, se, ah, al, entropy in _progressive_scans(
            coef, samp, h, w, restart_interval
        ):
            sos = bytes([len(scan_comps)])
            for ci in scan_comps:
                sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
            sos += bytes([ss, se, (ah << 4) | al])
            out += _marker(0xFFDA, sos)
            out += entropy
        out += b"\xff\xd9"
        return bytes(out)

    if not interleave:
        # Three single-component baseline scans, each over that
        # component's true data-unit grid (never the MCU padding).
        for ci, (sh, sv) in enumerate(samp):
            rows = -(-(h * sv) // (vmax * 8))
            cols = -(-(w * sh) // (hmax * 8))
            writer = _BitWriter()
            prev, unit_n = 0, 0
            for by in range(rows):
                for bx in range(cols):
                    if (
                        restart_interval
                        and unit_n
                        and unit_n % restart_interval == 0
                    ):
                        writer.emit_marker(
                            0xD0 + (unit_n // restart_interval - 1) % 8
                        )
                        prev = 0
                    unit_n += 1
                    prev = _emit_block(writer, coef[ci][by, bx], prev)
            tid = 0x00 if ci == 0 else 0x11
            out += _marker(
                0xFFDA, bytes([1, ci + 1, tid]) + bytes([0, 63, 0])
            )
            out += writer.flush()
        out += b"\xff\xd9"
        return bytes(out)

    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    mcu_n = 0
    for my in range(ph // mcu_h):
        for mx in range(pw // mcu_w):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                writer.emit_marker(0xD0 + (mcu_n // restart_interval - 1) % 8)
                prev_dc = [0, 0, 0]
            mcu_n += 1
            for ci, (sh, sv) in enumerate(samp):
                for v in range(sv):
                    for hh in range(sh):
                        prev_dc[ci] = _emit_block(
                            writer, coef[ci][my * sv + v, mx * sh + hh],
                            prev_dc[ci],
                        )
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += _marker(0xFFDA, sos)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _dht(table_class: int, table_id: int, codes: dict) -> bytes:
    lengths = [0] * 16
    by_len: dict[int, list[int]] = {}
    for sym, (code, length) in codes.items():
        lengths[length - 1] += 1
        by_len.setdefault(length, []).append((code, sym))
    huffval = bytes(
        sym for length in sorted(by_len) for _, sym in sorted(by_len[length])
    )
    return bytes([(table_class << 4) | table_id]) + bytes(lengths) + huffval


# --- progressive encoder -----------------------------------------------------

# libjpeg's canonical "simple progression" scan script for 3-component
# YCbCr (jcparam.c) - the script real progressive JPEGs on the web
# overwhelmingly follow: coarse DC first, luma AC in two bands at
# reduced precision, chroma AC, then successive-approximation
# refinement passes down to full precision.
PROG_SCRIPT = (
    # (component indexes, Ss, Se, Ah, Al)
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def _flush_eobrun(
    w: _BitWriter, eobrun: int, pending: list[int], ac_codes: dict
) -> int:
    """Emit a pending end-of-band run (sym = nbits<<4 + extension
    bits), then any correction bits accumulated during the EOB'd
    blocks (refinement scans only). Returns the reset run (0)."""
    if eobrun:
        nb = eobrun.bit_length() - 1
        code, length = ac_codes[nb << 4]
        w.write(code, length)
        if nb:
            w.write(eobrun - (1 << nb), nb)
        for b in pending:
            w.write(b, 1)
        pending.clear()
    return 0


def _emit_ac_first_scan(
    arr: np.ndarray, rows: int, cols: int, ss: int, se: int, al: int,
    ri: int = 0,
) -> bytes:
    w = _BitWriter()
    eobrun = 0
    no_bits: list[int] = []
    unit = 0
    for by in range(rows):
        for bx in range(cols):
            if ri and unit and unit % ri == 0:
                eobrun = _flush_eobrun(w, eobrun, no_bits, PROG_AC_CODES)
                w.emit_marker(0xD0 + (unit // ri - 1) % 8)
            unit += 1
            block = arr[by, bx]
            vals = []
            for k in range(ss, se + 1):
                v = int(block[k])
                t = abs(v) >> al
                vals.append(t if v >= 0 else -t)
            last = max((i for i, v in enumerate(vals) if v), default=-1)
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(w, eobrun, no_bits, PROG_AC_CODES)
                continue
            eobrun = _flush_eobrun(w, eobrun, no_bits, PROG_AC_CODES)
            r = 0
            for i in range(last + 1):
                sv = vals[i]
                if sv == 0:
                    r += 1
                    continue
                while r > 15:
                    code, length = PROG_AC_CODES[0xF0]
                    w.write(code, length)
                    r -= 16
                s = abs(sv).bit_length()
                code, length = PROG_AC_CODES[(r << 4) | s]
                w.write(code, length)
                amp = sv if sv >= 0 else sv + (1 << s) - 1
                w.write(amp, s)
                r = 0
            if last < se - ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(w, eobrun, no_bits, PROG_AC_CODES)
    _flush_eobrun(w, eobrun, no_bits, PROG_AC_CODES)
    return w.flush()


def _emit_ac_refine_scan(
    arr: np.ndarray, rows: int, cols: int, ss: int, se: int, al: int,
    ri: int = 0,
) -> bytes:
    """Successive-approximation AC refinement (T.81 G.1.2.3 shape):
    newly-visible coefficients emit (run,1)+sign, already-visible ones
    ride as correction bits flushed after the next emitted symbol (or
    with the EOB run for fully-quiet block tails)."""
    w = _BitWriter()
    eobrun = 0
    be: list[int] = []  # correction bits pending with the EOB run
    unit = 0
    for by in range(rows):
        for bx in range(cols):
            if ri and unit and unit % ri == 0:
                eobrun = _flush_eobrun(w, eobrun, be, PROG_AC_CODES)
                w.emit_marker(0xD0 + (unit // ri - 1) % 8)
            unit += 1
            block = arr[by, bx]
            t = []
            sign = []
            for k in range(ss, se + 1):
                v = int(block[k])
                t.append(abs(v) >> al)
                sign.append(1 if v >= 0 else 0)
            # ZRLs may only be emitted up to the last newly-visible
            # coefficient - beyond it the tail folds into the EOB run.
            eob_idx = max((i for i, v in enumerate(t) if v == 1), default=-1)
            r = 0
            br: list[int] = []  # correction bits since last symbol
            for i in range(len(t)):
                if t[i] == 0:
                    r += 1
                    continue
                # Emit required ZRLs at EVERY nonzero coefficient
                # (libjpeg's discipline): a history coefficient's
                # correction bit buffered past a pending ZRL would be
                # read by the decoder in the wrong walk.
                while r > 15 and i <= eob_idx:
                    eobrun = _flush_eobrun(w, eobrun, be, PROG_AC_CODES)
                    code, length = PROG_AC_CODES[0xF0]
                    w.write(code, length)
                    for b in br:
                        w.write(b, 1)
                    br = []
                    r -= 16
                if t[i] > 1:
                    br.append(t[i] & 1)
                    continue
                # newly visible coefficient: terminate any EOB run
                # from prior blocks, then emit (run, 1) + sign + bits
                eobrun = _flush_eobrun(w, eobrun, be, PROG_AC_CODES)
                code, length = PROG_AC_CODES[(r << 4) | 1]
                w.write(code, length)
                w.write(sign[i], 1)
                for b in br:
                    w.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(w, eobrun, be, PROG_AC_CODES)
    _flush_eobrun(w, eobrun, be, PROG_AC_CODES)
    return w.flush()


def _progressive_scans(
    coef: list[np.ndarray], samp: tuple, h: int, w: int, ri: int = 0
) -> list[tuple]:
    """Run PROG_SCRIPT over the coefficient arrays; yields
    (scan_comps, Ss, Se, Ah, Al, entropy_bytes) per scan. DC scans are
    interleaved in MCU order over the (padded) block grids; AC scans
    are single-component over that component's true data-unit grid
    (T.81 A.2.2 - no MCU padding)."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcuy = coef[0].shape[0] // samp[0][1]
    mcux = coef[0].shape[1] // samp[0][0]
    scans = []
    for scan_comps, ss, se, ah, al in PROG_SCRIPT:
        if ss == 0:  # DC scan, interleaved
            writer = _BitWriter()
            mcu_n = 0
            if ah == 0:
                preds = [0] * len(coef)
                for my in range(mcuy):
                    for mx in range(mcux):
                        if ri and mcu_n and mcu_n % ri == 0:
                            writer.emit_marker(0xD0 + (mcu_n // ri - 1) % 8)
                            preds = [0] * len(coef)
                        mcu_n += 1
                        for ci in scan_comps:
                            sh, sv = samp[ci]
                            for v in range(sv):
                                for hh in range(sh):
                                    val = (
                                        int(coef[ci][my * sv + v, mx * sh + hh, 0])
                                        >> al
                                    )
                                    _encode_coef(
                                        writer, val - preds[ci], DC_CODES
                                    )
                                    preds[ci] = val
            else:
                for my in range(mcuy):
                    for mx in range(mcux):
                        if ri and mcu_n and mcu_n % ri == 0:
                            writer.emit_marker(0xD0 + (mcu_n // ri - 1) % 8)
                        mcu_n += 1
                        for ci in scan_comps:
                            sh, sv = samp[ci]
                            for v in range(sv):
                                for hh in range(sh):
                                    bit = (
                                        int(coef[ci][my * sv + v, mx * sh + hh, 0])
                                        >> al
                                    ) & 1
                                    writer.write(bit, 1)
            scans.append((scan_comps, ss, se, ah, al, writer.flush()))
        else:  # AC scan, single component, true data-unit grid
            (ci,) = scan_comps
            sh, sv = samp[ci]
            rows = -(-(h * sv) // (vmax * 8))
            cols = -(-(w * sh) // (hmax * 8))
            emit = _emit_ac_first_scan if ah == 0 else _emit_ac_refine_scan
            scans.append(
                (scan_comps, ss, se, ah, al,
                 emit(coef[ci], rows, cols, ss, se, al, ri))
            )
    return scans


# --- decoder ----------------------------------------------------------------


def _segments(payload: bytes) -> Iterator[tuple[int, bytes, int]]:
    """Yield (marker, segment_payload, offset_after) for each marker
    segment up to (and excluding) the entropy-coded scan data."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    off = 2
    while off < len(payload):
        if payload[off] != 0xFF:
            raise ValueError(f"marker expected at {off}")
        # Spec-legal 0xFF fill/padding bytes may precede any marker
        # (ITU T.81 B.1.1.2); skip them like libjpeg does.
        while off + 1 < len(payload) and payload[off + 1] == 0xFF:
            off += 1
        marker = (payload[off] << 8) | payload[off + 1]
        if marker == 0xFFD9:  # EOI
            return
        (length,) = struct.unpack(">H", payload[off + 2 : off + 4])
        seg = payload[off + 4 : off + 2 + length]
        off += 2 + length
        yield marker, seg, off
        if marker == 0xFFDA:  # scan data follows; caller takes over
            return


_SOF_MARKERS = frozenset(
    m
    for m in range(0xFFC0, 0xFFD0)
    if m not in (0xFFC4, 0xFFC8, 0xFFCC)  # DHT / JPG / DAC are not SOFs
)


def jpeg_meta(payload: bytes) -> tuple[int, int]:
    """(width, height) from ANY SOFn frame header - progressive /
    arithmetic streams parse here (metadata-only fallback) even though
    their pixel decode raises in :func:`jpeg_pixels`. Truncated or
    bit-flipped containers raise a clean ValueError."""
    try:
        for marker, seg, _ in _segments(payload):
            if marker in _SOF_MARKERS:
                _prec, h, w = struct.unpack(">BHH", seg[:5])
                return w, h
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt JPEG container ({type(e).__name__})") from e
    raise ValueError("no SOF marker found")


class _HuffTable:
    """Canonical Huffman decode table from a DHT segment body."""

    def __init__(self, lengths: bytes, huffval: bytes) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for bit_len in range(1, 17):
            for _ in range(lengths[bit_len - 1]):
                self.lookup[(bit_len, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: _BitReader) -> int:
        code = 0
        for bit_len in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = self.lookup.get((bit_len, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(amp: int, s: int) -> int:
    return amp if amp >= (1 << (s - 1)) else amp - (1 << s) + 1


def _fancy_upsample(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Upsample a chroma plane by integer factors. Factor 2 uses the
    triangle filter (3/4 nearer + 1/4 farther neighbor, edges
    replicated) - libjpeg's default "fancy" kernel, which the JVM
    ImageIO decoder inherits; other factors fall back to replication.
    Float weights (no integer bias terms): the +-1 difference vs
    libjpeg's integer rounding sits well inside the pinned TOL."""

    def tri2(p: np.ndarray) -> np.ndarray:  # along axis 0
        pad = np.pad(p, ((1, 1), (0, 0)), mode="edge")
        up = np.empty((p.shape[0] * 2, p.shape[1]), dtype=p.dtype)
        up[0::2] = (3.0 * pad[1:-1] + pad[:-2]) / 4.0
        up[1::2] = (3.0 * pad[1:-1] + pad[2:]) / 4.0
        return up

    if fy == 2:
        plane = tri2(plane)
    elif fy > 1:
        plane = np.repeat(plane, fy, axis=0)
    if fx == 2:
        plane = tri2(plane.T).T
    elif fx > 1:
        plane = np.repeat(plane, fx, axis=1)
    return plane


def _entropy_end(payload: bytes, start: int) -> int:
    """First offset at/after ``start`` holding a real marker (0xFF
    followed by anything but a stuffed 0x00, an RSTn, or a 0xFF fill
    byte) - the end of one scan's entropy-coded data."""
    i, n = start, len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:
            i += 1
        elif payload[i + 1] == 0x00:
            i += 2
        elif payload[i + 1] == 0xFF or 0xD0 <= payload[i + 1] <= 0xD7:
            i += 1 if payload[i + 1] == 0xFF else 2
        else:
            return i
    return n


def _decode_block_baseline(
    reader: _BitReader, dc_t: _HuffTable, ac_t: _HuffTable,
    coef: np.ndarray, pred: int,
) -> int:
    """One full baseline block into ``coef`` (64, zigzag order);
    returns the new DC predictor."""
    s = dc_t.decode(reader)
    diff = _extend(reader.read_bits(s), s) if s else 0
    pred += diff
    coef[0] = pred
    k = 1
    while k < 64:
        sym = ac_t.decode(reader)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        size = sym & 0xF
        if k > 63:
            raise ValueError("AC run overflows block")
        coef[k] = _extend(reader.read_bits(size), size)
        k += 1
    return pred


def _decode_ac_first(
    reader: _BitReader, ac_t: _HuffTable, coef: np.ndarray,
    ss: int, se: int, al: int, eobrun: int,
) -> int:
    """Progressive AC first scan (Ah == 0) for one block (T.81 G.2.2);
    returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = ac_t.decode(reader)
        r, s = sym >> 4, sym & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run overflows band")
        coef[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _decode_ac_refine(
    reader: _BitReader, ac_t: _HuffTable, coef: np.ndarray,
    ss: int, se: int, al: int, eobrun: int,
) -> int:
    """Progressive AC refinement scan (Ah > 0) for one block - the
    correction-bit walk of T.81 G.2.2 / libjpeg's decode_mcu_AC_refine
    discipline; returns the updated EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = ac_t.decode(reader)
            r, s = sym >> 4, sym & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # this block finishes in the EOB walk below
            else:
                val = p1 if reader.read_bit() else m1
            while k <= se:
                c = int(coef[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        coef[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        if val:
                            coef[k] = val
                        break
                    r -= 1
                k += 1
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(coef[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    coef[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


JPEG_MAX_PIXELS = 1 << 27  # allocation guard for corrupt/hostile SOF dims


def jpeg_pixels(payload: bytes) -> np.ndarray:
    """Corruption-hardened wrapper around :func:`_jpeg_pixels_impl`:
    any structurally-broken stream (truncated segment, bit flip that
    desyncs the entropy walk, absurd declared dimensions) raises a
    clean ``ValueError`` - never an internal IndexError/StopIteration
    and never an unbounded allocation. The multimodal path feeds this
    arbitrary store bytes, so the failure contract matters as much as
    the success path (fuzzed: 4000 truncate/flip/splice mutations)."""
    try:
        return _jpeg_pixels_impl(payload)
    except (ValueError, NotImplementedError):
        raise
    except (
        IndexError, KeyError, StopIteration, ZeroDivisionError,
        OverflowError, struct.error,
    ) as e:
        raise ValueError(f"corrupt JPEG stream ({type(e).__name__})") from e


def _jpeg_pixels_impl(payload: bytes) -> np.ndarray:
    """Full decode -> (h, w, 3) uint8 RGB. Supports 8-bit 3-component
    BASELINE (SOF0/1) and PROGRESSIVE (SOF2: spectral selection +
    successive approximation, DC/AC first and refinement scans, EOB
    runs) streams, arbitrary sampling factors (4:4:4, 4:2:0, 4:2:2,
    ...), restart markers, multi-scan table redefinition - everything
    :func:`make_jpeg` emits plus the layouts real camera/CDN JPEGs
    use. Lossless/hierarchical/arithmetic variants raise (dims still
    parse via :func:`jpeg_meta`)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtables: dict[int, np.ndarray] = {}
    hufftables: dict[tuple[int, int], _HuffTable] = {}
    comps: list[tuple[int, int, int, int]] = []  # (cid, qid, sh, sv)
    h = w = 0
    progressive = False
    restart_interval = 0
    coef_store: dict[int, np.ndarray] = {}  # cid -> (BY, BX, 64) zigzag
    geom: dict[int, tuple[int, int]] = {}  # cid -> (data-unit rows, cols)
    hmax = vmax = mcux = mcuy = 0
    saw_scan = False

    pos, n = 2, len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = (payload[pos] << 8) | payload[pos + 1]
        if marker == 0xFFD9:  # EOI
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + length]
        pos += 2 + length

        if marker == 0xFFDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                p += 65
        elif marker in (0xFFC0, 0xFFC1, 0xFFC2):
            progressive = marker == 0xFFC2
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or ncomp != 3:
                raise NotImplementedError("only 8-bit 3-component streams")
            for c in range(ncomp):
                cid, sampling, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, qid, sampling >> 4, sampling & 0xF))
            if h * w == 0 or h * w > JPEG_MAX_PIXELS:
                raise ValueError(f"unreasonable frame dimensions {w}x{h}")
            if any(not (1 <= c[2] <= 4 and 1 <= c[3] <= 4) for c in comps):
                raise ValueError("invalid sampling factors")
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for cid, qid, sh, sv in comps:
                coef_store[cid] = np.zeros(
                    (mcuy * sv, mcux * sh, 64), dtype=np.int32
                )
                geom[cid] = (-(-(h * sv) // (vmax * 8)), -(-(w * sh) // (hmax * 8)))
        elif marker == 0xFFC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                lengths = seg[p + 1 : p + 17]
                cnt = sum(lengths)
                hufftables[(tc, th)] = _HuffTable(
                    lengths, seg[p + 17 : p + 17 + cnt]
                )
                p += 17 + cnt
        elif marker == 0xFFDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xFFDA:
            if not comps:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []  # (comps-index, dc table id, ac table id)
            for c in range(ns):
                cid, tables = seg[1 + 2 * c : 3 + 2 * c]
                matches = [i for i, cc in enumerate(comps) if cc[0] == cid]
                if not matches:
                    raise ValueError(f"scan references unknown component {cid}")
                ci = matches[0]
                scan_comps.append((ci, tables >> 4, tables & 0xF))
            ss, se, a = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            end = _entropy_end(payload, pos)
            reader = _BitReader(payload[pos:end])
            _decode_scan(
                reader, comps, scan_comps, coef_store, geom, hufftables,
                mcux, mcuy, restart_interval, progressive, ss, se, ah, al,
            )
            saw_scan = True
            pos = end
        elif marker in (0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7) or (
            0xFFC9 <= marker <= 0xFFCB or 0xFFCD <= marker <= 0xFFCF
        ):
            raise NotImplementedError(
                "lossless/hierarchical/arithmetic JPEG unsupported"
            )
        # APPn / COM / DNL: ignored

    if not saw_scan:
        raise ValueError("no scan found")

    full = np.empty((h, w, 3), dtype=np.float64)
    for ci, (cid, qid, sh, sv) in enumerate(comps):
        arr = coef_store[cid]
        by_n, bx_n = arr.shape[:2]
        # Batched dequant + dezigzag + IDCT: one broadcast matmul over
        # all blocks (bit-identical to the per-block product - BLAS
        # runs the same 8x8 kernel per slice) so multi-megapixel
        # images reconstruct at numpy speed, not Python-loop speed.
        deq = arr.astype(np.int64) * qtables[qid]
        blocks = np.zeros((by_n, bx_n, 64), dtype=np.float64)
        blocks[..., ZIGZAG] = deq
        spatial = _DCT.T @ blocks.reshape(by_n, bx_n, 8, 8) @ _DCT + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by_n * 8, bx_n * 8)
        if (sh, sv) != (hmax, vmax):
            # Upsample only the TRUE sample extent (edge-replicated),
            # never the MCU padding blocks - libjpeg's upsamplers see
            # only downsampled_width columns, and filtering across the
            # padding boundary visibly shifts border pixels.
            ch = -(-(h * sv) // vmax)
            cw = -(-(w * sh) // hmax)
            plane = _fancy_upsample(plane[:ch, :cw], hmax // sh, vmax // sv)
        full[..., ci] = plane[:h, :w]
    return _ycbcr_to_rgb(full)


def _decode_scan(
    reader: _BitReader,
    comps: list[tuple[int, int, int, int]],
    scan_comps: list[tuple[int, int, int]],
    coef_store: dict[int, np.ndarray],
    geom: dict[int, tuple[int, int]],
    hufftables: dict[tuple[int, int], _HuffTable],
    mcux: int, mcuy: int, restart_interval: int, progressive: bool,
    ss: int, se: int, ah: int, al: int,
) -> None:
    """Decode one scan's entropy data into the coefficient store.
    Baseline: always interleaved full-block decode (ss/se/ah/al are
    0,63,0,0). Progressive: DC scans (ss == 0) may be interleaved;
    AC scans are single-component over that component's own data-unit
    grid (NOT padded to MCU multiples - T.81 A.2.2)."""
    preds = [0] * len(scan_comps)
    eobrun = 0
    unit_n = 0

    def maybe_restart() -> None:
        nonlocal preds, eobrun, unit_n
        if restart_interval and unit_n and unit_n % restart_interval == 0:
            reader.restart()
            preds = [0] * len(scan_comps)
            eobrun = 0

    if len(scan_comps) > 1:
        # interleaved MCU order (multi-component baseline scans and
        # progressive DC). Single-component scans - baseline OR
        # progressive - fall through to the true data-unit grid walk
        # below: T.81 A.2.2 says a non-interleaved scan covers only
        # the component's own data units, never the MCU padding, so
        # walking a subsampled image's single-component baseline scan
        # on the padded grid would consume phantom blocks.
        for _my in range(mcuy):
            for _mx in range(mcux):
                maybe_restart()
                for si, (ci, dct_id, act_id) in enumerate(scan_comps):
                    cid, _qid, sh, sv = comps[ci]
                    arr = coef_store[cid]
                    for v in range(sv):
                        for hh in range(sh):
                            coef = arr[_my * sv + v, _mx * sh + hh]
                            if not progressive:
                                preds[si] = _decode_block_baseline(
                                    reader,
                                    hufftables[(0, dct_id)],
                                    hufftables[(1, act_id)],
                                    coef, preds[si],
                                )
                            elif ah == 0:  # DC first
                                dc_t = hufftables[(0, dct_id)]
                                s = dc_t.decode(reader)
                                diff = (
                                    _extend(reader.read_bits(s), s) if s else 0
                                )
                                preds[si] += diff
                                coef[0] = preds[si] << al
                            else:  # DC refinement: one bit per block
                                if reader.read_bit():
                                    coef[0] = int(coef[0]) | (1 << al)
                unit_n += 1
        return

    # single-component scan over the component's true data-unit grid
    # (non-interleaved baseline, progressive AC, or non-interleaved DC)
    (ci, dct_id, act_id) = scan_comps[0]
    cid = comps[ci][0]
    arr = coef_store[cid]
    rows, cols = geom[cid]
    for by in range(rows):
        for bx in range(cols):
            maybe_restart()
            coef = arr[by, bx]
            if not progressive:
                preds[0] = _decode_block_baseline(
                    reader,
                    hufftables[(0, dct_id)],
                    hufftables[(1, act_id)],
                    coef, preds[0],
                )
            elif ss == 0:
                if ah == 0:
                    dc_t = hufftables[(0, dct_id)]
                    s = dc_t.decode(reader)
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    preds[0] += diff
                    coef[0] = preds[0] << al
                else:
                    if reader.read_bit():
                        coef[0] = int(coef[0]) | (1 << al)
            elif ah == 0:
                eobrun = _decode_ac_first(
                    reader, hufftables[(1, act_id)], coef, ss, se, al, eobrun
                )
            else:
                eobrun = _decode_ac_refine(
                    reader, hufftables[(1, act_id)], coef, ss, se, al, eobrun
                )
            unit_n += 1


# --- registry query ----------------------------------------------------------

N_JPEG_USERS = 8


def _jpeg_user_images(user: int) -> list[tuple[str, np.ndarray, str]]:
    """Six deterministic 16x16 fixtures per user: a solid 4:4:4 tile
    (asymmetric channels - a swap changes the result), a horizontal
    4:4:4 gradient (exercises AC coefficients and the Huffman
    run-length path, not just DC), a grayscale-gradient 4:2:0 image
    (exercises the subsampled 4-luma-blocks-per-MCU path; gray means
    chroma is exactly 128 everywhere, so the cross-decoder compare is
    independent of each decoder's chroma upsampling kernel while the
    luma plane stays a full-resolution AC workout), a varying-chroma
    4:2:0 image (the subsample -> fancy-upsample chain against the JVM
    decoder, pinned <= TOL), and progressive (SOF2) twins of the last
    two gradients (the 10-scan progression must decode to the same
    pixels)."""
    base = 30 + 7 * user
    solid = np.tile(
        np.array([base, base + 40, base + 90], dtype=np.uint8), (16, 16, 1)
    )
    ramp = (np.arange(16) * 12 + 2 * user).astype(np.uint8)
    grad = np.stack(
        [
            np.tile(ramp, (16, 1)),
            np.tile(ramp[::-1], (16, 1)),
            np.full((16, 16), 100 + user, dtype=np.uint8),
        ],
        axis=-1,
    )
    gray_ramp = (np.arange(16) * 13 + 3 * user).astype(np.uint8)
    gray = np.repeat(
        np.tile(gray_ramp, (16, 1))[..., np.newaxis], 3, axis=-1
    )
    # Varying-CHROMA 4:2:0: exercises the subsample -> triangle-
    # upsample chain against the JVM decoder's own (libjpeg-derived)
    # fancy upsampling. Measured divergence on gradients and hard
    # edges is <= 2 = TOL (BASELINE.md r5), so this is a safe pinned
    # contract, not a flaky one.
    color = np.stack(
        [
            np.tile(ramp, (16, 1)),
            np.tile(ramp[::-1], (16, 1)),
            np.tile((np.arange(16) * 9 + 5 * user).astype(np.uint8), (16, 1)).T,
        ],
        axis=-1,
    )
    # (name, pixels, subsampling, progressive)
    return [
        (f"u{user:02d}_solid.jpg", solid, "444", False),
        (f"u{user:02d}_grad.jpg", grad, "444", False),
        (f"u{user:02d}_sub420.jpg", gray, "420", False),
        (f"u{user:02d}_c420.jpg", color, "420", False),
        # SOF2 twins: the 10-scan progression decodes to the same
        # pixels, and the JVM cross-check runs on them independently
        (f"u{user:02d}_prog.jpg", grad, "444", True),
        (f"u{user:02d}_p420.jpg", color, "420", True),
    ]


def _stage_jpeg_store(root: str) -> None:
    for user in range(N_JPEG_USERS):
        for name, px, sub, prog in _jpeg_user_images(user):
            with open(os.path.join(root, name), "wb") as f:
                f.write(make_jpeg(px, subsampling=sub, progressive=prog))


def jpeg_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: decode REAL baseline JPEG bytes two independent
    ways - this codec (``binaryFile`` -> Arrow ``mapInPandas``) and JVM
    ImageIO (``format("image")``, BGR) - and cross-check within the
    pinned +-{TOL} per-channel bound (IDCT implementations differ in
    the last unit; bit equality is a PNG-only property). Output per
    image: dims from the python decode, pixels_close, and the python
    decode's exact mean luminance (an exact-valued probe of THIS
    decoder, hash-checked against the closed-form oracle)."""
    work = tempfile.mkdtemp(prefix="jpeg_store_")
    try:
        _stage_jpeg_store(work)

        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("img_name"),
            F.col("content").alias("payload"),
        )

        def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = {
                    "img_name": [],
                    "width": [],
                    "height": [],
                    "py_bgr": [],
                    "y_sum": [],
                }
                for name, p in zip(pdf["img_name"], pdf["payload"]):
                    rgb = jpeg_pixels(p)
                    rows["img_name"].append(name)
                    rows["width"].append(rgb.shape[1])
                    rows["height"].append(rgb.shape[0])
                    rows["py_bgr"].append(rgb[..., ::-1].tobytes())
                    rows["y_sum"].append(int(rgb.astype(np.int64).sum()))
                yield pd.DataFrame(rows)

        py = bin_df.mapInPandas(
            decode_batches,
            "img_name string, width int, height int, py_bgr binary, y_sum long",
        )
        jvm = (
            spark.read.format("image")
            .option("dropInvalid", True)
            .load(work)
            .select("image.*")
            .select(
                F.element_at(F.split("origin", "/"), -1).alias("img_name"),
                F.col("width").alias("jvm_width"),
                F.col("height").alias("jvm_height"),
                F.col("data").alias("jvm_bgr"),
            )
        )

        def close_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ok = []
                for a, b in zip(pdf["py_bgr"], pdf["jvm_bgr"]):
                    pa = np.frombuffer(a, dtype=np.uint8).astype(np.int32)
                    pb = np.frombuffer(b, dtype=np.uint8).astype(np.int32)
                    ok.append(
                        len(pa) == len(pb) and int(np.abs(pa - pb).max()) <= TOL
                    )
                yield pd.DataFrame(
                    {
                        "img_name": pdf["img_name"],
                        "width": pdf["width"],
                        "height": pdf["height"],
                        "dims_match": (pdf["width"] == pdf["jvm_width"])
                        & (pdf["height"] == pdf["jvm_height"]),
                        "pixels_close": ok,
                        "y_sum": pdf["y_sum"],
                    }
                )

        out = py.join(jvm, "img_name").mapInPandas(
            close_batches,
            "img_name string, width int, height int, dims_match boolean, "
            "pixels_close boolean, y_sum long",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _jpeg_oracle() -> str:
    """Closed-form expected rows: dims are exact; pixels_close is the
    pinned contract; y_sum is THIS codec's exact decode sum, computed
    at oracle-build time by running the pure-numpy round trip locally
    (no Spark) - a drift in encoder, decoder, or bitstream breaks the
    hash."""
    rows = []
    for user in range(N_JPEG_USERS):
        for name, px, sub, prog in _jpeg_user_images(user):
            decoded = jpeg_pixels(make_jpeg(px, subsampling=sub, progressive=prog))
            rows.append(
                f"('{name}', {px.shape[1]}, {px.shape[0]}, true, true, "
                f"{int(decoded.astype(np.int64).sum())})"
            )
    return (
        "SELECT img_name, width, height, dims_match, pixels_close, y_sum "
        f"FROM (VALUES {', '.join(rows)}) "
        "AS t(img_name, width, height, dims_match, pixels_close, y_sum)"
    )


JPEG_DECODE_ORACLE_SQL = _jpeg_oracle()
