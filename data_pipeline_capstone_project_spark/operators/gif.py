"""GIF (87a/89a) codec - pure-Python LZW, animation, interlace.

Completes the still-image family next to :mod:`.images` (PNG) and
:mod:`.jpeg`: GIF is the third classic web image format a media
ingest store contains (the reference store accepts whatever the
Instagram API returns; its cv2 decode in ``spark_image.py:140-160``
handled GIF transparently). No imaging library exists in this
environment, so the repo carries its own codec:

- :func:`make_gif`: fixture writer - GIF89a with global/local color
  tables, Graphic Control Extensions (frame delay, transparency),
  multi-frame animation, Adam-less GIF 4-pass interlace, and a
  from-scratch variable-width LSB-first LZW compressor (clear-code
  reset at dictionary capacity 4096 per the spec).
- :func:`gif_meta`: logical-screen (width, height) via header parse.
- :func:`gif_frames`: full decode - block walk, LZW decompression
  (including the deferred-clear and c==next_code corner cases),
  interlace de-permutation, palette resolution (local overrides
  global) -> per-frame RGB arrays + typed metadata.
- :func:`gif_decode_query`: registry entry - stages a store mixing
  every feature, decodes executor-side via ``binaryFile`` -> Arrow
  ``mapInPandas``, and hash-checks per-frame RGB content against a
  closed-form oracle computed from the SOURCE index arrays (true
  round-trip independence: the oracle never runs the decoder).

Scale shape: identical to the other binary codecs - binaryFile
partitions by file, decode is per-record inside the Arrow batch,
payloads never reach the driver, corrupt streams raise ValueError
(fuzz contract in ``tests/test_binary_fuzz.py``).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import struct
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# --- LZW (GIF variant: variable width, LSB-first, clear/EOI codes) ---------

_MAX_CODE = 4096


class _BitWriter:
    """LSB-first bit packer (GIF packs code streams little-endian)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    """GIF-LZW compress. The emitted code widths simulate the
    decoder's dictionary growth exactly (the decoder learns each
    encoder entry one code later, but bumps its read width after the
    ADD, so mirroring the add-then-bump rule keeps both in step)."""
    clear = 1 << min_code
    eoi = clear + 1
    bw = _BitWriter()
    width = min_code + 1
    dec_next = eoi + 1

    def reset() -> tuple[dict[bytes, int], int]:
        return {bytes([i]): i for i in range(clear)}, eoi + 1

    table, next_code = reset()
    bw.put(clear, width)
    first = True

    def emit(code: int) -> None:
        nonlocal width, dec_next, first
        bw.put(code, width)
        if first:
            first = False
        else:
            dec_next += 1
            if dec_next == (1 << width) and width < 12:
                width += 1

    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        cur = bytes([b])
        if next_code == _MAX_CODE:
            emit(clear)
            table, next_code = reset()
            width = min_code + 1
            dec_next = eoi + 1
            first = True
    if cur:
        emit(table[cur])
    bw.put(eoi, width)
    return bw.done()


def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> bytes:
    """GIF-LZW decompress: canonical algorithm including the
    c == next_code self-reference case (prev + prev[0])."""
    if not 2 <= min_code <= 11:
        raise ValueError("LZW minimum code size out of range")
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    bitpos = 0
    prev: bytes | None = None
    nbits = len(data) * 8
    while True:
        if bitpos + width > nbits:
            raise ValueError("LZW stream ended without EOI")
        byte_off = bitpos >> 3
        chunk = int.from_bytes(
            data[byte_off : byte_off + (width + 7 + (bitpos & 7)) // 8 + 1],
            "little",
        )
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("LZW output exceeds frame size")
    if len(out) != n_expected:
        raise ValueError("LZW output short of frame size")
    return bytes(out)


# --- container write -------------------------------------------------------

_INTERLACE_STRIDES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    return [r for start, step in _INTERLACE_STRIDES for r in range(start, h, step)]


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _palette_exp(n_colors: int) -> int:
    """GIF stores palette size as 2^(exp+1); sizes must be powers of
    two >= 2."""
    if n_colors < 2 or n_colors > 256 or n_colors & (n_colors - 1):
        raise ValueError("palette size must be a power of two in [2, 256]")
    return n_colors.bit_length() - 2


def make_gif(
    width: int,
    height: int,
    palette: np.ndarray,
    frames: list[dict],
) -> bytes:
    """GIF89a writer. ``palette`` is the global color table
    (n, 3) uint8; each frame dict: ``idx`` (h, w) uint8 index array,
    optional ``left``/``top``, ``interlace`` bool, ``palette`` local
    color table, ``delay_cs`` (emits a GCE), ``transparent`` index
    (emits a GCE with the transparency flag)."""
    out = bytearray(b"GIF89a")
    exp = _palette_exp(len(palette))
    out += struct.pack("<HHBBB", width, height, 0x80 | (7 << 4) | exp, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    for fr in frames:
        idx: np.ndarray = fr["idx"]
        delay = fr.get("delay_cs")
        transp = fr.get("transparent")
        if delay is not None or transp is not None:
            flags = 1 if transp is not None else 0
            out += struct.pack(
                "<BBBBHBB", 0x21, 0xF9, 4, flags, delay or 0,
                transp if transp is not None else 0, 0,
            )
        h, w = idx.shape
        local = fr.get("palette")
        interlace = bool(fr.get("interlace"))
        iflags = (0x40 if interlace else 0)
        if local is not None:
            iflags |= 0x80 | _palette_exp(len(local))
        out += struct.pack(
            "<BHHHHB", 0x2C, fr.get("left", 0), fr.get("top", 0), w, h, iflags
        )
        if local is not None:
            out += local.astype(np.uint8).tobytes()
        pal_n = len(local if local is not None else palette)
        if idx.max(initial=0) >= pal_n:
            raise ValueError("index outside palette")
        min_code = max(2, (pal_n - 1).bit_length())
        rows = idx[_interlace_order(h)] if interlace else idx
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(rows.astype(np.uint8).tobytes(), min_code))
    out.append(0x3B)
    return bytes(out)


# --- decode ----------------------------------------------------------------

GIF_MAX_PIXELS = 1 << 27  # allocation guard for corrupt/hostile descriptors


def gif_meta(payload: bytes) -> tuple[int, int]:
    """Logical-screen (width, height) from the header."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h = struct.unpack("<HH", payload[6:10])
    return w, h


def gif_frames(payload: bytes) -> list[dict]:
    """Full decode: list of frames, each
    ``{left, top, interlaced, local_palette, delay_cs,
    transparent_idx, rgb}`` with ``rgb`` an (h, w, 3) uint8 array
    (indices resolved through the frame's effective palette).
    Corrupt streams raise ValueError."""
    try:
        return _gif_frames_impl(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt GIF stream ({type(e).__name__})") from e


def _gif_frames_impl(payload: bytes) -> list[dict]:
    gif_meta(payload)  # magic check
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    frames: list[dict] = []
    delay_cs: int | None = None
    transparent: int | None = None
    while True:
        if pos >= len(payload):
            raise ValueError("GIF stream ended without trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:
                size = payload[pos]
                if size != 4:
                    raise ValueError("bad GCE size")
                gflags, delay_cs, tidx = struct.unpack(
                    "<BHB", payload[pos + 1 : pos + 5]
                )
                transparent = tidx if gflags & 1 else None
                pos += 5
            else:  # comment / app / plain text: skip data
                pass
            while True:  # residual sub-blocks (GCE has a 0 terminator too)
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                pos += size
        elif block == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            local = None
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                local = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                )
                if len(local) != 3 * n:
                    raise ValueError("truncated local color table")
                local = local.reshape(n, 3)
                pos += 3 * n
            if w * h == 0 or w * h > GIF_MAX_PIXELS:
                raise ValueError("hostile/corrupt GIF frame dimensions")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while True:
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                data += payload[pos : pos + size]
                pos += size
            idx = np.frombuffer(
                _lzw_decode(bytes(data), min_code, w * h), dtype=np.uint8
            ).reshape(h, w)
            if iflags & 0x40:
                deinter = np.empty_like(idx)
                deinter[_interlace_order(h)] = idx
                idx = deinter
            pal = local if local is not None else gct
            if pal is None:
                raise ValueError("no color table for frame")
            if idx.max(initial=0) >= len(pal):
                raise ValueError("palette index out of range")
            frames.append(
                {
                    "left": left,
                    "top": top,
                    "interlaced": bool(iflags & 0x40),
                    "local_palette": local is not None,
                    "delay_cs": delay_cs,
                    "transparent_idx": transparent,
                    "rgb": pal[idx],
                }
            )
            delay_cs = None
            transparent = None
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image")
    return frames


# --- registry query --------------------------------------------------------

def _lcg_indices(h: int, w: int, pal_n: int, seed: int) -> np.ndarray:
    """Seeded 64-bit LCG index plane - library-free and platform-exact
    (same generator family as the WAV fixtures)."""
    mask = (1 << 64) - 1
    state = (seed * 6364136223846793005 + 1442695040888963407) & mask
    out = np.empty(h * w, dtype=np.uint8)
    for i in range(h * w):
        state = (state * 6364136223846793005 + 1442695040888963407) & mask
        out[i] = (state >> 33) % pal_n
    return out.reshape(h, w)


def _lcg_palette(n: int, seed: int) -> np.ndarray:
    mask = (1 << 64) - 1
    state = ((seed + 77) * 6364136223846793005 + 1442695040888963407) & mask
    out = np.empty(3 * n, dtype=np.uint8)
    for i in range(3 * n):
        state = (state * 6364136223846793005 + 1442695040888963407) & mask
        out[i] = (state >> 33) % 256
    return out.reshape(n, 3)


def _gif_fixtures() -> list[tuple[str, int, int, np.ndarray, list[dict]]]:
    """(name, width, height, global palette, frames): exercises plain
    frames, interlace, animation with delays, local palettes,
    transparency, sub-byte palettes (2/4 colors), 256-color tables,
    and frames offset inside the logical screen."""
    out = []
    for i in range(8):
        w, h = 11 + 2 * i, 7 + i
        pal_n = (8, 4, 16, 2, 256, 32, 8, 64)[i]
        gpal = _lcg_palette(pal_n, 3 * i)
        frames: list[dict] = [
            {"idx": _lcg_indices(h, w, pal_n, 5 * i), "interlace": i % 2 == 1}
        ]
        if i % 3 == 0:  # animated: 2 extra frames
            frames[0]["delay_cs"] = 10 + i
            lpal_n = 4 if pal_n != 4 else 8
            frames.append(
                {
                    "idx": _lcg_indices(h - 2, w - 3, lpal_n, 5 * i + 1),
                    "left": 2,
                    "top": 1,
                    "palette": _lcg_palette(lpal_n, 3 * i + 1),
                    "delay_cs": 20 + i,
                }
            )
            frames.append(
                {
                    "idx": _lcg_indices(h, w, pal_n, 5 * i + 2),
                    "delay_cs": 30 + i,
                    "transparent": 1,
                    "interlace": True,
                }
            )
        out.append((f"g{i}.gif", w, h, gpal, frames))
    return out


def _stage_gif_store(root: str) -> None:
    for name, w, h, gpal, frames in _gif_fixtures():
        with open(os.path.join(root, name), "wb") as f:
            f.write(make_gif(w, h, gpal, frames))


GIF_DECODE_SCHEMA = (
    "gif_name string, frame_idx int, screen_w int, screen_h int, "
    "frame_w int, frame_h int, frame_left int, frame_top int, "
    "interlaced int, local_palette int, delay_cs int, transparent_idx int, "
    "pix_sum long, rgb_sig string"
)


def gif_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: stage the GIF store, decode every frame
    executor-side, report per-frame geometry + animation metadata +
    RGB content hash."""
    work = tempfile.mkdtemp(prefix="gif_store_")
    try:
        _stage_gif_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("gif_name"),
            F.col("content").alias("payload"),
        )

        def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for name, p in zip(pdf["gif_name"], pdf["payload"]):
                    sw, sh = gif_meta(p)
                    for fi, fr in enumerate(gif_frames(p)):
                        rgb = fr["rgb"]
                        rows.append(
                            (
                                name, fi, sw, sh, rgb.shape[1], rgb.shape[0],
                                fr["left"], fr["top"], int(fr["interlaced"]),
                                int(fr["local_palette"]),
                                -1 if fr["delay_cs"] is None else fr["delay_cs"],
                                -1 if fr["transparent_idx"] is None
                                else fr["transparent_idx"],
                                int(rgb.astype(np.int64).sum()),
                                hashlib.md5(rgb.tobytes()).hexdigest(),
                            )
                        )
                yield pd.DataFrame(
                    rows, columns=[c.split(" ")[0] for c in GIF_DECODE_SCHEMA.split(", ")]
                )

        out = bin_df.mapInPandas(decode_batches, GIF_DECODE_SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _gif_oracle() -> str:
    """Closed-form expected rows computed from the SOURCE index arrays
    and palettes - the oracle never invokes the LZW decoder, so the
    registry check is a true encoder->decoder round-trip test."""
    rows = []
    for name, sw, sh, gpal, frames in _gif_fixtures():
        for fi, fr in enumerate(frames):
            pal = fr.get("palette")
            pal = gpal if pal is None else pal
            rgb = pal[fr["idx"]]
            h, w = fr["idx"].shape
            rows.append(
                "('{}', {}, {}, {}, {}, {}, {}, {}, {}, {}, {}, {}, {}, '{}')".format(
                    name, fi, sw, sh, w, h, fr.get("left", 0),
                    fr.get("top", 0), int(bool(fr.get("interlace"))),
                    int("palette" in fr),
                    fr.get("delay_cs", -1),
                    fr.get("transparent", -1),
                    int(rgb.astype(np.int64).sum()),
                    hashlib.md5(rgb.astype(np.uint8).tobytes()).hexdigest(),
                )
            )
    cols = ", ".join(c.split(" ")[0] for c in GIF_DECODE_SCHEMA.split(", "))
    return (
        f"SELECT {cols} FROM (VALUES {', '.join(rows)}) AS t({cols})"
    )


GIF_DECODE_ORACLE_SQL = _gif_oracle()
