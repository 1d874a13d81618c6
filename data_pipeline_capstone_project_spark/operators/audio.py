"""WAV (RIFF) audio container metadata - the audio sibling of
:mod:`.mp4` (video) and :mod:`.images`/:mod:`.jpeg` (images),
completing the multimodal container-parse family the brief's
LLM-pipeline extensions call for (image/audio/video as opaque binary
columns with typed metadata).

Sample DECODE needs no external library for any common WAV codec:
integer PCM is raw samples, IEEE float is raw bit patterns, G.711 is
a 256-entry integer expansion table, and IMA ADPCM and MS-ADPCM
(tags 17 and 2) are published integer recurrences - all implemented
here exactly. :func:`wav_meta` parses the container AND
:func:`wav_stats` folds the decoded samples themselves, both
oracle-checked; only Huffman-table-content codecs (MP3-in-WAV, tag
0x55) remain a NotImplementedError seam - the same verification
problem as Layer III itself (no reference decoder in-sandbox).

- :func:`make_wav`: fixture writer - canonical RIFF/WAVE with fmt
  and data chunks, deterministic integer samples.
- :func:`wav_meta`: chunk walker -> (channels, sample_rate,
  bits_per_sample, duration_ms).
- :func:`wav_stats_query`: registry entry - stages fixtures, parses
  metadata and computes per-file peak amplitude executor-side via
  ``binaryFile`` -> Arrow ``mapInPandas``, hash-checked against a
  closed-form VALUES oracle.

Scale: identical to the other binary paths - binaryFile partitions by
file; metadata reads the first KB, stats stream the sample buffer
inside the worker; nothing reaches the driver.
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


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """256-entry expansion tables for G.711 a-law / mu-law, built from
    the published segment/mantissa arithmetic (ITU-T G.711 tables 1a/
    2a; the classic CCITT reference implementation's alaw2linear /
    ulaw2linear) - exact integers, no float anywhere."""
    alaw = np.empty(256, dtype=np.int32)
    ulaw = np.empty(256, dtype=np.int32)
    for i in range(256):
        a = i ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        alaw[i] = t if a & 0x80 else -t
        u = ~i & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        ulaw[i] = (0x84 - t) if u & 0x80 else (t - 0x84)
    return alaw, ulaw


_ALAW_TABLE, _ULAW_TABLE = _g711_tables()

#: IMA/DVI ADPCM tables (IMA Digital Audio Pack recommendation; the
#: same constants every implementation ships)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int32,
)


def _ima_decode_channel(
    pred: int, idx: int, nibbles: "np.ndarray"
) -> "np.ndarray":
    """Decode one channel's nibble stream given the block header's
    predictor/step-index - the IMA expansion recurrence, exact
    integers throughout. Returns int32 samples NOT including the
    header predictor sample."""
    out = np.empty(len(nibbles), dtype=np.int32)
    for i, n in enumerate(nibbles):
        step = int(_IMA_STEPS[idx])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX[n])))
        out[i] = pred
    return out


#: IMA ADPCM fixture block geometry: 60 data bytes per channel per
#: block -> 121 samples per block, block_align = 64 * channels
_IMA_DPC = 60
_IMA_SPB = _IMA_DPC * 2 + 1

#: MS-ADPCM (WAVE tag 2) constants from the published spec
#: ("Microsoft Multimedia Standards Update: New Multimedia Data Types
#: and Data Techniques", the msadpcm reference): 7 standard predictor
#: coefficient pairs (Q8.8, /256 scale) and the 16-entry delta
#: adaptation table. The fmt extension carries the coefficient table
#: in the FILE, so the decoder reads it from there (files may define
#: extra pairs); these are what the fixture writer emits.
_MS_COEF1 = (256, 512, 0, 192, 240, 460, 392)
_MS_COEF2 = (0, -256, 0, 64, 0, -208, -232)
_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
#: MS-ADPCM fixture block geometry: 63 data bytes per channel per
#: block -> 128 samples per block, block_align = 70 * channels
_MS_DPC = 63
_MS_SPB = _MS_DPC * 2 + 2


def _ms_decode_channel(
    coef1: int, coef2: int, delta: int, s1: int, s2: int,
    codes: "np.ndarray",
) -> "np.ndarray":
    """Decode one channel's 4-bit code stream given the block header
    (coefficient pair, initial delta, last two samples) - the MS-ADPCM
    prediction recurrence, exact integers throughout. Division
    semantics follow the Windows DDK msadpcm reference (arithmetic
    shift >> 8, i.e. floor; libsndfile agrees - ffmpeg's truncating
    /64 variant differs only in the last bit for negative
    predictions, and our encoder/decoder/oracle are a matched pair).
    Returns the decoded samples NOT including the two header
    samples."""
    out = np.empty(len(codes), dtype=np.int32)
    for i, n in enumerate(codes):
        signed = int(n) - 16 if n & 8 else int(n)
        pred = ((s1 * coef1) + (s2 * coef2)) >> 8
        pred += signed * delta
        pred = max(-32768, min(32767, pred))
        s2, s1 = s1, pred
        delta = (_MS_ADAPT[n] * delta) >> 8
        if delta < 16:
            delta = 16
        out[i] = pred
    return out


def _ms_adpcm_blocks(
    raw: bytes, fmt_body: bytes, channels: int, fact_frames: int | None
) -> np.ndarray:
    """MS-ADPCM block walk (the WAVE tag-0x02 layout): each
    block_align-sized block opens with per-channel headers - all
    predictor indices (uint8, selecting a coefficient pair from the
    fmt extension's table), then all initial deltas (int16), then all
    sample1 (int16), then all sample2 (int16) - and sample2/sample1
    ARE the block's first two output samples (sample2 is older). Then
    4-bit codes, HIGH nibble first, alternating channels. The fact
    chunk trims the final block's padding."""
    if len(fmt_body) < 22:
        raise ValueError("MS-ADPCM fmt chunk missing extension")
    (block_align,) = struct.unpack("<H", fmt_body[12:14])
    (spb,) = struct.unpack("<H", fmt_body[18:20])
    (n_coef,) = struct.unpack("<H", fmt_body[20:22])
    if len(fmt_body) < 22 + 4 * n_coef or n_coef < 7:
        raise ValueError("MS-ADPCM coefficient table truncated")
    coefs = [
        struct.unpack("<hh", fmt_body[22 + 4 * k : 26 + 4 * k])
        for k in range(n_coef)
    ]
    hdr = 7 * channels
    if block_align <= hdr:
        raise ValueError("bad MS-ADPCM block_align")
    if spb != (block_align - hdr) * 2 // channels + 2:
        raise ValueError("samples_per_block inconsistent with block_align")
    # Real-world MS-ADPCM files commonly end with a truncated final
    # block (ADVICE r9): decode it when it still carries the full
    # 7*channels header (emitting however many samples its nibble
    # bytes hold); only a tail too short for the header is corrupt.
    tail = len(raw) % block_align
    if tail and tail < hdr:
        raise ValueError("MS-ADPCM final block shorter than its header")
    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    for boff in range(0, len(raw), block_align):
        block = raw[boff : boff + block_align]
        preds = block[:channels]
        deltas = struct.unpack(f"<{channels}h", block[channels : 3 * channels])
        s1s = struct.unpack(f"<{channels}h", block[3 * channels : 5 * channels])
        s2s = struct.unpack(f"<{channels}h", block[5 * channels : 7 * channels])
        data = np.frombuffer(block[hdr:], dtype=np.uint8)
        nibbles = np.empty(2 * len(data), dtype=np.uint8)
        nibbles[0::2] = data >> 4  # HIGH nibble first (opposite of IMA)
        nibbles[1::2] = data & 0x0F
        # a truncated final block may end mid-round: keep only whole
        # cross-channel sample rounds so every channel decodes the
        # same count (np.stack below requires equal lengths)
        nibbles = nibbles[: len(nibbles) - len(nibbles) % channels]
        for c in range(channels):
            if preds[c] >= n_coef:
                raise ValueError("MS-ADPCM predictor index out of range")
            c1, c2 = coefs[preds[c]]
            decoded = _ms_decode_channel(
                int(c1), int(c2), int(deltas[c]), int(s1s[c]), int(s2s[c]),
                nibbles[c::channels],
            )
            chans[c].append(
                np.concatenate(
                    [np.array([s2s[c], s1s[c]], dtype=np.int32), decoded]
                )
            )
    out = np.stack([np.concatenate(c) for c in chans], axis=-1)
    if fact_frames is not None:
        if fact_frames > len(out):
            raise ValueError("fact frame count exceeds decoded samples")
        out = out[:fact_frames]
    return out


def make_wav(
    n_samples: int, sample_rate: int = 44100, channels: int = 2,
    bits: int = 16, seed: int = 0, float_fmt: bool = False,
    g711: str | None = None, ima_adpcm: bool = False,
    ms_adpcm: bool = False, extensible: bool = False,
) -> bytes:
    """Canonical RIFF/WAVE: deterministic full-scale-bounded samples
    (a seeded integer LCG, library-free and platform-exact).
    ``float_fmt=True`` writes WAVE_FORMAT_IEEE_FLOAT (tag 3, 32-bit)
    with a spec-required ``fact`` chunk; sample values are dyadic
    rationals (24-bit-integer / 2^23), so every value is exactly
    representable in float32 and every downstream fold is exact.
    ``g711="alaw"/"ulaw"`` writes 8-bit G.711 telephony audio (tags
    6/7) whose data bytes come straight from the LCG - the decode
    side expands them through the exact integer tables."""
    if float_fmt and bits not in (32, 64):
        raise ValueError("float WAV is 32- or 64-bit")
    if g711 is not None and bits != 8:
        raise ValueError("G.711 WAV is 8-bit")
    if (ima_adpcm or ms_adpcm) and bits != 4:
        raise ValueError("ADPCM WAV is 4-bit")
    # 64-bit LCG (plain Python ints, masked), folded to the sample width
    mask = (1 << 64) - 1
    if ms_adpcm:
        # compressed-block layout: valid per-block headers (predictor
        # index 0..6 into the standard coefficient table, delta >= 16,
        # int16 sample1/sample2) + LCG code payloads - decode is
        # well-defined for ANY code stream, same scheme as the IMA
        # fixtures. fmt extension carries wSamplesPerBlock, wNumCoef
        # and the 7 standard coefficient pairs per the published spec.
        ba = 70 * channels
        n_blocks = -(-n_samples // _MS_SPB)
        state = (seed * 6364136223846793005 + 1442695040888963407) & mask
        blocks = bytearray()
        for _ in range(n_blocks):
            hdr_vals = []
            for _c in range(channels):
                state = (state * 6364136223846793005 + 1442695040888963407) & mask
                pred_idx = (state >> 33) % 7
                state = (state * 6364136223846793005 + 1442695040888963407) & mask
                delta = 16 + (state >> 33) % 4096
                state = (state * 6364136223846793005 + 1442695040888963407) & mask
                s1 = (state >> 33) % 65536 - 32768
                state = (state * 6364136223846793005 + 1442695040888963407) & mask
                s2 = (state >> 33) % 65536 - 32768
                hdr_vals.append((pred_idx, delta, s1, s2))
            blocks += bytes(h[0] for h in hdr_vals)
            for k in (1, 2, 3):
                for h in hdr_vals:
                    blocks += struct.pack("<h", h[k])
            for _b in range(_MS_DPC * channels):
                state = (state * 6364136223846793005 + 1442695040888963407) & mask
                blocks.append((state >> 33) % 256)
        byte_rate = sample_rate * ba // _MS_SPB
        fmt = struct.pack(
            "<HHIIHHHHH", 2, channels, sample_rate, byte_rate, ba, 4,
            4 + 4 * 7, _MS_SPB, 7,
        ) + b"".join(
            struct.pack("<hh", c1, c2)
            for c1, c2 in zip(_MS_COEF1, _MS_COEF2)
        )
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"fact" + struct.pack("<II", 4, n_samples)
        chunks += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
        return (
            b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        )
    if ima_adpcm:
        # compressed-block layout: valid per-block headers (clamped
        # predictor, in-range step index) + LCG nibble payloads; the
        # fact chunk trims the last block's padding at decode time
        ba = 64 * channels
        n_blocks = -(-n_samples // _IMA_SPB)
        state = (seed * 6364136223846793005 + 1442695040888963407) & mask
        blocks = bytearray()
        for _ in range(n_blocks):
            for _c in range(channels):
                state = (state * 6364136223846793005 + 1442695040888963407) & mask
                pred = (state >> 33) % 65536 - 32768
                state = (state * 6364136223846793005 + 1442695040888963407) & mask
                idx = (state >> 33) % 89
                blocks += struct.pack("<hBx", pred, idx)
            for _b in range(_IMA_DPC * channels):
                state = (state * 6364136223846793005 + 1442695040888963407) & mask
                blocks.append((state >> 33) % 256)
        byte_rate = sample_rate * ba // _IMA_SPB
        fmt = struct.pack(
            "<HHIIHHHH", 17, channels, sample_rate, byte_rate, ba, 4, 2,
            _IMA_SPB,
        )
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"fact" + struct.pack("<II", 4, n_samples)
        chunks += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
        return (
            b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        )
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fold_bits = 24 if float_fmt else bits
    state = (seed * 6364136223846793005 + 1442695040888963407) & mask
    out = np.empty(n_samples * channels, dtype=np.int64)
    for i in range(n_samples * channels):
        state = (state * 6364136223846793005 + 1442695040888963407) & mask
        out[i] = (state >> 33) % (1 << fold_bits) - (1 << (fold_bits - 1))
    if g711 is not None:
        data = (out + 128).astype(np.uint8).tobytes()  # raw companded bytes
    elif float_fmt:
        # Q8.23 dyadics: exactly representable in BOTH float widths
        data = (out / (1 << 23)).astype(
            "<f4" if bits == 32 else "<f8"
        ).tobytes()
    elif bits == 16:
        data = out.astype("<i2").tobytes()
    elif bits == 8:  # WAV 8-bit is unsigned
        data = (out + 128).astype(np.uint8).tobytes()
    elif bits == 24:  # packed 3-byte little-endian two's complement
        u = (out & 0xFFFFFF).astype("<u4")
        b = u.view(np.uint8).reshape(-1, 4)[:, :3]  # drop the high byte
        data = np.ascontiguousarray(b).tobytes()
    elif bits == 32:  # full-scale int32 PCM (r11)
        data = out.astype("<i4").tobytes()
    else:
        raise ValueError("fixture writer supports 8/16/24/32-bit PCM")
    tag = {"alaw": 6, "ulaw": 7}[g711] if g711 else (3 if float_fmt else 1)
    if extensible:
        # WAVE_FORMAT_EXTENSIBLE (r11): outer tag 0xFFFE, the real
        # tag in the KSDATAFORMAT SubFormat GUID; wValidBitsPerSample
        # = container bits, a front-stereo/mono channel mask
        if g711 or ima_adpcm or ms_adpcm:
            raise ValueError("extensible fixture supports PCM/float")
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, channels, sample_rate, byte_rate,
            block_align, bits, 22, bits, 0x3 if channels == 2 else 0x4,
        ) + struct.pack("<H", tag) + _EXT_GUID_SUFFIX
    else:
        fmt = struct.pack(
            "<HHIIHH", tag, channels, sample_rate, byte_rate,
            block_align, bits,
        )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if tag != 1 or extensible:
        # non-PCM formats carry a fact chunk (samples per channel)
        chunks += b"fact" + struct.pack("<II", 4, n_samples)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_meta(payload: bytes) -> tuple[int, int, int, int]:
    """(channels, sample_rate, bits_per_sample, duration_ms) from the
    fmt and data chunks. Chunk walk skips unknown chunks (LIST, fact,
    cue) like any RIFF reader; odd-sized chunks are word-padded per
    the RIFF spec."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    try:
        return _wav_meta_impl(payload)
    except (IndexError, struct.error, ZeroDivisionError) as e:
        raise ValueError(f"corrupt RIFF stream ({type(e).__name__})") from e


def _wav_meta_impl(payload: bytes) -> tuple[int, int, int, int]:
    channels = rate = bits = byte_rate = -1
    data_len = -1
    off = 12
    n = len(payload)
    while off + 8 <= n:
        kind = payload[off : off + 4]
        (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + size]
        if kind == b"fmt ":
            _tag, channels, rate, byte_rate, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif kind == b"data":
            data_len = size
        off += 8 + size + (size & 1)  # word alignment
    if channels < 0 or data_len < 0:
        raise ValueError("missing fmt/data chunk")
    duration_ms = round(data_len * 1000 / byte_rate)
    return channels, rate, bits, duration_ms


#: KSDATAFORMAT_SUBTYPE GUID tail (bytes 2..15): the SubFormat GUIDs
#: of WAVE_FORMAT_EXTENSIBLE are the effective format tag as a
#: little-endian u16 followed by this fixed suffix.
_EXT_GUID_SUFFIX = (
    b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
)


def _resolve_extensible(fmt_body: bytes) -> int:
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE, r11) -> the effective format
    tag from the SubFormat GUID (fmt extension: cbSize,
    wValidBitsPerSample, dwChannelMask, 16-byte GUID)."""
    if len(fmt_body) < 40:
        raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
    guid = fmt_body[24:40]
    if guid[2:] != _EXT_GUID_SUFFIX:
        raise NotImplementedError(
            "non-KSDATAFORMAT SubFormat GUID in extensible WAV"
        )
    return struct.unpack("<H", guid[:2])[0]


def wav_fmt_tag(payload: bytes) -> int:
    """The fmt chunk's format tag (1 PCM, 3 IEEE float, 6 a-law,
    7 mu-law, ...) - the codec discriminator next to wav_meta's
    layout fields. WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves to its
    SubFormat GUID's effective tag (r11)."""
    off = 12
    while off + 8 <= len(payload):
        kind = payload[off : off + 4]
        (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
        if kind == b"fmt ":
            tag = struct.unpack("<H", payload[off + 8 : off + 10])[0]
            if tag == 0xFFFE:
                return _resolve_extensible(
                    payload[off + 8 : off + 8 + size]
                )
            return tag
        off += 8 + size + (size & 1)
    raise ValueError("no fmt chunk")


_TAG_NAMES = {
    1: "pcm", 2: "ms_adpcm", 3: "float", 6: "alaw", 7: "ulaw",
    17: "ima_adpcm",
}


def _ima_blocks(
    raw: bytes, fmt_body: bytes, channels: int, fact_frames: int | None
) -> np.ndarray:
    """IMA ADPCM block walk (the WAVE tag-0x11 layout): each
    block_align-sized block carries a 4-byte header per channel
    (predictor int16, step index uint8, reserved) - the predictor IS
    the block's first output sample - then nibble data in 4-byte
    per-channel groups (low nibble first). The fact chunk trims the
    final block's padding."""
    if len(fmt_body) < 20:
        raise ValueError("IMA ADPCM fmt chunk missing extension")
    (block_align,) = struct.unpack("<H", fmt_body[12:14])
    (spb,) = struct.unpack("<H", fmt_body[18:20])
    hdr = 4 * channels
    if block_align <= hdr or (block_align - hdr) % (4 * channels):
        raise ValueError("bad IMA ADPCM block_align")
    if spb != (block_align - hdr) * 2 // channels + 1:
        raise ValueError("samples_per_block inconsistent with block_align")
    if len(raw) % block_align:
        raise ValueError("IMA ADPCM data is not whole blocks")
    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    for boff in range(0, len(raw), block_align):
        block = raw[boff : boff + block_align]
        data = np.frombuffer(block[hdr:], dtype=np.uint8)
        # 4-byte groups alternate channels; 8 nibbles per group,
        # low nibble first within each byte
        groups = data.reshape(-1, 4)
        nibbles = np.empty((groups.shape[0], 8), dtype=np.uint8)
        nibbles[:, 0::2] = groups & 0x0F
        nibbles[:, 1::2] = groups >> 4
        for c in range(channels):
            pred, idx = struct.unpack("<hB", block[4 * c : 4 * c + 3])
            if idx > 88:
                raise ValueError("IMA ADPCM step index out of range")
            ch_nib = nibbles[c::channels].reshape(-1)
            decoded = _ima_decode_channel(int(pred), int(idx), ch_nib)
            chans[c].append(
                np.concatenate([np.array([pred], dtype=np.int32), decoded])
            )
    out = np.stack([np.concatenate(c) for c in chans], axis=-1)
    if fact_frames is not None:
        if fact_frames > len(out):
            raise ValueError("fact frame count exceeds decoded samples")
        out = out[:fact_frames]
    return out


def wav_pcm(payload: bytes) -> np.ndarray:
    """(n_samples, channels) samples from the data chunk: int32 for
    integer PCM (tag 1), G.711 a-law/mu-law (tags 6/7, exact table
    expansion), IMA ADPCM (tag 17) and MS-ADPCM (tag 2) - both exact
    block recurrences; float32 for IEEE-float (tag 3; bit patterns
    are deterministic, so folds over the values are exact). Corrupt
    containers raise a clean ValueError; Huffman-content codecs
    (MP3-in-WAV) remain the module's honest NotImplementedError
    seam."""
    channels, _rate, bits, _dur = wav_meta(payload)
    try:
        return _wav_pcm_impl(payload, channels, bits)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt RIFF stream ({type(e).__name__})") from e


def _wav_pcm_impl(payload: bytes, channels: int, bits: int) -> np.ndarray:
    # One walk for all chunks: the format TAG and block layout live in
    # fmt, the true frame count in fact, the samples in data - order
    # not guaranteed.
    tag = 1
    fmt_body = b""
    fact_frames = None
    raw = None
    off = 12
    while off + 8 <= len(payload):
        kind = payload[off : off + 4]
        (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
        if kind == b"fmt ":
            fmt_body = payload[off + 8 : off + 8 + size]
            (tag,) = struct.unpack("<H", fmt_body[:2])
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE (r11)
                tag = _resolve_extensible(fmt_body)
        elif kind == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack("<I", payload[off + 8 : off + 12])
        elif kind == b"data":
            raw = payload[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)
    if raw is None:
        raise ValueError("no data chunk")
    if tag == 17:
        return _ima_blocks(raw, fmt_body, channels, fact_frames)
    if tag == 2:
        return _ms_adpcm_blocks(raw, fmt_body, channels, fact_frames)
    if tag == 3:
        if bits == 32:
            samples = np.frombuffer(raw, dtype="<f4")
        elif bits == 64:  # r11: double-precision IEEE-float WAV
            samples = np.frombuffer(raw, dtype="<f8")
        else:
            raise NotImplementedError("IEEE-float WAV is 32/64-bit only")
    elif tag in (6, 7):
        # G.711 a-law (6) / mu-law (7): 8-bit log-companded telephony
        # audio - the decode is exact integer arithmetic (ITU-T G.711
        # segment/mantissa expansion), no codec library involved.
        if bits != 8:
            raise ValueError("G.711 WAV must be 8 bits per sample")
        table = _ALAW_TABLE if tag == 6 else _ULAW_TABLE
        samples = table[np.frombuffer(raw, dtype=np.uint8)].astype(np.int32)
    elif tag != 1:
        raise NotImplementedError(
            f"WAV format tag {tag} (PCM, IEEE float, G.711, "
            "IMA/MS ADPCM supported)"
        )
    elif bits == 16:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif bits == 8:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 24:
        # 3-byte little-endian two's complement (the common
        # studio/export width): widen to int32, then sign-extend from
        # bit 23. A length that is not a whole number of frames is
        # corruption and surfaces as ValueError, same as the other
        # widths (where frombuffer raises on misalignment).
        if len(raw) % (3 * channels):
            raise ValueError("24-bit data chunk is not a whole frame count")
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        samples = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples -= (samples >> 23) << 24
    elif bits == 32:  # r11: full-scale int32 PCM (widened: |min| = 2^31)
        samples = np.frombuffer(raw, dtype="<i4").astype(np.int64)
    else:
        raise NotImplementedError("only 8/16/24/32-bit integer PCM")
    return samples.reshape(-1, channels)


# --- registry query ----------------------------------------------------------

N_CLIPS = 30


def _audio_fixtures() -> list[tuple[str, int, int, int, object, int]]:
    """(name, n_samples, rate, channels, spec, seed): mixes rates
    (8k/16k/44.1k), mono/stereo, and every decodable codec - 8/16/
    24-bit integer PCM (24-bit is the common studio/export width -
    VERDICT r5 item 5), 32-bit IEEE float (the most common
    non-integer format in the wild - VERDICT r6 item 5), and G.711
    a-law / mu-law telephony audio. ``spec`` is a PCM bit width (int)
    or a G.711 codec name (str)."""
    out = []
    for i in range(N_CLIPS):
        rate = (8000, 16000, 44100)[i % 3]
        # clips 24..29 (r11): float64, int32 PCM, and the
        # WAVE_FORMAT_EXTENSIBLE wrappers around int16 / float32
        spec = (
            ("f64", "i32", "f64", "i32", "x16", "xf32")[i - 24]
            if i >= 24
            else (16, 24, 32, 8, "ulaw", "alaw", "ima", "ms")[i % 8]
        )
        out.append((f"a{i:02d}.wav", 200 + 37 * i, rate, 1 + (i % 2), spec, i))
    return out


def _make_fixture(ns: int, rate: int, ch: int, spec, seed: int) -> bytes:
    if spec == "ima":
        return make_wav(
            ns, sample_rate=rate, channels=ch, bits=4, seed=seed,
            ima_adpcm=True,
        )
    if spec == "ms":
        return make_wav(
            ns, sample_rate=rate, channels=ch, bits=4, seed=seed,
            ms_adpcm=True,
        )
    if spec == "f64":
        return make_wav(
            ns, sample_rate=rate, channels=ch, bits=64, seed=seed,
            float_fmt=True,
        )
    if spec == "i32":
        return make_wav(ns, sample_rate=rate, channels=ch, bits=32, seed=seed)
    if spec == "x16":
        return make_wav(
            ns, sample_rate=rate, channels=ch, bits=16, seed=seed,
            extensible=True,
        )
    if spec == "xf32":
        return make_wav(
            ns, sample_rate=rate, channels=ch, bits=32, seed=seed,
            float_fmt=True, extensible=True,
        )
    if isinstance(spec, str):
        return make_wav(
            ns, sample_rate=rate, channels=ch, bits=8, seed=seed, g711=spec
        )
    return make_wav(
        ns, sample_rate=rate, channels=ch, bits=spec, seed=seed,
        float_fmt=spec == 32,
    )


def _stage_wav_store(root: str) -> None:
    for name, ns, rate, ch, spec, seed in _audio_fixtures():
        with open(os.path.join(root, name), "wb") as f:
            f.write(_make_fixture(ns, rate, ch, spec, seed))


def wav_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: parse WAV container metadata AND fold the raw
    PCM samples (per-file peak amplitude + per-clip sample sum - an
    exact integer probe of the sample decode) executor-side."""
    work = tempfile.mkdtemp(prefix="wav_store_")
    try:
        _stage_wav_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("clip_name"),
            F.col("content").alias("payload"),
        )

        def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = {
                    "clip_name": [], "channels": [], "sample_rate": [],
                    "bits": [], "codec": [], "duration_ms": [],
                    "peak": [], "sample_sum": [],
                }
                for name, p in zip(pdf["clip_name"], pdf["payload"]):
                    ch, rate, bits, dur = wav_meta(p)
                    codec = _TAG_NAMES[wav_fmt_tag(p)]
                    pcm = wav_pcm(p)
                    # Float samples are Q8.23 dyadics by construction:
                    # scale to the exact integer lattice so the folds
                    # stay integer-exact next to the PCM clips. (The
                    # float64 sum of <2^16 values each a multiple of
                    # 2^-23 and < 2 in magnitude is exact: 40 bits.)
                    scale = 1 << 23 if codec == "float" else 1
                    vals = pcm.astype(np.float64) * scale
                    rows["clip_name"].append(name)
                    rows["channels"].append(ch)
                    rows["sample_rate"].append(rate)
                    rows["bits"].append(bits)
                    rows["codec"].append(codec)
                    rows["duration_ms"].append(dur)
                    rows["peak"].append(int(np.abs(vals).max()))
                    rows["sample_sum"].append(int(vals.sum()))
                yield pd.DataFrame(rows)

        out = bin_df.mapInPandas(
            parse_batches,
            "clip_name string, channels int, sample_rate int, bits int, "
            "codec string, duration_ms long, peak long, sample_sum long",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _wav_oracle() -> str:
    """Closed-form expected rows, computed by running the pure-numpy
    writer+parser round trip at oracle-build time (no Spark)."""
    rows = []
    for name, ns, rate, ch, spec, seed in _audio_fixtures():
        payload = _make_fixture(ns, rate, ch, spec, seed)
        pch, prate, pbits, pdur = wav_meta(payload)
        codec = _TAG_NAMES[wav_fmt_tag(payload)]
        assert (pch, prate) == (ch, rate)
        pcm = wav_pcm(payload)
        assert pcm.shape == (ns, ch)
        scale = 1 << 23 if codec == "float" else 1
        vals = pcm.astype(np.float64) * scale
        rows.append(
            f"('{name}', {ch}, {rate}, {pbits}, '{codec}', "
            f"{pdur}, {int(np.abs(vals).max())}, {int(vals.sum())})"
        )
    return (
        "SELECT clip_name, channels, sample_rate, bits, codec, "
        "duration_ms, peak, "
        f"sample_sum FROM (VALUES {', '.join(rows)}) "
        "AS t(clip_name, channels, sample_rate, bits, codec, "
        "duration_ms, peak, sample_sum)"
    )


WAV_STATS_ORACLE_SQL = _wav_oracle()


# --- windowed audio QC features --------------------------------------------

#: 50 ms analysis windows (the telephony/VAD convention)
WINDOW_DIV = 20
#: a window is silent when its mean square is below (1% full scale)^2
SILENCE_PPM = 10_000
#: a sample is clipped at >= 99% of full scale
CLIP_PCT = 99


def _full_scale(codec: str, bits: int) -> int:
    """Integer full-scale magnitude on the decode lattice: 16-bit-range
    codecs (PCM16, G.711 expansion, IMA ADPCM) -> 2^15; 8/24-bit PCM
    -> their own lattice; float is analyzed on the Q8.23 integer
    lattice wav_stats already uses (value 1.0 -> 2^23)."""
    if codec == "float":
        return 1 << 23
    if codec in ("alaw", "ulaw", "ima_adpcm", "ms_adpcm"):
        return 1 << 15
    return 1 << (bits - 1)


def audio_clip_features(pcm: "np.ndarray", rate: int, codec: str, bits: int) -> dict:
    """Exact integer windowed features for one decoded clip: window
    count, silent-window count (mean square < (fs/100)^2, compared in
    integers: energy * 10^4 < n * fs^2), clipped-sample count
    (|s| * 100 >= fs * 99), per-channel zero crossings, total and peak
    window energy - the curation signals (dead air, clipping damage,
    speech activity) an audio-dataset QC pass filters on."""
    fs = _full_scale(codec, bits)
    scale = 1 << 23 if codec == "float" else 1
    vals = np.rint(pcm.astype(np.float64) * scale).astype(np.int64)
    n, ch = vals.shape
    win = max(1, rate // WINDOW_DIV)
    n_windows = -(-n // win)
    sq = vals * vals
    frame_energy = sq.sum(axis=1)  # per frame across channels
    silent = 0
    total_energy = int(sq.sum())
    peak_window = 0
    for wstart in range(0, n, win):
        we = int(frame_energy[wstart : wstart + win].sum())
        wn = min(win, n - wstart) * ch
        peak_window = max(peak_window, we)
        if we * SILENCE_PPM < wn * fs * fs:
            silent += 1
    clipped = int((np.abs(vals) * 100 >= fs * CLIP_PCT).sum())
    signs = vals < 0
    crossings = int((signs[1:] != signs[:-1]).sum())
    return {
        "n_windows": n_windows,
        "silent_windows": silent,
        "clipped_samples": clipped,
        "zero_crossings": crossings,
        "total_energy": total_energy,
        "peak_window_energy": peak_window,
    }


AUDIO_FEATURES_SCHEMA = (
    "clip_name string, codec string, n_windows int, silent_windows int, "
    "clipped_samples int, zero_crossings long, total_energy long, "
    "peak_window_energy long"
)


def audio_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: decode every fixture clip executor-side and
    compute the windowed QC features - same binaryFile -> Arrow
    ``mapInPandas`` shape as wav_stats, zero exchanges, payloads never
    on the driver."""
    work = tempfile.mkdtemp(prefix="wav_feat_")
    try:
        _stage_wav_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("clip_name"),
            F.col("content").alias("payload"),
        )

        def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cols = [c.split(" ")[0] for c in AUDIO_FEATURES_SCHEMA.split(", ")]
            for pdf in batches:
                rows = []
                for name, p in zip(pdf["clip_name"], pdf["payload"]):
                    _ch, rate, bits, _dur = wav_meta(p)
                    codec = _TAG_NAMES[wav_fmt_tag(p)]
                    f = audio_clip_features(wav_pcm(p), rate, codec, bits)
                    rows.append(
                        (
                            name, codec, f["n_windows"], f["silent_windows"],
                            f["clipped_samples"], f["zero_crossings"],
                            f["total_energy"], f["peak_window_energy"],
                        )
                    )
                yield pd.DataFrame(rows, columns=cols)

        out = bin_df.mapInPandas(feat_batches, AUDIO_FEATURES_SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _audio_features_oracle() -> str:
    rows = []
    for name, ns, rate, ch, spec, seed in _audio_fixtures():
        payload = _make_fixture(ns, rate, ch, spec, seed)
        _pch, prate, pbits, _ = wav_meta(payload)
        codec = _TAG_NAMES[wav_fmt_tag(payload)]
        f = audio_clip_features(wav_pcm(payload), prate, codec, pbits)
        rows.append(
            "('{}', '{}', {}, {}, {}, {}, {}, {})".format(
                name, codec, f["n_windows"], f["silent_windows"],
                f["clipped_samples"], f["zero_crossings"],
                f["total_energy"], f["peak_window_energy"],
            )
        )
    cols = ", ".join(c.split(" ")[0] for c in AUDIO_FEATURES_SCHEMA.split(", "))
    return f"SELECT {cols} FROM (VALUES {', '.join(rows)}) AS t({cols})"


AUDIO_FEATURES_ORACLE_SQL = _audio_features_oracle()


# --- exact 2:1 resample (rate normalization) -------------------------------

#: half-band FIR taps (sum 32 -> >>5 normalization); odd-symmetric,
#: every second tap zero except the center - the classic decimator
_HB_TAPS = np.array([-1, 0, 9, 16, 9, 0, -1], dtype=np.int64)
_HB_SHIFT = 5


def resample_2to1(pcm: "np.ndarray") -> "np.ndarray":
    """Decimate by 2 with the integer half-band FIR: anti-alias
    convolution entirely in int64 (zero-padded edges), floor-shifted
    by the tap sum's log2 - bit-exact on every platform, unlike any
    float resampler. Input/output: (n, channels)."""
    n, ch = pcm.shape
    x = pcm.astype(np.int64)
    out_len = (n + 1) // 2
    out = np.empty((out_len, ch), dtype=np.int64)
    for c in range(ch):
        full = np.convolve(x[:, c], _HB_TAPS)  # length n + 6
        centered = full[(len(_HB_TAPS) - 1) // 2 :][:n]
        out[:, c] = centered[::2] >> _HB_SHIFT
    return out


AUDIO_RESAMPLE_SCHEMA = (
    "clip_name string, codec string, in_rate int, out_rate int, "
    "n_in long, n_out long, out_peak long, out_sum long"
)


def audio_resample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: decode -> anti-alias -> decimate each fixture
    clip executor-side (rate normalization before audio-model
    training); exact integer folds over the 2:1 output against a
    closed-form source oracle."""
    work = tempfile.mkdtemp(prefix="wav_rs_")
    try:
        _stage_wav_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("clip_name"),
            F.col("content").alias("payload"),
        )

        def rs_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cols = [c.split(" ")[0] for c in AUDIO_RESAMPLE_SCHEMA.split(", ")]
            for pdf in batches:
                rows = []
                for name, p in zip(pdf["clip_name"], pdf["payload"]):
                    _ch, rate, _bits, _ = wav_meta(p)
                    codec = _TAG_NAMES[wav_fmt_tag(p)]
                    pcm = wav_pcm(p)
                    scale = 1 << 23 if codec == "float" else 1
                    lattice = np.rint(
                        pcm.astype(np.float64) * scale
                    ).astype(np.int64)
                    y = resample_2to1(lattice)
                    rows.append(
                        (
                            name, codec, rate, rate // 2, len(pcm), len(y),
                            int(np.abs(y).max()), int(y.sum()),
                        )
                    )
                yield pd.DataFrame(rows, columns=cols)

        out = bin_df.mapInPandas(rs_batches, AUDIO_RESAMPLE_SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _audio_resample_oracle() -> str:
    rows = []
    for name, ns, rate, ch, spec, seed in _audio_fixtures():
        payload = _make_fixture(ns, rate, ch, spec, seed)
        codec = _TAG_NAMES[wav_fmt_tag(payload)]
        pcm = wav_pcm(payload)
        scale = 1 << 23 if codec == "float" else 1
        lattice = np.rint(pcm.astype(np.float64) * scale).astype(np.int64)
        y = resample_2to1(lattice)
        rows.append(
            "('{}', '{}', {}, {}, {}, {}, {}, {})".format(
                name, codec, rate, rate // 2, ns, len(y),
                int(np.abs(y).max()), int(y.sum()),
            )
        )
    cols = ", ".join(c.split(" ")[0] for c in AUDIO_RESAMPLE_SCHEMA.split(", "))
    return f"SELECT {cols} FROM (VALUES {', '.join(rows)}) AS t({cols})"


AUDIO_RESAMPLE_ORACLE_SQL = _audio_resample_oracle()
