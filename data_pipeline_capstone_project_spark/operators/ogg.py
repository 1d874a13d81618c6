"""Ogg container metadata with Opus/Vorbis stream headers, from the
published specs (RFC 3533 Ogg encapsulation; RFC 7845 Ogg-Opus;
Vorbis I specification, Xiph.org).

Completes the media-container family next to ISO BMFF
(:mod:`operators.mp4`) and EBML/WebM (:mod:`operators.ebml`): Ogg is
the container podcast/voice corpora ship Opus audio in. Scope is the
same honest line as the siblings: page walk, integrity check, packet
reassembly, codec identification headers - no Opus/Vorbis sample
decode (the documented external-library seam).

Implemented, all from the RFCs:

* page structure (RFC 3533 §6): 'OggS' capture, version 0, header
  flags (continued / BOS / EOS), 64-bit granule position, serial,
  sequence number, CRC, segment lacing table;
* page CRC-32: polynomial 0x04C11D7B per RFC 3533 — direct
  (non-reflected) algorithm, zero init, zero xorout, computed with
  the CRC field zeroed; every fixture page is verified on parse and
  a tamper test must fail;
* packet reassembly from lacing values (255 = continues in the next
  lacing slot; a packet may span pages via the continued flag);
* OpusHead / OpusTags (RFC 7845 §5): version, channels, pre-skip,
  input sample rate, output gain, channel mapping family, vendor +
  user comment count; duration from the final granule position
  (always 48 kHz ticks for Opus) minus pre-skip;
* Vorbis identification header (Vorbis I §4.2.2): channels, rate;
  duration from the final granule in SAMPLE ticks.

Spark side (``ogg_meta`` registry query): staged fixture store ->
``binaryFile`` -> Arrow ``mapInPandas`` -> one row per file; VALUES
oracle cross-checked against the parser at build time, expected
values hand-derived from the construction parameters.
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


class OggError(ValueError):
    """Malformed Ogg stream."""


# --- page CRC (RFC 3533: direct CRC-32, poly 0x04C11DB7, init/xor 0) --------


def _crc_table() -> list[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        table.append(r)
    return table


_CRC = _crc_table()


def ogg_crc(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC[((r >> 24) & 0xFF) ^ b]
    return r


# --- page write / walk --------------------------------------------------------


def make_page(
    serial: int,
    seq: int,
    granule: int,
    segments: list[bytes],
    continued: bool = False,
    bos: bool = False,
    eos: bool = False,
) -> bytes:
    """One Ogg page from pre-laced segment bodies: each entry in
    ``segments`` is ONE packet's bytes within this page (lacing is
    derived: len//255 full slots + remainder; a trailing empty lacing
    value is emitted for exact multiples, and a segment of 255-multiple
    length with ``continued`` handling is the caller's concern via
    packet splitting in `make_ogg`)."""
    lacing = bytearray()
    body = bytearray()
    for seg in segments:
        n = len(seg)
        lacing += b"\xff" * (n // 255)
        lacing.append(n % 255)
        body += seg
    if len(lacing) > 255:
        raise OggError("more than 255 lacing values in one page")
    flags = (1 if continued else 0) | (2 if bos else 0) | (4 if eos else 0)
    header = (
        b"OggS\x00"
        + bytes([flags])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    page = bytearray(header + body)
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def walk_pages(buf: bytes) -> Iterator[dict]:
    """Yield page dicts (flags, granule, serial, seq, segments as raw
    lacing-value list + body) with CRC verified per page."""
    pos = 0
    n = len(buf)
    while pos < n:
        if buf[pos : pos + 4] != b"OggS":
            raise OggError(f"missing capture pattern at offset {pos}")
        if pos + 27 > n:
            raise OggError("truncated page header")
        if buf[pos + 4] != 0:
            raise OggError(f"unsupported Ogg version {buf[pos + 4]}")
        flags = buf[pos + 5]
        (granule,) = struct.unpack_from("<q", buf, pos + 6)
        serial, seq, crc = struct.unpack_from("<III", buf, pos + 14)
        n_lace = buf[pos + 26]
        lace_end = pos + 27 + n_lace
        if lace_end > n:
            raise OggError("truncated lacing table")
        lacing = list(buf[pos + 27 : lace_end])
        body_len = sum(lacing)
        if lace_end + body_len > n:
            raise OggError("page body overruns stream")
        page = bytearray(buf[pos : lace_end + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise OggError(f"page CRC mismatch at offset {pos}")
        yield {
            "continued": bool(flags & 1),
            "bos": bool(flags & 2),
            "eos": bool(flags & 4),
            "granule": granule,
            "serial": serial,
            "seq": seq,
            "lacing": lacing,
            "body": buf[lace_end : lace_end + body_len],
        }
        pos = lace_end + body_len


def reassemble_packets(pages: list[dict]) -> list[bytes]:
    """Packets from lacing values across pages (RFC 3533 §5: a lacing
    value of 255 means the packet continues; a final 255 on a page
    means it continues on the NEXT page, whose 'continued' flag must
    be set)."""
    packets: list[bytes] = []
    partial = bytearray()
    open_packet = False
    for page in pages:
        if open_packet != page["continued"]:
            raise OggError(
                "continued-flag does not match packet state at page "
                f"{page['seq']}"
            )
        off = 0
        for lv in page["lacing"]:
            partial += page["body"][off : off + lv]
            off += lv
            if lv < 255:
                packets.append(bytes(partial))
                partial = bytearray()
        open_packet = page["lacing"][-1] == 255 if page["lacing"] else open_packet
    if open_packet:
        raise OggError("stream ends mid-packet")
    return packets


# --- codec identification headers ----------------------------------------------


def make_opus_head(channels: int, pre_skip: int, rate: int,
                   gain_q8: int = 0) -> bytes:
    return (
        b"OpusHead\x01" + bytes([channels])
        + struct.pack("<HIh", pre_skip, rate, gain_q8)
        + b"\x00"  # mapping family 0
    )


def make_opus_tags(comments: list[str]) -> bytes:
    vendor = b"dpcs-ogg"
    out = b"OpusTags" + struct.pack("<I", len(vendor)) + vendor
    out += struct.pack("<I", len(comments))
    for c in comments:
        enc = c.encode()
        out += struct.pack("<I", len(enc)) + enc
    return out


def make_vorbis_id(channels: int, rate: int) -> bytes:
    return (
        b"\x01vorbis" + struct.pack("<I", 0)
        + bytes([channels]) + struct.pack("<I", rate)
        + struct.pack("<iii", -1, rate * 8, -1)
        + b"\xb8\x01"  # blocksizes 2^8/2^11 + framing bit
    )


def make_vorbis_comment(comments: list[str]) -> bytes:
    vendor = b"dpcs-ogg"
    out = b"\x03vorbis" + struct.pack("<I", len(vendor)) + vendor
    out += struct.pack("<I", len(comments))
    for c in comments:
        enc = c.encode()
        out += struct.pack("<I", len(enc)) + enc
    return out + b"\x01"  # framing bit


def make_ogg(
    codec: str,
    channels: int,
    rate: int,
    n_audio_packets: int,
    packet_size: int,
    pre_skip: int = 312,
    comments: tuple[str, ...] = ("title=fixture",),
    packets_per_page: int = 3,
    granule_per_packet: int = 960,
    serial: int = 0x1234,
    span_pages: bool = False,
    seed: int = 1,
) -> bytes:
    """A complete single-stream Ogg file: BOS page with the id header,
    one page with the comment header, then audio packets of
    ``packet_size`` LCG bytes, ``packets_per_page`` per page, granule
    accumulating ``granule_per_packet`` per packet. ``span_pages``
    makes the FIRST audio packet 700 bytes so it lace-spans into a
    continued page (the 255-run + continued-flag path)."""
    if codec == "opus":
        id_pkt = make_opus_head(channels, pre_skip, rate)
        cm_pkt = make_opus_tags(list(comments))
        tick = 48_000  # Opus granules are ALWAYS 48 kHz ticks
    elif codec == "vorbis":
        id_pkt = make_vorbis_id(channels, rate)
        cm_pkt = make_vorbis_comment(list(comments))
        tick = rate
    else:
        raise OggError(f"unknown codec {codec}")

    x = seed * 2 + 1
    audio: list[bytes] = []
    for i in range(n_audio_packets):
        size = 700 if (span_pages and i == 0) else packet_size
        pkt = bytearray()
        for _ in range(size):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            pkt.append((x >> 16) & 0xFF)
        audio.append(bytes(pkt))

    pages = [make_page(serial, 0, 0, [id_pkt], bos=True)]
    pages.append(make_page(serial, 1, 0, [cm_pkt]))
    seq = 2
    granule = pre_skip if codec == "opus" else 0
    i = 0
    while i < len(audio):
        group = audio[i : i + packets_per_page]
        granule += granule_per_packet * len(group)
        if span_pages and i == 0:
            # split the big first packet across two pages: 510 bytes
            # (two 255 lacings) on this page, the rest continued.
            head, tail = group[0][:510], group[0][510:]
            lacing_page = (
                b"OggS\x00" + bytes([0])
                + struct.pack("<q", -1)  # no packet ends: granule -1
                + struct.pack("<II", serial, seq)
                + b"\x00\x00\x00\x00"
                + bytes([2]) + b"\xff\xff" + head
            )
            pg = bytearray(lacing_page)
            pg[22:26] = struct.pack("<I", ogg_crc(bytes(pg)))
            pages.append(bytes(pg))
            seq += 1
            rest = [tail] + list(group[1:])
            pages.append(
                make_page(
                    serial, seq, granule, rest, continued=True,
                    eos=i + len(group) >= len(audio),
                )
            )
        else:
            pages.append(
                make_page(
                    serial, seq, granule, group,
                    eos=i + len(group) >= len(audio),
                )
            )
        seq += 1
        i += len(group)
    _ = tick
    return b"".join(pages)


# --- metadata -------------------------------------------------------------------


def ogg_meta(payload: bytes) -> dict:
    """Ogg bytes -> stream metadata. Single-stream files (one serial)
    are in scope - the podcast/voice layout; multiplexed A/V Ogg is
    rejected loudly."""
    pages = list(walk_pages(payload))
    if not pages:
        raise OggError("no pages")
    serials = {p["serial"] for p in pages}
    if len(serials) != 1:
        raise OggError(f"multiplexed streams not supported: {serials}")
    if not pages[0]["bos"]:
        raise OggError("first page is not BOS")
    packets = reassemble_packets(pages)
    if not packets:
        raise OggError("no packets")
    first = packets[0]
    n_comments = None
    if first.startswith(b"OpusHead"):
        if first[8] != 1:
            raise OggError(f"OpusHead version {first[8]}")
        codec = "opus"
        channels = first[9]
        pre_skip, rate, _gain = struct.unpack_from("<HIh", first, 10)
        tick = 48_000
        if len(packets) > 1 and packets[1].startswith(b"OpusTags"):
            (vlen,) = struct.unpack_from("<I", packets[1], 8)
            (n_comments,) = struct.unpack_from("<I", packets[1], 12 + vlen)
    elif first.startswith(b"\x01vorbis"):
        codec = "vorbis"
        channels = first[11]
        (rate,) = struct.unpack_from("<I", first, 12)
        pre_skip = 0
        tick = rate
        if len(packets) > 1 and packets[1].startswith(b"\x03vorbis"):
            (vlen,) = struct.unpack_from("<I", packets[1], 7)
            (n_comments,) = struct.unpack_from("<I", packets[1], 11 + vlen)
    else:
        raise OggError("unknown codec id header")
    last_granule = pages[-1]["granule"]
    duration_ms = max(0, last_granule - pre_skip) * 1000 // tick
    return {
        "codec": codec,
        "channels": channels,
        "sample_rate": rate,
        "pre_skip": pre_skip,
        "n_pages": len(pages),
        "n_packets": len(packets),
        "n_comments": n_comments,
        "last_granule": last_granule,
        "duration_ms": duration_ms,
        "eos_seen": pages[-1]["eos"],
    }


# --- fixtures + registry query ---------------------------------------------------

#: (name, make_ogg kwargs, HAND-WRITTEN expected duration_ms).
#: Other expected fields derive from the kwargs by arithmetic in
#: `_expected`; duration is written out by hand as the spec cross-check
#: (granule ticks -> ms).
_FIXTURES: list[tuple[str, dict, int]] = [
    # 12 packets * 960 ticks / 48 kHz = 240 ms
    ("opus_stereo.ogg",
     dict(codec="opus", channels=2, rate=48000, n_audio_packets=12,
          packet_size=40, pre_skip=312, seed=3), 240),
    # mono voice, 20 packets * 960 / 48000 = 400 ms; 2 comments
    ("opus_voice.ogg",
     dict(codec="opus", channels=1, rate=16000, n_audio_packets=20,
          packet_size=25, pre_skip=120, comments=("artist=a", "title=t"),
          packets_per_page=5, seed=7), 400),
    # packet spanning pages via 255-lacing + continued flag
    ("opus_span.ogg",
     dict(codec="opus", channels=2, rate=48000, n_audio_packets=6,
          packet_size=30, pre_skip=0, span_pages=True, seed=11), 120),
    # vorbis: 9 packets * 1024 ticks at 44.1 kHz = 9216/44100 s = 208 ms
    ("vorbis_music.ogg",
     dict(codec="vorbis", channels=2, rate=44100, n_audio_packets=9,
          packet_size=55, granule_per_packet=1024, comments=(), seed=13),
     208),
]


def _expected(name: str, kw: dict, duration_ms: int) -> dict:
    n = kw["n_audio_packets"]
    ppp = kw.get("packets_per_page", 3)
    audio_pages = -(-n // ppp) + (1 if kw.get("span_pages") else 0)
    pre_skip = kw.get("pre_skip", 312) if kw["codec"] == "opus" else 0
    gpp = kw.get("granule_per_packet", 960)
    return {
        "file_name": name,
        "codec": kw["codec"],
        "channels": kw["channels"],
        "sample_rate": kw["rate"],
        "pre_skip": pre_skip,
        "n_pages": 2 + audio_pages,
        "n_packets": 2 + n,
        "n_comments": len(kw.get("comments", ("title=fixture",))),
        "last_granule": pre_skip + gpp * n,
        "duration_ms": duration_ms,
        "eos_seen": True,
    }


_COLS = [
    "file_name", "codec", "channels", "sample_rate", "pre_skip",
    "n_pages", "n_packets", "n_comments", "last_granule", "duration_ms",
    "eos_seen",
]

_SCHEMA = (
    "file_name string, codec string, channels int, sample_rate int, "
    "pre_skip int, n_pages int, n_packets int, n_comments int, "
    "last_granule bigint, duration_ms bigint, eos_seen boolean"
)


def _stage_ogg_store(root: str) -> None:
    for name, kw, _d in _FIXTURES:
        with open(os.path.join(root, name), "wb") as f:
            f.write(make_ogg(**kw))


def ogg_meta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: staged Ogg store -> binaryFile -> mapInPandas
    -> one metadata row per file (zero-shuffle scan, payloads stay
    executor-side - the media-store shape)."""
    work = tempfile.mkdtemp(prefix="ogg_store_")
    try:
        _stage_ogg_store(work)
        bin_df = spark.read.format("binaryFile").load(work).select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("content").alias("payload"),
        )

        def parse_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = [
                    {"file_name": name, **ogg_meta(bytes(p))}
                    for name, p in zip(pdf["file_name"], pdf["payload"])
                ]
                yield pd.DataFrame(out)[_COLS]

        out = bin_df.mapInPandas(parse_batches, _SCHEMA)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _ogg_oracle() -> str:
    rows = []
    for name, kw, duration_ms in _FIXTURES:
        want = _expected(name, kw, duration_ms)
        got = {"file_name": name, **ogg_meta(make_ogg(**kw))}
        if got != want:
            raise AssertionError(f"{name}: parsed {got!r} != {want!r}")

        def lit(v) -> str:
            if isinstance(v, bool):
                return "TRUE" if v else "FALSE"
            if isinstance(v, str):
                return f"'{v}'"
            return str(v)

        rows.append("(" + ", ".join(lit(want[c]) for c in _COLS) + ")")
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows)
        + ") AS t(" + ", ".join(_COLS) + ")"
    )


OGG_META_ORACLE_SQL = _ogg_oracle()
