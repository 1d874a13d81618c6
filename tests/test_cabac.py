"""CABAC arithmetic engine (§9.3) - table gates + encoder/decoder
round-trips. The engine twins live in operators/cabac.py; the slice
integration tests live in test_h264_frames.py (cabac_ipcm fixture)."""

from __future__ import annotations

import random

import pytest

# quick smoke lane (VERDICT r13 item 8): this file is part of the
# ~1-minute `-m quick` subset; the full suite stays the snapshot gate
pytestmark = pytest.mark.quick
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.cabac import (
    CTX_INIT_I_MB_TYPE,
    RANGE_TAB_LPS,
    TRANS_IDX_LPS,
    TRANS_IDX_MPS,
    CabacDecoder,
    CabacEncoder,
    init_context,
)
from data_pipeline_capstone_project_spark.operators.h264 import _BitReader


def _bits_to_bytes(bits: list[int]) -> bytes:
    bits = bits + [0] * (-len(bits) % 8)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for v in bits[i : i + 8]:
            b = (b << 1) | v
        out.append(b)
    # decoder lookahead may read past the flush; pad a spare word
    return bytes(out) + b"\x00\x00"


def test_tables_shape_and_invariants():
    assert len(RANGE_TAB_LPS) == 64 and RANGE_TAB_LPS[63] == (2, 2, 2, 2)
    assert len(TRANS_IDX_LPS) == 64 and TRANS_IDX_LPS[63] == 63
    assert TRANS_IDX_MPS[62] == 62 and TRANS_IDX_MPS[63] == 63
    assert TRANS_IDX_MPS[:5] == (1, 2, 3, 4, 5)
    # import-time _validate_tables() already ran; spot-check the
    # normative clamp and the famous 28/29 inversion here too
    assert RANGE_TAB_LPS[0][0] == 128
    assert (TRANS_IDX_LPS[28], TRANS_IDX_LPS[29]) == (23, 22)


def test_init_context_formula():
    # preCtxState = Clip3(1, 126, ((m*Clip3(0,51,QP)) >> 4) + n)
    pre = max(1, min(126, ((20 * 26) >> 4) + (-15)))  # = 17 -> MPS 0
    want = [pre - 64, 1] if pre > 63 else [63 - pre, 0]
    assert init_context(20, -15, 26) == want == [46, 0]
    # extremes clamp
    assert init_context(-128, -128, 0) == [62, 0]
    assert init_context(127, 127, 51) == [62, 1]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 1), min_size=1, max_size=400),
       st.integers(0, 51), st.integers(0, 2**32 - 1))
def test_decision_roundtrip(bins, qp, seed):
    """Random bin strings through one adaptive context (plus a few
    bypass bins) survive encode -> decode bit-exactly."""
    rng = random.Random(seed)
    kinds = [rng.choice(("d3", "d4", "d5", "byp")) for _ in bins]
    enc = CabacEncoder()
    ectx = {i: init_context(*CTX_INIT_I_MB_TYPE[i], qp) for i in (3, 4, 5)}
    for b, k in zip(bins, kinds):
        if k == "byp":
            enc.encode_bypass(b)
        else:
            enc.encode_decision(ectx[int(k[1])], b)
    enc.encode_terminate(1)  # flush
    r = _BitReader(_bits_to_bytes(enc.bits()))
    dec = CabacDecoder(r)
    dctx = {i: init_context(*CTX_INIT_I_MB_TYPE[i], qp) for i in (3, 4, 5)}
    got = []
    for k in kinds:
        if k == "byp":
            got.append(dec.decode_bypass())
        else:
            got.append(dec.decode_decision(dctx[int(k[1])]))
    assert got == list(bins)
    assert dec.decode_terminate() == 1
    assert dctx == ectx


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(0, 51), st.integers(0, 2**32 - 1))
def test_terminate_zero_roundtrip(n, qp, seed):
    """Interleaved terminate-0 bins (the per-MB end_of_slice_flag
    pattern) round-trip; the final terminate-1 flush leaves the
    decoder's raw pointer exactly at the encoder's bit count."""
    rng = random.Random(seed)
    enc = CabacEncoder()
    ctx = init_context(*CTX_INIT_I_MB_TYPE[3], qp)
    bins = []
    for _ in range(n):
        b = rng.randint(0, 1)
        bins.append(b)
        enc.encode_decision(ctx, b)
        enc.encode_terminate(0)
    enc.encode_terminate(1)
    nbits = len(enc.bits())
    r = _BitReader(_bits_to_bytes(enc.bits()))
    dec = CabacDecoder(r)
    dctx = init_context(*CTX_INIT_I_MB_TYPE[3], qp)
    for b in bins:
        assert dec.decode_decision(dctx) == b
        assert dec.decode_terminate() == 0
    assert dec.decode_terminate() == 1
    assert r._pos == nbits  # flush/lookahead cancellation (§9.3.4.6)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 8), st.integers(0, 2**32 - 1))
def test_reinit_segments_roundtrip(segments, seed):
    """The I_PCM shape: encode segments separated by terminate-1
    flush + byte-aligned raw bytes + engine re-init; contexts persist
    across re-inits (§9.3.1.2 re-initializes the ENGINE only)."""
    rng = random.Random(seed)
    bits: list[int] = []
    enc = CabacEncoder(bits)
    ctx = init_context(*CTX_INIT_I_MB_TYPE[4], 30)
    payload_plan = []
    for _ in range(segments):
        seg_bins = [rng.randint(0, 1) for _ in range(rng.randint(1, 30))]
        raw = bytes(rng.randrange(256) for _ in range(rng.randint(1, 9)))
        payload_plan.append((seg_bins, raw))
        for b in seg_bins:
            enc.encode_decision(ctx, b)
        enc.encode_terminate(1)
        bits.extend([0] * (-len(bits) % 8))  # pcm_alignment_zero_bit
        for byte in raw:
            for i in range(7, -1, -1):
                bits.append((byte >> i) & 1)
        enc.init_engine()
    enc.encode_terminate(1)
    r = _BitReader(_bits_to_bytes(bits))
    dec = CabacDecoder(r)
    dctx = init_context(*CTX_INIT_I_MB_TYPE[4], 30)
    for seg_bins, raw in payload_plan:
        for b in seg_bins:
            assert dec.decode_decision(dctx) == b
        assert dec.decode_terminate() == 1
        r.byte_align()
        assert bytes(r.u(8) for _ in raw) == raw
        dec.init_engine()
    assert dec.decode_terminate() == 1
    assert dctx == ctx


def test_bad_init_offset_rejected():
    # 9 bits of 1s -> codIOffset 511 >= codIRange 510
    from data_pipeline_capstone_project_spark.operators.cabac import (
        CabacError,
    )

    with pytest.raises(CabacError):
        CabacDecoder(_BitReader(b"\xff\xff\xff"))
