"""WebDataset tar sharding: the from-scratch ustar writer validated
against the STANDARD tarfile module (external witness), parse_tar
round-trips and hardening, block arithmetic, and the registry query
against the closed-form SQL oracle (which predicts exact tar byte
sizes)."""

from __future__ import annotations

import io
import tarfile

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_capstone_project_spark.operators.webdataset import (
    TarError,
    make_tar,
    make_tar_member,
    member_blocks,
    parse_tar,
    webdataset_pack_query,
)


@st.composite
def member_lists(draw):
    n = draw(st.integers(1, 6))
    return [
        (
            f"{i:06d}.{draw(st.sampled_from(['txt', 'json', 'bin']))}",
            draw(st.binary(min_size=0, max_size=1500)),
        )
        for i in range(n)
    ]


@settings(max_examples=60, deadline=None)
@given(member_lists())
def test_stdlib_tarfile_reads_our_archives(members):
    """External witness: Python's tarfile must see exactly our
    members - names, sizes, and byte-for-byte content."""
    buf = io.BytesIO(make_tar(members))
    with tarfile.open(fileobj=buf) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members


@settings(max_examples=60, deadline=None)
@given(member_lists())
def test_parse_tar_roundtrip(members):
    assert parse_tar(make_tar(members)) == members


@settings(max_examples=60, deadline=None)
@given(member_lists())
def test_block_arithmetic_predicts_length(members):
    want = sum(member_blocks(len(d)) for _, d in members) + 1024
    assert len(make_tar(members)) == want


def test_we_read_stdlib_archives():
    """And the reverse: parse_tar walks an archive the stdlib wrote
    (ustar format pinned)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in [("a.txt", b"hello"), ("b.json", b"{}")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = parse_tar(buf.getvalue())
    assert got == [("a.txt", b"hello"), ("b.json", b"{}")]


def test_malformed_archives_rejected():
    tar = make_tar([("a.txt", b"x" * 10)])
    with pytest.raises(TarError, match="checksum"):
        parse_tar(tar[:200] + b"\xff" + tar[201:])
    with pytest.raises(TarError, match="magic"):
        parse_tar(b"A" * 512 + tar)
    with pytest.raises(TarError, match="trailer"):
        parse_tar(tar[: len(tar) - 1024])  # trailer stripped
    with pytest.raises(TarError, match="overruns"):
        parse_tar(make_tar_member("a.txt", b"y" * 600)[:700])
    with pytest.raises(TarError, match="100 bytes"):
        make_tar_member("n" * 101, b"")


def test_empty_member_is_header_only():
    assert member_blocks(0) == 512
    assert parse_tar(make_tar([("e.txt", b"")])) == [("e.txt", b"")]


def test_pack_query_matches_oracle(spark, sf_dir):
    import pandas as pd

    got = webdataset_pack_query(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    from data_pipeline_capstone_project_spark.operators.webdataset import (
        WEBDATASET_PACK_ORACLE_SQL,
    )

    want = con.sql(WEBDATASET_PACK_ORACLE_SQL).df()
    pd.testing.assert_frame_equal(
        got.astype("object"), want.astype("object"), check_dtype=False
    )
    # several shards exist, none (except possibly a source's last)
    # degenerate
    assert (got.groupby("source")["shard_no"].max() >= 1).any()


def test_pack_shards_are_contiguous_and_ordered(spark, sf_dir):
    df = webdataset_pack_query(spark, sf_dir).toPandas()
    for _, grp in df.groupby("source"):
        grp = grp.sort_values("shard_no")
        assert list(grp["shard_no"]) == list(range(len(grp)))
        # doc ranges must not overlap across consecutive shards
        assert (grp["first_doc"] <= grp["last_doc"]).all()
        assert (
            grp["first_doc"].iloc[1:].values > grp["last_doc"].iloc[:-1].values
        ).all()


def test_group_carry_across_arrow_batches(spark, sf_dir):
    """The 100 TB path the small corpus never exercises: with
    mapInPandas building shards per partition, a (source, shard_no)
    group can straddle Arrow batch boundaries and the builder must
    carry the open trailing group into the next batch. Force
    7-row Arrow batches (every group straddles) and assert the census
    is IDENTICAL to the default-batch run."""
    from data_pipeline_capstone_project_spark.operators.webdataset import (
        webdataset_pack_query,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key, None)
    baseline = [
        tuple(r) for r in webdataset_pack_query(spark, sf_dir).collect()
    ]
    try:
        spark.conf.set(key, "7")
        tiny = [
            tuple(r) for r in webdataset_pack_query(spark, sf_dir).collect()
        ]
    finally:
        if default is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, default)
    assert tiny == baseline
    assert len(baseline) > 1
