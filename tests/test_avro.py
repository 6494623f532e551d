"""Pins for the from-scratch Avro object-container codec
(sources/avro_py.py) — spec-derived golden bytes (the container has
no reference Avro implementation to interop-test against, so the
public spec's own worked examples are the ground truth), bit-exact
round trips over the full value domain, block-splittable planning,
and corruption detection."""

from __future__ import annotations

import io
import math
import os
import struct

import pytest

from linux_logs_spark.sources.avro_py import (
    BLOCK_ROWS,
    MAGIC,
    _read_long,
    _read_value,
    _write_long,
    _write_value,
    read_avro_blocks,
    read_avro_header,
    scan_block_index,
    write_avro_file,
)


def _enc_long(n: int) -> bytes:
    b = io.BytesIO()
    _write_long(b, n)
    return b.getvalue()


def test_zigzag_varint_golden_bytes():
    """The Avro spec's own long-encoding examples (spec §Binary
    Encoding: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01)."""
    assert _enc_long(0) == b"\x00"
    assert _enc_long(-1) == b"\x01"
    assert _enc_long(1) == b"\x02"
    assert _enc_long(-2) == b"\x03"
    assert _enc_long(2) == b"\x04"
    assert _enc_long(-64) == b"\x7f"
    assert _enc_long(64) == b"\x80\x01"
    # 64-bit extremes survive
    for n in (2**63 - 1, -(2**63), 123456789012345, -987654321):
        assert _read_long(io.BytesIO(_enc_long(n))) == n


def test_value_codec_golden_and_roundtrip():
    b = io.BytesIO()
    _write_value(b, "string", "foo")
    assert b.getvalue() == b"\x06foo"  # len 3 → zigzag 06, then utf-8
    b = io.BytesIO()
    _write_value(b, "double", 1.0)
    assert b.getvalue() == struct.pack("<d", 1.0)
    # bit-exact doubles incl. the textually-fragile ones
    for v in (0.1, -0.0, math.inf, -math.inf, 1e-308, 2.2250738585072014e-308):
        b = io.BytesIO()
        _write_value(b, "double", v)
        got = _read_value(io.BytesIO(b.getvalue()), "double")
        assert struct.pack("<d", got) == struct.pack("<d", v)
    # unicode strings
    b = io.BytesIO()
    _write_value(b, "string", "héllo wörld — 日本語")
    assert _read_value(io.BytesIO(b.getvalue()), "string") == "héllo wörld — 日本語"


FIELDS = [("k", "long"), ("name", "string"), ("x", "double")]


def _rows(n):
    return [
        {"k": i - 50, "name": f"row-{i}", "x": (i * 0.125) - 3.0}
        for i in range(n)
    ]


def test_container_file_roundtrip_and_block_index(tmp_path):
    path = str(tmp_path / "t.avro")
    n = write_avro_file(path, FIELDS, _rows(1000), block_rows=100)
    assert n == 1000
    with open(path, "rb") as fh:
        assert fh.read(4) == MAGIC
    fields, blocks = scan_block_index(path)
    assert fields == FIELDS
    assert len(blocks) == 10 and all(c == 100 for _off, c in blocks)
    # a single-block split decodes only its own rows
    got = list(read_avro_blocks(path, [blocks[3][0]]))
    assert got == [(r["k"], r["name"], r["x"]) for r in _rows(1000)[300:400]]
    # the whole file, block by block, equals the input exactly
    all_rows = list(read_avro_blocks(path, [off for off, _c in blocks]))
    assert all_rows == [(r["k"], r["name"], r["x"]) for r in _rows(1000)]


def test_corruption_and_unsupported_are_loud(tmp_path):
    path = str(tmp_path / "t.avro")
    write_avro_file(path, FIELDS, _rows(300), block_rows=100)
    # flip one byte of the first sync marker region between blocks
    data = bytearray(open(path, "rb").read())
    _fields, blocks = scan_block_index(path)
    data[blocks[1][0] - 1] ^= 0xFF  # last byte of block 0's sync
    bad = str(tmp_path / "bad.avro")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="sync marker"):
        scan_block_index(bad)
    with pytest.raises(ValueError, match="not an avro"):
        read_avro_header(io.BytesIO(b"PK\x03\x04zipzipzip"))


def test_spark_roundtrip_block_splittable(spark, sf_dir, tmp_path):
    """The registered query's physical claims: (a) the read plans one
    partition per container BLOCK (a 1-file dataset still fans out);
    (b) the Spark-written files round-trip bit-exactly against the
    source frame."""
    from pyspark.sql import functions as F

    from linux_logs_spark.catalog import load
    from linux_logs_spark.registry import all_queries
    from linux_logs_spark.sources.avro_py import register_pyavro

    register_pyavro(spark)
    # one big single file written by the codec directly → split proof
    one = str(tmp_path / "one")
    os.makedirs(one)
    write_avro_file(
        os.path.join(one, "part-0.avro"), FIELDS, _rows(5000), block_rows=500
    )
    df = spark.read.format("pyavro").option("path", one).load()
    assert df.rdd.getNumPartitions() == 10  # blocks, not files
    assert df.count() == 5000

    out = all_queries()["scan_avro_roundtrip"].fn(spark, sf_dir)
    src = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    assert out.count() == src.count()
    assert out.exceptAll(src).count() == 0 and src.exceptAll(out).count() == 0


def test_sink_overwrite_and_success_marker(spark, sf_dir, tmp_path):
    from linux_logs_spark.sources.avro_py import register_pyavro

    register_pyavro(spark)
    path = str(tmp_path / "sink")
    df = spark.range(100).selectExpr("id as k", "cast(id as string) as name",
                                     "cast(id as double) as x")
    df.write.format("pyavro").mode("overwrite").option("path", path).save()
    first = sorted(os.listdir(path))
    assert "_SUCCESS" in first
    assert not any(f.startswith("_tmp_") for f in first)
    # overwrite replaces, never accumulates
    df.limit(10).write.format("pyavro").mode("overwrite").option(
        "path", path
    ).save()
    back = spark.read.format("pyavro").option("path", path).load()
    assert back.count() == 10
