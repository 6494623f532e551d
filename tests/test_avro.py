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


def test_columnar_writer_bit_identical_to_row_path(tmp_path):
    """Round-13: the sink's vectorized Arrow path must produce the
    SAME FILE BYTES as the per-row codec — adversarial values (varint
    group boundaries, negative extremes, empty/multibyte strings) and
    blocks straddling batch boundaries included."""
    import pyarrow as pa

    from linux_logs_spark.sources.avro_py import write_avro_file_arrow

    fields = [("a", "long"), ("x", "double"), ("s", "string")]
    longs = [0, -1, 1, 63, 64, -64, -65, 2**62, -(2**62), 2**63 - 1,
             -(2**63), 127, 128, -128] * 700  # 9800 rows: 3 blocks @ 4096
    n = len(longs)
    doubles = [0.0, -0.0, 1.5, -2.25, math.pi, float("inf"),
               float("-inf"), 1e-308][:8] * (n // 8) + [3.75] * (n % 8)
    strings = (["", "a", "héllo", "日本語", "x" * 200] * n)[:n]
    rows = list(zip(longs, doubles, strings))

    p_row = str(tmp_path / "row.avro")
    p_arrow = str(tmp_path / "row.avro")  # same basename → same sync marker
    write_avro_file(p_row, fields, rows)
    row_bytes = open(p_row, "rb").read()

    tbl = pa.table({"a": pa.array(longs, pa.int64()),
                    "x": pa.array(doubles, pa.float64()),
                    "s": pa.array(strings, pa.string())})
    # uneven batch splits force blocks to straddle batch boundaries,
    # and slice() offsets exercise the non-zero-offset buffer math
    b = tbl.to_batches(max_chunksize=n)[0]
    batches = [b.slice(0, 1000), b.slice(1000, 3500), b.slice(4500)]
    write_avro_file_arrow(p_arrow, fields, batches)
    assert open(p_arrow, "rb").read() == row_bytes

    # large_string offsets (int64) take the same path
    p2 = str(tmp_path / "big.avro")
    tbl2 = tbl.set_column(2, "s", tbl.column("s").cast(pa.large_string()))
    write_avro_file_arrow(p2, fields, tbl2.to_batches(max_chunksize=3000))
    write_avro_file(str(tmp_path / "big2.avro"), fields, rows)
    want = open(str(tmp_path / "big2.avro"), "rb").read()
    # different basename → different sync marker; compare decoded rows
    got_fields, blocks = scan_block_index(p2)
    assert got_fields == fields
    assert sum(c for _o, c in blocks) == n
    got = list(read_avro_blocks(p2, [o for o, _c in blocks]))
    assert got == rows
    assert want  # row-path reference file exists and is non-trivial


def test_columnar_writer_row_fallback(tmp_path):
    """A batch shape the columnar encoder rejects (here an int32
    column for a long field — possible from a hand-built batch) must
    fall back to the row loop per-slice: same rows on disk, since the
    row path's int(v) widens int32 happily."""
    import pyarrow as pa

    from linux_logs_spark.sources.avro_py import write_avro_file_arrow

    fields = [("a", "long"), ("s", "string")]
    b = pa.record_batch(
        {"a": pa.array([1, -2, 3], pa.int32()),
         "s": pa.array(["x", "y", "z"], pa.string())}
    )
    p = str(tmp_path / "fallback.avro")
    assert write_avro_file_arrow(p, fields, [b]) == 3
    _f, blocks = scan_block_index(p)
    got = list(read_avro_blocks(p, [o for o, _c in blocks]))
    assert got == [(1, "x"), (-2, "y"), (3, "z")]
