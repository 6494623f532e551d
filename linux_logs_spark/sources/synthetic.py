"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

A deterministic synthetic-log generator registered as a first-class
``spark.read.format("synthlog")`` source — the engine's demonstration
that a NEW source plugs into Catalyst from pure Python: schema
declaration, options, partition planning, and FILTER PUSHDOWN all
happen source-side, so a predicate on the generator key prunes whole
partitions before a single row is produced.

Scale shape: ``partitions()`` splits the (filter-narrowed) key range
into ``parts`` contiguous slices, one task each — generation is
embarrassingly parallel and the planned work is proportional to the
SURVIVING range, not the nominal one (pushFilters narrows [lo, hi)
for >=, >, <, <=, = on row_id and keeps every other predicate for
Spark to re-apply). On a 1000-executor cluster the same source
generates 10^12 rows by raising ``parts``; no driver materialization
anywhere. The row formula is pure 64-bit integer arithmetic + one
IEEE double division, so a SQL engine (DuckDB) replays it exactly —
which is what makes the source hash-oracle-able.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

# Weyl-style multiplicative mix: i * K mod 2^32 is full-period on the
# odd constant and stays < 2^46 for i < 10^5.5, far inside int64 — the
# same expression evaluates exactly in Python, Spark SQL and DuckDB.
_MIX = 2654435761
_MOD = 4294967296
SEVERITIES = ("info", "warn", "error", "debug")


def _row(i: int) -> tuple:
    """ONE row formula, shared by the batch and stream readers (and
    replayed textually by the DuckDB oracles in operators/scans.py and
    streaming/queries.py)."""
    h = (i * _MIX) % _MOD
    return (
        i,
        f"host-{h % 16:02d}",
        SEVERITIES[(h >> 4) % 4],
        (h % 100000) / 100.0,
    )


class RangeSlice(InputPartition):
    """One contiguous [start, end) slice of the generator key space."""

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthLogReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10000))
        self.parts = int(options.get("parts", 8))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        """Narrow [lo, hi) from row_id range predicates; return
        (= leave to Spark) everything else. Accepting a filter here is
        a CORRECTNESS contract — only exact range algebra is taken.
        Deliberately a plain loop returning a list, NOT a generator
        (round-7 advice): the narrowing side effects must land when
        pushFilters returns, not only if the runtime exhausts the
        iterator — a lazily-consuming runtime would otherwise mark
        the range filters pushed while the source never narrowed."""
        unsupported = []
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col == "row_id" and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and isinstance(f.value, int):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                else:  # EqualTo
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        span = hi - lo
        if span == 0:
            # Spark requires >= 1 partition; an empty slice yields no rows.
            return [RangeSlice(lo, lo)]
        parts = min(self.parts, span)
        step = -(-span // parts)  # ceil
        return [
            RangeSlice(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: RangeSlice):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SynthLogStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same key space: each trigger emits
    the next ``batch`` keys until ``n`` is exhausted. Offsets are the
    plain key position, so replay (readBetweenOffsets) is exact by
    construction. read() returns a LIST, not a generator — Spark's
    prefetch cache copy.copy()s the entries, and this reader's contract
    (per its docs) is the low-throughput driver-side path anyway; the
    partition-parallel batch reader above is the volume path."""

    def __init__(self, options):
        self.n = int(options.get("n", 10000))
        self.batch = int(options.get("batch", 5000))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        s = start["pos"]
        e = min(s + self.batch, self.n)
        return ([_row(i) for i in range(s, e)], {"pos": e})

    def readBetweenOffsets(self, start, end):
        return [_row(i) for i in range(start["pos"], end["pos"])]


class SynthLogDataSource(DataSource):
    """``format("synthlog")``: options n (row count), parts (tasks)."""

    @classmethod
    def name(cls) -> str:
        return "synthlog"

    def schema(self) -> str:
        return "row_id bigint, host string, severity string, value double"

    def reader(self, schema) -> SynthLogReader:
        return SynthLogReader(self.options)

    def simpleStreamReader(self, schema) -> SynthLogStreamReader:
        return SynthLogStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "JsonDirWriter":
        return JsonDirWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonDirStreamWriter":
        return JsonDirStreamWriter(self.options)


def register_synthlog(spark) -> None:
    """Idempotent per-session registration (re-register replaces)."""
    spark.dataSource.register(SynthLogDataSource)


class _SinkCommit(WriterCommitMessage):
    """Per-task commit message: the hidden temp file the task wrote."""

    def __init__(self, tmp_name: str):
        self.tmp_name = tmp_name


def _write_jsonl_batches(dest: str, batches) -> None:
    """Serialize Arrow RecordBatches as JSON lines. orjson when the
    worker has it (~2× over stdlib json on the 4-column event batch,
    and C-native datetime/UUID handling), stdlib json otherwise —
    output differs only in separators/datetime shape, both of which
    Spark's JSON reader accepts. Values come off the batch via
    to_pylist (C-level column pulls) — no Spark Row unpickle, no
    per-row asDict."""
    try:
        import orjson

        def dump(rec) -> bytes:
            return orjson.dumps(rec, default=str)

    except ImportError:
        import json as _json

        def dump(rec) -> bytes:
            return _json.dumps(rec, default=str).encode()

    with open(dest, "wb") as fh:
        for b in batches:
            if b.num_rows:
                fh.write(b"\n".join(dump(r) for r in b.to_pylist()) + b"\n")


class JsonDirWriter(DataSourceArrowWriter):
    """Batch WRITER half of the Python DataSource API — the full
    two-phase commit protocol in pure Python: each task writes a
    HIDDEN temp file (underscore-prefixed: invisible to any Spark
    reader that lists the directory mid-job) and returns its name as
    the commit message; the driver's commit() publishes all temp
    files at once by renaming them to part files and dropping a
    _SUCCESS marker; abort() removes the temps so a failed job leaves
    the directory readable with ONLY the previous contents. Local FS
    rename stands in for the object-store manifest publish a real
    sink uses (extras.write_manifest_atomic is the same protocol one
    level up); the commit-time swap of old part files is the
    documented non-atomic window a manifest fixes. Arrow variant
    (round 10, same move as the pyavro sink in b43472c): tasks
    receive RecordBatches, not pickled Rows."""

    def __init__(self, options, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("synthlog sink requires option('path', ...)")
        self.overwrite = overwrite
        # Unique per-JOB publish prefix (driver-side, once): append
        # mode must accumulate across jobs, and a fixed part-00000...
        # naming would make the second append's os.replace silently
        # clobber the first's files (round-8 review).
        self.job_id = uuid.uuid4().hex[:8]

    # executor-side
    def write(self, batches) -> _SinkCommit:
        import os

        from pyspark import TaskContext

        tc = TaskContext.get()
        tmp = f"_tmp_{self.job_id}_{tc.partitionId()}_{tc.taskAttemptId()}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        _write_jsonl_batches(os.path.join(self.path, tmp), batches)
        return _SinkCommit(tmp)

    # driver-side
    def commit(self, messages) -> None:
        import os

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-") or f == "_SUCCESS":
                    os.remove(os.path.join(self.path, f))
        # the documented commit contract allows a failed task's slot
        # to surface as None (abort() already guards this)
        for i, m in enumerate(m for m in messages if m is not None):
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, f"part-{self.job_id}-{i:05d}.jsonl"),
            )
        # Failed/speculative task attempts leave _tmp_* files that no
        # commit message names; abort() never sees them either (it
        # only gets the successful attempts' messages). Sweep THIS
        # JOB'S strays at publish time so append-mode dirs don't
        # accumulate garbage across runs (round-8 advice) — scoped by
        # the job id baked into the temp names, so a concurrent
        # append job's not-yet-published task files are never touched
        # (round-9 review).
        for f in os.listdir(self.path):
            if f.startswith(f"_tmp_{self.job_id}_"):
                try:
                    os.remove(os.path.join(self.path, f))
                except FileNotFoundError:
                    pass
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonDirStreamWriter(DataSourceStreamArrowWriter):
    """STREAMING sink half (DataSourceStreamArrowWriter): same
    per-task temp-file + driver-publish protocol as JsonDirWriter,
    with the batchId woven into the published names — a REPLAYED
    micro-batch (restart between write and checkpoint commit)
    republishes the SAME part-b<batch>-<i> names via os.replace, so
    recovery is idempotent instead of duplicating rows. That
    per-batch idempotent publish is exactly the contract foreachBatch
    sinks implement by hand (streaming/queries.py:
    stream_foreach_batch); here it lives behind the DataSource API.

    Arrow variant (round 10): write() receives RecordBatches and
    feeds the JSON encoder from column pulls, skipping per-row Row
    unpickle + asDict — the same switch that took the pyavro batch
    sink 12.0 s → 6.9 s at 10× (b43472c). The streaming 10× leg was
    4.3× wall on 10× rows through the SAME micro-batch structure,
    i.e. the growth was all per-ROW Python serialization, which is
    exactly what the Arrow transfer removes."""

    def __init__(self, options):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("synthlog stream sink requires option('path', ...)")
        # per-writer-instance id scoping temp names: the stray sweep
        # in commit() may then only ever touch this writer's temps
        self.job_id = uuid.uuid4().hex[:8]

    # executor-side
    def write(self, batches) -> _SinkCommit:
        import os

        from pyspark import TaskContext

        tc = TaskContext.get()
        tmp = f"_tmp_{self.job_id}_{tc.partitionId()}_{tc.taskAttemptId()}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        _write_jsonl_batches(os.path.join(self.path, tmp), batches)
        return _SinkCommit(tmp)

    # driver-side, per micro-batch
    def commit(self, messages, batchId: int) -> None:
        import os

        # A replayed batch may produce FEWER tasks than the crashed
        # attempt already published (different shuffle layout after
        # restart) — name-idempotent renames alone would leave the
        # surplus part-b<batch>-* files in place and double-count
        # rows (round-8 review). Clear the batch's own previous
        # publish first: replay then republishes the batch exactly.
        prefix = f"part-b{batchId:05d}-"
        for f in os.listdir(self.path):
            if f.startswith(prefix):
                os.remove(os.path.join(self.path, f))
        # skip None slots (failed-task commit messages), as in abort()
        for i, m in enumerate(m for m in messages if m is not None):
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, f"part-b{batchId:05d}-{i:05d}.jsonl"),
            )
        # Same stale-attempt sweep as the batch writer, scoped to
        # this writer's own temps: temp files from failed attempts of
        # THIS batch are dead once the batch publishes (a replay
        # re-creates its own temps), so clear them here rather than
        # letting them pile up.
        for f in os.listdir(self.path):
            if f.startswith(f"_tmp_{self.job_id}_"):
                try:
                    os.remove(os.path.join(self.path, f))
                except FileNotFoundError:
                    pass

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass
