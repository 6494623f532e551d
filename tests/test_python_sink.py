"""Commit-protocol unit tests for the custom Python DataSource
writers (round-8 review findings): append-mode jobs must ACCUMULATE
(unique per-job publish prefix), and a replayed micro-batch must clear
its own previous publish before republishing (a replay with fewer
tasks would otherwise leave surplus part files double-counting rows).
Driver-side commit/abort logic is plain file manipulation — tested
directly, no Spark session needed.
"""

from __future__ import annotations

import os

from linux_logs_spark.sources.synthetic import (
    JsonDirStreamWriter,
    JsonDirWriter,
    _SinkCommit,
)


def _tmpfile(path: str, name: str, lines: int) -> _SinkCommit:
    with open(os.path.join(path, name), "w") as fh:
        for i in range(lines):
            fh.write('{"i": %d}\n' % i)
    return _SinkCommit(name)


def _published(path: str) -> list[str]:
    return sorted(f for f in os.listdir(path) if f.startswith("part-"))


def test_batch_append_jobs_accumulate(tmp_path):
    path = str(tmp_path)
    w1 = JsonDirWriter({"path": path}, overwrite=False)
    w1.commit([_tmpfile(path, "_tmp_a.jsonl", 2), _tmpfile(path, "_tmp_b.jsonl", 2)])
    first = _published(path)
    assert len(first) == 2

    w2 = JsonDirWriter({"path": path}, overwrite=False)
    w2.commit([_tmpfile(path, "_tmp_c.jsonl", 2)])
    both = _published(path)
    # second append ADDS files; the first job's publish survives
    assert len(both) == 3 and set(first) <= set(both)


def test_batch_overwrite_replaces_previous_publish(tmp_path):
    path = str(tmp_path)
    JsonDirWriter({"path": path}, overwrite=False).commit(
        [_tmpfile(path, "_tmp_a.jsonl", 2)]
    )
    JsonDirWriter({"path": path}, overwrite=True).commit(
        [_tmpfile(path, "_tmp_b.jsonl", 2)]
    )
    assert len(_published(path)) == 1


def test_stream_replay_clears_surplus_parts(tmp_path):
    path = str(tmp_path)
    os.makedirs(path, exist_ok=True)
    w = JsonDirStreamWriter({"path": path})
    # crashed attempt published 3 files for batch 7
    w.commit(
        [
            _tmpfile(path, "_tmp_0.jsonl", 1),
            _tmpfile(path, "_tmp_1.jsonl", 1),
            _tmpfile(path, "_tmp_2.jsonl", 1),
        ],
        batchId=7,
    )
    assert len(_published(path)) == 3
    # replay with a DIFFERENT layout emits only one task
    w.commit([_tmpfile(path, "_tmp_r.jsonl", 1)], batchId=7)
    pub = _published(path)
    assert pub == ["part-b00007-00000.jsonl"], pub
    # other batches' files are untouched by a replay
    w.commit([_tmpfile(path, "_tmp_s.jsonl", 1)], batchId=8)
    w.commit([_tmpfile(path, "_tmp_t.jsonl", 1)], batchId=7)
    assert "part-b00008-00000.jsonl" in _published(path)
