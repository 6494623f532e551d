#!/usr/bin/env python
"""Regenerate VERIFIED_HISTORY.json from the driver's CORRECTNESS_r*.json.

Run at the START of each round (after the driver has written the
previous round's CORRECTNESS file): registry.all_queries() orders
never-listed queries first, so a stale history file makes the driver
re-sign already-verified queries instead of extending coverage.

A query counts as driver-seen when its row is oracle-green
(rows+schema+hash match, no error) or a successful rows-only run
(err == "no_oracle" with a recorded spark row count).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def compute(repo: str = REPO) -> dict[str, list[str]]:
    """name → list of round tags with a clean driver signature.

    Importable so tests/test_contract.py can assert the committed
    VERIFIED_HISTORY.json matches a fresh recompute — the round-9 miss
    was this script simply not being run after new CORRECTNESS files
    landed, which silently diverted the driver's 50-query window.
    """
    hist: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_(r\d+)\.json$", path)
        tag = m.group(1).replace("r0", "r") if m else path
        data = json.load(open(path))
        for name, res in data.items():
            # Oracle-green means the FULL gate passed: rows AND schema AND
            # value hash. rows_match alone would record a genuine
            # correctness failure (matching counts, mismatching values) as
            # verified and permanently deprioritize its re-check.
            green = (
                res.get("err") is None
                and res.get("rows_match", False)
                and res.get("schema_match", False)
                and res.get("hash_match", False)
            )
            rows_only = (
                res.get("err") == "no_oracle" and res.get("spark_rows") is not None
            )
            if green or rows_only:
                hist.setdefault(name, []).append(tag + ("" if green else ":rows-only"))
    return hist


def fingerprints(
    hist: dict[str, list[str]], repo: str = REPO
) -> dict[str, str]:
    """name → behavioral fingerprint AT LAST SIGNING (round-13).

    Stamp the CURRENT fingerprint when a query's round list gained new
    evidence since the committed file (this script's contract is "run
    at round START", where the working tree still equals the code the
    driver just signed) or when the query has no stamp yet; otherwise
    CARRY FORWARD the committed stamp — re-stamping an unchanged list
    on a mid-round tree would launder a plan rewrite as already-signed,
    which is exactly the gap this section exists to close
    (registry._changed_since_signed orders stamp-mismatched queries
    first in the next driver window)."""
    import plan_fingerprint

    cur = plan_fingerprint.compute_fingerprints(repo)
    dest = os.path.join(repo, "VERIFIED_HISTORY.json")
    prev_verified: dict[str, list[str]] = {}
    prev_fp: dict[str, str] = {}
    if os.path.exists(dest):
        prev = json.load(open(dest))
        prev_verified = prev.get("verified", {})
        prev_fp = prev.get("fingerprints", {})
    out: dict[str, str] = {}
    for name in hist:
        if name in prev_fp and prev_verified.get(name) == hist[name]:
            out[name] = prev_fp[name]
        elif name in cur:
            out[name] = cur[name]
    return out


def main() -> None:
    hist = compute()
    fps = fingerprints(hist)
    out = {
        "_comment": (
            "Queries with a driver CORRECTNESS row (oracle-green, or "
            "rows-only for no-oracle queries), by round, plus the "
            "behavioral fingerprint (scripts/plan_fingerprint.py) each "
            "query had when its evidence was last refreshed. "
            "registry.all_queries() orders never-listed and "
            "fingerprint-changed queries first so each driver round "
            "extends signed coverage instead of re-checking the same "
            "cheap head. Regenerate with "
            "scripts/update_verified_history.py at round START (before "
            "code changes - the stamp assumes tree == signed code)."
        ),
        "verified": {k: hist[k] for k in sorted(hist)},
        "fingerprints": {k: fps[k] for k in sorted(fps)},
    }
    dest = os.path.join(REPO, "VERIFIED_HISTORY.json")
    json.dump(out, open(dest, "w"), indent=1)
    print(f"wrote {dest}: {len(hist)} driver-seen queries, {len(fps)} stamps")


if __name__ == "__main__":
    main()
