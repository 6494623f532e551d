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


def main() -> None:
    hist = compute()
    out = {
        "_comment": (
            "Queries with a driver CORRECTNESS row (oracle-green, or "
            "rows-only for no-oracle queries), by round. "
            "registry.all_queries() orders never-listed queries first so "
            "each driver round extends signed coverage instead of "
            "re-checking the same cheap head. Regenerate with "
            "scripts/update_verified_history.py at round start."
        ),
        "verified": {k: hist[k] for k in sorted(hist)},
    }
    dest = os.path.join(REPO, "VERIFIED_HISTORY.json")
    json.dump(out, open(dest, "w"), indent=1)
    print(f"wrote {dest}: {len(hist)} driver-seen queries")


if __name__ == "__main__":
    main()
