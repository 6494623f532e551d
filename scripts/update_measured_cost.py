"""Regenerate registry._MEASURED_COST from driver_sim_results.json.

The REFRESH RULE (registry.py) wants the whole table rebuilt from ONE
full 2-pass driver_sim run whenever plans change — no subset mixing.
This script mechanizes the rewrite: it reads the canonical artifact,
formats the dict exactly in the registry's 4-entries-per-line style,
and splices it between the table's braces in place.

Usage: python scripts/update_measured_cost.py [note]
  note — one-line provenance appended to the table comment.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY = os.path.join(REPO, "linux_logs_spark", "registry.py")
RESULTS = os.path.join(REPO, "driver_sim_results.json")


def _median_ratio_vs_table(costs: dict[str, float], src: str) -> float | None:
    """Median new/old cost ratio against the current table — the
    loaded-window detector bench.py's artifact guard uses, applied to
    the cost table (round-8 review: the same clobber class). Old costs
    are parsed ONLY from the _MEASURED_COST block (round-8 review #2:
    a bare repo-wide regex would absorb any quoted numeric literal
    added elsewhere in registry.py)."""
    block = re.search(
        r"_MEASURED_COST: dict\[str, float\] = \{(.*?)\n\}", src, re.DOTALL
    )
    if not block:
        return None
    old = {
        k: float(v)
        for k, v in re.findall(r'"([^"]+)": ([\d.]+)', block.group(1))
    }
    ratios = sorted(
        costs[k] / old[k] for k in costs if old.get(k, 0) > 0.05
    )
    return ratios[len(ratios) // 2] if ratios else None


def main() -> None:
    with open(RESULTS) as fh:
        data = json.load(fh)
    qs = data["queries"]
    bad = [k for k, v in qs.items() if "MISMATCH" in v or "ERROR" in v]
    if bad:
        raise SystemExit(f"refusing: canonical run has bad rows: {bad}")
    costs = {k: qs[k]["cost_s"] for k in sorted(qs)}

    entries = [f'"{k}": {v}' for k, v in costs.items()]
    lines, cur = [], []
    for e in entries:
        cur.append(e)
        if len(cur) == 4:
            lines.append("    " + ", ".join(cur) + ",")
            cur = []
    if cur:
        lines.append("    " + ", ".join(cur) + ",")
    body = "\n".join(lines)

    with open(REGISTRY) as fh:
        src = fh.read()
    ratio = _median_ratio_vs_table(costs, src)
    if ratio is not None and ratio > 1.10 and "--force" not in sys.argv:
        raise SystemExit(
            f"refusing: median cost ratio {ratio:.3f} vs current table "
            "suggests a loaded-window run — rerun driver_sim quietly or "
            "pass --force"
        )
    pat = re.compile(
        r"(_MEASURED_COST: dict\[str, float\] = \{\n).*?(\n\})", re.DOTALL
    )
    if not pat.search(src):
        raise SystemExit("could not locate _MEASURED_COST dict in registry.py")
    src = pat.sub(lambda m: m.group(1) + body + m.group(2), src, count=1)

    # Maintain the machine-written provenance line so the table's
    # comment cannot go stale across refreshes (round-7 review).
    args = [a for a in sys.argv[1:] if a != "--force"]
    note = args[0] if args else "no note given"
    prov = (
        f"# LAST REFRESH: {len(costs)} queries, total "
        f"{data.get('total_s', '?')} s, zero bad rows; {note}\n"
    )
    # A full refresh subsumes any hand-written supplemental lines
    # (e.g. "(x added after that refresh: subset 2-pass)") — drop
    # every comment line trailing LAST REFRESH up to the dict opener,
    # so unmaintained annotations can't go stale (round-7 advice).
    prov_pat = re.compile(
        r"# LAST REFRESH: [^\n]*\n(?:# \([^\n]*\)\n)*"
    )
    if prov_pat.search(src):
        src = prov_pat.sub(prov, src, count=1)
    else:
        src = src.replace(
            "_MEASURED_COST: dict[str, float] = {",
            prov + "_MEASURED_COST: dict[str, float] = {",
            1,
        )
    with open(REGISTRY, "w") as fh:
        fh.write(src)
    print(f"rewrote _MEASURED_COST: {len(costs)} entries, "
          f"sum {round(sum(costs.values()), 1)} s")


if __name__ == "__main__":
    main()
