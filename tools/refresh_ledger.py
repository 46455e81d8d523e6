#!/usr/bin/env python
"""Regenerate the ``_LAST_GREEN`` ledger in ``plans/registry.py``.

Scans every ``CORRECTNESS_r0N.json`` at the repo root and prints, per
query name, the latest round whose driver row was green (rows+schema+
hash) or — for the rows-only-by-design names — had rows recorded at
all. Paste the output over the ``_LAST_GREEN`` literal at the start of
each round, then move that round's rewrites into ``_NEEDS_FRESH_SCORE``.

Usage: python tools/refresh_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_green_rounds() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
            rows_only = row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            if green or rows_only:
                out[name] = rnd
    return out


def main() -> None:
    lg = last_green_rounds()
    by_round: dict[int, list[str]] = {}
    for name, rnd in lg.items():
        by_round.setdefault(rnd, []).append(name)
    print("_LAST_GREEN = {")
    for rnd in sorted(by_round):
        print(f"    # round {rnd}")
        for name in sorted(by_round[rnd]):
            print(f'    "{name}": {rnd},')
    print("}")


if __name__ == "__main__":
    main()
