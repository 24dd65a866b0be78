"""Round-close helper: snapshot the current full bench report as BENCH_prev.json.

bench.py's ``_prev_delta`` compares each run's per-query seconds against
``BENCH_prev.json``; this script rolls the freshly produced ``BENCH_full.json``
into that slot in the canonical shape (headline wall seconds in ``value``/
``unit``, throughput in ``urls_per_sec``, full per-query table, trailing
newline — ADVICE r04 items 1+2).

Usage: python tools/roll_bench_prev.py  (run from anywhere; paths are repo-relative)
"""
from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    full_path = os.path.join(REPO, "BENCH_full.json")
    prev_path = os.path.join(REPO, "BENCH_prev.json")
    with open(full_path) as f:
        full = json.load(f)
    prev = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "urls_per_sec": full.get("urls_per_sec"),
        "num_cpus": full.get("num_cpus"),
        "sf": full.get("sf"),
        "note": "Full prior-round per-query report (rolled from BENCH_full.json "
                "at round close by tools/roll_bench_prev.py). value is the "
                "headline fetch+decode wall time in seconds.",
        "queries": full.get("queries") or {},
    }
    with open(prev_path, "w") as f:
        json.dump(prev, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {prev_path} ({len(prev['queries'])} queries)")


if __name__ == "__main__":
    main()
