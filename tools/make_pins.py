#!/usr/bin/env python3
"""Derive the committed BENCH_PINS.json from a BENCH_DETAIL.json run.

BENCH_PINS.json is the curated per-query reference table the bench's
burst-retry sweep reads (preferred over the raw previous detail file) and
the judge reads for cross-round regression checks:

    {"round": N, "calibration_sec": C, "source": "...", "pins": {"q": sec}}

Usage: tools/make_pins.py <round> [detail_json] [out_json]
"""
import json
import sys


def main() -> None:
    rnd = int(sys.argv[1])
    detail_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_PINS.json"
    with open(detail_path) as f:
        detail = json.load(f)
    pins = {
        name: q["total_sec"]
        for name, q in sorted(detail["per_query"].items())
        if q is not None
    }
    out = {
        "round": rnd,
        "calibration_sec": detail["calibration_sec"],
        "source": detail_path,
        "pins": pins,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=False)
        f.write("\n")
    print(f"wrote {out_path}: {len(pins)} pins, round {rnd}, "
          f"calibration {detail['calibration_sec']}")


if __name__ == "__main__":
    main()
