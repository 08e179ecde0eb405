"""Merge per-lambda RD aggregate JSONs into one multi-point curve.

test_video_tpu.py writes one across-lambda aggregate per run
(eval/rd_eval.py write_aggregate).  When the rate points were evaluated
in SEPARATE runs (the resumable campaign evaluates each lambda as soon
as its training finishes), this merges their aggregates into the same
schema by concatenating every series in the given (lambda) order — no
chip time needed, unlike re-running the combined eval.

    python scripts/merge_rd.py --out merged.json a_320.json b_640.json
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+", help="aggregate JSONs in lambda order")
    p.add_argument("--out", required=True)
    a = p.parse_args()

    merged = None
    for path in a.inputs:
        with open(path) as f:
            d = json.load(f)
        if merged is None:
            merged = {k: v for k, v in d.items() if k != "results"}
            merged["results"] = {k: list(v) for k, v in d["results"].items()}
            continue
        if set(d["results"]) != set(merged["results"]):
            raise SystemExit(
                f"{path}: series keys differ from {a.inputs[0]}: "
                f"{set(d['results']) ^ set(merged['results'])}"
            )
        for k, v in d["results"].items():
            merged["results"][k].extend(v)

    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(merged, f, indent=2)
    n = len(next(iter(merged["results"].values())))
    print(f"merged {len(a.inputs)} files -> {a.out} ({n} rate points)")


if __name__ == "__main__":
    main()
