"""BD-rate/BD-PSNR between two across-lambda aggregate JSONs.

    python scripts/bd_between.py --anchor r3_agg.json --test r4_agg.json \
        --out results/bd_r4_vs_r3.json

Anchor/test are the {tgt}_{INDICATOR}.json files test_video_tpu.py
writes (results.bpp / results.psnr are the per-rate-point series).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_curve(path):
    with open(path) as f:
        r = json.load(f)["results"]
    return r["bpp"], r["psnr"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--anchor", required=True)
    p.add_argument("--test", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()

    from deepsvc_tpu.eval.bdrate import bd_quality, bd_rate

    a_bpp, a_psnr = load_curve(a.anchor)
    t_bpp, t_psnr = load_curve(a.test)
    out = {
        "anchor": {"path": a.anchor, "bpp": a_bpp, "psnr": a_psnr},
        "test": {"path": a.test, "bpp": t_bpp, "psnr": t_psnr},
    }
    try:
        out["bd_rate_pct"] = bd_rate(a_bpp, a_psnr, t_bpp, t_psnr)
    except ValueError as e:
        out["bd_rate_error"] = str(e)
    try:
        out["bd_psnr_db"] = bd_quality(a_bpp, a_psnr, t_bpp, t_psnr)
    except ValueError as e:
        out["bd_psnr_error"] = str(e)
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
