"""Trained-vs-untrained RD comparison (VERDICT r2 item 1's 'done' gate).

Reads the across-lambda aggregate JSONs produced by test_video_tpu.py for
two runs (e.g. trained checkpoints vs fresh init), checks RD sanity
(trained strictly better; higher lambda -> higher PSNR and bpp on the
trained curve), and computes the BD-rate between the two curves.

    python scripts/rd_compare.py \
        --trained output/rd_round3/eval_trained/MSE/HEVC_D/HEVC_D_MSE.json \
        --untrained output/rd_round3/eval_untrained/MSE/HEVC_D/HEVC_D_MSE.json \
        --out output/rd_round3/rd_comparison.json
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
    return r["bpp"], r["psnr"], r


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trained", required=True)
    p.add_argument("--untrained", required=True)
    p.add_argument("--out", default="output/rd_round3/rd_comparison.json")
    a = p.parse_args()

    from deepsvc_tpu.eval.bdrate import bd_quality, bd_rate

    t_bpp, t_psnr, t_all = load_curve(a.trained)
    u_bpp, u_psnr, u_all = load_curve(a.untrained)

    checks = {
        "trained_psnr_monotone_in_lambda": all(
            b >= a_ for a_, b in zip(t_psnr, t_psnr[1:])
        ),
        "trained_bpp_monotone_in_lambda": all(
            b >= a_ for a_, b in zip(t_bpp, t_bpp[1:])
        ),
        "trained_beats_untrained_at_every_point": all(
            tp > up for tp, up in zip(t_psnr, u_psnr)
        ),
    }
    out = {
        "trained": {"bpp": t_bpp, "psnr": t_psnr,
                    "msssim": t_all.get("msssim")},
        "untrained": {"bpp": u_bpp, "psnr": u_psnr,
                      "msssim": u_all.get("msssim")},
        "checks": checks,
    }
    try:
        out["bd_rate_trained_vs_untrained_pct"] = bd_rate(
            u_bpp, u_psnr, t_bpp, t_psnr
        )
    except ValueError as e:  # non-overlapping quality ranges: trained is
        # far above untrained everywhere — report BD-PSNR instead
        out["bd_rate_error"] = str(e)
    try:
        out["bd_psnr_trained_vs_untrained_db"] = bd_quality(
            u_bpp, u_psnr, t_bpp, t_psnr
        )
    except ValueError as e:
        out["bd_psnr_error"] = str(e)

    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
