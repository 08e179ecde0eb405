"""Semantic-layer contribution: same weights, eval with the layer on vs
off (VERDICT r4 item 6; the reference reports `porposed_pbpp_wosm` for
exactly this contrast, test_video.py:446).

    python scripts/semantic_ablation.py \
        --with results/rd_r5_640_final.json \
        --without output/rd_round5/wosm/MSE/HEVC_D/HEVC_D_MSE_640.json \
        --out results/semantic_ablation_r5.json

"on": P-codec conditions on real student-decoded features (smbpp spent);
"off": zero semantic features (the --no-semantic eval).  Both runs use
identical P/I weights, data, frames, GOP.
"""

from __future__ import annotations

import argparse
import json


KEYS = [
    "psnr", "bpp", "pbpp", "porposed_pbpp_wosm",
    "mvbpp", "resbpp", "smbpp", "mcpsnr", "warppsnr", "ppsnr",
]


def series_mean(d, k):
    v = d["results"].get(k)
    if isinstance(v, list):
        v = sum(v) / len(v) if v else 0.0
    return float(v) if v is not None else None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--with", dest="with_", required=True)
    p.add_argument("--without", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()

    with open(a.with_) as f:
        on = json.load(f)
    with open(a.without) as f:
        off = json.load(f)

    row = lambda d: {k: series_mean(d, k) for k in KEYS}
    r_on, r_off = row(on), row(off)
    out = {
        "semantic_on": r_on,
        "semantic_off": r_off,
        "conditions": {"on": on.get("conditions"), "off": off.get("conditions")},
        # what the smbpp spend buys (same weights, same data):
        "delta": {
            "psnr_db": (r_on["psnr"] or 0) - (r_off["psnr"] or 0),
            "p_psnr_db": (r_on["ppsnr"] or 0) - (r_off["ppsnr"] or 0),
            "mc_psnr_db": (r_on["mcpsnr"] or 0) - (r_off["mcpsnr"] or 0),
            "structure_bpp": (r_on["porposed_pbpp_wosm"] or 0)
            - (r_off["porposed_pbpp_wosm"] or 0),
            "total_bpp": (r_on["bpp"] or 0) - (r_off["bpp"] or 0),
            "semantic_spend_bpp": r_on["smbpp"],
        },
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["delta"]))


if __name__ == "__main__":
    main()
