"""Detector accuracy above chance on a synthetic annotated clip.

VERDICT r2 item 4: overfit the depth-26 SELSA detector on a 3-frame
synthetic clip, run VideoDetectionEvaluator over the real bitstream
path, and assert vid_map mAP well above chance.  Parity role:
/root/reference/temporal_roi_align.py:626-635 + external mmtracking mAP
(the reference never ships an in-repo accuracy test at all).

The full overfit takes minutes on CPU -> marked slow.  The committed
artifact from the same harness is results/detection_overfit_map.json.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


@pytest.mark.slow
def test_overfit_detector_map_above_chance(tmp_path):
    from scripts.detection_overfit_eval import main

    out = main(steps=400, out_path=str(tmp_path / "map.json"))
    # Random boxes on a 1-object clip score ~0; the overfit head must
    # recover the moving square through the real bitstream path.
    assert out["mAP_train_path"] >= 0.5, out
    assert out["mAP"] >= 0.3, out
    assert out["pfeabpp"] > 0.0, "semantic feature stream carried no bits"
