"""VID annotation reader + mAP evaluator tests (VERDICT r1 item 5)."""

import os
import textwrap
from dataclasses import dataclass

import numpy as np
import pytest

from deepsvc_tpu.data.vid import (
    VID_WNIDS,
    WNID_TO_LABEL,
    annotation_path,
    read_vid_annotation,
)
from deepsvc_tpu.eval.detection_eval import average_precision, vid_map


@dataclass
class Det:
    boxes: np.ndarray
    scores: np.ndarray
    labels: np.ndarray


def det(boxes, scores, labels):
    return Det(
        np.asarray(boxes, np.float32).reshape(-1, 4),
        np.asarray(scores, np.float32),
        np.asarray(labels, np.int32),
    )


def ann(boxes, labels):
    return {
        "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
        "labels": np.asarray(labels, np.int32),
    }


class TestAnnotationReader:
    def test_parse_voc_xml(self, tmp_path):
        xml = textwrap.dedent(f"""\
            <annotation>
              <size><width>1280</width><height>720</height></size>
              <object>
                <trackid>0</trackid>
                <name>{VID_WNIDS[6]}</name>
                <bndbox><xmax>500</xmax><xmin>100</xmin>
                        <ymax>400</ymax><ymin>200</ymin></bndbox>
                <occluded>1</occluded>
              </object>
              <object>
                <trackid>1</trackid>
                <name>n99999999</name>
                <bndbox><xmax>10</xmax><xmin>0</xmin>
                        <ymax>10</ymax><ymin>0</ymin></bndbox>
              </object>
            </annotation>
        """)
        p = tmp_path / "000000.xml"
        p.write_text(xml)
        out = read_vid_annotation(str(p))
        assert out["size"] == (720, 1280)
        # unknown wnid skipped
        assert out["boxes"].shape == (1, 4)
        np.testing.assert_array_equal(out["boxes"][0], [100, 200, 500, 400])
        assert out["labels"][0] == 6  # car
        assert out["trackids"][0] == 0
        assert bool(out["occluded"][0])

    def test_annotation_path_mapping(self):
        p = annotation_path(
            "/data/vid", "/data/vid/Data/VID/val/seq_00/000042.JPEG"
        )
        assert p == "/data/vid/Annotations/VID/val/seq_00/000042.xml"

    def test_wnid_table_complete(self):
        assert len(VID_WNIDS) == 30
        assert len(WNID_TO_LABEL) == 30


class TestMAP:
    def test_oracle_detections_are_perfect(self):
        gt = [ann([[0, 0, 10, 10], [20, 20, 30, 30]], [0, 1])]
        dets = [det([[0, 0, 10, 10], [20, 20, 30, 30]], [0.9, 0.8], [0, 1])]
        out = vid_map(dets, gt, num_classes=2)
        assert out["mAP"] == pytest.approx(1.0)

    def test_disjoint_detections_are_zero(self):
        gt = [ann([[0, 0, 10, 10]], [0])]
        dets = [det([[50, 50, 60, 60]], [0.9], [0])]
        assert vid_map(dets, gt, num_classes=1)["mAP"] == pytest.approx(0.0)

    def test_wrong_class_is_zero(self):
        gt = [ann([[0, 0, 10, 10]], [0])]
        dets = [det([[0, 0, 10, 10]], [0.9], [1])]
        assert vid_map(dets, gt, num_classes=2)["mAP"] == pytest.approx(0.0)

    def test_half_recall(self):
        # 2 GT, 1 perfect detection, no false positives -> AP = 0.5
        gt = [ann([[0, 0, 10, 10], [20, 20, 30, 30]], [0, 0])]
        dets = [det([[0, 0, 10, 10]], [0.9], [0])]
        assert vid_map(dets, gt, num_classes=1)["mAP"] == pytest.approx(0.5)

    def test_duplicate_detection_is_fp(self):
        # second hit on the same GT counts as a false positive
        gt = [ann([[0, 0, 10, 10]], [0])]
        dets = [det([[0, 0, 10, 10], [0, 0, 10, 10]], [0.9, 0.8], [0])]
        out = vid_map(
            [det([[0, 0, 10, 10], [1, 0, 11, 10]], [0.9, 0.8], [0, 0])], gt,
            num_classes=1,
        )
        assert out["mAP"] == pytest.approx(1.0)  # high-score one matches

    def test_across_frames(self):
        gt = [ann([[0, 0, 10, 10]], [0]), ann([[5, 5, 15, 15]], [0])]
        dets = [
            det([[0, 0, 10, 10]], [0.9], [0]),
            det([[100, 100, 110, 110]], [0.95], [0]),  # miss, higher score
        ]
        out = vid_map(dets, gt, num_classes=1)
        # ranking: fp(0.95), tp(0.9): precisions 0, 1/2 at recall 1/2
        assert out["mAP"] == pytest.approx(0.25)

    def test_average_precision_envelope(self):
        r = np.array([0.5, 1.0])
        p = np.array([1.0, 0.5])
        assert average_precision(r, p) == pytest.approx(0.75)
