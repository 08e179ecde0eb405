"""ImageNet-VID clip pipeline (reference: dataset.py:135-228).

5-frame clips listed in ``<root>/VID/{split}.txt``; the first frame may
be swapped for an offline BPG-coded version (``bpg/...._bpg444_QP{qp}``),
joint horizontal/vertical flips.  Also provides the VID annotation
reader (VOC-style XML under ``Annotations/VID/...``: boxes + 30-class
labels + track ids) that detection training/mAP evaluation consume —
the reference reads these via mmtracking's VID dataset.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass

import numpy as np

from .frames import read_image

VID_CLASSES = (
    "airplane", "antelope", "bear", "bicycle", "bird", "bus", "car",
    "cattle", "dog", "domestic_cat", "elephant", "fox", "giant_panda",
    "hamster", "horse", "lion", "lizard", "monkey", "motorcycle",
    "rabbit", "red_panda", "sheep", "snake", "squirrel", "tiger",
    "train", "turtle", "watercraft", "whale", "zebra",
)

# ImageNet-VID wnid synsets, index-aligned with VID_CLASSES
VID_WNIDS = (
    "n02691156", "n02419796", "n02131653", "n02834778", "n01503061",
    "n02924116", "n02958343", "n02402425", "n02084071", "n02121808",
    "n02503517", "n02118333", "n02510455", "n02342885", "n02374451",
    "n02129165", "n01674464", "n02484322", "n03790512", "n02324045",
    "n02509815", "n02411705", "n01726692", "n02355227", "n02129604",
    "n04468005", "n01662784", "n04530566", "n02062744", "n02391049",
)
WNID_TO_LABEL = {w: i for i, w in enumerate(VID_WNIDS)}


def read_vid_annotation(xml_path: str):
    """Parse one VOC-style VID annotation file.

    Returns dict(boxes (M,4) float32 xyxy, labels (M,) int32,
    trackids (M,) int32, occluded (M,) bool, size (H, W)).
    Unknown wnids are skipped (VID annotates only the 30 classes).
    """
    root = ET.parse(xml_path).getroot()
    size = root.find("size")
    h = int(size.find("height").text) if size is not None else 0
    w = int(size.find("width").text) if size is not None else 0

    boxes, labels, tracks, occl = [], [], [], []
    for obj in root.findall("object"):
        wnid = obj.find("name").text.strip()
        if wnid not in WNID_TO_LABEL:
            continue
        bb = obj.find("bndbox")
        boxes.append([
            float(bb.find("xmin").text),
            float(bb.find("ymin").text),
            float(bb.find("xmax").text),
            float(bb.find("ymax").text),
        ])
        labels.append(WNID_TO_LABEL[wnid])
        tid = obj.find("trackid")
        tracks.append(int(tid.text) if tid is not None else -1)
        oc = obj.find("occluded")
        occl.append(bool(int(oc.text)) if oc is not None else False)
    return {
        "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
        "labels": np.asarray(labels, np.int32),
        "trackids": np.asarray(tracks, np.int32),
        "occluded": np.asarray(occl, bool),
        "size": (h, w),
    }


def annotation_path(root: str, frame_path: str) -> str:
    """Map a Data/VID frame path to its Annotations/VID xml path."""
    rel = os.path.relpath(frame_path, root)
    rel = rel.replace("Data" + os.sep, "Annotations" + os.sep, 1)
    return os.path.join(root, os.path.splitext(rel)[0] + ".xml")


@dataclass
class VIDConfig:
    root: str
    split: str = "train"
    qp: int = 27
    max_frames: int = 5
    use_coded_iframe: bool = True
    seed: int = 0


class VIDClips:
    def __init__(self, cfg: VIDConfig):
        self.cfg = cfg
        list_file = os.path.join(cfg.root, "VID", f"{cfg.split}.txt")
        with open(list_file) as f:
            self.entries = [x.strip().replace("\\", "/") for x in f if x.strip()]
        self.rng = np.random.default_rng(cfg.seed)

    def __len__(self):
        return len(self.entries)

    def _frame_paths(self, entry: str, coded_iframe: bool | None = None) -> list[str]:
        cfg = self.cfg
        coded = cfg.use_coded_iframe if coded_iframe is None else coded_iframe
        name = os.path.basename(entry)
        start = int(os.path.splitext(name)[0])
        paths = []
        for i in range(start, start + cfg.max_frames):
            fname = f"{i:06d}.JPEG"
            p = entry.replace(name, fname)
            if i == start and coded:
                p = entry.replace(
                    name, f"bpg/{i:06d}_bpg444_QP{cfg.qp}.JPEG"
                )
            paths.append(os.path.join(cfg.root, p))
        return paths

    def load_annotations(self, index: int) -> list[dict]:
        """Per-frame VOC-XML annotations (boxes/labels/trackids) for the
        clip's ORIGINAL frames; pair with load_clip(augment=False)."""
        paths = self._frame_paths(self.entries[index], coded_iframe=False)
        return [
            read_vid_annotation(annotation_path(self.cfg.root, p)) for p in paths
        ]

    def load_clip(self, index: int, augment: bool = True) -> np.ndarray:
        """(f, H, W, 3) float32 in [0,1]."""
        frames = np.stack(
            [read_image(p) for p in self._frame_paths(self.entries[index])]
        )
        if augment:
            if self.rng.random() < 0.5:
                frames = frames[:, :, ::-1]
            if self.rng.random() < 0.5:
                frames = frames[:, ::-1, :]
        return np.ascontiguousarray(frames)
