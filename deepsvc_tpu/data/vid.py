"""ImageNet-VID clip pipeline (reference: dataset.py:135-228).

5-frame clips listed in ``<root>/VID/{split}.txt``; the first frame may
be swapped for an offline BPG-coded version (``bpg/...._bpg444_QP{qp}``),
joint horizontal/vertical flips.  Also provides the VID annotation
reader used by detection training (boxes + 30-class labels).
"""

from __future__ import annotations

import os
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

    def _frame_paths(self, entry: str) -> list[str]:
        cfg = self.cfg
        name = os.path.basename(entry)
        start = int(os.path.splitext(name)[0])
        paths = []
        for i in range(start, start + cfg.max_frames):
            fname = f"{i:06d}.JPEG"
            p = entry.replace(name, fname)
            if i == start and cfg.use_coded_iframe:
                p = entry.replace(
                    name, f"bpg/{i:06d}_bpg444_QP{cfg.qp}.JPEG"
                )
            paths.append(os.path.join(cfg.root, p))
        return paths

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
