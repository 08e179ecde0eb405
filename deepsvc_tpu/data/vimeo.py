"""Vimeo-90k septuplet training pipeline (reference: dataset.py:12-132).

Host-side threaded loader producing (f, B, H, W, 3) float32 clip batches:
frame 1 can be swapped for a pre-coded I-frame (BPG ``im1_bpg444_QP{qp}``
for PSNR models, CA-model ``im1_level{level}_ssim`` for MS-SSIM models —
offline preprocessing artifacts, as in the reference), joint random crop
+ horizontal/vertical flip over the whole clip.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from dataclasses import dataclass

import numpy as np

from .frames import read_image

# l_PSNR -> BPG QP (dataset.py:61-68); l_MSSSIM -> CA level (dataset.py:70-77)
QP_BY_LAMBDA = {
    256: 37, 512: 32, 1024: 27, 2048: 22,
    80: 37, 160: 32, 320: 27, 640: 22, 1280: 22,
}


def qp_for_lambda(lam: int) -> int:
    """Strict lambda->QP pairing (higher lambda -> lower QP, dataset.py:59-77).

    Raises on unmapped lambdas instead of silently mispairing rate tiers.
    """
    try:
        return QP_BY_LAMBDA[lam]
    except KeyError:
        raise KeyError(
            f"no BPG QP mapped for lambda={lam}; known: {sorted(QP_BY_LAMBDA)}"
        ) from None
LEVEL_BY_LAMBDA = {8: 2, 16: 3, 32: 5, 64: 7}


@dataclass
class VimeoConfig:
    root: str
    split: str = "train"          # sep_{split}list.txt
    model_type: str = "PSNR"      # "PSNR" | "MSSSIM"
    qp: int = 27
    level: int = 5
    max_frames: int = 7
    crop: int = 256
    use_coded_iframe: bool = True
    # VimeoDataset1 `return_orgi` (reference dataset.py:231-285): clips
    # gain a leading ORIGINAL im1 ahead of the AI-coded I-frame
    # (<root>/<coded_iframe_dir>/<seq>/im1_1.png), so the semantic
    # trainer can distill against the uncompressed target while the
    # codec consumes the coded one.  PSNR models only.
    return_orgi: bool = False
    coded_iframe_dir: str = "ICIP2020_i_mse"
    seed: int = 0


class VimeoClips:
    """Iterable over septuplet clip batches."""

    def __init__(self, cfg: VimeoConfig):
        self.cfg = cfg
        list_file = os.path.join(cfg.root, f"sep_{cfg.split}list.txt")
        with open(list_file) as f:
            names = [x.strip() for x in f if x.strip()]
        self.dirs = [os.path.join(cfg.root, "sequences", n) for n in names]
        self.rng = np.random.default_rng(cfg.seed)

    def __len__(self):
        return len(self.dirs)

    def _frame_paths(self, d: str) -> list[str]:
        cfg = self.cfg
        paths = []
        for i in range(1, cfg.max_frames + 1):
            if i == 1 and cfg.return_orgi and cfg.model_type == "PSNR":
                # original + AI-coded pairing (dataset.py:258-265):
                # frame 0 = pristine im1 (distillation target), frame 1 =
                # the offline AI-coded I-frame the codec actually sees
                paths.append(os.path.join(d, "im1.png"))
                paths.append(
                    os.path.join(
                        d.replace("sequences", cfg.coded_iframe_dir), "im1_1.png"
                    )
                )
            elif i == 1 and cfg.use_coded_iframe:
                if cfg.model_type == "PSNR":
                    paths.append(
                        os.path.join(
                            d.replace("sequences", "bpg"), f"im1_bpg444_QP{cfg.qp}.png"
                        )
                    )
                else:
                    paths.append(
                        os.path.join(d, "CA_Model", f"im1_level{cfg.level}_ssim.png")
                    )
            else:
                paths.append(os.path.join(d, f"im{i}.png"))
        return paths

    def load_clip(self, index: int, augment: bool = True) -> np.ndarray:
        """(f, H, W, 3) float32, joint crop/flip across the clip."""
        cfg = self.cfg
        frames = np.stack([read_image(p) for p in self._frame_paths(self.dirs[index])])
        f, H, W, _ = frames.shape
        c = cfg.crop
        if augment:
            top = int(self.rng.integers(0, max(H - c, 0) + 1))
            left = int(self.rng.integers(0, max(W - c, 0) + 1))
            clip = frames[:, top : top + c, left : left + c]
            if self.rng.random() < 0.5:
                clip = clip[:, :, ::-1]
            if self.rng.random() < 0.5:
                clip = clip[:, ::-1, :]
        else:
            top = max((H - c) // 2, 0)
            left = max((W - c) // 2, 0)
            clip = frames[:, top : top + c, left : left + c]
        return np.ascontiguousarray(clip)

    def batches(self, batch_size: int, shuffle: bool = True, workers: int = 2,
                prefetch: int = 2):
        """Yield (f, B, crop, crop, 3) batches with background loading."""
        order = np.arange(len(self.dirs))
        if shuffle:
            self.rng.shuffle(order)
        chunks = [
            order[i : i + batch_size]
            for i in range(0, len(order) - batch_size + 1, batch_size)
        ]

        def load_batch(idxs):
            clips = [self.load_clip(int(j), augment=shuffle) for j in idxs]
            return np.stack(clips, axis=1)  # (f, B, H, W, 3)

        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            futures = [pool.submit(load_batch, c) for c in chunks[:prefetch]]
            nxt = prefetch
            for i in range(len(chunks)):
                batch = futures[i].result()
                if nxt < len(chunks):
                    futures.append(pool.submit(load_batch, chunks[nxt]))
                    nxt += 1
                yield batch
