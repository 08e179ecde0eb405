"""Frame/image IO: PNG sequence reading with background prefetch.

Host-side input pipeline replacing the reference's torch DataLoader
worker processes (SURVEY.md §2.5): a thread pool decodes PNGs (PIL
releases the GIL during decode) and a bounded queue prefetches ahead of
the device.
"""

from __future__ import annotations

import concurrent.futures as cf
import glob
import os
from typing import Iterator

import numpy as np


def read_image(path: str) -> np.ndarray:
    """(H, W, 3) float32 in [0,1] (reference: modules.py:65-68)."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def sequence_frames(
    seq_dir: str, max_frames: int = 96, prefetch: int = 4
) -> Iterator[np.ndarray]:
    """Yield decoded frames of a PNG sequence directory in sorted order,
    decoding ahead on a worker thread."""
    paths = sorted(glob.glob(os.path.join(seq_dir, "*.png")))[:max_frames]
    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        futures = []
        idx = 0
        for _ in range(min(prefetch, len(paths))):
            futures.append(pool.submit(read_image, paths[idx]))
            idx += 1
        for i in range(len(paths)):
            frame = futures[i].result()
            if idx < len(paths):
                futures.append(pool.submit(read_image, paths[idx]))
                idx += 1
            yield frame


def sequence_dir(root: str, dataset_dir: str, seq: str, org_res: str, x64_res: str) -> str:
    """Resolve <root>/<dataset_dir>/PNG_Frames/<seq with x64 resolution>
    (reference: test_video.py:282-284)."""
    return os.path.join(root, dataset_dir, "PNG_Frames", seq.replace(org_res, x64_res))
