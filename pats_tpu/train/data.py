"""Training batch pipeline: MegaDepth pairs + depth-reprojection labels.

Host-side producer feeding the data-parallel trainer: loads image pairs
with depths, generates the level-1 GT labels (train/labels.py) and packs
fixed-shape batches.  A background thread prefetches while the device
steps (the reference has no trainer at all, SURVEY.md par.3.4).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from pats_tpu.train.labels import make_pair_labels, to_level_labels


def pair_to_example(data: Dict[str, np.ndarray], level: int = 0
                    ) -> Dict[str, np.ndarray]:
    """One dataset item (with depth) -> trainer example with labels."""
    patch = (32, 8, 2)[level]
    lab = make_pair_labels(data["K0"], data["K1"], data["depth0"],
                           data["depth1"], data["T0"], data["T1"])
    gt_pos, gt_class = to_level_labels(lab["labels"][level], patch)
    return {
        "left": data["image0"].astype(np.float32),
        "right": data["image1"].astype(np.float32),
        "gt_pos": gt_pos,
        "gt_class": gt_class,
        "F": lab["F"].astype(np.float32),
    }


def batches(dataset, batch_size: int, level: int = 0,
            prefetch: int = 2) -> Iterator[Dict[str, np.ndarray]]:
    """Threaded prefetching batch iterator over a depth-enabled dataset."""
    q: "queue.Queue[Optional[dict]]" = queue.Queue(maxsize=prefetch)

    def producer():
        buf = []
        try:
            for item in dataset:
                buf.append(pair_to_example(item, level))
                if len(buf) == batch_size:
                    q.put({k: np.stack([b[k] for b in buf])
                           for k in buf[0]})
                    buf = []
        finally:
            q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        batch = q.get()
        if batch is None:
            return
        yield batch
