"""Double-buffered host->HBM frame prefetch.

Replaces the reference's synchronous per-frame dataset->cuda copies
(utils/dataset.py:333-339): a background thread decodes + device_puts the
next frames while the SLAM loop works on the current one, so PNG decode
and PCIe/HBM transfer overlap tracking compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax

from fourdgs.slam.camera import Frame, make_frame


class FramePrefetcher:
    def __init__(self, dataset, edge_threshold: float = 1.1, depth_buffer: int = 2,
                 start: int = 0, end: int | None = None):
        self.dataset = dataset
        self.edge_threshold = edge_threshold
        self.n = len(dataset) if end is None else min(end, len(dataset))
        self.start = start
        self._q: queue.Queue = queue.Queue(maxsize=depth_buffer)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        denom = max(self.dataset.num_imgs - 1, 1)
        for idx in range(self.start, self.n):
            image, depth, pose, motion_mask = self.dataset[idx]
            frame = make_frame(
                idx, image, depth, pose, time=idx / denom,
                motion_mask=motion_mask, edge_threshold=self.edge_threshold,
            )
            frame = jax.device_put(frame)
            self._q.put((idx, frame, pose))
        self._q.put(None)

    def __iter__(self) -> Iterator[tuple[int, Frame, object]]:
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item
