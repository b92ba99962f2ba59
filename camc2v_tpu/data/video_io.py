"""Video decode/encode backends (host-side, off the TPU critical path).

Replaces the reference's decord `VideoReader` (reference:
CamContextI2V/data/realestate10k.py:9,174) and `torchvision.io.write_video`
(utils/save_video.py:63,130). Backend resolution order:

  1. `camc2v_decode` — the C++ libav extension (native/decode/, built via
     setup.py) when compiled;
  2. OpenCV `VideoCapture` / `VideoWriter` (always present in this image);
  3. `.npz` clip files (tests / pre-extracted datasets): a file `foo.npz`
     with array 'frames' (T, H, W, 3) uint8 and scalar 'fps'.

All frames are RGB uint8 (T, H, W, 3).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


class VideoReader:
    """Random-access frame reader."""

    def __init__(self, path: str):
        self.path = path
        self._frames: Optional[np.ndarray] = None
        self._fps: float = 30.0
        self._n = 0
        if path.endswith(".npz"):
            data = np.load(path)
            self._frames = data["frames"]
            self._fps = float(data["fps"]) if "fps" in data else 30.0
            self._n = len(self._frames)
        else:
            try:
                from camc2v_tpu.data import _native_decode  # type: ignore

                self._native = _native_decode.open(path)
                self._n = self._native.num_frames
                self._fps = self._native.fps
                return
            except Exception:
                self._native = None
            import cv2

            cap = cv2.VideoCapture(path)
            if not cap.isOpened():
                raise IOError(f"cannot open video: {path}")
            self._cap = cap
            self._fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
            self._n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __len__(self) -> int:
        return self._n

    @property
    def fps(self) -> float:
        return self._fps

    def get_batch(self, indices: Sequence[int]) -> np.ndarray:
        """(len(indices), H, W, 3) RGB uint8."""
        if self._frames is not None:
            return self._frames[np.asarray(indices)]
        if getattr(self, "_native", None) is not None:
            return self._native.get_batch(list(indices))
        import cv2

        out = []
        # sorted access is dramatically faster for sequential codecs; restore order after
        order = np.argsort(indices)
        sorted_idx = np.asarray(indices)[order]
        frames = {}
        for idx in sorted_idx:
            self._cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
            ok, frame = self._cap.read()
            if not ok:
                raise IOError(f"failed to read frame {idx} of {self.path}")
            frames[int(idx)] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        return np.stack([frames[int(i)] for i in indices])

    def read_all(self) -> np.ndarray:
        return self.get_batch(list(range(self._n)))

    def close(self):
        if getattr(self, "_cap", None) is not None:
            self._cap.release()


def write_video(path: str, frames: np.ndarray, fps: float = 8.0) -> None:
    """frames: (T, H, W, 3) uint8 RGB -> mp4 (or .npz passthrough)."""
    if path.endswith(".npz"):
        np.savez_compressed(path, frames=frames, fps=fps)
        return
    import cv2

    h, w = frames.shape[1:3]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(path, fourcc, fps, (w, h))
    if not vw.isOpened():
        raise IOError(f"cannot open video writer: {path}")
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
