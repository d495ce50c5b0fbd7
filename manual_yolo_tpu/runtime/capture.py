"""Frame sources: screen capture (gated), files, video, synthetic.

The reference captures with mss (``detect.py:527``, ``pipe.py:361``) or
pyautogui (``yolo.py:578``), neither of which exists headless; sources here
share one iterator protocol so every pipeline can run off a screen, a
directory of screenshots, or a synthetic generator (tests/bench).

The double-buffered native ring (native/framering.cpp via runtime/native.py)
decouples the capture thread from device submission — the TPU equivalent of
overlapping host capture with device compute.
"""

from __future__ import annotations

import itertools
import os
import time
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


def screen_source(
    region: Optional[Dict[str, int]] = None, fps: Optional[float] = None
) -> Iterator[np.ndarray]:
    """mss-based capture -> BGR frames (reference detect.py:527-536).

    Raises RuntimeError if no capture backend is installed.
    """
    try:
        import mss  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "screen capture requires 'mss' (not installed in this environment); "
            "use file_source()/synthetic_source() instead"
        ) from e
    interval = 1.0 / fps if fps else 0.0
    last = 0.0
    with mss.mss() as sct:
        mon = region or sct.monitors[1]
        while True:
            now = time.time()
            if interval and now - last < interval:
                time.sleep(interval - (now - last))
            last = time.time()
            shot = np.asarray(sct.grab(mon))
            yield np.ascontiguousarray(shot[..., :3])  # BGRA -> BGR


def file_source(path: str, loop: bool = False) -> Iterator[np.ndarray]:
    """Single image, directory of images, or video file -> BGR frames."""
    import cv2

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
        )
        it = itertools.cycle(files) if loop else iter(files)
        for f in it:
            img = cv2.imread(f)
            if img is not None:
                yield img
    elif path.lower().endswith((".mp4", ".avi", ".mkv", ".mov")):
        cap = cv2.VideoCapture(path)
        while True:
            ok, frame = cap.read()
            if not ok:
                if loop:
                    cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
                    continue
                break
            yield frame
        cap.release()
    else:
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        while True:
            yield img.copy()
            if not loop:
                break


def synthetic_source(
    hw: Tuple[int, int] = (1200, 1920), seed: int = 0
) -> Iterator[np.ndarray]:
    """Deterministic noise frames (bench/tests)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, hw + (3,), np.uint8)
    while True:
        jitter = rng.integers(0, 16, hw + (3,), np.uint8)
        yield ((base.astype(np.int16) + jitter) % 256).astype(np.uint8)


def make_source(spec: str, **kwargs) -> Iterator[np.ndarray]:
    """'screen' | 'synthetic' | a file/dir/video path."""
    if spec == "screen":
        return screen_source(**kwargs)
    if spec == "synthetic":
        return synthetic_source(**{k: v for k, v in kwargs.items() if k in ("hw", "seed")})
    return file_source(spec, loop=kwargs.get("loop", False))
