"""manual_yolo_tpu — a TPU-native (JAX/XLA/Pallas) real-time table-reading framework.

A from-scratch rebuild of the capabilities of the reference poker screen-reading
stack (kanaksharma67/manual-yolo): YOLOv8 detection + classification graphs,
on-device image ops (letterbox, threshold, contrast), Pallas NMS, OCR heads
(CRAFT/CRNN with CTC decode), host-side trackers (ByteTrack/DeepSORT-style),
game-state assembly with the reference JSON schemas, and an optax training
stack for the rank classifier and detector.

Everything on the device compute path is pure JAX (jit/pjit/pallas); host-side
runtime pieces (capture, ring buffer, JSON persistence) have native C++
implementations with Python fallbacks.

Reference entry points and their equivalents here:
  detect.py       -> manual_yolo_tpu.cli.detect    (live loop, game-state JSON)
  pipe.py         -> manual_yolo_tpu.cli.pipe      (hand-session pipeline)
  yolo.py         -> manual_yolo_tpu.cli.shot      (single-screenshot pipeline)
  class.py        -> manual_yolo_tpu.cli.train_cls (rank-classifier training)
  unlabel.py      -> manual_yolo_tpu.cli.unlabel   (rank-crop dataset bootstrap)
  getcors.py      -> manual_yolo_tpu.cli.getcors   (mouse-coordinate helper)
"""

from manual_yolo_tpu.version import __version__

__all__ = ["__version__"]
