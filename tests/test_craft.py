"""CRAFT graph shape/postprocess tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.models import craft  # noqa: E402


def test_forward_shapes():
    params = craft.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 96, 3))
    out = craft.forward(params, x)
    assert out.shape == (1, 32, 48, 2)


def test_text_regions_postprocess():
    cv2 = pytest.importorskip("cv2")
    scores = np.zeros((32, 48, 2), np.float32)
    scores[5:10, 5:20, 0] = 0.9  # one strong text region
    scores[20:24, 30:40, 0] = 0.3  # weak region below text_threshold
    boxes = craft.text_regions_from_scores(scores)
    assert len(boxes) == 1
    x1, y1, x2, y2 = boxes[0]
    assert (x1, y1) == (10, 10) and (x2, y2) == (40, 20)


def test_text_regions_split_stacked_lines():
    """Two stacked lines whose masks merge through a shallow valley (the
    real name-over-stack panel profile: peaks ~0.8, valley ~0.6 — well
    above low_text) must come back as TWO boxes via the row watershed."""
    cv2 = pytest.importorskip("cv2")
    scores = np.zeros((36, 48, 2), np.float32)
    ys = np.arange(36, dtype=np.float32)
    # bimodal region profile: peaks ~0.87 at rows 10/22, valley ~0.55 at 16
    # (the measured real-panel shape); mask stays connected (valley > low_text)
    prof = 0.85 * (np.exp(-((ys - 10) ** 2) / 32)
                   + np.exp(-((ys - 22) ** 2) / 32))
    scores[:, 6:40, 0] = np.minimum(prof, 0.95)[:, None]
    boxes = sorted(craft.text_regions_from_scores(scores),
                   key=lambda b: b[1])
    assert len(boxes) == 2, boxes
    (ax1, ay1, ax2, ay2), (bx1, by1, bx2, by2) = boxes
    assert ay2 <= by1 + 2  # split near the valley, no big overlap
    assert ay1 <= 2 * 10 <= ay2 and by1 <= 2 * 22 <= by2  # each holds its peak


def test_text_regions_single_line_not_split():
    """A unimodal profile (one line, plateaued peak) must stay ONE box."""
    cv2 = pytest.importorskip("cv2")
    scores = np.zeros((32, 48, 2), np.float32)
    ys = np.arange(32, dtype=np.float32)
    prof = 0.9 * np.exp(-((ys - 12) ** 2) / 60)
    scores[:, 4:44, 0] = prof[:, None]
    # mild noise that must not create spurious cuts
    rng = np.random.default_rng(0)
    scores[..., 0] += rng.uniform(-0.02, 0.02, scores.shape[:2])
    assert len(craft.text_regions_from_scores(scores)) == 1


def _dataset_panel():
    import os

    root = "/root/reference/roadmap1.v3i.yolov8"
    img_path = os.path.join(
        root, "test/images",
        "2025-07-31-100-_png.rf.a44b5f2e8e9302529aedb49008010d6d.jpg")
    lbl_path = img_path.replace("/images/", "/labels/").replace(".jpg", ".txt")
    if not (os.path.exists(img_path) and os.path.exists(lbl_path)
            and os.path.exists("weights/craft_real.npz")
            and os.path.exists("weights/crnn_real_a.npz")):
        return None
    return img_path, lbl_path


def test_read_region_real_panel_two_lines():
    """E2E on REAL pixels: the villian2 name-over-stack panel of a test-split
    screenshot ('CloudyComb' / '19.8K') through the trained CRAFT + CRNN —
    the reference's readtext path (detect.py:198). CRAFT must find both
    lines; the numeric line must read its value."""
    cv2 = pytest.importorskip("cv2")
    import yaml

    found = _dataset_panel()
    if found is None:
        pytest.skip("dataset or trained weights not present")
    img_path, lbl_path = found
    with open("/root/reference/roadmap1.v3i.yolov8/data.yaml") as f:
        names = yaml.safe_load(f)["names"]
    img = cv2.imread(img_path)
    h, w = img.shape[:2]
    boxes = {}
    for ln in open(lbl_path):
        p = ln.split()
        cname = names[int(p[0])]
        if cname in ("villian2_name", "villian2_stack"):
            xc, yc, bw, bh = (float(v) for v in p[1:5])
            boxes[cname] = (int((xc - bw / 2) * w), int((yc - bh / 2) * h),
                            int((xc + bw / 2) * w), int((yc + bh / 2) * h))
    assert len(boxes) == 2
    x1 = max(0, min(b[0] for b in boxes.values()) - 6)
    y1 = max(0, min(b[1] for b in boxes.values()) - 6)
    x2 = min(w, max(b[2] for b in boxes.values()) + 6)
    y2 = min(h, max(b[3] for b in boxes.values()) + 6)
    panel = img[y1:y2, x1:x2]

    from manual_yolo_tpu.runtime.ocr import OCREngine

    eng = OCREngine.from_npz(
        "weights/crnn_real_a.npz,weights/crnn_real_b.npz",
        text_detector="weights/craft_real.npz")
    lines = eng.read_region(panel, "numeric", min_confidence=0.0)
    assert len(lines) >= 2, f"CRAFT found {len(lines)} lines: {lines}"
    centers = sorted((ly1 + ly2) / 2 for (_, ly1, _, ly2), _t, _c in lines)
    assert centers[-1] - centers[0] > (y2 - y1) * 0.25, lines
    texts = [t for _b, t, _c in lines]
    assert any("19.8K" in t or "198K" in t for t in texts), texts
