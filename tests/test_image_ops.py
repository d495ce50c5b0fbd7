"""Device image ops vs OpenCV oracles (parity gates per SURVEY hard-part e)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.ops import image as img_ops  # noqa: E402

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def gray_img():
    rng = np.random.default_rng(0)
    # structured test image: gradient + shapes + noise
    x = np.linspace(0, 1, 96)[None, :] * np.ones((64, 1))
    x[20:40, 30:60] = 0.9
    x[10:18, 10:22] = 0.05
    x += rng.normal(0, 0.03, x.shape)
    return np.clip(x, 0, 1).astype(np.float32)


def test_gray_conversion():
    rng = np.random.default_rng(1)
    bgr = rng.integers(0, 255, (16, 16, 3), np.uint8)
    ours = np.asarray(img_ops.bgr_to_gray(jnp.asarray(bgr.astype(np.float32))))
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0  # rounding differences only


def test_otsu_matches_cv2(gray_img):
    u8 = (gray_img * 255).astype(np.uint8)
    t_ref, _ = cv2.threshold(u8, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    t_ours = float(img_ops.otsu_threshold(jnp.asarray(gray_img))) * 255
    assert abs(t_ours - t_ref) <= 2.0
    binary = np.asarray(img_ops.otsu_binarize(jnp.asarray(gray_img)))
    ref_bin = (u8 > t_ref).astype(np.float32)
    assert (binary != ref_bin).mean() < 0.02


def test_adaptive_threshold_close_to_cv2(gray_img):
    u8 = (gray_img * 255).astype(np.uint8)
    ref = cv2.adaptiveThreshold(
        u8, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY, 11, 2
    ) / 255.0
    ours = np.asarray(
        img_ops.adaptive_threshold_gaussian(jnp.asarray(gray_img), 11, 2.0 / 255.0)
    )
    assert (ours != ref).mean() < 0.08  # border handling differs slightly


def test_gaussian_blur_close_to_cv2(gray_img):
    ref = cv2.GaussianBlur(gray_img, (3, 3), 0)
    ours = np.asarray(img_ops.gaussian_blur(jnp.asarray(gray_img), 3))
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(ours[interior], ref[interior], atol=5e-3)


def test_clahe_improves_contrast_and_tracks_cv2(gray_img):
    u8 = (gray_img * 255).astype(np.uint8)
    ref = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(u8) / 255.0
    ours = np.asarray(img_ops.clahe(jnp.asarray(gray_img), 3.0, (8, 8)))
    # CLAHE implementations differ at tile borders; demand strong correlation
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.95, f"CLAHE correlation {corr}"
    # output contrast must track cv2's output contrast
    assert abs(ours.std() - ref.std()) < 0.35 * ref.std()


def test_morphology_matches_cv2(gray_img):
    b = np.asarray(img_ops.otsu_binarize(jnp.asarray(gray_img)))
    opened = np.asarray(img_ops.morph_open(jnp.asarray(b), 2))
    closed = np.asarray(img_ops.morph_close(jnp.asarray(b), 2))
    k = np.ones((2, 2), np.uint8)
    u8 = (b * 255).astype(np.uint8)
    cv_open = cv2.morphologyEx(u8, cv2.MORPH_OPEN, k) / 255.0
    cv_close = cv2.morphologyEx(u8, cv2.MORPH_CLOSE, k) / 255.0
    np.testing.assert_array_equal(opened, cv_open)
    np.testing.assert_array_equal(closed, cv_close)


def test_sharpen_kernel(gray_img):
    ours = np.asarray(img_ops.sharpen(jnp.asarray(gray_img)))
    k = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]], np.float32)
    ref = cv2.filter2D(gray_img, -1, k)
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(
        ours[interior], np.clip(ref, 0, 1)[interior], atol=1e-4
    )


def test_enhance_chains_run(gray_img):
    std = np.asarray(img_ops.enhance_for_ocr_standard(jnp.asarray(gray_img)))
    assert std.shape == gray_img.shape
    card = np.asarray(img_ops.enhance_for_ocr_card(jnp.asarray(gray_img)))
    assert card.shape == (gray_img.shape[0] * 3, gray_img.shape[1] * 3)
    assert set(np.unique(card)).issubset({0.0, 1.0})


def test_estimate_skew_and_deskew():
    """Skewed synthetic text: the moment estimator recovers the angle and
    deskew() restores the line (reference pipe.py:249-261 chain)."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from manual_yolo_tpu.ops import image as img_ops

    # synthetic "text line": dark glyph blobs on light background
    base = np.full((64, 200), 0.9, np.float32)
    for x in range(10, 190, 14):
        base[26:38, x : x + 9] = 0.05
    deg = 8.0
    M = cv2.getRotationMatrix2D((100, 32), deg, 1.0)
    skewed = cv2.warpAffine(base, M, (200, 64), borderValue=0.9)

    est = float(jnp.rad2deg(img_ops.estimate_skew_angle(jnp.asarray(skewed))))
    assert abs(est - (-deg)) < 2.5, est  # image-coord y-down: +8deg cv2 == -8deg moments

    restored = np.asarray(img_ops.deskew(jnp.asarray(skewed)))
    # deskewed image must be much closer to the unskewed original
    interior = (slice(12, 52), slice(20, 180))
    err_before = np.abs(skewed[interior] - base[interior]).mean()
    err_after = np.abs(restored[interior] - base[interior]).mean()
    assert err_after < err_before * 0.5, (err_before, err_after)

    # unskewed input is (nearly) a no-op
    est0 = float(jnp.rad2deg(img_ops.estimate_skew_angle(jnp.asarray(base))))
    assert abs(est0) < 1.5


def test_deskew_light_on_dark_polarity():
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from manual_yolo_tpu.ops import image as img_ops

    base = np.full((48, 160), 0.08, np.float32)
    for x in range(8, 150, 12):
        base[20:30, x : x + 7] = 0.95  # light text on dark chrome
    M = cv2.getRotationMatrix2D((80, 24), -6.0, 1.0)
    skewed = cv2.warpAffine(base, M, (160, 48), borderValue=0.08)
    est = float(jnp.rad2deg(img_ops.estimate_skew_angle(jnp.asarray(skewed))))
    assert abs(est - 6.0) < 2.5, est


@pytest.mark.parametrize("out_hw", [(128, 192), (96, 96), (37, 51), (32, 48)])
def test_resize_cubic_matches_cv2(gray_img, out_hw):
    # cv2 float32 INTER_CUBIC is the oracle (reference detect.py:215-221
    # upscales 2x INTER_CUBIC before OCR pass 3; card chain detect.py:160-171)
    ref = cv2.resize(gray_img, (out_hw[1], out_hw[0]),
                     interpolation=cv2.INTER_CUBIC)
    ours = np.asarray(img_ops.resize_cubic(jnp.asarray(gray_img), out_hw))
    assert ours.shape == out_hw
    assert np.abs(ours - ref).max() < 1e-4


def test_resize_cubic_3ch_matches_cv2(gray_img):
    img = np.stack([gray_img, gray_img * 0.5, 1.0 - gray_img], axis=-1)
    ref = cv2.resize(img, (190, 130), interpolation=cv2.INTER_CUBIC)
    ours = np.asarray(img_ops.resize_cubic(jnp.asarray(img), (130, 190)))
    assert ours.shape == (130, 190, 3)
    assert np.abs(ours - ref).max() < 1e-4
