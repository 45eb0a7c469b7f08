"""Kernel unit tests following the reference's own fixture recipes
(FIXTURES.md §3: known-skew, noise ladder, contrast ladder)."""

import numpy as np
import pytest

from medical_and_charity_document_extraction_system_ray.kernels import (
    binarizer,
    denoiser,
    deskewer,
    enhancer,
    ops,
)


def _stripe_page(h=400, w=600):
    """White page with black horizontal text-like stripes."""
    img = np.full((h, w), 255, dtype=np.uint8)
    for y in range(60, h - 60, 28):
        img[y : y + 10, 40 : w - 40] = 0
    return img


# --- deskew -----------------------------------------------------------------


@pytest.mark.parametrize("angle", [4.0, -6.0, 8.0])
def test_known_skew_detected_and_restored(angle):
    img = _stripe_page()
    skewed = ops.rotate_expand(img, angle, border_value=255)
    # rotating by the detected angle undoes the skew: detected ≈ -angle
    # (Hough theta grid is 1°, so allow quantization slack)
    detected = deskewer.detect_skew_hough(skewed)
    assert abs(detected - (-angle)) <= 1.5
    assert abs(deskewer.detect_skew_projection(skewed) - (-angle)) <= 0.75
    restored, got = deskewer.deskew(skewed, method="hough")
    assert got == detected
    # residual skew after correction, measured by the precise sweep
    assert abs(deskewer.detect_skew_projection(restored)) <= 1.0


def test_rotate_noop_below_threshold():
    img = _stripe_page()
    assert deskewer.rotate_image(img, 0.05) is img


def test_check_if_skewed():
    img = _stripe_page()
    assert not deskewer.check_if_skewed(img)
    assert deskewer.check_if_skewed(ops.rotate_expand(img, 6.0))


# --- denoise ----------------------------------------------------------------


def test_auto_denoise_branches():
    rng = np.random.default_rng(7)
    flat = np.full((120, 120), 128, dtype=np.uint8)
    assert denoiser.estimate_noise(flat) <= 8  # low -> gaussian branch
    noisy = np.clip(
        flat.astype(float) + rng.normal(0, 12, flat.shape), 0, 255
    ).astype(np.uint8)
    assert denoiser.estimate_noise(noisy) > 15  # high -> bilateral branch
    # all dispatch methods run and preserve shape/dtype
    for m in ("auto", "gaussian", "median", "bilateral", "morphology"):
        out = denoiser.denoise(noisy, method=m)
        assert out.shape == noisy.shape and out.dtype == np.uint8


def test_denoise_reduces_noise():
    rng = np.random.default_rng(3)
    clean = np.full((100, 100), 200, dtype=np.uint8)
    noisy = np.clip(clean + rng.normal(0, 15, clean.shape), 0, 255).astype(np.uint8)
    out = denoiser.denoise(noisy, method="gaussian")
    assert out.std() < noisy.std()


# --- enhance ----------------------------------------------------------------


def test_auto_enhance_contrast_ladder():
    rng = np.random.default_rng(5)
    # dark image -> gamma 1.5 brightens
    dark = np.clip(rng.normal(60, 45, (80, 80)), 0, 255).astype(np.uint8)
    assert enhancer.enhance(dark).mean() > dark.mean()
    # bright image -> gamma 0.7 darkens
    bright = np.clip(rng.normal(220, 45, (80, 80)), 0, 255).astype(np.uint8)
    assert enhancer.enhance(bright).mean() < bright.mean()
    # low contrast -> CLAHE raises std
    lowc = np.clip(rng.normal(128, 10, (80, 80)), 0, 255).astype(np.uint8)
    assert enhancer.enhance(lowc).std() > lowc.std()


def test_histogram_equalization_spreads():
    rng = np.random.default_rng(1)
    img = np.clip(rng.normal(128, 20, (64, 64)), 0, 255).astype(np.uint8)
    eq = enhancer.histogram_equalization(img)
    assert eq.std() > img.std()


def test_gamma_lut_monotone():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = enhancer.gamma_correction(img, gamma=1.5)
    assert out[0, 0] == 0 and out[-1, -1] == 255
    flat = out.reshape(-1).astype(int)
    assert (np.diff(flat) >= 0).all()


def test_brightness_contrast():
    img = np.full((10, 10), 100, dtype=np.uint8)
    assert enhancer.adjust_brightness_contrast(img, brightness=50).mean() == 150


# --- binarize ---------------------------------------------------------------


def test_binarize_outputs_binary():
    img = _stripe_page()
    for m in ("auto", "otsu", "adaptive", "sauvola", "niblack", "triangle"):
        out = binarizer.binarize(img, method=m)
        assert set(np.unique(out)).issubset({0, 255}), m


def test_auto_binarize_branch_selection():
    rng = np.random.default_rng(2)
    high = _stripe_page()  # std > 50 -> otsu
    assert float(high.std()) > 50
    low = np.clip(rng.normal(128, 10, (80, 80)), 0, 255).astype(np.uint8)
    assert float(low.std()) < 30  # -> adaptive
    out = binarizer.binarize(low)
    assert set(np.unique(out)).issubset({0, 255})


def test_otsu_separates_bimodal():
    img = np.zeros((100, 100), dtype=np.uint8)
    img[:50] = 40
    img[50:] = 210
    t = binarizer.otsu_threshold(img)
    assert 40 <= t < 210
    out = binarizer.otsu_binarize(img)
    assert out[:50].max() == 0 and out[50:].min() == 255


def test_clean_binary_removes_small_objects():
    img = np.zeros((100, 100), dtype=np.uint8)
    img[10:40, 10:40] = 255          # big object: 900 px
    img[80:82, 80:82] = 255          # speckle: 4 px
    out = binarizer.clean_binary_image(img, remove_small_objects=20)
    assert out[20, 20] == 255 and out[80, 80] == 0


def test_multi_scale_binarize():
    img = _stripe_page()
    out = binarizer.multi_scale_binarize(img)
    assert set(np.unique(out)).issubset({0, 255})


# --- ops --------------------------------------------------------------------


def test_label_components_connectivity():
    mask = np.zeros((5, 5), dtype=bool)
    mask[0, 0] = True
    mask[1, 1] = True  # diagonal touch
    _, n4 = ops.label_components(mask, connectivity=4)
    _, n8 = ops.label_components(mask, connectivity=8)
    assert n4 == 2 and n8 == 1


def test_box_mean_matches_naive():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (20, 20)).astype(np.uint8)
    got = ops.box_mean(img, 3)
    # interior pixel check against naive windows
    for y, x in [(5, 5), (10, 3), (18, 18)]:
        win = np.pad(img.astype(float), 1, mode="edge")[y : y + 3, x : x + 3]
        assert abs(got[y, x] - win.mean()) < 1e-9


# --- remaining dispatch-path coverage ---------------------------------------


def test_denoise_nlm_and_adaptive_paths():
    rng = np.random.default_rng(9)
    img = np.clip(rng.normal(170, 20, (48, 48)), 0, 255).astype(np.uint8)
    out_nlm = denoiser.nlm_denoise(img, search_size=7)
    assert out_nlm.shape == img.shape and out_nlm.std() <= img.std()
    out_ad = denoiser.adaptive_denoise(img, block_size=24)
    assert out_ad.shape == img.shape
    out_sp = denoiser.remove_salt_pepper(img)
    assert out_sp.shape == img.shape


def test_enhance_for_text_returns_gray():
    img = _stripe_page(120, 160)
    out = enhancer.enhance_for_text(img)
    assert out.ndim == 2 and out.dtype == np.uint8


def test_contour_deskew_detects_rotated_block():
    img = np.full((200, 300), 255, dtype=np.uint8)
    img[60:140, 60:240] = 0  # solid block
    rot = ops.rotate_expand(img, 7.0, 255)
    ang = deskewer.detect_skew_contour(rot)
    # min-area-rect angle of the rotated block, normalized to ±45
    assert abs(abs(ang) - 7.0) < 2.0


def test_projection_deskew_direct_method():
    img = _stripe_page()
    sk = ops.rotate_expand(img, -5.0, 255)
    restored, ang = deskewer.deskew(sk, method="projection")
    assert abs(ang - 5.0) <= 0.75
    assert abs(deskewer.detect_skew_projection(restored)) <= 1.0


def test_unknown_method_strings_fall_back_to_auto():
    img = _stripe_page(100, 120)
    assert (enhancer.enhance(img, method="nope") == enhancer.enhance(img, method="auto")).all()
    assert (denoiser.denoise(img, method="nope") == denoiser.denoise(img, method="auto")).all()
    assert (binarizer.binarize(img, method="nope") == binarizer.binarize(img, method="auto")).all()
    a, ang_a = deskewer.deskew(img, method="nope")
    b, ang_b = deskewer.deskew(img, method="auto")
    assert ang_a == ang_b and (a == b).all()
