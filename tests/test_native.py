"""Native C++ augmentation kernels: OpenCV-semantics parity tests."""

import numpy as np
import pytest

from fasterseg_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++)")


@pytest.fixture(scope="module")
def img(rng=None):
    return np.random.default_rng(0).integers(
        0, 256, (37, 53, 3), dtype=np.uint8)


def test_resize_bilinear_matches_cv2(img):
    cv2 = pytest.importorskip("cv2")
    got = native.resize_bilinear_u8(img, 64, 96)
    ref = cv2.resize(img, (96, 64), interpolation=cv2.INTER_LINEAR)
    # cv2 uses fixed-point arithmetic internally; allow 1 LSB
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_resize_nearest_matches_cv2(img):
    cv2 = pytest.importorskip("cv2")
    for dh, dw in [(18, 26), (74, 106)]:
        got = native.resize_nearest_u8(img, dh, dw)
        ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(got, ref)


def test_mirror(img):
    np.testing.assert_array_equal(native.mirror_u8(img), img[:, ::-1])


def test_crop_pad_normalize(img):
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    got = native.crop_pad_normalize(img, 5, 7, 16, 24, mean, std)
    ref = (img[5:21, 7:31].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # padding case
    got = native.crop_pad_normalize(img, 30, 40, 16, 24, mean, std)
    crop = img[30:, 40:]
    ph, pw = (16 - crop.shape[0]) // 2, (24 - crop.shape[1]) // 2
    assert np.all(got[:ph] == 0) and np.all(got[:, :pw] == 0)
    ref = (crop.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(
        got[ph:ph + crop.shape[0], pw:pw + crop.shape[1]], ref,
        rtol=1e-5, atol=1e-6)


def test_crop_pad_u8(img):
    gt = img[..., 0]
    got = native.crop_pad_u8(gt, 30, 45, 16, 24, pad=255)
    crop = gt[30:, 45:]
    ph, pw = (16 - crop.shape[0]) // 2, (24 - crop.shape[1]) // 2
    assert np.all(got[:ph] == 255)
    np.testing.assert_array_equal(
        got[ph:ph + crop.shape[0], pw:pw + crop.shape[1]], crop)
