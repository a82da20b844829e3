"""Data pipeline tests: augmentation semantics, determinism, loader."""

import numpy as np
import pytest

from fasterseg_tpu.core.config import cityscapes_search_config
import dataclasses

from fasterseg_tpu.data import (
    SyntheticDataset,
    TrainPre,
    TrainLoader,
    get_train_loader,
    normalize,
)
from fasterseg_tpu.data.preprocess import (
    random_crop_pad,
    random_scale,
    _resize,
)


def test_normalize_values():
    img = np.full((4, 4, 3), 255, np.uint8)
    out = normalize(img, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    np.testing.assert_allclose(out[0, 0], [(1 - 0.485) / 0.229,
                                           (1 - 0.456) / 0.224,
                                           (1 - 0.406) / 0.225], rtol=1e-6)


def test_resize_nearest_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 19, (64, 128)).astype(np.uint8)
    mine = _resize(gt, (16, 8), nearest=True)
    ref = cv2.resize(gt, (16, 8), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(mine, ref)


def test_train_pre_shapes_and_padding():
    pre = TrainPre(image_mean=(0.485, 0.456, 0.406),
                   image_std=(0.229, 0.224, 0.225),
                   crop_hw=(64, 128), gt_down_sampling=8)
    rng = np.random.default_rng(1)
    img = np.zeros((50, 60, 3), np.uint8)  # smaller than crop -> padding
    gt = np.full((50, 60), 3, np.uint8)
    im, g = pre(rng, img, gt)
    assert im.shape == (64, 128, 3) and im.dtype == np.float32
    assert g.shape == (8, 16) and g.dtype == np.int32
    # padded label area must be ignore (255)
    assert (g == 255).any() and (g == 3).any()


def test_train_pre_deterministic():
    pre = TrainPre(image_mean=(0.5,) * 3, image_std=(0.25,) * 3,
                   crop_hw=(32, 64))
    ds = SyntheticDataset(length=4, hw=(48, 80))
    s = ds[0]
    a = pre(np.random.default_rng((7, 1)), s["data"], s["label"])
    b = pre(np.random.default_rng((7, 1)), s["data"], s["label"])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_random_crop_pos_range():
    rng = np.random.default_rng(2)
    img = np.arange(10 * 12 * 3, dtype=np.uint8).reshape(10, 12, 3)
    gt = np.arange(120, dtype=np.uint8).reshape(10, 12)
    for _ in range(20):
        im, g = random_crop_pad(rng, img, gt, (6, 6))
        assert im.shape == (6, 6, 3) and g.shape == (6, 6)


def test_random_scale_set():
    rng = np.random.default_rng(3)
    img = np.zeros((40, 80, 3), np.uint8)
    gt = np.zeros((40, 80), np.uint8)
    seen = set()
    for _ in range(30):
        _, _, s = random_scale(rng, img, gt, (0.75, 1.0, 1.25))
        seen.add(s)
    assert seen == {0.75, 1.0, 1.25}


def test_train_pre_native_matches_numpy():
    from fasterseg_tpu.data import native
    if not native.available():
        pytest.skip("native lib unavailable")
    pre_n = TrainPre(image_mean=(0.485, 0.456, 0.406),
                     image_std=(0.229, 0.224, 0.225), crop_hw=(32, 64),
                     gt_down_sampling=8, use_native=True)
    pre_p = TrainPre(image_mean=(0.485, 0.456, 0.406),
                     image_std=(0.229, 0.224, 0.225), crop_hw=(32, 64),
                     gt_down_sampling=8, use_native=False)
    ds = SyntheticDataset(length=3, hw=(48, 80))
    for i in range(3):
        s = ds[i]
        a_img, a_gt = pre_n(np.random.default_rng((5, i)), s["data"],
                            s["label"])
        b_img, b_gt = pre_p(np.random.default_rng((5, i)), s["data"],
                            s["label"])
        # native resize is float-exact vs cv2 within 1 uint8 LSB
        np.testing.assert_allclose(a_img, b_img, atol=1.5 / 255 / 0.2)
        np.testing.assert_array_equal(a_gt, b_gt)


def test_loader_batches_and_portion_split():
    cfg = cityscapes_search_config()
    d = dataclasses.replace(cfg.data, synthetic=True, synthetic_length=16,
                            image_height=32, image_width=64, batch_size=2,
                            gt_down_sampling=8)
    cfg = dataclasses.replace(cfg, data=d)
    loader_a = get_train_loader(cfg, None, portion=0.5)
    loader_b = get_train_loader(cfg, None, portion=-0.5)
    assert len(loader_a.dataset) == 8 and len(loader_b.dataset) == 8
    it = iter(loader_a)
    imgs, labels = next(it)
    assert imgs.shape == (2, 32, 64, 3) and imgs.dtype == np.float32
    assert labels.shape == (2, 4, 8) and labels.dtype == np.int32
    loader_a.close()
    loader_b.close()


def test_shipped_cityscapes_file_lists():
    """Canonical Cityscapes index lists ship as package data
    (reference tools/datasets/cityscapes/ parity): train 2975 /
    val 500 / test 1525 / trainval 3475, resolvable by bare name."""
    from fasterseg_tpu.data.datasets import (DataSetting, FileListDataset,
                                             resolve_source)

    counts = {"cityscapes_train_fine.txt": 2975,
              "cityscapes_val_fine.txt": 500,
              "cityscapes_test.txt": 1525,
              "cityscapes_train_val_fine.txt": 3475}
    for name, n in counts.items():
        path = resolve_source(f"/nonexistent/root/{name}")
        assert path and path.endswith(name) and "/lists/" in path
        pairs = FileListDataset._parse(path)
        assert len(pairs) == n
        img, gt = pairs[0]
        assert img.startswith("leftImg8bit/") and img.endswith(".png")
        assert gt.startswith("gtFine/")

    setting = DataSetting(img_root="/data", gt_root="/data",
                          train_source="cityscapes_train_fine.txt",
                          eval_source="cityscapes_val_fine.txt")
    ds = FileListDataset(setting, split="val")
    assert len(ds) == 500
