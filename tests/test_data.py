"""Data layer: split semantics, few-shot determinism, transforms, sources."""

import numpy as np

from pevit_tpu.data.registry import ELEVATER_DATASETS, get_dataset_info
from pevit_tpu.data.sampling import class_balanced_val_split, sample_few_shot_subset
from pevit_tpu.data.sources import ArrayDataset, _synthetic, load_split
from pevit_tpu.data.transforms import resize_center_crop


def test_registry_has_20_datasets_with_reference_names():
    assert len(ELEVATER_DATASETS) == 20
    assert ELEVATER_DATASETS["voc-2007-classification"].multilabel
    assert ELEVATER_DATASETS["hateful-memes"].metric == "roc_auc"
    assert ELEVATER_DATASETS["fgvc-aircraft-2013b-variants102"].metric == "mean-per-class"
    assert ELEVATER_DATASETS["country211"].num_classes == 211


def test_val_split_takes_first_fifth_per_class():
    """Reference semantics (feature.py:137-149): first ceil(0.2*n_c) indices
    per class, in dataset order, go to val."""
    labels = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1])
    train_idx, val_idx = class_balanced_val_split(labels, 0.2)
    assert val_idx == [0, 5]
    assert train_idx == [1, 2, 3, 4, 6, 7, 8, 9]

    # ceil: 3 samples of a class -> 1 val
    labels = np.array([2, 2, 2])
    train_idx, val_idx = class_balanced_val_split(labels, 0.2)
    assert val_idx == [0] and train_idx == [1, 2]


def test_val_split_multilabel_greedy():
    labels = np.array(
        [[1, 0], [1, 0], [1, 0], [1, 0], [1, 1], [0, 1], [0, 1], [0, 1], [0, 1], [0, 1]],
        np.float32,
    )
    train_idx, val_idx = class_balanced_val_split(labels, 0.2)
    # class 0 target ceil(5*.2)=1, class 1 target ceil(6*.2)=2
    assert len(val_idx) >= 1
    assert set(val_idx).isdisjoint(train_idx)
    assert len(val_idx) + len(train_idx) == 10


def test_few_shot_is_deterministic_and_balanced():
    labels = np.repeat(np.arange(5), 20)
    idx1 = sample_few_shot_subset(labels, 3, random_seed=0)
    idx2 = sample_few_shot_subset(labels, 3, random_seed=0)
    idx3 = sample_few_shot_subset(labels, 3, random_seed=1)
    assert idx1 == idx2
    assert idx1 != idx3
    sub = labels[idx1]
    for c in range(5):
        assert (sub == c).sum() == 3
    # classes with fewer than n samples keep what they have
    small = np.array([0, 0, 1])
    idx = sample_few_shot_subset(small, 5, 0)
    assert sorted(idx) == [0, 1, 2]


def test_resize_center_crop_semantics():
    img = np.zeros((100, 50, 3), np.uint8)  # tall image
    img[:, :, 0] = 255
    out = resize_center_crop(img, 32)
    assert out.shape == (32, 32, 3)
    assert out[:, :, 0].min() > 200  # content preserved

    # non-square wide image
    out2 = resize_center_crop(np.full((40, 90, 3), 128, np.uint8), 24)
    assert out2.shape == (24, 24, 3)


def test_synthetic_source_and_npz_cache(tmp_path):
    ds = load_split("synthetic-foo", str(tmp_path / "none"), "train", image_size=32, num_classes=4)
    assert ds.images.dtype == np.uint8 and ds.images.shape[1:] == (32, 32, 3)
    assert len(ds) == 32 * 4
    # deterministic across calls
    ds2 = load_split("synthetic-foo", str(tmp_path / "none2"), "train", image_size=32, num_classes=4)
    np.testing.assert_array_equal(ds.images, ds2.images)


def test_imagefolder_source(tmp_path):
    from PIL import Image

    for split in ("train", "test"):
        for ci, cname in enumerate(["alpha", "beta"]):
            d = tmp_path / split / cname
            d.mkdir(parents=True)
            for i in range(3):
                arr = np.full((40, 40, 3), 30 + 90 * ci + i, np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    ds = load_split("foo", str(tmp_path), "train", image_size=32, num_classes=2, cache=False)
    assert len(ds) == 6
    assert sorted(np.unique(ds.labels)) == [0, 1]


def test_build_splits_with_config(tmp_path):
    from pevit_tpu.config import get_default_config
    from pevit_tpu.data.sources import build_splits

    cfg = get_default_config()
    cfg.DATASET.DATASET = "synthetic-bar"
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NUM_CLASSES = 4
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 5
    cfg.DATASET.RANDOM_SEED_SAMPLING = 0
    cfg.TRAIN.IMAGE_SIZE = [32, 32]
    train, val, test = build_splits(cfg)
    assert len(train) + len(val) == 4 * 5
    # val split is class balanced: 1 per class (ceil(5*0.2))
    assert len(val) == 4
    assert len(test) > 0


def test_real_dataset_name_fails_loudly_without_data(tmp_path):
    """A registered ELEVATER name with a bad ROOT must raise, not silently
    train on synthetic colours (the reference's Azure hub raises too —
    feature.py:556-560).  DATASET.ALLOW_SYNTHETIC opts the fallback back in
    (the smoke grid does)."""
    import pytest as _pytest

    from pevit_tpu.config import get_default_config
    from pevit_tpu.data.sources import build_splits

    cfg = get_default_config()
    cfg.DATASET.DATASET = "cifar-10"
    cfg.DATASET.ROOT = str(tmp_path / "definitely-not-here")
    cfg.DATASET.NUM_CLASSES = 10
    cfg.TRAIN.IMAGE_SIZE = [32, 32]
    with _pytest.raises(FileNotFoundError):
        build_splits(cfg)

    cfg.DATASET.ALLOW_SYNTHETIC = True
    train, val, test = build_splits(cfg)
    assert len(train) and len(test)


def _make_tree(tmp_path, splits, n_per_class=3, hw=(60, 40)):
    from PIL import Image

    for split in splits:
        for ci, cname in enumerate(["alpha", "beta"]):
            d = tmp_path / split / cname
            d.mkdir(parents=True)
            for i in range(n_per_class):
                arr = np.full((*hw, 3), 30 + 90 * ci + i, np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")


def test_center_crop_off_is_exact_resize(tmp_path):
    """DATASET.CENTER_CROP False = aspect-destroying (size, size) resize
    (feature.py:543-549); caches for the two modes never collide."""
    from PIL import Image

    from pevit_tpu.data.transforms import resize_exact

    _make_tree(tmp_path, ["train"], hw=(80, 40))  # tall 2:1 images
    a = load_split("foo", str(tmp_path), "train", image_size=32, num_classes=2)
    b = load_split("foo", str(tmp_path), "train", image_size=32, num_classes=2,
                   center_crop=False)
    assert a.images.shape == b.images.shape == (6, 32, 32, 3)
    # distinct cache artifacts
    assert (tmp_path / "train.npz").exists()
    assert (tmp_path / "train.nocrop.npz").exists()
    # exact-resize semantics match PIL directly
    src = np.full((80, 40, 3), 30, np.uint8)
    np.testing.assert_array_equal(
        resize_exact(Image.fromarray(src), 32),
        np.asarray(Image.fromarray(src).convert("RGB").resize((32, 32), Image.BICUBIC)),
    )


def test_split_dir_names_from_config(tmp_path):
    """DATASET.TRAIN_SET/VAL_SET/TEST_SET name the physical ImageFolder dirs
    (feature.py:601-607): an ImageNet-style tree (test images under val/)
    loads via the TEST_SET default; an explicit VAL_SET dir suppresses the
    0.2 carve-out and the whole train set trains."""
    from pevit_tpu.config import get_default_config
    from pevit_tpu.data.sources import build_splits

    _make_tree(tmp_path, ["training_images", "validation_images", "val"], n_per_class=5)
    cfg = get_default_config()
    cfg.DATASET.DATASET = "foo"
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NUM_CLASSES = 2
    cfg.DATASET.TRAIN_SET = "training_images"
    cfg.DATASET.VAL_SET = "validation_images"
    cfg.TRAIN.IMAGE_SIZE = [32, 32]
    train, val, test = build_splits(cfg)
    assert len(train) == 10      # whole train set — no 0.2 split
    assert len(val) == 10        # explicit val dir
    assert len(test) == 10       # TEST_SET default "val" resolves val/


def test_begin_epoch_consumed(tmp_path, caplog):
    """TRAIN.BEGIN_EPOCH shortens training to range(BEGIN, END) like every
    reference trainer loop (kadaptation_clip.py:291)."""
    import logging as _logging

    from pevit_tpu.config import get_default_config
    from pevit_tpu.core import CLIPSpec, init_clip_params
    from pevit_tpu.core.clip import TextSpec, VisionSpec
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.train import TaskStatic, TrainTask
    from pevit_tpu.train.sweep import run_method

    import jax

    spec = CLIPSpec(
        embed_dim=32,
        vision=VisionSpec(input_resolution=32, patch_size=16, width=64,
                          layers=2, heads=4, output_dim=32),
        text=TextSpec(context_length=8, vocab_size=64, width=32, heads=4,
                      layers=2, output_dim=32),
    )
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 2
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 4
    cfg.TRAIN.END_EPOCH = 3
    cfg.TRAIN.BEGIN_EPOCH = 2
    cfg.TRAIN.EXTRA_FINAL_TRAIN_EPOCH = 0
    cfg.TPU.COMPUTE_DTYPE = "float32"
    static = TaskStatic.from_config(cfg, spec, PeftConfig(method="lora"))
    task = TrainTask(cfg, static, init_clip_params(jax.random.PRNGKey(0), spec))
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    y = (np.arange(8) % 2).astype(np.int64)
    with caplog.at_level(_logging.INFO):
        run_method(task, (x, y, x, y, x, y), cfg, no_tuning=True,
                   lr=0.01, l2=1e-4, seed=0)
    # exactly ONE epoch ran (3 - 2), logged with its true index
    epochs = [r for r in caplog.records if "Val" in r.getMessage()]
    assert len(epochs) == 1 and "[Epoch 2]" in epochs[0].getMessage()
