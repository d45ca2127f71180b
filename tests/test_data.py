"""Data pipeline tests: transforms (golden cv2 semantics), dataset, loader."""

import os
import random

import cv2
import numpy as np
import pytest

from semseg_tpu.data import DataLoader, SemData, make_dataset, transform


@pytest.fixture
def pair(rng):
    image = (rng.rand(20, 30, 3) * 255).astype(np.float32)
    label = rng.randint(0, 5, size=(20, 30)).astype(np.uint8)
    return image, label


def test_to_array_shapes(pair):
    image, label = transform.ToTensor()(*pair)
    assert image.dtype == np.float32 and image.shape == (20, 30, 3)
    assert label.dtype == np.int64 and label.shape == (20, 30)


def test_to_array_rejects_bad_input(pair):
    with pytest.raises(TypeError):
        transform.ToTensor()([1, 2], pair[1])
    with pytest.raises(ValueError):
        transform.ToTensor()(pair[0], pair[1][None])


def test_normalize(pair):
    mean = [10.0, 20.0, 30.0]
    std = [2.0, 4.0, 8.0]
    image, _ = transform.Normalize(mean, std)(*pair)
    want = (pair[0] - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(image, want, rtol=1e-6)


def test_uint8_wire_device_normalize_is_exact(pair):
    """The uint8 wire format's decomposition — drop host Normalize, round
    integer-valued pixels to uint8, normalize on device in f32 — is
    bit-exact vs the host-normalized path whenever the augmented pixels
    are integers (both sides run the same IEEE f32 subtract/divide)."""
    import jax.numpy as jnp

    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    raw = np.rint(pair[0]).astype(np.float32)  # integer-valued pixels
    host_norm, _ = transform.Normalize(mean, std)(raw.copy(), pair[1])
    wire = np.clip(np.rint(raw), 0.0, 255.0).astype(np.uint8)
    dev_norm = (jnp.asarray(wire).astype(jnp.float32)
                - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
                    std, jnp.float32)
    np.testing.assert_array_equal(np.asarray(dev_norm), host_norm)


def test_uint8_wire_dataset_wrapper(pair):
    """Uint8Wire rounds worker-side with cv2 (half-to-even + saturate),
    identical to clip(rint(x), 0, 255) for this pipeline's pixels."""
    from semseg_tpu.data import Uint8Wire

    image = pair[0].copy()
    image[0, 0, 0] = 0.5    # tie rounds to even (0)
    image[0, 0, 1] = 1.5    # tie rounds to even (2)
    image[0, 1, 0] = 255.4  # saturates to 255 after rint

    class _DS:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return image, pair[1]

    img_u8, lab = Uint8Wire(_DS())[0]
    assert img_u8.dtype == np.uint8
    want = np.clip(np.rint(image), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(img_u8, want)
    np.testing.assert_array_equal(lab, pair[1])


def test_resize_semantics(pair):
    image, label = transform.Resize((10, 15))(*pair)
    assert image.shape == (10, 15, 3) and label.shape == (10, 15)
    want_img = cv2.resize(pair[0], (15, 10), interpolation=cv2.INTER_LINEAR)
    want_lab = cv2.resize(pair[1], (15, 10), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(image, want_img)
    np.testing.assert_array_equal(label, want_lab)
    # labels keep exact class ids (nearest)
    assert set(np.unique(label)) <= set(np.unique(pair[1]))


def test_rand_scale_range(pair):
    random.seed(3)
    image, label = transform.RandScale([0.5, 2.0])(*pair)
    assert 9 <= image.shape[0] <= 41
    assert image.shape[:2] == label.shape


def test_crop_pads_small_inputs(pair):
    mean = [1.0, 2.0, 3.0]
    image, label = transform.Crop(
        (32, 32), crop_type="center", padding=mean, ignore_label=255
    )(*pair)
    assert image.shape == (32, 32, 3) and label.shape == (32, 32)
    # padded border: image mean-filled, label ignore-filled
    assert np.allclose(image[0, 0], mean)
    assert label[0, 0] == 255
    # center region preserved
    np.testing.assert_array_equal(label[6:26, 1:31], pair[1])


def test_crop_rand_stays_inside(pair):
    random.seed(0)
    for _ in range(5):
        image, label = transform.Crop(
            (8, 8), crop_type="rand", padding=[0, 0, 0]
        )(*pair)
        assert image.shape == (8, 8, 3) and label.shape == (8, 8)


def test_crop_requires_padding_when_small(pair):
    with pytest.raises(RuntimeError):
        transform.Crop((64, 64), crop_type="center", padding=None)(*pair)


def test_rand_rotate_fills_ignore(pair):
    random.seed(1)
    t = transform.RandRotate([30, 40], padding=[0.0, 0.0, 0.0], ignore_label=255, p=1.0)
    image, label = t(*pair)
    assert image.shape == pair[0].shape
    assert (label == 255).any()  # corners rotated out -> ignore fill


def test_flips(pair):
    random.seed(0)
    image, label = transform.RandomHorizontalFlip(p=1.1)(*pair)
    np.testing.assert_array_equal(image, pair[0][:, ::-1])
    np.testing.assert_array_equal(label, pair[1][:, ::-1])
    image, label = transform.RandomVerticalFlip(p=1.1)(*pair)
    np.testing.assert_array_equal(image, pair[0][::-1])
    np.testing.assert_array_equal(label, pair[1][::-1])


def test_gaussian_blur_applies(pair):
    t = transform.RandomGaussianBlur(radius=5, p=1.1)
    image, label = t(*pair)
    want = cv2.GaussianBlur(pair[0], (5, 5), 0)
    np.testing.assert_array_equal(image, want)
    np.testing.assert_array_equal(label, pair[1])


def test_rgb_bgr_roundtrip(pair):
    image, _ = transform.RGB2BGR()(*pair)
    image, _ = transform.BGR2RGB()(image, pair[1])
    np.testing.assert_array_equal(image, pair[0])


def test_compose_chains(pair):
    t = transform.Compose([
        transform.Resize((16, 16)),
        transform.ToTensor(),
        transform.Normalize([0.0, 0.0, 0.0], [255.0, 255.0, 255.0]),
    ])
    image, label = t(*pair)
    assert image.shape == (16, 16, 3)
    assert image.max() <= 1.0


# ---------------------------------------------------------------------------
# dataset + loader
# ---------------------------------------------------------------------------
@pytest.fixture
def disk_dataset(tmp_path, rng):
    root = tmp_path / "root"
    root.mkdir()
    lines = []
    for i in range(10):
        img = (rng.rand(12, 14, 3) * 255).astype(np.uint8)
        lab = rng.randint(0, 3, size=(12, 14)).astype(np.uint8)
        cv2.imwrite(str(root / f"i{i}.png"), img)
        cv2.imwrite(str(root / f"l{i}.png"), lab)
        lines.append(f"i{i}.png l{i}.png\n")
    lst = tmp_path / "list.txt"
    lst.write_text("".join(lines))
    test_lst = tmp_path / "test_list.txt"
    test_lst.write_text("".join(f"i{i}.png\n" for i in range(10)))
    return str(root), str(lst), str(test_lst)


def test_make_dataset_parses_pairs(disk_dataset):
    root, lst, test_lst = disk_dataset
    items = make_dataset("train", root, lst)
    assert len(items) == 10
    assert items[0][0].endswith("i0.png") and items[0][1].endswith("l0.png")
    test_items = make_dataset("test", root, test_lst)
    assert test_items[0][0] == test_items[0][1]


def test_make_dataset_rejects_bad_lines(tmp_path, disk_dataset):
    root, lst, _ = disk_dataset
    bad = tmp_path / "bad.txt"
    bad.write_text("a.png b.png c.png\n")
    with pytest.raises(RuntimeError):
        make_dataset("train", root, str(bad))
    with pytest.raises(RuntimeError):
        make_dataset("train", root, str(tmp_path / "missing.txt"))


def test_semdata_reads_rgb(disk_dataset):
    root, lst, _ = disk_dataset
    ds = SemData("train", root, lst)
    image, label = ds[0]
    assert image.dtype == np.float32 and image.shape == (12, 14, 3)
    assert label.shape == (12, 14)


def test_loader_batches_and_shards(disk_dataset):
    root, lst, _ = disk_dataset
    ds = SemData("train", root, lst, transform=transform.ToTensor())
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        drop_last=True, seed=7)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    assert batches[0][0].shape == (4, 12, 14, 3)
    assert batches[0][1].shape == (4, 12, 14)

    # epoch shuffling changes order deterministically
    loader.set_epoch(0)
    a = loader.sampler.indices().tolist()
    loader.set_epoch(1)
    b = loader.sampler.indices().tolist()
    assert a != b
    loader.set_epoch(0)
    assert loader.sampler.indices().tolist() == a

    # two shards cover the dataset with equal per-shard counts
    s0 = DataLoader(ds, 2, shard_index=0, num_shards=2).sampler.indices()
    s1 = DataLoader(ds, 2, shard_index=1, num_shards=2).sampler.indices()
    assert len(s0) == len(s1) == 5
    assert set(s0.tolist()) | set(s1.tolist()) == set(range(10))


def test_augmentation_deterministic_across_worker_counts(disk_dataset):
    """Per-sample seeded RNG: identical batches for any worker count
    (the reference's augmentation order depends on thread scheduling)."""
    root, lst, _ = disk_dataset
    aug = transform.Compose([
        transform.RandScale([0.5, 2.0]),
        transform.RandRotate([-10, 10], padding=[0.0, 0.0, 0.0]),
        transform.RandomHorizontalFlip(),
        transform.Crop((10, 10), crop_type="rand", padding=[0.0, 0.0, 0.0]),
        transform.ToTensor(),
    ])
    ds = SemData("train", root, lst, transform=aug)

    def run(workers):
        loader = DataLoader(ds, batch_size=5, shuffle=True, seed=3,
                            num_workers=workers)
        loader.set_epoch(2)
        return [b for b in loader]

    a = run(0)
    b = run(4)
    for (ia, la), (ib, lb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)

    # different epochs give different augmentation
    loader = DataLoader(ds, batch_size=5, shuffle=False, seed=3, num_workers=0)
    loader.set_epoch(0)
    e0 = next(iter(loader))
    loader.set_epoch(1)
    e1 = next(iter(loader))
    assert not np.array_equal(e0[0], e1[0])


def test_loader_propagates_worker_errors(disk_dataset):
    root, lst, _ = disk_dataset

    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = DataLoader(Boom(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)
