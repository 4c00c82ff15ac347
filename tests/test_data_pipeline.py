"""Data pipeline tests: augmentations (incl. P-matrix rewriting), collate,
ConcatDataset routing, samplers, threaded loader."""
import numpy as np
import pytest

from fsnet_tpu.data import (
    ConcatDataset, Dataloader, TrainingSampler, collate_fn, find_shared_keys,
)
from fsnet_tpu.data.augmentations import (
    ConvertColor, ConvertToFloat, ConvertToTensor, CropTop, Normalize,
    PhotometricDistort, RandomMirror, RandomWarpAffine, Resize,
)
from fsnet_tpu.data.datasets.synthetic_dataset import SyntheticMonoDataset
from fsnet_tpu.data.pose_utils import flip_relative_pose
from fsnet_tpu.utils import Sequential


def _sample(h=64, w=96):
    rng = np.random.RandomState(0)
    P = np.zeros((3, 4), np.float32)
    P[0, 0] = P[1, 1] = 60.0
    P[0, 2], P[1, 2], P[2, 2] = w / 2, h / 2, 1.0
    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = 0.5
    return {
        ("image", 0): rng.randint(0, 255, (h, w, 3)).astype(np.uint8),
        ("original_image", 0): rng.randint(0, 255, (h, w, 3)).astype(np.uint8),
        ("relative_pose", 1): pose,
        "P2": P,
        "patched_mask": np.ones((h, w)),
    }


def test_resize_pads_and_rewrites_P():
    data = _sample(h=50, w=100)
    aug = Resize(size=(64, 96), preserve_aspect_ratio=True, force_pad=True,
                 image_keys=[("image", 0)], calib_keys=["P2"])
    fx_before = data["P2"][0, 0]
    out = aug(data)
    assert out[("image", 0)].shape[:2] == (64, 96)
    eff = out[("image_resize", "effective_size")]
    # scale = min(64/50, 96/100) = 0.96 -> h=48, w=96, pad_0
    assert list(eff) == [48, 96]
    assert abs(out["P2"][0, 0] - fx_before * 0.96) < 1e-4


def test_crop_top_shifts_cy():
    data = _sample()
    cy = data["P2"][1, 2]
    out = CropTop(crop_top_index=10, image_keys=[("image", 0)],
                  calib_keys=["P2"])(data)
    assert out[("image", 0)].shape[0] == 54
    assert out["P2"][1, 2] == cy - 10


def test_random_mirror_flips_pose_and_P():
    data = _sample()
    w = data[("image", 0)].shape[1]
    cx = data["P2"][0, 2]
    img_before = data[("image", 0)].copy()
    pose_before = data[("relative_pose", 1)].copy()
    out = RandomMirror(mirror_prob=1.1, image_keys=[("image", 0)],
                       calib_keys=["P2"],
                       pose_axis_pairs=[(("relative_pose", 1), 0)])(data)
    np.testing.assert_array_equal(out[("image", 0)], img_before[:, ::-1])
    assert out["P2"][0, 2] == w - cx - 1
    assert out[("relative_pose", 1)][0, 3] == -pose_before[0, 3]


def test_flip_relative_pose_involution():
    rng = np.random.RandomState(3)
    from scipy.spatial.transform import Rotation as R
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.from_euler("xyz", rng.uniform(-0.3, 0.3, 3)).as_matrix()
    pose[:3, 3] = rng.uniform(-1, 1, 3)
    flipped_twice = flip_relative_pose(flip_relative_pose(pose.copy(), 0), 0)
    np.testing.assert_allclose(flipped_twice, pose, atol=1e-5)


def test_normalize_tiles_multi_image_channels():
    data = _sample()
    data[("image", 0)] = np.concatenate(
        [data[("image", 0)]] * 2, axis=-1).astype(np.float32)  # 6 channels
    out = Normalize(mean=np.array([0.5, 0.5, 0.5]), stds=np.array([0.2, 0.2, 0.2]),
                    image_keys=[("image", 0)])(data)
    assert out[("image", 0)].shape[-1] == 6
    assert out[("image", 0)].dtype == np.float32


def test_photometric_distort_runs():
    data = _sample()
    data = ConvertToFloat(image_keys=[("image", 0)])(data)
    out = PhotometricDistort(distort_prob=1.0, image_keys=[("image", 0)])(data)
    assert out[("image", 0)].shape == (64, 96, 3)


def test_warp_affine_resizes_and_rewrites_P():
    data = _sample()
    data = ConvertToFloat(image_keys=[("image", 0)])(data)
    aug = RandomWarpAffine(output_w=80, output_h=48, shift_border=8,
                           image_keys=[("image", 0)], calib_keys=["P2"],
                           random_seed=0)
    out = aug(data)
    assert out[("image", 0)].shape[:2] == (48, 80)


def test_collate_shared_keys_and_lists():
    s1 = {("image", 0): np.zeros((4, 4, 3)), "P2": np.eye(3), "name": "a",
          "only_in_1": 1}
    s2 = {("image", 0): np.ones((4, 4, 3)), "P2": np.eye(3), "name": "b"}
    batch = collate_fn([s1, s2])
    assert set(batch.keys()) == {("image", 0), "P2", "name"}
    assert batch[("image", 0)].shape == (2, 4, 4, 3)
    assert batch["name"] == ["a", "b"]


def test_concat_dataset_routing():
    ds = ConcatDataset(cfg_list=[
        dict(name="fsnet_tpu.data.datasets.synthetic_dataset.SyntheticMonoDataset",
             length=5, height=32, width=48, seed=1),
        dict(name="fsnet_tpu.data.datasets.synthetic_dataset.SyntheticMonoDataset",
             length=3, height=32, width=48, seed=2),
    ], frame_idxs=[0, 1, -1])
    assert len(ds) == 8
    assert ds._determine_index(0) == (0, 0)
    assert ds._determine_index(4) == (0, 4)
    assert ds._determine_index(5) == (1, 0)
    assert ds._determine_index(7) == (1, 2)
    assert ("image", 0) in ds[6]


def test_training_sampler_sharding():
    s0 = TrainingSampler(10, shuffle=False, rank=0, world_size=2)
    s1 = TrainingSampler(10, shuffle=False, rank=1, world_size=2)
    import itertools
    i0 = list(itertools.islice(iter(s0), 5))
    i1 = list(itertools.islice(iter(s1), 5))
    assert i0 == [0, 2, 4, 6, 8]
    assert i1 == [1, 3, 5, 7, 9]
    # shuffled epochs must be permutations and differ across epochs
    s = TrainingSampler(8, shuffle=True, seed=7)
    seq = list(itertools.islice(iter(s), 16))
    assert sorted(seq[:8]) == list(range(8))
    assert sorted(seq[8:]) == list(range(8))
    assert seq[:8] != seq[8:]


@pytest.mark.parametrize("num_workers", [0, 3])
def test_dataloader_batches(num_workers):
    ds = SyntheticMonoDataset(length=10, height=32, width=48)
    loader = Dataloader(ds, batch_size=4,
                        sampler=TrainingSampler(len(ds), shuffle=True, seed=0),
                        num_workers=num_workers)
    it = iter(loader)
    for _ in range(3):
        batch = next(it)
        assert batch["image/0"].shape == (4, 32, 48, 3)
        assert batch["P2"].shape == (4, 3, 4)
        assert batch["relative_pose/1"].shape == (4, 4, 4)


def test_augmentation_pipeline_via_builder():
    """The flagship config's Sequential augmentation graph end-to-end."""
    aug_path = "fsnet_tpu.data.augmentations"
    image_keys = [("image", 0), ("original_image", 0)]
    pipeline = Sequential(
        cfg_list=[
            dict(name=f"{aug_path}.ConvertToFloat"),
            dict(name=f"{aug_path}.RandomWarpAffine", output_w=96, output_h=64,
                 shift_border=8),
            dict(name=f"{aug_path}.RandomMirror", mirror_prob=0.5,
                 pose_axis_pairs=[(("relative_pose", 1), 0)]),
            dict(name=f"{aug_path}.Normalize",
                 mean=np.array([0.485, 0.456, 0.406]),
                 stds=np.array([0.229, 0.224, 0.225]),
                 image_keys=[("image", 0)]),
            dict(name=f"{aug_path}.ConvertToTensor"),
        ],
        image_keys=image_keys,
        calib_keys=["P2"],
    )
    out = pipeline(_sample())
    assert out[("image", 0)].dtype == np.float32
    assert out[("image", 0)].shape == (64, 96, 3)
