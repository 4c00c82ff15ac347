"""Host input-pipeline throughput bench (SURVEY.md §7 hard-part 8).

Synthesizes a KITTI-shaped on-disk dataset (PNG triplets at the raw
1242x375-ish resolution), then measures imgs/s through the REAL pipeline
pieces so the host-side feed rate can be compared against the TPU step rate
(~200 imgs/s/chip needs ~600 raw-frame decodes+augments per second at 3
frames per sample, amortized across the host's worker threads):

  stage A: PNG decode only (cv2.imread)
  stage B: decode + full training augmentation chain (resize/crop/color/
           tensor-convert, the kitti_wpose recipe)
  stage C: stage B through the threaded prefetch loader (collate included)

Run on a production host this prints per-core numbers; this 1-core container
measures the per-core cost (scale linearly: workers release the GIL in cv2).

CPU-only — run with:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/data_pipeline_bench.py
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

N_SAMPLES = 24
H_RAW, W_RAW = 375, 1242
BATCH = 12


def make_dataset(root: str):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(N_SAMPLES):
        img = (rng.rand(H_RAW, W_RAW, 3) * 255).astype(np.uint8)
        p = os.path.join(root, f"{i:06d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


class SyntheticKittiDataset:
    """Disk-backed dataset emitting the mono_dataset dict protocol: 3 decoded
    frames + poses + calib, through the configured augmentation chain."""

    def __init__(self, paths, augmentation=None):
        from fsnet_tpu.utils.builder import build
        self.paths = paths
        self.aug = build(**augmentation) if augmentation else None

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        P2 = np.zeros((3, 4), np.float32)
        P2[0, 0] = P2[1, 1] = 721.5
        P2[0, 2], P2[1, 2], P2[2, 2] = W_RAW / 2, H_RAW / 2, 1.0
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.1
        data = {"P2": P2.copy(),
                ("relative_pose", 1): pose,
                ("relative_pose", -1): pose.copy()}
        for f in (0, 1, -1):
            p = self.paths[(idx + f) % len(self.paths)]
            img = cv2.imread(p, cv2.IMREAD_COLOR)[:, :, ::-1]
            data[("image", f)] = img.astype(np.float32)
        if self.aug is not None:
            data = self.aug(data)
        return data


def timed(tag, fn, n, imgs_per_call):
    fn(0)  # warm
    t0 = time.perf_counter()
    for i in range(n):
        fn(i)
    dt = time.perf_counter() - t0
    rate = n * imgs_per_call / dt
    print(f"{tag:44s} {dt / n * 1000:8.2f} ms/call  {rate:8.1f} imgs/s/core",
          flush=True)
    return rate


def main():
    root = tempfile.mkdtemp(prefix="dpb_")
    try:
        paths = make_dataset(root)

        timed("A: PNG decode 1242x375", lambda i: cv2.imread(
            paths[i % N_SAMPLES], cv2.IMREAD_COLOR), 40, 1)

        aug_cfg = dict(
            name="fsnet_tpu.utils.builder.Sequential",
            cfg_list=[
                dict(name="fsnet_tpu.data.augmentations.ConvertToFloat"),
                dict(name="fsnet_tpu.data.augmentations.Resize",
                     size=(192, 640), preserve_aspect_ratio=True),
                dict(name="fsnet_tpu.data.augmentations.RandomMirror",
                     mirror_prob=0.5),
                dict(name="fsnet_tpu.data.augmentations.PhotometricDistort",
                     distort_prob=1.0),
                dict(name="fsnet_tpu.data.augmentations.Normalize",
                     mean=[0.485, 0.456, 0.406], stds=[0.229, 0.224, 0.225]),
            ],
            image_keys=[("image", 0), ("image", 1), ("image", -1)],
            calib_keys=["P2"],
            pose_axis_pairs=[(("relative_pose", 1), 0),
                             (("relative_pose", -1), 0)],
        )
        ds = SyntheticKittiDataset(paths, augmentation=aug_cfg)
        timed("B: decode x3 + train augmentation chain",
              lambda i: ds[i % N_SAMPLES], 20, 3)

        from fsnet_tpu.data.dataloader import build_dataloader
        loader = build_dataloader(
            ds, num_workers=2, batch_size=BATCH, shuffle=True,
            device_put=False)
        it = iter(loader)
        try:
            timed(f"C: threaded loader bs{BATCH} (3 frames/sample)",
                  lambda i: next(it), 8, 3 * BATCH)
        finally:
            it.close()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
