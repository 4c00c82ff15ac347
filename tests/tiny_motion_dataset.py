"""Tiny uint8 image-pair dataset importable by BOTH builder DI kernels
(ours and the reference's) for the motion-mask precompute oracle test."""
import numpy as np


class TinyMotionDataset:
    def __init__(self, length=2, height=64, width=96, **kwargs):
        self.length = length
        self.h, self.w = height, width

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        # textured base + a shifted copy: Farneback sees coherent flow
        base = (rng.rand(self.h + 8, self.w + 8, 3) * 255).astype(np.uint8)
        base = np.asarray(base, np.uint8)
        img0 = base[4:4 + self.h, 4:4 + self.w]
        img1 = base[4:4 + self.h, 6:6 + self.w]  # 2 px horizontal shift
        P2 = np.zeros((3, 4), np.float32)
        P2[0, 0] = P2[1, 1] = 80.0
        P2[0, 2], P2[1, 2], P2[2, 2] = self.w / 2, self.h / 2, 1.0
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.5  # sideways translation -> epipolar geometry
        pose[2, 3] = 0.05
        # smooth synthetic flow field for the ARFlow variant (which consumes
        # a precomputed 'flow' + 'original_P2' instead of running Farneback)
        ys, xs = np.meshgrid(np.linspace(0, 1, self.h),
                             np.linspace(0, 1, self.w), indexing="ij")
        flow = np.stack([2.0 + np.sin(3 * xs) * 0.5,
                         0.3 * np.cos(2 * ys)], axis=-1).astype(np.float32)
        return {("image", 0): np.ascontiguousarray(img0),
                ("image", 1): np.ascontiguousarray(img1),
                "P2": P2, "original_P2": P2.copy(), "flow": flow,
                ("relative_pose", 1): pose}
