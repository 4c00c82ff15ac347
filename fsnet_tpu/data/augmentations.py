"""Host-side data augmentation library (numpy/cv2).

Behavioral parity with the reference's 21 dict-transforms
(``vision_base/data/augmentations/augmentations.py``): every transform consumes
and returns the flat sample dict, is keyed by ``image_keys`` /
``gt_image_keys`` / ``calib_keys`` / ``lidar_keys``, and geometric ops rewrite
the camera matrix P in lockstep with the pixels.

TPU-first differences:
* ``ConvertToTensor`` keeps the HWC numpy layout (the framework is NHWC; the
  reference transposes to CHW torch tensors, ``augmentations.py:62-89``).
* Everything stays numpy on the host; device transfer happens at the loader's
  prefetch boundary.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import cv2
import numpy as np

from ..utils.builder import Sequential
from .pose_utils import flip_relative_pose


class EmptyAug:
    """No-op (reference ``augmentations.py:20-27``)."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, data):
        return data


class ExtractData:
    """Trim the sample dict to ``extract_keys`` (+ renames via ``mapped_keys``)
    (reference ``augmentations.py:30-48``)."""

    def __init__(self, extract_keys=(), mapped_keys=None, **kwargs):
        self.extract_keys = list(extract_keys)
        self.mapped_keys = dict(mapped_keys or {})

    def __call__(self, data):
        output = {key: data[key] for key in self.extract_keys}
        for key, new_key in self.mapped_keys.items():
            output[new_key] = data[key]
        return output


class ConvertToFloat:
    """Image dtype -> float32 (reference ``augmentations.py:50-59``)."""

    def __init__(self, image_keys=("image",), **kwargs):
        self.image_keys = list(image_keys)

    def __call__(self, data):
        for key in self.image_keys:
            data[key] = data[key].astype(np.float32)
        return data


class ConvertToTensor:
    """Finalize arrays for the device boundary. The reference transposes to
    CHW torch tensors (``augmentations.py:62-89``); here arrays stay HWC
    float32 contiguous numpy — the framework's native layout."""

    def __init__(self, image_keys=("image",), gt_image_keys=(), calib_keys=(),
                 lidar_keys=(), **kwargs):
        self.image_keys = list(image_keys)
        self.gt_image_keys = list(gt_image_keys)
        self.calib_keys = list(calib_keys)
        self.lidar_keys = list(lidar_keys)

    def __call__(self, data):
        for key in self.image_keys + self.gt_image_keys:
            data[key] = np.ascontiguousarray(data[key], dtype=np.float32)
        for key in self.calib_keys + self.lidar_keys:
            data[key] = np.ascontiguousarray(data[key], dtype=np.float32)
        return data


class Normalize:
    """x/255 then per-channel (x-mean)/std; mean/std tile across multi-image
    channel stacks (reference ``augmentations.py:91-108``)."""

    def __init__(self, mean, stds, image_keys=("image",), **kwargs):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.stds = np.asarray(stds, dtype=np.float32)
        self.image_keys = list(image_keys)

    def __call__(self, data):
        for key in self.image_keys:
            image = data[key].astype(np.float32) / 255.0
            reps = int(image.shape[2] / self.mean.shape[0])
            image = image - np.tile(self.mean, reps)
            image = image / np.tile(self.stds, reps)
            data[key] = image.astype(np.float32)
        return data


class Resize:
    """Resize with optional aspect preservation + pad/crop; rewrites P and
    records ``('image_resize', 'original_shape'/'effective_size')`` used by the
    evaluators' unpadding (reference ``augmentations.py:112-198``)."""

    def __init__(self, size, preserve_aspect_ratio=True, force_pad=True,
                 image_keys=("image",), calib_keys=(), gt_image_keys=(),
                 **kwargs):
        self.size = size
        self.preserve_aspect_ratio = preserve_aspect_ratio
        self.force_pad = force_pad
        self.image_keys = list(image_keys)
        self.calib_keys = list(calib_keys)
        self.gt_image_keys = list(gt_image_keys)

    def __call__(self, data):
        image = data[self.image_keys[0]]
        data[("image_resize", "original_shape")] = np.asarray(
            image.shape[:2], dtype=np.int64)

        if self.preserve_aspect_ratio:
            sf_x = self.size[0] / image.shape[0]
            sf_y = self.size[1] / image.shape[1]
            if self.force_pad:
                scale = min(sf_x, sf_y)
                mode = "pad_0" if sf_x > sf_y else "pad_1"
            else:
                scale = sf_x
                mode = "crop_1" if sf_x > sf_y else "pad_1"
            h = int(np.round(image.shape[0] * scale))
            w = int(np.round(image.shape[1] * scale))
            scale_yx = (scale, scale)
        else:
            scale_yx = (self.size[0] / image.shape[0],
                        self.size[1] / image.shape[1])
            mode = "none"
            h, w = self.size[0], self.size[1]

        data[("image_resize", "effective_size")] = np.asarray([h, w],
                                                              dtype=np.int64)

        for key in self.image_keys:
            data[key] = cv2.resize(data[key], (w, h))
        for key in self.gt_image_keys:
            data[key] = cv2.resize(data[key], (w, h),
                                   interpolation=cv2.INTER_NEAREST)

        if len(self.size) > 1:
            for key in self.image_keys + self.gt_image_keys:
                img = data[key]
                if mode == "crop_1":
                    data[key] = img[:, 0:self.size[1]]
                elif mode == "pad_1":
                    padW = self.size[1] - img.shape[1]
                    pads = [(0, 0), (0, padW)] + ([(0, 0)] if img.ndim == 3 else [])
                    data[key] = np.pad(img, pads, "constant")
                elif mode == "pad_0":
                    padH = self.size[0] - img.shape[0]
                    pads = [(0, padH), (0, 0)] + ([(0, 0)] if img.ndim == 3 else [])
                    data[key] = np.pad(img, pads, "constant")

        for key in self.calib_keys:
            P = data[key]
            P[0, :] = P[0, :] * scale_yx[1]
            P[1, :] = P[1, :] * scale_yx[0]
            data[key] = P
        return data


class CropTop:
    """Crop rows off the top; shifts cy (reference ``augmentations.py:228-266``)."""

    def __init__(self, crop_top_index=None, output_height=None,
                 image_keys=("image",), gt_image_keys=(), calib_keys=(),
                 **kwargs):
        if crop_top_index is None and output_height is None:
            crop_top_index = 0
        self.crop_top_index = crop_top_index
        self.output_height = output_height
        self.image_keys = list(image_keys)
        self.calib_keys = list(calib_keys)
        self.gt_image_keys = list(gt_image_keys)

    def __call__(self, data):
        height = data[self.image_keys[0]].shape[0]
        upper = (self.crop_top_index if self.crop_top_index is not None
                 else height - self.output_height)
        for key in self.image_keys + self.gt_image_keys:
            data[key] = data[key][upper:height]
        for key in self.calib_keys:
            P = data[key]
            P[1, 2] = P[1, 2] - upper
            P[1, 3] = P[1, 3] - upper * P[2, 3]
            data[key] = P
        return data


class CropRight:
    """Crop columns off the right (reference ``augmentations.py:268-301``; the
    reference forgets to store ``image_keys`` — fixed here)."""

    def __init__(self, crop_right_index=None, output_width=None,
                 image_keys=("image",), gt_image_keys=(), **kwargs):
        if crop_right_index is None and output_width is None:
            crop_right_index = 0
        self.crop_right_index = crop_right_index
        self.output_width = output_width
        self.image_keys = list(image_keys)
        self.gt_image_keys = list(gt_image_keys)

    def __call__(self, data):
        width = data[self.image_keys[0]].shape[1]
        if self.crop_right_index is not None:
            righter = width - self.crop_right_index
        else:
            righter = self.output_width
        if righter > width:
            return data
        for key in self.image_keys + self.gt_image_keys:
            data[key] = data[key][:, 0:righter]
        return data


class Pad2Shape:
    """Zero-pad bottom/right to a target shape (ref ``augmentations.py:304-325``)."""

    def __init__(self, target_shape, image_keys=("image",), gt_image_keys=(),
                 **kwargs):
        self.target_shape = target_shape
        self.image_keys = list(image_keys)
        self.gt_image_keys = list(gt_image_keys)

    def __call__(self, data):
        height, width = data[self.image_keys[0]].shape[:2]
        padH = self.target_shape[0] - height
        padW = self.target_shape[1] - width
        for key in self.image_keys + self.gt_image_keys:
            img = data[key]
            pads = [(0, padH), (0, padW)] + ([(0, 0)] if img.ndim == 3 else [])
            data[key] = np.pad(img, pads, "constant")
        return data


class FilterObject:
    """Drop objects fully outside the image (reference ``augmentations.py:327-341``)."""

    def __init__(self, image_keys=("image",), objects_keys=(), **kwargs):
        self.image_keys = list(image_keys)
        self.object_keys = list(objects_keys)

    def __call__(self, data):
        height, width = data[self.image_keys[0]].shape[:2]
        for key in self.object_keys:
            data[key].filter(height, width)
        return data


class RandomCropToWidth:
    """Random horizontal crop to a fixed width; shifts cx
    (reference ``augmentations.py:343-375``)."""

    def __init__(self, width: int, image_keys=("image",), gt_image_keys=(),
                 calib_keys=(), **kwargs):
        self.width = width
        self.image_keys = list(image_keys)
        self.calib_keys = list(calib_keys)
        self.gt_image_keys = list(gt_image_keys)

    def __call__(self, data):
        original_width = data[self.image_keys[0]].shape[1]
        if self.width > original_width:
            return data
        lefter = np.random.randint(0, original_width - self.width)
        righter = lefter + self.width
        for key in self.image_keys + self.gt_image_keys:
            data[key] = data[key][:, lefter:righter]
        for key in self.calib_keys:
            P = data[key]
            P[0, 2] = P[0, 2] - lefter
            P[0, 3] = P[0, 3] - lefter * P[2, 3]
            data[key] = P
        return data


class RandomMirror:
    """Horizontal flip: images, calib (cx), lidar x, relative poses (euler
    negation about the mirror axis), optional stereo left/right swap
    (reference ``augmentations.py:377-434``)."""

    def __init__(self, mirror_prob, image_keys=("image",), calib_keys=(),
                 gt_image_keys=(), object_keys=(), lidar_keys=(),
                 pose_axis_pairs=(), is_switch_left_right=True,
                 stereo_image_key_pairs=(), stereo_calib_key_pairs=(),
                 **kwargs):
        self.mirror_prob = mirror_prob
        self.image_keys = list(image_keys)
        self.calib_keys = list(calib_keys)
        self.gt_image_keys = list(gt_image_keys)
        self.object_keys = list(object_keys)
        self.lidar_keys = list(lidar_keys)
        self.pose_axis_pairs = list(pose_axis_pairs)
        self.is_switch_lr = is_switch_left_right
        self.stereo_image_key_pairs = list(stereo_image_key_pairs)
        self.stereo_calib_key_pairs = list(stereo_calib_key_pairs)

    def __call__(self, data):
        width = data[self.image_keys[0]].shape[1]
        if np.random.rand() <= self.mirror_prob:
            for key in self.image_keys + self.gt_image_keys:
                data[key] = np.ascontiguousarray(data[key][:, ::-1])
            for key in self.calib_keys:
                P = data[key]
                P[0, 3] = -P[0, 3]
                P[0, 2] = width - P[0, 2] - 1
                data[key] = P
            for key in self.object_keys:
                data[key].flip_objects()
            for key in self.lidar_keys:
                data[key] = -data[key][..., 0]
            for key, axis_num in self.pose_axis_pairs:
                data[key] = flip_relative_pose(data[key], axis_num)
            if self.is_switch_lr:
                for key_l, key_r in (self.stereo_image_key_pairs
                                     + self.stereo_calib_key_pairs):
                    data[key_l], data[key_r] = data[key_r], data[key_l]
        return data


class RandomWarpAffine:
    """Random scale+shift crop resized to a fixed output, with P rewrite
    (reference ``augmentations.py:436-498``)."""

    def __init__(self, scale_lower=0.6, scale_upper=1.4, shift_border=128,
                 output_w=1280, output_h=384, image_keys=("image",),
                 gt_image_keys=(), calib_keys=(),
                 border_mode=cv2.BORDER_CONSTANT, random_seed=None, **kwargs):
        self.scale_lower = scale_lower
        self.scale_upper = scale_upper
        self.shift_border = shift_border
        self.output_w = output_w
        self.output_h = output_h
        self.image_keys = list(image_keys)
        self.gt_image_keys = list(gt_image_keys)
        self.calib_keys = list(calib_keys)
        self.border_mode = border_mode
        self.rng = np.random.default_rng(
            random_seed if random_seed is not None
            else np.random.randint(0, 2 ** 32))

    def __call__(self, data):
        height, width = data[self.image_keys[0]].shape[:2]
        s_original = max(height, width)
        scale = s_original * self.rng.uniform(self.scale_lower, self.scale_upper)
        center_w = self.rng.integers(self.shift_border, width - self.shift_border)
        center_h = self.rng.integers(self.shift_border, height - self.shift_border)

        final_scale = max(self.output_w, self.output_h) / scale
        final_shift_w = self.output_w / 2 - center_w * final_scale
        final_shift_h = self.output_h / 2 - center_h * final_scale
        M = np.array([[final_scale, 0, final_shift_w],
                      [0, final_scale, final_shift_h]], dtype=np.float32)

        for key in self.image_keys:
            data[key] = cv2.warpAffine(
                data[key], M, (self.output_w, self.output_h),
                flags=cv2.INTER_LINEAR, borderMode=self.border_mode)
        for key in self.gt_image_keys:
            data[key] = cv2.warpAffine(
                data[key], M, (self.output_w, self.output_h),
                flags=cv2.INTER_NEAREST, borderMode=self.border_mode)
        for key in self.calib_keys:
            P = data[key]
            P[0:2, :] *= final_scale
            P[0, 2] = P[0, 2] + final_shift_w
            P[0, 3] = P[0, 3] + final_shift_w * P[2, 3]
            P[1, 2] = P[1, 2] + final_shift_h
            P[1, 3] = P[1, 3] + final_shift_h * P[2, 3]
            data[key] = P
        return data


class RandomSaturation:
    """Scale the S channel of an HSV image (reference ``augmentations.py:200-226``)."""

    def __init__(self, distort_prob, lower=0.5, upper=1.5,
                 image_keys=("image",), random_seed=None, **kwargs):
        assert upper >= lower >= 0
        self.distort_prob = distort_prob
        self.lower = lower
        self.upper = upper
        self.image_keys = list(image_keys)
        self.rng = np.random.default_rng(
            random_seed if random_seed is not None
            else np.random.randint(0, 2 ** 32))

    def __call__(self, data):
        if self.rng.random() <= self.distort_prob:
            ratio = self.rng.uniform(self.lower, self.upper)
            for key in self.image_keys:
                data[key][:, :, 1] *= ratio
        return data


class RandomHue:
    """Rotate the H channel of an HSV image (reference ``augmentations.py:500-524``)."""

    def __init__(self, distort_prob, delta=18.0, image_keys=("image",),
                 random_seed=None, **kwargs):
        assert 0.0 <= delta <= 360.0
        self.delta = delta
        self.distort_prob = distort_prob
        self.image_keys = list(image_keys)
        self.rng = np.random.default_rng(
            random_seed if random_seed is not None
            else np.random.randint(0, 2 ** 32))

    def __call__(self, data):
        if self.rng.random() <= self.distort_prob:
            shift = self.rng.uniform(-self.delta, self.delta)
            for key in self.image_keys:
                image = data[key]
                image[:, :, 0] += shift
                image[:, :, 0][image[:, :, 0] > 360.0] -= 360.0
                image[:, :, 0][image[:, :, 0] < 0.0] += 360.0
                data[key] = image
        return data


class ConvertColor:
    """RGB<->HSV via cv2 (reference ``augmentations.py:527-543``)."""

    def __init__(self, current="RGB", transform="HSV", image_keys=("image",),
                 **kwargs):
        self.convertor = getattr(cv2, f"COLOR_{current}2{transform}")
        self.image_keys = list(image_keys)

    def __call__(self, data):
        for key in self.image_keys:
            data[key] = cv2.cvtColor(data[key], self.convertor)
        return data


class RandomContrast:
    """Scale pixel values (reference ``augmentations.py:545-570``)."""

    def __init__(self, distort_prob, lower=0.5, upper=1.5,
                 image_keys=("image",), random_seed=None, **kwargs):
        assert upper >= lower >= 0
        self.distort_prob = distort_prob
        self.lower = lower
        self.upper = upper
        self.image_keys = list(image_keys)
        self.rng = np.random.default_rng(
            random_seed if random_seed is not None
            else np.random.randint(0, 2 ** 32))

    def __call__(self, data):
        if self.rng.random() <= self.distort_prob:
            alpha = self.rng.uniform(self.lower, self.upper)
            for key in self.image_keys:
                data[key] = data[key] * alpha
        return data


class RandomBrightness:
    """Add a uniform offset (reference ``augmentations.py:572-592``)."""

    def __init__(self, distort_prob, delta=32, image_keys=("image",),
                 random_seed=None, **kwargs):
        assert 0.0 <= delta <= 255.0
        self.delta = delta
        self.distort_prob = distort_prob
        self.image_keys = list(image_keys)
        self.rng = np.random.default_rng(
            random_seed if random_seed is not None
            else np.random.randint(0, 2 ** 32))

    def __call__(self, data):
        if self.rng.random() <= self.distort_prob:
            delta = self.rng.uniform(-self.delta, self.delta)
            for key in self.image_keys:
                data[key] = data[key] + delta
        return data


class RandomEigenvalueNoise:
    """ImageNet PCA color noise (reference ``augmentations.py:594-626``)."""

    def __init__(self, distort_prob=1.0, alphastd=0.1,
                 eigen_value=np.array([0.2141788, 0.01817699, 0.00341571],
                                      dtype=np.float32),
                 eigen_vector=np.array([
                     [-0.58752847, -0.69563484, 0.41340352],
                     [-0.5832747, 0.00994535, -0.81221408],
                     [-0.56089297, 0.71832671, 0.41158938]], dtype=np.float32),
                 image_keys=("image",), random_seed=None, **kwargs):
        self.distort_prob = distort_prob
        self._eig_val = eigen_value
        self._eig_vec = eigen_vector
        self.alphastd = alphastd
        self.image_keys = list(image_keys)
        self.rng = np.random.default_rng(
            random_seed if random_seed is not None
            else np.random.randint(0, 2 ** 32))

    def __call__(self, data):
        if self.rng.random() <= self.distort_prob:
            alpha = self.rng.normal(scale=self.alphastd, size=(3,))
            noise = np.dot(self._eig_vec, self._eig_val * alpha) * 255
            for key in self.image_keys:
                data[key] = data[key] + noise
        return data


class PhotometricDistort:
    """SSD-style photometric distortion bundle: brightness + contrast (before
    OR after) + HSV saturation/hue (reference ``augmentations.py:628-666``)."""

    def __init__(self, distort_prob=1.0, contrast_lower=0.5, contrast_upper=1.5,
                 saturation_lower=0.5, saturation_upper=1.5, hue_delta=18.0,
                 brightness_delta=32, image_keys=("image",), **kwargs):
        self.transforms = [
            RandomContrast(distort_prob, contrast_lower, contrast_upper,
                           image_keys=image_keys),
            ConvertColor(transform="HSV", image_keys=image_keys),
            RandomSaturation(distort_prob, saturation_lower, saturation_upper,
                             image_keys=image_keys),
            RandomHue(distort_prob, hue_delta, image_keys=image_keys),
            ConvertColor(current="HSV", transform="RGB", image_keys=image_keys),
            RandomContrast(distort_prob, contrast_lower, contrast_upper,
                           image_keys=image_keys),
        ]
        self.rand_brightness = RandomBrightness(distort_prob, brightness_delta,
                                                image_keys=image_keys)

    def __call__(self, data):
        distortion = (self.transforms[:-1] if np.random.rand() <= 0.5
                      else self.transforms[1:])
        data = self.rand_brightness(data)
        for t in distortion:
            data = t(data)
        return data


class Copy:
    """Duplicate keys (reference ``augmentations.py:668-680``)."""

    def __init__(self, from_keys, to_keys, **kwargs):
        self.from_keys = list(from_keys)
        self.to_keys = list(to_keys)

    def __call__(self, data):
        for from_key, to_key in zip(self.from_keys, self.to_keys):
            data[to_key] = data[from_key].copy()
        return data
