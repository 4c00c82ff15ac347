"""Oracle parity for the motion-mask precompute hooks
(``/root/reference/monodepth/pipeline_hooks/precomputing_hooks/
base_precompute_hooks.py:27-148``): same tiny uint8 dataset through both
hooks (Farneback flow + fundamental-matrix epipolar distance, plus the
ARFlow flow-norm-normalized variant), compare the written mask PNGs
bit-for-bit."""
import os
import sys

import cv2
import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "monodepth")),
    reason="reference checkout not present")

import torch  # noqa: E402

from test_reference_parity import _install_stubs  # noqa: E402

FLOW_CFG = dict(pyr_scale=0.5, levels=2, winsize=9, iterations=2,
                poly_n=5, poly_sigma=1.1, flags=0)
DS_CFG = dict(name="tiny_motion_dataset.TinyMotionDataset", length=2,
              height=64, width=96)


@pytest.fixture()
def ref_hooks(monkeypatch):
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    import monodepth.pipeline_hooks.precomputing_hooks.base_precompute_hooks \
        as ref_mod
    return ref_mod


@pytest.mark.parametrize("variant", ["plain", "arflow"])
def test_motion_masks_match_reference(ref_hooks, tmp_path, variant):
    import fsnet_tpu.pipeline_hooks.precompute_hooks as ours_mod

    ref_cls = (ref_hooks.MotionMaskPrecomputeHook if variant == "plain"
               else ref_hooks.MotionMaskARFlowPrecomputeHook)
    our_cls = (ours_mod.MotionMaskPrecomputeHook if variant == "plain"
               else ours_mod.MotionMaskARFlowPrecomputeHook)
    thresh = 5.0 if variant == "plain" else 0.3

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    ref_cls(train_dataset_cfg=dict(DS_CFG), flow_estimator_cfg=dict(FLOW_CFG),
            distance_threshold=thresh, output_dir=str(ref_dir))()
    our_cls(train_dataset_cfg=dict(DS_CFG), flow_estimator_cfg=dict(FLOW_CFG),
            distance_threshold=thresh, output_dir=str(our_dir))()

    names = sorted(os.listdir(ref_dir))
    assert names and names == sorted(os.listdir(our_dir))
    for n in names:
        ref = cv2.imread(str(ref_dir / n), cv2.IMREAD_UNCHANGED)
        ours = cv2.imread(str(our_dir / n), cv2.IMREAD_UNCHANGED)
        assert ref is not None and ours is not None
        if variant == "plain":
            np.testing.assert_array_equal(ours, ref)
        else:
            # ours computes epipolar distances in f64, the reference in f32
            # torch: pixels exactly at the threshold can flip
            frac = np.mean(ours != ref)
            assert frac < 2e-3, frac
