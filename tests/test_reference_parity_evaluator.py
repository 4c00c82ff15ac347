"""Oracle parity for the KITTI Eigen evaluation protocol: the reference's own
``KittiEigenEvaluator._single_loss`` (``/root/reference/monodepth/evaluation/
kitti_unsupervised_eval.py:43-80`` — Garg crop, [1e-3, 80] m clamp, median
scaling, 7-metric math) against fsnet_tpu's, on shared synthetic
prediction/GT pairs including the cv2 pred-resize to GT resolution."""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "monodepth")),
    reason="reference checkout not present")

from test_reference_parity import _install_stubs  # noqa: E402


@pytest.fixture(scope="module")
def ref_single_loss():
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from monodepth.evaluation.kitti_unsupervised_eval import (  # noqa
        KittiEigenEvaluator as RefEval,
    )
    # _single_loss never touches self — call it unbound
    return lambda d, g: RefEval._single_loss(None, d, g)


def test_single_loss_matches_reference(ref_single_loss):
    from fsnet_tpu.evaluation.kitti_unsupervised_eval import (
        KittiEigenEvaluator)

    ours_eval = object.__new__(KittiEigenEvaluator)
    rng = np.random.RandomState(9)
    for trial in range(3):
        gt = np.zeros((375, 1242), np.float32)
        # sparse LiDAR-like GT inside the valid band, plus invalid speckle
        n = 4000
        ys = rng.randint(0, 375, n)
        xs = rng.randint(0, 1242, n)
        gt[ys, xs] = rng.uniform(1.0, 85.0, n)  # some outside [1e-3, 80]
        pred = rng.uniform(0.5, 30.0, (192, 640)).astype(np.float32)

        ref = ref_single_loss(pred.copy(), gt.copy())
        ours = ours_eval._single_loss(pred.copy(), gt.copy())

        assert abs(ours["ratio"] - ref["ratio"]) < 1e-6
        np.testing.assert_allclose(np.asarray(ours["error"]),
                                   np.asarray(ref["error"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ours["abs_error"]),
                                   np.asarray(ref["abs_error"]), rtol=1e-6)
