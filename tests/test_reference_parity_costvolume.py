"""Oracle parity for the ManyDepth-style plane-sweep cost volume against the
reference's own ``ResnetEncoderMatching.match_features``
(``/root/reference/monodepth/networks/models/backbone/resnet_matching.py:83-173``):
identical hand-made features on both sides (no weight conversion involved),
same depth hypotheses, compare the cost volume + missing-value mask bit-wise
semantics (backproject -> project -> zeros grid_sample -> edge masks ->
count-average -> missing-to-max fill)."""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "monodepth")),
    reason="reference checkout not present")

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_reference_parity import _install_stubs, _rel_l2  # noqa: E402

B, F, C = 2, 2, 16
HM, WM = 8, 12          # matching resolution (input // 4)
D = 8                   # depth bins
MIN_D, MAX_D = 2.0, 20.0


@pytest.fixture(scope="module")
def ref_encoder():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    mp.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    mp.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    from monodepth.networks.models.backbone.resnet_matching import (  # noqa
        ResnetEncoderMatching as RefEnc,
    )
    enc = RefEnc(depth=18, pretrained=False, input_height=HM * 4,
                 input_width=WM * 4, min_depth_bin=MIN_D, max_depth_bin=MAX_D,
                 num_depth_bins=D, depth_binning="linear")
    yield enc
    mp.undo()


def _case():
    rng = np.random.RandomState(5)
    cur = rng.rand(B, HM, WM, C).astype(np.float32)
    look = rng.rand(B, F, HM, WM, C).astype(np.float32)
    from scipy.spatial.transform import Rotation

    poses = np.zeros((B, F, 4, 4), np.float32)
    for b in range(B):
        for f in range(F):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = Rotation.from_euler(
                "xyz", rng.uniform(-1, 1, 3), degrees=True).as_matrix()
            T[:3, 3] = rng.uniform(-0.3, 0.3, 3)
            poses[b, f] = T
    poses[1, 1] = 0.0  # missing lookup frame: must be skipped
    P2 = np.zeros((B, 3, 4), np.float32)
    P2[:, 0, 0] = P2[:, 1, 1] = 10.0
    P2[:, 0, 2] = WM / 2
    P2[:, 1, 2] = HM / 2
    P2[:, 2, 2] = 1.0
    return cur, look, poses, P2


def test_cost_volume_matches_reference(ref_encoder):
    from fsnet_tpu.models.backbones.resnet_matching import (
        ResnetEncoderMatching)

    cur, look, poses, P2 = _case()

    # --- reference (NCHW) ---
    t = torch.from_numpy
    ref_cv, ref_mask = ref_encoder.match_features(
        t(np.moveaxis(cur, -1, 1)),
        t(np.moveaxis(look, -1, 2)),
        t(poses), t(P2))
    ref_cv = ref_cv.detach().numpy()          # [B, D, h, w]
    ref_mask = ref_mask.detach().numpy()

    # --- fsnet_tpu (NHWC) ---
    ours = ResnetEncoderMatching(
        depth=18, input_height=HM * 4, input_width=WM * 4,
        min_depth_bin=MIN_D, max_depth_bin=MAX_D, num_depth_bins=D,
        depth_binning="linear")
    bins = ours.compute_depth_bins(MIN_D, MAX_D)
    np.testing.assert_allclose(
        np.asarray(bins),
        ref_encoder.depth_bins.numpy(), rtol=1e-6)
    cv, mask = ours.match_features(jnp.asarray(cur), jnp.asarray(look),
                                   jnp.asarray(poses), jnp.asarray(P2), bins)
    cv = np.moveaxis(np.asarray(cv), -1, 1)    # -> [B, D, h, w]
    mask = np.moveaxis(np.asarray(mask), -1, 1)

    assert _rel_l2(cv, ref_cv) < 1e-5, _rel_l2(cv, ref_cv)
    np.testing.assert_array_equal(mask, ref_mask)
