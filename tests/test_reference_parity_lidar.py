"""Oracle parity for the KITTI velodyne->image GT projection
(``/root/reference/monodepth/networks/utils/monodepth_utils.py:368-420``):
synthesize a calib dir + velodyne .bin, run both ``generate_depth_map``
implementations, compare the sparse depth images exactly (incl. the
round-minus-one pixel snap and duplicate-point min-depth resolution)."""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "monodepth")),
    reason="reference checkout not present")

from test_reference_parity import _install_stubs  # noqa: E402

H_IM, W_IM = 120, 400


def _write_calib(d):
    r = np.eye(3).ravel()
    p = np.array([[50.0, 0, W_IM / 2, 0.1],
                  [0, 50.0, H_IM / 2, 0.0],
                  [0, 0, 1.0, 0.003]])
    with open(os.path.join(d, "calib_cam_to_cam.txt"), "w") as f:
        f.write("S_rect_02: {} {}\n".format(float(W_IM), float(H_IM)))
        f.write("R_rect_00: " + " ".join(map(str, r)) + "\n")
        f.write("P_rect_02: " + " ".join(map(str, p.ravel())) + "\n")
    with open(os.path.join(d, "calib_velo_to_cam.txt"), "w") as f:
        # velodyne (fwd,left,up) -> camera (right,down,fwd)
        R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
        f.write("R: " + " ".join(map(str, R.ravel())) + "\n")
        f.write("T: -0.05 0.3 0.1\n")


def _write_velo(path, rng, n=5000):
    velo = np.empty((n, 4), np.float32)
    velo[:, 0] = rng.uniform(-5.0, 60.0, n)     # forward (some behind plane)
    velo[:, 1] = rng.uniform(-25.0, 25.0, n)    # left
    velo[:, 2] = rng.uniform(-2.0, 3.0, n)      # up
    velo[:, 3] = rng.rand(n)
    velo.tofile(path)


@pytest.mark.parametrize("vel_depth", [True, False])
def test_generate_depth_map_matches_reference(tmp_path, vel_depth):
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if not hasattr(np, "int"):
        np.int = int
    try:
        from monodepth.networks.utils.monodepth_utils import (
            generate_depth_map as ref_gdm)
        from fsnet_tpu.evaluation.lidar_projection import (
            generate_depth_map as our_gdm)

        _write_calib(str(tmp_path))
        velo_file = str(tmp_path / "0000000000.bin")
        _write_velo(velo_file, np.random.RandomState(17))

        ref = ref_gdm(str(tmp_path), velo_file, 2, vel_depth)
        ours = our_gdm(str(tmp_path), velo_file, 2, vel_depth)
        assert ref.shape == ours.shape == (H_IM, W_IM)
        assert (ref > 0).sum() > 100  # the synthetic scene actually projects
        np.testing.assert_allclose(ours, ref, atol=1e-9)
    finally:
        if np.int is int:
            del np.int
