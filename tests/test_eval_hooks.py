"""End-to-end evaluation pass: jitted eval step -> unpad -> inverse-space
resize -> Eigen evaluator (synthetic GT npz) -> logged table."""
import numpy as np

import jax

from fsnet_tpu.data.datasets.synthetic_dataset import SyntheticMonoDataset
from fsnet_tpu.evaluation.kitti_unsupervised_eval import KittiEigenEvaluator
from fsnet_tpu.pipeline_hooks.evaluation_hooks import KittiEvaluationHook
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state

from test_models import _flagship_cfg, _synthetic_batch


def test_kitti_evaluation_hook(tmp_path):
    H, W = 64, 96
    n = 4
    rng = np.random.RandomState(0)

    # synthetic GT depths (dense, in the eigen crop + valid band)
    gt = rng.uniform(2.0, 60.0, (n, 80, 120)).astype(np.float32)
    gt_file = str(tmp_path / "gt.npz")
    arr = np.empty(n, dtype=object)
    for i in range(n):
        arr[i] = gt[i]
    np.savez_compressed(gt_file, data=arr)

    evaluator = KittiEigenEvaluator(data_path="", split_file="",
                                    gt_saved_file=gt_file)
    assert len(evaluator.gt_depths) == n

    from fsnet_tpu.models import MonoDepthWPose
    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(rng, batch=2)
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=1)
    state = init_state(model, batch, tx, jax.random.PRNGKey(0))

    dataset_val = SyntheticMonoDataset(length=n, height=H, width=W)

    hook = KittiEvaluationHook(
        test_run_hook_cfg=dict(
            name="fsnet_tpu.pipeline_hooks.train_val_hooks.BaseValidationHook"),
        batch_size=2, num_workers=0)
    hook.dataset_eval_func = evaluator

    mean_errors, mean_abs_errors = hook(state, dataset_val)
    assert mean_errors.shape == (7,)
    assert np.all(np.isfinite(mean_errors))
    assert np.all(np.isfinite(mean_abs_errors))
    assert mean_errors.min() >= 0.0
