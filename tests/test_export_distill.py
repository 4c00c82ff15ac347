"""Export round-trip, teacher-transform checkpoint surgery, and the
DistillWPoseMeta training path (frozen teacher)."""
import os

import numpy as np
import pytest

import jax

from fsnet_tpu.runtime.checkpoint import (
    load_teacher_into_params, save_models, transform_teacher_params,
)
from fsnet_tpu.runtime.export import export_dummy_forward, smoke_check
from fsnet_tpu.runtime.optim import (
    build_frozen_mask, build_optimizer, frozen_param_prefixes,
)
from fsnet_tpu.runtime.state import init_state, make_train_step

from test_models import _flagship_cfg, _synthetic_batch, H, W


def _wpose_state():
    from fsnet_tpu.models import MonoDepthWPose
    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(np.random.RandomState(0))
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=1)
    state = init_state(model, batch, tx, jax.random.PRNGKey(0))
    return model, batch, state


def test_export_roundtrip(tmp_path):
    model, batch, state = _wpose_state()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = str(tmp_path / "model.stablehlo")
    blob = export_dummy_forward(model, variables, (1, H, W, 3), path)
    assert os.path.getsize(path) == len(blob) and len(blob) > 0
    result = smoke_check(blob, model, variables, (1, H, W, 3))
    assert result["max_diff"] < 1e-4


def test_teacher_transform_and_distill():
    model, batch, state = _wpose_state()
    teacher = transform_teacher_params(state.params)
    assert set(teacher) == {"depth_backbone", "depth_decoder"}

    # build the distill meta-arch and graft the teacher weights
    cfg = _flagship_cfg()
    distill_cfg = dict(
        teacher_net_cfg=dict(
            name="fsnet_tpu.models.meta_archs.monodepth2_model.MonoDepthInference",
            backbone_cfg=cfg["depth_backbone_cfg"],
            depth_head_cfg=cfg["head_cfg"]["depth_decoder_cfg"],
        ),
        depth_backbone_cfg=cfg["depth_backbone_cfg"],
        head_cfg={**cfg["head_cfg"],
                  "distillation_loss_weight": 0.3,
                  "is_unscaled_distill": True},
        train_cfg=cfg["train_cfg"],
        test_cfg={},
    )
    from fsnet_tpu.models import DistillWPoseMeta
    dmodel = DistillWPoseMeta(**distill_cfg)
    tx, _ = build_optimizer(dict(name="adam", lr=1e-3), None, steps_per_epoch=1)
    dstate = init_state(dmodel, batch, tx, jax.random.PRNGKey(1))

    grafted = load_teacher_into_params(dict(dstate.params), teacher)
    np.testing.assert_array_equal(
        np.asarray(grafted["teacher_net"]["depth_backbone"]["conv1"]["kernel"]),
        np.asarray(state.params["depth_backbone"]["conv1"]["kernel"]))

    # teacher is frozen: one train step must not move teacher params
    mask = build_frozen_mask(dstate.params, frozen_param_prefixes(distill_cfg))
    tx2, _ = build_optimizer(dict(name="adam", lr=1e-2), None,
                             steps_per_epoch=1, frozen_mask=mask)
    dstate = dstate.replace(params=grafted, tx=tx2,
                            opt_state=tx2.init(grafted))
    step = make_train_step(donate=False)
    new_state, metrics, _ = step(dstate, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert any(k.startswith("distilation/") for k in metrics)
    np.testing.assert_array_equal(
        np.asarray(new_state.params["teacher_net"]["depth_backbone"]["conv1"]["kernel"]),
        np.asarray(grafted["teacher_net"]["depth_backbone"]["conv1"]["kernel"]))
    # student moved
    assert np.abs(
        np.asarray(new_state.params["depth_backbone"]["conv1"]["kernel"])
        - np.asarray(grafted["depth_backbone"]["conv1"]["kernel"])).max() > 0


def test_supervised_metrics():
    from fsnet_tpu.ops.metrics import (
        SUPERVISED_METRIC_NAMES, compute_supervised_errors,
    )
    rng = np.random.RandomState(0)
    gt = rng.uniform(1.0, 60.0, (100, 200))
    result = compute_supervised_errors(gt, gt.copy())
    for name in SUPERVISED_METRIC_NAMES:
        assert result[name] == pytest.approx(0.0, abs=1e-9)

    pred = gt * 1.1
    result = compute_supervised_errors(gt, pred)
    assert result["absRel"] == pytest.approx(0.1, rel=1e-6)
    assert result["SILog"] == pytest.approx(0.0, abs=1e-6)  # pure scale error
    assert result["MAE"] > 0
