"""End-to-end train-step tests on an 8-device virtual CPU mesh: exercises the
full DP sharding path (batch sharded over 'data', params replicated, XLA
all-reduce) that the reference covers with DDP/NCCL (SURVEY.md §2.3)."""
import numpy as np
import pytest

import jax

from fsnet_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from fsnet_tpu.runtime.optim import (
    build_frozen_mask, build_lr_schedule, build_optimizer, frozen_param_prefixes,
)
from fsnet_tpu.runtime.state import init_state, make_eval_step, make_train_step

from test_models import _flagship_cfg, _synthetic_batch, H, W


def _build():
    from fsnet_tpu.models import MonoDepthWPose
    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(np.random.RandomState(0), batch=8)
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4),
                            dict(name="StepLR", step_size=8),
                            steps_per_epoch=4, clip_gradients=1.0)
    state = init_state(model, batch, tx, jax.random.PRNGKey(0))
    return model, batch, state


@pytest.mark.heavy
def test_train_step_on_mesh():
    model, batch, state = _build()
    mesh = make_mesh()  # all 8 virtual devices
    assert mesh.shape["data"] == 8
    with mesh:
        state = replicate_state(state, mesh)
        sharded = shard_batch(batch, mesh)
        train_step = make_train_step(donate=False)
        state2, metrics, hm = train_step(state, sharded, jax.random.PRNGKey(1))
        loss1 = float(metrics["loss"])
        state3, metrics2, _ = train_step(state2, sharded, jax.random.PRNGKey(1))
        loss2 = float(metrics2["loss"])
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert loss2 < loss1  # same batch twice -> optimizer made progress
    assert int(state3.step) == 2


def test_eval_step():
    model, batch, state = _build()
    eval_step = make_eval_step()
    pred = eval_step(state, batch)
    assert pred["depth"].shape == (8, H, W, 1)


def test_lr_schedules_match_torch_semantics():
    sched, iter_based = build_lr_schedule(
        dict(name="StepLR", step_size=2), base_lr=1.0, steps_per_epoch=10)
    assert not iter_based
    assert float(sched(0)) == 1.0          # epoch 0
    assert float(sched(19)) == 1.0         # epoch 1
    assert abs(float(sched(20)) - 0.1) < 1e-6   # epoch 2
    assert abs(float(sched(45)) - 0.01) < 1e-6  # epoch 4

    sched, _ = build_lr_schedule(
        dict(name="MultiStepLR", milestones=[1, 3], gamma=0.5),
        base_lr=2.0, steps_per_epoch=1)
    assert float(sched(0)) == 2.0
    assert float(sched(1)) == 1.0
    assert float(sched(2)) == 1.0
    assert float(sched(3)) == 0.5

    sched, iter_based = build_lr_schedule(
        dict(name="PolyLR", n_iteration=100, gamma=0.9, is_iter_based=True),
        base_lr=1.0, steps_per_epoch=7)
    assert iter_based
    assert float(sched(0)) == 1.0
    assert abs(float(sched(50)) - 0.5 ** 0.9) < 1e-6

    # warmup: ramp to base_lr over 5 epochs then StepLR
    sched, _ = build_lr_schedule(
        dict(name="GradualWarmupScheduler", multiplier=1.0, total_epoch=5,
             after_scheduler_cfg=dict(name="StepLR", step_size=10)),
        base_lr=1.0, steps_per_epoch=1)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(2)) - 0.4) < 1e-6
    assert abs(float(sched(5)) - 1.0) < 1e-6
    assert abs(float(sched(6)) - 1.0) < 1e-6


def test_iter_based_schedule_beyond_4096_steps():
    # round-1 bug: a 4096-entry lookup table froze iter-based schedules 1.2
    # epochs into a KITTI run (~3.3k steps/epoch x 20 epochs). Schedules are
    # now closed-form; assert exact values deep into a realistic horizon,
    # both eagerly and traced (as optax evaluates them in-graph).
    sched, iter_based = build_lr_schedule(
        dict(name="GradualWarmupScheduler", multiplier=1.0, total_epoch=1000,
             after_scheduler_cfg=dict(name="StepLR", step_size=5000),
             is_iter_based=True),
        base_lr=1.0, steps_per_epoch=3300)
    assert iter_based
    assert abs(float(sched(500)) - 0.5) < 1e-6          # warmup ramp
    assert abs(float(sched(10_000)) - 0.1) < 1e-6       # 9000 into StepLR
    assert abs(float(sched(60_000)) / 1e-11 - 1.0) < 1e-4   # 11 decays
    traced = jax.jit(lambda s: sched(s))(60_000)
    assert abs(float(traced) / 1e-11 - 1.0) < 1e-4

    sched, _ = build_lr_schedule(
        dict(name="PolyLR", n_iteration=66_000, gamma=0.9,
             is_iter_based=True), base_lr=1.0, steps_per_epoch=3300)
    assert abs(float(sched(33_000)) - 0.5 ** 0.9) < 1e-6
    assert float(sched(66_000)) == 0.0


@pytest.mark.heavy
def test_frozen_mask():
    model, batch, state = _build()
    cfg = _flagship_cfg()
    cfg["depth_backbone_cfg"]["frozen_stages"] = 1
    prefixes = frozen_param_prefixes(cfg)
    mask = build_frozen_mask(state.params, prefixes)

    leaves = jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen_paths = [tuple(getattr(p, "key", str(p)) for p in path)
                    for path, v in leaves if v]
    assert any(p[:2] == ("depth_backbone", "conv1") for p in frozen_paths)
    assert any(str(p[1]).startswith("layer1_") for p in frozen_paths
               if p[0] == "depth_backbone")
    assert not any(str(p[1]).startswith("layer2_") for p in frozen_paths
                   if p[0] == "depth_backbone")

    # frozen params don't move under the masked optimizer
    tx, _ = build_optimizer(dict(name="adam", lr=1e-1), None,
                            steps_per_epoch=1, frozen_mask=mask)
    state2 = init_state(model, batch, tx, jax.random.PRNGKey(0))
    train_step = make_train_step(donate=False)
    state3, _, _ = train_step(state2, batch, jax.random.PRNGKey(1))
    conv1_before = state2.params["depth_backbone"]["conv1"]["kernel"]
    conv1_after = state3.params["depth_backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(conv1_before),
                                  np.asarray(conv1_after))
    l2_before = state2.params["depth_backbone"]["layer2_0"]["conv1"]["kernel"]
    l2_after = state3.params["depth_backbone"]["layer2_0"]["conv1"]["kernel"]
    assert np.abs(np.asarray(l2_after) - np.asarray(l2_before)).max() > 0


@pytest.mark.heavy
def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    # trace + lower only: catches API/tracing breakage without paying the
    # full-res XLA backend compile (~1 min on the single-core CI box); the
    # driver executes the real single-chip compile-check every round.
    lowered = jax.jit(fn).lower(*args)
    shape = lowered.out_info["depth"].shape
    assert tuple(shape) == (1, 192, 640, 1), shape
    ge.dryrun_multichip(8)
