"""Training entry point.

Mirrors the reference orchestration (``/root/reference/scripts/train.py:21-214``,
SURVEY.md §3.1): config -> TB writer + git provenance -> precompute hooks ->
datasets/dataloader -> meta-arch -> optimizer/scheduler -> checkpointing ->
epoch loop with disp-iter logging + ETA -> periodic eval.

TPU-native differences: the per-step hot path is ONE jitted ``train_step``
over a DP mesh; per-rank GPU pinning / DDP / SyncBN / barrier are replaced by
the mesh + GSPMD collectives; the checkpoint carries step/epoch/optimizer so
resume restores the schedule position.

Usage:
    python scripts/train.py --config configs/kitti360_wpose_example.py \
        [--experiment_name NAME] [--any.dotted.key value]
"""
from __future__ import annotations

import argparse
import os
import pprint
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_overrides(argv):
    """--a.b.c value pairs -> dict with literal-eval'd values."""
    import ast

    overrides = {}
    key = None
    for token in argv:
        if token.startswith("--"):
            key = token[2:]
            if "=" in key:
                key, value = key.split("=", 1)
                overrides[key] = _literal(value)
                key = None
        elif key is not None:
            overrides[key] = _literal(token)
            key = None

    def _noop(x):
        return x
    return overrides


def _literal(value: str):
    import ast

    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def main(config: str = "configs/config.py", experiment_name: str = "default",
         world_size: int = 1, local_rank: int = -1,
         debug_nans: bool = False, profile_dir: str = "", **kwargs):
    import jax
    import numpy as np

    # numeric-debug analogue of the reference's DEBUGGING env gate
    # (/root/reference/vision_base/utils/timer.py:5-34 gates per-phase CUDA
    # timing; the jit-functional equivalent of a numeric sanitizer is
    # jax_debug_nans, which re-runs the faulting op un-jitted and raises at
    # the first NaN/Inf producer). Enabled by --debug_nans or DEBUGGING=1.
    if debug_nans or os.environ.get("DEBUGGING", "").lower() in ("1", "true"):
        jax.config.update("jax_debug_nans", True)
        print("NaN debugging enabled (jax_debug_nans): training will raise "
              "at the first op producing NaN/Inf")

    # multi-host pods: initialize the jax distributed runtime from the TPU
    # environment (the reference's init_process_group('nccl') analogue,
    # /root/reference/scripts/train.py:73-75). Single-host runs skip this.
    if world_size > 1 and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception as e:  # noqa: BLE001 - single-host fallback
            print(f"jax.distributed.initialize skipped: {e}")

    from fsnet_tpu.data.dataloader import build_dataloader, device_prefetch
    from fsnet_tpu.parallel.mesh import (
        make_mesh, process_is_logger, replicate_state, sync_global_devices,
    )
    from fsnet_tpu.runtime.checkpoint import load_models, save_models
    from fsnet_tpu.runtime.optim import (
        build_frozen_mask, build_lr_schedule, build_optimizer,
        frozen_param_prefixes,
    )
    from fsnet_tpu.runtime.state import init_state
    from fsnet_tpu.utils import (
        EasyDict, LossLogger, Timer, build, cfg_from_file, set_random_seed,
        styling_git_info, update_cfg,
    )

    cfg = cfg_from_file(config)
    cfg = update_cfg(cfg, **kwargs)

    cfg.dist = EasyDict(world_size=world_size, local_rank=local_rank)
    is_logging = process_is_logger()
    is_evaluating = is_logging

    set_random_seed(getattr(cfg.trainer, "seed", 100))

    # ---------------------------------------------------------------- writer
    writer = None
    if is_logging:
        recorder_dir = os.path.join(cfg.path.log_path,
                                    f"{experiment_name}config={config}")
        try:
            from torch.utils.tensorboard import SummaryWriter
            import shutil
            if os.path.isdir(recorder_dir):
                shutil.rmtree(recorder_dir, ignore_errors=True)
            writer = SummaryWriter(recorder_dir)
            formatted_cfg = pprint.pformat(cfg)
            writer.add_text(
                "config.py",
                formatted_cfg.replace(" ", "&nbsp;").replace("\n", "  \n"))
            writer.add_text("git", styling_git_info(
                getattr(cfg.path, "base_path", ".")))
        except Exception as e:  # noqa: BLE001 - TB optional
            print(f"TensorBoard writer unavailable: {e}")

    # --------------------------------------------------------- precompute hooks
    if "precompute_hook" in cfg.trainer:
        precompute_hook = build(**cfg.trainer.precompute_hook)
        precompute_hook()

    # ------------------------------------------------------------------- data
    dataset_train = build(**cfg.train_dataset)
    dataset_val = build(**cfg.val_dataset)
    print(f"train samples: {len(dataset_train)}, val: {len(dataset_val)}")

    dataloader_train = build_dataloader(
        dataset_train,
        num_workers=cfg.data.num_workers,
        batch_size=cfg.data.batch_size,
        local_rank=local_rank,
        world_size=world_size,
    )

    # ------------------------------------------------------------------ model
    meta_arch = build(**cfg.meta_arch)

    iter_per_epoch = len(dataloader_train)
    num_epochs = cfg.trainer.max_epochs

    clip_gradients = getattr(cfg.trainer.training_hook, "clip_gradients", None)

    # init params on a sample batch, then build the (possibly masked) optimizer
    sample_batch = next(iter(
        build_dataloader(dataset_train, num_workers=0,
                         batch_size=cfg.data.batch_size)))
    tx_probe, _ = build_optimizer(dict(cfg.optimizer), dict(cfg.scheduler),
                                  steps_per_epoch=iter_per_epoch,
                                  clip_gradients=clip_gradients)
    state = init_state(meta_arch, sample_batch, tx_probe, jax.random.PRNGKey(
        getattr(cfg.trainer, "seed", 100)))

    prefixes = frozen_param_prefixes(cfg.meta_arch)
    if prefixes:
        mask = build_frozen_mask(state.params, prefixes)
        tx, _ = build_optimizer(dict(cfg.optimizer), dict(cfg.scheduler),
                                steps_per_epoch=iter_per_epoch,
                                clip_gradients=clip_gradients,
                                frozen_mask=mask)
        state = state.replace(tx=tx, opt_state=tx.init(state.params))

    # pretrained encoders: config pretrained/pretrained_path -> converted
    # torchvision weights grafted into the fresh state (reference loads
    # ImageNet weights at build time, vision_base resnet.py:270-284)
    from fsnet_tpu.runtime.pretrained import graft_pretrained_backbones
    state, grafted_scopes = graft_pretrained_backbones(state, cfg.meta_arch)

    num_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"Number of parameters: {num_params}")
    if writer is not None:
        writer.add_text("model params", f"{num_params}")

    # distill teacher weights + optional resume
    if "teacher_net_path" in cfg.meta_arch and cfg.meta_arch.teacher_net_path:
        from fsnet_tpu.runtime.checkpoint import (
            load_teacher_into_params, transform_teacher_params,
        )
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(cfg.meta_arch.teacher_net_path))
        teacher = restored.get("params", restored)
        state = state.replace(params=load_teacher_into_params(
            dict(state.params), teacher))

    start_epoch = 0
    if getattr(cfg.path, "pretrained_checkpoint", ""):
        state, start_epoch = load_models(cfg.path.pretrained_checkpoint, state,
                                         strict=False)
        print(f"Resumed from {cfg.path.pretrained_checkpoint} "
              f"(epoch {start_epoch})")

    # ------------------------------------------------------------------- mesh
    mesh = make_mesh(batch_size=cfg.data.batch_size)
    state = replicate_state(state, mesh)

    # ------------------------------------------------------------------ hooks
    training_hook = build(**cfg.trainer.training_hook)
    evaluate_hook = (build(**cfg.trainer.evaluate_hook)
                     if "evaluate_hook" in cfg.trainer else None)

    training_loss_logger = LossLogger(writer, "training") if is_logging else None
    disp_iter = cfg.trainer.disp_iter
    save_iter = getattr(cfg.trainer, "save_iter", 5)
    test_iter = getattr(cfg.trainer, "test_iter", 5)

    timer = Timer()
    rng = jax.random.PRNGKey(getattr(cfg.trainer, "seed", 100) + 1)
    global_step = int(state.step)

    ckpt_dir = cfg.path.checkpoint_path
    model_name = getattr(cfg.trainer, "model_name",
                         type(meta_arch).__name__)

    with mesh:
        for epoch in range(start_epoch, num_epochs):
            it = device_prefetch(iter(dataloader_train), mesh, size=2)
            for step_in_epoch in range(iter_per_epoch):
                try:
                    data = next(it)
                except StopIteration:
                    break
                # device-level tracing (SURVEY §5: jax.profiler is the
                # TPU-native analogue of the reference's DEBUGGING-gated
                # per-phase CUDA timing): trace steps 10-13 of the run,
                # post-compile, viewable in TensorBoard/Perfetto.
                if profile_dir and global_step == 10:
                    jax.profiler.start_trace(profile_dir)
                state = training_hook(
                    data, state, rng,
                    training_loss_logger=training_loss_logger
                    if (is_logging and (global_step % disp_iter == 0
                                        or (global_step + 1) % disp_iter == 0))
                    else None,
                    global_step=global_step, epoch_num=epoch)
                global_step += 1
                if profile_dir and global_step == 14:
                    jax.profiler.stop_trace()
                    print(f"\nprofiler trace (steps 10-13) -> {profile_dir}")

                if is_logging and global_step % disp_iter == 0:
                    if training_loss_logger is not None:
                        training_loss_logger.log(global_step)
                    done = (epoch - start_epoch) * iter_per_epoch + step_in_epoch + 1
                    total = (num_epochs - start_epoch) * iter_per_epoch
                    print(f"Epoch {epoch} | step {step_in_epoch}/{iter_per_epoch}"
                          f" | global {global_step} | "
                          f"ETA {timer.compute_eta(done, total)}", end="\r")

            if is_logging:
                save_models(os.path.join(ckpt_dir, f"{model_name}_latest"),
                            state, epoch + 1)
                if (epoch + 1) % save_iter == 0 or epoch == num_epochs - 1:
                    save_models(os.path.join(ckpt_dir, f"{model_name}_{epoch}"),
                                state, epoch + 1)

            if (is_evaluating and evaluate_hook is not None
                    and (epoch + 1) % test_iter == 0):
                print(f"\n============ evaluate at epoch {epoch} ============")
                evaluate_hook(state, dataset_val, writer, global_step, epoch)

            sync_global_devices(f"epoch_{epoch}")

    print("\nTraining complete")
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument("--config", default="configs/config.py")
    parser.add_argument("--experiment_name", default="default")
    parser.add_argument("--world_size", type=int, default=1)
    parser.add_argument("--local_rank", type=int, default=-1)
    parser.add_argument("--debug_nans", action="store_true",
                        help="raise at the first op producing NaN/Inf "
                             "(jax_debug_nans); also enabled by DEBUGGING=1")
    parser.add_argument("--profile_dir", default="",
                        help="write a jax.profiler device trace of steps "
                             "10-13 to this directory")
    args, unknown = parser.parse_known_args()
    overrides = parse_overrides(unknown)
    main(config=args.config, experiment_name=args.experiment_name,
         world_size=args.world_size, local_rank=args.local_rank,
         debug_nans=args.debug_nans, profile_dir=args.profile_dir,
         **overrides)
