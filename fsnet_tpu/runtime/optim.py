"""Optimizer + LR-schedule factories (optax), matching the reference's
config surface and torch semantics.

Reference: ``vision_base/networks/optimizers/optimizers.py:4-12`` (sgd/adam/
adamw name switch) and ``schedulers.py`` (StepLR/MultiStepLR/ExponentialLR/
CosineAnnealingLR/PolyLR/GradualWarmupScheduler + ``is_iter_based`` consumed by
the train loop, ``scripts/train.py:121,171-187``).

In the functional design the schedule is a pure function of the global step:
epoch-based torch schedulers become step functions through
``epoch = step // steps_per_epoch``. Frozen parameters (reference
``requires_grad=False``: frozen backbone stages, the distill teacher) are
handled with an optax mask that zeroes their updates.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------- LR schedules

def _torch_epoch_schedule(name: Optional[str], base_lr: float, **kw):
    """Return f(epoch) -> lr replicating torch scheduler semantics.

    Every schedule is closed-form jnp arithmetic, so it evaluates identically
    on python ints and on traced step counters inside jit — no lookup table,
    no horizon (iter-based schedules run to arbitrary global steps).
    """
    if name is None:
        return lambda e: jnp.float32(base_lr)
    lname = name.lower()
    if lname == "steplr":
        step_size = kw["step_size"]
        gamma = kw.get("gamma", 0.1)
        return lambda e: base_lr * jnp.power(
            jnp.float32(gamma), jnp.asarray(e // step_size, jnp.float32))
    if lname == "multisteplr":
        milestones = jnp.asarray(sorted(kw["milestones"]))
        gamma = kw.get("gamma", 0.1)
        return lambda e: base_lr * jnp.power(
            jnp.float32(gamma), jnp.sum(e >= milestones).astype(jnp.float32))
    if lname == "exponentiallr":
        gamma = kw.get("gamma", 1.0)
        return lambda e: base_lr * jnp.power(
            jnp.float32(gamma), jnp.asarray(e, jnp.float32))
    if lname == "cosineannealinglr":
        T_max = kw["T_max"]
        eta_min = kw.get("eta_min", 0.0)
        return lambda e: eta_min + (base_lr - eta_min) * (
            1 + jnp.cos(math.pi * jnp.asarray(e, jnp.float32) / T_max)) / 2
    if lname == "polylr":
        # reference PolyLR (schedulers.py:3-13): decay by remaining fraction
        n_iteration = kw.get("n_iteration", -1)
        gamma = kw.get("gamma", 0.9)
        return lambda e: base_lr * jnp.power(
            jnp.maximum(0.0, 1 - jnp.asarray(e, jnp.float32) / n_iteration),
            gamma)
    raise NotImplementedError(name)


def build_lr_schedule(scheduler_cfg: Optional[Dict], base_lr: float,
                      steps_per_epoch: int) -> Tuple[Callable, bool]:
    """cfg -> (schedule(step) -> lr, is_iter_based).

    ``is_iter_based`` schedules advance every step; epoch-based ones advance at
    epoch boundaries (reference ``train.py:171-187``).
    """
    cfg = dict(scheduler_cfg or {})
    name = cfg.pop("name", None)
    is_iter_based = bool(cfg.pop("is_iter_based", False))

    if name is not None and name.lower() == "gradualwarmupscheduler":
        # reference schedulers.py:15-76: linear ramp over total_epoch, then the
        # nested after_scheduler (restarted at 0) scaled by `multiplier`
        multiplier = cfg["multiplier"]
        total_epoch = cfg["total_epoch"]
        after_cfg = dict(cfg.get("after_scheduler_cfg") or {})
        after_name = after_cfg.pop("name", None)
        after = _torch_epoch_schedule(after_name, base_lr * multiplier,
                                      **after_cfg)

        def epoch_fn(e):
            e_f = jnp.asarray(e, jnp.float32)
            if multiplier == 1.0:
                warm = base_lr * (e_f / total_epoch)
            else:
                warm = base_lr * ((multiplier - 1.0) * e_f / total_epoch + 1.0)
            after_lr = after(jnp.maximum(jnp.asarray(e) - total_epoch, 0))
            return jnp.where(e_f <= total_epoch, warm, after_lr)
    else:
        epoch_fn = _torch_epoch_schedule(name, base_lr, **cfg)

    # Schedules are closed-form jnp arithmetic (no lookup table), so both
    # python-int and in-graph traced steps evaluate exactly at any horizon.
    if is_iter_based:
        def schedule(step):
            return epoch_fn(step)
    else:
        def schedule(step):
            return epoch_fn(step // max(steps_per_epoch, 1))
    return schedule, is_iter_based


# ------------------------------------------------------------------ optimizers

def build_optimizer(
    optimizer_cfg: Dict,
    scheduler_cfg: Optional[Dict] = None,
    steps_per_epoch: int = 1,
    clip_gradients: Optional[float] = None,
    frozen_mask: Optional[Any] = None,
) -> Tuple[optax.GradientTransformation, Callable]:
    """Build the full gradient transformation chain:
    clip-by-global-norm -> (sgd|adam|adamw) -> LR schedule -> frozen-mask.

    Matches reference semantics: torch Adam's ``weight_decay`` is L2 added to
    the gradient (not decoupled), torch ``clip_grad_norm_`` is a global-norm
    clip applied before the optimizer (``base_training_hooks.py:49-52``).
    Returns (tx, schedule).
    """
    cfg = dict(optimizer_cfg)
    name = cfg.pop("name").lower()
    base_lr = cfg.pop("lr", 1e-3)
    weight_decay = cfg.pop("weight_decay", 0.0)

    schedule, _ = build_lr_schedule(scheduler_cfg, base_lr, steps_per_epoch)

    chain = []
    if clip_gradients is not None and clip_gradients > 0:
        chain.append(optax.clip_by_global_norm(clip_gradients))

    if name == "sgd":
        momentum = cfg.pop("momentum", 0.0)
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            chain.append(optax.trace(decay=momentum,
                                     nesterov=cfg.pop("nesterov", False)))
    elif name == "adam":
        if weight_decay:  # torch Adam: L2 in gradient, before moments
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_adam(
            b1=cfg.pop("betas", (0.9, 0.999))[0] if "betas" in cfg else 0.9,
            b2=cfg.pop("betas_b2", 0.999),
            eps=cfg.pop("eps", 1e-8)))
    elif name == "adamw":
        chain.append(optax.scale_by_adam(eps=cfg.pop("eps", 1e-8)))
        chain.append(optax.add_decayed_weights(weight_decay or 1e-2))
    else:
        raise NotImplementedError(name)

    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)

    if frozen_mask is not None:
        trainable = jax.tree.map(lambda frozen: not frozen, frozen_mask)
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()},
            jax.tree.map(lambda t: "trainable" if t else "frozen", trainable),
        )
    return tx, schedule


# ----------------------------------------------------------------- frozen mask

def frozen_param_prefixes(meta_arch_cfg: Dict) -> Sequence[Tuple[str, ...]]:
    """Derive frozen parameter path prefixes from a meta-arch config.

    * The distill teacher is always frozen (reference
      ``monodepth2_model.py:165-166``).
    * ``frozen_stages >= 0`` on a backbone freezes the stem plus stages
      1..frozen_stages (reference ``resnet.py:177-190``).
    """
    prefixes = []
    if "teacher_net_cfg" in meta_arch_cfg:
        prefixes.append(("teacher_net",))
    for scope in ("depth_backbone_cfg", "pose_backbone_cfg"):
        sub = meta_arch_cfg.get(scope)
        if not sub:
            continue
        frozen_stages = sub.get("frozen_stages", -1)
        scope_name = scope.replace("_cfg", "")
        if frozen_stages is None or frozen_stages < 0:
            continue
        prefixes.append((scope_name, "conv1"))
        prefixes.append((scope_name, "bn1"))
        for i in range(1, frozen_stages + 1):
            # ResNet stage scopes are named layer{i}_{block}
            prefixes.append((scope_name, f"layer{i}_"))
    return prefixes


def build_frozen_mask(params, prefixes: Sequence[Tuple[str, ...]]):
    """Boolean pytree: True where the parameter path starts with any prefix.
    The last prefix element may be a partial scope name (``'layer1_'``)."""

    def is_frozen(path: Tuple[str, ...]) -> bool:
        for pre in prefixes:
            if len(pre) > len(path):
                continue
            head, last = pre[:-1], pre[-1]
            if tuple(path[:len(head)]) == tuple(head) and \
                    str(path[len(head)]).startswith(last):
                return True
        return False

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def mask_fn(path, leaf):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        return is_frozen(keys)

    return jax.tree_util.tree_map_with_path(mask_fn, params)
