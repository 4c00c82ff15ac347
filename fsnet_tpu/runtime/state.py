"""Train state + the single jitted train/eval steps.

The entire body of the reference's per-step hot path
(``BaseTrainingHook.__call__``, ``vision_base/pipeline_hooks/train_val_hooks/
base_training_hooks.py:26-52``: zero_grad -> H2D copies -> forward -> loss ->
backward -> clip -> step) collapses into ONE ``jax.jit``-compiled
``train_step(state, batch, rng)`` whose batch is sharded over the mesh 'data'
axis; gradient all-reduce is emitted by XLA (SURVEY.md §3.2).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    """Carries params, BN statistics, optimizer state and the global step.

    Unlike the reference checkpoint (weights + optimizer only,
    ``vision_base/networks/utils/utils.py:3-19``), step/epoch live in the
    state so resume restores the schedule position too (SURVEY.md §5).
    """

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
        )


def init_state(model, sample_batch: Dict, tx, rng: jax.Array,
               is_training: bool = True) -> TrainState:
    """Initialize parameters by tracing the training (or, for eval-only use,
    the test) graph on a sample batch."""
    params_rng, noise_rng = jax.random.split(rng)
    # jitted: eager per-op dispatch of a full model init costs ~1 min on a
    # single-core host (and one tunnel round-trip per op on remote TPU);
    # the jitted graph also lands in the persistent compile cache.
    variables = jax.jit(
        lambda rngs, b: model.init(rngs, b, {"is_training": is_training})
    )({"params": params_rng, "loss_noise": noise_rng}, sample_batch)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        tx=tx,
    )


def make_train_step(donate: bool = True, compute_dtype=None,
                    with_grads: bool = False):
    """Build the jitted train step. Returns
    ``train_step(state, batch, rng) -> (state, metrics)`` where metrics is the
    scalar loss dict (reference ``loss_dict``) plus the heatmap dict.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) enables mixed precision: master
    parameters stay f32, the forward/backward runs in the compute dtype
    (bf16 doubles MXU throughput and halves HBM traffic on TPU), and the loss
    is accumulated in f32.

    ``with_grads`` (gates only, e.g. ``scripts/tpu_smoke.py``): ship the raw
    parameter gradients in ``metrics["_grads"]`` so a single compile of the
    SHIPPED step exposes the backward for route-parity assertions — the
    reference's CI equivalently exercises its real cuDNN/ATen backward
    (/root/reference/.gitlab-ci.yml:10-16). Never set in production loops
    (it keeps a full param-sized tree live past the update)."""

    def _cast(tree, dtype):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        noise_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            if compute_dtype is not None:
                params_c = _cast(params, compute_dtype)
                batch_c = _cast(batch, compute_dtype)
                stats_c = _cast(state.batch_stats, compute_dtype)
            else:
                params_c, batch_c = params, batch
                stats_c = state.batch_stats
            out, mutated = state.apply_fn(
                {"params": params_c, "batch_stats": stats_c},
                batch_c, {"is_training": True},
                rngs={"loss_noise": noise_rng},
                mutable=["batch_stats"],
            )
            return out["loss"].astype(jnp.float32), (out, mutated)

        (loss, (out, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_batch_stats = mutated.get("batch_stats", state.batch_stats)
        if compute_dtype is not None:
            new_batch_stats = _cast(new_batch_stats, jnp.float32)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        metrics = dict(out["loss_dict"])
        metrics["loss"] = loss
        if with_grads:
            metrics["_grads"] = grads
        return new_state, metrics, out.get("hm", {})

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step():
    """Jitted inference step: ``eval_step(state, batch) -> prediction dict``
    (reference ``BaseValidationHook.__call__``, ``base_validation_hooks.py:16-28``)."""

    def eval_step(state: TrainState, batch: Dict):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, {"is_training": False})

    return jax.jit(eval_step)
