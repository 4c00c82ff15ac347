"""Deployment export entry point (reference ``scripts/onnx_export.py:15-74``).

Usage:
    python scripts/export.py --config CFG --checkpoint PATH --output model.stablehlo
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config: str, checkpoint: str = "", output: str = "model.stablehlo",
         **kwargs):
    import jax

    from fsnet_tpu.runtime.checkpoint import load_models
    from fsnet_tpu.runtime.export import export_dummy_forward, smoke_check
    from fsnet_tpu.runtime.optim import build_optimizer
    from fsnet_tpu.runtime.state import init_state
    from fsnet_tpu.utils import build, cfg_from_file, update_cfg
    import numpy as np

    cfg = cfg_from_file(config)
    cfg = update_cfg(cfg, **kwargs)

    meta_arch = build(**cfg.meta_arch)
    h, w, c = cfg.data.rgb_shape
    image = np.zeros((1, h, w, c), np.float32)

    variables = meta_arch.init(
        {"params": jax.random.PRNGKey(0), "loss_noise": jax.random.PRNGKey(1)},
        image, method=meta_arch.dummy_forward)

    if checkpoint:
        tx, _ = build_optimizer(dict(cfg.optimizer), None, steps_per_epoch=1)
        from fsnet_tpu.runtime.state import TrainState
        from flax.core import FrozenDict
        state = TrainState.create(
            apply_fn=meta_arch.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", FrozenDict()), tx=tx)
        state, _ = load_models(checkpoint, state, strict=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    blob = export_dummy_forward(meta_arch, variables, (1, h, w, c), output)
    print(f"Exported {len(blob)} bytes to {output}")
    result = smoke_check(blob, meta_arch, variables, (1, h, w, c))
    print(f"Smoke check passed: max_diff={result['max_diff']:.2e}")


if __name__ == "__main__":
    from train import parse_overrides

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--output", default="model.stablehlo")
    args, unknown = parser.parse_known_args()
    main(config=args.config, checkpoint=args.checkpoint, output=args.output,
         **parse_overrides(unknown))
