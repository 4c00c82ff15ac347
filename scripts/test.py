"""Offline checkpoint evaluation (reference ``scripts/test.py:12-54``):
config -> dataset split -> restore checkpoint -> evaluate hook.

Usage:
    python scripts/test.py --config CFG --checkpoint PATH [--split val]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config: str, checkpoint: str = "", split: str = "val", **kwargs):
    import jax

    from fsnet_tpu.runtime.checkpoint import load_models
    from fsnet_tpu.runtime.optim import build_optimizer
    from fsnet_tpu.runtime.state import init_state
    from fsnet_tpu.utils import build, cfg_from_file, update_cfg
    from fsnet_tpu.utils.keys import encode_batch
    from fsnet_tpu.data.datasets.dataset_utils import collate_fn

    cfg = cfg_from_file(config)
    cfg = update_cfg(cfg, **kwargs)

    assert split in ("train", "val", "test"), split
    dataset = build(**cfg[f"{split}_dataset"])
    print(f"{split} dataset: {len(dataset)} samples")

    meta_arch = build(**cfg.meta_arch)

    sample = encode_batch(collate_fn([dataset[0]]))
    tx, _ = build_optimizer(dict(cfg.optimizer), None, steps_per_epoch=1)
    state = init_state(meta_arch, sample, tx, jax.random.PRNGKey(0),
                       is_training=False)

    if checkpoint:
        state, epoch = load_models(checkpoint, state, strict=False)
        print(f"Restored {checkpoint} (epoch {epoch})")

    if "evaluate_hook" in cfg.trainer:
        evaluate_hook = build(**cfg.trainer.evaluate_hook)
        evaluate_hook(state, dataset, None, 0, 0)
        return state

    # no evaluator configured (e.g. synthetic/dev configs): run jitted
    # inference over the split and report prediction stats so the script is
    # still a useful checkpoint smoke (reference test.py always has one)
    from fsnet_tpu.runtime.state import make_eval_step

    eval_step = make_eval_step()
    stats = []
    for i in range(len(dataset)):
        batch = encode_batch(collate_fn([dataset[i]]))
        pred = eval_step(state, batch)
        depth = pred["depth"]
        stats.append((float(depth.min()), float(depth.mean()),
                      float(depth.max())))
    mins, means, maxs = zip(*stats)
    print(f"predictions over {len(stats)} samples: depth min {min(mins):.3f}"
          f" mean {sum(means) / len(means):.3f} max {max(maxs):.3f}")
    return state


if __name__ == "__main__":
    from train import parse_overrides

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--split", default="val")
    args, unknown = parser.parse_known_args()
    main(config=args.config, checkpoint=args.checkpoint, split=args.split,
         **parse_overrides(unknown))
