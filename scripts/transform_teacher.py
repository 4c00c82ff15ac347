"""Strip a trained wpose checkpoint down to the distill-teacher subtree
(reference ``monodepth/transform_teacher.py:6-28``: keeps ``depth_backbone.*``
and renames the head's depth decoder to ``depth_decoder.*``).

Usage:
    python scripts/transform_teacher.py --checkpoint IN_DIR --output OUT_DIR
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def transform_teacher_model(checkpoint: str, output: str):
    import numpy as np
    import orbax.checkpoint as ocp

    from fsnet_tpu.runtime.checkpoint import transform_teacher_params

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(checkpoint))
    params = restored.get("params", restored)
    teacher = transform_teacher_params(params)
    assert teacher, "no depth_backbone / head.depth_decoder found in checkpoint"

    payload = {"params": teacher}
    ckptr.save(os.path.abspath(output), payload, force=True)
    ckptr.wait_until_finished()
    n = sum(np.asarray(x).size for x in _leaves(teacher))
    print(f"Teacher checkpoint with {n} params written to {output}")


def _leaves(tree):
    import jax
    return jax.tree.leaves(tree)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()
    transform_teacher_model(args.checkpoint, args.output)
