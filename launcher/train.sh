#!/bin/bash
# Training launcher (reference launcher/train.sh:18-27 equivalent).
#
# The reference dispatches 1 GPU -> plain python, N GPUs ->
# torch.distributed.launch. On TPU all local chips are driven by ONE process
# through the jax mesh, so single- and multi-chip runs share the same command;
# multi-HOST pods launch this same script on every host (jax.distributed
# initializes from the TPU environment automatically).
#
# Usage: ./launcher/train.sh CONFIG_PATH [EXPERIMENT_NAME] [extra overrides...]
set -e

CONFIG_PATH=${1:?"usage: train.sh CONFIG_PATH [EXPERIMENT_NAME] [overrides]"}
EXPERIMENT_NAME=${2:-default}
shift; shift || true

exec python3 "$(dirname "$0")/../scripts/train.py" \
    --config "$CONFIG_PATH" \
    --experiment_name "$EXPERIMENT_NAME" \
    "$@"
