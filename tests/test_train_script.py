"""End-to-end: the full training script on the synthetic smoke config (1 epoch,
tiny shapes) — config loading, dataset building through the DI kernel,
augmentation graph, mesh DP training, checkpoint save/restore."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.mark.heavy
def test_train_main_one_epoch(tmp_path):
    import train as train_script

    state = train_script.main(
        config=os.path.join(REPO, "configs/synthetic_smoke_example.py"),
        experiment_name="pytest",
        **{"path.project_path": str(tmp_path),
           "path.log_path": str(tmp_path / "log"),
           "path.checkpoint_path": str(tmp_path / "ckpt"),
           "trainer.max_epochs": 1})
    assert int(state.step) == 3  # 12 samples / batch 4

    # checkpoint written and restorable
    ckpts = os.listdir(str(tmp_path / "ckpt"))
    assert any("latest" in c for c in ckpts)

    from fsnet_tpu.runtime.checkpoint import load_models
    restored, epoch = load_models(
        str(tmp_path / "ckpt" / [c for c in ckpts if "latest" in c][0]),
        state, strict=False)
    assert epoch == 1
    np.testing.assert_array_equal(
        np.asarray(restored.params["depth_backbone"]["conv1"]["kernel"]),
        np.asarray(state.params["depth_backbone"]["conv1"]["kernel"]))


def test_test_script_on_smoke_config(tmp_path):
    """scripts/test.py end-to-end: train 1 epoch, then offline-evaluate the
    written checkpoint on the val split (no evaluator configured -> jitted
    inference smoke over the split, reference scripts/test.py:12-54)."""
    import train as train_script
    import test as test_script

    overrides = {"path.project_path": str(tmp_path),
                 "path.log_path": str(tmp_path / "log"),
                 "path.checkpoint_path": str(tmp_path / "ckpt"),
                 "trainer.max_epochs": 1}
    train_script.main(
        config=os.path.join(REPO, "configs/synthetic_smoke_example.py"),
        experiment_name="pytest_testpy", **overrides)
    ckpt_dir = tmp_path / "ckpt"
    latest = [c for c in os.listdir(ckpt_dir) if "latest" in c][0]
    state = test_script.main(
        config=os.path.join(REPO, "configs/synthetic_smoke_example.py"),
        checkpoint=str(ckpt_dir / latest), split="val", **overrides)
    # checkpoint restore carries the schedule position (step) — better than
    # the reference's weights+optimizer-only restore (SURVEY.md §5)
    assert int(state.step) == 3
