"""Post-training artifact archiver (the reference's ``scripts/synology.py``
equivalent, ``:53-150``): scrapes the TensorBoard event files of a run for the
config text / git provenance / model structure / evaluation tables, bundles
them with the latest checkpoint + TB events into a timestamped tar, and
optionally uploads it to a WebDAV/HTTP endpoint.

The reference uploads to a Synology NAS via ``synology_api``; this framework
archives locally by default (zero-egress environments) with the upload step
pluggable via ``--upload_url``.
"""
from __future__ import annotations

import argparse
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fsnet_tpu.utils import cfg_from_file


def find_latest_modified_path(list_of_dir):
    """Reference ``synology.py:11-14``."""
    return max(list_of_dir, key=lambda folder: os.stat(folder).st_mtime)


def datestring_from_wall_time(walltime):
    return time.strftime("%Y-%m-%dT%H_%M_%SZ", time.localtime(walltime))


def scrape_tensorboard_text(tb_path):
    """Extract config/git/eval text summaries from TB event files
    (reference ``synology.py:57-103``)."""
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
    except ImportError:
        print("tensorboard unavailable; skipping text scrape")
        return {}

    ea = EventAccumulator(tb_path)
    ea.Reload()
    texts = {}
    for tag in ea.Tags().get("tensors", []):
        try:
            events = ea.Tensors(tag)
            if not events:
                continue
            value = events[-1].tensor_proto.string_val[0].decode("utf-8")
            texts[tag] = value.replace("&nbsp;", " ")
        except Exception:  # noqa: BLE001 - non-text tensor tags
            continue
    return texts


def main(config: str, experiment_name: str = "default",
         output_dir: str = "", upload_url: str = ""):
    cfg = cfg_from_file(config)
    log_path = cfg.path.log_path
    tb_path = os.path.join(log_path, f"{experiment_name}config={config}")
    if not os.path.isdir(tb_path):
        candidates = [os.path.join(log_path, d) for d in os.listdir(log_path)]
        candidates = [c for c in candidates if os.path.isdir(c)]
        if not candidates:
            print(f"no runs found under {log_path}")
            return
        tb_path = find_latest_modified_path(candidates)
        print(f"using latest run {tb_path}")

    stamp = datestring_from_wall_time(os.stat(tb_path).st_mtime)
    output_dir = output_dir or cfg.path.preprocessed_path
    os.makedirs(output_dir, exist_ok=True)
    bundle_path = os.path.join(output_dir,
                               f"{experiment_name}_{stamp}.tar.gz")

    texts = scrape_tensorboard_text(tb_path)
    with tarfile.open(bundle_path, "w:gz") as tar:
        for tag, value in texts.items():
            tmp = os.path.join(output_dir, tag.replace("/", "_") + ".md")
            with open(tmp, "w") as f:
                f.write(value)
            tar.add(tmp, arcname=os.path.basename(tmp))
            os.remove(tmp)
        tar.add(config, arcname=os.path.basename(config))
        tar.add(tb_path, arcname="tensorboard_events")
        ckpt_dir = cfg.path.checkpoint_path
        if os.path.isdir(ckpt_dir):
            latest = [os.path.join(ckpt_dir, d) for d in os.listdir(ckpt_dir)
                      if "latest" in d]
            if latest:
                tar.add(find_latest_modified_path(latest),
                        arcname="checkpoint_latest")
    print(f"artifact bundle written to {bundle_path}")

    if upload_url:
        import urllib.request

        with open(bundle_path, "rb") as f:
            request = urllib.request.Request(
                upload_url + "/" + os.path.basename(bundle_path),
                data=f.read(), method="PUT")
            urllib.request.urlopen(request)
        print(f"uploaded to {upload_url}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--experiment_name", default="default")
    parser.add_argument("--output_dir", default="")
    parser.add_argument("--upload_url", default="")
    args = parser.parse_args()
    main(args.config, args.experiment_name, args.output_dir, args.upload_url)
