"""Deployment export: serialize the ``dummy_forward`` graph via ``jax.export``.

Reference: ``scripts/onnx_export.py`` — rebinds ``forward = dummy_forward``
(``:49``), exports a static-shape image->depth graph (``torch.onnx.export``
opset 11, ``:51-52``), then checks the graph and smoke-runs it numerically
(``:56-70``). TPU-native equivalent: ``jax.export`` to a serialized StableHLO
artifact with the same "prediction-only, no loss, static input shape"
contract, plus a deserialize-and-compare numerical smoke check.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


def export_dummy_forward(model, variables, input_shape: Tuple[int, ...],
                         output_path: str) -> bytes:
    """Export the image-only inference graph; returns the serialized bytes and
    writes them to ``output_path`` (if non-empty)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    def fn(image):
        return model.apply(variables, image, method=model.dummy_forward)

    spec = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    exported = jax_export.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    if output_path:
        os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
        with open(output_path, "wb") as f:
            f.write(blob)
    return blob


def smoke_check(blob: bytes, model, variables,
                input_shape: Tuple[int, ...], atol: float = 1e-4) -> Dict:
    """Deserialize + run the exported artifact and compare against the live
    model (the reference's onnxruntime numerical check,
    ``onnx_export.py:56-70``)."""
    import jax
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    rng = np.random.RandomState(0)
    image = rng.rand(*input_shape).astype(np.float32)

    restored_out = exported.call(image)
    live_out = model.apply(variables, image, method=model.dummy_forward)

    flat_r = jax.tree.leaves(restored_out)
    flat_l = jax.tree.leaves(live_out)
    max_diff = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                   for a, b in zip(flat_r, flat_l))
    assert max_diff < atol, f"export mismatch: {max_diff}"
    return {"max_diff": max_diff, "outputs": len(flat_r)}
