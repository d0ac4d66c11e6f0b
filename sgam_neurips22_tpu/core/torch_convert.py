"""torch -> JAX checkpoint conversion.

The reference publishes PyTorch-Lightning ``.ckpt`` files
(trained_models/{clevr-infinite,google_earth}/last.ckpt, loaded via
``torch.load(...)["state_dict"]`` in reference model.py:87-104). This module
converts such a state_dict into this package's parameter pytrees so the
TPU build can run the published weights (the frame-parity north star,
BASELINE.md).

Conversion rules:
- dotted names with numeric parts become nested dicts/lists mirroring the
  module tree (``encoder.down.0.block.1.conv1.weight`` ->
  params['encoder']['down'][0]['block'][1]['conv1']['weight']);
- 4D conv kernels transpose OIHW -> HWIO (TPU/NHWC layout);
- ``quantize.embedding.weight`` -> params['quantize']['embedding'];
- ``loss.discriminator.*`` -> a separate discriminator tree;
- ``perceptual_loss.*`` / ``loss.perceptual_loss.*`` -> a separate LPIPS tree.

torch is only needed to *read* the pickle; everything downstream is numpy.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _insert(tree: Dict[str, Any], parts: list, value: np.ndarray) -> None:
    node = tree
    for i, part in enumerate(parts[:-1]):
        nxt_is_idx = parts[i + 1].isdigit() if i + 1 < len(parts) else False
        if part.isdigit():
            idx = int(part)
            while len(node) <= idx:  # type: ignore[arg-type]
                node.append({} if not nxt_is_idx else [])
            if not isinstance(node[idx], (dict, list)) or node[idx] == {}:
                node[idx] = [] if nxt_is_idx else (node[idx] or {})
            node = node[idx]
        else:
            if part not in node:
                node[part] = [] if nxt_is_idx else {}
            node = node[part]
    last = parts[-1]
    if last.isdigit():
        idx = int(last)
        while len(node) <= idx:  # type: ignore[arg-type]
            node.append(None)
        node[idx] = value
    else:
        node[last] = value


def convert_tensor(name: str, arr: np.ndarray) -> np.ndarray:
    """Layout conversion for one tensor."""
    if arr.ndim == 4:  # conv OIHW -> HWIO
        return arr.transpose(2, 3, 1, 0)
    return arr


def convert_state_dict(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Split + convert a reference VQModel state_dict.

    Returns:
      (model_params, discriminator_params, lpips_params) as nested pytrees
      of numpy arrays. Any of them may be empty.
    """
    model: Dict[str, Any] = {}
    disc: Dict[str, Any] = {}
    lpips: Dict[str, Any] = {}
    for name, tensor in state_dict.items():
        arr = convert_tensor(name, _to_numpy(tensor))
        parts = name.split(".")
        if parts[0] == "loss":
            if parts[1] == "discriminator":
                _insert(disc, parts[2:], arr)
            elif parts[1] == "perceptual_loss":
                _insert(lpips, parts[2:], arr)
            # other loss buffers (none in practice) are dropped
            continue
        if parts[0] == "perceptual_loss":
            _insert(lpips, parts[1:], arr)
            continue
        if parts[:2] == ["quantize", "embedding"] and parts[-1] == "weight":
            model.setdefault("quantize", {})["embedding"] = arr
            continue
        _insert(model, parts, arr)
    return model, disc, lpips


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a Lightning .ckpt (or bare state_dict) with torch (CPU)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj.get("state_dict", obj) if isinstance(obj, dict) else obj


def convert_checkpoint(path: str):
    """One-call: .ckpt path -> (model, disc, lpips) numpy pytrees."""
    return convert_state_dict(load_torch_checkpoint(path))


def params_to_state_dict(params: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse conversion: parameter pytree -> torch-style flat state_dict
    (HWIO conv kernels back to OIHW; quantize.embedding gains '.weight').
    Used for validation round-trips and exporting weights to the reference
    format."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}.{k}" if path else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{path}.{i}")
        elif node is not None:
            arr = np.asarray(node)
            if path.endswith("quantize.embedding") or path == "quantize.embedding":
                path = path + ".weight"
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            out[path] = arr

    walk(params, prefix)
    return out


def init_from_ckpt(
    params: Dict[str, Any],
    converted: Dict[str, Any],
    ignore_prefixes: tuple = (),
) -> Dict[str, Any]:
    """Non-strict merge of converted weights into an initialized tree
    (reference model.py:87-104: load_state_dict(strict=False) with
    ignore_keys, used for the cross-phase warm start where the conditional
    model inherits codebook weights but n_embed differs)."""
    import jax

    def merge(dst, src, path=""):
        if isinstance(dst, dict) and isinstance(src, dict):
            return {
                k: merge(dst[k], src[k], f"{path}.{k}") if k in src else dst[k]
                for k in dst
            }
        if isinstance(dst, list) and isinstance(src, list):
            return [
                merge(d, s, f"{path}.{i}") if s is not None else d
                for i, (d, s) in enumerate(zip(dst, src))
            ] + dst[len(src):]
        if any(path.lstrip(".").startswith(p) for p in ignore_prefixes):
            return dst
        if src is None:
            return dst
        src_arr = np.asarray(src)
        if hasattr(dst, "shape") and tuple(dst.shape) != tuple(src_arr.shape):
            # shape mismatch -> keep initialized value (non-strict load)
            return dst
        return jax.numpy.asarray(src_arr, dtype=dst.dtype if hasattr(dst, "dtype") else None)

    return merge(params, converted)
