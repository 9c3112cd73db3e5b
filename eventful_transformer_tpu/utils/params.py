"""Parameter (checkpoint) save/load and PyTorch weight conversion.

Native format: a single ``.npz`` holding the flattened parameter pytree with
'/'-joined path keys (lists use numeric segments). This replaces the
reference's ``torch.save(state_dict)`` (utils/train.py:102-105,
utils/evaluate.py:49).

``convert_torch_state_dict`` maps a reference-layout PyTorch ``state_dict``
(the output of the reference's scripts/convert pipeline, or a reference
training run) into our pytree, applying the layout transposes:
torch Linear (out, in) -> kernel (in, out); Conv3d (O, C, t, h, w) ->
flattened (C·t·h·w, O); Conv2d (O, C, h, w) -> (C·h·w, O) for patch
embeddings done as matmuls.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax.numpy as jnp


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_params(path, params):
    np.savez(path, **_flatten(params))


def load_params(path, like=None):
    """Load params saved by :func:`save_params`. If ``like`` (a template
    pytree, e.g. from ``model.init``) is given, leaves are loaded into its
    structure and all paths are required to match."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    if like is None:
        return _unflatten(flat)
    return fill_like(like, flat)


def _unflatten(flat):
    root = {}
    for path, value in flat.items():
        node = root
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return _listify(root)


def _listify(node):
    if not isinstance(node, dict):
        return node
    node = {k: _listify(v) for k, v in node.items()}
    if node and all(k.isdigit() for k in node):
        return [node[str(i)] for i in range(len(node))]
    return node


def fill_like(like, flat):
    template = _flatten(like)
    missing = set(template) - set(flat)
    extra = set(flat) - set(template)
    if missing or extra:
        raise ValueError(
            f"parameter mismatch: missing={sorted(missing)[:8]} extra={sorted(extra)[:8]}"
        )
    def build(node, prefix):
        if isinstance(node, dict):
            return {k: build(v, f"{prefix}{k}/") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [build(v, f"{prefix}{i}/") for i, v in enumerate(node)]
        path = prefix[:-1]
        value = np.asarray(flat[path])
        if value.shape != np.shape(node):
            raise ValueError(
                f"shape mismatch at {path}: {value.shape} vs {np.shape(node)}"
            )
        return jnp.asarray(value, dtype=node.dtype)

    return build(like, "")


# ---------------------------------------------------------------------------
# PyTorch -> JAX structural conversion
# ---------------------------------------------------------------------------


def convert_torch_state_dict(state_dict):
    """Convert a reference-layout torch ``state_dict`` (name -> tensor/array)
    into our flat path->array map. Key-name mapping is structural:

      ======================================  ==============================
      reference torch name                     our path
      ======================================  ==============================
      a.b.weight (LayerNorm)                   a/b/scale
      a.b.bias   (LayerNorm)                   a/b/bias
      a.qkv.weight (Linear, (out, in))         a/qkv/kernel (transposed)
      backbone.blocks.N.*                      backbone/blocks/N/*
      embedding.conv.weight (Conv3d)           embedding/kernel (flattened)
      position_encoding.encoding               position_encoding/encoding
      relative_position.{x,y}_embedding        unchanged
      ======================================  ==============================
    """
    out = {}
    for name, value in state_dict.items():
        value = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        parts = name.split(".")
        leaf = parts[-1]
        parent = parts[-2] if len(parts) > 1 else ""
        path = parts[:-1]
        if parent == "conv":  # patch / tubelet embedding conv -> matmul kernel
            path = path[:-1]  # drop "conv"
            if leaf == "weight" and value.ndim == 5:  # Conv3d (O, C, t, h, w)
                o = value.shape[0]
                value = value.transpose(1, 2, 3, 4, 0).reshape(-1, o)
                leaf = "kernel"
            elif leaf == "weight" and value.ndim == 4:  # Conv2d (O, C, h, w)
                o = value.shape[0]
                value = value.transpose(1, 2, 3, 0).reshape(-1, o)
                leaf = "kernel"
        elif leaf == "weight" and value.ndim == 2:  # Linear (out, in)
            value = value.T
            leaf = "kernel"
        elif leaf == "weight" and value.ndim == 4:
            # Conv2d (O, I, kh, kw) -> HWIO; ConvTranspose2d (I, O, kh, kw)
            # -> (kh, kw, O, I): the same transpose serves both layouts.
            value = value.transpose(2, 3, 1, 0)
            leaf = "kernel"
        elif leaf == "weight":  # LayerNorm scale
            leaf = "scale"
        out["/".join(path + [leaf])] = value
    return out


# ---------------------------------------------------------------------------
# Orbax backend (optional): production checkpointing with atomicity and
# async-friendly layout. The .npz format remains the default interchange.
# ---------------------------------------------------------------------------


def save_params_orbax(path, params):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(Path(path).absolute(), params, force=True)


def load_params_orbax(path, like):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(Path(path).absolute(), like)
