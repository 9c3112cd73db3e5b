"""Orbax-backed training checkpoints (full state: params + optimizer +
epoch counter).

The reference saves bare weights only (`torch.save(model.state_dict())`,
utils/train.py:102-105) with no optimizer/step resume (SURVEY.md §5). This
module exceeds that: crash-safe epoch checkpoints with atomic finalization
via Orbax, so long fine-tunes resume exactly (same optimizer moments, same
epoch schedule). Enabled with ``checkpoint_dir`` in train configs; plain
`.npz` weight export (utils/params.py) remains the conversion/interchange
format.
"""

from __future__ import annotations

from pathlib import Path

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(directory, epoch, params, opt_state):
    """Write the checkpoint for ``epoch`` (atomic — Orbax finalizes the
    directory only after all shards land)."""
    path = Path(directory).absolute() / f"epoch_{epoch:05d}"
    _checkpointer().save(
        path, {"epoch": epoch, "params": params, "opt_state": opt_state},
        force=True,
    )
    return path


def latest_epoch(directory):
    """Largest finalized epoch number under ``directory``, or None."""
    directory = Path(directory)
    if not directory.is_dir():
        return None
    epochs = []
    for child in directory.iterdir():
        name = child.name
        if name.startswith("epoch_") and name[6:].isdigit():
            epochs.append(int(name[6:]))
    return max(epochs) if epochs else None


def restore_train_state(directory, epoch, params_like, opt_state_like):
    """Restore (params, opt_state) for ``epoch``, shaped/typed like the
    given templates (works with sharded templates too — Orbax restores to
    the template's shardings)."""
    path = Path(directory).absolute() / f"epoch_{epoch:05d}"
    target = {"epoch": epoch, "params": params_like, "opt_state": opt_state_like}
    restored = _checkpointer().restore(path, item=target)
    return restored["params"], restored["opt_state"]
