"""Orbax-backed training checkpoints: async, sharded, crash-resumable.

The safetensors checkpoints in trainer.py are the MLX-interoperable surface;
this module is the production path for (multi-chip) training: the FULL train
state (params, optimizer moments, step, optional EMA) written asynchronously
with retention management, restorable with the original shardings.

SURVEY.md §5 notes the reference has no failure recovery at all and its resume
loses optimizer/schedule state; `latest_step` + `restore` here give exact
crash resume.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


# ------------------------------------------------- safetensors state trees

# The non-orbax trainstate fallback: a pytree (e.g. {"opt_state", "step"})
# flattened to path-keyed safetensors — version-stable and inspectable,
# replacing the earlier pickle format (version-fragile, arbitrary-code-on-
# load). Restore requires a template with the same structure (a freshly
# initialized state), so renamed/missing leaves fail loudly.


def _flat_with_paths(tree) -> dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        jax.tree_util.keystr(path): np.ascontiguousarray(np.asarray(leaf))
        for path, leaf in flat
    }


def save_tree_safetensors(path: str | Path, tree) -> None:
    from safetensors.numpy import save_file

    save_file(_flat_with_paths(tree), Path(path))


def load_tree_safetensors(path: str | Path, template):
    """Load a tree saved by save_tree_safetensors into `template`'s structure
    (leaf values replaced; a structural mismatch raises KeyError)."""
    import jax.numpy as jnp
    from safetensors.numpy import load_file

    flat = load_file(Path(path))
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, t_leaf in paths_leaves:
        k = jax.tree_util.keystr(p)
        if k not in flat:
            raise KeyError(
                f"train-state file {path} has no leaf {k}; the optimizer "
                "configuration changed since it was written"
            )
        # safetensors stores 0-d arrays as 1-element vectors; restore the
        # template's shape (and catch real shape drift loudly)
        leaf = jnp.asarray(flat[k])
        if leaf.shape != np.shape(t_leaf):
            leaf = leaf.reshape(np.shape(t_leaf))
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class TrainCheckpointManager:
    """Thin wrapper over orbax.CheckpointManager for the trainer's state dict."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3, async_save: bool = True):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: dict) -> None:
        """Async save; returns immediately (pending writes finish in the
        background; call wait() or close() to block)."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: int, abstract_state: dict) -> dict:
        """Restore into the structure/shardings of `abstract_state` (a state
        pytree, e.g. freshly initialized — its shardings are reused)."""
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return list(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


# ------------------------------------------------- shared trainer resume

# Both trainers (training/trainer.py, training/duration_trainer.py) resume
# the same way; only the filename prefix and the weight-conversion functions
# differ. The policy lives here ONCE so a fix to one trainer cannot silently
# drift from the other.


def latest_checkpoint_step(results_dir: str | Path, prefix: str, ckpt_mgr=None) -> int | None:
    """Newest resumable step (crash-resume entry: checkpoint="latest").

    With orbax enabled, orbax's committed steps are authoritative — a newer
    weights-only safetensors file can exist when a crash landed between the
    synchronous safetensors write and the async orbax commit, and resuming
    from it would silently lose optimizer/schedule state."""
    if ckpt_mgr is not None:
        latest = ckpt_mgr.latest_step()
        if latest is not None:
            return int(latest)
    steps = []
    for p in Path(results_dir).glob(f"{prefix}*.safetensors"):
        stem = p.stem.split(".")[0]  # strip .ema / .trainstate
        try:
            steps.append(int(stem.removeprefix(prefix)))
        except ValueError:
            continue
    return max(steps) if steps else None


def restore_orbax_adapting_ema(ckpt_mgr: TrainCheckpointManager, step: int, state: dict) -> dict:
    """Restore the full state; tolerate a changed ema_decay setting by
    adapting the 'ema' subtree instead of failing on a pytree mismatch."""
    try:
        return ckpt_mgr.restore(step, state)
    except (ValueError, KeyError):
        has_ema_now = "ema" in state
        alt = dict(state)
        if has_ema_now:
            alt.pop("ema")  # checkpoint was written without EMA
        else:
            alt["ema"] = jax.tree.map(lambda x: x, state["params"])
        restored = ckpt_mgr.restore(step, alt)
        if has_ema_now:
            print("warning: checkpoint has no EMA; re-initializing EMA from params")
            restored["ema"] = jax.jit(lambda t: jax.tree.map(lambda x: x + 0, t))(
                restored["params"]
            )
        else:
            print("warning: checkpoint has EMA but ema_decay is None; dropping it")
            restored.pop("ema", None)
        return restored


def restore_train_state_file(state: dict, ts_path: str | Path, reference_note: str) -> None:
    """Fill opt_state/step of `state` (in place) from a .trainstate
    safetensors file, or warn LOUDLY that the resume is weights-only."""
    import jax.numpy as jnp

    ts_path = Path(ts_path)
    if ts_path.exists():
        restored = load_tree_safetensors(
            ts_path, {"opt_state": state["opt_state"], "step": state["step"]}
        )
        state["opt_state"] = restored["opt_state"]
        state["step"] = jnp.asarray(restored["step"], jnp.int32)
    else:
        print(
            f"WARNING: no train-state file next to the step weights "
            f"({ts_path.name}); resuming WEIGHTS-ONLY — optimizer moments and "
            f"the LR schedule restart from zero ({reference_note})"
        )


def save_train_state(ckpt_mgr, step: int, state: dict, ts_path: str | Path) -> None:
    """Full-train-state save: orbax (async) when a manager is configured,
    else the safetensors .trainstate file next to the weights."""
    if ckpt_mgr is not None:
        ckpt_mgr.save(step, state)
    else:
        save_tree_safetensors(
            Path(ts_path), {"opt_state": state["opt_state"], "step": state["step"]}
        )
