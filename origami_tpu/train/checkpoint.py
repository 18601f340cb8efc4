"""Training checkpoints via orbax.

The reference has no in-repo NN training, so no checkpointing existed
(SURVEY.md §5); here trainer state (params + opt_state + step) persists
through orbax so multi-hour runs resume exactly.
"""

from __future__ import annotations

from pathlib import Path

import jax


def _manager(ckpt_dir, max_to_keep=3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        Path(ckpt_dir).absolute(),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True))


def save_state(ckpt_dir, step, params, opt_state, max_to_keep=3):
    import orbax.checkpoint as ocp
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.Composite(
        params=ocp.args.StandardSave(jax.device_get(params)),
        opt_state=ocp.args.StandardSave(jax.device_get(opt_state))))
    mgr.wait_until_finished()
    return step


def latest_step(ckpt_dir):
    import orbax.checkpoint as ocp
    mgr = _manager(ckpt_dir)
    return mgr.latest_step()


def restore_state(ckpt_dir, params_template, opt_state_template):
    """Restore the latest checkpoint; returns (step, params, opt_state)
    or None if no checkpoint exists."""
    import orbax.checkpoint as ocp
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        return None
    restored = mgr.restore(step, args=ocp.args.Composite(
        params=ocp.args.StandardRestore(
            jax.device_get(params_template)),
        opt_state=ocp.args.StandardRestore(
            jax.device_get(opt_state_template))))
    return step, restored["params"], restored["opt_state"]
