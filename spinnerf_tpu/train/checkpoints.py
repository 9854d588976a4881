"""Checkpointing via orbax: {step, params, opt_state} with auto-resume.

Parity: the reference saves `.tar` dicts every `i_weights` and auto-resumes
from the newest one found in the experiment dir
(`DS_NeRF/run_nerf.py:443-461,1626-1636`); notably its hash-grid path
*disables* reload (`:545-547`) — here every field type checkpoints the same
way. Doubles as crash recovery (SURVEY §5).
"""
from __future__ import annotations

import os
from pathlib import Path

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper around orbax CheckpointManager with the framework layout."""

    def __init__(self, exp_dir, *, max_to_keep: int = 3,
                 save_interval: int = 10000):
        self.dir = Path(exp_dir) / "checkpoints"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_interval = save_interval
        self._mgr = ocp.CheckpointManager(
            self.dir.resolve(),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def maybe_save(self, step: int, params, opt_state, force: bool = False):
        if force or (self.save_interval and step % self.save_interval == 0
                     and step > 0):
            self._mgr.save(step, args=ocp.args.StandardSave(
                {"params": params, "opt_state": opt_state}))
            return True
        return False

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, step=None, *, like=None):
        """Restore (step, {"params", "opt_state"}). `like` provides the target
        pytree structure (pass the freshly-initialized state)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None, None
        if like is not None:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(like))
        else:
            restored = self._mgr.restore(step)
        return step, restored

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def restore_from_path(path, *, like=None):
    """Resolve `--ft_path` (`run_nerf.py:1151-1157`: an explicit weights file
    overrides the exp dir's own checkpoint scan). Accepts an experiment dir,
    its `checkpoints/` dir, or a stripped `params_N` dump written by
    `strip_checkpoint`.

    Returns (step, {"params": ..., "opt_state": ... | None}); opt_state is
    None for params-only dumps (caller keeps its fresh optimizer state — the
    reference likewise fine-tunes with a fresh optimizer when loading npy
    weights).
    """
    import re

    p = Path(path).resolve()
    if not p.exists():
        raise FileNotFoundError(f"--ft_path {p} does not exist")
    if (p / "checkpoints").is_dir():
        return CheckpointManager(p).restore(like=like)
    if p.name == "checkpoints" and p.is_dir():
        return CheckpointManager(p.parent).restore(like=like)
    # stripped params-only dump (StandardCheckpointer layout)
    ckptr = ocp.StandardCheckpointer()
    if like is not None and "params" in like:
        params = ckptr.restore(p, like["params"])
    else:
        params = ckptr.restore(p)
    m = re.search(r"(\d+)$", p.name)
    return (int(m.group(1)) if m else 0), {"params": params,
                                           "opt_state": None}


def strip_checkpoint(exp_dir, out_dir, *, step=None):
    """Write a distribution checkpoint containing only the parameters
    (parity: `lama/bin/make_checkpoint.py` — strip optimizer/training state).
    Returns (step, out_path)."""
    import orbax.checkpoint as ocp

    src = CheckpointManager(exp_dir)
    step, restored = src.restore(step)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {exp_dir}")
    out = Path(out_dir).resolve()
    out.mkdir(parents=True, exist_ok=True)
    dst = out / f"params_{step}"
    if dst.exists():
        import shutil
        shutil.rmtree(dst)   # re-running the strip overwrites
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dst, restored["params"])
    ckptr.wait_until_finished()
    return step, dst
