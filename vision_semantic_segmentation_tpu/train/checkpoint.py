"""Checkpoint/resume on Orbax.

Rebuild of `/root/reference/src/network/core/utils/checkpoint.py:6-129`
with the same contract — named checkpoints, a ``last_checkpoint`` pointer
file, AUTO_RESUME / RESUME_STATES semantics, best-metric tracking — but
saving the functional TrainState (params + BN stats + optimizer state +
PRNG key + step) through ``orbax.checkpoint``, which handles sharded
arrays and atomic directory commits.
"""
from __future__ import annotations

import logging
import os
import os.path as osp
from typing import Any, Dict, Optional

import json

import numpy as np
import orbax.checkpoint as ocp


class Checkpoint:
    """Named-checkpoint manager with a ``last_checkpoint`` pointer."""

    def __init__(self, state, save_dir: str = ".", logger=None):
        self.save_dir = osp.abspath(save_dir)
        self.logger = logger or logging.getLogger(__name__)
        self.state = state
        self._checkpointer = ocp.StandardCheckpointer()
        # (path, extras) of an in-flight non-blocking save, else None
        self._pending = None

    # -- save ----------------------------------------------------------------
    def save(self, filename: str, block: bool = True, **kwargs) -> None:
        """Save the current state (+ extras) under ``save_dir/filename``.

        ``block=False`` returns as soon as Orbax has snapshotted the
        arrays (its async save copies device buffers out before
        returning, so the caller may keep training — including donating
        the state to the next dispatch — while serialization and the
        disk write proceed on Orbax's background thread).  The
        ``last_checkpoint`` pointer and the extras side-file are only
        written when the save COMMITS — at the next :meth:`save`/
        :meth:`load`, or an explicit :meth:`finish` — so the pointer can
        never reference a torn checkpoint.  At most one save is in
        flight: a new save first drains the previous one.

        Re-saving an existing name (e.g. ``model_latest`` every epoch)
        writes a fresh ``.vN`` sibling and retires the old directory
        only after the pointer flips, so resolve checkpoints through
        the pointer (:meth:`get_checkpoint_file`), not by literal
        directory name.
        """
        if not self.save_dir or not filename:
            self.logger.warning("Invalid save directory or filename")
            return
        self.finish()  # at most one in-flight save
        os.makedirs(self.save_dir, exist_ok=True)
        path = osp.join(self.save_dir, filename)

        # NEVER write into an existing committed directory: Orbax's
        # force=True save rmtree's the destination at ISSUE time and only
        # renames the replacement in at commit, so for the whole write
        # window (a full epoch with block=False) the last_checkpoint
        # pointer would name a deleted directory — a crash there loses
        # the resume point.  Overwrites divert to a fresh versioned
        # sibling instead; the pointer flips only after the write
        # commits, and the superseded director(ies) are removed after
        # the flip.  The pointer therefore always names an intact,
        # fully-committed checkpoint.
        replaced = self._existing_versions(path)
        if replaced:
            k = 1
            while osp.exists(f"{path}.v{k}"):
                k += 1
            path = f"{path}.v{k}"

        payload = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "rng": self.state.rng,
        }
        self.logger.info(f"Saving checkpoint to {path}")
        self._checkpointer.save(path, payload, force=True)
        if block:
            self._checkpointer.wait_until_finished()
            self._finalize(path, kwargs, replaced)
        else:
            self._pending = (path, dict(kwargs), replaced)

    def _existing_versions(self, path: str) -> list:
        """Committed directories holding ``path``'s checkpoint — the plain
        name plus any ``.vN`` siblings from earlier overwrites — ordered
        oldest-first (plain, then ascending N)."""
        import glob
        import re

        def _ver(p):
            m = re.fullmatch(re.escape(path) + r"\.v(\d+)", p)
            return int(m.group(1)) if m else 0

        out = [p for p in [path] + glob.glob(path + ".v*")
               if osp.isdir(p)
               and re.fullmatch(re.escape(path) + r"(\.v\d+)?", p)]
        return sorted(out, key=_ver)

    def _finalize(self, path: str, extras: Dict[str, Any], replaced=()) -> None:
        # extras (arbitrary scalars, e.g. best_metric) ride in a side file
        with open(path + ".extras.json", "w") as f:
            json.dump({k: float(np.asarray(v)) for k, v in extras.items()}, f)
        self.update_last_checkpoint(path)
        # only after the pointer names the new checkpoint: retire the
        # superseded version(s) of this filename
        import shutil

        for old in replaced:
            shutil.rmtree(old, ignore_errors=True)
            try:
                os.remove(old + ".extras.json")
            except OSError:
                pass

    def finish(self) -> None:
        """Drain an in-flight non-blocking save and commit its pointer.

        No-op when nothing is pending.  A failed background write raises
        here (from Orbax's ``wait_until_finished``), surfacing at the
        first point the caller depends on the checkpoint existing.
        """
        if self._pending is None:
            return
        path, extras, replaced = self._pending
        self._pending = None
        self._checkpointer.wait_until_finished()
        self._finalize(path, extras, replaced)

    # -- load ----------------------------------------------------------------
    def load(
        self,
        filename: Optional[str] = None,
        resume: bool = True,
        resume_states: bool = True,
    ) -> Dict[str, Any]:
        """Load a checkpoint; returns any extra data saved with it.

        Args mirror the reference (ref checkpoint.py:66-100): ``resume``
        prefers the last_checkpoint pointer over ``filename``;
        ``resume_states`` restores optimizer/step/rng as well as weights.
        """
        self.finish()  # a pending save must commit before we read the pointer
        if resume and self.has_checkpoint():
            filename = self.get_checkpoint_file()
        if not filename:
            self.logger.info("No checkpoint found. Initializing model from scratch")
            return {}
        if not osp.isabs(filename) and not osp.exists(filename):
            # bare names resolve under save_dir (cwd-relative paths, e.g.
            # MODEL.WEIGHT, keep working when they exist)
            cand = osp.join(self.save_dir, filename)
            if osp.exists(cand) or self._existing_versions(cand):
                filename = cand
        if not osp.exists(filename):
            # an explicitly-named checkpoint may live under a ``.vN``
            # sibling after overwrites (see save); load the newest
            versions = self._existing_versions(filename)
            if versions:
                filename = versions[-1]
        self.logger.info(f"Loading checkpoint from {filename}")

        template = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "rng": self.state.rng,
        }
        restored = self._checkpointer.restore(filename, template)

        updates = {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
        if resume_states:
            updates.update(
                opt_state=restored["opt_state"],
                step=restored["step"],
                rng=restored["rng"],
            )
        self.state = self.state.replace(**updates)
        extras = {}
        if resume_states and osp.exists(filename + ".extras.json"):
            with open(filename + ".extras.json") as f:
                extras = json.load(f)
        return extras

    # -- pointer file (ref checkpoint.py:102-129) ----------------------------
    def has_checkpoint(self) -> bool:
        return osp.exists(osp.join(self.save_dir, "last_checkpoint"))

    def get_checkpoint_file(self) -> str:
        pointer = osp.join(self.save_dir, "last_checkpoint")
        try:
            with open(pointer) as f:
                last_saved = f.read().strip()
            if last_saved and not osp.isabs(last_saved):
                last_saved = osp.join(self.save_dir, last_saved)
        except IOError:
            last_saved = ""
        return last_saved

    def update_last_checkpoint(self, last_filename: str) -> None:
        # the pointer file always stores a bare filename relative to
        # save_dir (get_checkpoint_file re-joins it)
        with open(osp.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(osp.basename(last_filename))
