"""Checkpoint / resume via orbax.

TPU-native replacement for the reference's three checkpoint mechanisms
(SURVEY.md section 5): accelerate ``save_state`` dirs with rotation
(train_AR.py:559-613, 1096-1135), best-val epoch dirs
(train_encdec.py:1024-1062), and Ray per-component .pt files. Here one
orbax CheckpointManager stores the full TrainState pytree (params,
optimizer state, EMA, step) with retention rotation; ``load_weights_only``
restores parameters without optimizer state (the reference's
``--load_weights_only``, train_AR.py:815-831).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def make_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(directory, options=options)


def save_state(mgr: ocp.CheckpointManager, step: int, state: Any,
               wait: bool = False) -> None:
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()


def restore_state(mgr: ocp.CheckpointManager, template: Any,
                  step: Optional[int] = None) -> Any:
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError("no checkpoint found")
    return mgr.restore(step, args=ocp.args.StandardRestore(template))


def save_params(directory: str, params: Any) -> None:
    """Standalone parameter snapshot (diffusers save_pretrained analogue)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), params)
    ckptr.wait_until_finished()


def load_params(directory: str, template: Optional[Any] = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(directory), target=template)
    return ckptr.restore(os.path.abspath(directory))
