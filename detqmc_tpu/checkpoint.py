"""Checkpoint / resume: flat npz of the minimal resumable state.

Reference parity: SURVEY.md §6 "Checkpoint / resume" — the reference
serializes field configuration, RNG state, sweep counters and observable
accumulators (boost archives); Green's function and UdV stacks are
reconstructed from the field on load. We keep exactly that contract:
``refresh_from_field`` rebuilds G + stacks, so checkpoints are small,
dtype/layout-agnostic, and bitwise-resumable (threefry keys are plain
uint32 arrays).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# state leaves that are cheap to rebuild from the field configuration and
# are therefore never serialized (reference behavior: G and the UdV stacks
# are reconstructed on load, SURVEY.md §6)
RECOMPUTED = ("G", "stack", "stack_U", "stack_d", "stack_V",
              "green_dev", "sv_min", "sv_max")


def save_checkpoint(path: str, state, handler_state: Dict[str, np.ndarray],
                    manifest: Dict[str, Any]) -> None:
    """Atomically write `<path>.npz` + `<path>.json`.

    Model-agnostic: every NamedTuple field of the walker state except the
    RECOMPUTED ones is saved by name (Hubbard: field/sign/...; SDW:
    phi/phase/box_width/r/...). PRNG keys are stored as raw key data.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    for name in state._fields:
        if name in RECOMPUTED:
            continue
        value = getattr(state, name)
        if name == "key":
            value = jax.random.key_data(value)
        arrays[f"st/{name}"] = np.asarray(value)
    for k, v in handler_state.items():
        arrays[f"obs/{k}"] = v
    tmp = f"{path}.npz.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, f"{path}.npz")
    tmpj = f"{path}.json.tmp"
    with open(tmpj, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmpj, f"{path}.json")


def load_checkpoint(path: str) -> Optional[Tuple[Dict[str, np.ndarray],
                                                 Dict[str, np.ndarray],
                                                 Dict[str, Any]]]:
    """Returns (state arrays, handler arrays, manifest) or None."""
    if not (os.path.exists(f"{path}.npz") and os.path.exists(f"{path}.json")):
        return None
    with np.load(f"{path}.npz") as z:
        arrays = {k: z[k] for k in z.files}
    with open(f"{path}.json") as f:
        manifest = json.load(f)
    handler = {k[len("obs/"):]: v for k, v in arrays.items()
               if k.startswith("obs/")}
    state = {k[len("st/"):]: v for k, v in arrays.items()
             if k.startswith("st/")}
    return state, handler, manifest


def restore_state(blank, arrays: Dict[str, np.ndarray]):
    """Rebuild a walker-state NamedTuple from saved arrays: saved leaves
    replace the blank's (dtype-cast to match); RECOMPUTED leaves keep the
    blank's values until the model's refresh_from_field runs."""
    import jax.numpy as jnp

    updates = {}
    for name, arr in arrays.items():
        ref = getattr(blank, name)
        if name == "key":
            updates[name] = jax.random.wrap_key_data(jnp.asarray(arr))
        else:
            updates[name] = jnp.asarray(arr, ref.dtype)
    return blank._replace(**updates)
