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


def save_checkpoint(path: str, state, handler_state: Dict[str, np.ndarray],
                    manifest: Dict[str, Any]) -> None:
    """Atomically write `<path>.npz` + `<path>.json`."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    # minimal model state: field, key, sign, counters (stack/G rebuilt)
    arrays["field"] = np.asarray(state.field)
    arrays["key"] = np.asarray(jax.random.key_data(state.key))
    arrays["sign"] = np.asarray(state.sign)
    arrays["next_dir"] = np.asarray(state.next_dir)
    arrays["sweeps_done"] = np.asarray(state.sweeps_done)
    # model-specific extras (e.g. SDW phi-field proposal widths)
    for name in getattr(state, "_checkpoint_extras", ()):  # pragma: no cover
        arrays[name] = np.asarray(getattr(state, name))
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
    state = {k: v for k, v in arrays.items() if not k.startswith("obs/")}
    return state, handler, manifest
