"""Persistent XLA compilation cache setup.

This environment compiles TPU programs through a single-core AOT helper;
full sweep programs take minutes to compile. Enabling jax's persistent
cache makes every program compile once per (HLO, flags) — subsequent
process launches (driver runs, bench.py, tests) reuse the artifact.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.expanduser("~/.cache/detqmc_tpu_jax")


def enable(path: str | None = None) -> None:
    if jax.config.jax_compilation_cache_dir:
        return
    path = path or os.environ.get("DETQMC_TPU_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
