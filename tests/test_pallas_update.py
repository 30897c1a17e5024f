"""Pallas fused slice-update kernel vs the lax.scan reference path.

Runs in interpreter mode on CPU (tests force the cpu backend); the TPU
compiled path is exercised by bench.py and the driver verification runs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from detqmc_tpu.linalg.pallas_update import slice_update
from detqmc_tpu.models.hubbard import HubbardConfig, HubbardModel


def test_pallas_slice_update_matches_scan():
    cfg = HubbardConfig(L=4, U=4.0, beta=4.0, m=40, s=8, dtype="float32",
                        stab_dtype="float32")
    model = HubbardModel(cfg)
    state = model.init_state(jax.random.key(0))
    G = state.G
    fl = state.field[7]
    u01 = jax.random.uniform(jax.random.key(3), (16,), dtype=jnp.float32)
    sign = jnp.ones((), jnp.float32)

    G1, f1, s1, a1 = model.update_slice(G, fl, u01, sign)  # scan path (cpu)
    G2, f2, s2, a2 = slice_update(G, fl, u01, sign, alpha=cfg.alpha,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert float(a1) == float(a2)
    assert float(s1) == float(s2)
    np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), atol=1e-5)


def test_lanes_slice_update_matches_scan():
    """Lane-batched layout (pallas_update_lanes) vs the scan reference —
    identical accept decisions, G to f32 tolerance, including the
    batch-padding path (W not a multiple of 128) and ph mode."""
    from detqmc_tpu.linalg.pallas_update_lanes import (
        slice_update as lanes_update)

    for ph in ("off", "on"):
        cfg = HubbardConfig(L=4, U=4.0, beta=4.0, m=40, s=8,
                            dtype="float32", stab_dtype="float32",
                            ph_symmetry=ph)
        model = HubbardModel(cfg)
        keys = jax.random.split(jax.random.key(2), 3)
        states = jax.vmap(model.init_state)(keys)
        u01 = jax.random.uniform(jax.random.key(5), (3, 16),
                                 dtype=jnp.float32)
        signs = jnp.ones((3,), jnp.float32)
        fls = states.field[:, 3]
        G1, f1, s1, a1 = jax.vmap(model.update_slice)(
            states.G, fls, u01, signs)
        G2, f2, s2, a2 = jax.vmap(lambda g, f, u, s: lanes_update(
            g, f, u, s, alpha=cfg.alpha, interpret=True))(
                states.G, fls, u01, signs)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
        np.testing.assert_allclose(np.asarray(G1), np.asarray(G2),
                                   atol=1e-5)


def test_pallas_slice_update_vmap():
    cfg = HubbardConfig(L=4, U=4.0, beta=4.0, m=40, s=8, dtype="float32",
                        stab_dtype="float32")
    model = HubbardModel(cfg)
    keys = jax.random.split(jax.random.key(1), 3)
    states = jax.vmap(model.init_state)(keys)
    u01 = jax.random.uniform(jax.random.key(4), (3, 16), dtype=jnp.float32)
    signs = jnp.ones((3,), jnp.float32)
    fls = states.field[:, 5]

    scan_fn = jax.vmap(model.update_slice)
    pal_fn = jax.vmap(lambda g, f, u, s: slice_update(
        g, f, u, s, alpha=cfg.alpha, interpret=True))
    G1, f1, s1, a1 = scan_fn(states.G, fls, u01, signs)
    G2, f2, s2, a2 = pal_fn(states.G, fls, u01, signs)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_allclose(np.asarray(G1), np.asarray(G2), atol=1e-5)
