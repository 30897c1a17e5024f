"""Fused single-pass SDW wrap kernel (linalg/pallas_sdw_wrap) vs the
chained XLA wrap path: same math, one HBM round trip. Interpret mode on
CPU runs the exact program the TPU executes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detqmc_tpu.linalg.pallas_sdw_wrap import fused_wrap
from detqmc_tpu.models.sdw import SDWConfig, SDWModel


def _native_model(opdim, L=2, checkerboard=False):
    return SDWModel(SDWConfig(L=L, opdim=opdim, r=0.5, beta=1.0, m=4,
                              s=2, dtype="float32",
                              checkerboard=checkerboard,
                              fermion_repr="native_pair"))


@pytest.mark.parametrize("opdim", [2, 3], ids=["reduced-q2", "full-q4"])
@pytest.mark.parametrize("up", [True, False], ids=["up", "down"])
def test_fused_wrap_matches_xla(opdim, up):
    model = _native_model(opdim)
    h = model.dim
    key = jax.random.key(3)
    kg, kp = jax.random.split(key)
    G = jax.random.normal(kg, (2, h, h), dtype=jnp.float32)
    phi = jax.random.normal(kp, (model.cfg.n_sites, model.cfg.opdim),
                            dtype=jnp.float32)
    blocks = model.exp_v_blocks(phi)
    blocks_inv = model.exp_v_blocks(phi, sign=+1.0)
    ref = (model.wrap_up if up else model.wrap_down)(
        G, blocks, blocks_inv)
    out = fused_wrap(G, model.expK, model.expK_inv, blocks, blocks_inv,
                     up=up, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5 * max(scale, 1.0))


def test_fused_wrap_vmapped_and_checkerboard():
    """Batched walkers (the sweep's vmap) + the dense checkerboard
    product kinetic factor, round-trip up-then-down recovers G."""
    model = _native_model(3, L=4, checkerboard=True)
    h = model.dim
    W = 3
    key = jax.random.key(7)
    kg, kp = jax.random.split(key)
    G = jax.random.normal(kg, (W, 2, h, h), dtype=jnp.float32)
    phi = jax.random.normal(kp, (W, model.cfg.n_sites,
                                 model.cfg.opdim), dtype=jnp.float32)

    def one(g, p):
        b = model.exp_v_blocks(p)
        bi = model.exp_v_blocks(p, sign=+1.0)
        w = fused_wrap(g, model.expK, model.expK_inv, b, bi,
                       up=True, interpret=True)
        ref = model.wrap_up(g, b, bi)
        back = fused_wrap(w, model.expK, model.expK_inv, b, bi,
                          up=False, interpret=True)
        return w, ref, back

    w, ref, back = jax.vmap(one)(G, phi)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref),
                               atol=2e-5 * max(scale, 1.0))
    # B^-1 (B G B^-1) B == G up to f32 roundoff amplified by cond(B)
    np.testing.assert_allclose(np.asarray(back), np.asarray(G),
                               atol=5e-4 * max(float(jnp.abs(G).max()),
                                               1.0))


def test_wrap_kernel_knob_validation():
    with pytest.raises(ValueError):
        SDWConfig(L=2, opdim=1, beta=1.0, m=4, s=2, wrap_kernel="vpu")
    with pytest.raises(ValueError):
        # fused requires the native representation
        SDWModel(SDWConfig(L=2, opdim=3, beta=1.0, m=4, s=2,
                           dtype="float32", fermion_repr="real_embed",
                           wrap_kernel="fused"))


@pytest.mark.parametrize("opdim", [2, 3], ids=["reduced-q2", "full-q4"])
def test_fused_apply_left_matches_xla(opdim):
    """The fused one-sided B / B^H applies (absorb phase) against the
    chained XLA path, via the model's own dispatch (wrap_kernel=fused
    in interpret mode vs the default XLA model)."""
    kw = dict(L=2, opdim=opdim, r=0.5, beta=1.0, m=4, s=2,
              dtype="float32", fermion_repr="native_pair")
    m_xla = SDWModel(SDWConfig(**kw))
    m_fused = SDWModel(SDWConfig(**kw, wrap_kernel="fused"))
    assert not m_xla._wrap_fused and m_fused._wrap_fused
    h = m_xla.dim
    key = jax.random.key(11)
    kx, kp = jax.random.split(key)
    X = jax.random.normal(kx, (2, h, h), dtype=jnp.float32)
    phi = jax.random.normal(kp, (m_xla.cfg.n_sites, m_xla.cfg.opdim),
                            dtype=jnp.float32)
    blocks = m_xla.exp_v_blocks(phi)
    for name in ("b_mult_left", "bT_mult_left"):
        ref = getattr(m_xla, name)(blocks, X)
        out = getattr(m_fused, name)(blocks, X)
        scale = max(float(jnp.abs(ref).max()), 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5 * scale, err_msg=name)
    # non-square operands must fall through to the XLA path unchanged
    V = jax.random.normal(kx, (2, h, 3), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(m_fused.b_mult_left(blocks, V)),
        np.asarray(m_xla.b_mult_left(blocks, V)), atol=1e-6)
