"""Native-complex SDW chain (fermion_repr="native_pair") vs the real
embedding: identical Markov chains, matching Greens, working sweeps.

Runs the complex Pallas kernels in interpret mode on CPU — the exact
program the TPU executes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detqmc_tpu.models.sdw import SDWConfig, SDWModel


@pytest.mark.parametrize("opdim", [2, 3], ids=["reduced-O2", "full-O3"])
def test_native_matches_embedded_chain(opdim):
    kw = dict(L=2, opdim=opdim, r=0.5, beta=1.0, m=4, s=2,
              dtype="float32")
    me = SDWModel(SDWConfig(fermion_repr="real_embed",
                            update_kernel="pallas", **kw))
    mn = SDWModel(SDWConfig(fermion_repr="native_pair", **kw))
    key = jax.random.key(5)
    se = me.init_state(key)
    sn = mn.init_state(key)
    h = mn.dim
    Ge = np.asarray(se.G)
    Gn = np.asarray(sn.G)
    np.testing.assert_allclose(Ge[:h, :h], Gn[0], atol=2e-6)
    np.testing.assert_allclose(Ge[h:, :h], Gn[1], atol=2e-6)
    se2, oe = me.sweep_pair(se, measure=True)
    sn2, on = mn.sweep_pair(sn, measure=True)
    # identical chain: same RNG stream, same accepts, same field
    np.testing.assert_array_equal(np.asarray(se2.phi),
                                  np.asarray(sn2.phi))
    assert float(jnp.abs(oe.acceptance - on.acceptance)) < 1e-7
    assert float(sn2.green_dev) < 1e-4
    for name in ("occupancy", "kineticEnergy", "phiSquared",
                 "spinZStructureFactor"):
        a = np.asarray(getattr(oe, name))
        b = np.asarray(getattr(on, name))
        np.testing.assert_allclose(a, b, atol=5e-5, err_msg=name)


def test_native_global_moves_and_time_displaced():
    cfg = SDWConfig(L=2, opdim=2, r=0.8, beta=1.0, m=4, s=2,
                    dtype="float32", fermion_repr="native_pair",
                    globalShift=True)
    mn = SDWModel(cfg)
    st = mn.init_state(jax.random.key(7))
    st2, accepted = mn.attempt_global_shift(st)
    assert np.isfinite(np.asarray(st2.phi)).all()
    # time-displaced via the rho fallback returns pair matrices
    G_tau = mn.time_displaced_greens(st.phi)
    assert G_tau.shape == (cfg.n_stack + 1, 2, mn.dim, mn.dim)
    # tau=0 entry equals the equal-time G
    np.testing.assert_allclose(np.asarray(G_tau[0]), np.asarray(st.G),
                               atol=5e-5)
    gk, dev = mn.measure_time_displaced(st, per_slice=True)
    assert np.asarray(gk).shape == (cfg.m + 1, cfg.n_sites)
    assert float(dev) < 1e-3
    # pairing susceptibilities through the native pair planes must match
    # the full-complex representation on the same phi (oracle-tested in
    # test_time_displaced.py; this pins the (re, im)-plane path)
    _, _, ps_n, pd_n = mn.measure_time_displaced(
        st, per_slice=True, susceptibilities=True)
    mc = SDWModel(SDWConfig(L=2, opdim=2, r=0.8, beta=1.0, m=4, s=2,
                            dtype="float32", globalShift=True))
    stc = mc.refresh_from_field(mc.init_state(jax.random.key(7)))
    _, _, ps_c, pd_c = mc.measure_time_displaced(
        stc._replace(phi=st.phi), per_slice=True, susceptibilities=True)
    np.testing.assert_allclose(float(ps_n), float(ps_c), atol=2e-4)
    np.testing.assert_allclose(float(pd_n), float(pd_c), atol=2e-3)


@pytest.mark.slow
def test_native_vs_embed_statistics_short_chain():
    """A longer identical-chain run: 2 sweep pairs stay bit-identical in
    the field (accept decisions never diverge at these sizes)."""
    kw = dict(L=2, opdim=3, r=0.5, beta=1.0, m=6, s=3, dtype="float32")
    me = SDWModel(SDWConfig(fermion_repr="real_embed",
                            update_kernel="pallas", **kw))
    mn = SDWModel(SDWConfig(fermion_repr="native_pair", **kw))
    key = jax.random.key(11)
    se, sn = me.init_state(key), mn.init_state(key)
    for _ in range(2):
        se, _ = me.sweep_pair(se, measure=False)
        sn, _ = mn.sweep_pair(sn, measure=False)
    np.testing.assert_array_equal(np.asarray(se.phi), np.asarray(sn.phi))
