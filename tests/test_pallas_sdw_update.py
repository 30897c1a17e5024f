"""Fused SDW slice-update kernel vs the sequential scan path.

Both paths must walk the SAME Markov chain (identical RNG stream,
identical accept decisions) — the SDW analogue of the Hubbard kernel
identical-chain tests. Runs the Pallas kernel in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detqmc_tpu.models.sdw import SDWConfig, SDWModel


def _run_slices(model, state, n_slices=3):
    G, phi, key, ph = state.G, state.phi, state.key, state.phase
    acc = None
    for l in range(1, n_slices + 1):
        G, phi, key, ph, acc = model.update_slice(
            G, phi, l, key, ph, state.box_width)
    return G, phi, acc


CASES = [
    (dict(opdim=3, fermion_repr="real_embed"), "opdim3-embed-q4"),
    (dict(opdim=2, fermion_repr="real_embed"), "opdim2-embed-q2"),
    (dict(opdim=1), "opdim1-real-q2"),
    (dict(opdim=2, fermion_repr="complex"), "opdim2-complex-q2"),
    (dict(opdim=3, fermion_repr="real_embed",
          spinProposalMethod="rotate_and_scale"), "rotate-and-scale"),
    (dict(opdim=2, fermion_repr="real_embed",
          spinProposalMethod="rotate_then_scale"), "rotate-then-scale"),
]


@pytest.mark.parametrize("kw,label", CASES, ids=[c[1] for c in CASES])
def test_kernel_matches_scan(kw, label):
    cfg_s = SDWConfig(L=2, beta=1.0, m=4, s=2, dtype="float32",
                      update_kernel="scan", **kw)
    cfg_p = SDWConfig(L=2, beta=1.0, m=4, s=2, dtype="float32",
                      update_kernel="pallas", **kw)
    ms, mp = SDWModel(cfg_s), SDWModel(cfg_p)
    st = ms.init_state(jax.random.key(3))
    Gs, phis, accs = _run_slices(ms, st)
    Gp, phip, accp = _run_slices(mp, st)
    # identical chain: same accepts, same field, G to f32 roundoff
    assert float(jnp.abs(accs - accp)) < 1e-6, label
    np.testing.assert_allclose(np.asarray(phis), np.asarray(phip),
                               atol=2e-5, err_msg=label)
    np.testing.assert_allclose(np.asarray(Gs), np.asarray(Gp),
                               atol=2e-5, err_msg=label)


def test_kernel_full_sweep_pair_matches_scan():
    """Whole sweep pairs through the nested-scan sweep machinery: the
    kernel path must produce the same trajectory and observables."""
    kw = dict(L=2, opdim=3, r=0.5, beta=1.0, m=8, s=2, dtype="float32",
              fermion_repr="real_embed")
    ms = SDWModel(SDWConfig(update_kernel="scan", **kw))
    mp = SDWModel(SDWConfig(update_kernel="pallas", **kw))
    st0 = ms.init_state(jax.random.key(9))
    sts, obss = ms.sweep_pair(st0, measure=True)
    stp, obsp = mp.sweep_pair(st0, measure=True)
    np.testing.assert_allclose(np.asarray(sts.phi), np.asarray(stp.phi),
                               atol=3e-5)
    assert float(jnp.abs(obss.acceptance - obsp.acceptance)) < 1e-6
    np.testing.assert_allclose(float(obss.phiSquared),
                               float(obsp.phiSquared), atol=1e-4)


def test_kernel_vmapped_walkers():
    """custom_vmap wrapper: a vmapped batch (padding to the 128-lane
    group) must equal per-walker runs."""
    kw = dict(L=2, opdim=2, beta=1.0, m=4, s=2, dtype="float32",
              fermion_repr="real_embed", update_kernel="pallas")
    mp = SDWModel(SDWConfig(**kw))
    keys = jax.random.split(jax.random.key(11), 3)
    states = jax.vmap(mp.init_state)(keys)

    def one(st):
        G, phi, key, ph, acc = mp.update_slice(
            st.G, st.phi, 1, st.key, st.phase, st.box_width)
        return G, phi, acc

    Gb, phib, accb = jax.vmap(one)(states)
    for w in range(3):
        st = jax.tree.map(lambda a: a[w], states)
        Gw, phiw, accw = one(st)
        np.testing.assert_allclose(np.asarray(Gb[w]), np.asarray(Gw),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(phib[w]), np.asarray(phiw),
                                   atol=2e-5)
        assert float(jnp.abs(accb[w] - accw)) < 1e-6


@pytest.mark.slow
def test_kernel_large_h_chunked_update_matches_scan():
    """h = 144 > 128 exercises the rb = 32 chunked G update (the register
    -spill guard for science-scale dims) and the rolled fori_loop site
    body (N = 36 > 16) in one config: L = 6 full opdim-3, native pair
    kernel (interpret) vs the complex scan path on the same RNG stream."""
    kw = dict(L=6, opdim=3, r=0.5, beta=0.5, m=2, s=2, dtype="float32")
    ms = SDWModel(SDWConfig(update_kernel="scan",
                            fermion_repr="complex", **kw))
    mn = SDWModel(SDWConfig(update_kernel="pallas",
                            fermion_repr="native_pair", **kw))
    st = ms.init_state(jax.random.key(5))
    Gs, phis, accs = _run_slices(ms, st, n_slices=2)
    stn = mn.init_state(jax.random.key(5))
    np.testing.assert_allclose(np.asarray(st.phi), np.asarray(stn.phi),
                               atol=0)
    Gn, phin, accn = _run_slices(mn, stn, n_slices=2)
    assert float(jnp.abs(accs - accn)) < 1e-6
    np.testing.assert_allclose(np.asarray(phis), np.asarray(phin),
                               atol=2e-5)
    # native pair G vs complex-scan G
    Gre = np.real(np.asarray(Gs))
    Gim = np.imag(np.asarray(Gs))
    np.testing.assert_allclose(np.asarray(Gn[0]), Gre, atol=5e-4)
    np.testing.assert_allclose(np.asarray(Gn[1]), Gim, atol=5e-4)
