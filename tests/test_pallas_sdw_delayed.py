"""Delayed-chunk fused SDW update kernel vs the scan path.

The delayed kernel (linalg/pallas_sdw_delayed; reference:
updateMethod=delayed, SURVEY.md SS3 "SDW model") must walk the SAME
Markov chain as the sequential scan path and the immediate kernel —
same RNG stream, same accept decisions, G equal to f32 roundoff. Runs
in interpret mode on CPU.
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
    (dict(opdim=3, fermion_repr="real_embed",
          spinProposalMethod="rotate_and_scale"), "rotate-and-scale"),
]


@pytest.mark.parametrize("kw,label", CASES, ids=[c[1] for c in CASES])
@pytest.mark.parametrize("delay", [2, 3, 16], ids=lambda d: f"K{d}")
def test_delayed_matches_scan(kw, label, delay):
    """delay=2/3 exercise multi-chunk + tail-chunk paths at N=4;
    delay=16 > N exercises the single-chunk clamp."""
    cfg_s = SDWConfig(L=2, beta=1.0, m=4, s=2, dtype="float32",
                      update_kernel="scan", **kw)
    cfg_d = SDWConfig(L=2, beta=1.0, m=4, s=2, dtype="float32",
                      update_kernel="delayed", delay=delay, **kw)
    ms, md = SDWModel(cfg_s), SDWModel(cfg_d)
    st = ms.init_state(jax.random.key(3))
    Gs, phis, accs = _run_slices(ms, st)
    Gd, phid, accd = _run_slices(md, st)
    assert float(jnp.abs(accs - accd)) < 1e-6, label
    np.testing.assert_allclose(np.asarray(phis), np.asarray(phid),
                               atol=2e-5, err_msg=label)
    np.testing.assert_allclose(np.asarray(Gs), np.asarray(Gd),
                               atol=2e-5, err_msg=label)


def test_delayed_matches_immediate_kernel():
    """Chunked vs immediate kernel on the same start state: identical
    chain (both phase-free embedded opdim-3), G to f32 roundoff."""
    kw = dict(L=2, opdim=3, r=0.5, beta=1.0, m=8, s=2, dtype="float32",
              fermion_repr="real_embed")
    mi = SDWModel(SDWConfig(update_kernel="pallas", **kw))
    md = SDWModel(SDWConfig(update_kernel="delayed", delay=2, **kw))
    st0 = mi.init_state(jax.random.key(9))
    sti, obsi = mi.sweep_pair(st0, measure=True)
    std, obsd = md.sweep_pair(st0, measure=True)
    np.testing.assert_allclose(np.asarray(sti.phi), np.asarray(std.phi),
                               atol=3e-5)
    assert float(jnp.abs(obsi.acceptance - obsd.acceptance)) < 1e-6
    np.testing.assert_allclose(float(obsi.phiSquared),
                               float(obsd.phiSquared), atol=1e-4)


def test_delayed_native_pair():
    """Native-complex representation through the delayed kernel: same
    chain as the immediate kernel's native path."""
    kw = dict(L=2, opdim=3, r=0.5, beta=1.0, m=4, s=2, dtype="float32",
              fermion_repr="native_pair")
    mi = SDWModel(SDWConfig(update_kernel="pallas", **kw))
    md = SDWModel(SDWConfig(update_kernel="delayed", delay=2, **kw))
    st0 = mi.init_state(jax.random.key(5))
    Gi, phii, acci = _run_slices(mi, st0)
    Gd, phid, accd = _run_slices(md, st0)
    assert float(jnp.abs(acci - accd)) < 1e-6
    np.testing.assert_allclose(np.asarray(phii), np.asarray(phid),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(Gi), np.asarray(Gd),
                               atol=2e-5)


def test_delayed_native_full_sweep_pair():
    """Native-pair representation through the whole nested-scan sweep
    machinery (pair stacks, wraps, stabilization) with the delayed
    kernel: same trajectory as the immediate kernel."""
    kw = dict(L=2, opdim=3, r=0.5, beta=1.0, m=4, s=2, dtype="float32",
              fermion_repr="native_pair")
    mi = SDWModel(SDWConfig(update_kernel="pallas", **kw))
    md = SDWModel(SDWConfig(update_kernel="delayed", delay=2, **kw))
    st0 = mi.init_state(jax.random.key(4))
    sti, obsi = mi.sweep_pair(st0, measure=True)
    std, obsd = md.sweep_pair(st0, measure=True)
    np.testing.assert_allclose(np.asarray(sti.phi), np.asarray(std.phi),
                               atol=3e-5)
    assert float(jnp.abs(obsi.acceptance - obsd.acceptance)) < 1e-6
    np.testing.assert_allclose(float(obsi.phiSquared),
                               float(obsd.phiSquared), atol=1e-4)
    assert float(std.green_dev) < 1e-3


def test_delayed_vmapped_walkers():
    """custom_vmap wrapper: a vmapped batch (padded to the 128-lane
    group) must equal per-walker runs."""
    kw = dict(L=2, opdim=2, beta=1.0, m=4, s=2, dtype="float32",
              fermion_repr="real_embed", update_kernel="delayed",
              delay=2)
    md = SDWModel(SDWConfig(**kw))
    keys = jax.random.split(jax.random.key(11), 3)
    states = jax.vmap(md.init_state)(keys)
    out = jax.vmap(
        lambda st: md.update_slice(st.G, st.phi, 1, st.key, st.phase,
                                   st.box_width))(states)
    Gb, phib = out[0], out[1]
    for w in range(3):
        st = jax.tree.map(lambda x: x[w], states)
        G1, phi1, _, _, acc1 = md.update_slice(
            st.G, st.phi, 1, st.key, st.phase, st.box_width)
        np.testing.assert_allclose(np.asarray(Gb[w]), np.asarray(G1),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(phib[w]),
                                   np.asarray(phi1), atol=2e-5)
