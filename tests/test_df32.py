"""df32 (double-single f32) arithmetic vs float64 reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detqmc_tpu.linalg import df32


def _rand(key, shape, scale=1.0):
    return (jax.random.normal(key, shape, dtype=jnp.float64) * scale)


@pytest.mark.parametrize("op,ref", [
    (df32.add, lambda a, b: a + b),
    (df32.sub, lambda a, b: a - b),
    (df32.mul, lambda a, b: a * b),
    (df32.div, lambda a, b: a / b),
])
def test_binary_ops(op, ref):
    key = jax.random.key(0)
    a64 = _rand(key, (256,), 3.0)
    b64 = _rand(jax.random.fold_in(key, 1), (256,), 2.0) + 4.0
    a = df32.from_f64(a64)
    b = df32.from_f64(b64)
    out = df32.to_f64(op(a, b))
    expected = ref(a64, b64)
    # error relative to operand magnitude (a+b may cancel to ~0)
    scale = np.maximum(np.abs(a64) + np.abs(b64), 1e-30)
    rel = np.abs(out - expected) / scale
    assert rel.max() < 1e-13, rel.max()


def test_sqrt():
    x64 = jnp.abs(_rand(jax.random.key(2), (128,), 10.0)) + 1e-6
    out = df32.to_f64(df32.sqrt(df32.from_f64(x64)))
    rel = np.abs(out - np.sqrt(x64)) / np.sqrt(x64)
    assert rel.max() < 1e-13


def test_recip_wide_range():
    x64 = jnp.concatenate([10.0 ** jnp.linspace(-20, 20, 100),
                           -(10.0 ** jnp.linspace(-20, 20, 100))])
    out = df32.to_f64(df32.recip(df32.from_f64(x64)))
    rel = np.abs(out - 1.0 / x64) * np.abs(x64)
    assert rel.max() < 1e-13


def test_reduce_last_cancellation():
    """Compensated reduction keeps accuracy under heavy cancellation."""
    rng = np.random.default_rng(0)
    big = rng.normal(0, 1e6, 64)
    x64 = jnp.asarray(np.concatenate([big, -big])[rng.permutation(128)]
                      + rng.normal(0, 1.0, 128))
    a = df32.from_f64(x64[None, :])
    s = df32.to_f64(df32.reduce_last(a, 128))[0, 0]
    expected = float(np.sum(np.asarray(x64, np.float64)))
    # f32 naive sum would err ~1e-1 here; df32 keeps ~1e-7 absolute
    assert abs(s - expected) < 1e-5


def test_reduce_axis2():
    x64 = _rand(jax.random.key(3), (3, 17, 5), 2.0)
    a = df32.from_f64(x64)
    s = df32.to_f64(df32.reduce_axis2(a, 17))
    np.testing.assert_allclose(np.asarray(s)[:, 0, :],
                               np.asarray(x64.sum(axis=-2)), rtol=1e-12)


def test_dot_product_ill_conditioned():
    """df32 dot resolves what f32 cannot."""
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 64) * np.exp(np.linspace(-10, 10, 64))
    y = rng.normal(0, 1, 64) * np.exp(np.linspace(10, -10, 64))
    x64, y64 = jnp.asarray(x), jnp.asarray(y)
    prod = df32.mul(df32.from_f64(x64[None]), df32.from_f64(y64[None]))
    s = df32.to_f64(df32.reduce_last(prod, 64))[0, 0]
    expected = float(np.dot(x, y))
    naive32 = float(np.dot(x.astype(np.float32), y.astype(np.float32)))
    assert abs(s - expected) <= abs(naive32 - expected) / 10 + 1e-10
    assert abs(s - expected) / abs(expected) < 1e-12
