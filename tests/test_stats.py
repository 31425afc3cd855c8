import numpy as np
import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.core import stats

jax.config.update("jax_enable_x64", True)


def test_masked_median_odd_even():
    v = jnp.asarray([5.0, 1.0, 3.0, 2.0, 4.0, 99.0, -7.0])
    m_all_off_last2 = jnp.asarray([1, 1, 1, 1, 1, 0, 0], bool)
    assert float(stats.masked_median(v, m_all_off_last2)) == 3.0  # odd n=5
    m4 = jnp.asarray([1, 1, 1, 1, 0, 0, 0], bool)
    assert float(stats.masked_median(v, m4)) == 2.5  # even n=4: (2+3)/2


def test_masked_median_matches_numpy_random():
    rng = np.random.default_rng(0)
    for n in [1, 2, 3, 10, 11, 64]:
        v = rng.normal(size=128)
        mask = np.zeros(128, bool)
        mask[rng.choice(128, size=n, replace=False)] = True
        got = float(stats.masked_median(jnp.asarray(v), jnp.asarray(mask)))
        want = float(np.median(v[mask]))
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_masked_scale_matches_reference_formula():
    rng = np.random.default_rng(1)
    v = rng.normal(size=101)
    mask = np.ones(101, bool)
    got = float(stats.masked_scale(jnp.asarray(v), jnp.asarray(mask)))
    med = np.median(v)
    want = 1.482602218505602 * np.median(np.abs(v - med))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_huber_and_derivative():
    k = 1.345
    e = jnp.asarray([0.0, 0.5, k * k - 1e-9, k * k + 1e-9, 10.0])
    h = np.asarray(stats.huber(e, k))
    np.testing.assert_allclose(h[0], 0.0)
    np.testing.assert_allclose(h[1], 0.5)
    np.testing.assert_allclose(h[4], 2 * k * np.sqrt(10.0) - k * k, rtol=1e-12)
    d = np.asarray(stats.huber_derivative(e, k))
    np.testing.assert_allclose(d[:3], 1.0)
    np.testing.assert_allclose(d[4], k / np.sqrt(10.0), rtol=1e-12)


def test_huber_derivative_no_nan_gradient():
    # The where-guard must keep gradients finite at e=0.
    g = jax.grad(lambda e: jnp.sum(stats.huber_derivative(e)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_bisect_scale_matches_lower_middle_oracle():
    """Bisection converges to the lower-middle order statistic; compare
    against a numpy oracle using exactly that convention, and require
    closeness to the averaged-middles reference scale."""
    rng = np.random.default_rng(2)
    for n in [5, 64, 1000]:
        v = rng.gamma(2.0, size=2048).astype(np.float32) * 10
        mask = np.zeros(2048, bool)
        mask[rng.choice(2048, size=n, replace=False)] = True

        def lower_median(x):
            s = np.sort(x)
            return s[(len(s) + 1) // 2 - 1]

        sel = v[mask]
        med = lower_median(sel)
        want = 1.482602218505602 * lower_median(np.abs(sel - med))
        fast = float(stats.masked_scale_bisect(jnp.asarray(v),
                                               jnp.asarray(mask)))
        assert abs(fast - want) <= max(1e-3 * abs(want), 1e-4), (n, want, fast)
        exact = float(stats.masked_scale(jnp.asarray(v), jnp.asarray(mask)))
        assert abs(fast - exact) <= 0.05 * abs(exact) + 1e-4, (n, exact, fast)
