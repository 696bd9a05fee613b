"""Pallas exclusive-scan kernel vs the host oracle (the reference's CPU scan
validator recurrence, ComputeBufferSorter.cs:256-271)."""
import jax.numpy as jnp
import numpy as np
import pytest

from unitysimpleraytracing_tpu.ops import scan_pallas


@pytest.mark.parametrize("n", [1024, 4096, 131072, 5000, 1])
def test_exclusive_scan_int(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 9, size=n).astype(np.int32)
    got = np.asarray(scan_pallas.exclusive_scan(jnp.asarray(x)))
    np.testing.assert_array_equal(got, scan_pallas.exclusive_scan_reference(x))
    assert got.dtype == np.int32


def test_exclusive_scan_histogram_shape():
    # The sort's actual use: 256-bucket x nblocks transposed histogram.
    rng = np.random.default_rng(0)
    hist = rng.integers(0, 1024, size=(256, 64)).astype(np.int32)
    flat = hist.reshape(-1)
    got = np.asarray(scan_pallas.exclusive_scan(jnp.asarray(flat)))
    np.testing.assert_array_equal(got, scan_pallas.exclusive_scan_reference(flat))


def test_exclusive_scan_float():
    rng = np.random.default_rng(1)
    x = rng.normal(size=4096).astype(np.float32)
    got = np.asarray(scan_pallas.exclusive_scan(jnp.asarray(x)))
    want = np.concatenate([[0.0], np.cumsum(x.astype(np.float64))[:-1]])
    np.testing.assert_allclose(got, want, atol=1e-3)
