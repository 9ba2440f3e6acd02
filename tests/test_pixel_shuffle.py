"""pixel (un)shuffle must match torch channel ordering exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from ladcast_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle


def test_pixel_unshuffle_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 4, 6).astype(np.float32)  # NCHW
    want = F.pixel_unshuffle(torch.from_numpy(x), 2).numpy()
    got = pixel_unshuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), want)


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(2, 12, 4, 6).astype(np.float32)
    want = F.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    got = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), want)


def test_roundtrip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 5).astype(np.float32))
    y = pixel_shuffle(pixel_unshuffle(x, 2), 2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
