"""Sphere padding / convolution tests.

Includes the golden worked example from the reference docstring
(sphere_conv.py:141-172) and randomized cross-checks against the reference
PyTorch implementation loaded directly from /root/reference (torch-only
module, no diffusers dependency).
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladcast_tpu.ops.sphere import (
    sphere_conv2d,
    sphere_conv2d_reference_3slice,
    sphere_pad,
)

REF_PATH = "/root/reference/ladcast/models/sphere_conv.py"


def _load_reference_sphere_conv():
    spec = importlib.util.spec_from_file_location("ref_sphere_conv", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sphere_pad_golden():
    # sphere_conv.py:141-156 worked example (NCHW there, NHWC here).
    x = np.arange(24, dtype=np.float32).reshape(1, 1, 3, 8)  # (B,C,H,W)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    padded = sphere_pad(x_nhwc, 2, 2)
    expected = np.array(
        [[10, 11, 12, 13, 14, 15, 8, 9, 10, 11, 12, 13],
         [2, 3, 4, 5, 6, 7, 0, 1, 2, 3, 4, 5],
         [6, 7, 0, 1, 2, 3, 4, 5, 6, 7, 0, 1],
         [14, 15, 8, 9, 10, 11, 12, 13, 14, 15, 8, 9],
         [22, 23, 16, 17, 18, 19, 20, 21, 22, 23, 16, 17],
         [18, 19, 20, 21, 22, 23, 16, 17, 18, 19, 20, 21],
         [10, 11, 12, 13, 14, 15, 8, 9, 10, 11, 12, 13]], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(padded)[0, :, :, 0], expected)


def test_sphere_conv_golden():
    # sphere_conv.py:158-172: hand-set 5x5 kernel, expected output.
    x = jnp.arange(24, dtype=jnp.float32).reshape(1, 3, 8, 1)  # NHWC
    k_oihw = np.array(
        [[0, 1, 0, 0, 0],
         [0, 1, 0, 0, 0],
         [0, 0, 0, 0, 0],
         [0, 0, 0, 1, 0],
         [0, 0, 0, 1, 0]], dtype=np.float32)[None, None]  # (O=1,I=1,5,5)
    kernel = jnp.asarray(k_oihw.transpose(2, 3, 1, 0))  # HWIO
    out = sphere_conv2d(x, kernel, jnp.zeros((1,)), padding=2)
    expected = np.array(
        [[44., 48., 52., 40., 44., 48., 52., 40.],
         [48., 44., 48., 44., 48., 44., 48., 44.],
         [52., 40., 44., 48., 52., 40., 44., 48.]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], expected, atol=1e-5)


@pytest.mark.parametrize("cin,cout,k,groups,H,W", [
    (4, 6, 3, 1, 12, 16),
    (3, 3, 5, 1, 8, 12),
    (8, 8, 3, 8, 10, 16),   # depthwise (GLUMBConv conv_depth)
    (6, 6, 5, 6, 15, 30),   # depthwise 5x5 (Sana multiscale proj_in)
    (5, 7, 3, 1, 30, 60),   # taller grid slice
])
def test_sphere_conv_matches_torch_reference(cin, cout, k, groups, H, W):
    torch = pytest.importorskip("torch")
    ref = _load_reference_sphere_conv()

    rng = np.random.RandomState(0)
    x = rng.randn(2, cin, H, W).astype(np.float32)
    w = rng.randn(cout, cin // groups, k, k).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)

    conv = ref.SphereConv2d(cin, cout, k, 1, k // 2, groups=groups)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
        want = conv(torch.from_numpy(x)).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    kernel = jnp.asarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO
    got = sphere_conv2d(x_nhwc, kernel, jnp.asarray(b), groups=groups)
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, atol=2e-4, rtol=2e-4)


def test_fused_equals_three_slice():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 15, 30, 8).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 8, 12).astype(np.float32))
    bias = jnp.asarray(rng.randn(12).astype(np.float32))
    a = sphere_conv2d(x, kernel, bias)
    b = sphere_conv2d_reference_3slice(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_flows():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 12, 3).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))

    def loss(k):
        return jnp.sum(sphere_conv2d(x, k, None) ** 2)

    g = jax.grad(loss)(kernel)
    assert np.isfinite(np.asarray(g)).all()


def test_gradient_matches_torch_reference():
    """Backward parity: d(loss)/d(kernel) and d(loss)/d(input) of the
    sphere conv must match torch autograd through the reference MATH
    (training differentiates through the pole corrections).

    The reference module itself cannot be autograd-differentiated w.r.t.
    its weight: it flips kernel rows by mutating ``weight.data`` in place
    (sphere_conv.py:99-108), which detaches those reads from the graph.
    We therefore reimplement the same 3-slice math functionally in torch
    (out-of-place flips) as the gradient oracle."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    cin, cout, k, H, W = 3, 4, 3, 8, 12
    x = rng.randn(2, cin, H, W).astype(np.float32)
    w = rng.randn(cout, cin, k, k).astype(np.float32)

    def torch_sphere_conv(xt, wt):
        p = k // 2
        half = W // 2
        top = torch.flip(torch.roll(xt[:, :, :p, :], half, dims=3), [2])
        bot = torch.flip(torch.roll(xt[:, :, -p:, :], half, dims=3), [2])
        padded = torch.cat([top, xt, bot], dim=2)
        padded = F.pad(padded, (p, p, 0, 0), mode="circular")
        k_top = torch.cat([torch.flip(wt[:, :, :p], [3]), wt[:, :, p:]], 2)
        k_bot = torch.cat([wt[:, :, :k - p],
                           torch.flip(wt[:, :, k - p:], [3])], 2)
        t = F.conv2d(padded[:, :, :k], k_top)
        m = F.conv2d(padded[:, :, 1:-1], wt)
        b = F.conv2d(padded[:, :, -k:], k_bot)
        return torch.cat([t, m, b], dim=2)

    xt = torch.from_numpy(x).requires_grad_(True)
    wt = torch.from_numpy(w).requires_grad_(True)
    loss = (torch_sphere_conv(xt, wt) ** 2).sum()
    loss.backward()
    want_dx = xt.grad.numpy()
    want_dw = wt.grad.numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    kernel = jnp.asarray(w.transpose(2, 3, 1, 0))

    def loss_fn(xx, kk):
        return jnp.sum(sphere_conv2d(xx, kk, None) ** 2)

    dx, dk = jax.grad(loss_fn, argnums=(0, 1))(x_nhwc, kernel)
    np.testing.assert_allclose(np.asarray(dx).transpose(0, 3, 1, 2),
                               want_dx, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk).transpose(3, 2, 0, 1),
                               want_dw, atol=1e-3, rtol=1e-3)


def test_depthwise_shift_conv_matches_grouped_hlo():
    """The shifted-FMA depthwise lowering equals the grouped-conv HLO
    (which equals the reference grouped torch conv, covered above)."""
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from ladcast_tpu.ops import sphere

    rng = np.random.RandomState(0)
    for (H, W, C, k) in [(8, 12, 16, 3), (6, 10, 8, 5)]:
        x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
        kern = jnp.asarray(rng.randn(k, k, 1, C).astype(np.float32))
        p = ((k // 2, k // 2), (k // 2, k // 2))
        ours = sphere._depthwise_shift_conv(x, kern, p)
        ref = lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding=p,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # and through the sphere wrapper (VALID + strip paths)
        full = sphere.sphere_conv2d(x, kern, groups=C)
        ref_full = sphere.sphere_conv2d_reference_3slice(x, kern, groups=C)
        np.testing.assert_allclose(np.asarray(full), np.asarray(ref_full),
                                   rtol=1e-5, atol=1e-5)
