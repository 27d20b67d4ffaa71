"""Parity tests for image ops vs torch implementations mirroring the
reference modules (Scharr/32 with reflect pad, 3x3 binomial blur,
blur+decimate pyramid)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from como_tpu.ops import image


def _torch_depthwise(img_np, kernel_np):
    c = img_np.shape[1]
    k = torch.from_numpy(kernel_np).reshape(1, 1, 3, 3).repeat(c, 1, 1, 1)
    x = torch.from_numpy(img_np)
    xp = F.pad(x, (1, 1, 1, 1), mode="reflect")
    return F.conv2d(xp, k, groups=c).numpy()


def test_scharr_parity():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 16, 20)).astype(np.float32)
    gx, gy = image.image_gradients(jnp.array(img))
    kx = np.array(image.SCHARR_X, dtype=np.float32)
    ky = np.array(image.SCHARR_Y, dtype=np.float32)
    np.testing.assert_allclose(np.array(gx), _torch_depthwise(img, kx), atol=1e-5)
    np.testing.assert_allclose(np.array(gy), _torch_depthwise(img, ky), atol=1e-5)


def test_blur_parity():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 1, 12, 12)).astype(np.float32)
    ours = np.array(image.gaussian_blur(jnp.array(img)))
    ref = _torch_depthwise(img, np.array(image.GAUSS_3, dtype=np.float32))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pyramid_shapes_and_order():
    img = jnp.zeros((1, 1, 192, 256))
    pyr = image.image_pyramid(img, 0, 3)
    assert [p.shape[-2:] for p in pyr] == [(48, 64), (96, 128), (192, 256)]


def test_pyramid_matches_reference_algorithm():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    pyr = image.image_pyramid(jnp.array(img), 0, 2)
    blurred = _torch_depthwise(img, np.array(image.GAUSS_3, dtype=np.float32))
    np.testing.assert_allclose(np.array(pyr[0]), blurred[:, :, 0::2, 0::2], atol=1e-5)
    np.testing.assert_allclose(np.array(pyr[1]), img, atol=1e-6)


def test_depth_pyramid_modes():
    rng = np.random.default_rng(3)
    d = rng.uniform(1.0, 3.0, size=(1, 1, 8, 8)).astype(np.float32)
    jd = jnp.array(d)
    nn = image.pyr_depth(jd, "nearest_neighbor")
    np.testing.assert_allclose(np.array(nn), d[:, :, 0::2, 0::2])
    bl = image.pyr_depth(jd, "bilinear")
    ref = F.avg_pool2d(torch.from_numpy(d), 2, 2).numpy()
    np.testing.assert_allclose(np.array(bl), ref, atol=1e-6)
    mx = image.pyr_depth(jd, "max")
    ref = F.max_pool2d(torch.from_numpy(d), 2).numpy()
    np.testing.assert_allclose(np.array(mx), ref, atol=1e-6)


def test_rgb_to_gray_parity():
    # torchvision rgb_to_grayscale uses ITU-R 601-2: 0.299 R + 0.587 G + 0.114 B
    rng = np.random.default_rng(4)
    img = rng.uniform(size=(1, 3, 6, 7)).astype(np.float32)
    ref = (0.299 * img[:, 0] + 0.587 * img[:, 1] + 0.114 * img[:, 2])[:, None]
    ours = np.array(image.rgb_to_gray(jnp.array(img)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_intrinsics_pyramid():
    K = jnp.array([[260.0, 0.0, 127.5], [0.0, 200.0, 95.5], [0.0, 0.0, 1.0]])
    pyr = image.intrinsics_pyramid(K, 0, 3)
    assert len(pyr) == 3
    # coarse first: level 2 has scale 1/4
    np.testing.assert_allclose(np.array(pyr[0][0, 0]), 65.0, atol=1e-4)
    np.testing.assert_allclose(np.array(pyr[-1][0, 0]), 260.0, atol=1e-4)
