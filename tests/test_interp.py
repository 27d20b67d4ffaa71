"""Golden parity tests: our bilinear sampler vs torch.grid_sample
(align_corners=False) — the reference's sampling backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from como_tpu.ops import coords as C
from como_tpu.ops import interp


def _torch_grid_sample(img_np, xy_np, padding):
    # normalize pixel coords exactly like the reference
    # (como/utils/coords.py normalize_coordinates: 2*A*x + A - 1)
    H, W = img_np.shape[-2:]
    A = np.array([1.0 / W, 1.0 / H], dtype=np.float64)
    norm = 2 * A * xy_np + A - 1
    timg = torch.from_numpy(img_np)[None]  # (1, C, H, W)
    grid = torch.from_numpy(norm)[None, None]  # (1, 1, N, 2) xy order
    out = torch.nn.functional.grid_sample(
        timg, grid, mode="bilinear", padding_mode=padding, align_corners=False
    )
    return out[0, :, 0, :].numpy()  # (C, N)


def test_bilinear_parity_zeros_and_border():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 24, 32)).astype(np.float64)
    xy = rng.uniform(low=-3.0, high=[35.0, 27.0], size=(500, 2)).astype(np.float64)

    for padding in ("zeros", "border"):
        ours = np.array(
            interp.bilinear_sample(
                jnp.array(img, dtype=jnp.float32), jnp.array(xy, dtype=jnp.float32), padding
            )
        )
        ref = _torch_grid_sample(img, xy, padding)
        np.testing.assert_allclose(ours, ref.astype(np.float32), rtol=1e-4, atol=1e-4)


def test_integer_coords_hit_pixels():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 8, 9)).astype(np.float32)
    xy = jnp.array([[3.0, 2.0], [0.0, 0.0], [8.0, 7.0]])
    vals = np.array(interp.bilinear_sample(jnp.array(img), xy, "zeros"))[0]
    np.testing.assert_allclose(vals, [img[0, 2, 3], img[0, 0, 0], img[0, 7, 8]], atol=1e-6)


def test_img_interp_valid_mask():
    img = jnp.ones((1, 10, 12))
    xy = jnp.array([[0.5, 5.0], [1.0, 1.0], [10.9, 5.0], [11.2, 5.0], [5.0, 8.9], [5.0, 9.1]])
    _, valid = interp.img_interp(img, xy)
    np.testing.assert_array_equal(np.array(valid), [False, True, True, False, True, False])


def test_normalize_roundtrip():
    xy = jnp.array([[3.25, 8.5], [0.0, 0.0]])
    n = C.normalize_coords(xy, (32, 24))
    back = C.unnormalize_coords(n, (32, 24))
    np.testing.assert_allclose(np.array(back), np.array(xy), atol=1e-5)


def test_fill_image():
    coords_rc = jnp.array([[0, 0], [2, 3], [50, 2]])  # last out of bounds
    vals = jnp.array([1.0, 2.0, 3.0])
    img = np.array(C.fill_image(coords_rc, vals, (4, 5)))
    assert img[0, 0] == 1.0 and img[2, 3] == 2.0
    assert np.isnan(img[1, 1])
