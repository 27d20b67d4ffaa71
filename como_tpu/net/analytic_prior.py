"""Analytic structure-tensor depth-covariance prior.

The reference conditions its GP on a *learned* per-pixel 2x2 kernel
covariance (UNet trained on ScanNet; checkpoint models/scannet.ckpt —
stripped from the reference repo, .MISSING_LARGE_BLOBS).  This module is
the non-learned counterpart: the same inductive bias ("depth correlates
far in smooth regions; correlation shrinks and elongates along image
edges") computed in closed form from the image structure tensor.  It is
the default prior (no checkpoint needed) and the drop-in producer of the
same packed (e00, e11, e01) covariance images the GP stack consumes;
net/unet.py provides the learned alternative with the reference's
architecture.

Convention: covariances live in normalized [-1, 1] coordinates (like the
reference's network outputs, which bound diagonal entries to
[1e-3, 1e4] and |corr| < 0.99 — see gaussian_kernel.normalize_params_cov).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from como_tpu.ops import image as img_ops

COV_MIN = 1e-3
COV_MAX = 1e4
CORR_MAX = 0.99


def _gauss_blur_n(x: jax.Array, n: int = 3) -> jax.Array:
    for _ in range(n):
        x = img_ops.gaussian_blur(x)
    return x


@partial(jax.jit, static_argnames=("sigma_smooth", "sigma_edge", "gain"))
def cov_params_from_rgb(rgb: jax.Array, sigma_smooth: float = 0.35,
                        sigma_edge: float = 0.02, gain: float = 4000.0) -> jax.Array:
    """(1, 3, H, W) rgb in [0,1] -> (3, H, W) packed covariance image.

    Structure tensor J = G * [gx^2, gx gy; gx gy, gy^2]; eigen-frame
    covariance E = s1^2 e1 e1^T + s2^2 e2 e2^T with
    s_i = sigma_edge + (sigma_smooth - sigma_edge) / (1 + gain * lambda_i):
    wide isotropic kernels on flat texture, narrow across strong edges.
    """
    gray = img_ops.rgb_to_gray(rgb)
    gx, gy = img_ops.image_gradients(gray)
    jxx = _gauss_blur_n(gx * gx)[0, 0]
    jyy = _gauss_blur_n(gy * gy)[0, 0]
    jxy = _gauss_blur_n(gx * gy)[0, 0]

    # eigendecomposition of the symmetric 2x2 field
    tr = jxx + jyy
    diff = jxx - jyy
    rad = jnp.sqrt(diff * diff + 4.0 * jxy * jxy + 1e-20)
    lam1 = 0.5 * (tr + rad)   # across-edge strength
    lam2 = 0.5 * (tr - rad)
    # eigenvector for lam1: (jxy, lam1 - jxx) or (lam1 - jyy, jxy)
    v1x = jnp.where(jnp.abs(jxy) > 1e-12, jxy, 1.0)
    v1y = jnp.where(jnp.abs(jxy) > 1e-12, lam1 - jxx, 0.0)
    nrm = jnp.sqrt(v1x * v1x + v1y * v1y + 1e-20)
    v1x, v1y = v1x / nrm, v1y / nrm
    v2x, v2y = -v1y, v1x

    def sig(lam):
        return sigma_edge + (sigma_smooth - sigma_edge) / (1.0 + gain * jnp.maximum(lam, 0.0))

    s1 = sig(lam1) ** 2  # variance along across-edge direction (small at edges)
    s2 = sig(lam2) ** 2

    # E in (x, y) axes of normalized coords.  The GP kernel consumes covs in
    # (row, col)=(y, x) order; structure tensor axes are (x, y) -> swap:
    exx = s1 * v1x * v1x + s2 * v2x * v2x
    eyy = s1 * v1y * v1y + s2 * v2y * v2y
    exy = s1 * v1x * v1y + s2 * v2x * v2y

    e00 = jnp.clip(eyy, COV_MIN, COV_MAX)   # row-row
    e11 = jnp.clip(exx, COV_MIN, COV_MAX)   # col-col
    # determinant guard as in the reference activation: |corr| bounded
    corr = jnp.clip(exy / jnp.sqrt(eyy * exx + 1e-20), -CORR_MAX, CORR_MAX)
    e01 = corr * jnp.sqrt(jnp.maximum(e00 * e11 - 1e-8, 0.0))
    return jnp.stack([e00, e11, e01], axis=0)
