"""Headless map renderer: z-buffered point splatting in JAX.

Role-equivalent of the reference's OpenGL surfel renderer
(como/gui/OpenGLRenderer.py + GLSL geometry/Phong shaders, which carry a
non-commercial license and are deliberately NOT ported; this is an
independent re-derivation of the idea "render keyframe RGB-D clouds from
a virtual camera").  Each keyframe pixel becomes a splat; depth conflicts
resolve by scatter-min z-buffer; optional Lambert shading from
depth-gradient normals.  Runs on TPU and is used by the snapshot viewer
and tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from como_tpu.geometry.lie import invert_se3
from como_tpu.ops import image as img_ops

HIGH = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("out_size", "splat", "shaded"))
def render_map(kf_rgb, kf_depth, kf_pose, kf_valid, K, T_view,
               out_size=(384, 512), splat: int = 2, shaded: bool = True):
    """Render keyframe clouds from T_view (world-from-camera).

    kf_rgb (K, 3, H, W), kf_depth (K, 1, H, W), kf_pose (K, 4, 4).
    Returns rgb (out_h, out_w, 3) in [0, 1] and depth (out_h, out_w).
    """
    Kn, _, H, W = kf_rgb.shape
    oh, ow = out_size
    dtype = kf_rgb.dtype
    sy, sx = oh / H, ow / W
    K_out = jnp.array([[K[0, 0] * sx, 0.0, K[0, 2] * sx],
                       [0.0, K[1, 1] * sy, K[1, 2] * sy],
                       [0.0, 0.0, 1.0]], dtype)

    # backproject all KF pixels to world
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype),
                          indexing="ij")
    rx = (xs - K[0, 2]) / K[0, 0]
    ry = (ys - K[1, 2]) / K[1, 1]
    ray = jnp.stack([rx, ry, jnp.ones_like(rx)], 0)[None]       # (1,3,H,W)
    Pc = kf_depth * ray                                          # (K,3,H,W)
    R = kf_pose[:, :3, :3]
    t = kf_pose[:, :3, 3]
    Pw = jnp.einsum("kij,kjhw->kihw", R, Pc, precision=HIGH) + t[:, :, None, None]

    shade = jnp.ones((Kn, 1, H, W), dtype)
    if shaded:
        # normals from depth gradients (independent derivation: cross of
        # the backprojected-surface tangent vectors)
        gx_d, gy_d = img_ops.image_gradients(kf_depth)
        tx = jnp.stack([kf_depth[:, 0] / K[0, 0] + rx * gx_d[:, 0],
                        ry * gx_d[:, 0], gx_d[:, 0]], 1)
        ty = jnp.stack([rx * gy_d[:, 0],
                        kf_depth[:, 0] / K[1, 1] + ry * gy_d[:, 0], gy_d[:, 0]], 1)
        n = jnp.cross(tx.transpose(0, 2, 3, 1), ty.transpose(0, 2, 3, 1))
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
        lambert = jnp.abs(n[..., 2])                            # headlight
        shade = (0.35 + 0.65 * lambert)[:, None]

    # transform into the view camera, project
    Tcw = invert_se3(T_view)
    Pv = jnp.einsum("ij,kjhw->kihw", Tcw[:3, :3], Pw, precision=HIGH) \
        + Tcw[:3, 3][None, :, None, None]
    z = Pv[:, 2]
    zs = jnp.where(z > 1e-6, z, 1.0)
    u = (K_out[0, 0] * Pv[:, 0] / zs + K_out[0, 2]).reshape(-1)
    v = (K_out[1, 1] * Pv[:, 1] / zs + K_out[1, 2]).reshape(-1)
    z = z.reshape(-1)
    col = (kf_rgb * shade).transpose(0, 2, 3, 1).reshape(-1, 3)
    ok = ((z > 1e-6) & jnp.repeat(kf_valid, H * W)
          & (u >= 0) & (u < ow - 1) & (v >= 0) & (v < oh - 1))

    ui = jnp.clip(u.astype(jnp.int32), 0, ow - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, oh - 1)

    big = jnp.asarray(1e9, dtype)
    zbuf = jnp.full((oh * ow,), big, dtype)
    img = jnp.zeros((oh * ow, 3), dtype)
    for dy in range(splat):
        for dx in range(splat):
            idx = jnp.clip(vi + dy, 0, oh - 1) * ow + jnp.clip(ui + dx, 0, ow - 1)
            zq = jnp.where(ok, z, big)
            zbuf = zbuf.at[idx].min(zq)
    for dy in range(splat):
        for dx in range(splat):
            idx = jnp.clip(vi + dy, 0, oh - 1) * ow + jnp.clip(ui + dx, 0, ow - 1)
            win = ok & (z <= zbuf[idx] * (1.0 + 1e-4))
            img = img.at[idx].set(jnp.where(win[:, None], col, img[idx]),
                                  mode="drop")
    depth_out = jnp.where(zbuf >= big, 0.0, zbuf).reshape(oh, ow)
    return img.reshape(oh, ow, 3), depth_out
