"""Multi-chip mapping: photometric BA linearization sharded over a mesh.

The reference's only "distribution" is a 2-process CPU/GPU pipeline over
torch.multiprocessing queues (SURVEY.md section 2.9).  The TPU-native
scaling axis is the BA linearization itself: the pair batch (forward/
backward KF chains + one-way attachments — up to 64 pairs x 3072 dense
sites) is embarrassingly parallel, and the Hessian it produces is tiny
(block grids of a few MB).  So:

  * mesh: 1-D ("ba",) over all devices,
  * window state is replicated; pair arrays are sharded over "ba",
  * each device linearizes its pair shard (the full _photo kernel),
  * the robust MAD sigma stays *global* via a psum'd histogram median
    (ops/reduce.histogram_median(axis_name=...)) — bitwise identical to
    the single-chip estimate,
  * block-grid Hessians/gradients are psum'd over ICI (the lone
    collective, ~3 MB), and the prior factors + 2k-dim Cholesky +
    retraction run replicated.

This is how the window/resolution scales beyond one chip: more pairs or
more dense sites per pair cost no extra wall-clock until the psum'd
grids dominate.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from como_tpu.odom.backend import gn_step as gs
from como_tpu.odom.window import WindowDims, WindowState


def make_mesh(devices=None, axis: str = "ba") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.array(devices), (axis,))


def make_sharded_gn_step(mesh: Mesh, dims: WindowDims, sigmas,
                         damping: float = 1e-6, axis: str = "ba"):
    """Returns gn_step_sharded(state, pairs_ref, pairs_tgt, pairs_valid,
    K_intr, damping=<ctor default>) with the photometric fan-out sharded
    over `axis`.  damping is a runtime arg so the product's adaptive LM
    damping (Mapping.should_iterate) works in mesh mode.

    Pair arrays must have length divisible by mesh size (pad with invalid
    pairs; dims.P already is for power-of-two meshes)."""

    rep = P()
    pair_spec = P(axis)

    def photo_local(state, sc, dn, pr, pt, pv, K_intr):
        out = gs._photo(state, sc, dn, pr, pt, pv, K_intr, dims,
                        axis_name=axis, occl_thresh=sigmas.occlusion_thresh,
                        estimate_affine=sigmas.estimate_affine)
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), out)

    photo_sharded = shard_map(
        photo_local, mesh=mesh,
        in_specs=(rep, rep, rep, pair_spec, pair_spec, pair_spec, rep),
        out_specs=rep, check_vma=False,
    )

    @jax.jit
    def _step(state: WindowState, pairs_ref, pairs_tgt, pairs_valid, K_intr,
              damp):
        sc = gs._scaffold(state, K_intr, dims, sigmas.far_depth_ratio)
        state = state._replace(P_lm=sc["P_lm_new"])
        dn = gs._dense_points(state, sc, K_intr, dims)
        photo = photo_sharded(state, sc, dn, pairs_ref, pairs_tgt,
                              pairs_valid, K_intr)
        return gs._finish(state, sc, dn, photo, K_intr, dims, sigmas, damp)

    def step(state, pairs_ref, pairs_tgt, pairs_valid, K_intr,
             damp=damping):
        return _step(state, pairs_ref, pairs_tgt, pairs_valid, K_intr, damp)

    return step
