"""Vertex optimization through CSG compositions — gradients through booleans.

BASELINE.json north-star config: "CSG Bimba ∪ Bunny ... with SDF,
gradients through booleans". Each part mesh is soft-voxelized
(differentiable in its vertex coordinates), the parts are combined with
soft CSG (min/max — subgradients flow through the active branch), and a
loss on the composed occupancy is descended w.r.t. ALL parts' vertices
simultaneously. The CUDA reference can only compose hard bit grids
(`csg/csg.h:14-30`); this is the differentiable counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from voxtpu.models.fit import make_adam_step, soft_iou_loss
from voxtpu.ops.csg import soft_csg
from voxtpu.ops.soft_vox import soft_voxelize


@dataclasses.dataclass
class CSGPart:
    """One operand of the composition: a soft plan + its op into the fold."""

    plan: object               # FragmentPlan from make_soft_plan
    op: str = "union"          # op folding this part into the running grid


def compose(coords_list: Sequence[jnp.ndarray], parts: Sequence[CSGPart],
            tau_edge_frac: float = 0.5, tau_x_frac: float = 0.5) -> jnp.ndarray:
    """Soft-voxelize every part and fold them left-to-right with soft CSG
    (same fold order as the reference CLI, `apps/cli/main.cpp:126-186`)."""
    occ = soft_voxelize(coords_list[0], parts[0].plan,
                        tau_edge_frac=tau_edge_frac, tau_x_frac=tau_x_frac)
    for coords, part in zip(coords_list[1:], parts[1:]):
        o = soft_voxelize(coords, part.plan,
                          tau_edge_frac=tau_edge_frac, tau_x_frac=tau_x_frac)
        occ = soft_csg(occ, o, part.op)
    return occ


class CSGFit:
    """Adam fitting of several meshes so their CSG composition matches a
    target occupancy grid."""

    def __init__(self, parts: Sequence[CSGPart], target_occ: jnp.ndarray,
                 learning_rate: float = 1e-2,
                 loss_fn: Callable = soft_iou_loss,
                 tau_edge_frac: float = 0.5, tau_x_frac: float = 0.5):
        self.parts = list(parts)
        self.target = jnp.asarray(target_occ, jnp.float32)
        self.optimizer = optax.adam(learning_rate)

        def loss(coords_list):
            occ = compose(coords_list, self.parts,
                          tau_edge_frac=tau_edge_frac, tau_x_frac=tau_x_frac)
            return loss_fn(occ, self.target)

        self._loss = loss
        self._adam_step = make_adam_step(loss, self.optimizer)

    def step(self, coords_list, opt_state):
        """One Adam step; returns (coords_list, opt_state, metrics)."""
        return self._adam_step(coords_list, opt_state)

    def init(self, coords_list: Sequence):
        coords_list = [jnp.asarray(c, jnp.float32) for c in coords_list]
        return coords_list, self.optimizer.init(coords_list)

    def loss(self, coords_list) -> jnp.ndarray:
        return self._loss([jnp.asarray(c, jnp.float32) for c in coords_list])
