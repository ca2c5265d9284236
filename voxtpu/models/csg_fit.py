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

from voxtpu.models.fit import _max_drift, make_adam_step, soft_iou_loss
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
    if len(coords_list) != len(parts):
        raise ValueError(
            f"{len(coords_list)} coordinate arrays for {len(parts)} parts "
            "(a silent zip-truncation here would optimize the wrong shape)")
    occ = soft_voxelize(coords_list[0], parts[0].plan,
                        tau_edge_frac=tau_edge_frac, tau_x_frac=tau_x_frac)
    for coords, part in zip(coords_list[1:], parts[1:]):
        o = soft_voxelize(coords, part.plan,
                          tau_edge_frac=tau_edge_frac, tau_x_frac=tau_x_frac)
        occ = soft_csg(occ, o, part.op)
    return occ


class CSGFit:
    """Adam fitting of several meshes so their CSG composition matches a
    target occupancy grid.

    Plan staleness guard (same hazard as `VoxelFit`): each part's soft
    plan only covers vertex motion up to its pad window, so `step()`
    checks every part's drift each `refresh_every` steps and rebuilds
    drifted plans from the current coordinates. ``refresh_every=0``
    leaves refreshes to manual :meth:`maybe_refresh_plans` calls.
    """

    def __init__(self, parts: Sequence[CSGPart], target_occ: jnp.ndarray,
                 learning_rate: float = 1e-2,
                 loss_fn: Callable = soft_iou_loss,
                 tau_edge_frac: float = 0.5, tau_x_frac: float = 0.5,
                 refresh_every: int = 8, drift_limit_frac: float = 0.5):
        self.parts = list(parts)
        self.target = jnp.asarray(target_occ, jnp.float32)
        self.optimizer = optax.adam(learning_rate)
        self._loss_fn = loss_fn
        self._tau = (tau_edge_frac, tau_x_frac)
        self.refresh_every = refresh_every
        self.refresh_count = 0
        self._steps_seen = 0
        self._drift_limits = [
            drift_limit_frac * getattr(p.plan, "pad_window", 1)
            for p in self.parts
        ]
        self._plan_coords = [
            None if getattr(p.plan, "plan_coords", None) is None
            else jnp.asarray(p.plan.plan_coords)
            for p in self.parts
        ]
        self._rebuild_step()

    def _rebuild_step(self):
        te, tx = self._tau

        # Target passed through aux (closure capture would embed the
        # full N^3 grid as an HLO constant, re-embedded every refresh).
        def loss(coords_list, target):
            occ = compose(coords_list, self.parts,
                          tau_edge_frac=te, tau_x_frac=tx)
            return self._loss_fn(occ, target)

        self._loss_impl = loss
        self._adam_step = make_adam_step(loss, self.optimizer)

    def maybe_refresh_plans(self, coords_list) -> int:
        """Rebuild every part plan whose vertices drifted past its pad
        window; returns the number of plans refreshed."""
        from voxtpu.ops.soft_vox import refresh_soft_plan

        refreshed = 0
        for i, part in enumerate(self.parts):
            pc = self._plan_coords[i]
            if pc is None:
                continue
            vs = jnp.float32(part.plan.spec.voxel_size)
            if float(_max_drift(coords_list[i], pc, vs)) > self._drift_limits[i]:
                part.plan = refresh_soft_plan(part.plan, coords_list[i])
                self._plan_coords[i] = jnp.asarray(coords_list[i])
                refreshed += 1
        if refreshed:
            self.refresh_count += refreshed
            self._rebuild_step()
        return refreshed

    def step(self, coords_list, opt_state):
        """One Adam step; returns (coords_list, opt_state, metrics)."""
        self._steps_seen += 1
        if self.refresh_every and self._steps_seen % self.refresh_every == 0:
            self.maybe_refresh_plans(coords_list)
        return self._adam_step(coords_list, opt_state, self.target)

    def init(self, coords_list: Sequence):
        if len(coords_list) != len(self.parts):
            raise ValueError(
                f"{len(coords_list)} coordinate arrays for "
                f"{len(self.parts)} parts")
        coords_list = [jnp.asarray(c, jnp.float32) for c in coords_list]
        for i, (c, pc) in enumerate(zip(coords_list, self._plan_coords)):
            if pc is None:
                # Plans built before the drift guard don't record build
                # coordinates; treat the fit's start point as reference.
                self._plan_coords[i] = c
        return coords_list, self.optimizer.init(coords_list)

    def loss(self, coords_list) -> jnp.ndarray:
        return self._loss_impl(
            [jnp.asarray(c, jnp.float32) for c in coords_list], self.target)
