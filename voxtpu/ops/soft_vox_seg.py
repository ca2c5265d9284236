"""Segmented fused soft voxelizer — x-panels instead of full x-rows.

The fused coefficient-table engine (`voxtpu.ops.soft_vox_fused`)
evaluates, for every slot (triangle x candidate YZ cell), the X-profile
sigmoid over ALL n x-columns and contracts a (TC, 128) @ (128, n) MXU
panel per sub-batch.  But sigmoid((x_hit - cx) / tau_x) at the default
tau_x = vs/2 saturates within ~16 voxels of x_hit: to float32 it is
exactly 1.0 more than 32 columns left of the hit and exactly 0.0 more
than 32 columns right.  This engine exploits that (the soft analog of
the hard word-event kernel's suffix trick, `vox_pallas_we.py`):

- Each slot is assigned (at plan-build time, from host-computed x_hit)
  a 128-column PANEL placed on a 64-column lattice such that x_hit sits
  >= 32 columns from both panel edges.  Sigmoids are evaluated on the
  panel only; columns left of the panel receive the slot's full weight
  (a CARRY), columns right receive 0 — both exact in f32 by the margin.
- Batches are keyed by (tile, panel): every slot in a batch shares one
  panel, so the accumulate contraction is (TC, 128) @ (128, 128)
  regardless of n — the per-slot MXU and VPU cost stops scaling with
  the grid's x-extent (n/128 x fewer exps and accumulate flops).
- 64-lattice placement with 128-aligned Pallas output blocks uses TWO
  block families: family A panels start at 128k (blocks of `out_a`),
  family B at 128k + 64 (blocks of `out_b`, an array in 64-shifted
  column space).  XLA assembles occ = A + shift64(B) + carry-prefix.
- The carry is a per-(tile, panel) column vector summed in-kernel;
  a reverse-exclusive cumsum over 64-column blocks broadcasts it to
  every column left of each panel (one cheap XLA pass).
- Tiles are SQUARE YZ patches (tz x ty, default 8 x 16) instead of the
  fused engine's 1 x 128 strips: a w x w raster window then usually
  touches 1-2 tiles instead of w, which cuts the number of (tile,
  triangle) pairs — and with it the dominant coefficient-table traffic
  (the tables are the engine's main HBM load, BENCH_NOTES round 3).

Precision follows `soft_vox_fused` mode="exact8" throughout: bit-exact
int8 byte-plane coefficient gathers, bf16_3x smooth dots (2 passes when
one side is 0/1-exact).  Reference semantics per `vox/sequential.cpp:
18-61` relaxed as in `voxtpu.ops.soft_vox`; agreement with the XLA
engine is to float32 summation order (the carry lumps w * 1.0f terms
the XLA engine adds per column — the addends are bit-identical).

Requires n >= 256 (panels must be narrower than the grid); callers fall
back to `soft_voxelize_fused` below that.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from voxtpu.ops.soft_vox_fused import (
    FLAG_FIRST,
    FLAG_LAST,
    NATTR,
    TB_LANE,
    _build_classed_reduction,
    _byte_planes,
    _cut_batches,
    _dot_hi,
    _dot_hi_onehot,
    _expand_rows,
    _float0,
    _gather_exact,
    _gather_tri,
    triangle_coeffs,
)

PANEL = 128          # sigmoid panel width (columns)
LATTICE = 64         # panel placement granularity
MARGIN = 32          # min distance of x_hit to a panel edge (voxels)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _decode_yz(tile, cells_s, *, n: int, tz: int, ty: int):
    """Square-tile decode: (tile id, local cell) -> global (y, z)."""
    tyn = n // ty
    gy = (tile % tyn) * ty + (cells_s % ty)
    gz = (tile // tyn) * tz + (cells_s // ty)
    return gy, gz


def _seg_fwd_kernel(n: int, tc: int, tb_sub: int, tbl: int, tz: int):
    from jax.experimental import pallas as pl

    ty = tc // tz

    def kernel(bt_ref, p0_ref, fl_ref, cell_ref, idx_ref, tab_ref, prm_ref,
               inita_ref, initb_ref, initc_ref,
               outa_ref, outb_ref, carry_ref, accp, accc):
        del inita_ref, initb_ref, initc_ref  # zero-init aliases
        b = pl.program_id(0)
        tile = bt_ref[b]
        p0 = p0_ref[b]
        flags = fl_ref[b]
        fam_b = (p0 // LATTICE) % 2
        ox, oy, oz = prm_ref[0], prm_ref[1], prm_ref[2]
        vs, tau_e, tau_x = prm_ref[3], prm_ref[4], prm_ref[5]

        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, TB_LANE), 0)
        cell_iota_t = jax.lax.broadcasted_iota(jnp.int32, (TB_LANE, tc), 1)
        tbl_iota = jax.lax.broadcasted_iota(jnp.int32, (tbl, TB_LANE), 0)
        xi = jax.lax.broadcasted_iota(jnp.int32, (TB_LANE, PANEL), 1)
        cxp = ox + ((p0 + xi).astype(jnp.float32) * vs + vs * 0.5)

        table_t = tab_ref[0]  # (16, TBL), NATTR-major in HBM
        planes = _byte_planes(table_t)

        # Per-sub-batch VPU math stays 128-lane; the accumulate
        # contraction is stacked across sub-batches into ONE deep-K MXU
        # dot (tc, tb) @ (tb, PANEL) instead of tb_sub shallow ones.
        crow = jnp.zeros((1, tc), jnp.float32)
        ow_l, sig_l = [], []
        for s in range(tb_sub):
            cells_s = cell_ref[0, s, :]          # local cell, -1 pad
            idx_s = idx_ref[0, s, :]             # table slot
            gy, gz = _decode_yz(tile, cells_s, n=n, tz=tz, ty=ty)
            cy = oy + (gy.astype(jnp.float32) * vs + vs * 0.5)
            cz = oz + (gz.astype(jnp.float32) * vs + vs * 0.5)

            at = _gather_exact(
                planes, (tbl_iota == idx_s[None, :]).astype(jnp.int8))
            s0 = jax.nn.sigmoid((at[0] * cz + at[1] * cy + at[2]) / tau_e)
            s1 = jax.nn.sigmoid((at[3] * cz + at[4] * cy + at[5]) / tau_e)
            s2 = jax.nn.sigmoid((at[6] * cz + at[7] * cy + at[8]) / tau_e)
            w_s = at[12] * (s0 * s1 * s2)
            xh = at[9] - at[10] * cy - at[11] * cz

            ow_l.append(jnp.where(
                cell_iota == cells_s[None, :], w_s[None, :], 0.0
            ).astype(jnp.float32))
            sig_l.append(
                jax.nn.sigmoid((xh[:, None] - cxp) / tau_x))  # (128, PANEL)
            # Carry row: per-cell sum of weights (columns left of the
            # panel receive the full weight; sublane reduce to (1, tc)).
            onehot_wt = jnp.where(
                cell_iota_t == cells_s[:, None], w_s[:, None], 0.0
            ).astype(jnp.float32)
            crow += jnp.sum(onehot_wt, axis=0, keepdims=True)
        part = _dot_hi(jnp.concatenate(ow_l, axis=1),
                       jnp.concatenate(sig_l, axis=0),
                       (((1,), (0,)), ((), ())))

        @pl.when((flags & FLAG_FIRST) != 0)
        def _():
            accp[:] = jnp.zeros_like(accp)
            accc[:] = jnp.zeros_like(accc)

        accp[:] += part
        accc[:] += crow

        @pl.when((flags & FLAG_LAST) != 0)
        def _():
            acc = accp[:]
            is_a = (fam_b == 0).astype(jnp.float32)
            outa_ref[0, 0] = acc * is_a
            outb_ref[0, 0] = acc * (1.0 - is_a)
            carry_ref[0, 0] = accc[:]

    return kernel


def _seg_bwd_kernel(n: int, tc: int, tb_sub: int, tbl: int, tz: int):
    from jax.experimental import pallas as pl

    ty = tc // tz

    def kernel(bt_ref, p0_ref, fl_ref, cell_ref, idx_ref, tab_ref, prm_ref,
               ga_ref, gb_ref, gp_ref, dtab_ref):
        b = pl.program_id(0)
        tile = bt_ref[b]
        p0 = p0_ref[b]
        ox, oy, oz = prm_ref[0], prm_ref[1], prm_ref[2]
        vs, tau_e, tau_x = prm_ref[3], prm_ref[4], prm_ref[5]

        # The batch's cotangent panel is g columns [p0, p0 + PANEL) of
        # its tile for BOTH families (family B's out_b block j covers
        # occ columns [128j + 64, 128j + 192) = [p0, p0 + 128)). It is
        # fetched as one or two 128-column panel blocks of g_pan —
        # materializing per-family (nt, nblk, tc, PANEL) transposes of
        # the cotangent cost five ~4.3 GB HBM temps at 1024^3, and a
        # 64-lane-minor (nt, n/64, tc, 64) layout pads 2x under the
        # (8, 128) f32 tiling (both round-4 battery OOMs). Family B
        # splices the two panels' halves with STATIC lane slices; the
        # upper half is zero past the grid's last column (the forward's
        # shift-by-64 truncation of family B's tail).
        fam_b = (p0 // LATTICE) % 2
        ga = ga_ref[0]                                    # (tc, PANEL)
        gb = jnp.where(p0 + PANEL <= n, gb_ref[0], jnp.float32(0.0))
        shifted = jnp.concatenate([ga[:, LATTICE:], gb[:, :LATTICE]],
                                  axis=1)
        g_panel = jnp.where(fam_b == 0, ga, shifted)
        gpre = gp_ref[0, 0]  # (1, tc): sum of g over columns < p0

        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, TB_LANE), 0)
        tbl_iota = jax.lax.broadcasted_iota(jnp.int32, (tbl, TB_LANE), 0)
        xi = jax.lax.broadcasted_iota(jnp.int32, (TB_LANE, PANEL), 1)
        cxp = ox + ((p0 + xi).astype(jnp.float32) * vs + vs * 0.5)

        table_t = tab_ref[0]  # (16, TBL), NATTR-major in HBM
        planes = _byte_planes(table_t)

        # Stacked MXU dots (see fwd kernel): the slot gradient gather
        # pg runs once at (tc, tb) @ (tc, PANEL) -> (tb, PANEL), and
        # the coefficient-cotangent reduction once at (16, tb) @
        # (tb-major onehot) -> (16, TBL); per-sub-batch VPU math keeps
        # its 128-lane shapes.
        oh_l, da_l, ot_l = [], [], []
        vals = []
        for s in range(tb_sub):
            cells_s = cell_ref[0, s, :]
            idx_s = idx_ref[0, s, :]
            gy, gz = _decode_yz(tile, cells_s, n=n, tz=tz, ty=ty)
            cy = oy + (gy.astype(jnp.float32) * vs + vs * 0.5)
            cz = oz + (gz.astype(jnp.float32) * vs + vs * 0.5)

            ot_l.append((tbl_iota == idx_s[None, :]).astype(jnp.float32))
            at = _gather_exact(
                planes, (tbl_iota == idx_s[None, :]).astype(jnp.int8))
            s0 = jax.nn.sigmoid((at[0] * cz + at[1] * cy + at[2]) / tau_e)
            s1 = jax.nn.sigmoid((at[3] * cz + at[4] * cy + at[5]) / tau_e)
            s2 = jax.nn.sigmoid((at[6] * cz + at[7] * cy + at[8]) / tau_e)
            cov = s0 * s1 * s2
            w_s = at[12] * cov
            xh = at[9] - at[10] * cy - at[11] * cz
            oh_l.append((cell_iota == cells_s[None, :]).astype(jnp.float32))
            vals.append((at, s0, s1, s2, cov, w_s, xh, cy, cz))

        onehot_all = jnp.concatenate(oh_l, axis=1)         # (tc, tb)
        pg_all = _dot_hi_onehot(
            onehot_all, g_panel, (((0,), (0,)), ((), ())), 0)  # (tb, PANEL)
        gleft_all = _dot_hi_onehot(
            gpre, onehot_all, (((1,), (0,)), ((), ())), 1)     # (1, tb)

        for s in range(tb_sub):
            at, s0, s1, s2, cov, w_s, xh, cy, cz = vals[s]
            pg = pg_all[s * TB_LANE:(s + 1) * TB_LANE]
            gleft = gleft_all[:, s * TB_LANE:(s + 1) * TB_LANE]
            sig = jax.nn.sigmoid((xh[:, None] - cxp) / tau_x)
            dw = jnp.sum(pg * sig, axis=1) + gleft[0]          # (128,)
            dxh = (w_s / tau_x) * jnp.sum(pg * sig * (1.0 - sig), axis=1)

            dcov = dw * at[12]
            dwmul = dw * cov
            de0 = dcov * cov * (1.0 - s0) / tau_e
            de1 = dcov * cov * (1.0 - s1) / tau_e
            de2 = dcov * cov * (1.0 - s2) / tau_e
            da_l.append(jnp.concatenate([
                (de0 * cz)[None, :], (de0 * cy)[None, :], de0[None, :],
                (de1 * cz)[None, :], (de1 * cy)[None, :], de1[None, :],
                (de2 * cz)[None, :], (de2 * cy)[None, :], de2[None, :],
                dxh[None, :], (-dxh * cy)[None, :], (-dxh * cz)[None, :],
                dwmul[None, :],
                jnp.zeros((3, TB_LANE), jnp.float32),
            ], axis=0))  # (16, 128)
        dtab = _dot_hi_onehot(
            jnp.concatenate(da_l, axis=1),                  # (16, tb)
            jnp.concatenate(ot_l, axis=1),                  # (tbl, tb)
            (((1,), (1,)), ((), ())), 1)                    # (16, TBL)
        # Written NATTR-major: a (tbl, 16) output block pads 8x under
        # the (8, 128) f32 tiling (two ~3.8 GB buffers at 1024^3); the
        # (16, tbl) layout is unpadded and also drops the in-kernel
        # transpose. The caller transposes once outside.
        dtab_ref[0] = dtab

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp op
# ---------------------------------------------------------------------------


def _a_block(p0, nblk):
    return jnp.where((p0 // LATTICE) % 2 == 0, p0 // PANEL, nblk)


def _b_block(p0, nblk):
    return jnp.where((p0 // LATTICE) % 2 == 1, (p0 - LATTICE) // PANEL, nblk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _seg_accumulate(tables, batch_tile, batch_p0, flags, cells_b, tblidx_b,
                    mask_a, mask_b, mask_c, cfg):
    """(B, 16, TBL) tables (NATTR-major) -> (n, n, n) occupancy.

    NATTR-major because pallas operands must sit in the default layout:
    a 16-minor (B, TBL, 16) array tiles to (8, 128) with 16 live lanes
    — 8x HBM padding, 3.3 GB of the round-5 fwd+bwd OOM at 1024^3. The
    kernels index attributes by row anyway (they used to transpose the
    block in VMEM).

    cfg = hashable (n, tc, tb_sub, tbl, tz, num_batches, prm
    [, extra_tiles]) — `extra_tiles` (default 0) appends masked dummy
    output-tile rows for sharded layouts' pad batches (the masks must
    then cover num_tiles + extra_tiles rows)."""
    return _seg_fwd_call(tables, batch_tile, batch_p0, flags, cells_b,
                         tblidx_b, mask_a, mask_b, mask_c, cfg)


def _seg_cfg_unpack(cfg):
    n, tc, tb_sub, tbl, tz, num_batches, prm = cfg[:7]
    extra_tiles = cfg[7] if len(cfg) > 7 else 0
    return n, tc, tb_sub, tbl, tz, num_batches, prm, extra_tiles


def _seg_combine_kernel(tz: int, ty: int):
    """Fold the two family outputs + the carry into the dense grid.

    One grid step per (tile, x-block): reads out_a block j, out_b
    blocks j-1 and j (two index maps on the same array — the bwd
    kernel's splice pattern), and writes occ's (tz, ty, PANEL) block
    directly, so NO grid-sized XLA temp exists between the accumulate
    kernel and the dense grid. The XLA formulations both blow the
    1024^3 HBM budget (scripts/probe_seg1024_mem.py): transposed-column
    combine = four ~4 GB copies live (16.39G), block-space combine =
    2x-padded 64-lane-minor temps (24.58G)."""
    from jax.experimental import pallas as pl

    def kernel(a_ref, bprev_ref, bcur_ref, pre_ref, out_ref):
        j = pl.program_id(1)
        a = a_ref[0, 0]                                  # (tc, PANEL)
        # Family-B panels sit at 128k + 64: occ block j's lanes
        # [0, 64) come from B block j-1's upper half, [64, 128) from
        # B block j's lower half (static lane slices; block 0's
        # missing predecessor contributes zero).
        hi = bprev_ref[0, 0, :, LATTICE:PANEL]
        hi = jnp.where(j > 0, hi, jnp.zeros_like(hi))
        lo = bcur_ref[0, 0, :, 0:LATTICE]
        shifted = jnp.concatenate([hi, lo], axis=1)
        # Carry: lanes [0, 64) get 64-group 2j's suffix sum, the rest
        # group 2j+1's (pre arrives row-major: (tc, 2)).
        tc = a.shape[0]
        carry = jnp.concatenate(
            [jnp.broadcast_to(pre_ref[0, 0, :, 0:1], (tc, LATTICE)),
             jnp.broadcast_to(pre_ref[0, 0, :, 1:2], (tc, LATTICE))],
            axis=1)
        # Same per-element association as the XLA combine:
        # (a + shifted_b) + carry.
        out_ref[...] = (a + shifted + carry).reshape(out_ref.shape)

    return kernel


def _seg_fwd_call(tables, batch_tile, batch_p0, flags, cells_b, tblidx_b,
                  mask_a, mask_b, mask_c, cfg):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, tc, tb_sub, tbl, tz, num_batches, prm, xt = _seg_cfg_unpack(cfg)
    nt = (n * n) // tc
    nt_out = nt + xt
    nblk = n // PANEL
    pr = jnp.asarray(np.asarray(prm, np.float32))
    slot = pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0))
    # Unvisited blocks keep the aliased zeros (Pallas outputs are
    # otherwise uninitialized): the three mask where-passes this
    # replaces each cost a full extra output buffer in HBM — at 1024^3
    # they pushed the fwd+bwd jit past the chip (round-4c battery).
    # The mask arrays still arrive from the plan; they are redundant.
    del mask_a, mask_b, mask_c
    init_a = jnp.zeros((nt_out, nblk + 1, tc, PANEL), jnp.float32)
    init_b = jnp.zeros((nt_out, nblk + 1, tc, PANEL), jnp.float32)
    init_c = jnp.zeros((nt_out, n // LATTICE, 1, tc), jnp.float32)
    out_a, out_b, carry = pl.pallas_call(
        _seg_fwd_kernel(n, tc, tb_sub, tbl, tz),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_batches,),
            in_specs=[
                slot, slot,
                pl.BlockSpec((1, NATTR, tbl), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, tc, PANEL),
                             lambda b, bt, p0, fl:
                             (bt[b], _a_block(p0[b], nblk), 0, 0)),
                pl.BlockSpec((1, 1, tc, PANEL),
                             lambda b, bt, p0, fl:
                             (bt[b], _b_block(p0[b], nblk), 0, 0)),
                pl.BlockSpec((1, 1, 1, tc),
                             lambda b, bt, p0, fl:
                             (bt[b], p0[b] // LATTICE, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((tc, PANEL), jnp.float32),
                            pltpu.VMEM((1, tc), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nt_out, nblk + 1, tc, PANEL), jnp.float32),
            jax.ShapeDtypeStruct((nt_out, nblk + 1, tc, PANEL), jnp.float32),
            jax.ShapeDtypeStruct((nt_out, n // LATTICE, 1, tc), jnp.float32),
        ],
        input_output_aliases={7: 0, 8: 1, 9: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(batch_tile, batch_p0, flags, cells_b, tblidx_b, tables, pr,
      init_a, init_b, init_c)

    return _seg_combine(out_a, out_b, carry, n=n, tc=tc, tz=tz, nt=nt)


def _seg_combine(out_a, out_b, carry, *, n: int, tc: int, tz: int, nt: int):
    """Dense grid from the accumulate kernel's family outputs + carry.
    Geometry-independent data movement + two adds per element; the
    pallas and XLA paths are bit-identical (test_combine_kernel_
    matches_xla drives this function directly)."""
    from jax.experimental import pallas as pl

    nblk = n // PANEL
    # Carry: every column left of a panel gets the panel's weight sum.
    c = carry[:nt, :, 0, :]                              # (nt, n/64, tc)
    pre = jnp.flip(jnp.cumsum(jnp.flip(c, 1), axis=1), 1) - c  # sum cs > j
    ty = tc // tz
    tyn = n // ty

    on_tpu = jax.default_backend() == "tpu"
    combine = os.environ.get("SEG_COMBINE", "pallas" if on_tpu else "xla")
    if combine == "pallas":
        # Hardware path: the combine kernel writes the dense grid
        # directly (no grid-sized XLA temps — both XLA formulations
        # exceed the 1024^3 HBM budget, see _seg_combine_kernel). Kept
        # off the interpret path only for test wall-clock (nt * nblk
        # Python-interpreted steps); equivalence is pinned by
        # test_combine_kernel_matches_xla + the @256 hardware smoke.
        pre_t2 = pre.reshape(nt, nblk, 2, tc).transpose(0, 1, 3, 2)
        return pl.pallas_call(
            _seg_combine_kernel(tz, ty),
            grid=(nt, nblk),
            in_specs=[
                pl.BlockSpec((1, 1, tc, PANEL), lambda t, j: (t, j, 0, 0)),
                pl.BlockSpec((1, 1, tc, PANEL),
                             lambda t, j: (t, jnp.maximum(j - 1, 0), 0, 0)),
                pl.BlockSpec((1, 1, tc, PANEL), lambda t, j: (t, j, 0, 0)),
                pl.BlockSpec((1, 1, tc, 2), lambda t, j: (t, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((tz, ty, PANEL),
                                   lambda t, j: (t // tyn, t % tyn, j)),
            out_shape=jax.ShapeDtypeStruct((n, n, n), jnp.float32),
            interpret=not on_tpu,
        )(out_a, out_b, out_b, pre_t2)

    # XLA combine (CPU/interpret path; small-N hardware A/B via
    # SEG_COMBINE=xla): transposed-column reassembly.
    a_t = out_a[:nt, :nblk].transpose(0, 2, 1, 3).reshape(nt, tc, n)
    b_t = out_b[:nt, :nblk].transpose(0, 2, 1, 3).reshape(nt, tc, n)
    occ_t = a_t
    # Family-B panels live in 64-shifted column space.
    occ_t = occ_t + jnp.concatenate(
        [jnp.zeros((nt, tc, LATTICE), jnp.float32), b_t[:, :, :n - LATTICE]],
        axis=2)
    pre_t = pre.transpose(0, 2, 1)                       # (nt, tc, n/64)
    occ_t = occ_t + jnp.broadcast_to(
        pre_t[:, :, :, None], (nt, tc, n // LATTICE, LATTICE)
    ).reshape(nt, tc, n)

    # Square-tile reassembly: tile t = (z//tz) * (n//ty) + (y//ty).
    occ = occ_t.reshape(n // tz, n // ty, tz, ty, n)
    return occ.transpose(0, 2, 1, 3, 4).reshape(n, n, n)


def _seg_fwd_rule(tables, batch_tile, batch_p0, flags, cells_b, tblidx_b,
                  mask_a, mask_b, mask_c, cfg):
    out = _seg_fwd_call(tables, batch_tile, batch_p0, flags, cells_b,
                        tblidx_b, mask_a, mask_b, mask_c, cfg)
    # Scalar scheduling token: the backward ties its cotangent to this
    # (see _seg_bwd_rule) so XLA cannot hoist the 4 GB g_t transpose
    # ahead of the forward combine — before the tie, the two 4.5 GB
    # zero-init output aliases, occ, AND g_t coexisted (the 17.58G
    # 1024^3 compile OOM, scripts/probe_seg1024_mem.py breakdown).
    tok = out.reshape(-1)[0]
    return out, (tables, batch_tile, batch_p0, flags, cells_b, tblidx_b,
                 mask_a, mask_b, mask_c, tok)


def _seg_bwd_rule(cfg, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (tables, batch_tile, batch_p0, flags, cells_b, tblidx_b,
     mask_a, mask_b, mask_c, tok) = res
    # Order the backward AFTER the forward's combine: `tok` is a scalar
    # of the forward output, so this barrier makes every consumer of g
    # (the g_t transpose below) depend on the combine having executed —
    # by which point the forward's two (nt, nblk+1, tc, PANEL) outputs
    # are dead. Without it the scheduler hoists g_t (for a sum-style
    # loss g is a constant broadcast with no data dependencies) and the
    # program needs 17.58G at 1024^3; with it the fwd combine's ~13.5G
    # is the peak. A barrier on g_t alone does NOT do this — it pins
    # one materialization but orders nothing (round-5 negative result).
    g = jax.lax.optimization_barrier((g, tok))[0]
    n, tc, tb_sub, tbl, tz, num_batches, prm, xt = _seg_cfg_unpack(cfg)
    nt = (n * n) // tc
    nblk = n // PANEL
    ty = tc // tz
    pr = jnp.asarray(np.asarray(prm, np.float32))

    # ONE materialized rearrangement of the cotangent: the square-tile
    # row layout (nt, tc, n) — its minor dim n keeps the (8, 128) f32
    # tiling unpadded, and the kernel blocks it at (1, tc, PANEL) grain
    # (last block dim 128 satisfies Mosaic's last-two-dims rule; a
    # 64-minor block or a 64-minor 4D array both fail on hardware —
    # rejected block shape / 2x = 8 GB tile-padding respectively, and
    # interpret mode checks neither).
    g_t = g.reshape(n // tz, tz, n // ty, ty, n).transpose(
        0, 2, 1, 3, 4).reshape(nt, tc, n)
    if xt:
        # Pad batches read the extra tiles' zero cotangents -> zero dtab.
        g_t = jnp.concatenate([g_t, jnp.zeros((xt, tc, n), g.dtype)])
    nt_o = nt + xt
    # g_t feeds TWO pallas operands (panel j and the family-B splice's
    # j+1). Without the barrier XLA REMATERIALIZES the whole cotangent
    # producer fusion once per operand — two 4 GB copies at 1024^3, the
    # difference between fitting and the round-5 17.58G OOM. The
    # barrier pins one materialization that both operands alias.
    g_t = jax.lax.optimization_barrier(g_t)
    gs = g_t.reshape(nt_o, tc, n // LATTICE, LATTICE).sum(-1)
    gpre = jnp.concatenate(
        [jnp.zeros((nt_o, tc, 1), g.dtype),
         jnp.cumsum(gs, axis=-1)[:, :, :-1]], axis=-1)   # exclusive prefix
    gpre = gpre.transpose(0, 2, 1)[:, :, None, :]        # (nt_o, n/64, 1, tc)

    slot = pl.BlockSpec((1, tb_sub, TB_LANE), lambda b, *_: (b, 0, 0))
    dtab = pl.pallas_call(
        _seg_bwd_kernel(n, tc, tb_sub, tbl, tz),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_batches,),
            in_specs=[
                slot, slot,
                pl.BlockSpec((1, NATTR, tbl), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tc, PANEL),
                             lambda b, bt, p0, fl:
                             (bt[b], 0, p0[b] // PANEL)),
                pl.BlockSpec((1, tc, PANEL),
                             lambda b, bt, p0, fl:
                             (bt[b], 0,
                              jnp.minimum(p0[b] // PANEL + 1,
                                          n // PANEL - 1))),
                pl.BlockSpec((1, 1, 1, tc),
                             lambda b, bt, p0, fl:
                             (bt[b], p0[b] // LATTICE, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, NATTR, tbl),
                                   lambda b, *_: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((num_batches, NATTR, tbl),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(batch_tile, batch_p0, flags, cells_b, tblidx_b, tables, pr,
      g_t, g_t, gpre)
    return (dtab, _float0(batch_tile), _float0(batch_p0), _float0(flags),
            _float0(cells_b), _float0(tblidx_b), _float0(mask_a),
            _float0(mask_b), _float0(mask_c))


_seg_accumulate.defvjp(_seg_fwd_rule, _seg_bwd_rule)


# ---------------------------------------------------------------------------
# Plan (all static host-side layout)
# ---------------------------------------------------------------------------


def _xplane(coords_np: np.ndarray, faces_np: np.ndarray):
    """Per-face x-hit plane (P, Q, R) and raw A = cross()[0] — the host
    mirror of `triangle_coeffs` rows 9..11."""
    tri = coords_np[faces_np]
    a, b3, c3 = tri[:, 0], tri[:, 1], tri[:, 2]
    cr = np.cross(b3 - a, c3 - a).astype(np.float32)
    ca, cb, cc = cr[:, 0], cr[:, 1], cr[:, 2]
    cd = ca * a[:, 0] + cb * a[:, 1] + cc * a[:, 2]
    safe = np.where(np.abs(ca) < 1e-20, np.float32(1e-20), ca)
    return cd / safe, cb / safe, cc / safe, ca


class SegSoftPlan:
    """Static (tile, panel, triangle) batch layout + per-batch tables.

    Built from a `make_soft_plan` FragmentPlan plus the coordinates the
    plan was built against (x_hit must be evaluated host-side to assign
    panels).  The panel assignment tolerates ~ (MARGIN - 16) voxels of
    x_hit drift before sigmoid tails leak past a panel edge — well
    inside the raster-window drift guard that already forces plan
    refreshes (`voxtpu.models.fit`)."""

    def __init__(self, soft_plan, coords, tc: int = 128, tb_sub: int = 4,
                 tbl: int = 128, tz: int = 8):
        spec = soft_plan.spec
        n = spec.n
        if n < 2 * PANEL or n % PANEL:
            raise ValueError(
                f"segmented engine needs n >= {2 * PANEL} and n % {PANEL} "
                f"== 0 (got {n}); use soft_voxelize_fused below that")
        if n > 4096:
            raise ValueError(
                f"segmented engine caps at n = 4096 (got {n}): the int32 "
                f"(tile, panel) run key tile*n + p0 < n^3/tc reaches 2^32 "
                f"at 8192")
        ty = tc // tz
        if tc % tz or n % tz or n % ty:
            raise ValueError(f"tz={tz} must divide tc={tc} and n={n}")
        self.spec = spec
        self.tc = tc
        self.tb_sub = tb_sub
        self.tbl = tbl
        self.tz = tz
        tb = tb_sub * TB_LANE
        vs = np.float32(spec.voxel_size)
        org = np.asarray(spec.origin, np.float32)

        # Per-face x-hit plane (host mirror of `triangle_coeffs`; only
        # steers panel assignment, so float parity is not required).
        coords_np = np.asarray(coords, np.float32)
        faces_np = np.asarray(soft_plan.faces_array)
        fp, fq, fr, f_a = _xplane(coords_np, faces_np)

        # Per-face window center/radius + build-time x-plane snapshot:
        # feeds `xhit_drift_vox`, the seg-specific refresh guard (panel
        # assignments go stale under x_hit motion, which VERTEX drift
        # does not bound — x_hit amplifies by ~|Q|, |R|).
        num_faces_t = faces_np.shape[0]
        f_cy0 = np.zeros(num_faces_t, np.float32)
        f_cz0 = np.zeros(num_faces_t, np.float32)
        f_rad = np.zeros(num_faces_t, np.float32)

        ys_l, zs_l, fc_l = [], [], []
        for bucket in soft_plan.buckets:
            window = bucket[0]
            sy = np.asarray(bucket[4])
            sz = np.asarray(bucket[5])
            fi = np.asarray(bucket[6])
            real = (sy < n) & (sz < n)  # padded rows carry sy = sz = n
            f_cy0[fi[real]] = org[1] + (
                (sy[real] + window * 0.5).astype(np.float32) * vs)
            f_cz0[fi[real]] = org[2] + (
                (sz[real] + window * 0.5).astype(np.float32) * vs)
            f_rad[fi[real]] = (window * 0.5 + 0.5) * vs
            dy = np.arange(window)[None, None, :]
            dz = np.arange(window)[None, :, None]
            ys = (sy[:, None, None] + dy)
            zs = (sz[:, None, None] + dz)
            ok = (ys >= 0) & (ys < n) & (zs >= 0) & (zs < n)
            ys = np.broadcast_to(ys, ok.shape)
            zs = np.broadcast_to(zs, ok.shape)
            fb = np.broadcast_to(fi[:, None, None], ok.shape)
            ys_l.append(ys[ok])
            zs_l.append(zs[ok])
            fc_l.append(fb[ok])
        # int32 throughout: tile * n + p0 < n^3 / tc < 2^31 for the
        # supported n <= 4096 (enforced above), and int64 passes over
        # ~10M slots measurably slow the build.
        if ys_l:
            ys = np.concatenate(ys_l).astype(np.int32)
            zs = np.concatenate(zs_l).astype(np.int32)
            faces = np.concatenate(fc_l).astype(np.int32)
        else:
            ys = zs = faces = np.zeros((0,), np.int32)
        f_total = ys.size

        cy = org[1] + (ys.astype(np.float32) * vs + vs * 0.5)
        cz = org[2] + (zs.astype(np.float32) * vs + vs * 0.5)
        xh = fp[faces] - fq[faces] * cy - fr[faces] * cz
        xv = (xh - org[0]) / vs
        # nan_to_num alone is not enough: near-edge-on faces have
        # finite Q,R ~ 1e18 (A ~ 0), so xv can be finite-but-huge and
        # overflow the int32 cast below (invalid-cast warning + garbage
        # panel).  Clip to a castable range — the p0 clip to
        # [0, n - PANEL] already defines the semantics for any x_hit
        # outside the grid (saturated profile + carry), so the exact
        # magnitude beyond 1e9 voxels is irrelevant.
        xv = np.clip(np.nan_to_num(xv, nan=0.0), -1e9, 1e9)
        p0 = np.clip(
            np.floor((xv - np.float32(MARGIN)) / np.float32(LATTICE))
            .astype(np.int32) * LATTICE,
            0, n - PANEL).astype(np.int32)

        tile = (zs // tz) * (n // ty) + ys // ty
        local = ((zs % tz) * ty + ys % ty).astype(np.int32)
        runkey = tile * np.int32(n) + p0  # p0 < n: unique (tile, panel)

        order = np.lexsort((faces, runkey))
        runkey = runkey[order]
        faces = faces[order]
        local = local[order]

        # Pair/batch layout via the shared greedy cutter (batches never
        # span two (tile, panel) keys; <= tb slots, <= tbl uniques).
        num_tiles = (n * n) // tc
        cut = _cut_batches(runkey, faces, local, tb_sub=tb_sub, tbl=tbl)
        batch_key = cut["batch_key"]
        bcount = batch_key.shape[0]
        batch_tile = (batch_key // n).astype(np.int32)
        batch_panel = (batch_key % n).astype(np.int32)

        self.flags = cut["flags"]
        self.batch_tile = batch_tile
        self.batch_panel = batch_panel
        self.cells_b = cut["cells_b"]
        self.tblidx_b = cut["tblidx_b"]
        self.num_batches = bcount
        self.num_pairs = cut["num_pairs"]
        self.num_fragments = int(f_total)
        self.table_face_flat = cut["table_face"].reshape(-1)
        self.num_faces = int(faces_np.shape[0])

        # Visited-block masks (unvisited Pallas out blocks are garbage).
        nblk = n // PANEL
        mask_a = np.zeros((num_tiles, nblk + 1), bool)
        mask_b = np.zeros((num_tiles, nblk + 1), bool)
        mask_c = np.zeros((num_tiles, n // LATTICE), bool)
        real = cut["nonempty"]
        bt_r = batch_tile[real]
        bp_r = batch_panel[real]
        fam_b = (bp_r // LATTICE) % 2 == 1
        mask_a[bt_r[~fam_b], bp_r[~fam_b] // PANEL] = True
        mask_b[bt_r[fam_b], (bp_r[fam_b] - LATTICE) // PANEL] = True
        mask_c[bt_r, bp_r // LATTICE] = True

        # Classed reductions for the expand / coords VJPs (shared
        # machinery with the fused engine).
        self.expand_cls_d, self.expand_inv_d = _build_classed_reduction(
            self.table_face_flat, self.num_faces)
        fl = faces_np.reshape(-1)
        self.num_vertices = int(fl.max(initial=-1)) + 1
        self.vert_cls_d, self.vert_inv_d = _build_classed_reduction(
            fl, self.num_vertices)

        fidx = np.where(self.table_face_flat < 0, self.num_faces,
                        self.table_face_flat).astype(np.int32)
        self.batch_tile_d = jnp.asarray(self.batch_tile, jnp.int32)
        self.batch_panel_d = jnp.asarray(self.batch_panel, jnp.int32)
        self.flags_d = jnp.asarray(self.flags, jnp.int32)
        self.cells_d = jnp.asarray(self.cells_b, jnp.int32)
        self.tblidx_d = jnp.asarray(self.tblidx_b, jnp.int32)
        self.mask_a_d = jnp.asarray(mask_a)
        self.mask_b_d = jnp.asarray(mask_b)
        self.mask_c_d = jnp.asarray(mask_c)
        self.fidx_d = jnp.asarray(fidx)
        self.faces_d = jnp.asarray(faces_np)

        # Host-only drift-guard snapshot (not pytree leaves; available
        # on the original plan object, which VoxelFit holds).
        self._faces_np = faces_np
        self._fp0, self._fq0, self._fr0 = fp, fq, fr
        self._fa0 = f_a
        self._cy0, self._cz0, self._rad = f_cy0, f_cz0, f_rad

    def xhit_drift_vox(self, coords) -> float:
        """Conservative max x_hit drift (voxels) of any active face
        since the plan was built.

        Panels are assigned from build-time x_hit and stay exact while
        x_hit moves less than MARGIN minus the sigmoid saturation width
        (~17 * tau_x_frac voxels); VERTEX drift does not bound x_hit
        drift (x_hit amplifies vertex motion by ~|Q|, |R|, unbounded
        for near-x-parallel triangles), so `VoxelFit(engine='seg')`
        refreshes on THIS metric as well.  The bound per face is the
        center delta plus a Lipschitz term over the raster window;
        faces whose x-plane sits far outside the grid's x-range in both
        configurations are ignored (their panels are clamped and fully
        saturated either way), as are exactly-degenerate faces (their
        kernel weight is 0)."""
        spec = self.spec
        n, vs = spec.n, spec.voxel_size
        c = np.asarray(coords, np.float32)
        p, q, r, a = _xplane(c, self._faces_np)
        dp = p - self._fp0
        dq = q - self._fq0
        dr = r - self._fr0
        d = (np.abs(dp - dq * self._cy0 - dr * self._cz0)
             + (np.abs(dq) + np.abs(dr)) * self._rad)
        xo = (self._fp0 - self._fq0 * self._cy0 - self._fr0 * self._cz0
              - spec.origin[0]) / vs
        xn = (p - q * self._cy0 - r * self._cz0 - spec.origin[0]) / vs
        band = 2.0 * MARGIN + self._rad / vs
        active = (((xo > -band) & (xo < n + band))
                  | ((xn > -band) & (xn < n + band)))
        active &= (np.abs(self._fa0) > 1e-20) & (np.abs(a) > 1e-20)
        if not active.any():
            return 0.0
        return float(np.nan_to_num(d[active], nan=np.inf).max() / vs)

    _LEAVES = ("batch_tile_d", "batch_panel_d", "flags_d", "cells_d",
               "tblidx_d", "mask_a_d", "mask_b_d", "mask_c_d", "fidx_d",
               "expand_cls_d", "expand_inv_d", "vert_cls_d", "vert_inv_d",
               "faces_d")
    _AUX = ("spec", "tc", "tb_sub", "tbl", "tz", "num_batches", "num_pairs",
            "num_fragments", "num_faces", "num_vertices")

    def tree_flatten(self):
        return (tuple(getattr(self, k) for k in self._LEAVES),
                tuple(getattr(self, k) for k in self._AUX))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        for k, v in zip(cls._AUX, aux):
            setattr(obj, k, v)
        for k, v in zip(cls._LEAVES, leaves):
            setattr(obj, k, v)
        return obj


jax.tree_util.register_pytree_node_class(SegSoftPlan)


def soft_voxelize_seg(coords, plan: SegSoftPlan, *,
                      tau_edge_frac: float = 0.25,
                      tau_x_frac: float = 0.5, clip: bool = True):
    """Differentiable occupancy via the segmented coefficient-table
    engine.  Same semantics as `soft_voxelize_fused(mode="exact8")`;
    sums are reordered (panel + carry vs full-row), so values agree to
    f32 summation-order tolerance.

    `plan` is a pytree: pass it THROUGH jit boundaries as an argument
    (closure constants embed the multi-MB layout arrays into HLO).

    The panel decomposition is exact only while the X-profile sigmoid
    saturates inside the MARGIN-voxel panel edge guard: f32 sigmoid
    rounds to 0/1 beyond ~17 sigmoid units, so tau_x_frac must satisfy
    MARGIN / tau_x_frac >= 17 (raises otherwise — use the fused engine
    for wider profiles).
    """
    if tau_x_frac * 17.0 > MARGIN:
        raise ValueError(
            f"tau_x_frac={tau_x_frac} too wide for the segmented engine: "
            f"the X sigmoid must saturate within the {MARGIN}-voxel panel "
            f"margin (tau_x_frac <= {MARGIN / 17.0:.2f}); use "
            f"soft_voxelize_fused for wider profiles")
    spec = plan.spec
    vs = spec.voxel_size
    tau_e = tau_edge_frac * vs * vs
    tau_x = tau_x_frac * vs

    tri = _gather_tri(coords, plan.faces_d, plan.vert_cls_d,
                      plan.vert_inv_d)
    coeffs = triangle_coeffs(tri)
    coeffs = jnp.concatenate(
        [coeffs, jnp.zeros((1, NATTR), jnp.float32)], axis=0)
    tables = _expand_rows(coeffs, plan.fidx_d, plan.expand_cls_d,
                          plan.expand_inv_d)
    # NATTR-major for the kernels: 16-minor would pad 8x in HBM under
    # pallas's default-layout requirement (see _seg_accumulate).
    tables_t = tables.reshape(
        plan.num_batches, plan.tbl, NATTR).transpose(0, 2, 1)

    prm = (float(spec.origin[0]), float(spec.origin[1]),
           float(spec.origin[2]), float(vs), float(tau_e), float(tau_x))
    cfg = (spec.n, plan.tc, plan.tb_sub, plan.tbl, plan.tz,
           plan.num_batches, prm)
    occ = _seg_accumulate(tables_t, plan.batch_tile_d, plan.batch_panel_d,
                          plan.flags_d, plan.cells_d, plan.tblidx_d,
                          plan.mask_a_d, plan.mask_b_d, plan.mask_c_d, cfg)
    if clip:
        occ = jnp.clip(occ, 0.0, 1.0)
    return occ
