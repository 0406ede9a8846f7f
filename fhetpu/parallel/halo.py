"""Spatially-sharded encrypted resize with halo exchange (SURVEY.md 2.3).

The reference's ResizeImage streams a 2/4-row ciphertext window through one
process (fhe_resize.h:350-379).  TPU-native: source image rows shard across
the "sp" mesh axis, and each device exchanges boundary ciphertext rows with
its ring neighbors via jax.lax.ppermute before computing its shard of output
rows -- the bilinear stencil needs a 1-row halo, bicubic 2 rows (plus the
shard-alignment slack, computed exactly from the static sampling plan).

Per-output-row data (stencil indices, fract operand tables) rides in as
row-sharded arrays so the SPMD program is uniform across devices; edge
clamping falls out of the global plan (devices at the image boundary never
index into their wrapped-around halo rows because the reference's
GetPixelClamped semantics clamp the global indices first).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np

from ..pipelines import resize as rz


def _shard_plans(row_plan: rz.AxisPlan, H: int, H2: int, D: int):
    """Static halo extents so every device's output rows only touch
    [start - h_up, end + h_dn) source rows of its own shard."""
    assert H % D == 0 and H2 % D == 0, "rows must divide the mesh axis"
    Hc, H2c = H // D, H2 // D
    h_up = h_dn = 0
    for d in range(D):
        rows = row_plan.idx[d * H2c : (d + 1) * H2c]
        if rows.size == 0:
            continue
        h_up = max(h_up, d * Hc - int(rows.min()))
        h_dn = max(h_dn, int(rows.max()) - ((d + 1) * Hc - 1))
    h_up, h_dn = max(h_up, 0), max(h_dn, 0)
    if h_up > Hc or h_dn > Hc:
        raise ValueError(
            f"halo ({h_up},{h_dn}) exceeds shard height {Hc}: use fewer "
            "devices or an all-gather fallback for extreme downscales"
        )
    return Hc, H2c, h_up, h_dn


def resize_sharded(ev, src, H2: int, W2: int, mode: int, mesh, axis: str = "sp"):
    """Row-sharded encrypted resize (plain-fract fast path).

    src: jnp [H, W, 3, 2, L, n] sharded over rows; returns output rows
    [H2, W2, 3, 2, L, n] sharded the same way.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard_map = jax.shard_map if hasattr(jax, "shard_map") else None
    if shard_map is None:
        from jax.experimental.shard_map import shard_map  # jax < 0.6

    H, W = src.shape[0], src.shape[1]
    D = mesh.shape[axis]
    row_plan = rz.axis_plan(H, H2, mode)
    col_plan = rz.axis_plan(W, W2, mode)
    Hc, H2c, h_up, h_dn = _shard_plans(row_plan, H, H2, D)
    taps = 2 if mode == rz.BILINEAR else 4

    # fract operand tables, stacked per output row / column
    yts, yomts, yt2s, yt3s = rz.fract_polys(ev.encoder, row_plan.fract, mode)
    xops = rz.PlainFracts(
        ev, col_plan.fract, (1, W2, 1), mode
    )  # replicated (column axis)

    def tables(coeff_list):
        from ..bfv.evaluator import PlainOperand

        ops = [PlainOperand(ev.params, c) for c in coeff_list]
        mul = np.stack([o.mul_ntt for o in ops])  # [H2, L, n]
        sh = np.stack([o.mul_ntt_shoup for o in ops])
        return mul, sh

    y_tabs = [tables(yts), tables(yomts)]
    if mode == rz.BICUBIC:
        y_tabs += [tables(yt2s), tables(yt3s)]
    row_idx = row_plan.idx.astype(np.int32)  # [H2, taps] global

    in_specs = (P(axis),) * (2 + 2 * len(y_tabs))
    perm_dn = [(i, (i + 1) % D) for i in range(D)]  # send down (to next)
    perm_up = [(i, (i - 1) % D) for i in range(D)]  # send up (to prev)

    def step(src_local, row_idx_local, *ytab_locals):
        d = lax.axis_index(axis)
        parts = []
        if h_up:
            parts.append(lax.ppermute(src_local[-h_up:], axis, perm_dn))
        parts.append(src_local)
        if h_dn:
            parts.append(lax.ppermute(src_local[:h_dn], axis, perm_up))
        window = jnp.concatenate(parts, axis=0) if len(parts) > 1 else src_local
        local_idx = row_idx_local - (d * Hc - h_up)  # [H2c, taps]

        from ..bfv.evaluator import Ct

        # gather row stencils [taps, H2c, W, ...] then column stencils
        rows = jnp.take(window, local_idx.T.reshape(-1), axis=0)
        rows = rows.reshape((taps, H2c) + window.shape[1:])
        grid = jnp.take(rows, jnp.asarray(col_plan.idx.T.reshape(-1)), axis=2)
        grid = grid.reshape((taps, H2c, taps, W2) + window.shape[2:]).transpose(
            0, 2, 1, 3, 4, 5, 6, 7
        )
        from ..core import ntt as nttmod

        gridN = nttmod.ntt(grid, ev.tables_q)

        def cell(r, c):
            return Ct(gridN[r, c], True)

        class YOps:
            pass

        yops = YOps()
        names = ["t", "one_minus_t", "t2", "t3"]
        for name, (mul, sh) in zip(names, _pair(ytab_locals)):
            op = rz.StackedPlain(
                mul.reshape((H2c, 1, 1, 1) + mul.shape[1:]),
                sh.reshape((H2c, 1, 1, 1) + sh.shape[1:]),
            )
            setattr(yops, name, op)

        cols = []
        for r in range(taps):
            if mode == rz.BILINEAR:
                cols.append(rz.linear_interp(ev, cell(r, 0), cell(r, 1), xops, True))
            else:
                cols.append(
                    rz.cubic_interp(ev, cell(r, 0), cell(r, 1), cell(r, 2),
                                    cell(r, 3), xops, True)
                )
        if mode == rz.BILINEAR:
            out = rz.linear_interp(ev, cols[0], cols[1], yops, True)
        else:
            out = rz.cubic_interp(ev, cols[0], cols[1], cols[2], cols[3], yops, True)
        return nttmod.intt(out.data, ev.tables_q)

    args = [src, jnp.asarray(row_idx)]
    for mul, sh in y_tabs:
        args += [jnp.asarray(mul), jnp.asarray(sh)]
    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=P(axis))
    return jax.jit(fn)(*args)


def _pair(flat):
    return [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]
