"""Server driver for encrypted resize (homo/server_resize.cpp rebuild).

Streams the raster-RGB ciphertext grid from the client file and computes the
resized output in row tiles: the reference's 2/4-row sliding window
(fhe_resize.h:324-379) becomes a bounded source-row window per output tile,
with each tile one batched device dispatch.  Fractional offsets are
encrypted here under the public key (like the reference, fhe_resize.h:230)
unless --plain-fracts selects the plaintext fast path.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .common import (OpTimer, adopt_stream_params, base_parser, make_encoder,
                     make_params, maybe_profile, runtime_noise_check,
                     setup_platform)
from .client_resize import add_resize_flags


def main(argv=None):
    p = add_resize_flags(base_parser("Server-side FHE resize (fhetpu)"))
    p.add_argument("--tile-rows", type=int, default=4,
                   help="output rows per device dispatch")
    p.add_argument("--tile-cols", type=int, default=0,
                   help="output columns per device dispatch (0 = all; "
                        "shrink with --tile-rows to bound HBM for the "
                        "unrelinearized ct*ct bicubic path at large n)")
    p.add_argument("--sharded", action="store_true",
                   help="shard source rows over all available devices with "
                        "halo exchange (parallel.halo: ppermute neighbor "
                        "rows, all-gather fallback for extreme downscales); "
                        "supports plain and encrypted fracts +/- relin")
    p.add_argument("--host-window", action="store_true",
                   help="keep the streaming source window host-resident and "
                        "re-upload it per tile (lower peak HBM than the "
                        "default device-resident window; for memory-bound "
                        "configs like unrelinearized ct*ct at large n)")
    args = p.parse_args(argv)
    setup_platform(args)

    import jax
    import jax.numpy as jnp

    from ..bfv.crypto import Encryptor, PublicKey
    from ..bfv.evaluator import DeviceRelinKeys, Evaluator
    from ..io import serial
    from ..pipelines import resize as rz

    w, h, _c, pmod = serial.read_params_txt(os.path.join(args.keydir, "params.txt"))
    reader = serial.CtReader(args.cinfile)
    adopt_stream_params(args, reader, pmod)
    par = make_params(args)
    encoder = make_encoder(args)
    ev = Evaluator(par, encoder)
    mode = rz.BICUBIC if args.bicubic else rz.BILINEAR
    w2, h2 = args.width, args.height

    relin = None
    if args.relin and not args.plain_fracts:
        path = os.path.join(args.keydir, "evalkeys.npz")
        if not os.path.exists(path):
            raise SystemExit(
                f"--relin requires evaluation keys at {path}; run "
                "client_resize --send --relin (add --dbc for finer digits)"
            )
        loaded = np.load(path)

        class _RK:
            keys = {int(k[1:]): loaded[k] for k in loaded.files
                    if k.startswith("k")}
            digit_bits = int(loaded["digit_bits"]) if "digit_bits" in loaded.files else 0

        relin = DeviceRelinKeys(_RK())

    from ..bfv import noise
    runtime_noise_check(
        args,
        noise.estimate_resize_pipeline(
            par, encoder, args.bicubic, plain_fracts=args.plain_fracts,
            mean=True,
            relin_dbc=(relin.digit_bits if relin is not None else None),
        ),
        ("bicubic" if args.bicubic else "bilinear")
        + (" (plain fracts)" if args.plain_fracts
           else (" (encrypted fracts, ct*ct, relin)" if relin is not None
                 else " (encrypted fracts, ct*ct)"))
        + " resize server op",
    )

    encryptor = None
    if not args.plain_fracts:
        pk = PublicKey(
            data=serial.load_public_key(os.path.join(args.keydir, "pubkey.npz")),
            params=par,
        )
        encryptor = Encryptor(par, pk)

    row_plan = rz.axis_plan(h, h2, mode)
    col_plan = rz.axis_plan(w, w2, mode)
    if args.plain_fracts or relin is not None:
        size_out = 2
    else:
        size_out = 4 if mode == rz.BILINEAR else 8
    writer = serial.CtWriter(args.coutfile, size_out, par.L, par.n,
                             meta={"w": w2, "h": h2, "layout": "raster-rgb"})
    label = "Cubic" if args.bicubic else "Linear"
    interp_per_px = 20 if args.bicubic else 3
    t = OpTimer(label)
    tile = args.tile_rows

    if args.sharded:
        # spatial sharding with halo exchange over the whole device set
        # (the TPU-native replacement for the reference's streaming window
        # as a DISTRIBUTED engine, fhe_resize.h:308-392 / BASELINE config 3)
        from ..parallel import halo
        from ..parallel.mesh import make_mesh

        cts = reader.read(h * w * 3)
        assert cts is not None, "source stream truncated"
        src = jnp.asarray(cts.reshape(h, w, 3, 2, par.L, par.n))
        ndev = len(jax.devices())
        mesh = make_mesh({"sp": ndev})
        if args.verbose:
            print(f"sharded over {ndev} devices", file=sys.stderr)
        with maybe_profile(args):
            with t.span(h2 * w2 * interp_per_px):
                out = halo.resize_sharded(ev, src, h2, w2, mode, mesh,
                                          encryptor=encryptor, relin=relin)
                out.block_until_ready()
        writer.append(np.asarray(out).reshape(-1, size_out, par.L, par.n))
        reader.close()
        writer.close()
        t.emit()
        return

    # streaming source-row window (the reference's 2/4-row slide,
    # fhe_resize.h:324-379, generalized to per-tile ranges): source rows are
    # consumed monotonically, so only [win_lo, win_hi) rows live in memory.
    # Like the reference's slide (which loads-or-skips but ALWAYS reads every
    # row from the stream, fhe_resize.h:353-379), rows consumed from the
    # reader are tracked separately from the in-memory window: when
    # consecutive tiles leave a gap between row stencils (e.g. bilinear
    # 48->17, step 3), gap rows are read and discarded, never silently
    # skipped -- skipping desynchronizes every later read.
    #
    # The window lives ON DEVICE across tiles: only newly-read rows are
    # uploaded (jnp.asarray), then concatenated/sliced device-side.  The
    # previous host-resident window re-uploaded every overlapping row each
    # tile -- ~295 MB per 4-row tile at n=8192, which dominated wall clock
    # on a remote-tunnel link; with the delta upload each source row
    # crosses the host->device boundary exactly once.
    # Fixed-shape ring window [win_h, w, 3, 2, L, n], slid with a donated
    # roll + dynamic_update_slice: in/out shapes match, so XLA aliases the
    # buffer IN PLACE and the window never holds a transient second copy
    # (the previous eager concatenate kept old+new window live; donation
    # on a concatenate is unusable -- output is larger than every input --
    # so the fix is a constant-shape update, VERDICT r3/r4 HBM-margin
    # item).  win_h is the max source-row span any output tile needs, the
    # same bound _run_tiles pads dispatches to, so one buffer shape (and
    # one tile executable) serves the whole run.  Gap rows between tile
    # stencils are still read from the stream (never silently skipped)
    # but no longer uploaded at all.
    win_h = max(
        int(row_plan.idx[y0:min(y0 + tile, h2)].max())
        - int(row_plan.idx[y0:min(y0 + tile, h2)].min()) + 1
        for y0 in range(0, h2, tile)
    )
    window = None  # device ring [win_h, ...] (variable-height host array
    win_lo = 0     # w/ --host-window)
    win_valid = 0  # buf rows [0, win_valid) hold source rows [win_lo, ...)
    rows_read = 0  # total source rows consumed from the stream

    import functools

    @functools.lru_cache(maxsize=None)
    def _slide_fn(drop, pos):
        # static (drop, pos) -> tiny donated executable; distinct combos
        # are bounded by the row-step pattern of the axis plan
        def step(buf, new):
            b = jnp.roll(buf, -drop, axis=0) if drop else buf
            return jax.lax.dynamic_update_slice(
                b, new, (pos, 0, 0, 0, 0, 0))
        return jax.jit(step, donate_argnums=(0,))

    def advance_to(lo, hi):
        nonlocal window, win_lo, win_valid, rows_read
        more = None
        if rows_read < hi:
            more = reader.read((hi - rows_read) * w * 3)
            assert more is not None, "source stream truncated"
            more = more.reshape(-1, w, 3, 2, par.L, par.n)
        if args.host_window:
            if more is not None:
                window = more if window is None else np.concatenate(
                    [window, more], axis=0)
            drop = lo - win_lo
            if drop > 0:
                window = window[drop:]
                win_lo = lo
            rows_read = max(rows_read, hi)
            return window
        if window is None:
            window = jnp.zeros((win_h,) + (w, 3, 2, par.L, par.n),
                               jnp.uint32)
        new = None
        if more is not None:
            keep = max(lo - rows_read, 0)  # gap rows: read, not uploaded
            if keep < more.shape[0]:
                new = jnp.asarray(more[keep:])
            rows_read = hi
        drop = min(max(lo - win_lo, 0), win_valid)
        pos = win_valid - drop
        if new is not None:
            window = _slide_fn(drop, pos)(window, new)
            win_valid = pos + new.shape[0]
        elif drop:
            window = _slide_fn(drop, 0)(window, window[:0])
            win_valid = pos
        win_lo = lo
        assert win_valid == hi - lo <= win_h, (win_valid, lo, hi, win_h)
        return window

    ctile = args.tile_cols if args.tile_cols > 0 else w2
    with maybe_profile(args):
        _run_tiles(args, ev, encryptor, relin, reader, writer, t, row_plan,
                   col_plan, mode, tile, ctile, w, w2, h2, size_out, par,
                   advance_to)
    reader.close()
    writer.close()
    t.emit()


def _run_tiles(args, ev, encryptor, relin, reader, writer, t, row_plan,
               col_plan, mode, tile, ctile, w, w2, h2, size_out, par,
               advance_to):
    import sys

    import jax.numpy as jnp
    import numpy as np

    from ..pipelines import resize as rz

    interp_per_px = 20 if args.bicubic else 3
    tile_fn = rz.make_tile_fn(ev, mode, args.plain_fracts, relin)
    # UNIFORM tile shapes: pad the source window to the max height any tile
    # needs, and pad short output-row/column tails by repeating the last
    # plan entry (sliced off after).  Every dispatch then shares ONE
    # compiled executable -- without this the final output row's smaller
    # window (e.g. height 2 at 48->17) triggers a from-scratch multi-minute
    # XLA compile of the whole ct*ct graph at n=8192, which is what pushed
    # the round-3/4 bicubic config past the bench stage timeout.
    win_h = max(
        int(row_plan.idx[y0:min(y0 + tile, h2)].max())
        - int(row_plan.idx[y0:min(y0 + tile, h2)].min()) + 1
        for y0 in range(0, h2, tile)
    )

    def pad_tail(arr, k):
        return np.concatenate([arr, np.repeat(arr[-1:], k, axis=0)]) if k else arr

    for y0 in range(0, h2, tile):
        y1 = min(y0 + tile, h2)
        rp_idx = row_plan.idx[y0:y1]
        lo, hi = int(rp_idx.min()), int(rp_idx.max()) + 1
        win = advance_to(lo, hi)  # device-resident window
        if win.shape[0] < win_h:  # pad height (padded rows never indexed)
            cat = jnp if not args.host_window else np
            win = cat.concatenate(
                [win] + [win[-1:]] * (win_h - win.shape[0]), axis=0)
        pad_r = tile - (y1 - y0)
        rp = rz.AxisPlan(idx=pad_tail(rp_idx - lo, pad_r),
                         fract=pad_tail(row_plan.fract[y0:y1], pad_r))
        # column chunks bound the live intermediate tensors of one dispatch
        # (the unrelinearized bicubic ct*ct tensor product holds size-8
        # ciphertexts in BOTH RNS bases -- full 17-col tiles exhaust HBM at
        # n=8192, bench_results/bicubic_boaz_17x17_ctct round-2 crash)
        row_chunks = []
        for x0 in range(0, w2, ctile):
            x1 = min(x0 + ctile, w2)
            pad_c = ctile - (x1 - x0)
            cp = rz.AxisPlan(idx=pad_tail(col_plan.idx[x0:x1], pad_c),
                             fract=pad_tail(col_plan.fract[x0:x1], pad_c))
            yops, xops = rz.make_fract_bundles(ev, rp, cp, mode,
                                               encryptor=encryptor,
                                               relin=relin)
            with t.span((y1 - y0) * (x1 - x0) * interp_per_px):
                out = tile_fn(win, rp.idx, cp.idx, yops, xops)
                out.block_until_ready()
            row_chunks.append(np.asarray(out)[: y1 - y0, : x1 - x0])
            del out
        full = row_chunks[0] if len(row_chunks) == 1 else np.concatenate(
            row_chunks, axis=1
        )
        writer.append(full.reshape(-1, size_out, par.L, par.n))
        if args.verbose:
            print(f"rows {y0}..{y1} done (window {lo}..{hi})", file=sys.stderr)


if __name__ == "__main__":
    main()
