"""Shared CLI plumbing for the client/server drivers.

Mirrors the reference's cxxopts flag surface (client_jpeg.cpp:31-44):
-r/--recieve -s/--send -v/--verbose -f/--file -c/--coutfile -i/--cinfile
-o/--outfile --ncoeff --fcoeff --cmod --pmod --base (+ pipeline extras), and
fixes the reference's bug where --base was parsed under the wrong key
(client_jpeg.cpp:66) -- here --base actually works.
"""

from __future__ import annotations

import argparse
import os
import time

from ..bfv.encoder import FractionalEncoder
from ..bfv.params import (
    DEFAULT_DBC,
    DEFAULT_PLAIN_MODULUS,
    DEFAULT_POLY_DEGREE,
    BfvParams,
)

N_NUMBER_COEFFS = 100  # fhe_image.h:24
N_FRACTIONAL_COEFFS = 100  # fhe_image.h:23
POLY_BASE = 2  # fhe_image.h:22


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("-r", "--recieve", action="store_true",
                   help="client is decrypting results")
    p.add_argument("-s", "--send", action="store_true",
                   help="client is encrypting the raw image")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("-f", "--file", default="./image/test.jpg",
                   help="input image filename")
    p.add_argument("-c", "--coutfile", default="./image/nothingpersonnel.txt",
                   help="ciphertext output stream")
    p.add_argument("-i", "--cinfile", default="./image/zoop.txt",
                   help="ciphertext input stream")
    p.add_argument("-o", "--outfile", default="./image/test_out.jpg",
                   help="result image filename")
    p.add_argument("--ncoeff", type=int, default=N_NUMBER_COEFFS)
    p.add_argument("--fcoeff", type=int, default=N_FRACTIONAL_COEFFS)
    p.add_argument("--cmod", type=int, default=None,
                   help="polynomial ring degree n (reference's misnamed flag; "
                        f"default {DEFAULT_POLY_DEGREE}; receiving stages "
                        "self-configure from the stream header)")
    p.add_argument("--pmod", type=int, default=None,
                   help=f"plaintext modulus t (default {DEFAULT_PLAIN_MODULUS})")
    p.add_argument("--base", type=int, default=POLY_BASE,
                   help="fractional encoding base")
    p.add_argument("--keydir", default="./keys", help="key/params directory")
    p.add_argument("--platform", default=os.environ.get("FHETPU_PLATFORM", ""),
                   help="jax platform override (cpu/tpu/axon); empty = default")
    p.add_argument("--chunk-blocks", type=int, default=64,
                   help="blocks per device dispatch (streaming window)")
    p.add_argument("--no-noise-check", action="store_true",
                   help="skip the pre-dispatch invariant-noise budget check")
    p.add_argument("--profile-dir", default="",
                   help="write a jax.profiler trace of the server compute "
                        "to this directory (open with TensorBoard/xprof; "
                        "the TPU-native analog of the reference's "
                        "chrono-span CSV, SURVEY.md 3.5)")
    return p


def maybe_profile(args):
    """Context manager: jax.profiler.trace(args.profile_dir) or a no-op."""
    import contextlib

    if getattr(args, "profile_dir", ""):
        import jax

        return jax.profiler.trace(args.profile_dir)
    return contextlib.nullcontext()


def setup_platform(args):
    """Apply platform override + persistent compile cache before first jax
    device use.  The cache matters operationally: the deep ct*ct pipeline
    graphs (bicubic BEHZ at n=8192) take many minutes to compile, and
    without a persistent cache every server invocation -- including the
    bench harness's hang-timeout retries -- pays it again.  Opt out with
    FHETPU_NO_COMPILE_CACHE=1."""
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if not os.environ.get("FHETPU_NO_COMPILE_CACHE"):
        # default location: <checkout>/.jax_cache when running from a git
        # checkout (shared with tests/bench); for an installed package that
        # path would land inside site-packages (possibly read-only/shared),
        # so fall back to a per-user cache.  FHETPU_COMPILE_CACHE overrides.
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        repo_cache = os.path.join(repo, ".jax_cache")
        if not (os.path.isdir(repo_cache)
                or os.path.isdir(os.path.join(repo, ".git"))):
            repo_cache = os.path.expanduser("~/.cache/fhetpu/jax_cache")
        cache = os.environ.get("FHETPU_COMPILE_CACHE", repo_cache)
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:
            pass  # older jax without these options


def _apply_param_defaults(args):
    if args.cmod is None:
        args.cmod = DEFAULT_POLY_DEGREE
    if args.pmod is None:
        args.pmod = DEFAULT_PLAIN_MODULUS


def adopt_stream_params(args, reader=None, pmod=None):
    """Self-configure a receiving stage from the wire instead of flags.

    The ciphertext stream header carries (size, L, n) and the sender's
    params.txt carries t, so servers / --recieve need no --cmod/--pmod at
    all; an explicitly-passed flag that contradicts the wire is a hard
    error (the reference silently computes garbage on such a mismatch --
    both binaries must be launched with identical flags there)."""
    if reader is not None:
        if args.cmod is not None and args.cmod != reader.n:
            raise SystemExit(
                f"--cmod {args.cmod} contradicts the ciphertext stream "
                f"(n={reader.n}); omit --cmod to adopt the stream's"
            )
        args.cmod = reader.n
    if pmod is not None:
        if args.pmod is not None and args.pmod != pmod:
            raise SystemExit(
                f"--pmod {args.pmod} contradicts params.txt (t={pmod}); "
                "omit --pmod to adopt the sender's"
            )
        args.pmod = pmod


def auto_select_n(args, pipeline: str, bicubic: bool = False,
                  plain_fracts: bool = False, degree: int = 12,
                  relin_dbc=None):
    """When --send omits --cmod, pick the smallest ring degree whose
    worst-case noise estimate survives the pipeline (SEAL 2.3's
    ChooserEvaluator role, reference tests/parameters.cpp) instead of a
    blind default."""
    if args.cmod is not None:
        return
    if args.pmod is None:
        args.pmod = DEFAULT_PLAIN_MODULUS
    import sys as _sys

    from ..bfv import chooser, noise

    try:
        if pipeline == "jpeg":
            par = chooser.jpeg_parameters(t=args.pmod)
        elif pipeline == "resize":
            par = chooser.resize_parameters(bicubic, t=args.pmod,
                                            plain_fracts=plain_fracts,
                                            relin_dbc=relin_dbc)
        elif pipeline == "decode-harmonics":
            par = chooser.harmonics_decode_parameters(degree, t=args.pmod)
        else:
            return
    except noise.NoiseExhausted as e:
        raise SystemExit(str(e))
    args.cmod = par.n
    print(f"[chooser] --cmod omitted: selected n={par.n} for the {pipeline}"
          f"{' (bicubic)' if bicubic else ''} pipeline at t={args.pmod}",
          file=_sys.stderr)


def make_params(args) -> BfvParams:
    _apply_param_defaults(args)
    return BfvParams.create(n=args.cmod, t=args.pmod)


def make_encoder(args) -> FractionalEncoder:
    _apply_param_defaults(args)
    return FractionalEncoder(
        args.pmod, args.cmod, args.ncoeff, args.fcoeff, args.base
    )


def runtime_noise_check(args, budget, where: str):
    """First-class failure detection (SURVEY.md section 5): refuse to start
    a server op whose mean-case noise estimate is already exhausted, instead
    of discovering RMS=114 garbage after the chip-hour (the reference's only
    signal, benchmark/results.txt).  --verbose prints the remaining budget;
    --no-noise-check bypasses."""
    import sys as _sys

    from ..bfv.noise import NoiseExhausted

    if getattr(args, "no_noise_check", False):
        return
    try:
        budget.check(where)
    except NoiseExhausted as e:
        raise SystemExit(f"{e}\n(--no-noise-check runs it anyway)")
    if args.verbose:
        print(f"[noise] {where}: ~{budget.budget_bits:.0f} bits of invariant-"
              "noise budget remain (mean-case estimate)", file=_sys.stderr)


class OpTimer:
    """Per-op CSV timing in the reference's stdout schema (SURVEY.md 3.5):
    prints 'Label,ms,ms,...,' rows consumed by bench/analyze.py.  Each
    sample is normalized per unit of work (e.g. per coefficient) so the
    values are comparable with the reference's per-op numbers."""

    def __init__(self, label: str, per_unit: int = 1):
        self.label = label
        self.per_unit = per_unit
        self.samples = []

    def span(self, units: int = None):
        return _Span(self, units if units is not None else self.per_unit)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        ms = (time.perf_counter() - self._t0) * 1000.0 / max(self.per_unit, 1)
        self.samples.append(ms)

    def emit(self):
        print(self.label + "," + ",".join(f"{s:.6g}" for s in self.samples) + ",")


class _Span:
    def __init__(self, timer: OpTimer, units: int):
        self.timer = timer
        self.units = max(units, 1)

    def __enter__(self):
        self._t0 = time.perf_counter()

    def __exit__(self, *exc):
        ms = (time.perf_counter() - self._t0) * 1000.0 / self.units
        self.timer.samples.append(ms)
