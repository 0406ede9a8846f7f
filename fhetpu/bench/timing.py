"""Robust device timing for remote-dispatch TPU benchmarks.

The remote-TPU (axon tunnel) dispatch path has tens of ms of fixed per-call
latency and occasional multi-second jitter, so differencing two small calls
is hopeless (the round-1 BENCH artifact's 4.8e11 blocks/s was exactly that
failure mode).  The measured op runs inside ONE ``lax.fori_loop`` dispatch
whose trip count is auto-scaled until the *absolute* wall time of the big
call exceeds a multi-second floor; per-iteration cost is then
``(t_big - t_floor) / k`` with ``t_floor`` from a k=1 call of the same
executable.  If the subtraction still lands under ``MIN_DT`` the trip count
quadruples and we retry; after the retry budget we hard-fail rather than
print a garbage number.  (VERDICT.md round-1 item 1.)
"""

from __future__ import annotations

import sys
import time

TARGET_SECONDS = 4.0   # in-graph device time to aim for per measured call
MIN_DT = 0.5           # hard floor on the measured delta; below => retry
MAX_RETRIES = 4


def _time_call(jloop, x, k):
    t0 = time.perf_counter()
    jloop(x, k).block_until_ready()
    return time.perf_counter() - t0


def measure(jloop, x, label, verbose=True, target_seconds=TARGET_SECONDS):
    """Robust per-iteration seconds for jloop(x, k) (one jitted executable,
    dynamic trip count).  Returns (sec_per_iter, k_used, dt)."""
    import numpy as np

    # warmup must FETCH, not just block: on the remote-TPU (axon) backend
    # with the persistent compile cache, block_until_ready returns while
    # the async remote compile is still in flight -- only materializing
    # the bytes forces it (measured: block=0.1ms vs fetch=164s on the
    # first post-warmup call).  Timed calls below are trustworthy once
    # the executable exists.
    np.asarray(jloop(x, 1))
    # rough estimate from a k=8 call (absolute, includes dispatch floor)
    t8 = _time_call(jloop, x, 8)
    est_per_iter = max(t8 / 8.0, 1e-6)
    k = max(int(target_seconds / est_per_iter), 16)
    for attempt in range(MAX_RETRIES + 1):
        t_floor = _time_call(jloop, x, 1)
        t_big = _time_call(jloop, x, k + 1)
        dt = t_big - t_floor
        if verbose:
            print(
                f"[bench] {label}: k={k} t_floor={t_floor*1e3:.1f}ms "
                f"t_big={t_big:.3f}s dt={dt:.3f}s",
                file=sys.stderr,
            )
        if dt >= MIN_DT:
            return dt / k, k, dt
        k *= 4
    raise RuntimeError(
        f"bench '{label}' could not obtain a measurable delta "
        f"(dt={dt:.4f}s < {MIN_DT}s at k={k//4}); refusing to report a "
        f"clamped/garbage number"
    )
