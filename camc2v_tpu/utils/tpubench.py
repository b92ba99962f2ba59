"""Shared helpers for the TPU benchmark/queue harnesses.

Centralises three things every on-chip harness needs (bench.py, the tools/
bench_* scripts, the tpu_queue_* runners):

* ``enable_compile_cache()`` — JAX persistent compilation cache. Verified to
  work through the axon remote-compile tunnel (round 4): a flagship program
  whose HLO is unchanged loads from ``/root/.cache/jax_axon_cache`` in
  seconds instead of re-compiling for ~10 minutes. Every harness should call
  this before touching jax.
* ``crash_probe(out)`` — value-fetch guard against SILENT remote-execution
  failures: through the axon tunnel a crashed execution (HBM/VMEM exhaustion
  inside a kernel) does not raise from ``block_until_ready``; it hands back
  zero-filled buffers and the harness would otherwise time pure dispatch and
  report a physically impossible number (r3q: "0.79 ms" on a 166 ms program).
  The probe samples a strided slice of up to ``max_leaves`` float leaves and
  rejects non-finite values or an all-zero sample set.
* ``retry_transient(exc)`` / ``wait_for_tpu()`` — outage-tolerant re-exec
  loop for the tunnel's multi-hour outages and flaky HTTP 500s (previously
  private to bench.py; the r3q queue lost its train item to an outage because
  bench_trainstep.py had no retry path — ADVICE.md round 3).
"""

from __future__ import annotations

import os
import time

CACHE_DIR = os.environ.get("CAMC2V_COMPILE_CACHE_DIR", "/root/.cache/jax_axon_cache")

_RETRY_ENV = "CAMC2V_BENCH_ATTEMPT"
_WAIT_FLAG_ENV = "CAMC2V_BENCH_WAITING"   # set before re-exec: probe at startup
_WAITED_ENV = "CAMC2V_BENCH_WAITED_S"     # cumulative outage-wait across re-execs
_WAIT_ENV = "CAMC2V_BENCH_WAIT_S"         # total outage budget (default 2 h)
_MAX_ATTEMPTS = 3

_PROBE_SRC = (
    "import jax, jax.numpy as jnp; jax.devices(); "
    "x = jnp.ones((8, 8)); (x @ x).block_until_ready()"
)


def enable_compile_cache():
    """Point JAX at the persistent compilation cache (no-op when disabled).

    Safe on every backend; the big win is the axon remote-compile tunnel,
    where a cache hit replaces a ~10-minute flagship compile. Disable with
    CAMC2V_COMPILE_CACHE=0 (e.g. to force a fresh compile when diagnosing
    compiler-version skew).
    """
    if os.environ.get("CAMC2V_COMPILE_CACHE", "1") == "0":
        return
    import jax

    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    # flagship compiles are minutes long, but the sweep harnesses also emit
    # many small programs — cache everything
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def crash_probe(out, *, max_leaves: int = 8, samples: int = 1024, what: str = "output"):
    """Fetch strided samples of `out`'s float leaves; raise on crash signatures.

    Probes the `max_leaves` LARGEST floating leaves (most likely to be real
    compute results rather than counters), `samples` elements each, strided
    across the whole buffer so a partially-written buffer cannot hide in an
    unprobed head or tail (ADVICE.md round 3 on the first-8-elements probe).

    Raises RuntimeError when any probed value is non-finite, or when every
    probed value across every probed leaf is exactly zero (impossible for a
    real run over realized random weights; the signature of a crashed axon
    remote execution).
    """
    import jax
    import numpy as np

    leaves = [
        l for l in jax.tree_util.tree_leaves(out)
        if hasattr(l, "dtype") and jax.numpy.issubdtype(l.dtype, jax.numpy.floating)
    ]
    leaves.sort(key=lambda l: -l.size)
    vals = []
    for leaf in leaves[:max_leaves]:
        stride = max(1, leaf.size // samples)
        flat = jax.jit(lambda a, s=stride: a.reshape(-1)[::s])(leaf)
        vals.append(np.asarray(jax.device_get(flat), np.float32))
    if not vals:
        return
    flat = np.concatenate([v.ravel() for v in vals])
    if not np.all(np.isfinite(flat)):
        bad = flat[~np.isfinite(flat)][:4]
        raise RuntimeError(f"{what} is non-finite: {bad}")
    if np.all(flat == 0):
        raise RuntimeError(
            f"{what} is all-zero across {len(vals)} probed leaves: "
            "remote execution crashed (axon returns zero buffers instead of raising)"
        )


def sync_fetch(out):
    """Synchronize on a remote execution by FETCHING a tiny value slice.

    Through the axon tunnel `block_until_ready` returns before the remote
    execution completes (measured round 4: a 0.34 s matmul loop "completed"
    in 0.1 ms while the subsequent value fetch took the real duration —
    executions pipeline server-side). Only a host read synchronizes. Costs
    one tunnel round-trip (~30 ms), so per-iteration timing overhead is a few
    percent on second-scale programs; benchmark inner loops should be sized
    accordingly.
    """
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = (0,) * getattr(leaf, "ndim", 0)
    return np.asarray(jax.device_get(leaf[idx] if idx else leaf))


def timed(fn, *args, iters: int, probe: bool = True):
    """Median wall time of `fn(*args)` (value-fetch-synchronized) with a
    post-timing crash probe."""
    import numpy as np

    out = fn(*args)
    sync_fetch(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync_fetch(out)
        times.append(time.perf_counter() - t0)
    if probe:
        crash_probe(out, what="benchmark output")
    return float(np.median(times)), out


def probe_tpu() -> bool:
    """Cheap subprocess probe: True iff the axon backend inits and runs one op.

    Runs out-of-process because a failed init poisons the in-process backend
    cache (and during an outage init can hang for minutes — hence timeout).
    """
    import subprocess
    import sys

    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_SRC], timeout=300,
                           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def retry_transient(exc: Exception):
    """Re-exec the harness on transient remote-TPU failures.

    The axon tunnel returns UNAVAILABLE / HTTP 500 / INTERNAL on backend init
    or remote compile, and suffers multi-hour outages. On a transient error we
    re-exec IMMEDIATELY (the axon backend is single-claim: execv closes this
    process's tunnel sockets, so probes from the fresh process don't collide
    with a claim the failed parent may still hold); the fresh process then
    probe-waits in wait_for_tpu() before touching the backend. Waiting out an
    outage does not consume an attempt; failures while the tunnel answers
    (e.g. flaky remote compile) are capped at _MAX_ATTEMPTS.
    """
    import sys

    msg = f"{type(exc).__name__}: {exc}"
    transient = any(s in msg for s in (
        "UNAVAILABLE", "Unable to initialize backend", "DEADLINE",
        "INTERNAL", "HTTP 500", "Internal Server Error",
    ))
    attempt = int(os.environ.get(_RETRY_ENV, "0"))
    if not transient or attempt >= _MAX_ATTEMPTS:
        raise exc
    print(f"bench: transient TPU failure (attempt {attempt + 1}/{_MAX_ATTEMPTS}): "
          f"{msg[:300]} — re-exec + probe", file=sys.stderr, flush=True)
    os.environ[_WAIT_FLAG_ENV] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)


def wait_for_tpu():
    """Startup probe-wait of a re-exec'd harness (claim-free fresh process).

    Budget = cumulative time spent waiting out outages across all re-execs
    (CAMC2V_BENCH_WAIT_S, default 2 h) — time spent RUNNING never counts.
    """
    import sys

    os.environ.pop(_WAIT_FLAG_ENV, None)
    attempt = int(os.environ.get(_RETRY_ENV, "0"))
    waited = float(os.environ.get(_WAITED_ENV, "0") or 0)
    budget = float(os.environ.get(_WAIT_ENV, "7200"))
    if probe_tpu():
        # tunnel is up: the failure was a one-off (e.g. 500 mid-compile) —
        # this DOES consume an attempt; brief pause before the retry
        os.environ[_RETRY_ENV] = str(attempt + 1)
        time.sleep(120)
        return
    print("bench: tunnel down — waiting for recovery "
          f"({budget - waited:.0f} s of outage budget left)", file=sys.stderr, flush=True)
    t0 = time.monotonic()
    while True:
        if waited + (time.monotonic() - t0) > budget:
            print("bench: outage outlasted the wait budget — giving up",
                  file=sys.stderr, flush=True)
            sys.exit(3)
        time.sleep(60)
        if probe_tpu():
            break
    os.environ[_WAITED_ENV] = str(waited + (time.monotonic() - t0))
    print("bench: tunnel answering — resuming", file=sys.stderr, flush=True)


def maybe_wait_at_startup():
    """Call first in main(): resume the probe-wait of a re-exec'd process."""
    if os.environ.get(_WAIT_FLAG_ENV):
        wait_for_tpu()
