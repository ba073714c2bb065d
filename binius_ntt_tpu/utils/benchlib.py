"""Device timing that survives unreliable block_until_ready.

Through remote-PJRT tunnels, ``block_until_ready`` has been observed to
return before execution completes, producing impossible timings.  The only
trustworthy sync point is host materialisation of (a value derived from) the
result.  ``device_time`` queues K executions on the in-order stream and
forces one tiny readback at the end; the K-vs-1 difference removes both the
readback round-trip and any constant dispatch overhead.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["device_time"]


def _force(result) -> None:
    import jax

    leaf = jax.tree_util.tree_leaves(result)[0]
    # Slice WITHOUT ravel(): reshape of a device array materialises a
    # full copy on TPU — a hidden buffer the size of the result per
    # force (OOM at capacity sizes: 2^28 sumcheck fold died here).
    if leaf.ndim == 0:
        np.asarray(leaf)
    else:
        np.asarray(leaf[(0,) * (leaf.ndim - 1)][:8])


def device_time(fn, *args, reps: int = 8, trials: int = 3,
                min_delta: float = 0.02, max_reps: int = 1024) -> float:
    """Median-of-trials steady-state seconds per call of fn(*args).

    The K-vs-1 subtraction is ill-conditioned when K executions take less
    than timer/tunnel jitter — round-1 committed a literal 0.0 s for the
    2^20 sumcheck round this way.  reps now adapts upward until the delta
    clears ``min_delta`` of wall time, and a final non-positive estimate
    raises instead of reporting an impossible number.
    """
    _force(fn(*args))  # compile + warm

    def run(k: int) -> float:
        t0 = time.time()
        r = None
        for _ in range(k):
            r = fn(*args)
        _force(r)
        return time.time() - t0

    # Calibrate k with fresh t1 samples each iteration: a single noisy
    # t1 (tunnel hiccup) must not inflate k toward max_reps and multiply
    # bench wall time.  min() of two samples bounds the jitter.
    k = max(reps, 2)
    while k < max_reps:
        t1 = min(run(1), run(1))
        if run(k) - t1 >= min_delta:
            break
        k *= 2
    else:
        import warnings

        warnings.warn(
            f"device_time: K-vs-1 delta never cleared {min_delta}s at "
            f"k={k}; estimate may be under-resolved", RuntimeWarning)

    ests = []
    for _ in range(trials):
        t1 = run(1)
        tk = run(k)
        ests.append((tk - t1) / (k - 1))
    ests.sort()
    est = ests[len(ests) // 2]
    if est <= 0:
        raise RuntimeError(
            f"non-physical device timing ({est:.3e} s/call at k={k}): "
            "K-vs-1 delta collapsed — tunnel sync artifact, not a result")
    return est


def setup_compile_cache() -> None:
    """Point JAX's persistent compilation cache at <repo>/.jax_cache.

    Shared by bench.py and tools/tpu_validation.py: remote (tunnel) compiles
    run 10s-1000s, so repeat runs must hit the on-disk cache.

    BNTT_CACHE_DIR overrides the location — the coldstart suite
    (tools/coldstart.py) points it at an empty temp dir to measure a true
    cold compile without disturbing the shared cache.
    """
    import os

    import jax

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache_dir = (os.environ.get("BNTT_CACHE_DIR")
                 or os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
