"""Device timing that survives high-latency host<->device links.

On the axon-tunneled TPU, `block_until_ready` does not actually fence
and bulk D2H transfers run at ~100 KB/s, so the reference's timing
pattern (host wall clock around synchronized scopes,
`vplib/src/profiling.h`) mismeasures badly. Instead we time
*differentially*: dispatch K1 and K2 chained iterations, fence each with
a scalar-sized D2H, and divide the difference — constant dispatch/sync
overhead cancels.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _sync(value) -> None:
    """Force execution with a scalar-sized device->host read.

    Indexes element [0, ...] rather than reshaping: an eager reshape of
    the value is a full-copy XLA program (no donation outside jit), which
    transiently DOUBLES the output's HBM — at 1024^3 f32 outputs that 4 GB
    copy was part of the round-5 jfa@1024 RESOURCE_EXHAUSTED."""
    leaf = jax.tree_util.tree_leaves(value)[0]
    scalar = leaf[(0,) * leaf.ndim]
    float(jnp.asarray(scalar, jnp.float32))


def time_device_fn(fn, *args, iters: int = 10, warmup: int = 1,
                   chain=None, repeats: int = 5) -> float:
    """Per-iteration seconds of `fn(*args)` on device.

    `fn` must return a pytree; `chain(prev_out, args) -> new args` makes
    successive iterations data-dependent (defaults to re-running on the
    same inputs, which on a single TPU core still serializes).

    The differential measurement repeats `repeats` times and returns the
    MEDIAN: a tunnel stall during the long run inflates a sample, but a
    stall during the BASE run deflates it below the true kernel time
    (observed: the same cached kernel measuring 0.56 vs 1.2 ms across
    sessions), so neither min nor max is trustworthy.

    `warmup` is the total number of unmeasured pre-runs and must be
    >= 1: the differential method measures STEADY-STATE cost and cannot
    produce a compile-inclusive figure (time the first call directly
    for that), so warmup=0 is rejected rather than silently honored.
    """
    if warmup < 1:
        raise ValueError(
            "time_device_fn measures steady state; warmup must be >= 1 "
            "(wrap the first call in time.perf_counter for cold cost)")
    out = fn(*args)
    for _ in range(max(0, warmup - 1)):
        out = fn(*args)
    _sync(out)
    # Drop the warmup output BEFORE the timed runs: holding it pins one
    # full output buffer (4 GB for 1024^3 f32) across every measurement
    # dispatch below — at large N that was the difference between
    # fitting and RESOURCE_EXHAUSTED (round-5 jfa@1024).
    del out

    def run(k: int) -> float:
        t0 = time.perf_counter()
        a = args
        o = None
        for _ in range(k):
            if chain is None:
                # Drop the previous dispatch's output BEFORE enqueuing
                # the next: `o = fn(*a)` rebinds only after fn returns,
                # so the old buffer (4 GB at 1024^3 f32) would overlap
                # the next run's whole working set (round-5 jfa@1024
                # pallas OOM; same mechanism as the warmup hold above).
                o = None
            o = fn(*a)
            if chain is not None:
                a = chain(o, a)
        _sync(o)
        return time.perf_counter() - t0

    samples, raw = [], []
    for _ in range(max(1, repeats)):
        t_base = run(1)
        t_long = run(1 + iters)
        dt = (t_long - t_base) / iters
        raw.append(dt)
        if dt > 1e-7:  # discard jitter-corrupted (~0 or negative) samples
            samples.append(dt)
    if not samples:
        # Either tunnel jitter corrupted every run, or the kernel is
        # genuinely sub-100ns (tiny word ops at small N with large iters).
        # Return NaN so sweeps/CSVs cannot silently absorb a fabricated
        # sample (a 1e-9 fallback once recorded as multi-Tvox/s rows).
        import warnings

        warnings.warn(
            "time_device_fn: every differential sample was <= 1e-7 s "
            f"(raw: {[f'{d:.2e}' for d in raw]}); returning NaN — "
            "rerun or raise iters if this is jitter",
            RuntimeWarning,
            stacklevel=2,
        )
        return float("nan")
    samples.sort()
    return samples[len(samples) // 2]
