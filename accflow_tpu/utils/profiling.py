"""Profiling / tracing (SURVEY.md §5.1 rebuild).

The reference has wall-clock timers only. Here: JAX profiler traces
(viewable in TensorBoard / Perfetto) plus an honest device-step timer.

Timing caveat baked in: on remote-tunneled backends `block_until_ready`
can return before execution finishes, so `device_step_time` times K vs 2K
iterations chained *inside one compiled program* and reads back a scalar
— dispatch and sync overheads cancel in the difference.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: `with trace("/tmp/trace"): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_pair_median(
    f1: Callable,
    f2: Callable,
    args: tuple,
    k: int,
    repeats: int = 3,
) -> float:
    """Median per-iteration seconds over `repeats` K-vs-2K timing pairs.

    f1/f2 must already be compiled AND warmed (one call each). A pair
    whose subtraction comes out non-positive is a measurement casualty —
    a transient host/relay delay landing on one leg can make
    t(2K) <= t(K) — so it is discarded and retried (up to 3*repeats
    attempts) rather than floored: flooring once turned a relay hiccup
    into a 3e10 frames/s bench capture (PARITY.md "Bench variance").
    Raises RuntimeError if every attempt is degenerate, so callers
    report a failed measurement instead of a garbage number."""
    import sys

    dts = []
    for _ in range(3 * repeats):
        if len(dts) >= repeats:
            break
        t0 = time.perf_counter()
        float(f1(*args))
        t1 = time.perf_counter()
        float(f2(*args))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / k
        if dt > 0:
            dts.append(dt)
        else:
            print(
                "timing: discarding degenerate K-vs-2K pair "
                "(t2K-tK = %.1f ms)" % (1e3 * k * dt),
                file=sys.stderr, flush=True,
            )
    if not dts:
        raise RuntimeError(
            "every K-vs-2K timing pair came out non-positive "
            "(relay/host unstable?) — measurement failed"
        )
    return float(sorted(dts)[len(dts) // 2])


def device_step_time(
    step_fn: Callable,
    args,
    iters: int = 8,
    chain: Callable | None = None,
) -> float:
    """Seconds per step_fn(*args) call, measured robustly.

    step_fn's outputs must be convertible to a scalar via jnp.sum. `chain`
    maps (outputs, args) -> next args to create a data dependency between
    iterations (default: reuse args, which still orders execution through
    the fori_loop carry of the checksum)."""

    def default_chain(out, args, s):
        # Data dependency: nudge every floating input by an invisible
        # epsilon of the output so XLA cannot hoist the loop body as
        # loop-invariant (which would make every iteration free).
        eps = s * 1e-30

        def nudge(a):
            a = jnp.asarray(a)
            if jnp.issubdtype(a.dtype, jnp.floating):
                return a + eps.astype(a.dtype)
            return a

        return jax.tree.map(nudge, args)

    chain = chain or default_chain

    def make_loop(k: int):
        def loop(args):
            def body(i, carry):
                checksum, args = carry
                out = step_fn(*args)
                s = jnp.sum(jnp.asarray(jax.tree.leaves(out)[0])).astype(jnp.float32)
                args = chain(out, args, s)
                return (checksum + s, args)

            checksum, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), args))
            return checksum

        return jax.jit(loop)

    f1 = make_loop(iters)
    f2 = make_loop(2 * iters)
    # compile + warm both
    float(f1(args))
    float(f2(args))
    # Single pair by default (cost parity with the old behavior), but
    # degenerate pairs are retried instead of floored to 1e-9.
    return timed_pair_median(f1, f2, (args,), iters, repeats=1)
