"""Gradient accumulation: k sequential micro-batches per optimizer step.

The reference trains at its published batch only when two GPUs are
present (batch_per_gpu x len(gpus), train_acc.py:47) and has no recourse
when the recipe does not fit one device. Here `grad_accum: k` in the
train configs splits every step's batch into k equal micro-batches,
runs forward+backward per micro-batch inside a `lax.scan` (so only one
micro-batch's activations are live at a time), and averages the
gradients before the single AdamW update — the large-batch recipe at
1/k the activation memory, composable with the volume-free corr/attn
modes and SPMD sharding (micro-batches stay batch-sharded; the compiler
still inserts one gradient psum per micro-batch).

For batch-mean losses (both reference losses) with k dividing the batch,
the averaged gradients equal the full-batch gradients exactly (up to
f32 summation order). Train-mode BatchNorm normalizes per MICRO-batch —
the same semantics as the reference's nn.DataParallel, whose BN also
sees only its per-GPU slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split_axis(x: jax.Array, k: int, axis: int) -> jax.Array:
    """(…, n, …) -> (k, …, n/k, …) with the micro index leading."""
    n = x.shape[axis]
    if n % k != 0:
        raise ValueError(
            f"grad_accum={k} must divide the batch ({n} on axis {axis} "
            f"of {x.shape})"
        )
    shape = x.shape[:axis] + (k, n // k) + x.shape[axis + 1 :]
    return jnp.moveaxis(x.reshape(shape), axis, 0)


def microbatched_value_and_grad(loss_fn, k: int, axis: int = 0):
    """`jax.value_and_grad(loss_fn, has_aux=True)` over k micro-batches.

    loss_fn(params, *arrays) -> (loss, aux); every array in `arrays`
    carries the batch on `axis`. Returns fn(params, *arrays) ->
    ((loss, aux), grads) where loss/aux/grads are the means over the k
    sequential micro-batch evaluations (run under lax.scan, one
    micro-batch's activations live at a time). k=1 is the plain call.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    if k == 1:
        return grad_fn

    def fn(params, *arrays):
        xs = tuple(_split_axis(a, k, axis) for a in arrays)
        out_sds = jax.eval_shape(grad_fn, params, *(x[0] for x in xs))
        zeros = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_sds
        )

        def body(acc, x):
            out = grad_fn(params, *x)
            return jax.tree.map(jnp.add, acc, out), None

        total, _ = jax.lax.scan(body, zeros, xs)
        return jax.tree.map(lambda t: t / k, total)

    return fn
