"""Optimizer / LR schedule matching the reference recipe.

train_acc.py:72-87 / fine_tune.py: AdamW(lr, weight_decay, eps) +
OneCycleLR(max_lr=lr, total_steps=num_steps+100, pct_start=0.05,
anneal_strategy="linear", cycle_momentum=False), plus global-norm grad
clipping at `clip` (train_acc.py:231).

torch's linear OneCycle has two phases: linear warmup from
max_lr/div_factor (div_factor=25) over pct_start*total steps, then linear
anneal to max_lr/div_factor/final_div_factor (final_div_factor=1e4). optax's
linear_onecycle_schedule has a different 3-phase shape, so we build the
exact torch schedule from two joined linear segments.
"""

from __future__ import annotations

import optax


def onecycle_linear(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.05,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    import jax.numpy as jnp

    initial = max_lr / div_factor
    final = initial / final_div_factor
    # torch's phase boundaries are FRACTIONAL: warmup ends at step
    # pct*total - 1 (e.g. 4.4 for total=108, pct=0.05) and each phase
    # interpolates pct = step/end_step against that float boundary
    # (OneCycleLR._schedule_phases / get_lr). Rounding the boundary to an
    # integer is exact only when pct*total is integral — at the recipe's
    # num_steps+100 totals it usually is not, and the N-step trajectory
    # parity test (test_training.py) caught the warmup lrs off by ~8%.
    warm_end = pct_start * total_steps - 1.0
    anneal_end = float(total_steps - 1)

    def schedule(count):
        c = jnp.asarray(count, jnp.float32)
        if warm_end <= 0:  # degenerate tiny-total case: anneal only
            pct = jnp.clip(c / max(anneal_end, 1.0), 0.0, 1.0)
            return max_lr + (final - max_lr) * pct
        warm = initial + (max_lr - initial) * jnp.minimum(c / warm_end, 1.0)
        pct = jnp.clip((c - warm_end) / (anneal_end - warm_end), 0.0, 1.0)
        ann = max_lr + (final - max_lr) * pct
        return jnp.where(c <= warm_end, warm, ann)

    return schedule


def make_optimizer(
    lr: float,
    num_steps: int,
    wdecay: float = 1e-5,
    epsilon: float = 1e-8,
    clip: float = 1.0,
    pct_start: float = 0.05,
    buffer_mask=None,
):
    """AdamW + OneCycle + global-norm clip; returns (tx, schedule).

    buffer_mask: optional pytree of bools over the params (True =
    trainable). torch's AdamW only ever sees `model.parameters()`, so
    BatchNorm running-stat BUFFERS are never decayed/updated by it; pass
    nn.layers.bn_buffer_mask(params) to reproduce that (the masked leaves
    get zero optimizer updates and keep no optimizer state)."""
    schedule = onecycle_linear(lr, num_steps + 100, pct_start)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=epsilon,
            weight_decay=wdecay,
        ),
    )
    if buffer_mask is not None:
        tx = optax.masked(tx, buffer_mask)
    return tx, schedule
