"""Serving export: package the AccFlow pipeline as a portable artifact.

The reference has no deployment story beyond "run the python repo". Here
the whole serving computation — frozen flow estimator, batched pair
queries, accumulation cells, upsampling, with the weights baked in as
constants — is staged with `jax.jit` and serialized via `jax.export`
(StableHLO). The artifact is a single file loadable WITHOUT the model
code (only jax) on any machine with the target platform, suitable for a
serving fleet:

    exp = accflow_tpu.serving.export_serving(est, acfg, ofe_params,
                                             acc_params, clip_shape)
    save_artifact(exp, path)
    ...
    fn = load_artifact(path)       # jax.export.Exported.call
    flows = fn(images)             # (T, N, H, W, 3) -> (T-2, N, H, W, 2)

The export is shape-specialized on clip length and resolution (the
accumulation scan and corr shapes specialize on them); the batch dim can
either be fixed or left symbolic (clip_shape batch None / CLI --batch 0),
in which case one artifact serves any batch >= 1 via jax shape
polymorphism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from accflow_tpu.models.accflow import AccFlowConfig, accflow_forward


def build_serving_fn(est, acfg: AccFlowConfig, ofe_params, acc_params):
    """(T, N, H, W, 3) [-1, 1]-normalized clip -> (T-2, N, H, W, 2) flows
    F_{i,0} for i = 2..T-1. Weights are closed over (baked into the
    export as constants)."""

    def serve(images: jnp.ndarray) -> jnp.ndarray:
        def ofe_fn(a, b):
            return est.forward(ofe_params, a, b, final_only=True)["flow_up"]

        return accflow_forward(
            acc_params, ofe_fn, images, acfg,
            ofe_pairs=est.pairs_fn(ofe_params),
        )

    return serve


def cast_weights(params, dtype):
    """Cast every floating leaf (weights, BN stats) to `dtype` — for
    bfloat16 this halves the artifact size and weight HBM, and on the
    bfloat16 compute path it is numerically identical to the f32-weight
    artifact (layers cast weights to the activation dtype at use anyway;
    the few float32-path ops just see once-rounded weights)."""
    import jax.numpy as _jnp

    dtype = _jnp.dtype(dtype)

    def cast(a):
        a = _jnp.asarray(a)
        return a.astype(dtype) if _jnp.issubdtype(a.dtype, _jnp.floating) else a

    return jax.tree.map(cast, params)


def export_serving(
    est, acfg: AccFlowConfig, ofe_params, acc_params, clip_shape,
    platforms=None, weights_dtype=None,
):
    """jax.export.Exported for clip_shape = (T, N, H, W, 3).

    weights_dtype: optional storage dtype for the baked-in weights
    (cast_weights) — "bfloat16" halves the artifact.

    N=None exports a batch-POLYMORPHIC artifact (jax shape polymorphism):
    the StableHLO is lowered once with a symbolic batch dim and serves any
    batch >= 1 without padding/replication. Clip length and resolution
    stay fixed (the accumulation scan and corr shapes specialize on them).
    Auto memory modes need concrete shapes — build the estimator with an
    explicit corr_lookup / attn_chunk when exporting polymorphically."""
    if weights_dtype is not None:
        ofe_params = cast_weights(ofe_params, weights_dtype)
        acc_params = cast_weights(acc_params, weights_dtype)
    serve = jax.jit(build_serving_fn(est, acfg, ofe_params, acc_params))
    shape = tuple(clip_shape)
    if shape[1] is None:
        (b,) = jax.export.symbolic_shape("b")
        shape = (shape[0], b) + shape[2:]
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jax.export.export(serve, **kwargs)(spec)


def save_artifact(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Load a serialized artifact as the jax.export.Exported object
    (exposes in_avals for shape introspection; .call to invoke)."""
    with open(path, "rb") as f:
        return jax.export.deserialize(bytearray(f.read()))


def load_artifact(path: str):
    """Load a serialized artifact; returns a callable (images) -> flows."""
    return load_exported(path).call
