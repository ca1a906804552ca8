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

The export is shape-specialized (fixed clip/batch/resolution — the
serving contract); export one artifact per deployed shape.
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


def export_serving(
    est, acfg: AccFlowConfig, ofe_params, acc_params, clip_shape,
    platforms=None,
):
    """jax.export.Exported for a fixed clip_shape = (T, N, H, W, 3)."""
    serve = jax.jit(build_serving_fn(est, acfg, ofe_params, acc_params))
    spec = jax.ShapeDtypeStruct(tuple(clip_shape), jnp.float32)
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
