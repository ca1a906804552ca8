"""accflow_tpu — a TPU-native long-range optical-flow framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of mulns/AccFlow
(ICCV 2023, "AccFlow: Backward Accumulation for Long-Range Optical Flow"):

- Two iterative two-frame flow estimators: RAFT and GMA
  (reference: networks/raft/raft.py, networks/gma/gma.py).
- The AccFlow backward-accumulation module with occlusion-aware fusion
  (reference: networks/AccFlow_.py).
- CVO video-flow data pipeline, training/eval engines, checkpointing,
  weight conversion from released PyTorch checkpoints.

Design: channels-last (NHWC) everywhere, params as nested pytrees whose
paths mirror the reference's state_dict names, fixed-iteration `lax.scan`
loops under a single `jit`, bfloat16 compute policy mirroring the
reference's autocast boundaries, and data-parallel SPMD over a
`jax.sharding.Mesh` in place of nn.DataParallel.
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep `import accflow_tpu` dependency-free
    if name in ("FlowPipeline", "ArtifactPipeline"):
        from accflow_tpu import api

        return getattr(api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
