"""FLOP count of the CVO-6 acc+RAFT serving clip (XLA cost analysis).

Feeds BASELINE.md's second, methodology-independent cross-check of the
throughput denominator: given the protocol's total FLOPs per clip, any
GPU's peak tensor rate x an assumed end-to-end MFU bounds what a
perfectly-engineered torch stack could reach on that GPU — no timing
citation needed. Runs on the CPU backend (cost analysis is
platform-independent arithmetic counting).

    python scripts/flops_protocol.py [SIZE [BATCH]]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, accflow_forward, init_accflow

    est = build_flow_estimator("raft", compute_dtype="bfloat16")
    acfg = AccFlowConfig(compute_dtype="bfloat16")
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)

    def run(images):
        ofe_fn = lambda a, b: est.forward(ofe_params, a, b, final_only=True)["flow_up"]
        return accflow_forward(acc_params, ofe_fn, images, acfg,
                               ofe_pairs=est.pairs_fn(ofe_params))

    spec = jax.ShapeDtypeStruct((7, batch, size, size, 3), jnp.float32)
    compiled = jax.jit(run).lower(spec).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = cost.get("flops", float("nan")) / batch
    print(f"clip ({size}^2, 7 frames, 12 iters, acc+raft): "
          f"{flops / 1e12:.3f} TFLOP/clip = {flops / 7e9:.2f} GFLOP/frame")
    for name, peak in (("A100 bf16 (312 TF/s)", 312e12),
                       ("1080Ti fp32 (11.3 TF/s)", 11.3e12),
                       ("v5e bf16 (197 TF/s)", 197e12)):
        for mfu in (0.5, 1.0):
            print(f"  {name} @ {mfu:.0%} MFU: "
                  f"{peak * mfu / flops * 7:8.1f} frames/s")


if __name__ == "__main__":
    main()
