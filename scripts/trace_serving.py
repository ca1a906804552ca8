"""Profile the serving hot path on the TPU and print a per-op cost table.

Runs the bench.py serving step (AccFlow+OFE, CVO-6 shape) under
jax.profiler.trace, then parses the chrome-trace json.gz and aggregates
device-op durations, attributing each to its source line via
args.source_stack / long_name. This is the ground truth for deciding what
to optimize next (CLAUDE.md workflow).

    BENCH_BATCH=2 python scripts/trace_serving.py [trace_dir]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/accflow_trace"
BATCH = int(os.environ.get("BENCH_BATCH", "2"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
REPS = int(os.environ.get("TRACE_REPS", "3"))


def run_traced():
    import jax
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import (
        AccFlowConfig,
        accflow_forward,
        init_accflow,
    )

    est = build_flow_estimator(
        os.environ.get("BENCH_OFE", "raft"),
        compute_dtype="bfloat16",
        corr_volume_dtype=os.environ.get("BENCH_VOL_DTYPE", "float32"),
        corr_lookup=os.environ.get("BENCH_LOOKUP", "fused"),
        scan_unroll=int(os.environ.get("BENCH_UNROLL", "4")),
    )
    acfg = AccFlowConfig(compute_dtype="bfloat16")
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)

    @jax.jit
    def step(acc_params, ofe_params, images):
        ofe_fn = lambda a, b: est.forward(ofe_params, a, b, final_only=True)["flow_up"]
        outs = accflow_forward(
            acc_params, ofe_fn, images, acfg, ofe_pairs=est.pairs_fn(ofe_params)
        )
        return outs[-1][0, 0, 0].sum()

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(-1, 1, (7, BATCH, SIZE, SIZE, 3)).astype(np.float32)
    )
    float(step(acc_params, ofe_params, images))  # compile outside the trace
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(REPS):
            float(step(acc_params, ofe_params, images))
    print("traced", flush=True)


def parse():
    files = sorted(
        glob.glob(os.path.join(TRACE_DIR, "plugins/profile/*/*.trace.json.gz"))
    )
    assert files, f"no trace under {TRACE_DIR}"
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")

    # Leaf device ops only: container events (the jitted program, while
    # loops) span their children and would double-count.
    def is_container(name):
        base = name.split(".")[0].split("(")[0]
        # Bare-numeric names are module/program envelope events (they span
        # a whole executable run and carry no source/long_name) — skip,
        # they would double-count every leaf op under them.
        return (base.startswith("jit_") or base.isdigit()
                or base in ("while", "body", "condition"))

    per_src = defaultdict(lambda: [0.0, 0, 0.0, 0.0])  # ms, count, GB, GFLOP
    # TRACE_DETAIL=<source substring>: also aggregate matching ops by their
    # individual HLO signature (long_name) to see WHICH shapes dominate a
    # source line (e.g. which convs inside nn/layers.py:100).
    detail_filter = os.environ.get("TRACE_DETAIL", "")
    per_op = defaultdict(lambda: [0.0, 0, 0.0, 0.0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        name = e.get("name", "")
        if is_container(name):
            continue
        args = e.get("args") or {}
        dur = e["dur"] / 1e3  # us -> ms
        total += dur
        src = args.get("source", "")
        if not src:
            # async copies etc.: attribute by op kind + shape
            src = "<" + name.split(".")[0] + "> " + \
                str(args.get("long_name", ""))[:80]
        key = (name.split(".")[0], src)
        rec = per_src[key]
        rec[0] += dur
        rec[1] += 1
        rec[2] += int(args.get("raw_bytes_accessed", 0) or 0) / 1e9
        rec[3] += int(args.get("model_flops", 0) or 0) / 1e9
        if detail_filter and detail_filter in src:
            okey = name  # one row per distinct HLO instruction
            orec = per_op[okey]
            orec[0] += dur
            orec[1] += 1
            orec[2] += int(args.get("raw_bytes_accessed", 0) or 0) / 1e9
            orec[3] += int(args.get("model_flops", 0) or 0) / 1e9
            if len(orec) == 4:
                orec.append(str(args.get("long_name", ""))[:200])

    print(f"\nleaf device time {total:.1f} ms over {REPS} steps "
          f"({total/REPS:.1f} ms/step)\n")
    print("== by (op, deepest source) — ms/step, achieved GB/s + TF/s ==")
    for (k, s), (ms, n, gb, gf) in sorted(
        per_src.items(), key=lambda kv: -kv[1][0]
    )[:40]:
        bw = gb / (ms / 1e3) if ms else 0.0
        tf = gf / (ms / 1e3) / 1e3 if ms else 0.0
        print(
            f"{ms/REPS:8.2f} ms  x{n:5d}  {bw:6.0f} GB/s {tf:6.1f} TF/s  "
            f"{k:34s} {s[:90]}"
        )

    if detail_filter:
        print(f"\n== ops matching TRACE_DETAIL={detail_filter!r} — per HLO ==")
        for name, rec in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:40]:
            ms, n, gb, gf = rec[:4]
            long = rec[4] if len(rec) > 4 else ""
            bw = gb / (ms / 1e3) if ms else 0.0
            tf = gf / (ms / 1e3) / 1e3 if ms else 0.0
            print(f"{ms/REPS:8.3f} ms  x{n:4d}  {bw:6.0f} GB/s {tf:6.1f} TF/s  "
                  f"{name[:40]:40s} {long[:140]}")


if __name__ == "__main__":
    if os.environ.get("PARSE_ONLY"):
        parse()
    else:
        run_traced()
        parse()
