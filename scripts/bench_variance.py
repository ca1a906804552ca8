"""Characterize bench.py run-to-run variance (VERDICT r4 weak #1).

BENCH_r04.json (driver, one plain `python bench.py`) recorded cold 69.1 /
warm4 69.0 / stream4 82.8 f/s while README documented 63.5 / 78.2 / 82.9 —
cold +9%, warm −12%, stream exact. This script measures each mode several
times IN ONE PROCESS in a permuted order, so both the in-process spread and
any mode-interaction (e.g. "warm measured right after the cold loop is
slower") become visible. Fresh-process spread comes from repeated plain
`python bench.py` runs driven by the shell (see PARITY.md "Bench variance").

    VAR_ORDER=cold,warm,stream,warm,cold,stream,stream,warm,cold \
        python scripts/bench_variance.py

Prints one JSON line per measurement: {"seq", "mode", "fps", "wall_s"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

MODES = {
    "cold": bench.measure_cold,
    "warm": bench.measure_warm_clip,
    "stream": bench.measure_stream,
}

DEFAULT_ORDER = "cold,warm,stream,warm,cold,stream,stream,warm,cold"


def main() -> None:
    order = os.environ.get("VAR_ORDER", DEFAULT_ORDER).split(",")
    batch = int(os.environ.get("BENCH_BATCH", "2"))
    for i, mode in enumerate(order):
        t0 = time.time()
        fps = MODES[mode.strip()](batch)
        print(
            json.dumps({
                "seq": i,
                "mode": mode.strip(),
                "fps": round(fps, 3),
                "wall_s": round(time.time() - t0, 1),
            }),
            flush=True,
        )


if __name__ == "__main__":
    main()
