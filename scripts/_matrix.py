"""Machine-readable bench matrix (VERDICT r4 item 6).

Every measurement script appends its rows here so doc claims (README /
PARITY tables) are auditable against recorded runs instead of prose:
each row carries the git sha, timestamp, and the full config. bench.py's
headline line is captured separately by the driver (BENCH_r*.json); this
file holds everything else (GMA, hi-res, streaming, drift, variance).

    from _matrix import record
    record("stream4_frames_per_sec", 82.9, "frames/s/chip",
           ofe="raft", batch=2, size=512)
"""

import json
import os
import subprocess
import time

PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH_MATRIX.json")


def _git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(PATH), capture_output=True, text=True,
            timeout=10,
        ).stdout.strip()
    except Exception:
        return ""


def record(metric: str, value, unit: str, **meta) -> dict:
    """Append one row to BENCH_MATRIX.json (a JSON list) and return it."""
    row = {
        "metric": metric,
        "value": round(float(value), 4),
        "unit": unit,
        "ts": int(time.time()),
        "sha": _git_sha(),
    }
    if meta:
        row.update(meta)
    rows = []
    if os.path.exists(PATH):
        try:
            with open(PATH) as f:
                rows = json.load(f)
        except (json.JSONDecodeError, OSError):
            rows = []
    rows.append(row)
    tmp = PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    os.replace(tmp, PATH)
    return row
