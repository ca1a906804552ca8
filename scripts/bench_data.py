"""Data-pipeline throughput bench: CVOR storage -> training batches.

Writes a synthetic CVOR shard (reference training shapes: 7 frames of
512^2 uint8 + backward flows as uint16) and measures end-to-end host-side
loader throughput — random-crop sampling (crop-before-decode), native
decode/normalize, batch assembly, threaded prefetch — in samples/s. This
is the host path that must outrun the TPU step (~33 samples/s for the
AccRAFT recipe) to keep the chip busy.

    python scripts/bench_data.py [n_samples] [batch] [crop]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 12
CROP = int(sys.argv[3]) if len(sys.argv) > 3 else 256


def main():
    from accflow_tpu import native
    from accflow_tpu.data import BatchIterator, fetch_train_dataset
    from accflow_tpu.data.prefetch import threaded_batches
    from accflow_tpu.data.synthetic import write_synthetic_cvor

    tmp = tempfile.mkdtemp(prefix="cvor_bench_")
    t0 = time.perf_counter()
    write_synthetic_cvor(tmp, num_train=N, num_test=0, h=512, w=512)
    print(f"wrote {N} synthetic 512^2 clips in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    ds = fetch_train_dataset(tmp, ["bflows"], crop_size=CROP, split="clean")
    print(f"native core available: {native.available()}", flush=True)

    def epoch(seed):
        it = BatchIterator(ds, BATCH, shuffle=True, drop_last=True, seed=seed)
        n = 0
        for batch in threaded_batches(iter(it), num_threads=4, buffer=4):
            n += batch["imgs"].shape[0]
        return n

    n = epoch(0)  # warm: page cache + native build
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        n = epoch(r + 1)
    dt = (time.perf_counter() - t0) / reps
    print(
        f"loader: {n / dt:8.1f} samples/s  "
        f"({n} samples/epoch, batch {BATCH}, crop {CROP}^2, 4 threads)",
        flush=True,
    )


if __name__ == "__main__":
    main()
