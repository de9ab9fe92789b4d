#!/usr/bin/env python
"""Raw host->device transfer bandwidth probe (device_put + block).

Context: the e2e CSR pipeline is H2D-bound on this rig, and the tunnel's
bandwidth is strongly time-varying — BENCH records show 8-26 MB/s during
bench sessions while this probe has measured 1.1-1.5 GB/s minutes later on
the same arrays (2026-08-21).  Run it alongside any e2e investigation so
"the pipeline got slower" and "the tunnel got slower" are distinguishable.

Prints one JSON line per payload.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax

    rng = np.random.default_rng(0)
    payloads = [
        ("f32-80MB", rng.normal(size=20_000_000).astype(np.float32)),
        ("i16-40MB", rng.integers(0, 20480, size=20_000_000).astype(np.int16)),
        ("f32-400MB", rng.normal(size=100_000_000).astype(np.float32)),
    ]
    try:
        import ml_dtypes

        payloads.insert(2, ("bf16-40MB", payloads[0][1].astype(ml_dtypes.bfloat16)))
    except ImportError:  # pragma: no cover
        pass
    for name, arr in payloads:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(arr)
            d.block_until_ready()
            ts.append(time.perf_counter() - t0)
            del d
        mb = arr.nbytes / 1e6
        print(json.dumps({
            "payload": name,
            "bytes": int(arr.nbytes),
            "min_sec": float(f"{min(ts):.4g}"),
            "mbps": float(f"{mb / min(ts):.4g}"),
            "device": str(jax.devices()[0]),
        }))


if __name__ == "__main__":
    main()
