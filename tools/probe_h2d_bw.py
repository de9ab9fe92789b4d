#!/usr/bin/env python
"""Transfer bandwidth probe: device_put before and after the first D2H.

Root cause isolated 2026-08-21: on this axon-tunneled backend the transport
runs at **1.3-1.5 GB/s** (both payload sizes, sustained over 16 consecutive
92 MB puts) UNTIL the process performs its FIRST device->host fetch — even a
256-float `np.asarray` — after which every subsequent transfer in the
process (both directions) collapses to ~1.5-40 MB/s and never recovers
(80 s idle does not heal it; compile and kernel execution do NOT trigger
it).  That collapsed mode, with its own 1.5-300 MB/s variance, is what
every BENCH e2e record measures: the pipeline fetches batch results, so all
H2D after the first materialize rides the collapsed transport.  An A/B of
result-drain orderings (interleaved vs deferred-drain, which halves the
bytes shipped in collapsed mode) measured 230 vs 216 cells/s — the
collapsed-mode variance dwarfs ordering gains, so the driver keeps the
overlap-friendly interleaved order and the real levers are fewer bytes
(`transfer_dtype="bfloat16"`) and a backend fix.

This probe prints the healthy rate, performs one tiny D2H, and prints the
collapsed rate — run it alongside any e2e investigation.  One JSON line per
measurement.
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
    def put_rate(arr):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(arr)
            d.block_until_ready()
            ts.append(time.perf_counter() - t0)
            del d
        return min(ts)

    def emit(name, arr, sec, phase):
        print(json.dumps({
            "payload": name,
            "phase": phase,
            "bytes": int(arr.nbytes),
            "min_sec": float(f"{sec:.4g}"),
            "mbps": float(f"{arr.nbytes / 1e6 / sec:.4g}"),
            "device": str(jax.devices()[0]),
        }))

    for name, arr in payloads:
        emit(name, arr, put_rate(arr), "pre-d2h")

    # the poison: one tiny device->host fetch
    _ = np.asarray(jax.device_put(np.ones(256, np.float32)))
    for name, arr in payloads[:1]:
        emit(name, arr, put_rate(arr), "post-d2h")


if __name__ == "__main__":
    main()
