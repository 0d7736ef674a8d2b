#!/usr/bin/env python
"""Measure host->device staging bandwidth vs number of concurrent
device_put streams (the round-2 scaling study showed staging at ~40 MB/s
is 87% of the precompute pass on this tunneled backend; both prefetch
pipelines were max_workers=1).

Prints one JSON line per stream count: effective MB/s moving `total_mb`
of uint8 split into `chunks` chunks, issued from N threads.
"""
from __future__ import annotations

import argparse
import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk_mb", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--streams", default="1,2,3,4")
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    # warmup: session setup + small transfer
    _ = jax.device_get(jax.device_put(np.ones(4, np.float32), dev))

    bufs = [np.random.default_rng(i).integers(
        0, 255, size=args.chunk_mb << 20, dtype=np.uint8)
        for i in range(args.chunks)]

    def put(b):
        x = jax.device_put(b, dev)
        jax.block_until_ready(x)
        return x

    results = {}
    for ns in (int(s) for s in args.streams.split(",")):
        # fresh copies each round so caching can't help
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=ns) as ex:
            xs = list(ex.map(put, bufs))
        # true sync: pull one element from each on-device buffer
        for x in xs:
            _ = jax.device_get(x[:1])
        dt = time.perf_counter() - t0
        del xs
        mb = args.chunk_mb * args.chunks
        results[ns] = mb / dt
        print(json.dumps({"streams": ns, "mb": mb, "s": round(dt, 2),
                          "MB_per_s": round(mb / dt, 1)}), flush=True)
    print(json.dumps({"summary": {k: round(v, 1)
                                  for k, v in results.items()}}))


if __name__ == "__main__":
    main()
