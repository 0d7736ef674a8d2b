#!/usr/bin/env python
"""Kernel-level roofline study for the fused decode+matmul hot path.

Times, on the current accelerator:
  mxu        pure bf16 MXU matmuls on PRE-decoded dosages resident in HBM
             (the no-decode upper bound; HBM cost of reading bf16 g)
  jnp        block_stats_core on packed bytes (XLA decode+matmul)
  pallas     block_stats_pallas_core, current kernels (SWAR byte decode)
  gp/ytg     the two Pallas stages in isolation

and prints GFLOP/s, MFU vs peak, and the HBM-bandwidth bound for each.
Peak numbers default to v5e-class (197 TF/s bf16, 819 GB/s); override
with PEAK_TFLOPS / PEAK_GBS env vars.

Timing uses the marginal-rate method of bench.py (short vs long jitted
scan) to cancel dispatch/tunnel latency.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp

    from pyrhe_tpu.ops.kernels import (gp_matmul, pad_to, plane_permutation,
                                       ytg_matmul)
    from pyrhe_tpu.ops.moments import block_stats_core, block_stats_pallas_core
    from pyrhe_tpu.utils.jaxcache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    N = int(os.environ.get("BK_N", 131072 if on_tpu else 8192))
    m = int(os.environ.get("BK_M", 2048 if on_tpu else 512))
    K = int(os.environ.get("BK_K", 1))
    B = int(os.environ.get("BK_B", 10))
    use_cov = os.environ.get("BK_COV", "0") == "1"
    T = 1
    b2 = B * (2 if use_cov else 1)
    Bp = b2 + T
    tm = int(os.environ.get("BK_TM", 512))
    tn = int(os.environ.get("BK_TN", 2048))
    S_short, S_long = (4, 16) if on_tpu else (2, 4)
    peak_tf = float(os.environ.get("PEAK_TFLOPS", 197))
    peak_gbs = float(os.environ.get("PEAK_GBS", 819))

    rng = np.random.default_rng(0)
    n_pad = pad_to(N, tn)
    nb = n_pad // 4
    perm = plane_permutation(n_pad, tn)
    mask = jax.device_put((perm < N).astype(np.float32), dev)
    P_nat = np.zeros((n_pad, Bp), np.float32)
    P_nat[:N] = rng.normal(size=(N, Bp))
    P_perm = jax.device_put(P_nat[perm], dev)
    P_flat = jax.device_put(P_nat[:N], dev)
    annot = np.zeros((m, K), np.float32)
    annot[np.arange(m), rng.integers(0, K, m)] = 1.0
    annot_d = jax.device_put(annot, dev)
    fill = jax.device_put(np.zeros(m, np.float32), dev)

    def make_packed(S, padded):
        # random bytes generated ON DEVICE: content is irrelevant to kernel
        # timing (any byte decodes to a valid dosage) and host RNG at these
        # sizes would dominate the benchmark's wall-clock
        shape = (S, m, nb if padded else (N + 3) // 4)
        return jax.jit(lambda k: jax.random.randint(
            k, shape, 0, 256, jnp.uint8), static_argnums=())(
            jax.device_put(jax.random.key(S), dev))

    flops_per_block = 2.0 * N * m * (Bp + K * b2)
    stage1_flops = 2.0 * N * m * Bp
    stage2_flops = 2.0 * N * m * (K * b2)
    results = {}
    only = os.environ.get("BK_ONLY")          # substring filter, e.g. stage1

    def _want(name):
        return only is None or only in name

    def scan_over(stats, blocks_builder, s_short=None, s_long=None):
        """Marginal seconds/block between a short and a long jitted scan
        (cancels dispatch/tunnel latency)."""
        s_short = s_short or S_short
        s_long = s_long or S_long

        @jax.jit
        def run(bs):
            def body(c, blk):
                leaves = jax.tree.leaves(stats(blk))
                return c + sum(jnp.sum(l.astype(jnp.float32))
                               for l in leaves), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), bs)
            return tot

        tt = {}
        for S in (s_short, s_long):
            blocks = blocks_builder(S)
            float(run(blocks))               # compile + sync
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(blocks))
                best = min(best, time.perf_counter() - t0)
            tt[S] = best
            del blocks
        return (tt[s_long] - tt[s_short]) / (s_long - s_short)

    # ---- mxu upper bound: pre-decoded bf16 dosage resident in HBM --------
    def mxu_builder(S):
        return jax.jit(lambda k: jax.random.randint(
            k, (S, m, N), 0, 3, jnp.int8).astype(jnp.bfloat16))(
            jax.device_put(jax.random.key(S), dev))

    Pb = P_flat.astype(jnp.bfloat16)

    def mxu_stats(g):
        gp = jnp.dot(g, Pb, preferred_element_type=jnp.float32)
        y = gp[:, :b2].astype(jnp.bfloat16)
        xxg = jnp.dot(y.T, g, preferred_element_type=jnp.float32)
        return gp, xxg

    if _want("mxu"):
        # few blocks: the bf16 dosage is 8x the packed bytes, keep HBM modest
        t = scan_over(mxu_stats, mxu_builder, 2, 6 if on_tpu else 3)
        results["mxu_bf16_upper_bound"] = flops_per_block / t / 1e9

    # ---- jnp packed path ---------------------------------------------------
    def jnp_stats(blk):
        return block_stats_core(blk, fill, annot_d, P_flat, None, n_indiv=N,
                                components=(("add", None),), b2=b2,
                                packed=True, dtype=jnp.float32,
                                mm_mode="bf16")

    if _want("jnp"):
        t = scan_over(jnp_stats, lambda S: make_packed(S, padded=False))
        results["jnp_packed"] = flops_per_block / t / 1e9

    # ---- pallas full block stats (bf16 and split2) -------------------------
    for mode in ("bf16", "split2"):
        if not _want(f"pallas_{mode}"):
            continue
        def pl_stats(blk, _mode=mode):
            return block_stats_pallas_core(
                blk, fill, annot_d, P_perm, None, mask, n_indiv=N,
                components=(("add", None),), b2=b2, dtype=jnp.float32,
                kernel_dtype=jnp.bfloat16, mm_split=(_mode == "split2"),
                clean=True, interpret=not on_tpu, tm=tm, tn=tn)
        t = scan_over(pl_stats, lambda S: make_packed(S, padded=True))
        results[f"pallas_{mode}"] = flops_per_block / t / 1e9

    # ---- pallas word decode (int32, 16 codes/lane) --------------------------
    perm16 = plane_permutation(n_pad, tn, planes=16)
    P16 = jax.device_put(P_nat[perm16], dev)
    mask16 = jax.device_put((perm16 < N).astype(np.float32), dev)

    def make_words(S):
        shape = (S, m, n_pad // 16)
        return jax.jit(lambda k: jax.random.randint(
            k, shape, -2**31, 2**31 - 1, jnp.int32))(
            jax.device_put(jax.random.key(S), dev))

    for mode in ("bf16", "split2"):
        if not _want(f"pallas_word_{mode}"):
            continue
        def plw_stats(blk, _mode=mode):
            return block_stats_pallas_core(
                blk, fill, annot_d, P16, None, mask16, n_indiv=N,
                components=(("add", None),), b2=b2, dtype=jnp.float32,
                kernel_dtype=jnp.bfloat16, mm_split=(_mode == "split2"),
                clean=True, word=True, interpret=not on_tpu, tm=tm, tn=tn,
                ytg_planewise=os.environ.get("BK_YTG_WIDE", "0") != "1")
        t = scan_over(plw_stats, make_words)
        results[f"pallas_word_{mode}"] = flops_per_block / t / 1e9

    # ---- isolated stages ----------------------------------------------------
    fill2 = jnp.zeros((m, 1), jnp.float32)
    Cb = P_perm.astype(jnp.float32)
    if _want("stage1_gp"):
        t = scan_over(
            lambda blk: gp_matmul(blk, fill2, Cb, tm=tm, tn=tn,
                                  dtype=jnp.bfloat16, clean=True,
                                  interpret=not on_tpu),
            lambda S: make_packed(S, padded=True))
        results["stage1_gp"] = stage1_flops / t / 1e9

    if _want("stage2_ytg"):
        Yt = jnp.asarray(rng.normal(size=(K * b2, m)), jnp.bfloat16)
        t = scan_over(
            lambda blk: ytg_matmul(blk, fill2, Yt, tm=tm, tn=tn,
                                   dtype=jnp.bfloat16, clean=True,
                                   interpret=not on_tpu),
            lambda S: make_packed(S, padded=True))
        results["stage2_ytg"] = stage2_flops / t / 1e9

    # word-mode stage 2 (the production path) with the planewise toggle:
    # pw = one dot per decoded plane (decode/MXU overlap), wide = planes
    # concatenated into the full (tm, tn) tile and ONE MXU pass per cell
    for pw, tag in ((True, "pw"), (False, "wide")):
        name = f"stage2_ytg_word_{tag}"
        if not _want(name):
            continue
        Ytw = jnp.asarray(rng.normal(size=(K * b2, m)), jnp.bfloat16)
        t = scan_over(
            lambda blk, _pw=pw: ytg_matmul(
                blk, fill2, Ytw, tm=tm, tn=tn, dtype=jnp.bfloat16,
                clean=True, word=True, planewise=_pw,
                interpret=not on_tpu),
            make_words)
        results[name] = stage2_flops / t / 1e9

    # ---- transposed stage 1: out (W, m) = C^T @ g^T over individual-major
    # packed words. The SNP axis lands on lanes (128-wide tiles always full)
    # and the narrow probe width W rides sublanes — the same shape trick the
    # stage-2 kernel already uses. Content is random (timing only); the
    # production contract needs packed^T staged individual-major.
    def make_words_t(S):
        shape = (S, n_pad, m // 16)
        return jax.jit(lambda k: jax.random.randint(
            k, shape, -2**31, 2**31 - 1, jnp.int32))(
            jax.device_put(jax.random.key(S), dev))

    fillN = jnp.zeros((n_pad, 1), jnp.float32)
    Ct = jnp.asarray(rng.normal(size=(Bp, n_pad)), jnp.bfloat16)
    # word mode needs tn % 2048 == 0 (int32 lane tiles must span >=128 words)
    for tn_t in (2048,):
        if not _want(f"stage1_t_word_tn{tn_t}"):
            continue
        t = scan_over(
            lambda blk, _tn=tn_t: ytg_matmul(
                blk, fillN, Ct, tm=tm, tn=_tn, dtype=jnp.bfloat16,
                clean=True, word=True, interpret=not on_tpu),
            make_words_t)
        results[f"stage1_t_word_tn{tn_t}"] = stage1_flops / t / 1e9

    # word-mode baseline for the same isolated stage 1
    if _want("stage1_gp_word"):
        C16 = jnp.asarray(P_nat[perm16], jnp.bfloat16)
        t = scan_over(
            lambda blk: gp_matmul(blk, fill2, C16, tm=tm, tn=tn,
                                  dtype=jnp.bfloat16, clean=True, word=True,
                                  interpret=not on_tpu),
            make_words)
        results["stage1_gp_word"] = stage1_flops / t / 1e9

    # ---- roofline context ----------------------------------------------------
    packed_bytes = m * nb
    hbm_bound_gflops = flops_per_block / (
        2 * packed_bytes / (peak_gbs * 1e9)) / 1e9  # 2 stages re-read bytes
    report = {
        "shape": {"N": N, "m": m, "K": K, "B": B, "cov": use_cov, "b2": b2},
        "gflops": {k: round(v, 1) for k, v in results.items()},
        "mfu_pct": {k: round(100 * v / (peak_tf * 1e3), 2)
                    for k, v in results.items()},
        "hbm_bound_gflops": round(hbm_bound_gflops, 1),
        "peak_tflops": peak_tf,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
