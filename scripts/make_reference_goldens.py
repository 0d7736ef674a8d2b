#!/usr/bin/env python
"""Regenerate example/outputs/reference/: golden outputs produced by the
ACTUAL reference implementation (sriramlab/PyRHE at $PYRHE_DIR), not by
this repo's code.

The main goldens under example/outputs/<model>/ are produced by our own
CPU-float64 path; REFERENCE_RUN.md pins parity against the executed
reference for a subset of configs. This script closes the loop for the
example set itself: every example config is run through the reference's
model classes (via scripts/_ref_compat/run_reference.py — the compat
driver REFERENCE_RUN.md documents), so test_golden_example.py can assert
our CLI output against an EXTERNALLY anchored answer instead of
our-code-vs-our-code.

Configs whose reference code path is bit-rotted (SURVEY 2.6 — e.g. the
streaming-GENIE non-mp branch) are recorded as SKIPPED in the README
rather than failing the sweep.

Usage:  python scripts/make_reference_goldens.py [--models rhe,rhe_dom]
"""
from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
EXAMPLE = os.path.join(ROOT, "example")
OUTDIR = os.path.join(EXAMPLE, "outputs", "reference")
sys.path.insert(0, ROOT)

from pyrhe_tpu.cli import parse_config  # noqa: E402

FLAGMAP = {"model": "--model", "genie_model": "--genie_model",
           "genotype": "-g", "phenotype": "-p", "covariate": "-c",
           "env": "-e", "annotation": "-annot", "num_vec": "-k",
           "num_bin": "-b", "num_block": "-jn", "seed": "-s"}


def reference_cmd(cfg_path: str, out_path: str) -> list[str]:
    cfgd = parse_config(cfg_path, "PyRHE_Config")
    cmd = [sys.executable, os.path.join(HERE, "_ref_compat",
                                        "run_reference.py")]
    for key, flag in FLAGMAP.items():
        if cfgd.get(key) not in (None, "", "none", "None"):
            cmd += [flag, str(cfgd[key])]
    if str(cfgd.get("streaming", "no")).lower() in ("yes", "true", "1"):
        cmd.append("--streaming")
    return cmd + ["-o", out_path]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="rhe,rhe_dom,genie")
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--trace_only", action="store_true",
                    help="regenerate only the trace (.MN/.tr) goldens, "
                         "leaving the estimate goldens untouched")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(EXAMPLE, "test.bed")):
        subprocess.run([sys.executable,
                        os.path.join(EXAMPLE, "make_example.py")],
                       check=True)

    results = []
    for model in args.models.split(",") if not args.trace_only else []:
        for cfg in sorted(glob.glob(os.path.join(
                EXAMPLE, "configs", model, "*.txt"))):
            name = os.path.basename(cfg)
            outdir = os.path.join(OUTDIR, model)
            os.makedirs(outdir, exist_ok=True)
            out = os.path.join(outdir, name)
            cmd = reference_cmd(cfg, out)
            t0 = time.time()
            res = subprocess.run(cmd, cwd=EXAMPLE, capture_output=True,
                                 text=True, timeout=args.timeout)
            dt = time.time() - t0
            status = "ok" if res.returncode == 0 else "SKIPPED (crashed)"
            if res.returncode != 0:
                err = res.stderr.strip().splitlines()
                status += ": " + (err[-1][:120] if err else "?")
                if os.path.exists(out):
                    os.remove(out)
            results.append((model, name, status, dt))
            print(f"{model}/{name}: {status} ({dt:.1f}s)", flush=True)

    # --- trace sumstat goldens (reference base.py:831-855) -------------
    # Every model/config the reference can actually run with get_trace:
    # its own get_trace_summary writes the committed .MN/.tr files, so
    # they are format ground truth for SUMRHE consumers
    # (test_golden_example.py diffs ours field-by-field against these).
    # Streaming trace is attempted too but the reference's streaming
    # trace path is bit-rotted (base_streaming.py:125 stores a
    # (scalar, M) tuple where get_trace_summary expects a (J+1, K, K)
    # LD-sum array) — crashes are recorded as SKIPPED, and our streaming
    # .tr is instead pinned bit-identical to our non-streaming .tr.
    for model in args.models.split(","):
        for cfg in sorted(glob.glob(os.path.join(
                EXAMPLE, "configs", model, "*.txt"))):
            name = os.path.splitext(os.path.basename(cfg))[0]
            tracedir = os.path.join(OUTDIR, "trace", model, name)
            os.makedirs(tracedir, exist_ok=True)
            cmd = reference_cmd(cfg, os.path.join(tracedir, "_out.txt"))
            cmd += ["--trace", "--trace_dir", tracedir]
            t0 = time.time()
            try:
                res = subprocess.run(cmd, cwd=EXAMPLE, capture_output=True,
                                     text=True, timeout=args.timeout)
                rc = res.returncode
                tail = (res.stderr.strip().splitlines() or ["?"])[-1][:120]
            except subprocess.TimeoutExpired:
                rc, tail = -1, "timeout (reference deadlock, SURVEY 2.6)"
            status = "ok" if rc == 0 else f"SKIPPED (crashed): {tail}"
            out_txt = os.path.join(tracedir, "_out.txt")
            if os.path.exists(out_txt):
                os.remove(out_txt)   # estimates live in <model>/<name>.txt
            if rc != 0:
                # no partial golden dirs: a run that wrote the .MN then
                # crashed/deadlocked before the .tr must not leave a dir
                # the parametrized golden test would hard-fail on
                for f in os.listdir(tracedir):
                    if f.startswith("run_"):
                        os.remove(os.path.join(tracedir, f))
                if not os.listdir(tracedir):
                    os.rmdir(tracedir)
            results.append((f"trace/{model}", name, status,
                            time.time() - t0))
            print(f"trace/{model}/{name}: {status}", flush=True)

    readme = os.path.join(OUTDIR, "trace" if args.trace_only else "",
                          "README.md")
    with open(readme, "w") as f:
        f.write(
            "# Reference-produced goldens\n\n"
            "Outputs in this directory were produced by the REFERENCE\n"
            "implementation (sriramlab/PyRHE at /root/reference), driven\n"
            "through `scripts/_ref_compat/run_reference.py` (see\n"
            "docs/parity/REFERENCE_RUN.md for the shim design) on the\n"
            "deterministic example dataset from `example/make_example.py`\n"
            "(seeds pinned). Regenerate with\n"
            "`python scripts/make_reference_goldens.py`.\n\n"
            "The reference computes torch-float32 matmuls inside float64\n"
            "accumulators on CPU workers; `test_golden_example.py` asserts\n"
            "our estimates against these files with the SE-interval\n"
            "overlap criterion the reference's own integration tests use\n"
            "(reference test_rhe.py:154-163). Streaming-mode reference\n"
            "outputs differ slightly from its own non-streaming mode (its\n"
            "pass-1 workers consume imputation RNG in a different order);\n"
            "ours is mode-invariant by construction.\n\n"
            "| config | status | runtime (s) |\n|---|---|---|\n")
        for model, name, status, dt in results:
            f.write(f"| {model}/{name} | {status} | {dt:.1f} |\n")
    print(f"wrote {readme}")


if __name__ == "__main__":
    main()
