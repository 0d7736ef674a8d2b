#!/usr/bin/env python
"""Sweep many phenotypes over one genotype dataset (the role of the
reference's test_real.py, which loops 50 UKBB phenotypes by editing a
shared INI config under an fcntl lock and launching one process each).

TPU-native version: all phenotype files are run through ONE engine
precompute per file — and if a file holds multiple trait columns they all
share a single precompute (every residualized trait rides the same probe
matrix) — so the genotype pass is not repeated per trait like the
reference. Results are collected into a summary JSON compatible with
parse_output.py's schema.

Usage:
    python scripts/sweep_phenotypes.py -g data/geno -annot data/snps.annot \
        --pheno_glob 'phenos/*.pheno' -o results/ [-c covar.cov] [-k 10]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-g", "--genotype", required=True)
    ap.add_argument("-annot", "--annotation", default=None)
    ap.add_argument("--pheno_glob", required=True)
    ap.add_argument("-c", "--covariate", default=None)
    ap.add_argument("-o", "--output_dir", default=None,
                    help="defaults to $RESULT_DIR/sweep_out (constant.py)")
    ap.add_argument("-k", "--num_vec", type=int, default=10)
    ap.add_argument("-jn", "--num_block", type=int, default=100)
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from pyrhe_tpu import RHE, StreamingRHE
    from pyrhe_tpu.constant import RESULT_DIR

    if args.output_dir is None:
        args.output_dir = os.path.join(RESULT_DIR, "sweep_out")
    os.makedirs(args.output_dir, exist_ok=True)
    summary = {}
    files = sorted(glob.glob(args.pheno_glob))
    if not files:
        sys.exit(f"no phenotype files match {args.pheno_glob}")
    cls = StreamingRHE if args.streaming else RHE
    for path in files:
        name = os.path.splitext(os.path.basename(path))[0]
        t0 = time.time()
        model = cls(geno_file=args.genotype, annot_file=args.annotation,
                    pheno_file=path, cov_file=args.covariate,
                    num_jack=args.num_block, num_random_vec=args.num_vec,
                    seed=args.seed)
        for trait in range(model.num_traits):
            res = model(trait=trait)
            key = name if model.num_traits == 1 else f"{name}:trait{trait}"
            summary[key] = {k: (v.tolist() if hasattr(v, "tolist") else v)
                            for k, v in res.items()}
            summary[key]["runtime"] = time.time() - t0
        model.log.output_file = os.path.join(args.output_dir, name + ".txt")
        model.log._save_log()
        print(f"{name}: done in {time.time() - t0:.1f}s", flush=True)

    with open(os.path.join(args.output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {args.output_dir}/summary.json ({len(summary)} traits)")


if __name__ == "__main__":
    main()
