#!/usr/bin/env python
"""Drive the reference PyRHE (at $PYRHE_DIR, default /root/reference)
through its library API, the way its run_rhe.py main() does
(reference run_rhe.py:28-140) but with a properly int-coerced seed —
the reference CLI never type-coerces --seed and crashes on
np.random.seed('42') (SURVEY 2.6).

Run from the data directory. Requires this _ref_compat dir on PYTHONPATH
for the bed_reader/dotenv shims.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
PYRHE_DIR = os.environ.get("PYRHE_DIR", "/root/reference")
sys.path.insert(0, HERE)
sys.path.insert(0, PYRHE_DIR)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-g", "--genotype", required=True)
    ap.add_argument("-p", "--phenotype", default=None)
    ap.add_argument("-c", "--covariate", default=None)
    ap.add_argument("-e", "--env", default=None)
    ap.add_argument("-annot", "--annotation", default=None)
    ap.add_argument("--model", default="rhe",
                    choices=["rhe", "genie", "rhe_dom"])
    ap.add_argument("--genie_model", default="G+GxE+NxE")
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("-k", "--num_vec", type=int, default=10)
    ap.add_argument("-b", "--num_bin", type=int, default=8)
    ap.add_argument("-jn", "--num_block", type=int, default=100)
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("--num_workers", type=int, default=2)
    ap.add_argument("-o", "--output", default="ref.out")
    ap.add_argument("--trace", action="store_true",
                    help="export the reference's .MN/.tr trace sumstats "
                         "(reference base.py:831-855)")
    ap.add_argument("--trace_dir", default=None)
    args = ap.parse_args()

    from pyrhe.src.util import Logger  # noqa: E402
    from pyrhe.src.models.rhe import RHE, StreamingRHE  # noqa: E402
    from pyrhe.src.models.rhe_dom import (  # noqa: E402
        RHE_DOM, StreamingRHE_DOM)
    from pyrhe.src.models.genie import GENIE, StreamingGENIE  # noqa: E402

    log = Logger(output_file=args.output, suppress=False, debug_mode=False)
    common = dict(
        model=args.model,
        geno_file=args.genotype,
        annot_file=args.annotation,
        pheno_file=args.phenotype,
        cov_file=args.covariate,
        num_bin=args.num_bin,
        num_jack=args.num_block,
        num_random_vec=args.num_vec,
        device="cpu",
        multiprocessing=args.num_workers > 1,
        num_workers=args.num_workers,
        seed=args.seed,
        log=log,
        get_trace=args.trace,
        trace_dir=args.trace_dir,
    )
    if args.model == "rhe":
        cls = StreamingRHE if args.streaming else RHE
        model = cls(**common)
    elif args.model == "rhe_dom":
        cls = StreamingRHE_DOM if args.streaming else RHE_DOM
        model = cls(**common)
    else:
        cls = StreamingGENIE if args.streaming else GENIE
        model = cls(env_file=args.env, genie_model=args.genie_model,
                    **common)

    for trait in range(model.num_traits):
        log._log(f"OUTPUT FOR TRAIT {trait}:")
        t0 = time.time()
        model(trait=trait, method="QR")
        log._log(f"Runtime: {time.time() - t0}")
    log._save_log()


if __name__ == "__main__":
    main()
