#!/usr/bin/env python
"""Regenerate the example dataset (the reference's example/test.bed is a
stripped blob, so we synthesize an equivalent: N=5000, M=10000, 1 trait,
5 covariates, binary env, single + 8-bin annots)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyrhe_tpu.io import synth  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    prefix = os.path.join(HERE, "test")
    synth.make_dataset(prefix, 5000, 10000, seed=42, missing_rate=0.005)
    a1 = synth.make_annot(os.path.join(HERE, "single.annot"), 10000, 1,
                          seed=42)
    synth.make_annot(os.path.join(HERE, "multi.annot"), 10000, 8, seed=43)
    cov = synth.make_cov_file(os.path.join(HERE, "test.cov"), 5000,
                              num_cov=5, seed=42)
    env = synth.make_env_file(os.path.join(HERE, "test.env"), 5000,
                              num_env=1, seed=42)
    synth.simulate_pheno_file(prefix, prefix, [0.2], a1, seed=44, cov=cov,
                              env=env, sigma_gxe=0.05)
    synth.simulate_pheno_file(os.path.join(HERE, "test.multi"), prefix,
                              [0.2], a1, seed=45, num_traits=2)
    os.rename(os.path.join(HERE, "test.multi.pheno"),
              os.path.join(HERE, "test.pheno.multi"))
    print("example dataset written under", HERE)


if __name__ == "__main__":
    main()
