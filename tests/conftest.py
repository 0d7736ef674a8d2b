"""Test harness config: CPU backend with 8 virtual devices + x64 enabled,
so sharding tests run on a virtual mesh and parity tests can use float64.
Must run before jax initializes."""
import os

# Force an 8-virtual-device CPU backend even when the session env points at
# a TPU: parity tests need float64 and a mesh. The TPU plugin's
# sitecustomize initializes backends at interpreter start, so they must be
# torn down before the cpu/x64/device-count configs can apply.
# The original platform is kept so the on-accelerator smoke test
# (test_tpu_smoke.py) can target the real chip from a subprocess.
ORIG_JAX_PLATFORMS = os.environ.get("JAX_PLATFORMS")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
from jax.extend.backend import clear_backends  # noqa: E402

clear_backends()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pyrhe_tpu.io import synth  # noqa: E402
from pyrhe_tpu.io.bed import BedFile  # noqa: E402


@pytest.fixture(scope="session")
def small_dataset(tmp_path_factory):
    """N=600, M=800 synthetic dataset with annot/pheno/cov/env files."""
    d = tmp_path_factory.mktemp("data")
    prefix = str(d / "test")
    synth.make_dataset(prefix, 600, 800, seed=3, missing_rate=0.01)
    annot1 = synth.make_annot(str(d / "single.annot"), 800, 1, seed=3)
    annot8 = synth.make_annot(str(d / "multi.annot"), 800, 8, seed=4)
    cov = synth.make_cov_file(str(d / "test.cov"), 600, num_cov=3, seed=3)
    env = synth.make_env_file(str(d / "test.env"), 600, num_env=1, seed=3)
    synth.simulate_pheno_file(prefix, prefix, [0.4], annot1, seed=5, cov=cov,
                              env=env, sigma_gxe=0.15)
    return {
        "dir": str(d), "prefix": prefix, "annot1": annot1, "annot8": annot8,
        "cov": cov, "env": env,
        "annot1_path": str(d / "single.annot"),
        "annot8_path": str(d / "multi.annot"),
        "cov_path": str(d / "test.cov"), "env_path": str(d / "test.env"),
        "pheno_path": prefix + ".pheno",
    }


@pytest.fixture(scope="session")
def filtered_dataset(small_dataset, tmp_path_factory):
    """small_dataset with NA phenotype rows, so load_dataset DROPS
    individuals (keep_idx set) — exercises the filtered engine paths."""
    d = tmp_path_factory.mktemp("filtered")
    with open(small_dataset["pheno_path"]) as f:
        lines = f.read().splitlines()
    na_rows = {1, 7, 300, 599, 600}     # 1-indexed body rows, incl. ends
    out = [lines[0]]
    for i, ln in enumerate(lines[1:], start=1):
        cols = ln.split()
        out.append(" ".join(cols[:2] + ["NA"] * (len(cols) - 2))
                   if i in na_rows else ln)
    p = str(d / "missing.pheno")
    with open(p, "w") as f:
        f.write("\n".join(out) + "\n")
    return dict(small_dataset, pheno_path=p, n_missing=len(na_rows))


def load_geno_nan(prefix, num_indiv, num_snp):
    bed = BedFile(prefix + ".bed", num_indiv, num_snp)
    g = bed.read_block(0, num_snp).astype(np.float64).T  # (N, M)
    g[g == 255] = np.nan
    return g
