"""End-to-end CLI integration tests.

Mirrors the reference's integration-test pattern (reference
pyrhe/test/integration_test/test_rhe.py): run the real CLI in a
subprocess with an INI config, regex-parse the human-readable output file,
and check estimates. Ground truth comes from the NumPy oracle (the
reference's test.bed is a stripped blob, so fixtures are synthesized),
compared with the same ±SE interval-overlap criterion.
"""
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from conftest import load_geno_nan
from oracle_numpy import Oracle

from pyrhe_tpu.core.data import load_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N, M = 600, 800


def parse_output(path, num_bins=1):
    with open(path) as f:
        content = f.read()
    res = {}
    m = re.search(r'Sigma\^2_e : ([-\d.e]+)  SE : ([\d.e-]+)', content)
    res['sigma2_e'] = (float(m.group(1)), float(m.group(2)))
    res['sigma2_g'] = [
        (float(a), float(b)) for a, b in
        re.findall(r'Sigma\^2_g\[\d+\] : ([-\d.e]+)  SE : ([\d.e-]+)', content)]
    res['h2_g'] = [
        (float(a), float(b)) for a, b in
        re.findall(r'h2_g\[\d+\] : ([-\d.e]+) : ([\d.e-]+)', content)]
    m = re.search(r'Total h2 : ([-\d.e]+) SE: ([\d.e-]+)', content)
    res['total_h2'] = (float(m.group(1)), float(m.group(2)))
    res['enrichment_g'] = [
        (float(a), float(b)) for a, b in
        re.findall(r'Enrichment g\[\d+\] : ([-\d.e]+) SE : ([\d.e-]+)',
                   content)]
    m = re.search(r'Runtime:  ([\d.]+)', content)
    res['runtime'] = float(m.group(1))
    return res


def overlap(a, b):
    return a[0] - a[1] <= b[0] + b[1] and a[0] + a[1] >= b[0] - b[1]


def write_config(path, ds, tmpdir, model="rhe", annot="annot1_path",
                 streaming=False, cov=True, env=False, B=8, J=8,
                 genie_model=None):
    out = os.path.join(tmpdir, "out.txt")
    lines = [
        "[PyRHE_Config]",
        f"model = {model}",
        f"genotype = {ds['prefix']}",
        f"phenotype = {ds['pheno_path']}",
        f"annotation = {ds[annot]}",
        f"output = {out}",
        f"num_vec = {B}",
        f"num_block = {J}",
        "seed = 7",
        f"streaming = {'yes' if streaming else 'no'}",
        "geno_impute_method = binary",
        "cov_impute_method = ignore",
        "trace = yes",
        f"trace_dir = {tmpdir}",
    ]
    if cov:
        lines.append(f"covariate = {ds['cov_path']}")
    if env:
        lines.append(f"env = {ds['env_path']}")
    if genie_model:
        lines.append(f"genie_model = {genie_model}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return out


def run_cli(config):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_rhe.py"),
         "--config", config],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, f"CLI failed:\n{r.stdout}\n{r.stderr}"
    return r


def oracle_truth(ds, model="rhe", annot_key="annot1", cov=True, env=False,
                 B=8, J=8, genie_model="G"):
    data = load_dataset(ds["prefix"], annot_file=ds[
        "annot1_path" if annot_key == "annot1" else "annot8_path"],
        pheno_file=ds["pheno_path"],
        cov_file=ds["cov_path"] if cov else None,
        env_file=ds["env_path"] if env else None,
        num_random_vec=B, seed=7)
    geno = load_geno_nan(ds["prefix"], N, M)
    orc = Oracle(geno, ds[annot_key], data.pheno, cov=data.cov,
                 env=data.env, model=model, genie_model=genie_model,
                 num_random_vec=B, num_jack=J, seed=7)
    sj, st = orc.estimate()
    se = orc.jackknife_se(sj, J)
    h2 = orc.h2_nonoverlap(sj, st)
    return orc, sj, st, se, h2


@pytest.mark.parametrize("streaming", [False, True])
def test_cli_rhe_bin1(small_dataset, tmp_path, streaming):
    cfg = str(tmp_path / "cfg.txt")
    out = write_config(cfg, small_dataset, str(tmp_path),
                       streaming=streaming)
    run_cli(cfg)
    res = parse_output(out)
    orc, sj, st, se, h2 = oracle_truth(small_dataset)
    # CLI runs float32 on CPU-without-x64 (subprocess has no x64 flag), so
    # compare with interval overlap AND a loose absolute check.
    assert overlap(res['sigma2_g'][0], (st[0], se[0]))
    assert overlap(res['sigma2_e'], (st[1], se[1]))
    assert abs(res['sigma2_g'][0][0] - st[0]) < 5e-3
    assert abs(res['total_h2'][0] - h2[-1, -1]) < 5e-3
    assert res['enrichment_g'][0][0] == pytest.approx(1.0, abs=1e-6)
    # trace sumstats written
    mn = tmp_path / f"run_{os.path.basename(small_dataset['pheno_path'])}.MN"
    tr = str(mn)[:-3] + ".tr"
    assert mn.exists() and os.path.exists(tr)
    with open(mn) as f:
        assert f.read().splitlines()[1] == f"{N},{M},8,1,8"


def test_cli_rhe_bin8(small_dataset, tmp_path):
    cfg = str(tmp_path / "cfg.txt")
    out = write_config(cfg, small_dataset, str(tmp_path), annot="annot8_path")
    run_cli(cfg)
    res = parse_output(out, num_bins=8)
    orc, sj, st, se, h2 = oracle_truth(small_dataset, annot_key="annot8")
    assert len(res['sigma2_g']) == 8
    for k in range(8):
        assert overlap(res['sigma2_g'][k], (st[k], se[k]))
    assert overlap(res['sigma2_e'], (st[8], se[8]))


def test_cli_genie(small_dataset, tmp_path):
    cfg = str(tmp_path / "cfg.txt")
    out = write_config(cfg, small_dataset, str(tmp_path), model="genie",
                       env=True, genie_model="G+GxE+NxE")
    run_cli(cfg)
    with open(out) as f:
        content = f.read()
    assert "Sigma^2_gxe[0]" in content
    assert "Sigma^2_nxe[0]" in content
    assert "Total h2_gxe" in content
    orc, sj, st, se, h2 = oracle_truth(small_dataset, model="genie",
                                       env=True, genie_model="G+GxE+NxE")
    m = re.search(r'Sigma\^2_gxe\[0\] : ([-\d.e]+)  SE : ([\d.e-]+)', content)
    assert overlap((float(m.group(1)), float(m.group(2))), (st[1], se[1]))


def test_cli_rhe_dom(small_dataset, tmp_path):
    cfg = str(tmp_path / "cfg.txt")
    out = write_config(cfg, small_dataset, str(tmp_path), model="rhe_dom")
    run_cli(cfg)
    res = parse_output(out)
    assert len(res['sigma2_g']) == 2  # additive + dominance rows
    orc, sj, st, se, h2 = oracle_truth(small_dataset, model="rhe_dom")
    for k in range(2):
        assert overlap(res['sigma2_g'][k], (st[k], se[k]))


def test_cli_multi_trait(small_dataset, tmp_path):
    # two-trait phenotype file
    from pyrhe_tpu.io import synth
    pheno2 = str(tmp_path / "multi")
    synth.simulate_pheno_file(pheno2, small_dataset["prefix"], [0.3],
                              small_dataset["annot1"], seed=9, num_traits=2)
    cfg = str(tmp_path / "cfg.txt")
    ds = dict(small_dataset, pheno_path=pheno2 + ".pheno")
    out = write_config(cfg, ds, str(tmp_path), cov=False)
    run_cli(cfg)
    with open(out) as f:
        content = f.read()
    assert "OUTPUT FOR TRAIT 0" in content
    assert "OUTPUT FOR TRAIT 1" in content
    assert content.count("Variance components:") == 2


def test_cli_liability_binary_pheno(small_dataset, tmp_path):
    """Binary phenotype + --samp_prev/--pop_prev prints liability-scale h2
    (works here; the reference's call path is broken, rhe.py:84 — SURVEY
    2.6)."""
    from pyrhe_tpu.io import synth

    bphen = str(tmp_path / "bin.pheno")
    synth.simulate_pheno_file(str(tmp_path / "bin"), small_dataset["prefix"],
                              [0.4], small_dataset["annot1"], seed=5,
                              binary=True)
    os.rename(str(tmp_path / "bin.pheno"), bphen)
    out = str(tmp_path / "out.txt")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_rhe.py"),
         "-g", small_dataset["prefix"], "-p", bphen,
         "-annot", small_dataset["annot1_path"], "-k", "4", "-jn", "4",
         "-s", "7", "--samp_prev", "0.3", "--pop_prev", "0.1", "-o", out],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    content = open(out).read()
    assert "Liability Scale h2 for binary phenotype:" in content
    m = re.search(r"Total Liability-scale h2 : ([-\d.e]+), SE: ([-\d.e]+), "
                  r"p-value: ([-\d.e]+)", content)
    assert m, content
    assert np.isfinite(float(m.group(1)))


def test_cli_samp_prev_without_pop_prev_errors(small_dataset, tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_rhe.py"),
         "-g", small_dataset["prefix"], "-p", small_dataset["pheno_path"],
         "--samp_prev", "0.3", "-o", str(tmp_path / "o.txt")],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode != 0
    assert "Must set both or neither" in r.stderr


def test_cli_benchmark_runtime(small_dataset, tmp_path):
    cfg = str(tmp_path / "cfg.txt")
    write_config(cfg, small_dataset, str(tmp_path), B=4, J=4, cov=False)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_rhe.py"),
         "--config", cfg, "--benchmark_runtime", "--suppress"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert re.search(r"runtime: [\d.]+ ± [\d.]+ seconds", r.stdout)
