"""Utility-layer tests: add_cov_pheno, constant, platform helper."""
import numpy as np


def test_add_cov_effect(tmp_path):
    from pyrhe_tpu.utils.add_cov_pheno import add_cov_effect

    rng = np.random.default_rng(0)
    n = 50
    pheno = tmp_path / "t.pheno"
    with open(pheno, "w") as f:
        f.write("FID IID pheno\n")
        y = rng.normal(size=n)
        for i in range(n):
            f.write(f"{i} {i} {y[i]:.6f}\n")
    cov = tmp_path / "t.cov"
    with open(cov, "w") as f:
        f.write("FID IID age sex\n")
        c = rng.normal(size=(n, 2))
        for i in range(n):
            f.write(f"{i} {i} {c[i,0]:.6f} {c[i,1]:.6f}\n")

    out = add_cov_effect(str(pheno), str(cov), effect=2.0)
    got = np.loadtxt(out, skiprows=1, usecols=2)
    cs = (c - c.mean(0)) / c.std(0, ddof=1)   # read_cov std is pandas ddof=1
    np.testing.assert_allclose(got, y + 2.0 * cs.sum(axis=1), atol=2e-5)


def test_constant_reads_dotenv(tmp_path, monkeypatch):
    (tmp_path / ".env").write_text("RESULT_DIR=/x/results\n# c\nBAD\n")
    monkeypatch.chdir(tmp_path)
    import importlib

    import pyrhe_tpu.constant as const
    importlib.reload(const)
    assert const.RESULT_DIR == "/x/results"
    assert const.DATA_DIR == "."
