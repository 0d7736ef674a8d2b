"""Tabular genetics file readers (.bim/.fam/annot/pheno/cov/env).

Behavioral spec: reference pyrhe/src/util/file_processing.py. Each reader
reproduces the reference's missing-data semantics (NA / -9 handling, binary
phenotype detection, FID/IID dropping, categorical one-hot side files) while
being vectorized NumPy/pandas rather than per-line Python loops.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def read_bim(filename: str) -> int:
    """Count SNPs in a .bim file.

    Exact parity with reference file_processing.py:6-23, which counts
    EVERY line — including comments and blank lines (its `continue`
    skips nothing: the counter was already incremented). M drives the
    .bed decode geometry, so a silently inflated count would corrupt
    every downstream genotype; we keep the reference's count but warn
    loudly when non-data lines inflate it.
    """
    total = data = 0
    with open(filename, "r") as f:
        for line in f:
            total += 1
            if line.strip() and not line.startswith("#"):
                data += 1
    if data != total:
        import warnings
        warnings.warn(
            f"{filename}: {total - data} blank/comment line(s) counted as "
            f"SNPs (M={total}) for parity with the reference's read_bim; "
            f"if the .bed actually holds {data} SNPs the decode geometry "
            f"will be wrong — clean the .bim", stacklevel=2)
    return total


def read_fam(filename: str):
    """Return (num_individuals, fam dataframe). Reference file_processing.py:25-35."""
    df = pd.read_csv(filename, sep=r"\s+", header=None)
    return df.shape[0], df


def read_annot(filename: str, num_jack: int | None = None):
    """Read an M x K 0/1 annotation matrix.

    Returns (num_bin, annot_matrix int8 (M,K), len_bin int64 (K,)).
    Reference file_processing.py:37-69 (num_jack arg unused there too).
    """
    annot = np.loadtxt(filename, dtype=np.int64, comments="#", ndmin=2)
    len_bin = annot.sum(axis=0).astype(np.int64)
    return annot.shape[1], annot, len_bin


def generate_annot(filename: str, num_snp: int, num_bin: int, rng=None) -> None:
    """Write a random one-hot annotation file (reference file_processing.py:109-118).

    Uses the provided RNG (or the global legacy np.random state like the
    reference, which calls np.random.randint per SNP).
    """
    randint = rng.randint if rng is not None else np.random.randint
    with open(filename, "w") as f:
        for _ in range(num_snp):
            row = [0] * num_bin
            row[randint(0, num_bin)] = 1
            f.write(" ".join(str(v) for v in row) + "\n")


def read_pheno(filename: str):
    """Read a `FID IID p1..pT` phenotype file.

    Returns (y float64 (N,T) with -9 rows for missing individuals,
    missing_indv row-index list, binary flag). An individual is missing if
    ANY trait is NA or -9 (reference file_processing.py:72-107). The binary
    flag is True when every observed value is in {0,1,2}.
    """
    with open(filename, "r") as f:
        lines = f.readlines()
    header = lines[0].strip().split()
    num_ph = len(header) - 2

    y = []
    missing_indv = []
    all_binary = True
    valid_values = {0.0, 1.0, 2.0}
    for i, line in enumerate(lines[1:]):
        cols = line.strip().split()
        vals_raw = cols[2:]
        is_missing = False
        vals = []
        for v in vals_raw:
            if v == "NA":
                is_missing = True
                break
            fv = float(v)
            if fv == -9:
                is_missing = True
                break
            vals.append(fv)
        if is_missing:
            y.append([-9.0] * num_ph)
            missing_indv.append(i)
        else:
            y.append(vals)
            if not all(v in valid_values for v in vals):
                all_binary = False
    return np.array(y, dtype=np.float64), missing_indv, all_binary


def read_cov(
    filename: str,
    std: bool = False,
    missing_indvs: list | None = None,
    cov_impute_method: str = "ignore",
    one_hot_conversion: bool = False,
    categorical_threshold: int = 100,
    logger=None,
    one_hot_dir: str | None = None,
):
    """Read a covariate file, dropping FID/IID columns.

    Semantics (reference file_processing.py:121-209):
      - rows already missing (from the phenotype) are dropped first
      - a row is newly-missing if any covariate is NaN or -9
      - "ignore": drop newly-missing rows; "mean": impute with column mean
      - with one_hot_conversion, categorical columns (nunique <= threshold)
        are written to `<col>_one_hot.cov` side files; like the reference,
        the RETURNED matrix is the raw (non-one-hot) values.
    Returns (cov matrix float64 (N_kept, C), all_missing_indvs).
    """
    import os

    from ..utils.types import CovImputeMethod
    CovImputeMethod(cov_impute_method)  # raises on unknown value

    df = pd.read_csv(filename, sep=r"\s+")
    missing_indvs = list(missing_indvs) if missing_indvs else []
    if missing_indvs:
        df = df.drop(index=missing_indvs, errors="ignore")
    for col in ("FID", "IID"):
        if col in df.columns:
            df = df.drop(col, axis=1)

    num = df.apply(pd.to_numeric, errors="coerce")
    is_missing = num.isna().any(axis=1) | (num == -9).any(axis=1)
    newly_missing = df.index[is_missing].tolist()

    if cov_impute_method == "ignore":
        df = num[~is_missing]
    else:  # mean imputation
        num = num.mask(num == -9)
        df = num.fillna(num.mean())
        newly_missing = []

    all_missing = missing_indvs + newly_missing

    if one_hot_conversion:
        for column in df.columns:
            nuniq = df[column].nunique()
            if nuniq <= categorical_threshold:
                if logger:
                    logger._debug(
                        f"Column '{column}' detected as categorical with {nuniq} unique values."
                    )
                one_hot = pd.get_dummies(df[column], prefix=column).astype(int)
                out_name = f"{column}_one_hot.cov"
                if one_hot_dir is not None:
                    out_name = os.path.join(one_hot_dir, out_name)
                one_hot.to_csv(out_name, index=False, sep=" ", header=False)
                if logger:
                    logger._debug(
                        f"One-hot encoded values for '{column}' stored in '{out_name}'"
                    )

    if std:
        df = (df - df.mean()) / df.std(ddof=1)

    return df.values.astype(np.float64), all_missing


def read_env_file(file_path: str):
    """Read environment columns (everything but FID/IID).

    Returns (num_env, env float64 (N, num_env)). The reference
    (file_processing.py:212-227) computes num_env = ncols-2 but only ever
    reads the single column named 'env'; we read all env columns so
    num_env > 1 actually works — identical behavior for the tested
    num_env == 1 case.
    """
    df = pd.read_csv(file_path, sep=r"\s+")
    for col in ("FID", "IID"):
        if col in df.columns:
            df = df.drop(col, axis=1)
    env = df.to_numpy(dtype=np.float64)
    if env.ndim == 1:
        env = env[:, None]
    return env.shape[1], env
