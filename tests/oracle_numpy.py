"""Float64 NumPy oracle: a direct, slow implementation of the reference
PyRHE algorithm (reference pyrhe/src/base/base.py + models/*), used as the
golden source for engine tests. Deliberately written the "reference way"
(per-bin gathered submatrices, explicit UXXz/XXUz accumulation) so that the
engine's fused/masked/derived-by-linearity formulation is validated against
an independent computation path.

RNG discipline matches the reference: probes = RandomState(seed).randn
drawn once (base.py:73,176); binary imputation reseeds RandomState(seed)
per block and consumes one uniform per SNP column (base.py:277-289,510).
"""
from __future__ import annotations

import numpy as np
import scipy.linalg


def impute_block(X: np.ndarray, method: str, seed: int) -> np.ndarray:
    """X: (N, m) with NaN for missing. Reference base.py:277-289."""
    X = X.copy()
    m = X.shape[1]
    rs = np.random.RandomState(seed)
    for c in range(m):
        mask = np.isnan(X[:, c])
        if method == "binary":
            p = np.nanmean(X[:, c]) * 0.5
            rval = rs.random_sample()
            d0, d1 = (1 - p) ** 2, 2 * p * (1 - p)
            fill = 0.0 if rval < d0 else (1.0 if rval < d0 + d1 else 2.0)
            X[mask, c] = fill
        else:
            X[mask, c] = 0.0
    return X


def standardize(X):
    means = np.mean(X, axis=0)
    stds = 1 / np.sqrt(means * (1 - 0.5 * means))
    return (X - means) * stds


def standardize_dom(X):
    maf = np.mean(X, axis=0) / 2
    enc = (X == 1) * (2 * maf[None, :]) + (X == 2) * (4 * maf[None, :] - 2)
    means = np.mean(enc, axis=0)
    stds = 1 / (2 * maf * (1 - maf))
    return (enc - means) * stds


class Oracle:
    def __init__(self, geno_nan, annot, pheno, cov=None, env=None,
                 model="rhe", genie_model="G", num_random_vec=10,
                 num_jack=10, seed=0, geno_impute_method="binary"):
        """geno_nan: (N, M) dosages with NaN for missing (post-flip
        convention); pheno: (N,) or (N, T) CENTERED; cov: (N, C); env:
        (N, num_env)."""
        self.X = geno_nan
        self.N, self.M_snp = geno_nan.shape
        self.annot = annot
        self.K = annot.shape[1]
        self.len_bin = annot.sum(axis=0)
        self.pheno = pheno if pheno.ndim == 2 else pheno[:, None]
        self.cov = cov
        self.env = env
        self.num_env = 0 if env is None else env.shape[1]
        self.model = model
        self.genie_model = genie_model
        self.B = num_random_vec
        self.J = num_jack
        self.seed = seed
        self.impute_method = geno_impute_method
        self.use_cov = cov is not None
        self.Q = np.linalg.pinv(cov.T @ cov) if self.use_cov else None

        rs = np.random.RandomState(seed)
        self.Z = rs.randn(self.N, self.B)
        self.Uzb = (cov @ (self.Q @ (cov.T @ self.Z))
                    if self.use_cov else None)

        if model == "rhe":
            self.E = self.K
            self.n_nxe = 0
        elif model == "rhe_dom":
            self.E = 2 * self.K
            self.n_nxe = 0
        elif model == "genie":
            ngxe = (self.K * self.num_env
                    if genie_model in ("G+GxE", "G+GxE+NxE") else 0)
            self.n_nxe = self.num_env if genie_model == "G+GxE+NxE" else 0
            self.E = self.K + ngxe + self.n_nxe
        self.num_gen_env_bin = (self.K * self.num_env
                                if model == "genie" and genie_model
                                in ("G+GxE", "G+GxE+NxE") else 0)

    def block_range(self, j):
        step = self.M_snp // self.J
        s = j * step
        e = s + step if j < self.J - 1 else self.M_snp
        return s, e

    def proj(self, v):
        return self.cov @ (self.Q @ (self.cov.T @ v))

    def resid(self, y):
        return y - self.proj(y) if self.use_cov else y

    def precompute(self, trait=0):
        N, B, K, J, E = self.N, self.B, self.K, self.J, self.E
        y = self.pheno[:, trait:trait + 1]
        ytil = self.resid(y)
        XXz = np.zeros((E, J + 1, B, N))
        XXUz = np.zeros((E, J + 1, B, N))
        yXXy = np.zeros((E, J + 1))
        M = np.zeros((J + 1, E), dtype=np.int64)
        M[J, :K] = self.len_bin
        if self.model == "rhe_dom":
            M[J, K:] = self.len_bin
        elif self.model == "genie":
            for e in range(self.num_env):
                if self.num_gen_env_bin:
                    M[J, K + e * K:K + (e + 1) * K] = self.len_bin
            M[J, self.K + self.num_gen_env_bin:] = 1

        def stats_for(Xs, k, j):
            XXz[k, j] = (Xs @ (Xs.T @ self.Z)).T
            if self.use_cov:
                XXUz[k, j] = (Xs @ (Xs.T @ self.Uzb)).T
            v = Xs.T @ ytil
            yXXy[k, j] = (v.T @ v).item()

        for j in range(J):
            s, e = self.block_range(j)
            Xj = impute_block(self.X[:, s:e], self.impute_method, self.seed)
            sub_annot = self.annot[s:e]
            for k in range(K):
                cols = np.nonzero(sub_annot[:, k])[0]
                Xk = Xj[:, cols]
                M[j, k] = M[J, k] - Xk.shape[1]
                Xs = standardize(Xk)
                stats_for(Xs, k, j)
                if self.model == "rhe_dom":
                    M[j, K + k] = M[J, K + k] - Xk.shape[1]
                    stats_for(standardize_dom(Xk), K + k, j)
                if self.model == "genie" and self.num_gen_env_bin:
                    for ei in range(self.num_env):
                        kg = K + ei * K + k
                        M[j, kg] = M[J, kg] - Xk.shape[1]
                        stats_for(Xs * self.env[:, ei:ei + 1], kg, j)
            if self.model == "genie" and self.n_nxe:
                for ei in range(self.num_env):
                    M[j, K + self.num_gen_env_bin + ei] = 1

        # NxE stats on the total slot (diag(env) pseudo-genotype, analytic)
        for ei in range(self.n_nxe):
            k = self.K + self.num_gen_env_bin + ei
            ev = self.env[:, ei:ei + 1]
            XXz[k, J] = ((ev * ev) * self.Z).T
            if self.use_cov:
                XXUz[k, J] = ((ev * ev) * self.Uzb).T
            yXXy[k, J] = float(((ev * ytil) ** 2).sum())

        # aggregate: totals in slot J, then leave-one-out
        for k in range(E):
            if k < E - self.n_nxe:
                XXz[k, J] = XXz[k, :J].sum(axis=0)
                XXUz[k, J] = XXUz[k, :J].sum(axis=0)
                yXXy[k, J] = yXXy[k, :J].sum()
            for j in range(J):
                XXz[k, j] = XXz[k, J] - XXz[k, j]
                XXUz[k, j] = XXUz[k, J] - XXUz[k, j]
                yXXy[k, j] = yXXy[k, J] - yXXy[k, j]

        self.XXz, self.XXUz, self.yXXy, self.Mmat = XXz, XXUz, yXXy, M
        self.ytil = ytil

    def setup_Tq(self, j):
        E, B, N = self.E, self.B, self.N
        T = np.zeros((E + 1, E + 1))
        q = np.zeros(E + 1)
        for k in range(E):
            for l in range(E):
                Mk, Ml = self.Mmat[j, k], self.Mmat[j, l]
                B1, B2 = self.XXz[k, j], self.XXz[l, j]
                t = np.sum(B1 * B2)
                if self.use_cov:
                    h3 = self.proj(B1.T)          # (N, B)
                    t += np.sum(self.XXUz[k, j] *
                                self.proj(self.XXz[l, j].T).T) \
                        - 2 * np.sum(h3.T * B2)
                t /= B
                T[k, l] = t / (Mk * Ml) if Mk * Ml != 0 else 0
        for k in range(E):
            Mk = self.Mmat[j, k]
            if self.model == "genie" and k >= self.K:
                btr = np.sum(self.XXz[k, j] * self.Z.T) / (B * Mk)
            else:
                btr = self.N
            if self.use_cov:
                btr -= np.sum(self.XXz[k, j] * self.Uzb.T) / (B * Mk)
            T[k, E] = T[E, k] = btr
            q[k] = self.yXXy[k, j] / Mk if Mk != 0 else 0
        T[E, E] = N - (self.cov.shape[1] if self.use_cov else 0)
        q[E] = (self.ytil.T @ self.ytil).item()
        return T, q

    def estimate(self, trait=0, method="QR"):
        self.precompute(trait)
        sigmas = []
        self.T_border = []
        for j in range(self.J + 1):
            jj = 1 if (self.J == 1 and j == 0) else j
            T, q = self.setup_Tq(jj)
            if method == "QR":
                Qm, R = scipy.linalg.qr(T)
                s = scipy.linalg.solve_triangular(R, Qm.T @ q[:, None])[:, 0]
            else:
                s = np.linalg.lstsq(T, q, rcond=None)[0]
            sigmas.append(s)
            self.T_border.append(T[:, self.E].copy())
        sigmas = np.array(sigmas)
        self.T_border = np.array(self.T_border)
        return sigmas[:-1], sigmas[-1]

    # -- downstream summaries (reference base.py:680-825) --
    @staticmethod
    def jackknife_se(ests, J):
        mean = ests.mean(axis=0)
        return np.sqrt((J - 1) * ((ests - mean) ** 2).sum(axis=0) / J)

    @staticmethod
    def h2_nonoverlap(sig_jack, sig_tot):
        sig = np.vstack([sig_jack, sig_tot[None, :]])
        tot = sig[:, :-1].sum(axis=1, keepdims=True)
        den = tot + sig[:, -1:]
        return np.concatenate([sig[:, :-1] / den, tot / den], axis=1)

    def annot_subsample(self, jack_index):
        """Leave-one-out annot rows (reference base.py:382-393): for
        jack_index == J the masked range runs past the end of the genome,
        so the 'total' sample drops the last (step + remainder) SNPs —
        quirk included deliberately."""
        step = self.M_snp // self.J
        rem = self.M_snp % self.J
        chunk = step if jack_index < self.J - 1 else step + rem
        start = jack_index * step
        mask = np.ones(self.M_snp, dtype=bool)
        mask[start:start + chunk] = False
        return self.annot[mask]

    def h2_overlap(self, sig_jack, sig_tot):
        """Overlapping-annotation h2 via the reference's literal per-SNP
        membership walk (reference base.py:744-785): for every SNP in bin
        k, sum sigma[b]/M[b] over ALL bins b the SNP belongs to."""
        sig = np.vstack([sig_jack, sig_tot[None, :]])
        h2 = np.zeros((self.J + 1, self.E + 1))
        for j in range(self.J + 1):
            total = sig[j, :self.E].sum()
            denom = total + sig[j, -1]
            sub = self.annot_subsample(j)
            for k in range(self.E):
                acc = 0.0
                for snp_idx in np.where(sub[:, k] == 1)[0]:
                    for b in np.where(sub[snp_idx, :] == 1)[0]:
                        if self.Mmat[j, b] != 0:
                            acc += sig[j, b] / self.Mmat[j, b]
                h2[j, k] = acc / denom
            h2[j, self.E] = total / denom
        return h2

    def enrichment(self, h2):
        E = self.E
        out = np.zeros((h2.shape[0], E))
        for j in range(h2.shape[0]):
            Msum = self.Mmat[j].sum()
            for k in range(E):
                Mk = self.Mmat[j, k]
                out[j, k] = ((h2[j, k] / h2[j, -1]) / (Mk / Msum)
                             if (Msum != 0 and Mk != 0) else 0)
        return out
