"""Fused per-block randomized-moment computation — the hot path.

For one jackknife block of m SNPs this computes, in two MXU matmuls, every
quadratic-form statistic the RHE family needs:

    U   = X_blk^T P            (m, Bp)   P = [Z | Uz | y~ columns]
    XXP = X_blk (A_k ⊙ U)      per annotation bin k, (K, N, B+Bcov)
    yXXy[k,t] = sum_{c in bin k} U[c, y_t]^2

compared to the reference's per-(bin, probe) matvec loop
(reference rhe.py:13-22 + base.py:403-417 + mat_mul.py:17-31, which round-
trips numpy->torch->device per matvec). Batching all probes, the Uz probe
columns, and every trait's residualized phenotype into one probe matrix P
turns J*K*num_random_vec matvecs into 2 matmuls per block.

Gene-environment (GxE) statistics reuse the SAME standardized genotype block:
diag(env) X has X_e^T P = X^T (env ⊙ P), so a GxE component is just a
row-scaled probe matrix (reference genie.py:61-75 materializes X ⊙ env
instead). Dominance components re-encode the dosages on device
(reference rhe_dom.py:23-68).

Annotation bins are handled by masking U with the (m, K) annot block —
static shapes, no per-bin column gathers (XLA/TPU-friendly).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .decode import decode_packed_jnp, dosage_from_u8, impute
from .standardize import encode_dominance, standardize_additive


def _dot(a, b, matmul_dtype, out_dtype):
    # TPU matmuls on f32 inputs default to single-pass bf16 on the MXU;
    # request HIGHEST so the f32 path is true f32. The explicit bf16 speed
    # mode opts back into the fast path.
    if matmul_dtype is not None:
        a = a.astype(matmul_dtype)
        b = b.astype(matmul_dtype)
        prec = None
    else:
        prec = jax.lax.Precision.HIGHEST
    return jnp.dot(a, b, preferred_element_type=out_dtype, precision=prec)


def _component_stats(S_t, P, annot_f, env_col, b2, matmul_dtype, out_dtype):
    """Stats for one variance component given its standardized X^T (m, N)."""
    m, _ = S_t.shape
    K = annot_f.shape[1]
    Pr = P if env_col is None else P * env_col[:, None]
    U = _dot(S_t, Pr, matmul_dtype, out_dtype)            # (m, Bp)
    Uxx = U[:, :b2]
    W = (Uxx[:, None, :] * annot_f[:, :, None]).reshape(m, K * b2)
    XXP = _dot(S_t.T, W, matmul_dtype, out_dtype)         # (N, K*b2)
    if env_col is not None:
        XXP = XXP * env_col[:, None]
    XXP = XXP.reshape(-1, K, b2).transpose(1, 0, 2)       # (K, N, b2)
    Uy = U[:, b2:]                                        # (m, T)
    # multiply+reduce, not a dot: positive sums expose XLA's reduced-
    # precision dot accumulation (see core/normal_eq._gram)
    Uy2 = (Uy * Uy).astype(out_dtype)
    yXXy = jnp.sum(Uy2[:, None, :] * annot_f[:, :, None], axis=0)  # (K, T)
    return XXP, yXXy


def block_stats_core(
    geno,           # (m, bytes_per_snp) packed u8 OR (m, N) dosage u8
    fill,           # (m,) imputation fill values
    annot_f,        # (m, K) float annot block
    P,              # (N, Bp) probe matrix [Z | Uz? | y~ traits]
    env,            # (N, num_env) or None
    *,
    n_indiv: int,
    components: tuple,   # (("add"|"dom", env_idx|None), ...)
    b2: int,             # probe columns that participate in XXP (B or 2B)
    packed: bool,
    dtype=jnp.float32,
    matmul_dtype=None,
):
    """Returns (XXP (n_comp*K, N, b2), yXXy (n_comp*K, T), M (n_comp*K,)).

    Un-jitted core, reused under jit (block_stats) and under
    vmap/shard_map in the multi-device path (pyrhe_tpu.parallel)."""
    if packed:
        g, miss = decode_packed_jnp(geno, n_indiv, dtype)
    else:
        g, miss = dosage_from_u8(geno, dtype)
    g = impute(g, miss, fill)
    S_t, mean = standardize_additive(g)

    S_dom = None
    if any(kind == "dom" for kind, _ in components):
        S_dom = encode_dominance(g, mean)

    XXPs, ys = [], []
    for kind, eidx in components:
        S_c = S_t if kind == "add" else S_dom
        env_col = env[:, eidx] if eidx is not None else None
        XXP, yXXy = _component_stats(S_c, P, annot_f, env_col, b2,
                                     matmul_dtype, dtype)
        XXPs.append(XXP)
        ys.append(yXXy)

    M_blk = jnp.sum(annot_f, axis=0).astype(jnp.int32)
    M_all = jnp.concatenate([M_blk] * len(components))
    return jnp.concatenate(XXPs, axis=0), jnp.concatenate(ys, axis=0), M_all


block_stats = partial(
    jax.jit,
    static_argnames=("n_indiv", "components", "b2", "packed", "dtype",
                     "matmul_dtype"),
)(block_stats_core)


def nxe_stats(env, Z, Uzb, Y, b2, B, dtype=jnp.float32):
    """Analytic hetero-noise (NxE) component statistics.

    The NxE pseudo-genotype is diag(env_e), so XXz = env_e^2 ⊙ z and
    yXXy = ||env_e ⊙ y~||^2 — computed in O(N) instead of materializing the
    N x N diagonal matrix like the reference (base.py:472-481,
    base_streaming.py:44-58).

    Returns (XXP (num_env, N, b2), yXXy (num_env, T)).
    """
    e2 = (env * env).T[:, :, None].astype(dtype)          # (num_env, N, 1)
    cols = [e2 * Z[None, :, :]]
    if b2 > B:
        cols.append(e2 * Uzb[None, :, :])
    XXP = jnp.concatenate(cols, axis=2)                   # (num_env, N, b2)
    ey = env.T[:, :, None] * Y[None, :, :]                # (num_env, N, T)
    yXXy = jnp.sum(ey * ey, axis=1).astype(dtype)         # (num_env, T)
    return XXP, yXXy
