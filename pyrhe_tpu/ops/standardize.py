"""Column standardization and dominance encoding (device-side).

Behavioral spec:
  - additive: stds = 1/sqrt(mean*(1-0.5*mean)) i.e. 1/sqrt(2p(1-p)) with
    mean=2p, applied as (geno-mean)*stds (reference base.py:291-296).
  - dominance: maf = mean/2; het -> 2*maf, hom-alt -> 4*maf-2; standardized
    by column mean and 1/(2*maf*(1-maf)) (reference rhe_dom.py:15-41).
Degenerate (monomorphic) columns get weight 0 instead of inf — a strict
improvement over the reference, which would emit NaN.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def standardize_additive(g: jnp.ndarray):
    """g: imputed dosage (m, N). Returns (standardized X^T (m, N), col mean (m,))."""
    mean = jnp.mean(g, axis=1)
    var = mean * (1.0 - 0.5 * mean)
    inv = jnp.where(var > 0, jax.lax.rsqrt(jnp.maximum(var, 1e-30)), 0.0)
    return (g - mean[:, None]) * inv[:, None].astype(g.dtype), mean


def encode_dominance(g: jnp.ndarray, mean: jnp.ndarray):
    """Dominance-standardized X^T from imputed dosage and its column means."""
    maf = (mean / 2.0)[:, None]
    enc = jnp.where(g == 1, 2.0 * maf, 0.0) + jnp.where(g == 2, 4.0 * maf - 2.0, 0.0)
    enc = enc.astype(g.dtype)
    mean_enc = jnp.mean(enc, axis=1)
    denom = (2.0 * maf * (1.0 - maf))[:, 0]
    inv = jnp.where(denom > 0, 1.0 / jnp.maximum(denom, 1e-30), 0.0)
    return (enc - mean_enc[:, None]) * inv[:, None].astype(g.dtype)
