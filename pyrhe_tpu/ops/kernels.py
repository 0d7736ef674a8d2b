"""Pallas TPU kernels: fused 2-bit decode + moment matmuls.

The jnp path (ops/moments.py) must materialize the imputed dosage matrix
in HBM between decode and the two matmuls; these kernels decode PLINK
2-bit codes in VMEM on the fly, so per-block HBM traffic drops to the
packed bytes (m*N/4) per stage plus the small probe/output tiles.

Layout trick — the "plane permutation": PLINK packs individual i of a SNP
into byte i//4 at bit offset 2*(i%4). Decoding to natural order needs an
expensive 4-way lane interleave; instead we fix the individual order as

    pi = [0,4,8,... | 1,5,9,... | 2,6,10,... | 3,7,11,...]

so each bit-plane ((byte >> 2p) & 3) decodes to a CONTIGUOUS slab of
lanes. Every N-indexed array (probes, covariates, phenotypes, env) is
permuted by pi once at setup; all downstream quantities are reductions
over individuals, so nothing ever needs un-permuting (see
pyrhe_tpu.ops.moments.block_stats_core's caller contract).

Dosage decode is branch-free VPU math: code c in {0,1,2,3} with 1 =
missing maps to relu(c-1) + (c==1)*fill  (codes follow io/bed.py's
flipped convention).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def plane_permutation(n_pad: int, tn: int = 512) -> np.ndarray:
    """pi such that natural-index array[pi] matches the kernels' decoded
    order: within each tile of tn individuals (tn/4 bytes), the four bit
    planes are laid out contiguously. n_pad must be a multiple of tn."""
    assert n_pad % tn == 0
    out = []
    for t0 in range(0, n_pad, tn):
        idx = np.arange(t0, t0 + tn).reshape(tn // 4, 4)
        out.extend(idx[:, p] for p in range(4))
    return np.concatenate(out)


def pad_to(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _decode_tile(packed, fill_col, dtype, square=False):
    """(TM, TNb) packed u8 + (TM, 1) fill -> (TM, 4*TNb) dosage (or its
    elementwise square) in plane order. relu(code-1) and the missing
    branch are disjoint, so the square is relu^2 + (code==1)*fill^2."""
    fill = fill_col.astype(dtype)
    if square:
        fill = fill * fill
    planes = []
    packed32 = packed.astype(jnp.int32)  # Mosaic can't shift sub-32-bit ints
    for p in range(4):
        code = (packed32 >> (2 * p)) & 3
        base = jnp.maximum(code - 1, 0)
        if square:
            base = base * base
        # miss = [code == 1] as integer math (bool selects with broadcast
        # operands trip a Mosaic relayout bug)
        miss = (code & 1) * (1 - (code >> 1))
        dose = base.astype(dtype) + miss.astype(dtype) * fill
        planes.append(dose)
    return jnp.concatenate(planes, axis=1)


def _dots(g, r, dims, split, dtype):
    """One (split=False) or two (hi/lo split2) MXU passes; the dosage side
    is exact in bf16, so splitting only the probe side recovers ~f32."""
    dot = lambda b: jax.lax.dot_general(
        g, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32)
    if not split:
        return dot(r.astype(dtype))
    hi = r.astype(jnp.bfloat16)
    lo = (r - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(hi) + dot(lo)


def _gp_kernel(packed_ref, fill_ref, c_ref, out_ref, *, dtype, square,
               split):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g = _decode_tile(packed_ref[:], fill_ref[:], dtype, square)  # (TM, TN)
    out_ref[:] += _dots(g, c_ref[:], ((1,), (0,)), split, dtype)


def _xxg_kernel(packed_ref, fill_ref, y_ref, out_ref, *, dtype, square,
                split):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g = _decode_tile(packed_ref[:], fill_ref[:], dtype, square)  # (TM, TN)
    # g^T @ y : contract the SNP (sublane) dim of both — transpose fused
    out_ref[:] += _dots(g, y_ref[:], ((0,), (0,)), split, dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "dtype",
                                             "interpret", "square",
                                             "split"))
def gp_matmul(packed, fill, C_perm, *, tm=256, tn=512, dtype=jnp.bfloat16,
              interpret=False, square=False, split=False):
    """GP = g @ C with in-kernel decode.

    packed: (m_pad, nb_pad) u8, rows zero-padded; fill: (m_pad, 1) f32;
    C_perm: (n_pad, W) f32 in plane order, zero rows for padding.
    Returns (m_pad, W) f32.
    """
    m_pad, nb_pad = packed.shape
    n_pad, W = C_perm.shape
    assert n_pad == 4 * nb_pad and m_pad % tm == 0 and (4 * nb_pad) % tn == 0
    tnb = tn // 4
    grid = (m_pad // tm, (4 * nb_pad) // tn)
    return pl.pallas_call(
        functools.partial(_gp_kernel, dtype=dtype, square=square,
                          split=split),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tnb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, W), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, W), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, W), jnp.float32),
        interpret=interpret,
    )(packed, fill, C_perm)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "dtype",
                                             "interpret", "square",
                                             "split"))
def xxg_matmul(packed, fill, Y, *, tm=256, tn=512, dtype=jnp.bfloat16,
               interpret=False, square=False, split=False):
    """XXG = g^T @ Y with in-kernel decode.

    packed: (m_pad, nb_pad) u8; fill: (m_pad, 1); Y: (m_pad, Q) f32
    (zero rows for padded SNPs). Returns (4*nb_pad, Q) f32 in plane order.
    """
    m_pad, nb_pad = packed.shape
    _, Q = Y.shape
    assert m_pad % tm == 0 and (4 * nb_pad) % tn == 0
    tnb = tn // 4
    grid = ((4 * nb_pad) // tn, m_pad // tm)
    return pl.pallas_call(
        functools.partial(_xxg_kernel, dtype=dtype, square=square,
                          split=split),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tnb), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, Q), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, Q), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * nb_pad, Q), jnp.float32),
        interpret=interpret,
    )(packed, fill, Y)
