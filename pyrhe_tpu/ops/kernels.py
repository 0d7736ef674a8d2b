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


def plane_permutation(n_pad: int, tn: int = 512,
                      planes: int = 4) -> np.ndarray:
    """pi such that natural-index array[pi] matches the kernels' decoded
    order: within each tile of tn individuals, the bit planes are laid out
    contiguously. n_pad must be a multiple of tn.

    planes=4: byte-lane decode — plane p holds code p of each byte.
    planes=16: int32-word decode (4 packed bytes per lane) — plane
    p = 4*byte_in_word + code_in_byte, each plane tn/16 long."""
    assert n_pad % tn == 0 and planes in (4, 16)
    out = []
    for t0 in range(0, n_pad, tn):
        idx = np.arange(t0, t0 + tn).reshape(tn // planes, planes)
        out.extend(idx[:, p] for p in range(planes))
    return np.concatenate(out)


def pad_to(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _decode_plane(packed32, p, fill, dtype, square=False):
    """One bit-plane of (TM, TNb) int32-widened packed bytes -> (TM, TNb)
    dosage (or its elementwise square). relu(code-1) and the missing
    branch are disjoint, so the square is relu^2 + (code==1)*fill^2.

    Branch-free decode: hi=(c>>1)&1, lo=c&1, t=hi*lo gives
    dose = hi + t  (0,2,3 -> 0,1,2)  and  miss = lo - t  (1 -> 1)."""
    hi = (packed32 >> (2 * p + 1)) & 1
    lo = (packed32 >> (2 * p)) & 1
    t = hi & lo
    base = hi + t
    if square:
        base = base + (t << 1)       # (hi+t)^2 = hi + 3t = base + 2t
    miss = lo - t
    return base.astype(dtype) + miss.astype(dtype) * fill


def _decode_tile(packed, fill_col, dtype, square=False):
    """(TM, TNb) packed u8 + (TM, 1) fill -> (TM, 4*TNb) dosage (or its
    elementwise square) in plane order."""
    fill = fill_col.astype(dtype)
    if square:
        fill = fill * fill
    packed32 = packed.astype(jnp.int32)  # Mosaic can't shift sub-32-bit ints
    return jnp.concatenate(
        [_decode_plane(packed32, p, fill, dtype, square) for p in range(4)],
        axis=1)


def _swar_doses(packed32):
    """SWAR decode of CLEANED codes (no 0b01 missing codes, io/bed.py's
    clean_packed): every 2-bit code in the 32-bit value maps to its dosage
    simultaneously —

        d = ((b>>1) & 0x55...) + (((b>>1) & 0x55...) & b)

    hi bits land at even positions, and hi&lo adds 1 exactly for code 0b11;
    each 2-bit field holds dosage {0,1,2} with no carry into the next field.
    Works identically on byte-widened int32 lanes (4 codes live) and on
    full int32 words (16 codes live — 4x fewer vector ops, the `word`
    decode mode). The VPU decode, not the MXU, bounds these kernels."""
    h = (packed32 >> 1) & 0x55555555
    return h + (h & packed32)


def _swar_plane(d, p, dtype, square=False, nplanes=4):
    """Extract plane p's dosage (or its square) from SWAR-packed fields.
    Plane 0 needs no shift; a byte-mode TOP plane needs no mask (higher
    bits are zero). Word mode (nplanes=16) always masks: dosage 2 in the
    top field sets bit 31, so arithmetic shifts drag sign bits down."""
    dp = d if p == 0 else d >> (2 * p)
    if nplanes == 16 or p != nplanes - 1:
        dp = dp & 3
    if square:
        dp = dp + (dp & 2)          # 0,1,2 -> 0,1,4
    return dp.astype(dtype)


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


def _plane_iter(packed_ref, fill_ref, dtype, square, clean, word=False):
    """Yield the decoded plane tiles.

    word=True: packed_ref holds int32 WORDS (16 codes per lane, staged by
    viewing the cleaned packed bytes as little-endian int32) — one SWAR
    pass decodes 16 codes/lane and 16 (TM, TN/16) planes are extracted.
    4x fewer vector ops per code than byte mode for the SWAR itself and
    no u8->int32 widening. Requires clean bytes.

    word=False: packed_ref holds bytes; 4 planes via SWAR when clean, or
    the branch-free missing-fill decode otherwise."""
    if word:
        d = _swar_doses(packed_ref[:])
        for p in range(16):
            yield _swar_plane(d, p, dtype, square, nplanes=16)
        return
    packed32 = packed_ref[:].astype(jnp.int32)
    if clean:
        d = _swar_doses(packed32)
        for p in range(4):
            yield _swar_plane(d, p, dtype, square)
    else:
        fill = fill_ref[:].astype(dtype)
        if square:
            fill = fill * fill
        for p in range(4):
            yield _decode_plane(packed32, p, fill, dtype, square)


def _gp_kernel(packed_ref, fill_ref, c_ref, out_ref, *, dtype, square,
               split, planewise, clean, word):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tnb = packed_ref.shape[1]
    if planewise:
        # One dot per bit-plane: plane p+1's VPU decode overlaps plane p's
        # MXU pass (the planes are independent until the accumulate).
        acc = None
        for p, g in enumerate(_plane_iter(packed_ref, fill_ref, dtype,
                                          square, clean, word)):
            d = _dots(g, c_ref[p * tnb:(p + 1) * tnb, :], ((1,), (0,)),
                      split, dtype)
            acc = d if acc is None else acc + d
        out_ref[:] += acc
    else:
        g = jnp.concatenate(list(_plane_iter(packed_ref, fill_ref, dtype,
                                             square, clean, word)), axis=1)
        out_ref[:] += _dots(g, c_ref[:], ((1,), (0,)), split, dtype)


def _ytg_kernel(packed_ref, fill_ref, yt_ref, out_ref, *, dtype, square,
                split, clean, word, planewise=True):
    """Transposed stage 2: out (Q, tn) += y^T g. Feeding the SMALL operand
    pre-transposed keeps every MXU pass in native (M,K)@(K,N) form — no
    relayout of the big decoded tile (a g^T@Y formulation would pay a
    ((0,),(0,)) contraction, i.e. a transpose of g, per tile).

    planewise=True: one (Q, tm)@(tm, tnb) dot per bit-plane, decode
    overlapping the previous plane's MXU pass. planewise=False:
    concatenate the decoded planes into the full (tm, tn) tile and issue
    ONE wide dot — the plane order of the lanes IS the output layout, so
    the concat needs no relayout, and the MXU streams a tn-wide rhs
    instead of 16 tnb-wide passes (measured faster on the wide
    production shapes; see scripts/bench_kernels.py BK_PLANEWISE)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tnb = packed_ref.shape[1]
    yt = yt_ref[:]
    planes = _plane_iter(packed_ref, fill_ref, dtype, square, clean, word)
    if planewise:
        for p, g in enumerate(planes):
            out_ref[:, p * tnb:(p + 1) * tnb] += _dots(
                yt, g, ((1,), (0,)), split, dtype)
    else:
        g = jnp.concatenate(list(planes), axis=1)        # (tm, tn)
        out_ref[:] += _dots(yt, g, ((1,), (0,)), split, dtype)


def _ytg_acc_kernel(packed_ref, fill_ref, yt_ref, rank1_ref, scale_ref,
                    mask_ref, tot_ref, out_ref, acc_ref, *, dtype, split,
                    clean, word, planewise):
    """Stage 2 with the running TOTALS aliased into the kernel: per SNP
    row-tile i the raw y^T g contribution accumulates into a VMEM scratch,
    and at the LAST i the standardization rank-1 correction + the
    per-individual scale (GxE env column; ones for plain additive —
    multiplying by exact 1.0 is an IEEE identity, so the additive path
    stays bitwise equal to a scale-free epilogue) + validity mask are
    applied and the result is added onto the aliased totals tile — so the
    per-block (Q, N) stats tensor is never materialized in HBM and the
    out-of-kernel transform-read + accumulate-read/write (~3 x 84 MB per
    flagship block, docs/design/perf.md 'Remaining gap') disappears.
    Only valid when nothing downstream needs the per-block stats (the
    keep=False scan bodies: streaming pass 1 / hybrid tail)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # same planewise-vs-concat split as _ytg_kernel so the accumulated
    # dots are BITWISE identical to the standard path's at every shape
    # (mode-equivalence tests assert exact equality across cache modes)
    tnb = packed_ref.shape[1]
    planes = _plane_iter(packed_ref, fill_ref, dtype, False, clean, word)
    yt = yt_ref[:]
    if planewise:
        for p, g in enumerate(planes):
            acc_ref[:, p * tnb:(p + 1) * tnb] += _dots(
                yt, g, ((1,), (0,)), False, dtype)
    else:
        g = jnp.concatenate(list(planes), axis=1)
        acc_ref[:] += _dots(yt, g, ((1,), (0,)), False, dtype)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        a = acc_ref[:]
        if split:                       # hi/lo halves stacked on rows
            Q = a.shape[0] // 2
            a = a[:Q] + a[Q:]
        # multiply ORDER matches _moment_algebra's mm2_t branch exactly
        # (subtract rank1, then scale, then mask) — bit-identity contract
        out_ref[:] = tot_ref[:] + (((a - rank1_ref[:]) * scale_ref[:])
                                   * mask_ref[:])


def _ytg_acc2_kernel(packed_ref, fill_ref, yt1_ref, yt2_ref, rank1_ref,
                     mask_ref, tot_ref, out_ref, acc1_ref, acc2_ref, *,
                     dtype, split, clean, word, planewise, planewise2):
    """Dominance variant of _ytg_acc_kernel: a dominance component's stats
    are y1^T g + y2^T g^2 (the encoding is affine in (g, g^2) —
    ops/moments.py module docstring), so TWO contractions accumulate into
    separate VMEM scratches — separate so each matches the standard
    path's per-call accumulation order bitwise — over the SAME packed
    tile: the standard path's two ytg_matmul calls each re-read the
    packed bytes from HBM, here the block spec brings them to VMEM once
    per grid cell for both dots. In planewise mode the VPU decode is
    also shared (each plane streams through both dots, square = one
    exact multiply); concat mode re-decodes per contraction — see the
    in-body VMEM note. Epilogue applies the rank-1 correction + validity mask
    in the standard path's exact order ((A + B) - rank1, then mask; the
    reference dominance path has no env scaling) and adds onto the
    aliased totals. Each contraction keeps its own planewise flag so it
    reproduces the standard path's per-call blocking decision (the g dot
    rides the all-components stacked operand, the g^2 dot only the
    dominance columns)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    tnb = packed_ref.shape[1]
    yt1, yt2 = yt1_ref[:], yt2_ref[:]
    if (clean or word) and planewise and planewise2:
        # Both contractions planewise on clean bytes: decode each plane
        # ONCE (structurally — not compiler-CSE-dependent) and stream it
        # through both dots; the square is one exact VPU multiply
        # ({0,1,2} -> {0,1,4}, bit-identical values to the square-decode
        # extraction, hence bitwise-equal dots). Only one plane tile is
        # live at a time.
        d = _swar_doses(packed_ref[:] if word
                        else packed_ref[:].astype(jnp.int32))
        n_pl = 16 if word else 4
        for p in range(n_pl):
            g = _swar_plane(d, p, dtype, False, nplanes=n_pl)
            sl = slice(p * tnb, (p + 1) * tnb)
            acc1_ref[:, sl] += _dots(yt1, g, ((1,), (0,)), False, dtype)
            acc2_ref[:, sl] += _dots(yt2, g * g, ((1,), (0,)), False,
                                     dtype)
    else:
        # Concat (wide) mode decodes per contraction ON PURPOSE: holding
        # both (tm, tn) plane tiles (g and g²) to share the decode blows
        # the 16 MB scoped-VMEM limit at the production tile shape
        # (measured 18.4 MB, this round) — the second SWAR pass is the
        # cheaper trade. The non-clean byte path also has no shareable
        # intermediate (fill vs fill² decodes differ throughout); the
        # engine's acc fast path always stages clean bytes.
        def contract(acc_ref, yt, square, pw):
            planes = _plane_iter(packed_ref, fill_ref, dtype, square,
                                 clean, word)
            if pw:
                for p, g in enumerate(planes):
                    acc_ref[:, p * tnb:(p + 1) * tnb] += _dots(
                        yt, g, ((1,), (0,)), False, dtype)
            else:
                g = jnp.concatenate(list(planes), axis=1)
                acc_ref[:] += _dots(yt, g, ((1,), (0,)), False, dtype)

        contract(acc1_ref, yt1, False, planewise)
        contract(acc2_ref, yt2, True, planewise2)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        a1, a2 = acc1_ref[:], acc2_ref[:]
        if split:
            Q = a1.shape[0] // 2
            a1 = a1[:Q] + a1[Q:]
            a2 = a2[:Q] + a2[Q:]
        # order matches _moment_algebra's mm2_t dominance branch exactly:
        # part = XXG + XXG2, minus rank1, times mask (no scale)
        out_ref[:] = tot_ref[:] + (((a1 + a2) - rank1_ref[:])
                                   * mask_ref[:])


@functools.partial(jax.jit, static_argnames=("tm", "tn", "dtype",
                                             "interpret", "clean", "word",
                                             "split", "planewise",
                                             "planewise2"))
def ytg_acc2_matmul(packed, fill, Yt1, Yt2, rank1, mask, tot, *, tm=256,
                    tn=512, dtype=jnp.bfloat16, interpret=False,
                    clean=False, word=False, split=False, planewise=True,
                    planewise2=True):
    """new_tot = tot + mask ⊙ (Y1^T g + Y2^T g² − rank1), fused + aliased —
    the dominance-component counterpart of ytg_acc_matmul. `tot`
    ((Q, n_pad) f32) is donated and updated in place. Yt1/Yt2:
    (2Q, m_pad) hi/lo-stacked when split else (Q, m_pad); rank1: (Q, 1)
    f32; mask: (1, n_pad) f32 plane-permuted validity."""
    per_lane = 16 if word else 4
    m_pad, nb_pad = packed.shape
    n_pad = per_lane * nb_pad
    Qr = Yt1.shape[0]
    Q = Qr // 2 if split else Qr
    assert m_pad % tm == 0 and n_pad % tn == 0
    assert Yt2.shape == Yt1.shape
    assert rank1.shape == (Q, 1) and mask.shape == (1, n_pad)
    assert tot.shape == (Q, n_pad)
    tnb = tn // per_lane
    grid = (n_pad // tn, m_pad // tm)
    return pl.pallas_call(
        functools.partial(_ytg_acc2_kernel, dtype=dtype, split=split,
                          clean=clean, word=word, planewise=planewise,
                          planewise2=planewise2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tnb), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Qr, tm), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Qr, tm), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, tn), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Qr, tn), jnp.float32),
                        pltpu.VMEM((Qr, tn), jnp.float32)],
        input_output_aliases={6: 0},
        compiler_params=_compiler_params(interpret,
                                         ("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * n_pad * Qr,
            bytes_accessed=m_pad * n_pad // 4 + 2 * m_pad * Qr * 4
            + 2 * n_pad * Q * 4,
            transcendentals=0),
        interpret=interpret,
    )(packed, fill, Yt1, Yt2, rank1, mask, tot)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "dtype",
                                             "interpret", "clean", "word",
                                             "split", "planewise"))
def ytg_acc_matmul(packed, fill, Yt, rank1, scale, mask, tot, *, tm=256,
                   tn=512, dtype=jnp.bfloat16, interpret=False,
                   clean=False, word=False, split=False, planewise=True):
    """new_tot = tot + mask ⊙ (scale ⊙ (Y^T g − rank1)), fused + aliased:
    `tot` ((Q, n_pad) f32, kernel-native stats layout) is donated and
    updated in place. Yt: (2Q, m_pad) hi/lo-stacked when split else
    (Q, m_pad); rank1: (Q, 1) f32; scale: (1, n_pad) f32 per-individual
    scaling (GxE env column, or ones); mask: (1, n_pad) f32
    plane-permuted validity."""
    per_lane = 16 if word else 4
    m_pad, nb_pad = packed.shape
    n_pad = per_lane * nb_pad
    Qr = Yt.shape[0]
    Q = Qr // 2 if split else Qr
    assert m_pad % tm == 0 and n_pad % tn == 0
    assert rank1.shape == (Q, 1)
    assert scale.shape == (1, n_pad) and mask.shape == (1, n_pad)
    assert tot.shape == (Q, n_pad)
    tnb = tn // per_lane
    grid = (n_pad // tn, m_pad // tm)
    return pl.pallas_call(
        functools.partial(_ytg_acc_kernel, dtype=dtype, split=split,
                          clean=clean, word=word, planewise=planewise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tnb), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Qr, tm), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, tn), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Qr, tn), jnp.float32)],
        input_output_aliases={6: 0},
        compiler_params=_compiler_params(interpret,
                                         ("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * Qr,
            bytes_accessed=m_pad * n_pad // 4 + m_pad * Qr * 4
            + 2 * n_pad * Q * 4,
            transcendentals=0),
        interpret=interpret,
    )(packed, fill, Yt, rank1, scale, mask, tot)


def _compiler_params(interpret, semantics):
    if interpret:
        return None
    try:
        return pltpu.CompilerParams(dimension_semantics=semantics)
    except TypeError:                            # older pltpu API name
        return pltpu.TPUCompilerParams(dimension_semantics=semantics)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "dtype",
                                             "interpret", "square",
                                             "split", "planewise", "clean",
                                             "word"))
def gp_matmul(packed, fill, C_perm, *, tm=256, tn=512, dtype=jnp.bfloat16,
              interpret=False, square=False, split=False, planewise=True,
              clean=False, word=False):
    """GP = g @ C with in-kernel decode.

    packed: (m_pad, nb_pad) u8 — or (m_pad, nw_pad) int32 WORDS when
    word=True (cleaned packed bytes viewed little-endian; 16 codes/lane) —
    rows zero-padded; fill: (m_pad, 1) f32; C_perm: (n_pad, W) f32 (or
    bf16) in the matching plane order (plane_permutation(..., planes)),
    zero rows for padding. Returns (m_pad, W) f32.
    """
    per_lane = 16 if word else 4
    m_pad, nb_pad = packed.shape
    n_pad, W = C_perm.shape
    assert n_pad == per_lane * nb_pad and m_pad % tm == 0
    assert (per_lane * nb_pad) % tn == 0
    tnb = tn // per_lane
    grid = (m_pad // tm, n_pad // tn)
    return pl.pallas_call(
        functools.partial(_gp_kernel, dtype=dtype, square=square,
                          split=split, planewise=planewise, clean=clean,
                          word=word),
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
        compiler_params=_compiler_params(interpret,
                                         ("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * W * (2 if split else 1),
            bytes_accessed=m_pad * n_pad // 4 + n_pad * W * 4
            + m_pad * W * 4,
            transcendentals=0),
        interpret=interpret,
    )(packed, fill, C_perm)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "dtype",
                                             "interpret", "square",
                                             "clean", "word", "planewise"))
def ytg_matmul(packed, fill, Yt, *, tm=256, tn=512, dtype=jnp.bfloat16,
               interpret=False, square=False, clean=False, word=False,
               planewise=True):
    """XXG^T = Y^T @ g with in-kernel decode (transposed stage 2).
    Pre-transposing the SMALL (m, Q) operand to (Q, m) keeps the MXU pass
    in native (M,K)@(K,N) form so the big decoded tile is never
    relayouted. Returns (Q, n_pad) f32 in plane order.

    packed: (m_pad, nb_pad) u8 — or (m_pad, nw_pad) int32 words when
    word=True; fill: (m_pad, 1); Yt: (Q, m_pad) f32/bf16 (zero cols for
    padded SNPs).
    """
    per_lane = 16 if word else 4
    m_pad, nb_pad = packed.shape
    n_pad = per_lane * nb_pad
    Q, _ = Yt.shape
    assert m_pad % tm == 0 and n_pad % tn == 0
    tnb = tn // per_lane
    grid = (n_pad // tn, m_pad // tm)
    return pl.pallas_call(
        functools.partial(_ytg_kernel, dtype=dtype, square=square,
                          split=False, clean=clean, word=word,
                          planewise=planewise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tnb), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, tm), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, tn), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, n_pad), jnp.float32),
        compiler_params=_compiler_params(interpret,
                                         ("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * Q,
            bytes_accessed=m_pad * n_pad // 4 + m_pad * Q * 4
            + n_pad * Q * 4,
            transcendentals=0),
        interpret=interpret,
    )(packed, fill, Yt)
