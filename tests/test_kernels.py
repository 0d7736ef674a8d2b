"""Pallas fused decode+matmul kernel correctness (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pyrhe_tpu.io.bed import encode_dosage
from pyrhe_tpu.ops.decode import decode_packed_jnp, impute
from pyrhe_tpu.ops.kernels import pad_to, plane_permutation
from pyrhe_tpu.ops.moments import (block_stats, block_stats_pallas)

TM, TN = 256, 512


def make_inputs(m=300, n=700, seed=0, missing=True):
    rng = np.random.default_rng(seed)
    dos = rng.integers(0, 3, size=(m, n)).astype(np.uint8)
    if missing:
        dos[rng.random((m, n)) < 0.05] = 255
    packed = encode_dosage(dos)
    fill = rng.integers(0, 3, size=m).astype(np.float64)
    m_pad, n_pad = pad_to(m, TM), pad_to(n, TN)
    packed_pad = np.zeros((m_pad, n_pad // 4), np.uint8)
    packed_pad[:m, :packed.shape[1]] = packed
    fill_pad = np.zeros(m_pad)
    fill_pad[:m] = fill
    perm = plane_permutation(n_pad, TN)
    # natural-order imputed dosage for the reference computation
    g = dos.astype(np.float64)
    g[dos == 255] = np.repeat(fill[:, None], n, 1)[dos == 255]
    return packed_pad, fill_pad, g, perm, m, n, m_pad, n_pad


@pytest.mark.parametrize("square", [False, True])
def test_gp_ytg_kernels(square):
    from pyrhe_tpu.ops.kernels import gp_matmul, ytg_matmul

    packed_pad, fill_pad, g, perm, m, n, m_pad, n_pad = make_inputs()
    rng = np.random.default_rng(1)
    W = 8
    C = rng.normal(size=(n_pad, W))
    C[n:] = 0.0
    C_perm = C[perm]
    gg = g ** 2 if square else g

    gp = np.asarray(gp_matmul(
        jnp.asarray(packed_pad), jnp.asarray(fill_pad[:, None], jnp.float32),
        jnp.asarray(C_perm, jnp.float32), tm=TM, tn=TN, dtype=jnp.float32,
        interpret=True, square=square))
    np.testing.assert_allclose(gp[:m], gg @ C[:n], rtol=2e-5, atol=1e-3)
    assert np.all(gp[m:] == 0)

    Yt = rng.normal(size=(W, m_pad))
    Yt[:, m:] = 0.0
    ytg = np.asarray(ytg_matmul(
        jnp.asarray(packed_pad), jnp.asarray(fill_pad[:, None], jnp.float32),
        jnp.asarray(Yt, jnp.float32), tm=TM, tn=TN, dtype=jnp.float32,
        interpret=True, square=square))
    expect = Yt[:, :m] @ gg                    # (W, n) natural order
    expect_pad = np.zeros((W, n_pad))
    expect_pad[:, :n] = expect
    np.testing.assert_allclose(ytg, expect_pad[:, perm], rtol=2e-5,
                               atol=1e-3)


@pytest.mark.parametrize("square", [False, True])
def test_word_swar_kernels(square):
    """word=True: int32-word SWAR decode (16 codes/lane, 16-plane
    permutation) equals the dense reference on pre-cleaned bytes."""
    from pyrhe_tpu.io.bed import clean_packed
    from pyrhe_tpu.ops.kernels import gp_matmul, ytg_matmul

    packed_pad, fill_pad, g, perm4, m, n, m_pad, n_pad = make_inputs(seed=8)
    clean_pad = np.zeros_like(packed_pad)
    clean_packed(packed_pad[:m], fill_pad[:m], out=clean_pad[:m])
    words = clean_pad.view(np.int32)           # (m_pad, n_pad // 16)
    perm = plane_permutation(n_pad, TN, planes=16)
    gg = g ** 2 if square else g
    zf = jnp.zeros((m_pad, 1), jnp.float32)

    rng = np.random.default_rng(9)
    W = 8
    C = rng.normal(size=(n_pad, W))
    C[n:] = 0.0
    gp = np.asarray(gp_matmul(
        jnp.asarray(words), zf, jnp.asarray(C[perm], jnp.float32),
        tm=TM, tn=TN, dtype=jnp.float32, interpret=True, square=square,
        clean=True, word=True))
    np.testing.assert_allclose(gp[:m], gg @ C[:n], rtol=2e-5, atol=1e-3)

    Yt = rng.normal(size=(W, m_pad))
    Yt[:, m:] = 0.0
    ytg = np.asarray(ytg_matmul(
        jnp.asarray(words), zf, jnp.asarray(Yt, jnp.float32),
        tm=TM, tn=TN, dtype=jnp.float32, interpret=True, square=square,
        clean=True, word=True))
    expect_pad = np.zeros((W, n_pad))
    expect_pad[:, :n] = Yt[:, :m] @ gg
    np.testing.assert_allclose(ytg, expect_pad[:, perm], rtol=2e-5,
                               atol=1e-3)


@pytest.mark.parametrize("components", [
    (("add", None),),
    (("add", None), ("dom", None)),
    (("add", None), ("add", 0)),
])
def test_block_stats_pallas_matches_jnp(components):
    packed_pad, fill_pad, g, perm, m, n, m_pad, n_pad = make_inputs(seed=2)
    rng = np.random.default_rng(3)
    K, B, T = 2, 4, 1
    b2 = B
    annot = np.zeros((m_pad, K), np.float32)
    annot[np.arange(m), rng.integers(0, K, m)] = 1.0
    P = rng.normal(size=(n, b2 + T)).astype(np.float32)
    env = (rng.random((n, 1)) < 0.5).astype(np.float32)

    # jnp reference path on unpadded data
    dos = np.where(np.isnan(g), 255, g).astype(np.uint8)  # g has no nan now
    XXP0, y0, M0 = block_stats(
        jnp.asarray(encode_dosage(dos)), jnp.asarray(fill_pad[:m],
                                                     jnp.float32),
        jnp.asarray(annot[:m]), jnp.asarray(P), jnp.asarray(env),
        n_indiv=n, components=components, b2=b2, packed=True,
        dtype=jnp.float32, mm_mode="exact")

    P_pad = np.zeros((n_pad, b2 + T), np.float32)
    P_pad[:n] = P
    env_pad = np.zeros((n_pad, 1), np.float32)
    env_pad[:n] = env
    mask = np.zeros(n_pad, np.float32)
    mask[:n] = 1.0
    XXP1, y1, M1 = block_stats_pallas(
        jnp.asarray(packed_pad), jnp.asarray(fill_pad, jnp.float32),
        jnp.asarray(annot), jnp.asarray(P_pad[perm]),
        jnp.asarray(env_pad[perm]), jnp.asarray(mask[perm]),
        n_indiv=n, components=components, b2=b2, dtype=jnp.float32,
        kernel_dtype=jnp.float32, interpret=True, tm=TM, tn=TN)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-4,
                               atol=1e-3)
    # XXP rows come back permuted; compare via inverse permutation
    inv = np.argsort(perm)
    XXP1n = np.asarray(XXP1)[:, inv, :][:, :n, :]
    np.testing.assert_allclose(XXP1n, np.asarray(XXP0), rtol=1e-4,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(M1), np.asarray(M0))


def test_clean_packed_removes_missing():
    from pyrhe_tpu.io.bed import clean_packed, decode_packed

    rng = np.random.default_rng(7)
    dos = rng.integers(0, 3, size=(64, 213)).astype(np.uint8)
    dos[rng.random(dos.shape) < 0.2] = 255
    packed = encode_dosage(dos)
    fill = rng.integers(0, 3, size=64)
    cleaned = clean_packed(packed, fill.astype(np.float64))
    out = decode_packed(cleaned, 213)
    expect = np.where(dos == 255, fill[:, None], dos)
    np.testing.assert_array_equal(out, expect)
    # padded wide output: trailing bytes zeroed
    wide = np.full((64, packed.shape[1] + 5), 9, np.uint8)
    clean_packed(packed, fill.astype(np.float64), out=wide)
    assert np.all(wide[:, packed.shape[1]:] == 0)
    np.testing.assert_array_equal(decode_packed(
        wide[:, :packed.shape[1]], 213), expect)


@pytest.mark.parametrize("square", [False, True])
def test_clean_swar_kernels(square):
    """Clean path: SWAR decode (gp) and transposed stage-2 (ytg) equal the
    dense reference on pre-cleaned bytes."""
    from pyrhe_tpu.io.bed import clean_packed
    from pyrhe_tpu.ops.kernels import gp_matmul, ytg_matmul

    packed_pad, fill_pad, g, perm, m, n, m_pad, n_pad = make_inputs(seed=5)
    clean_pad = np.zeros_like(packed_pad)
    clean_packed(packed_pad[:m], fill_pad[:m], out=clean_pad[:m])
    gg = g ** 2 if square else g

    rng = np.random.default_rng(6)
    W = 8
    C = rng.normal(size=(n_pad, W))
    C[n:] = 0.0
    gp = np.asarray(gp_matmul(
        jnp.asarray(clean_pad), jnp.asarray(fill_pad[:, None] * 0,
                                            jnp.float32),
        jnp.asarray(C[perm], jnp.float32), tm=TM, tn=TN, dtype=jnp.float32,
        interpret=True, square=square, clean=True))
    np.testing.assert_allclose(gp[:m], gg @ C[:n], rtol=2e-5, atol=1e-3)

    Yt = rng.normal(size=(W, m_pad))
    Yt[:, m:] = 0.0
    ytg = np.asarray(ytg_matmul(
        jnp.asarray(clean_pad), jnp.asarray(fill_pad[:, None] * 0,
                                            jnp.float32),
        jnp.asarray(Yt, jnp.float32), tm=TM, tn=TN, dtype=jnp.float32,
        interpret=True, square=square, clean=True))
    expect = Yt[:, :m] @ gg                    # (W, n) natural order
    expect_pad = np.zeros((W, n_pad))
    expect_pad[:, :n] = expect
    np.testing.assert_allclose(ytg, expect_pad[:, perm], rtol=2e-5,
                               atol=1e-3)


@pytest.mark.parametrize("word", [False, True])
def test_ytg_wide_variant_matches_planewise(word):
    """planewise=False (planes concatenated, one MXU pass per grid cell)
    matches the per-plane accumulate — the lane plane order IS the
    output layout, so no relayout is involved; only the reduction order
    differs (one wide dot vs 4/16 partial accumulates), hence allclose
    rather than exact."""
    from pyrhe_tpu.io.bed import clean_packed
    from pyrhe_tpu.ops.kernels import ytg_matmul

    packed_pad, fill_pad, g, _, m, n, m_pad, n_pad = make_inputs(seed=12)
    clean_pad = np.zeros_like(packed_pad)
    clean_packed(packed_pad[:m], fill_pad[:m], out=clean_pad[:m])
    blk = (jnp.asarray(clean_pad.view(np.int32)) if word
           else jnp.asarray(clean_pad))
    zf = jnp.zeros((m_pad, 1), jnp.float32)
    rng = np.random.default_rng(13)
    Yt = rng.normal(size=(6, m_pad))
    Yt[:, m:] = 0.0
    kw = dict(tm=TM, tn=TN, dtype=jnp.float32, interpret=True, clean=True,
              word=word)
    a = np.asarray(ytg_matmul(blk, zf, jnp.asarray(Yt, jnp.float32),
                              planewise=True, **kw))
    b = np.asarray(ytg_matmul(blk, zf, jnp.asarray(Yt, jnp.float32),
                              planewise=False, **kw))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("word", [False, True])
def test_ytg_acc_matmul(word):
    """Aliased-totals stage 2: new_tot = tot + mask * (Yt @ g - rank1),
    exactly equal to composing the standard ytg_matmul with the
    out-of-kernel transform (same dot blocking via planewise)."""
    from pyrhe_tpu.io.bed import clean_packed
    from pyrhe_tpu.ops.kernels import ytg_acc_matmul, ytg_matmul

    packed_pad, fill_pad, g, perm, m, n, m_pad, n_pad = make_inputs(seed=20)
    clean_pad = np.zeros_like(packed_pad)
    clean_packed(packed_pad[:m], fill_pad[:m], out=clean_pad[:m])
    blk = (jnp.asarray(clean_pad.view(np.int32)) if word
           else jnp.asarray(clean_pad))
    zf = jnp.zeros((m_pad, 1), jnp.float32)
    rng = np.random.default_rng(21)
    Q = 6
    Yt = rng.normal(size=(Q, m_pad)).astype(np.float32)
    Yt[:, m:] = 0.0
    rank1 = rng.normal(size=(Q, 1)).astype(np.float32)
    mask = (perm < n).astype(np.float32)[None, :]
    tot = rng.normal(size=(Q, n_pad)).astype(np.float32)
    ones = np.ones((1, n_pad), np.float32)
    env_scale = rng.normal(size=(1, n_pad)).astype(np.float32)
    kw = dict(tm=TM, tn=TN, dtype=jnp.float32, interpret=True, clean=True,
              word=word)
    for pw in (True, False):
        for scale in (ones, env_scale):      # additive and GxE epilogues
            got = np.asarray(ytg_acc_matmul(
                blk, zf, jnp.asarray(Yt), jnp.asarray(rank1),
                jnp.asarray(scale), jnp.asarray(mask), jnp.asarray(tot),
                planewise=pw, **kw))
            std = np.asarray(ytg_matmul(blk, zf, jnp.asarray(Yt),
                                        planewise=pw, **kw))
            expect = tot + ((std - rank1) * scale) * mask
            np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("word", [False, True])
def test_ytg_acc2_matmul(word):
    """Dominance aliased stage 2: new_tot = tot + mask * (Yt1 @ g +
    Yt2 @ g² - rank1), exactly equal to composing the standard g and g²
    ytg_matmul calls with the out-of-kernel dominance transform
    (_moment_algebra's mm2_t dom branch: XXG + XXG2, - rank1, * mask) —
    including independent planewise decisions for the two contractions."""
    from pyrhe_tpu.io.bed import clean_packed
    from pyrhe_tpu.ops.kernels import ytg_acc2_matmul, ytg_matmul

    packed_pad, fill_pad, g, perm, m, n, m_pad, n_pad = make_inputs(seed=30)
    clean_pad = np.zeros_like(packed_pad)
    clean_packed(packed_pad[:m], fill_pad[:m], out=clean_pad[:m])
    blk = (jnp.asarray(clean_pad.view(np.int32)) if word
           else jnp.asarray(clean_pad))
    zf = jnp.zeros((m_pad, 1), jnp.float32)
    rng = np.random.default_rng(31)
    Q = 6
    Yt1 = rng.normal(size=(Q, m_pad)).astype(np.float32)
    Yt2 = rng.normal(size=(Q, m_pad)).astype(np.float32)
    Yt1[:, m:] = 0.0
    Yt2[:, m:] = 0.0
    rank1 = rng.normal(size=(Q, 1)).astype(np.float32)
    mask = (perm < n).astype(np.float32)[None, :]
    tot = rng.normal(size=(Q, n_pad)).astype(np.float32)
    kw = dict(tm=TM, tn=TN, dtype=jnp.float32, interpret=True, clean=True,
              word=word)
    for pw in (True, False):
        for pw2 in (True, False):
            got = np.asarray(ytg_acc2_matmul(
                blk, zf, jnp.asarray(Yt1), jnp.asarray(Yt2),
                jnp.asarray(rank1), jnp.asarray(mask), jnp.asarray(tot),
                planewise=pw, planewise2=pw2, **kw))
            std1 = np.asarray(ytg_matmul(blk, zf, jnp.asarray(Yt1),
                                         planewise=pw, **kw))
            std2 = np.asarray(ytg_matmul(blk, zf, jnp.asarray(Yt2),
                                         planewise=pw2, square=True, **kw))
            expect = tot + ((std1 + std2) - rank1) * mask
            np.testing.assert_array_equal(got, expect)
