"""Real-accelerator Pallas kernel smoke test.

All other kernel tests run in interpret mode on the forced-CPU test
backend (tests/conftest.py); actual Mosaic compilation of the fused
decode+matmul kernels was previously exercised only by manual verify
runs. This test pins it in pytest: it spawns a subprocess on the
session's ORIGINAL JAX platform (conftest saves it before forcing cpu)
and compares gp_matmul / ytg_matmul — non-interpreted, word-SWAR
production configuration — against a float64 NumPy dense reference.

Skipped when the session has no accelerator platform.
"""
import os
import subprocess
import sys

import pytest

from conftest import ORIG_JAX_PLATFORMS

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r'''
import sys
import numpy as np
sys.path.insert(0, %(root)r)
import jax
import jax.numpy as jnp
if jax.devices()[0].platform == "cpu":
    print("NOTPU")
    sys.exit(0)
from pyrhe_tpu.io.bed import clean_packed, encode_dosage
from pyrhe_tpu.ops.kernels import gp_matmul, pad_to, plane_permutation, \
    ytg_matmul

TM, TN = 512, 2048        # the production tile (engine._pl_tm/_pl_tn);
                          # word mode needs tn to be a multiple of 2048
                          # so a word tile still spans >= 128 int32 lanes
m, n = 1024, 4096         # a 2x2-tile grid, already padded multiples
rng = np.random.default_rng(0)
dos = rng.integers(0, 3, size=(m, n)).astype(np.uint8)
packed = encode_dosage(dos)
clean = np.zeros_like(packed)
clean_packed(packed, np.zeros(m), out=clean)   # production staging path
words = jnp.asarray(clean.view(np.int32))
perm = plane_permutation(n, TN, planes=16)
g = dos.astype(np.float64)
W = 8
C = rng.normal(size=(n, W))
Yt = rng.normal(size=(W, m))
zf = jnp.zeros((m, 1), jnp.float32)

# bfloat16 is the production kernel dtype; the split (bf16 hi+lo) mode is
# how the engine reaches ~f32 accuracy on the MXU (mm_mode=split2) — a
# plain f32 dot lands on the MXU at bf16-ish precision, so only the
# split leg gets the tight tolerance.
for dt, split, rtol, atol in ((jnp.bfloat16, False, 2e-2, 0.5),
                              (jnp.float32, True, 2e-4, 2e-2)):
    gp = np.asarray(gp_matmul(
        words, zf, jnp.asarray(C[perm], jnp.float32), tm=TM, tn=TN,
        dtype=dt, interpret=False, clean=True, word=True, split=split))
    np.testing.assert_allclose(gp, g @ C, rtol=rtol, atol=atol)
    ytg = np.asarray(ytg_matmul(
        words, zf, jnp.asarray(Yt, jnp.float32), tm=TM, tn=TN, dtype=dt,
        interpret=False, clean=True, word=True))
    np.testing.assert_allclose(ytg, (Yt @ g)[:, perm], rtol=2e-2, atol=0.5)
print("KERNELS_OK")
'''


@pytest.mark.skipif(
    not ORIG_JAX_PLATFORMS or ORIG_JAX_PLATFORMS == "cpu",
    reason="session has no accelerator platform")
def test_pallas_kernels_on_tpu():
    env = dict(os.environ, JAX_PLATFORMS=ORIG_JAX_PLATFORMS)
    # generous timeout: a cold tunneled session pays minutes of backend
    # setup + two Mosaic compiles before the (fast) comparisons run
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"root": ROOT}],
        capture_output=True, text=True, env=env, timeout=1500)
    if "NOTPU" in res.stdout:
        pytest.skip("no accelerator device on the original platform")
    assert res.returncode == 0, res.stderr[-3000:]
    assert "KERNELS_OK" in res.stdout, res.stdout[-1000:]
