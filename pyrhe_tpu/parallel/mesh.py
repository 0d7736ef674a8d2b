"""Multi-device execution: jackknife blocks sharded over a device mesh.

The TPU-native replacement for the reference's multiprocessing + POSIX
shared memory design (reference base.py:432-437, mp_handler.py): the SNP
axis is blocked along the jackknife dimension and those blocks are sharded
across a 1-D "jack" mesh axis. Each device computes its blocks' moment
stats locally; grand totals are merged with `lax.psum` over ICI; the
leave-one-out algebra and per-sample normal-equation assembly stay local
to the device owning the block; the (J+1) small solves then run replicated
on host. Probes, covariates and phenotypes are replicated (they are
O(N*B) — tiny next to the genotype).

Scaling story (BASELINE.json): per-chip work is J/D blocks of fused
decode+matmul; the only collective is one psum of the (E, N, b2) totals.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.normal_eq import assemble_Tq_core
from ..ops.moments import block_stats_core


def make_mesh(n_devices: int | None = None, axis: str = "jack") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_sharded_step(
    mesh: Mesh,
    *,
    n_indiv: int,
    components: tuple,
    b2: int,
    num_random_vec: int,
    packed: bool,
    n_cov: int,
    num_nxe: int,
    dtype=jnp.float32,
    mm_mode: str = "exact",
    axis: str = "jack",
):
    """Build a jitted multi-device step:

    (geno_blocks (J,m,W), fill (J,m), annot_f (J,m,K), M_loo (J,E),
     M_tot (E,), P_mat, env, Z, Uzb, C, Q, q_last, stoch_mask,
     nxe_XXP, nxe_yXXy)
        -> (T_loc (J,E+1,E+1), q_loc (J,E+1,T), T_tot, q_tot)

    J must be divisible by the mesh size; blocks are padded to uniform m
    with zero-dosage, zero-annot SNPs (they standardize to zero columns and
    contribute nothing).
    """
    bs = partial(block_stats_core, n_indiv=n_indiv, components=components,
                 b2=b2, packed=packed, dtype=dtype,
                 mm_mode=mm_mode)
    asm = partial(assemble_Tq_core, num_random_vec=num_random_vec,
                  n_indiv=n_indiv, n_cov=n_cov)
    use_cov = n_cov > 0

    def step(geno_blocks, fill, annot_f, M_loo, M_tot, P_mat, env, Z, Uzb,
             C, Q, q_last, stoch_mask, nxe_XXP, nxe_yXXy):
        XXP_b, y_b, _ = jax.vmap(
            lambda g, f, a: bs(g, f, a, P_mat, env))(geno_blocks, fill,
                                                     annot_f)
        tot_XXP = jax.lax.psum(XXP_b.sum(0), axis)
        tot_y = jax.lax.psum(y_b.sum(0), axis)
        loo_XXP = tot_XXP[None] - XXP_b          # (J_loc, E_geno, N, b2)
        loo_y = tot_y[None] - y_b

        def with_nxe(XXP, y):
            if num_nxe:
                return (jnp.concatenate([XXP, nxe_XXP], axis=0),
                        jnp.concatenate([y, nxe_yXXy], axis=0))
            return XXP, y

        def one(XXP, y, M_row):
            XXP, y = with_nxe(XXP, y)
            return asm(XXP, y, M_row, Z, Uzb, C if use_cov else None,
                       Q if use_cov else None, q_last, stoch_mask)

        T_loc, q_loc = jax.vmap(one)(loo_XXP, loo_y, M_loo)
        T_tot, q_tot = one(tot_XXP, tot_y, M_tot)
        return T_loc, q_loc, T_tot, q_tot

    blocked = P(axis)
    repl = P()
    in_specs = (blocked, blocked, blocked, blocked, repl, repl, repl, repl,
                repl, repl, repl, repl, repl, repl, repl)
    out_specs = (blocked, blocked, repl, repl)
    fn = jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn)


def shard_blocks(mesh: Mesh, arrays, axis: str = "jack"):
    """device_put each (J, ...) array sharded along the mesh axis."""
    sh = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sh) for a in arrays)
