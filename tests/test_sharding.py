"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that the shard_map path (blocks sharded over the 'jack' axis,
totals merged by psum) reproduces the sequential engine exactly.
"""
import jax
import numpy as np
import pytest

from pyrhe_tpu.core.data import load_dataset
from pyrhe_tpu.core.engine import Engine, ModelSpec, RunConfig
from pyrhe_tpu.parallel.mesh import make_mesh


def _engines(ds, model="rhe", genie_model="G", cov=False, env=False,
             J=8, B=8, impute="binary"):
    def mk():
        data = load_dataset(
            ds["prefix"], annot_file=ds["annot1_path"],
            pheno_file=ds["pheno_path"],
            cov_file=ds["cov_path"] if cov else None,
            env_file=ds["env_path"] if env else None,
            num_random_vec=B, seed=7)
        spec = ModelSpec.build(model, genie_model, data.num_env)
        cfg = RunConfig(num_random_vec=B, num_jack=J, seed=7,
                        geno_impute_method=impute, dtype="float64")
        return Engine(data, spec, cfg)
    return mk


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_sharded_matches_sequential(small_dataset, n_dev):
    mk = _engines(small_dataset, cov=True)
    eng_seq = mk()
    eng_seq.run_precompute_and_assemble()
    eng_sh = mk()
    eng_sh.run_sharded(make_mesh(n_dev))
    np.testing.assert_allclose(eng_sh.T_all, eng_seq.T_all,
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(eng_sh.q_all, eng_seq.q_all,
                               rtol=1e-10, atol=1e-10)


def test_sharded_genie(small_dataset):
    mk = _engines(small_dataset, model="genie", genie_model="G+GxE+NxE",
                  cov=True, env=True)
    eng_seq = mk()
    eng_seq.run_precompute_and_assemble()
    eng_sh = mk()
    eng_sh.run_sharded(make_mesh(8))
    np.testing.assert_allclose(eng_sh.T_all, eng_seq.T_all,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(eng_sh.q_all, eng_seq.q_all,
                               rtol=1e-9, atol=1e-9)


def test_sharded_uneven_last_block(small_dataset, tmp_path):
    # M=800, J=6 -> last block bigger; sharded path pads to uniform m
    mk = _engines(small_dataset, J=6)
    eng_seq = mk()
    eng_seq.run_precompute_and_assemble()
    eng_sh = mk()
    eng_sh.run_sharded(make_mesh(2))
    np.testing.assert_allclose(eng_sh.T_all, eng_seq.T_all,
                               rtol=1e-10, atol=1e-10)
