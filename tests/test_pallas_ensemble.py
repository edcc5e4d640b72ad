"""Fused Pallas ensemble kernel (stretch moves) — interpret-mode tests.

Same strategy as test_pallas_mh.py: the compiled path runs on real TPU in
bench.py; here the kernel runs through the Pallas interpreter with small
tiles so CI covers correctness without hardware."""
import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from odelib_tpu.data import build_obsdata_host, format_dataframe
from odelib_tpu.model import make_spec
from odelib_tpu.ops.pallas_mh import ensemble_fused

TILE = 256   # sub=2 -> sublane halves of 1 x 128 walkers


@pytest.fixture(scope="module")
def gaussian_setup():
    """Constant model y = S0: posterior over log S0 is exactly
    N(mean(logobs), sig^2/n) (same oracle as test_ensemble.py)."""
    def const_rhs(t, y, ps):
        return jnp.stack([0.0 * y[0]])

    spec = make_spec(const_rhs, ("S0",), ("S",))
    rng = np.random.default_rng(17)
    sig = 0.3
    tobs = np.linspace(0.0, 3.0, 10)
    logobs = np.log(1e6) + rng.normal(0, sig, len(tobs))
    rows = [{"organism": "S", "time": t, "abundance": np.exp(la),
             "log_sigma": sig} for t, la in zip(tobs, logobs)]
    df = format_dataframe(pd.DataFrame(rows), ("S",))
    times = np.linspace(0.0, 3.0, 11)
    obs_host, _ = build_obsdata_host(df, times, spec.post_snames)
    return (spec, obs_host, times, np.array([1.0]),
            float(np.mean(logobs)), sig / np.sqrt(len(tobs)))


def test_fused_ensemble_recovers_exact_gaussian(gaussian_setup):
    spec, obs_host, times, y0, post_mean, post_std = gaussian_setup
    W = TILE
    rng = np.random.default_rng(3)
    th0 = np.exp(post_mean + rng.normal(0, 0.2, (W, 1))).astype(np.float32)
    out = ensemble_fused(spec, obs_host, times, y0, th0, seed=5,
                         nits=600, burnin=300, substeps=1,
                         tile_chains=TILE, interpret=True)
    assert out.theta.shape == (W, 299, 1)
    z = np.log(np.asarray(out.theta)).ravel()
    se = post_std / np.sqrt(W)
    assert abs(z.mean() - post_mean) < 6 * se
    np.testing.assert_allclose(z.std(), post_std, rtol=0.35)
    ar = np.asarray(out.acceptance_ratio)[:, -1]
    assert 0.1 < ar.mean() < 0.9


def test_fused_ensemble_padding_and_slicing(gaussian_setup):
    """W0 below the tile: padded walkers must participate but only the
    first W0 rows come back."""
    spec, obs_host, times, y0, post_mean, _ = gaussian_setup
    W0 = 40
    rng = np.random.default_rng(4)
    th0 = np.exp(post_mean + rng.normal(0, 0.2, (W0, 1))).astype(np.float32)
    out = ensemble_fused(spec, obs_host, times, y0, th0, seed=6,
                         nits=60, burnin=30, substeps=1,
                         tile_chains=TILE, interpret=True)
    assert out.theta.shape[0] == W0
    assert np.isfinite(np.asarray(out.chi)).all()


def test_fused_ensemble_static_mask(gaussian_setup):
    spec0, obs_host, times, y0, post_mean, _ = gaussian_setup

    def rhs(t, y, ps):
        return jnp.stack([0.0 * y[0]])

    spec = make_spec(rhs, ("S0", "dummy"), ("S",))
    W = TILE
    rng = np.random.default_rng(5)
    th0 = np.concatenate(
        [np.exp(post_mean + rng.normal(0, 0.2, (W, 1))),
         np.full((W, 1), 7.0)], axis=1).astype(np.float32)
    out = ensemble_fused(spec, obs_host, times, y0, th0, seed=7,
                         nits=40, burnin=20, substeps=1,
                         walk_mask=[1.0, 0.0],
                         tile_chains=TILE, interpret=True)
    np.testing.assert_allclose(np.asarray(out.theta)[..., 1], 7.0,
                               rtol=1e-5)
    assert np.asarray(out.theta)[..., 0].std() > 0


@pytest.mark.slow
def test_fused_ensemble_matches_xla_ensemble_statistically(gaussian_setup):
    """Independent implementations of the same sampler must agree on the
    posterior moments (they can never agree bitwise: different RNG and
    partner-selection schemes)."""
    import jax

    from odelib_tpu.data import obsdata_to_device
    from odelib_tpu.samplers import ensemble_mh

    spec, obs_host, times, y0, post_mean, post_std = gaussian_setup
    W = TILE
    rng = np.random.default_rng(8)
    th0 = np.exp(post_mean + rng.normal(0, 0.2, (W, 1))).astype(np.float32)
    fused = ensemble_fused(spec, obs_host, times, y0, th0, seed=9,
                           nits=400, burnin=200, substeps=1,
                           tile_chains=TILE, interpret=True)
    obs_dev = obsdata_to_device(obs_host, jnp.float32)
    xla = ensemble_mh(spec, obs_dev, jnp.asarray(times, jnp.float32),
                      jnp.asarray(y0, jnp.float32), jnp.asarray(th0),
                      jax.random.PRNGKey(9), nits=400, burnin=200,
                      method="fixed_dopri5", substeps=1, init_jitter=0.0)
    zf = np.log(np.asarray(fused.theta)).ravel()
    zx = np.log(np.asarray(xla.theta)).ravel()
    se = post_std / np.sqrt(W)
    assert abs(zf.mean() - zx.mean()) < 8 * se
    np.testing.assert_allclose(zf.std(), zx.std(), rtol=0.25)


@pytest.mark.slow
def test_mcmc_routes_ensemble_to_fused_kernel():
    """MCMC(sampler='ensemble', backend='pallas') drives the fused kernel
    end-to-end (interpret mode on CPU)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import synthetic_df
    from odelib_tpu import models

    mf = models.get("zero_i").framework(synthetic_df(), t_steps=288)
    post = mf.MCMC(chain_inits=TILE, iterations_per_chain=40,
                   fitsurvey_samples=256, sd_fitdistance=6.0,
                   print_report=False, sampler="ensemble",
                   backend="pallas", pallas_interpret=True,
                   pallas_tile_chains=TILE)
    assert len(post) == TILE * 19
    assert np.isfinite(post["chi"]).all()
    assert post["acceptance_ratio"].iloc[-1] > 0


@pytest.mark.slow
def test_ensemble_kill_and_resume_reproduces_uninterrupted_run(
        gaussian_setup, tmp_path):
    """Chunked/killed/resumed fused-ensemble run must be bitwise identical
    to the single dispatch (counter-based RNG on the global iteration,
    f32-exact state round-trip) — same guarantee as the MH kernel."""
    spec, obs_host, times, y0, post_mean, _ = gaussian_setup
    rng = np.random.default_rng(1)
    th0 = np.exp(post_mean + rng.normal(0, 0.2, (TILE, 1))
                 ).astype(np.float32)
    kw = dict(seed=9, nits=25, burnin=6, substeps=1, tile_chains=TILE,
              interpret=True)
    ref = ensemble_fused(spec, obs_host, times, y0, th0, **kw)
    ckpt = str(tmp_path / "ens.npz")
    out = ensemble_fused(spec, obs_host, times, y0, th0,
                         checkpoint_every=10, checkpoint_path=ckpt,
                         _stop_after_chunks=1, **kw)
    assert out is None
    assert np.load(ckpt)["next_chunk"] == 1
    res = ensemble_fused(spec, obs_host, times, y0, th0,
                         checkpoint_every=10, checkpoint_path=ckpt,
                         resume_from=ckpt, **kw)
    for a, b in zip(ref, res):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="different ensemble"):
        ensemble_fused(spec, obs_host, times, y0, th0,
                       checkpoint_every=10, resume_from=ckpt,
                       **{**kw, "seed": 10})


def test_pick_tile_chains():
    from odelib_tpu.ops.pallas_mh import pick_tile_chains

    # small batches stay on the small tile (padding would dominate)
    assert pick_tile_chains(512) == 1024
    assert pick_tile_chains(1024) == 1024
    # large batches take the fastest tile
    assert pick_tile_chains(4096) == 4096
    assert pick_tile_chains(10240) == 4096
    assert pick_tile_chains(1_000_000) == 4096
    # per-device batch is what matters under a mesh
    assert pick_tile_chains(8192, n_dev=8) == 1024


def test_fused_ensemble_validation(gaussian_setup):
    spec, obs_host, times, y0, post_mean, _ = gaussian_setup
    th0 = np.full((8, 1), float(np.exp(post_mean)), np.float32)
    with pytest.raises(ValueError, match="stretch scale"):
        ensemble_fused(spec, obs_host, times, y0, th0, seed=0,
                       nits=10, burnin=2, a=0.9, tile_chains=TILE,
                       interpret=True)
    with pytest.raises(ValueError, match="even sublane"):
        ensemble_fused(spec, obs_host, times, y0, th0, seed=0,
                       nits=10, burnin=2, tile_chains=128, interpret=True)
    with pytest.raises(ValueError, match="no recorded"):
        ensemble_fused(spec, obs_host, times, y0, th0, seed=0,
                       nits=10, burnin=9, tile_chains=TILE, interpret=True)