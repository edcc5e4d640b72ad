"""Fused Pallas PMMH kernel (ops/pallas_pf.py) — interpret-mode tests.

Oracle: the GBM + lognormal-observation state-space model is
linear-Gaussian in log space, so the exact posterior over log(mu) is
computable by Kalman filtering on a grid (same oracle as
tests/test_sde.py). The fused kernel uses a different (counter-based
SplitMix) RNG stream than the XLA sampler, so agreement is statistical,
never bitwise; determinism and mesh-sharding invariance ARE bitwise.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from odelib_tpu import distributions as D  # noqa: E402
from odelib_tpu.model import ObsData, make_spec  # noqa: E402
from odelib_tpu.ops.pallas_pf import (pmmh_fused, pmmh_supported,  # noqa: E402
                                      sde_supports_tiles)
from odelib_tpu.parallel import chain_mesh  # noqa: E402

MU, SIG, S_OBS = 0.4, 0.3, 0.15


@pytest.fixture(scope="module")
def gbm_ssm():
    def rhs(t, y, ps):
        return jnp.stack([ps[0] * y[0]])

    def diff(t, y, ps):
        return jnp.stack([SIG * y[0]])

    spec = make_spec(rhs, ("mu",), ("N",), diffusion=diff)
    rng = np.random.default_rng(42)
    T_obs = np.arange(1, 9) * 0.5
    z0 = np.log(2.0)
    z, zs = z0, []
    for dt in np.diff(np.concatenate([[0.0], T_obs])):
        z = z + (MU - 0.5 * SIG ** 2) * dt + SIG * np.sqrt(dt) * rng.normal()
        zs.append(z)
    logO = np.array(zs) + S_OBS * rng.normal(size=len(zs))
    times = np.linspace(0, 4.0, 41)
    t_idx = np.array([int(round(t / 0.1)) for t in T_obs])
    obs = ObsData(log_abundance=logO, log_sigma=np.full(len(logO), S_OBS),
                  abundance=np.exp(logO), t_index=t_idx,
                  state_index=np.zeros(len(logO), np.int64),
                  sstot=float(np.var(np.exp(logO)) * len(logO)))

    def kalman_ll(mu):
        m, P, ll, prev = z0, 0.0, 0.0, 0.0
        for t, y in zip(T_obs, logO):
            dt = t - prev
            prev = t
            m += (mu - 0.5 * SIG ** 2) * dt
            P += SIG ** 2 * dt
            S = P + S_OBS ** 2
            ll += -0.5 * np.log(2 * np.pi * S) - 0.5 * (y - m) ** 2 / S
            K = P / S
            m += K * (y - m)
            P *= (1 - K)
        return ll

    return spec, obs, times, kalman_ll


def test_supported_probe(gbm_ssm):
    spec, *_ = gbm_ssm
    assert sde_supports_tiles(spec)
    assert pmmh_supported(spec, 128, "euler")
    assert not pmmh_supported(spec, 100, "euler")   # not multiple of 8
    # r5: milstein in-kernel and particle planes beyond 128 sublanes
    assert pmmh_supported(spec, 128, "milstein")
    assert pmmh_supported(spec, 256, "milstein")
    assert pmmh_supported(spec, 512, "euler")
    assert not pmmh_supported(spec, 520, "euler")   # above the VMEM cap
    assert not pmmh_supported(spec, 128, "srk")     # unknown method
    det = make_spec(lambda t, y, ps: jnp.stack([ps[0] * y[0]]),
                    ("mu",), ("N",))
    assert not pmmh_supported(det, 128, "euler")


@pytest.mark.parametrize("sde_method", ["euler", "milstein"])
@pytest.mark.slow
def test_fused_pmmh_matches_exact_posterior(gbm_ssm, sde_method):
    """Prior-aware fused PMMH recovers the exact (grid-Kalman) posterior
    over log mu within Monte-Carlo + discretization slack (both in-kernel
    SDE methods)."""
    spec, obs, times, kalman_ll = gbm_ssm
    PRI_MU, PRI_SD = np.log(MU), 0.5
    grid = np.linspace(PRI_MU - 3, PRI_MU + 3, 601)
    lp = (np.array([kalman_ll(np.exp(z)) for z in grid])
          - 0.5 * ((grid - PRI_MU) / PRI_SD) ** 2)
    w = np.exp(lp - lp.max())
    w /= w.sum()
    exact_mean = float((grid * w).sum())
    exact_std = float(np.sqrt(((grid - exact_mean) ** 2 * w).sum()))

    C = 128
    rng = np.random.default_rng(1)
    th0 = np.exp(rng.normal(PRI_MU, 0.3, (C, 1))).astype(np.float32)
    pri = (D.LogNormal(s=PRI_SD, loc=0.0, scale=float(np.exp(PRI_MU))),)
    out = pmmh_fused(spec, obs, times, np.array([2.0], np.float32), th0,
                     seed=3, nits=500, burnin=250, rwalk_std=0.3,
                     n_particles=64, substeps=2, priors=pri,
                     sde_method=sde_method,
                     adapt_proposal=True, interpret=True)
    z = np.log(np.asarray(out.theta)[:, :, 0]).ravel()
    assert np.isfinite(np.asarray(out.chi)).all()
    assert abs(z.mean() - exact_mean) < 0.2, (z.mean(), exact_mean)
    np.testing.assert_allclose(z.std(), exact_std, rtol=0.35)
    # adaptation landed the frozen-phase acceptance near target
    ar = np.asarray(out.acceptance_ratio)
    it = np.asarray(out.iteration, float)
    acc = float(np.mean((ar[:, -1] * it[-1] - ar[:, 0] * it[0])
                        / (it[-1] - it[0])))
    assert 0.15 < acc < 0.5, acc


@pytest.mark.slow
def test_fused_pmmh_deterministic(gbm_ssm):
    spec, obs, times, _ = gbm_ssm
    th0 = np.full((8, 1), MU, np.float32)
    kw = dict(seed=7, nits=40, burnin=20, rwalk_std=0.2, n_particles=16,
              substeps=2, interpret=True)
    a = pmmh_fused(spec, obs, times, np.array([2.0], np.float32), th0,
                   **kw)
    b = pmmh_fused(spec, obs, times, np.array([2.0], np.float32), th0,
                   **kw)
    for x, y in zip(a[:4], b[:4]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(a.iteration),
                                  np.arange(21, 40))


@pytest.mark.parametrize("n_particles,sde_method", [(8, "euler"),
                                                    (136, "milstein")])
@pytest.mark.slow
def test_fused_pmmh_sharded_matches_unsharded(gbm_ssm, n_particles,
                                              sde_method):
    """RNG streams keyed on the GLOBAL tile index: mesh-sharded == single
    device, bitwise — including the r5 envelope (>128-sublane particle
    planes, in-kernel Milstein)."""
    spec, obs, times, _ = gbm_ssm
    C = 8 * 128
    rng = np.random.default_rng(2)
    th0 = np.exp(rng.normal(np.log(MU), 0.2, (C, 1))).astype(np.float32)
    kw = dict(seed=4, nits=13, burnin=4, rwalk_std=0.2,
              n_particles=n_particles, sde_method=sde_method,
              substeps=1, interpret=True)
    ref = pmmh_fused(spec, obs, times, np.array([2.0], np.float32), th0,
                     **kw)
    mesh = chain_mesh(jax.devices()[:8])
    out = pmmh_fused(spec, obs, times, np.array([2.0], np.float32), th0,
                     mesh=mesh, **kw)
    np.testing.assert_array_equal(np.asarray(out.theta),
                                  np.asarray(ref.theta))
    np.testing.assert_array_equal(np.asarray(out.chi),
                                  np.asarray(ref.chi))


def test_fused_pmmh_validation(gbm_ssm):
    spec, obs, times, _ = gbm_ssm
    th0 = np.full((8, 1), MU, np.float32)
    with pytest.raises(ValueError, match="multiple of 8"):
        pmmh_fused(spec, obs, times, np.array([2.0]), th0, seed=0,
                   n_particles=100, interpret=True)
    with pytest.raises(ValueError, match="multiple of 8"):
        pmmh_fused(spec, obs, times, np.array([2.0]), th0, seed=0,
                   n_particles=1024, interpret=True)   # above the cap
    with pytest.raises(ValueError, match="Euler-Maruyama or Milstein"):
        pmmh_fused(spec, obs, times, np.array([2.0]), th0, seed=0,
                   sde_method="srk", interpret=True)
    det = make_spec(lambda t, y, ps: jnp.stack([ps[0] * y[0]]),
                    ("mu",), ("N",))
    with pytest.raises(ValueError, match="diffusion"):
        pmmh_fused(det, obs, times, np.array([2.0]), th0, seed=0,
                   interpret=True)


@pytest.mark.slow
def test_mcmc_pmmh_pallas_backend_end_to_end():
    """API wiring: sampler='pmmh' + backend='pallas' runs the fused
    kernel through the MCMC surface; backend='xla' forces the scan
    sampler; both produce the reference posterior layout."""
    import pandas as pd
    import scipy.stats

    import odelib_tpu

    def gbm(y, t, ps):
        return np.array([ps[0] * y[0]])

    def gnoise(y, t, ps):
        return np.array([ps[1] * y[0]])

    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 2.0, 9)[1:]
    ab = 10.0 * np.exp((0.5 - 0.5 * 0.3 ** 2) * ts
                       + 0.3 * np.sqrt(ts) * rng.normal(size=ts.size))
    df = pd.DataFrame({"organism": "X", "time": ts, "abundance": ab,
                       "log_sigma": 0.2})
    m = odelib_tpu.ModelFramework(
        ODE=gbm, diffusion=gnoise, parameter_names=["r", "s"],
        state_names=["X"], dataframe=df, t_steps=16, random_seed=1,
        r=odelib_tpu.parameter(scipy.stats.lognorm,
                               {"s": 0.5, "scale": 0.5}),
        s=odelib_tpu.parameter(scipy.stats.lognorm,
                               {"s": 0.5, "scale": 0.3}),
        X=10.0)
    kw = dict(chain_inits=4, iterations_per_chain=20,
              fitsurvey_samples=32, sampler="pmmh", n_particles=8,
              sde_substeps=1, print_report=False)
    post = m.MCMC(backend="pallas", pallas_interpret=True, **kw)
    assert len(post) == 4 * 9
    assert np.isfinite(post["chi"]).all()
    assert post["rsquared"].isna().all()   # NaN by design under noise
    for col in ("r", "s", "chi", "aic", "acceptance_ratio", "chain#"):
        assert col in post.columns
    post_x = m.MCMC(backend="xla", **kw)
    assert len(post_x) == len(post)
    # r5: milstein runs in-kernel on the pallas backend too
    post_m = m.MCMC(backend="pallas", pallas_interpret=True,
                    sde_method="milstein", **kw)
    assert len(post_m) == len(post)
    assert np.isfinite(post_m["chi"]).all()


@pytest.mark.slow
def test_fused_pmmh_checkpoint_bitwise_and_resume(gbm_ssm, tmp_path):
    """Chunked fused PMMH == straight-through, bitwise; a killed run
    resumes bit-exact; wrong-config resume fails loudly."""
    spec, obs, times, _ = gbm_ssm
    rng = np.random.default_rng(3)
    th0 = np.exp(rng.normal(np.log(MU), 0.2, (8, 1))).astype(np.float32)
    kw = dict(seed=9, nits=41, burnin=20, rwalk_std=0.2, n_particles=16,
              substeps=1, adapt_proposal=True, interpret=True)
    ref = pmmh_fused(spec, obs, times, np.array([2.0], np.float32), th0,
                     **kw)
    ck = str(tmp_path / "pf.npz")
    out = pmmh_fused(spec, obs, times, np.array([2.0], np.float32), th0,
                     checkpoint_every=7, checkpoint_path=ck, **kw)
    for a, b in zip(ref[:4], out[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ck2 = str(tmp_path / "pf2.npz")
    r = pmmh_fused(spec, obs, times, np.array([2.0], np.float32), th0,
                   checkpoint_every=7, checkpoint_path=ck2,
                   _stop_after_chunks=2, **kw)
    assert r is None
    out2 = pmmh_fused(spec, obs, times, np.array([2.0], np.float32), th0,
                      checkpoint_every=7, checkpoint_path=ck2,
                      resume_from=ck2, **kw)
    for a, b in zip(ref[:4], out2[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="different PMMH configuration"):
        pmmh_fused(spec, obs, times, np.array([2.0], np.float32), th0,
                   checkpoint_every=7, checkpoint_path=ck2,
                   resume_from=ck2, **{**kw, "rwalk_std": 0.25})
