"""Posterior checkpoint / resume (new capability over the reference,
SURVEY.md section 5.4)."""
import os

import numpy as np
import pandas as pd
import pytest
import scipy.stats

from odelib_tpu import ModelFramework, parameter
from odelib_tpu.utils import checkpoint as ckpt

from helpers import synthetic_df, zero_i


@pytest.fixture()
def model():
    return ModelFramework(ODE=zero_i, parameter_names=["mu", "phi", "beta"],
                          state_names=["S", "V"], dataframe=synthetic_df(),
                          t_steps=60,
                          mu=parameter(scipy.stats.lognorm,
                                       {"s": 3, "scale": 1e-8}),
                          phi=parameter(scipy.stats.lognorm,
                                        {"s": 3, "scale": 1e-8}),
                          beta=parameter(scipy.stats.lognorm,
                                         {"s": 1, "scale": 25}))


# smoke tier (r5): bitwise kill-and-resume runs every sampler twice+ — full suite only
pytestmark = pytest.mark.slow


def test_save_load_roundtrip(tmp_path):
    df = pd.DataFrame({"mu": [0.1, 0.2], "chi": [1.0, 2.0],
                       "chain#": [0, 1]})
    p = str(tmp_path / "post.npz")
    ckpt.save_posterior(p, df)
    back = ckpt.load_posterior(p)
    pd.testing.assert_frame_equal(back, df, check_dtype=False)


def test_mcmc_checkpoint_and_resume(model, tmp_path):
    inits = pd.DataFrame([dict(mu=0.6, phi=2.4e-8, beta=24.0)] * 2)
    p = str(tmp_path / "post.npz")
    post = model.MCMC(chain_inits=inits, iterations_per_chain=40,
                      print_report=False, checkpoint_path=p)
    back = ckpt.load_posterior(p)
    assert len(back) == len(post)
    np.testing.assert_allclose(back["chi"], post["chi"])

    # resume: continue both chains from their last recorded state
    resume = ckpt.resume_theta(back, ["mu", "phi", "beta"], 2)
    assert len(resume) == 2
    post2 = model.MCMC(chain_inits=resume, iterations_per_chain=40,
                       print_report=False)
    assert len(post2) == len(post)


def test_save_honors_exact_path(tmp_path):
    """np.savez appends .npz to foreign extensions; save_posterior must not
    (the save->load round trip uses the user's exact path)."""
    import pandas as pd

    from odelib_tpu.utils import load_posterior, save_posterior

    p = str(tmp_path / "post.parquet")  # deliberately non-npz extension
    df = pd.DataFrame({"mu": [1.0, 2.0], "chain#": [0, 0]})
    save_posterior(p, df)
    assert os.path.exists(p) and not os.path.exists(p + ".npz")
    pd.testing.assert_frame_equal(load_posterior(p), df)


def _mh_args(model):
    import jax
    import jax.numpy as jnp

    dtype = jnp.result_type(float)
    theta0 = jnp.asarray(
        np.tile([0.6, 2.4e-8, 24.0], (3, 1)) * [[1.0], [1.1], [0.9]], dtype)
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    return (model._spec, model._obsdata_fit,
            jnp.asarray(model._times_fit, dtype),
            jnp.asarray(model.get_inits(), dtype), theta0, keys)


def test_xla_checkpointed_bitwise_equals_plain(model, tmp_path):
    """The chunked XLA MH (counter-based per-iteration keys) must be
    BITWISE identical to the single-scan sampler — including with the
    stiff adaptive integrator the fused kernel cannot run (VERDICT r2
    weak 4)."""
    from odelib_tpu.samplers import metropolis_hastings
    from odelib_tpu.samplers.mh import metropolis_hastings_checkpointed

    args = _mh_args(model)
    for method in ("fixed_dopri5", "kvaerno3"):
        kw = dict(nits=24, burnin=12, method=method, substeps=2)
        plain = metropolis_hastings(*args, **kw)
        chunked = metropolis_hastings_checkpointed(
            *args, checkpoint_every=5,
            checkpoint_path=str(tmp_path / f"mh-{method}.progress"), **kw)
        for a, b in zip(plain, chunked):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_xla_checkpoint_kill_and_resume(model, tmp_path):
    """Kill after 2 chunks, resume from the progress file: the stitched
    run equals the uninterrupted one bitwise."""
    from odelib_tpu.samplers import metropolis_hastings
    from odelib_tpu.samplers.mh import metropolis_hastings_checkpointed

    args = _mh_args(model)
    kw = dict(nits=30, burnin=10, method="fixed_dopri5", substeps=2)
    p = str(tmp_path / "mh.progress")
    ref = metropolis_hastings(*args, **kw)

    killed = metropolis_hastings_checkpointed(
        *args, checkpoint_every=7, checkpoint_path=p,
        _stop_after_chunks=2, **kw)
    assert killed is None and os.path.exists(p)

    resumed = metropolis_hastings_checkpointed(
        *args, checkpoint_every=7, checkpoint_path=p, resume_from=p, **kw)
    for a, b in zip(ref, resumed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_xla_checkpoint_config_mismatch(model, tmp_path):
    from odelib_tpu.samplers.mh import metropolis_hastings_checkpointed

    args = _mh_args(model)
    p = str(tmp_path / "mh.progress")
    metropolis_hastings_checkpointed(
        *args, nits=24, burnin=12, method="fixed_dopri5", substeps=2,
        checkpoint_every=6, checkpoint_path=p)
    with pytest.raises(ValueError, match="different MCMC configuration"):
        metropolis_hastings_checkpointed(
            *args, nits=24, burnin=12, method="fixed_dopri5", substeps=4,
            checkpoint_every=6, checkpoint_path=p, resume_from=p)


def test_api_checkpoint_every_on_xla_backend(model, tmp_path):
    """MCMC(checkpoint_every=..., backend='xla') persists progress and
    returns the usual posterior shape — the long-run users forced onto
    XLA (stiff methods, exotic priors) no longer lose everything on a
    kill."""
    inits = pd.DataFrame([dict(mu=0.6, phi=2.4e-8, beta=24.0)] * 2)
    p = str(tmp_path / "post.npz")
    post = model.MCMC(chain_inits=inits, iterations_per_chain=30,
                      backend="xla", checkpoint_path=p, checkpoint_every=8,
                      print_report=False, method="kvaerno3", substeps=2)
    assert os.path.exists(p + ".progress")
    assert len(post) == 2 * 14  # nits=30 -> records 16..29
    assert np.isfinite(post["chi"]).all()


def test_hmc_checkpointed_bitwise_equals_plain(model, tmp_path):
    """Chunked/persisted HMC must reproduce the single-dispatch sampler
    bitwise: every source of randomness and adaptation lives in the
    persisted carry (incl. ChEES trajectory-length state)."""
    from odelib_tpu.samplers import (hamiltonian_mc,
                                     hamiltonian_mc_checkpointed)

    args = _mh_args(model)
    for path_adapt in (False, True):
        kw = dict(nits=24, burnin=12, n_leapfrog=2, step_size=0.02,
                  substeps=2, path_adapt=path_adapt, max_leapfrog=8)
        plain = hamiltonian_mc(*args, **kw)
        chunked = hamiltonian_mc_checkpointed(
            *args, checkpoint_every=5,
            checkpoint_path=str(tmp_path / f"hmc-{path_adapt}.progress"),
            **kw)
        for a, b in zip(plain, chunked):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hmc_checkpoint_kill_and_resume(model, tmp_path):
    from odelib_tpu.samplers import (hamiltonian_mc,
                                     hamiltonian_mc_checkpointed)

    args = _mh_args(model)
    kw = dict(nits=30, burnin=10, n_leapfrog=2, step_size=0.02, substeps=2,
              path_adapt=True, max_leapfrog=8)
    p = str(tmp_path / "hmc.progress")
    ref = hamiltonian_mc(*args, **kw)

    killed = hamiltonian_mc_checkpointed(
        *args, checkpoint_every=7, checkpoint_path=p,
        _stop_after_chunks=2, **kw)
    assert killed is None and os.path.exists(p)

    resumed = hamiltonian_mc_checkpointed(
        *args, checkpoint_every=7, checkpoint_path=p, resume_from=p, **kw)
    for a, b in zip(ref, resumed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_api_checkpoint_every_on_hmc_sampler(model, tmp_path):
    """MCMC(sampler='hmc', checkpoint_every=...) persists progress and
    returns the usual posterior columns."""
    inits = pd.DataFrame([dict(mu=0.6, phi=2.4e-8, beta=24.0)] * 2)
    p = str(tmp_path / "post.npz")
    post = model.MCMC(chain_inits=inits, iterations_per_chain=24,
                      print_report=False, sampler="hmc", n_leapfrog=2,
                      checkpoint_path=p, checkpoint_every=6)
    assert os.path.exists(p + ".progress")
    assert {"mu", "phi", "beta", "chi", "chain#"} <= set(post.columns)
    assert len(post) > 0


# ---- joint XLA checkpointing (hierarchical runs are forced onto XLA) ----

def _joint_fixture():
    import jax.numpy as jnp
    from odelib_tpu import JointFit
    from odelib_tpu.distributions import LogNormal

    def rhs(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0]])

    def decay_df(k, seed):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            [{"organism": "y", "time": t,
              "abundance": 1e6 * np.exp(-k * t) * np.exp(rng.normal(0, .15)),
              "log_sigma": 0.15} for t in np.linspace(0, 3, 8)])

    def fw(k, seed):
        return ModelFramework(
            ODE=rhs, parameter_names=["k"], state_names=["y"],
            dataframe=decay_df(k, seed), t_steps=24, ode_style="jax",
            random_seed=seed,
            k=parameter(stats_gen=LogNormal(s=0.7, scale=1.0),
                        hyperparameters={}, random_seed=seed))

    jf = JointFit({"a": fw(0.9, 30), "b": fw(1.1, 31)},
                  hierarchical=["k"], random_seed=32)
    specs, idxs, obs, times, y0s, method, subs = jf._device_args(
        {"method": "fixed_dopri5", "substeps": 2})
    th0 = np.tile(jf._current_joint_theta(), (3, 1)) \
        * np.array([[0.9], [1.0], [1.1]])
    import jax
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(5), i))(
        np.arange(3))
    prior = jf._effective_prior(False)[0]
    args = (specs, idxs, obs, times, y0s,
            np.asarray(th0, np.float64), keys)
    kw = dict(nits=24, burnin=12, method=method, substeps_list=subs,
              prior_logpdf=prior, use_priors=True, rwalk_std=0.08)
    return jf, args, kw


def test_joint_checkpointed_bitwise_equals_plain(tmp_path):
    from odelib_tpu.samplers.joint import (
        joint_metropolis_hastings, joint_metropolis_hastings_checkpointed)

    _, args, kw = _joint_fixture()
    plain = joint_metropolis_hastings(*args, **kw)
    chunked = joint_metropolis_hastings_checkpointed(
        *args, checkpoint_every=5,
        checkpoint_path=str(tmp_path / "joint.progress"), **kw)
    for a, b in zip(plain, chunked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_joint_checkpoint_kill_and_resume(tmp_path):
    from odelib_tpu.samplers.joint import (
        joint_metropolis_hastings, joint_metropolis_hastings_checkpointed)

    _, args, kw = _joint_fixture()
    p = str(tmp_path / "joint.progress")
    killed = joint_metropolis_hastings_checkpointed(
        *args, checkpoint_every=5, checkpoint_path=p,
        _stop_after_chunks=1, **kw)
    assert killed is None and os.path.exists(p)
    resumed = joint_metropolis_hastings_checkpointed(
        *args, checkpoint_every=5, checkpoint_path=p, resume_from=p, **kw)
    plain = joint_metropolis_hastings(*args, **kw)
    for a, b in zip(plain, resumed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # config mismatch rejected
    kw2 = dict(kw, rwalk_std=0.1)
    with pytest.raises(ValueError, match="different joint MCMC"):
        joint_metropolis_hastings_checkpointed(
            *args, checkpoint_every=5, checkpoint_path=p,
            resume_from=p, **kw2)


def test_api_checkpoint_every_on_joint_xla(tmp_path):
    """JointFit.MCMC(checkpoint_every=...) persists progress on the XLA
    backend — hierarchical (XLA-only) long runs survive kills too."""
    jf, _, _ = _joint_fixture()
    p = str(tmp_path / "joint_post.npz")
    post = jf.MCMC(chain_inits=4, iterations_per_chain=30,
                   fitsurvey_samples=32, backend="xla",
                   checkpoint_every=8, checkpoint_path=p,
                   print_report=False)
    assert os.path.exists(p + ".progress")
    assert len(post) == 4 * 14          # nits=30 -> records 16..29
    assert np.isfinite(post["chi"]).all()
    assert "k:pop_median" in post


def test_xla_checkpoint_every_and_burnin_in_signature(model, tmp_path):
    """checkpoint_every defines how many iterations ``next_chunk`` already
    covers and burnin selects which chunks persist records, so resuming
    with either changed must be rejected, not silently skip/replay."""
    from odelib_tpu.samplers.mh import metropolis_hastings_checkpointed

    args = _mh_args(model)
    p = str(tmp_path / "mh.progress")
    metropolis_hastings_checkpointed(
        *args, nits=30, burnin=10, method="fixed_dopri5", substeps=2,
        checkpoint_every=7, checkpoint_path=p, _stop_after_chunks=2)
    with pytest.raises(ValueError, match="different MCMC configuration"):
        metropolis_hastings_checkpointed(
            *args, nits=30, burnin=10, method="fixed_dopri5", substeps=2,
            checkpoint_every=9, checkpoint_path=p, resume_from=p)
    with pytest.raises(ValueError, match="different MCMC configuration"):
        metropolis_hastings_checkpointed(
            *args, nits=30, burnin=12, method="fixed_dopri5", substeps=2,
            checkpoint_every=7, checkpoint_path=p, resume_from=p)


def test_xla_resume_from_burnin_only_checkpoint(model, tmp_path):
    """A checkpoint written before any post-burnin iteration holds no
    record arrays (warmup chunks run the no-record program); resuming
    from it must still reproduce the uninterrupted run bitwise."""
    from odelib_tpu.samplers import metropolis_hastings
    from odelib_tpu.samplers.mh import metropolis_hastings_checkpointed

    args = _mh_args(model)
    kw = dict(nits=30, burnin=10, method="fixed_dopri5", substeps=2)
    p = str(tmp_path / "mh.progress")
    ref = metropolis_hastings(*args, **kw)

    killed = metropolis_hastings_checkpointed(
        *args, checkpoint_every=7, checkpoint_path=p,
        _stop_after_chunks=1, **kw)
    assert killed is None
    with np.load(p) as z:
        assert "rec0" not in z  # iterations 1..7 are all warmup

    resumed = metropolis_hastings_checkpointed(
        *args, checkpoint_every=7, checkpoint_path=p, resume_from=p, **kw)
    for a, b in zip(ref, resumed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hmc_custom_checkpoint_kill_and_resume(tmp_path):
    """Checkpointed HMC over an arbitrary chi closure (the JointFit
    potential path): kill after 2 chunks, resume, bitwise equal to the
    uninterrupted run; a different config token is rejected."""
    import jax
    import jax.numpy as jnp

    from odelib_tpu.samplers import (hamiltonian_mc_custom,
                                     hamiltonian_mc_custom_checkpointed)

    def chi_fn(theta):
        z = jnp.log(theta)
        return jnp.sum(z ** 2) + 0.5 * (z[0] - z[1]) ** 2

    rng = np.random.default_rng(5)
    dtype = np.result_type(float)
    theta0 = np.exp(rng.normal(0, 0.3, size=(3, 2))).astype(dtype)
    keys = jax.random.split(jax.random.PRNGKey(11), 3)
    kw = dict(nits=30, burnin=10, n_leapfrog=3, step_size=0.05)
    ref = hamiltonian_mc_custom(chi_fn, theta0, keys, **kw)

    p = str(tmp_path / "hmc-joint.progress")
    killed = hamiltonian_mc_custom_checkpointed(
        chi_fn, theta0, keys, config_token="tok", checkpoint_every=7,
        checkpoint_path=p, _stop_after_chunks=2, **kw)
    assert killed is None and os.path.exists(p)

    resumed = hamiltonian_mc_custom_checkpointed(
        chi_fn, theta0, keys, config_token="tok", checkpoint_every=7,
        checkpoint_path=p, resume_from=p, **kw)
    for a, b in zip(ref, resumed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="different HMC configuration"):
        hamiltonian_mc_custom_checkpointed(
            chi_fn, theta0, keys, config_token="other", checkpoint_every=7,
            resume_from=p, **kw)


def test_api_joint_hmc_checkpoint_every(tmp_path):
    """JointFit.MCMC(sampler='hmc', checkpoint_every=...) persists
    progress (closing the 'not supported' gap) and returns the usual
    joint posterior shape."""
    jf, _, _ = _joint_fixture()
    p = str(tmp_path / "joint_hmc.npz")
    post = jf.MCMC(chain_inits=4, iterations_per_chain=30,
                   fitsurvey_samples=32, sampler="hmc",
                   checkpoint_every=8, checkpoint_path=p,
                   print_report=False)
    assert os.path.exists(p + ".progress")
    assert len(post) == 4 * 14          # nits=30 -> records 16..29
    assert np.isfinite(post["chi"]).all()


def test_resume_from_requires_checkpoint_every(model, tmp_path):
    """resume_from without checkpoint_every used to be silently dropped
    on the XLA paths (a fresh full run discarded the persisted
    progress); now every backend rejects it up front."""
    inits = pd.DataFrame([dict(mu=0.6, phi=2.4e-8, beta=24.0)] * 2)
    with pytest.raises(ValueError, match="resume_from requires"):
        model.MCMC(chain_inits=inits, iterations_per_chain=30,
                   backend="xla", print_report=False,
                   resume_from=str(tmp_path / "nope.progress"))


def test_resume_rejects_edited_data(model, tmp_path):
    """The persisted resume signature carries a content digest of the
    observation data: resuming against a same-shaped but EDITED
    dataframe must fail loudly instead of stitching samples from two
    different posteriors."""
    inits = pd.DataFrame([dict(mu=0.6, phi=2.4e-8, beta=24.0)] * 2)
    p = str(tmp_path / "post.npz")
    kw = dict(chain_inits=inits, iterations_per_chain=30, backend="xla",
              checkpoint_every=8, print_report=False)
    model.MCMC(checkpoint_path=p, **kw)

    df2 = synthetic_df()
    df2 = df2.assign(abundance=df2["abundance"] * 1.5)  # same shape
    other = ModelFramework(
        ODE=zero_i, parameter_names=["mu", "phi", "beta"],
        state_names=["S", "V"], dataframe=df2, t_steps=60,
        mu=parameter(scipy.stats.lognorm, {"s": 3, "scale": 1e-8}),
        phi=parameter(scipy.stats.lognorm, {"s": 3, "scale": 1e-8}),
        beta=parameter(scipy.stats.lognorm, {"s": 1, "scale": 25}))
    with pytest.raises(ValueError, match="different MCMC configuration"):
        other.MCMC(checkpoint_path=str(tmp_path / "post2.npz"),
                   resume_from=p + ".progress", **kw)


def test_resume_rejects_edited_prior(model, tmp_path):
    """With use_priors=True the prior hyperparameters are part of the
    target density — the resume signature must reject a changed prior."""
    inits = pd.DataFrame([dict(mu=0.6, phi=2.4e-8, beta=24.0)] * 2)
    p = str(tmp_path / "post.npz")
    kw = dict(chain_inits=inits, iterations_per_chain=30, backend="xla",
              checkpoint_every=8, use_priors=True, print_report=False)
    model.MCMC(checkpoint_path=p, **kw)

    other = ModelFramework(
        ODE=zero_i, parameter_names=["mu", "phi", "beta"],
        state_names=["S", "V"], dataframe=synthetic_df(), t_steps=60,
        mu=parameter(scipy.stats.lognorm, {"s": 3, "scale": 1e-8}),
        phi=parameter(scipy.stats.lognorm, {"s": 3, "scale": 1e-8}),
        beta=parameter(scipy.stats.lognorm, {"s": 2, "scale": 25}))
    with pytest.raises(ValueError, match="different MCMC configuration"):
        other.MCMC(checkpoint_path=str(tmp_path / "post2.npz"),
                   resume_from=p + ".progress", **kw)
