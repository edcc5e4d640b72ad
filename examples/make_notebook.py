"""Author examples/Demo_InfectionStates.ipynb programmatically.

Mirrors the narrative arc of the reference's 40-cell demo
(/root/reference/demo/Demo_InfectionStates.ipynb, SURVEY.md C21) — same
three models, same data, same workload shapes (32 chains x 1000 iterations,
10k LHS survey) — written fresh for the TPU-native framework. Execute with:

    python examples/make_notebook.py          # writes the unexecuted nb
    jupyter nbconvert --to notebook --execute --inplace \
        examples/Demo_InfectionStates.ipynb
"""
import json
import os

C, M = "code", "markdown"

CELLS = [
    (M, """\
# Demo notebook for odelib_tpu — Modeling Infection States

TPU-native rebuild of ODElib's demo (`demo/Demo_InfectionStates.ipynb` in the
reference): Bayesian fitting of host–virus infection ODE models to
experimental time series. Everything the reference notebook does happens
here with the same API — but chains run as vectorized device lanes (one
fused TPU kernel on real hardware, XLA elsewhere) instead of one CPU process
per chain."""),
    (C, """\
import os
import warnings
warnings.filterwarnings('ignore')

import numpy as np
import pandas as pd
import scipy.stats
import matplotlib
matplotlib.rcParams['figure.dpi'] = 72
import matplotlib.pyplot as plt

import sys
sys.path.insert(0, os.path.abspath('..'))
if os.environ.get('ODELIB_DEMO_CPU'):          # CI executes on CPU
    import jax; jax.config.update('jax_platforms', 'cpu')
import jax
import odelib_tpu
from odelib_tpu import ModelFramework, parameter

# CI smoke-executes this notebook with tiny shapes; the committed outputs
# use the reference demo's full workload (32 chains x 1000 its, 10k survey).
FAST = bool(os.environ.get('ODELIB_DEMO_FAST'))
N_CHAINS, N_ITERS, N_SURVEY = (8, 100, 512) if FAST else (32, 1000, 10000)

print('devices:', jax.devices())"""),
    (M, """\
# Writing your models

Models are plain Python functions `f(y, t, ps)` returning `dy/dt` — the same
signature the reference uses, so existing ODElib model code works verbatim.
The framework traces them with JAX for the device hot loops (use `np.array`
or `jnp.stack` for the return; both trace).

We define three candidate mechanisms for the same experiment:
* `zero_i` — infection kills the host instantly (no infected class),
* `one_i` — one infected class `I1` with lysis rate `lam`,
* `two_i` — two infected classes with transition rate `tau`."""),
    (C, '''\
def zero_i(y, t, ps):
    """Host-virus model, no infected class."""
    mu, phi, beta = ps[0], ps[1], ps[2]
    S, V = y[0], y[1]
    dSdt = mu * S - phi * S * V
    dVdt = beta * phi * S * V - phi * S * V
    return np.array([dSdt, dVdt])

def one_i(y, t, ps):
    """One infected class: S -> I1 -> lysis."""
    mu, phi, beta, lam = ps[0], ps[1], ps[2], ps[3]
    S, I1, V = y[0], y[1], y[2]
    dSdt = mu * S - phi * S * V
    dI1dt = phi * S * V - lam * I1
    dVdt = beta * lam * I1 - phi * S * V
    return np.array([dSdt, dI1dt, dVdt])

def two_i(y, t, ps):
    """Two infected classes with transition rate tau."""
    mu, phi, beta, lam, tau = ps[0], ps[1], ps[2], ps[3], ps[4]
    S, I1, I2, V = y[0], y[1], y[2], y[3]
    dSdt = mu * S - phi * S * V
    dI1dt = phi * S * V - tau * I1
    dI2dt = tau * I1 - lam * I2
    dVdt = beta * lam * I2 - phi * S * V
    return np.array([dSdt, dI1dt, dI2dt, dVdt])'''),
    (M, """\
# The data

Host and virus abundances over ~3 days with per-point log-space standard
deviations (`log_sigma` schema; the framework also accepts the replicate
schema and computes log-moments itself)."""),
    (C, """\
# The dataset ships with the package (odelib_tpu/demodata.csv — a
# committed synthetic with the reference demo's exact shape/schema;
# set ODELIB_DEMODATA to substitute another file).
from odelib_tpu.data import load_demo_dataframe
df = load_demo_dataframe()
df"""),
    (C, """\
df = df.replace({'virus': 'V', 'host': 'S'})  # match the model state names
df.head()"""),
    (M, """\
# Initializing parameters and the ModelFramework

Each fitted parameter carries a scipy-style prior (`stats_gen` +
`hyperparameters`); an initial value is drawn from the prior at
construction. Pass `random_seed=` for reproducible draws (the reference
leaves construction draws unseeded)."""),
    (C, """\
mu_prior = parameter(stats_gen=scipy.stats.lognorm,
                     hyperparameters={'s': 3, 'scale': 1e-8}, random_seed=1)
phi_prior = parameter(stats_gen=scipy.stats.lognorm,
                      hyperparameters={'s': 3, 'scale': 1e-8}, random_seed=2)
beta_prior = parameter(stats_gen=scipy.stats.lognorm,
                       hyperparameters={'s': 1, 'scale': 25}, random_seed=3)

zeroI = ModelFramework(ODE=zero_i,
                       parameter_names=['mu', 'phi', 'beta'],
                       state_names=['S', 'V'],
                       dataframe=df,
                       mu=mu_prior, phi=phi_prior, beta=beta_prior,
                       t_steps=288, random_seed=0)
zeroI"""),
    (M, "Prior histograms (`parameter.get_figure`):"),
    (C, """\
fig = mu_prior.get_figure(samples=2000, logspace=True)
plt.show()"""),
    (M, """\
# Poor fits

The initial parameter values are raw prior draws, so the model curve
(dashed) misses the data (errorbars):"""),
    (C, """\
f = zeroI.plot()
plt.show()"""),
    (M, """\
# MCMC

One call runs the whole reference pipeline — Latin-hypercube pre-survey,
chi-threshold chain seeding, and every chain's full
propose→integrate→score→accept loop — as device programs. The workload
shape matches the reference demo (32 chains × 1000 iterations, 10,000 LHS
samples); on a TPU the chain loop is a single fused Pallas kernel and takes
milliseconds, so feel free to raise `chain_inits` to 10,000."""),
    (C, """\
posterior = zeroI.MCMC(chain_inits=N_CHAINS, iterations_per_chain=N_ITERS,
                       fitsurvey_samples=N_SURVEY, sd_fitdistance=6.0)"""),
    (C, "posterior"),
    (C, '''\
def plot_histogram(series, logspace=True, name=None):
    """Posterior marginal histogram (reference demo cell 15)."""
    fig, ax = plt.subplots(figsize=(5, 3))
    s = pd.Series(series).dropna()
    if logspace:
        bins = np.logspace(np.log10(s.min()), np.log10(s.max()), 50)
        ax.set_xscale('log')
    else:
        bins = np.linspace(s.min(), s.max(), 50)
    ax.hist(s, bins=bins)
    ax.set_title(name)
    plt.show()
    return ax'''),
    (C, "_ = plot_histogram(posterior['mu'], name='mu posterior')"),
    (C, "_ = plot_histogram(posterior['phi'], name='phi posterior')"),
    (C, "_ = plot_histogram(posterior['beta'], name='beta posterior', "
        "logspace=False)"),
    (M, """\
`MCMC` already pushed the best posterior sample into the framework
(`set_best_params`), so the fit overlay now tracks the data:"""),
    (C, """\
f = zeroI.plot()
plt.show()
zeroI.get_fitstats()"""),
    (M, """\
# Results from zeroI

`beta` and `phi` are well constrained while `mu` stays broad — killing the
host instantly fits the virus curve but limits how well the host decline is
captured. Next, add an explicit infected class. The observed 'host' is then
the **sum** of susceptible and infected cells: `state_summations` maps the
observable `H` to `S + I1`, and the initial susceptible population is set
directly (`S=5236900`) since only `H = S + I1` is observed at t=0."""),
    (C, """\
df1 = df.replace({'S': 'H'})
oneI = ModelFramework(ODE=one_i,
                      parameter_names=['mu', 'phi', 'beta', 'lam'],
                      state_names=['S', 'I1', 'V'],
                      dataframe=df1,
                      state_summations={'H': ['S', 'I1']},
                      mu=parameter(scipy.stats.lognorm, {'s': 3, 'scale': 1e-8}, random_seed=4),
                      phi=parameter(scipy.stats.lognorm, {'s': 3, 'scale': 1e-8}, random_seed=5),
                      beta=parameter(scipy.stats.lognorm, {'s': 1, 'scale': 20}, random_seed=6),
                      lam=parameter(scipy.stats.lognorm, {'s': 2, 'scale': 0.1}, random_seed=7),
                      S=5236900, t_steps=288, random_seed=1)
posterior_onei = oneI.MCMC(chain_inits=N_CHAINS, iterations_per_chain=N_ITERS,
                           fitsurvey_samples=N_SURVEY, sd_fitdistance=10.0)"""),
    (C, "_ = plot_histogram(posterior_onei['mu'], name='mu posterior (oneI)')"),
    (C, "_ = plot_histogram(posterior_onei['phi'], name='phi posterior (oneI)')"),
    (C, "_ = plot_histogram(posterior_onei['beta'], name='beta posterior (oneI)', logspace=False)"),
    (C, "_ = plot_histogram(posterior_onei['lam'], name='lambda posterior (oneI)')"),
    (C, """\
f = oneI.plot()
plt.show()
oneI.get_fitstats()"""),
    (M, """\
# One infection state results

`phi`, `beta` and now `lam` are constrained; the infected-class model tracks
the host decline. Finally, split the infected pool into two sequential
classes (latent then lysing) with transition rate `tau`:"""),
    (C, """\
twoI = ModelFramework(ODE=two_i,
                      parameter_names=['mu', 'phi', 'beta', 'lam', 'tau'],
                      state_names=['S', 'I1', 'I2', 'V'],
                      dataframe=df1,
                      state_summations={'H': ['S', 'I1', 'I2']},
                      mu=parameter(scipy.stats.lognorm, {'s': 3, 'scale': 1e-8}, random_seed=8),
                      phi=parameter(scipy.stats.lognorm, {'s': 3, 'scale': 1e-8}, random_seed=9),
                      beta=parameter(scipy.stats.lognorm, {'s': 1, 'scale': 20}, random_seed=10),
                      lam=parameter(scipy.stats.lognorm, {'s': 2, 'scale': 0.1}, random_seed=11),
                      tau=parameter(scipy.stats.lognorm, {'s': 2, 'scale': 1}, random_seed=12),
                      S=5236900, t_steps=288, random_seed=2)
posterior_twoi = twoI.MCMC(chain_inits=N_CHAINS, iterations_per_chain=N_ITERS,
                           fitsurvey_samples=N_SURVEY, sd_fitdistance=10.0)"""),
    (C, "_ = plot_histogram(posterior_twoi['mu'], name='mu posterior (twoI)')"),
    (C, "_ = plot_histogram(posterior_twoi['phi'], name='phi posterior (twoI)')"),
    (C, "_ = plot_histogram(posterior_twoi['beta'], name='beta posterior (twoI)', logspace=False)"),
    (C, "_ = plot_histogram(posterior_twoi['lam'], name='lambda posterior (twoI)')"),
    (C, "_ = plot_histogram(posterior_twoi['tau'], name='tau posterior (twoI)')"),
    (M, """\
# Bonus trace figures to watch chains changing parameter values

Each chain's post-burn-in trajectory through parameter space:"""),
    (C, """\
ax = posterior[posterior['chain#'] == 0].plot(
    x='iteration', y='phi', logy=True, legend=False,
    title='phi trace, chain 0 (zeroI)')
plt.show()"""),
    (C, """\
# ...or the one-call version (every parameter + chi, one line per chain):
fig, axs = zeroI.plot_trace(posterior)
plt.show()"""),
    (M, """\
# Model comparison by AIC

Which mechanism does the data prefer? (Lower AIC wins; the reference leaves
this comparison to the reader — here it's one loop.)"""),
    (C, """\
rows = []
for name, m in (('zero_i', zeroI), ('one_i', oneI), ('two_i', twoI)):
    fs = m.get_fitstats()
    rows.append({'model': name, 'Chi': fs['Chi'], 'R^2': fs['R^2'],
                 'AIC': fs['AIC']})
comparison = pd.DataFrame(rows).sort_values('AIC').reset_index(drop=True)
comparison"""),
    (M, """\
# Convergence diagnostics

Did the chains actually converge? The framework ships the two standard
checks — effective sample size and split-chain R-hat (values near 1.0 mean
the chains agree) — as a one-call table. (The reference has no convergence
tooling; you eyeball the traces above.)"""),
    (C, "zeroI.diagnostics(posterior)"),
    (M, """\
# Predictive checks

Two coverage numbers bracket the fit. *Before* fitting,
`prior_predictive` asks whether the priors can generate the data at all
(coverage far below the nominal CI = priors exclude the data; ~100% with
huge intervals = uninformative, which is fine). *After* fitting,
`posterior_predictive` simulates replicated observations from posterior
draws and checks the data sit inside the predictive intervals — coverage
well below nominal flags model misfit or underestimated sigma. (The
reference's closest tool is the visual `plot_uncertainty` envelope.)"""),
    (C, """\
pri = zeroI.prior_predictive(samples=256 if FAST else 1000)
ppc = zeroI.posterior_predictive(posterior, n_draws=200)
ppc['summary'].head()"""),
    (M, """\
# The packaged model library

All three infection models (and eight more families: Lotka-Volterra,
logistic, chemostat, SIR, SEIR, and the stiff Robertson / Van der Pol /
Oregonator systems) ship pre-packaged with literature defaults and priors —
one call builds a ready `ModelFramework`:"""),
    (C, """\
from odelib_tpu import models
print(models.available())
zeroI_packaged = models.get('zero_i').framework(df, t_steps=288)
_ = zeroI_packaged.MCMC(chain_inits=N_CHAINS, iterations_per_chain=N_ITERS,
                        fitsurvey_samples=N_SURVEY, sd_fitdistance=6.0,
                        print_report=False)
zeroI_packaged.get_fitstats()"""),
    (M, """\
# Gradient-based inference (HMC + sensitivity)

Because the whole solve is differentiable JAX code, chains can follow
`-grad(chi)` through parameter space — Hamiltonian Monte Carlo — and you
can read off local sensitivities (chi change per e-fold of each parameter)
directly. Neither is possible in the reference, whose RHS sits behind
scipy's Fortran callback:"""),
    (C, """\
posterior_hmc = zeroI.MCMC(chain_inits=N_CHAINS,
                           iterations_per_chain=max(N_ITERS // 4, 50),
                           fitsurvey_samples=N_SURVEY, sd_fitdistance=6.0,
                           sampler='hmc', n_leapfrog=8,
                           print_report=False)
zeroI.diagnostics(posterior_hmc)"""),
    (C, "zeroI.get_chi_sensitivity()   # d chi / d log-parameter at the best fit"),
    (M, """\
# Evidence-driven run length, dense-metric HMC, prior sensitivity

Three round-3 conveniences on the same machinery:

* `until_rhat` / `until_min_ess` — stop guessing the iteration count:
  the run extends from its final chain states (exact MCMC continuation)
  until the pooled posterior meets the convergence targets;
* `dense_mass=True` — HMC with the FULL cross-chain covariance metric
  (Cholesky per warmup refresh) for strongly correlated parameters;
* `power_scale_sensitivity` — PSIS-reweight the finished draws to
  `prior^a` / `lik^a` perturbations (Kallioinen et al. 2023) and flag
  prior-dominated or prior-data-conflict parameters, with no refitting."""),
    (C, """\
posterior_conv = zeroI.MCMC(chain_inits=N_CHAINS,
                            iterations_per_chain=N_ITERS,
                            fitsurvey_samples=N_SURVEY,
                            sd_fitdistance=6.0, rwalk_std=0.2,
                            until_rhat=1.05, max_extensions=4,
                            print_report=False)
print(f"{posterior_conv['iteration'].max()} total proposals per chain "
      f"(requested {N_ITERS}); extensions ran until split-rhat <= 1.05")
zeroI.diagnostics(posterior_conv)"""),
    (C, """\
posterior_dense = zeroI.MCMC(chain_inits=N_CHAINS,
                             iterations_per_chain=max(N_ITERS // 4, 50),
                             fitsurvey_samples=N_SURVEY,
                             sd_fitdistance=6.0, sampler='hmc',
                             dense_mass=True, use_priors=True,
                             print_report=False)
_ = zeroI.power_scale_sensitivity(posterior_dense)"""),
    (M, """\
# Bayesian model comparison: evidence and predictive criteria

AIC ranks single best fits. With the posterior machinery on device we can
do the full-posterior comparisons: the **model evidence** (marginal
likelihood, via tempered Sequential Monte Carlo — Bayes factors), and the
predictive **WAIC / PSIS-LOO** criteria from the MCMC draws themselves
(with per-observation Pareto k-hat influence diagnostics). None of these
exist in the reference.

Read the table below with its own diagnostics: a high `bad_khat` count
means the importance weights behind `elpd_loo` are heavy-tailed (these
random-walk chains are short and correlated relative to what LOO wants)
and the elpd numbers should not be trusted for ranking — the SMC
evidence `logZ` is the robust column here, and its Bayes-factor ranking
agrees with the AIC comparison above."""),
    (C, """\
N_PARTICLES = 128 if FAST else 1024
rows = []
for name, m, post in (('zero_i', zeroI, posterior),
                      ('one_i', oneI, posterior_onei),
                      ('two_i', twoI, posterior_twoi)):
    ev = m.model_evidence(particles=N_PARTICLES, print_report=False)
    ic = m.information_criteria(post, n_draws=200, print_report=False)
    rows.append({'model': name, 'logZ': ev['log_evidence'],
                 'elpd_loo': ic['loo']['elpd_loo'],
                 'p_loo': ic['loo']['p_loo'],
                 'bad_khat': ic['loo']['n_bad_khat']})
ev_table = pd.DataFrame(rows)
ev_table['log10_BayesFactor_vs_best'] = (
    (ev_table['logZ'] - ev_table['logZ'].max()) / np.log(10))
ev_table.sort_values('logZ', ascending=False).reset_index(drop=True)"""),
    (M, """\
# Sensitivity and identifiability

Which parameters actually drive the fit, and which are constrained by the
data? Global **Sobol indices** (variance decomposition over the priors —
the Saltelli design runs as one vmapped batch of solves) and a
**profile likelihood** for `phi` (re-optimizing all other parameters at
each fixed value — the standard identifiability analysis, all grid points
optimized simultaneously):"""),
    (C, """\
zeroI.sobol_sensitivity(samples=256 if FAST else 1024)"""),
    (C, """\
prof = zeroI.profile_likelihood('phi', starts=4, steps=200,
                                points=11 if FAST else 21)
ax = prof['profile'].plot(x='value', y='chi', logx=True, legend=False,
                          title='profile likelihood: phi')
ax.axhline(prof['threshold'], color='r', ls='--', lw=1)
plt.show()"""),
    (M, """\
# Joint fitting across experiments

Real studies repeat the experiment. `JointFit` ties mechanistic
constants across several datasets (each its own `ModelFramework`) and
samples the joint posterior with every experiment's solve fused into one
device program — here a second synthetic infection run with a 3x higher
viral inoculum, sharing `phi` and `beta` while each arm keeps its own
`mu`. Pooling both experiments tightens the shared parameters:"""),
    (C, """\
# synthesize the replicate from the zero_i best fit with V0 x3
zeroI.set_best_params(posterior)
rep = zeroI.copy()
best = {p: float(np.asarray(rep.parameters[p].val))
        for p in ('mu', 'phi', 'beta')}
from scipy.integrate import odeint as _odeint
rng2 = np.random.default_rng(7)
t2 = np.arange(0.0, 3.2, 0.2)
y2 = _odeint(lambda y, t: [best['mu']*y[0] - best['phi']*y[0]*y[1],
                           best['beta']*best['phi']*y[0]*y[1]
                           - best['phi']*y[0]*y[1]],
             [5.2e6, 3.3e7], t2)
rows2 = [{'organism': o, 'time': t,
          'abundance': max(v, 1.0) * np.exp(rng2.normal(0, 0.15)),
          'log_sigma': 0.15}
         for o, col in (('S', 0), ('V', 1)) for t, v in zip(t2, y2[:, col])]
df2 = pd.DataFrame(rows2)
zeroI2 = ModelFramework(ODE=zero_i, parameter_names=['mu', 'phi', 'beta'],
                        state_names=['S', 'V'], dataframe=df2,
                        mu=parameter(scipy.stats.lognorm, {'s': 3, 'scale': 1e-8}, random_seed=13),
                        phi=parameter(scipy.stats.lognorm, {'s': 3, 'scale': 1e-8}, random_seed=14),
                        beta=parameter(scipy.stats.lognorm, {'s': 1, 'scale': 20}, random_seed=15),
                        t_steps=288, random_seed=9)

jf = odelib_tpu.JointFit({'run1': zeroI, 'run2': zeroI2},
                         shared=['phi', 'beta'])
post_joint = jf.MCMC(chain_inits=N_CHAINS, iterations_per_chain=N_ITERS,
                     fitsurvey_samples=N_SURVEY, print_report=False)
import pandas as _pd
_pd.DataFrame({
    'phi std (single)': [np.log(posterior['phi']).std()],
    'phi std (joint)': [np.log(post_joint['phi']).std()],
    'beta std (single)': [np.log(posterior['beta']).std()],
    'beta std (joint)': [np.log(post_joint['beta']).std()]}).round(3)"""),
    (M, """\
# Partial pooling (hierarchical fitting)

Between sharing a parameter completely and letting every arm float
independently lies the hierarchical middle ground: `hierarchical=['mu']`
gives each run its own `mu` but ties them through a sampled lognormal
population law `log mu_k ~ Normal(log mu:pop_median, mu:pop_sigma)`.
Noisy arms shrink toward the population median; the `pop_sigma`
posterior *measures* the real between-run variability instead of
assuming it is zero (shared) or infinite (independent). Compare pooling
modes on predictive grounds with `jf.information_criteria` (higher
`elpd_loo` wins)."""),
    (C, """\
jf_h = odelib_tpu.JointFit({'run1': zeroI, 'run2': zeroI2},
                           shared=['phi', 'beta'], hierarchical=['mu'])
post_hier = jf_h.MCMC(chain_inits=N_CHAINS, iterations_per_chain=N_ITERS,
                      fitsurvey_samples=N_SURVEY, print_report=False)
post_hier[['run1:mu', 'run2:mu', 'mu:pop_median',
           'mu:pop_sigma']].describe().loc[['mean', '50%', 'std']].round(4)"""),
    (M, """\
# HMC on the correlated one_i posterior

The `one_i` fit couples four parameters; the full hard variant (adding the
three `<state>0` init-parameters, 7 correlated dimensions) is bench config
7b, where cross-chain-adapted HMC measures ~30x the random walk's
effective samples per second on a TPU v5e. Same call here on the 4-d fit:
the mass matrix adapts from the whole chain batch during burn-in, so there
is nothing to tune; compare per-parameter ESS and R-hat."""),
    (C, """\
post_hmc1 = oneI.MCMC(chain_inits=N_CHAINS, iterations_per_chain=N_ITERS,
                      fitsurvey_samples=N_SURVEY, sd_fitdistance=10.0,
                      sampler='hmc', use_priors=True,
                      burnin=N_ITERS // 4, print_report=False)
d_mh = oneI.diagnostics(posterior_onei).add_suffix(' (MH)')
d_h = oneI.diagnostics(post_hmc1).add_suffix(' (HMC)')
pd.concat([d_mh[['ess (MH)', 'rhat (MH)']],
           d_h[['ess (HMC)', 'rhat (HMC)']]], axis=1).round(2)"""),
    (M, """\
# Array-valued parameters

A parameter can be an ndarray; MCMC walks every non-zero entry (the
reference's `rwalk` convention). Here `mu` is a 2-vector: growth of `S`
and clearance of `V`. Array parameters run on both backends — the fused
TPU kernel gives each entry its own slot."""),
    (C, """\
def vec_model(y, t, ps):          # reference-style signature, numpy ok
    mu, phi, beta = ps            # mu is a (2,) array: index elementwise
    S, V = y[0], y[1]
    return np.array([mu[0]*S - phi*S*V,
                     beta*phi*S*V - phi*S*V - mu[1]*V])

vecM = ModelFramework(ODE=vec_model, parameter_names=['mu', 'phi', 'beta'],
                      state_names=['S', 'V'], dataframe=df,
                      mu=parameter(scipy.stats.lognorm,
                                   {'s': 0.5, 'scale': 0.4},
                                   init_value=np.array([0.5, 0.1]),
                                   random_seed=21),
                      phi=parameter(scipy.stats.lognorm,
                                    {'s': 1, 'scale': 1e-8},
                                    random_seed=22),
                      beta=parameter(scipy.stats.lognorm,
                                     {'s': 1, 'scale': 25}, random_seed=23),
                      t_steps=288, random_seed=11)
post_vec = vecM.MCMC(chain_inits=N_CHAINS, iterations_per_chain=N_ITERS,
                     fitsurvey_samples=N_SURVEY, sd_fitdistance=8.0,
                     print_report=False)
mu_draws = np.stack(post_vec['mu'].to_numpy())     # (rows, 2)
pd.DataFrame({'mu[0]': mu_draws[:, 0], 'mu[1]': mu_draws[:, 1],
              'phi': post_vec['phi']}).describe().loc[
    ['mean', '50%', 'std']].round(4)"""),
    (M, """\
# Variational inference (ADVI)

When the posterior is near-Gaussian in log-parameters, `fit_advi` skips
sampling entirely: it fits a full-covariance Gaussian to the posterior by
ELBO ascent through the differentiable solve and returns draws from it as
the same posterior DataFrame. Start it from a good point (`fit_map`, or the
MCMC best we already have) and sanity-check the moments against MCMC.

This posterior is deliberately a stress test for that Gaussian assumption:
`mu` is practically unidentified here (log-std > 3 — the data barely
constrain it), so the joint posterior is far from Gaussian, and ADVI's
mode-seeking KL direction is expected to *underdisperse* the correlated
`phi`/`beta` directions, while `mu`'s variational std keeps growing (a
likelihood-flat direction with no prior has unbounded ELBO entropy — the
MCMC "std" there is equally arbitrary, just the random walk's reach). That
is exactly what the table shows — use ADVI's cheap full-covariance summary
to scout, keep `use_priors=True` (the default) so priors regularize flat
directions, and reach for MCMC (or `bench/suite.py` config 10's moment
check) when tails matter. On identified, near-Gaussian posteriors ADVI
matches quadrature ground truth (`tests/test_advi.py`)."""),
    (C, """\
zeroI.set_best_params(posterior)
post_advi = zeroI.fit_advi(steps=200 if FAST else 2400,
                           draws=len(posterior), use_priors=False,
                           print_report=False)   # same target as the
                                                 # (reference-semantics) MCMC
pd.DataFrame({
    'log-mean (MCMC)': np.log(posterior[['mu', 'phi', 'beta']]).mean(),
    'log-mean (ADVI)': np.log(post_advi[['mu', 'phi', 'beta']]).mean(),
    'log-std (MCMC)': np.log(posterior[['mu', 'phi', 'beta']]).std(),
    'log-std (ADVI)': np.log(post_advi[['mu', 'phi', 'beta']]).std(),
}).round(3)"""),
    (M, """\
# Real-world data: counts, detection limits, doses, drivers

Experimental datasets routinely contain things the reference's lognormal
chi + bare `odeint` cannot express. All of these are declared once at
construction and compile into every sampler and both fused TPU kernels:

* **count data** — `obs_model='poisson'` / `'negbinom'` score raw counts
  (zeros welcome) instead of pretending `log(0)` is data;
* **detection limits** — a `censored` dataframe column switches those rows
  to the Tobit likelihood `-log F(limit)`;
* **repeated doses** — `dose_events=[(time, state, amount), ...]` applies
  bolus jumps (pre-dose trough reporting convention);
* **measured drivers** — `forcings={name: (times, values)}` hands the ODE
  function a 4th argument with the interpolated signal; in the fused
  kernels the lookups constant-fold, so drivers cost the hot loop nothing.

A one-compartment pharmacokinetic fit using the last three at once: three
daily 10 mg doses, clearance driven by a measured circadian temperature
rhythm, and trough samples below the assay's detection limit:"""),
    (C, """\
def pk(y, t, ps, u):                  # 4th argument: forcing signals
    return np.array([-ps[0] * u['T'] * y[0]])

temp_t = np.arange(0.0, 73.0, 6.0)    # measured temperature rhythm
temp_v = 1.0 + 0.3 * np.sin(2 * np.pi * temp_t / 24.0)
doses = [(0.0, 'A', 10.0), (24.0, 'A', 10.0), (48.0, 'A', 10.0)]

truth = ModelFramework(pk, ['A_k'], ['A'], A_k=0.15,
                       forcings={'T': (temp_t, temp_v)}, dose_events=doses,
                       t_end=72.0, t_steps=289)
traj = truth.integrate(as_dataframe=True)

rng = np.random.default_rng(7)
t_obs = np.arange(2.0, 72.0, 4.0)
true_conc = np.interp(t_obs, traj['time'], traj['A'])
meas = true_conc * np.exp(rng.normal(0, 0.15, len(t_obs)))
LOD = 0.5                              # assay detection limit
pk_df = pd.DataFrame({'organism': 'A', 'time': t_obs,
                      'abundance': np.maximum(meas, LOD),  # limit, not value
                      'log_sigma': 0.15, 'censored': meas < LOD})

pkM = ModelFramework(pk, ['A_k'], ['A'], dataframe=pk_df,
                     forcings={'T': (temp_t, temp_v)}, dose_events=doses,
                     t_end=72.0, t_steps=289,
                     A_k=parameter(scipy.stats.lognorm,
                                   {'s': 0.7, 'scale': 0.1},
                                   random_seed=31))
post_pk = pkM.MCMC(chain_inits=N_CHAINS,
                   iterations_per_chain=max(N_ITERS // 2, 50),
                   fitsurvey_samples=N_SURVEY, sd_fitdistance=8.0,
                   print_report=False)
print(f"{int(pk_df['censored'].sum())}/{len(pk_df)} observations below "
      f"the detection limit (Tobit-scored)")
print(f"posterior k = {post_pk['A_k'].median():.4f} "
      f"(+/- {post_pk['A_k'].std():.4f}), truth 0.15")"""),
    (M, """\
And the same infection experiment scored as what plaque/colony assays
actually produce — raw counts, with a negative-binomial likelihood
(`log_sigma` is ignored; the count model supplies the noise):"""),
    (C, """\
cdf = df.copy()
cdf['abundance'] = np.round(cdf['abundance'])   # counts
cntI = ModelFramework(ODE=zero_i, parameter_names=['mu', 'phi', 'beta'],
                      state_names=['S', 'V'], dataframe=cdf,
                      obs_model='negbinom', obs_param=5.0,
                      mu=parameter(scipy.stats.lognorm,
                                   {'s': 3, 'scale': 1e-8}, random_seed=41),
                      phi=parameter(scipy.stats.lognorm,
                                    {'s': 3, 'scale': 1e-8}, random_seed=42),
                      beta=parameter(scipy.stats.lognorm,
                                     {'s': 1, 'scale': 25}, random_seed=43),
                      t_steps=288, random_seed=0)
post_cnt = cntI.MCMC(chain_inits=N_CHAINS,
                     iterations_per_chain=max(N_ITERS // 2, 50),
                     fitsurvey_samples=N_SURVEY, sd_fitdistance=8.0,
                     print_report=False)
pd.DataFrame({'negbinom fit': post_cnt[['mu', 'phi', 'beta']].median(),
              'lognormal fit': posterior[['mu', 'phi', 'beta']].median()}
             ).T.round(10)"""),
    (M, """\
# Stochastic models (process noise)

Microbial dynamics are not deterministic: demographic noise and random
environments put stochasticity in the *dynamics*, not just the measurement.
Passing `diffusion=` (same signature convention as the ODE) makes the model
a state-space SDE `dy = f dt + g dW`. `simulate()` draws thousands of
sample paths as one vmapped device program, and `MCMC(sampler='pmmh')`
runs particle-marginal Metropolis–Hastings — every proposal scored by an
in-device bootstrap particle filter, an unbiased likelihood estimate, so
the chain targets the **exact** posterior under process noise. The
reference's bare `odeint` cannot express process noise at all."""),
    (C, """\
def growth(y, t, ps):                 # drift: exponential growth
    return np.array([ps[0] * y[0]])

def growth_noise(y, t, ps):           # multiplicative environment noise
    return np.array([ps[1] * y[0]])

truthS = ModelFramework(growth, ['r', 's'], ['N'], diffusion=growth_noise,
                        r=0.5, s=0.3, N=10.0, t_end=2.0, t_steps=49)
paths = truthS.simulate(n_paths=200, seed=0)
ax = None
for p, grp in paths.groupby('path#'):
    ax = grp.plot(x='time', y='N', ax=ax, legend=False, color='C0',
                  alpha=0.05, logy=True)
ax.set_ylabel('N (200 SDE sample paths)')
plt.show()"""),
    (C, """\
# observe ONE noisy realization, then recover the drift by PMMH
one = truthS.simulate(n_paths=1, seed=11)
t_obs = np.arange(1, 9) * 0.25
obsN = np.interp(t_obs, one['time'], one['N']) * \\
    np.exp(np.random.default_rng(5).normal(0, 0.1, len(t_obs)))
sde_df = pd.DataFrame({'organism': 'N', 'time': t_obs, 'abundance': obsN,
                       'log_sigma': 0.1})

sdeM = ModelFramework(growth, ['r', 's'], ['N'], diffusion=growth_noise,
                      dataframe=sde_df, t_steps=49,
                      r=parameter(scipy.stats.lognorm,
                                  {'s': 0.5, 'scale': 0.5}, random_seed=51),
                      s=parameter(scipy.stats.lognorm,
                                  {'s': 0.5, 'scale': 0.3}, random_seed=52),
                      N=10.0)
post_sde = sdeM.MCMC(chain_inits=max(N_CHAINS // 2, 4),
                     iterations_per_chain=max(N_ITERS // 2, 50),
                     fitsurvey_samples=N_SURVEY, sampler='pmmh',
                     n_particles=64, use_priors=True, print_report=False)
print(f"posterior r = {post_sde['r'].median():.3f} "
      f"(+/- {post_sde['r'].std():.3f}), truth 0.5  "
      f"[rsquared is NaN by design: no single trajectory exists]")"""),
    (M, """\
PMMH has exactly two tuning knobs, and the framework sets both for you:

* **How many particles?** The pseudo-marginal sweet spot puts the
  variance of the log-likelihood estimate near ~1.2 at the parameters
  the chain will visit — fewer particles stall chains on lucky
  over-estimates, more waste compute linearly. `tune_particles()`
  measures that variance with pilot filters and recommends a count.
* **How big a step?** Each chain Robbins–Monro-adapts a multiplier on
  `rwalk_std` toward 30% acceptance during burn-in (the pseudo-marginal
  optimum sits below the deterministic 0.23–0.44 band) and freezes it
  for the recorded phase. This is on by default; the acceptance column
  below shows where it landed.

On a TPU the whole PMMH loop — proposal, filter, resampling, accept —
runs as one fused Pallas kernel (862k chain-steps/s at 10k chains x
128 particles; `ops/pallas_pf.py`)."""),
    (C, """\
sdeM.set_best_params(post_sde)
k_rec, loglik_var = sdeM.tune_particles(pilot_particles=32, n_reps=24,
                                        sde_substeps=2)
acc = post_sde.groupby('chain#')['acceptance_ratio'].last().mean()
print(f"recorded-phase acceptance {acc:.2f} "
      f"(burn-in adaptation targets 0.30)")"""),
    (M, """\
# Scaling out

Everything above also runs (a) **fused on a real TPU chip** — `MCMC`
auto-selects the single-dispatch Pallas kernel, ~100M chain-steps/s at 10k
chains — and (b) **sharded over a TPU pod slice**: chains are pure data
parallelism over a 1-D `jax.sharding.Mesh`, RNG streams are keyed on global
chain index so results are bitwise-identical to the single-chip run. See
`docs/DESIGN.md` and `bench/suite.py`; `BASELINE.md` records the measured
speedups vs the reference (16×–120,000× depending on workload)."""),
]


def main():
    nb = {
        "cells": [
            {"cell_type": t, "metadata": {},
             "source": [ln + "\n" for ln in src.splitlines()][:-1]
             + [src.splitlines()[-1]],
             **({"outputs": [], "execution_count": None} if t == C else {})}
            for t, src in CELLS
        ],
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "Demo_InfectionStates.ipynb")
    with open(out, "w") as f:
        json.dump(nb, f, indent=1)
    print(f"wrote {out} ({len(CELLS)} cells)")


if __name__ == "__main__":
    main()
