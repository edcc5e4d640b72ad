"""Full benchmark suite: one JSON line per BASELINE.json config, every row
carrying a measured ``vs_baseline`` against the scipy/LSODA reference
implementation (denominators from BASELINE_MEASURED.json — regenerate with
``python bench/reference_baseline.py`` on the same host).

Honest timing on the remote TPU runtime: every timed region ends with a
1-element device->host fetch (``block_until_ready`` returns before remote
execution finishes), and kernel planners only ever see host arrays.

  1. fixed-param integrate + chi vs demo data (single solve latency)
  2. single-chain Metropolis-Hastings posterior (latency)
  3. theoretical parameter sweep, no data (Lotka-Volterra batch throughput)
  4. 10k vmapped MH chains (the bench.py headline, included for one report)
  4b. apples-to-apples headline: ADAPTIVE Dopri5 on the FULL 288-point grid
      (same algorithm family as the reference's LSODA full-grid solve, no
      compact-grid redesign win) — isolates hardware-vs-algorithm speedup
  5. stiff multi-state solve (Robertson batch) + 3-model AIC ranking

Run:  python bench/suite.py           (writes BENCH_SUITE.json at repo root)
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _sync(x):
    """True device sync: pull one element (see docs on axon async quirks)."""
    return float(np.asarray(x).ravel()[-1])


def _timed(fn, reps=5):
    fn()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _baselines():
    path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        d = json.load(f)
    return d.get("configs", {})


def config1_integrate_chi(spec, obs_host, times_fit, y0, base):
    """Fixed-parameter integrate + chi (reference call stack 3.2).

    Single-solve latency is the one regime where a device round-trip cannot
    win, which is exactly why the framework ships a native C++ core
    (odelib_tpu/native.py) — that is the path a latency-bound user takes, so
    it is the headline value; the TPU adaptive latency is reported alongside.
    """
    import jax
    import jax.numpy as jnp

    from odelib_tpu.data import obsdata_to_device
    from odelib_tpu.samplers.mh import survey

    obs = obsdata_to_device(obs_host, jnp.float32)
    theta = jnp.asarray([[0.9, 3.0e-8, 25.0]], jnp.float32)
    t = jnp.asarray(times_fit, jnp.float32)
    y = jnp.asarray(y0, jnp.float32)

    jitted = jax.jit(lambda th: survey(
        spec, obs, t, y, th, method="dopri5", rtol=1e-6, atol=1e-2,
        max_steps=2048))

    def run():
        _sync(jitted(theta)[-1:])

    med = _timed(run)

    from odelib_tpu.native import MassActionODE, Term
    sysm = MassActionODE(2, [
        Term(target=0, coeff=1.0, pidx=0, powers=(1, 0)),
        Term(target=0, coeff=-1.0, pidx=1, powers=(1, 1)),
        Term(target=1, coeff=1.0, pidx=2, powers=(1, 1)),
        Term(target=1, coeff=-1.0, pidx=1, powers=(1, 1)),
    ])
    p = np.array([0.9, 3.0e-8, 25.0 * 3.0e-8])
    ts_h = np.asarray(times_fit, float)
    y0_h = np.asarray(y0, float)

    def run_native():
        ys, ok = sysm.solve(p, y0_h, ts_h, rtol=1e-6, atol=1e-2)
        float(ys[-1, -1])

    med_native = _timed(run_native, reps=20)
    ref_ms = base.get("1", {}).get("value_ms")
    return {"config": 1, "metric": "integrate+chi latency (native C++ core)",
            "value": round(med_native * 1e3, 4), "unit": "ms",
            "tpu_adaptive_ms": round(med * 1e3, 3),
            "native_cpp_dopri5_ms": round(med_native * 1e3, 4),
            "baseline_lsoda_ms": ref_ms,
            "vs_baseline": round(ref_ms / (med_native * 1e3), 2)
            if ref_ms else None}


def config2_single_chain(spec, obs_host, times_fit, y0, base):
    """Single-chain MH, 1000 iterations (reference demo: ~0.6 s/chain)."""
    from odelib_tpu.ops.pallas_mh import metropolis_hastings_fused

    theta0 = np.array([[0.9, 3.0e-8, 25.0]], np.float32)

    def run():
        out = metropolis_hastings_fused(spec, obs_host, times_fit, y0,
                                        theta0, seed=0, nits=1000,
                                        substeps=4)
        _sync(out.chi[-1:, -1:])

    med = _timed(run)

    # r5 (VERDICT push item 6): the path a single-chain user actually
    # gets — MCMC route='auto' detects the tiny workload on a remote
    # accelerator and runs the SAME sampler on the host (XLA-CPU), below
    # the tunnel dispatch floor. Measured as the routed inner program
    # (steady state, post-compile).
    import jax
    import jax.numpy as jnp

    from odelib_tpu.data import obsdata_to_device
    from odelib_tpu.samplers import metropolis_hastings

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        obs_c = obsdata_to_device(obs_host, jnp.float32)
        t_c = jnp.asarray(times_fit, jnp.float32)
        y_c = jnp.asarray(y0, jnp.float32)
        th_c = jnp.asarray(theta0, jnp.float32)
        keys_c = jax.random.split(jax.random.PRNGKey(0), 1)

        def run_host():
            out = metropolis_hastings(
                spec, obs_c, t_c, y_c, th_c, keys_c, nits=1000,
                method="fixed_dopri5", substeps=4)
            float(np.asarray(out.chi)[-1, -1])

        med_host = _timed(run_host)

    ref_ms = base.get("2", {}).get("value_ms")
    value_ms = min(med, med_host) * 1e3
    return {"config": 2,
            "metric": "single-chain MH posterior, 1000 iterations "
                      "(route='auto' host path vs on-TPU fused)",
            "value": round(value_ms, 3), "unit": "ms",
            "tpu_fused_ms": round(med * 1e3, 3),
            "host_routed_ms": round(med_host * 1e3, 3),
            "routing_note": "MCMC route='auto' dispatches <= 4 chains "
                            "to XLA-CPU automatically (api.py "
                            "_route_to_host; tests/test_routing.py)",
            "baseline_lsoda_ms": ref_ms,
            "vs_baseline": round(ref_ms / value_ms, 2) if ref_ms
            else None}


def config3_theory_sweep(base):
    """Batched Lotka-Volterra equilibrium sweep (no data): trajectories/s."""
    import jax
    import jax.numpy as jnp

    from odelib_tpu.ops.integrate import odeint_grid

    def lv(t, y, ps):
        a, b, c, d = ps
        x, z = y
        return jnp.stack([a * x - b * x * z, c * b * x * z - d * z])

    N = 4096
    rng = np.random.default_rng(0)
    ps = jnp.asarray(np.array([1.1, 0.4, 0.1, 0.4])
                     * np.exp(rng.normal(0, 0.3, (N, 4))), jnp.float32)
    ts = jnp.asarray(np.linspace(0, 50, 64), jnp.float32)
    y0 = jnp.asarray([10.0, 5.0], jnp.float32)

    solve = jax.jit(jax.vmap(
        lambda p: odeint_grid(lv, y0, ts, p, rtol=1e-5, atol=1e-6,
                              max_steps=4096).ys[-1]))

    def run():
        _sync(solve(ps)[-1:, -1:])

    med = _timed(run)
    ref_rate = base.get("3", {}).get("value_traj_per_s")
    rate = N / med
    return {"config": 3,
            "metric": f"Lotka-Volterra sweep, {N} adaptive trajectories",
            "value": round(rate, 1), "unit": "trajectories/sec",
            "elapsed_ms": round(med * 1e3, 2),
            "baseline_traj_per_s": ref_rate,
            "vs_baseline": round(rate / ref_rate, 1) if ref_rate else None}


def config4_headline():
    """Delegates to bench.py (the driver-facing headline)."""
    import bench as B
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        B.main()
    line = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    d["config"] = 4
    return d


def config4b_full_grid_adaptive(base):
    """Apples-to-apples headline row (VERDICT r1 weak 4): same algorithm
    family as the reference — ADAPTIVE Dopri5 solving the FULL 288-point
    grid per MH iteration, no compact-grid/fixed-step redesign — so the
    split between hardware speedup and algorithmic redesign is on record.
    """
    import jax
    import jax.numpy as jnp

    import bench as B
    from odelib_tpu.data import (build_obsdata_host, obsdata_to_device,
                                 format_dataframe)
    from odelib_tpu.parallel import chain_mesh, pad_chains, shard_chain_batch
    from odelib_tpu.samplers import metropolis_hastings

    spec, obs_host, times_fit, y0_h = B.build_problem()
    # rebuild the FULL-grid observation data (bench.build_problem compacts)
    from odelib_tpu.data import load_demo_dataframe
    df = format_dataframe(load_demo_dataframe(host="S", virus="V"),
                          ("S", "V"))
    times_full = np.linspace(0.0, df["time"].max(), 288)
    obs_full_host, _ = build_obsdata_host(df, times_full, spec.post_snames)

    dtype = jnp.float32
    obs = obsdata_to_device(obs_full_host, dtype)
    times = jnp.asarray(times_full, dtype)
    y0 = jnp.asarray(y0_h, dtype)

    mesh = chain_mesh()
    NITS = 100
    C = pad_chains(10_000, mesh)
    rng = np.random.default_rng(0)
    theta0 = jnp.asarray(np.array([0.9, 3.0e-8, 25.0])
                         * np.exp(rng.normal(0, 0.05, (C, 3))), dtype)
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    theta0, keys = shard_chain_batch((theta0, keys), mesh)
    kw = dict(nits=NITS, method="dopri5", rtol=1e-5, atol=1e0,
              max_steps=1024)

    def run():
        out = metropolis_hastings(spec, obs, times, y0, theta0, keys, **kw)
        _sync(out.chi[-1:, -1:])

    med = _timed(run, reps=3)
    rate = C * (NITS - 1) / med
    ref_rate = base.get("4", {}).get("value")
    return {"config": "4b",
            "metric": "MCMC chain-steps/sec at 10k chains, ADAPTIVE dopri5 "
                      "on the FULL 288-point grid (apples-to-apples with "
                      "the reference's per-iteration LSODA solve)",
            "value": round(rate, 1), "unit": "chain-steps/sec",
            "elapsed_s": round(med, 3), "iterations": NITS,
            "baseline_steps_per_s": ref_rate,
            "vs_baseline": round(rate / ref_rate, 1) if ref_rate else None}


def config5_stiff_and_aic(base):
    """Stiff batch (Robertson) + the 3-model AIC comparison.

    Headline: the batched stiff FAST path — fixed-step Kvaerno3 ESDIRK
    (odeint_fixed, chord-Newton in registers) on the geomspace output grid,
    which tracks the problem's time scales with zero per-lane divergence.
    Accuracy is verified in-bench against high-accuracy LSODA (the adaptive
    batch, serialized by its worst lane, is reported alongside).
    """
    import jax
    import jax.numpy as jnp

    from odelib_tpu.ops.integrate import odeint_fixed, odeint_grid

    def rober(t, y, k):
        k1, k2, k3 = k
        y1, y2, y3 = y
        return jnp.stack([-k1 * y1 + k3 * y2 * y3,
                          k1 * y1 - k2 * y2 * y2 - k3 * y2 * y3,
                          k2 * y2 * y2])

    N = 4096
    rng = np.random.default_rng(0)
    ks = jnp.asarray(np.array([0.04, 3e7, 1e4])
                     * np.exp(rng.normal(0, 0.1, (N, 3))), jnp.float32)
    ts_np = np.concatenate([[0.0], np.geomspace(1e-5, 1e3, 31)])
    ts = jnp.asarray(ts_np, jnp.float32)
    y0 = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

    solve_fixed = jax.jit(jax.vmap(
        lambda k: odeint_fixed(rober, y0, ts, k, substeps=8,
                               method="kvaerno3").ys[-1]))
    solve_adapt = jax.jit(jax.vmap(
        lambda k: odeint_grid(rober, y0, ts, k, rtol=1e-5, atol=1e-8,
                              method="kvaerno5", max_steps=4096).ys[-1]))

    med = _timed(lambda: _sync(solve_fixed(ks)[-1:, -1:]), reps=3)
    med_adapt = _timed(lambda: _sync(solve_adapt(ks)[-1:, -1:]), reps=3)

    # honesty gate: the fast path must actually be accurate
    from scipy.integrate import odeint as scipy_odeint
    ref = scipy_odeint(
        lambda y, t, kk: np.array(
            [-kk[0] * y[0] + kk[2] * y[1] * y[2],
             kk[0] * y[0] - kk[1] * y[1] ** 2 - kk[2] * y[1] * y[2],
             kk[1] * y[1] ** 2]),
        [1.0, 0.0, 0.0], ts_np, args=((0.04, 3e7, 1e4),),
        rtol=1e-10, atol=1e-14)[-1]
    got = np.asarray(solve_fixed(jnp.asarray(
        np.tile([0.04, 3e7, 1e4], (N, 1)), jnp.float32)))[0]
    max_rel = float(np.max(np.abs(got - ref) / np.maximum(np.abs(ref),
                                                          1e-10)))
    assert max_rel < 1e-3, f"stiff fast path inaccurate: {max_rel:.2e}"

    # --- r5 (VERDICT push item 2a): AUTO-CALIBRATED stiff fast path ---
    # the user hands a NAIVE uniform grid; one adaptive Kvaerno5 pilot
    # (8 lanes) derives the graded grid + per-interval substep schedule
    # (ops/schedule.auto_stiff_grid) and the whole batch runs fixed-step.
    from odelib_tpu.ops.integrate import odeint_grid_batch
    from odelib_tpu.ops.schedule import auto_stiff_grid, schedule_cost

    times_naive = np.linspace(0.0, 1e3, 32)
    t_cal0 = time.perf_counter()
    grid, sched, oidx = auto_stiff_grid(
        rober, y0, times_naive, ks[:8], rtol=1e-5, atol=1e-8,
        max_steps=4096)
    cal_s = time.perf_counter() - t_cal0
    grid_d = jnp.asarray(grid, jnp.float32)
    solve_auto = jax.jit(jax.vmap(
        lambda k: odeint_fixed(rober, y0, grid_d, k, substeps=sched,
                               method="kvaerno3").ys[-1]))
    med_auto = _timed(lambda: _sync(solve_auto(ks)[-1:, -1:]), reps=3)
    got_a = np.asarray(solve_auto(jnp.asarray(
        np.tile([0.04, 3e7, 1e4], (N, 1)), jnp.float32)))[0]
    ref_a = scipy_odeint(
        lambda y, t, kk: np.array(
            [-kk[0] * y[0] + kk[2] * y[1] * y[2],
             kk[0] * y[0] - kk[1] * y[1] ** 2 - kk[2] * y[1] * y[2],
             kk[1] * y[1] ** 2]),
        [1.0, 0.0, 0.0], times_naive, args=((0.04, 3e7, 1e4),),
        rtol=1e-10, atol=1e-14, mxstep=1000000)[-1]
    max_rel_a = float(np.max(np.abs(got_a - ref_a)
                             / np.maximum(np.abs(ref_a), 1e-10)))
    assert max_rel_a < 1e-3, f"auto-calibrated path inaccurate: {max_rel_a:.2e}"

    # --- r5 (push item 2b): two-pass partitioned batched 'auto' ---
    # every Robertson lane is stiff, so the ORACLE method choice is
    # all-Kvaerno5; auto must stay within ~1.2x of it (the dopri5 probe
    # is the only overhead; vmapped lax.cond 'auto' pays ~2x).
    y0_np = np.array([1.0, 0.0, 0.0], np.float32)

    def run_batch_auto():
        sol = odeint_grid_batch(rober, y0_np, times_naive, ks,
                                rtol=1e-5, atol=1e-8, max_steps=4096)
        _sync(sol.ys[-1:, -1:])
        return sol

    sol_a = run_batch_auto()
    assert float(np.asarray(sol_a.ok).mean()) > 0.99
    med_2pass = _timed(lambda: run_batch_auto(), reps=3)
    solve_oracle = jax.jit(jax.vmap(
        lambda k: odeint_grid(rober, jnp.asarray(y0_np), jnp.asarray(
            times_naive, jnp.float32), k, rtol=1e-5, atol=1e-8,
            method="kvaerno5", max_steps=4096).ys[-1]))
    med_oracle = _timed(lambda: _sync(solve_oracle(ks)[-1:, -1:]), reps=3)

    rate = N / med
    ref_rate = base.get("5", {}).get("value_solves_per_s")
    return {"config": 5,
            "metric": f"stiff Robertson batch ({N} fixed-Kvaerno3 ESDIRK "
                      "solves, geomspace grid)",
            "value": round(rate, 1), "unit": "solves/sec",
            "elapsed_ms": round(med * 1e3, 2),
            "final_state_max_rel_err_vs_lsoda": round(max_rel, 8),
            "adaptive_kvaerno5_solves_per_s": round(N / med_adapt, 1),
            "baseline_solves_per_s": ref_rate,
            "vs_baseline": round(rate / ref_rate, 1) if ref_rate else None,
            "auto_calibrated": {
                "note": "NO hand-chosen grid: naive linspace(0,1e3,32) "
                        "in, pilot-derived graded grid + per-interval "
                        "substeps out (ops/schedule.auto_stiff_grid)",
                "solves_per_s": round(N / med_auto, 1),
                "x_over_adaptive_batch": round(med_adapt / med_auto, 1),
                "grid_nodes": int(len(grid)),
                "schedule_rk_steps": schedule_cost(sched),
                "one_time_calibration_s": round(cal_s, 2),
                "final_state_max_rel_err_vs_lsoda": round(max_rel_a, 8)},
            "batched_auto_two_pass": {
                "note": "odeint_grid_batch: dopri5 probe -> compact "
                        "failed lanes -> Kvaerno5; all lanes stiff here "
                        "so the oracle is all-Kvaerno5",
                "elapsed_ms": round(med_2pass * 1e3, 2),
                "oracle_all_kvaerno5_ms": round(med_oracle * 1e3, 2),
                "overhead_vs_oracle": round(med_2pass / med_oracle, 3)},
            "aic_ranking": "see examples/demo_infection_states.py"}


def config6_stiff_mcmc(base):
    """Fused STIFF MCMC (fixed Kvaerno3 ESDIRK in-kernel) — the round-1
    review's slow-path gap: stiff models used to fall back to the XLA
    adaptive sampler (~8M steps/s); now they keep a single-dispatch fused
    path (target was >= 30M chain-steps/s)."""
    import jax.numpy as jnp

    import bench as B
    from odelib_tpu.ops.pallas_mh import metropolis_hastings_fused

    spec, obs_host, times_fit, y0 = B.build_problem()
    C, NITS = 10240, 1000
    rng = np.random.default_rng(0)
    theta0 = np.asarray(np.array([0.9, 3.0e-8, 25.0])
                        * np.exp(rng.normal(0, 0.05, (C, 3))), np.float32)
    kw = dict(nits=NITS, substeps=4, stepper="kvaerno3")

    def run():
        out = metropolis_hastings_fused(spec, obs_host, times_fit, y0,
                                        theta0, seed=0, **kw)
        _sync(out.chi[-1:, -1:])
        return out

    out = run()
    med = _timed(lambda: run(), reps=3)
    rate = C * (NITS - 1) / med
    ref_rate = base.get("4", {}).get("value")
    return {"config": 6,
            "metric": "fused STIFF MCMC chain-steps/sec at 10k chains "
                      "(fixed Kvaerno3 ESDIRK, chord-Newton in-kernel)",
            "value": round(rate, 1), "unit": "chain-steps/sec",
            "elapsed_s": round(med, 4),
            "mean_acceptance": round(float(np.mean(np.asarray(
                out.acceptance_ratio)[:, -1])), 3),
            "finite_chi_frac": round(float(np.mean(np.isfinite(
                np.asarray(out.chi)))), 4),
            "baseline_steps_per_s": ref_rate,
            "vs_baseline": round(rate / ref_rate, 1) if ref_rate else None}


def config7_hmc_ess(base):
    """Gradient-based HMC vs random-walk MH at EQUAL wall-clock: effective
    samples per second on the demo posterior. HMC is a capability class the
    reference cannot reach (no gradients through Fortran odeint); the fair
    economics question is whether its costlier iterations (n_leapfrog
    gradient solves each) buy proportionally more mixing. The binding
    constraint for downstream use is the SLOWEST-mixing parameter, so that
    is the headline (min-over-parameters ESS/sec). Both samplers run
    prior-aware with the demo's own lognormal priors: the likelihood-only
    target is improper along ``mu`` (the data barely constrain it from
    below), so an efficient sampler correctly diffuses mu toward 0 until
    f32 underflow — ESS of an improper target is not a meaningful number
    for either sampler."""
    import jax
    import jax.numpy as jnp

    import bench as B
    from odelib_tpu.data import obsdata_to_device
    from odelib_tpu.distributions import LogNormal
    from odelib_tpu.samplers import hamiltonian_mc, metropolis_hastings
    from odelib_tpu.utils.diagnostics import effective_sample_size

    spec, obs_host, times_fit, y0 = B.build_problem()
    obs = obsdata_to_device(obs_host, jnp.float32)
    times_d = jnp.asarray(times_fit, jnp.float32)
    y0_d = jnp.asarray(y0, jnp.float32)

    # demo cell-9 priors (examples/demo_infection_states.py:85-86)
    pri = (LogNormal(s=3.0, scale=1e-8), LogNormal(s=3.0, scale=1e-8),
           LogNormal(s=1.0, scale=25.0))

    def prior_logpdf(theta):
        return sum(d.logpdf(theta[..., i]) for i, d in enumerate(pri))

    on_tpu = jax.default_backend() not in ("cpu",)
    C = 1024 if on_tpu else 64
    NITS_H, NITS_M = (256, 2048) if on_tpu else (40, 320)
    rng = np.random.default_rng(0)
    th0 = jnp.asarray(np.array([0.9, 3.0e-8, 25.0])
                      * np.exp(rng.normal(0, 0.05, (C, 3))), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), C)

    def run_hmc():
        out = hamiltonian_mc(spec, obs, times_d, y0_d, th0, keys,
                             nits=NITS_H, burnin=NITS_H // 2, n_leapfrog=8,
                             step_size=0.02, substeps=4,
                             prior_logpdf=prior_logpdf, use_priors=True)
        _sync(out.chi[-1:, -1:])
        return out

    def run_mh():
        out = metropolis_hastings(spec, obs, times_d, y0_d, th0, keys,
                                  nits=NITS_M, burnin=NITS_M // 2,
                                  method="fixed_dopri5", substeps=4,
                                  prior_logpdf=prior_logpdf, use_priors=True)
        _sync(out.chi[-1:, -1:])
        return out

    out_h = run_hmc()
    t_h = _timed(run_hmc, reps=3)
    out_m = run_mh()
    t_m = _timed(run_mh, reps=3)

    def min_ess(out):
        th = np.log(np.asarray(out.theta))  # (C, R, P)
        return min(effective_sample_size(th[:, :, p])
                   for p in range(th.shape[-1]))

    ess_h, ess_m = min_ess(out_h), min_ess(out_m)
    hmc_rate, mh_rate = ess_h / t_h, ess_m / t_m
    return {"config": 7,
            "metric": "HMC vs random-walk MH: min-over-parameters effective "
                      "samples/sec on the demo posterior (prior-aware, "
                      "XLA backend)",
            "value": round(hmc_rate, 1), "unit": "ESS/sec (HMC)",
            "mh_ess_per_s": round(mh_rate, 1),
            "hmc_over_mh": round(hmc_rate / mh_rate, 2) if mh_rate else None,
            "hmc": {"chains": C, "nits": NITS_H, "elapsed_s": round(t_h, 3),
                    "min_ess": round(ess_h, 1),
                    "mean_acceptance": round(float(np.mean(np.asarray(
                        out_h.acceptance_ratio)[:, -1])), 3)},
            "mh": {"chains": C, "nits": NITS_M, "elapsed_s": round(t_m, 3),
                   "min_ess": round(ess_m, 1),
                   "mean_acceptance": round(float(np.mean(np.asarray(
                       out_m.acceptance_ratio)[:, -1])), 3)},
            "note": "capability row - the reference has no gradient-based "
                    "sampler at any speed; vs_baseline not defined",
            "vs_baseline": None}


def config7b_hmc_hard(base):
    """HMC vs MH where gradients should pay: the demo's own hardest shape
    (`one_i` + summation H=S+I1 + all three `<sname>0` init-parameters =
    7 correlated dimensions, demo cell 29) with prior-aware acceptance
    (the init-parameter dims are likelihood-flat, so the posterior is
    only proper with priors — both samplers get them). Settings are each
    sampler's best: MH at the reference's rwalk_std=0.05; HMC at the
    fixed-length optimum target_accept=0.65, n_leapfrog=4, cross-chain
    mass adaptation, burnin=nits//4 (VERDICT r3 task 1)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hmc_hard import build_hard_problem, seed_chains

    from odelib_tpu.samplers import hamiltonian_mc, metropolis_hastings
    from odelib_tpu.utils.diagnostics import effective_sample_size

    fw = build_hard_problem()
    on_tpu = jax.default_backend() not in ("cpu",)
    C = 512 if on_tpu else 32
    NITS_H, NITS_M = (8192, 131072) if on_tpu else (96, 512)
    th0 = jnp.asarray(seed_chains(fw, C))
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    spec, obs = fw._spec, fw._obsdata_fit
    times_d = jnp.asarray(fw._times_fit, jnp.float32)
    y0_d = jnp.asarray(fw.get_inits(), jnp.float32)
    pn = fw.get_pnames()
    plp = fw._prior_logpdf_for(tuple(fw.parameters[p].jdist for p in pn))

    def run_hmc():
        out = hamiltonian_mc(spec, obs, times_d, y0_d, th0, keys,
                             nits=NITS_H, burnin=NITS_H // 4,
                             n_leapfrog=4, step_size=0.02,
                             target_accept=0.65, substeps=4,
                             prior_logpdf=plp, use_priors=True)
        _sync(out.chi[-1:, -1:])
        return out

    def run_mh():
        out = metropolis_hastings(spec, obs, times_d, y0_d, th0, keys,
                                  nits=NITS_M, burnin=NITS_M // 2,
                                  method="fixed_dopri5", substeps=4,
                                  prior_logpdf=plp, use_priors=True)
        _sync(out.chi[-1:, -1:])
        return out

    def run_chees():
        out = hamiltonian_mc(spec, obs, times_d, y0_d, th0, keys,
                             nits=NITS_H, burnin=NITS_H // 4,
                             n_leapfrog=4, step_size=0.02,
                             target_accept=0.65, substeps=4,
                             path_adapt=True, max_leapfrog=64,
                             prior_logpdf=plp, use_priors=True,
                             chunk_iters=1024)
        _sync(out.chi[-1:, -1:])
        return out

    def run_dense():
        out = hamiltonian_mc(spec, obs, times_d, y0_d, th0, keys,
                             nits=NITS_H, burnin=NITS_H // 4,
                             n_leapfrog=4, step_size=0.02,
                             target_accept=0.65, substeps=4,
                             dense_mass=True,
                             prior_logpdf=plp, use_priors=True)
        _sync(out.chi[-1:, -1:])
        return out

    out_h = run_hmc()
    t_h = _timed(run_hmc, reps=3)
    out_c = run_chees()
    t_c = _timed(run_chees, reps=3)
    out_d = run_dense()
    t_d = _timed(run_dense, reps=3)
    out_m = run_mh()
    t_m = _timed(run_mh, reps=3)

    def stats(out):
        th = np.log(np.asarray(out.theta))
        ess = min(effective_sample_size(th[:, :, p])
                  for p in range(th.shape[-1]))
        h = th.shape[1] // 2
        # split R-hat per parameter, worst case
        rhats = []
        for p in range(th.shape[-1]):
            x = np.concatenate([th[:, :h, p], th[:, h:2 * h, p]], 0)
            Wp = x.var(axis=1, ddof=1).mean()
            Bp = x.mean(axis=1).var(ddof=1) * h
            rhats.append(float(np.sqrt(((h - 1) / h * Wp + Bp / h) / Wp)))
        return ess, max(rhats)

    ess_h, rh_h = stats(out_h)
    ess_c, rh_c = stats(out_c)
    ess_d, rh_d = stats(out_d)
    ess_m, rh_m = stats(out_m)
    hmc_rate, mh_rate = ess_h / t_h, ess_m / t_m
    chees_rate = ess_c / t_c
    dense_rate = ess_d / t_d
    from hmc_hard import demo_data_source
    return {"config": "7b",
            "metric": "HMC vs random-walk MH on the HARD demo posterior "
                      "(one_i + summation + init-params, 7 correlated "
                      "dims, prior-aware): min-over-parameters effective "
                      "samples/sec",
            "dataset": demo_data_source(),
            "dataset_note": "runs on the committed synthetic dataset by "
                            "default (r5 regeneration made the one_i "
                            "posterior identifiable: nonzero I10, "
                            "lam=1.2 latent period resolvable on the "
                            "0.2-day grid); ODELIB_DEMODATA overrides "
                            "with e.g. the reference's real lab data",
            "value": round(hmc_rate, 1), "unit": "ESS/sec (HMC)",
            "mh_ess_per_s": round(mh_rate, 1),
            "hmc_over_mh": round(hmc_rate / mh_rate, 2) if mh_rate else None,
            "hmc": {"chains": C, "nits": NITS_H, "elapsed_s": round(t_h, 3),
                    "min_ess": round(ess_h, 1), "max_rhat": round(rh_h, 3),
                    "n_leapfrog": 4, "target_accept": 0.65},
            "chees": {"chains": C, "nits": NITS_H,
                      "elapsed_s": round(t_c, 3),
                      "min_ess": round(ess_c, 1),
                      "max_rhat": round(rh_c, 3),
                      "ess_per_s": round(chees_rate, 1),
                      "over_fixed_hmc": round(chees_rate / hmc_rate, 2)
                      if hmc_rate else None,
                      "note": "path_adapt=True - ChEES-adapted trajectory "
                              "length, no hand-tuned n_leapfrog"},
            "dense": {"chains": C, "nits": NITS_H,
                      "elapsed_s": round(t_d, 3),
                      "min_ess": round(ess_d, 1),
                      "max_rhat": round(rh_d, 3),
                      "ess_per_s": round(dense_rate, 1),
                      "over_diag_hmc": round(dense_rate / hmc_rate, 2)
                      if hmc_rate else None,
                      "note": "dense_mass=True - full cross-chain "
                              "covariance metric (Cholesky per warmup "
                              "refresh)"},
            "mh": {"chains": C, "nits": NITS_M, "elapsed_s": round(t_m, 3),
                   "min_ess": round(ess_m, 1), "max_rhat": round(rh_m, 3),
                   "rwalk_std": 0.05},
            "note": "capability row - the reference has no gradient-based "
                    "sampler at any speed; vs_baseline not defined. "
                    "Companion to config 7: on the tiny 3-param posterior "
                    "(config 7) raw MH iteration rate wins; here the "
                    "7-dim correlated geometry flips it",
            "vs_baseline": None}


def config9_joint_fused(base):
    """Fused multi-experiment (JointFit) throughput: K=2 copies of the
    demo problem scored back-to-back inside one kernel (ops/pallas_joint).
    Ideal joint cost is K single-experiment solves per iteration, so the
    honest figure of merit is joint rate / (single fused rate / K) —
    'fraction of ideal' (VERDICT r3 task 3: within ~1/K of config 4)."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    import bench as B
    from odelib_tpu.ops.pallas_joint import joint_metropolis_hastings_fused

    spec, obs_host, times_fit, y0 = B.build_problem()
    on_tpu = jax.default_backend() not in ("cpu",)
    K = 2
    specs = (spec,) * K
    idxs = (tuple(range(3)),) * K          # fully-shared joint theta, D=3
    # the second experiment must be GENUINELY distinct: with identical
    # (y0, grid, theta) the two unrolled solves are the same expression
    # and the compiler CSEs them, making the "joint" kernel cost one
    # experiment. Perturb both the observations and the initial state so
    # the K trajectories differ.
    rng_b = np.random.default_rng(7)
    obs_b = obs_host._replace(
        log_abundance=np.asarray(obs_host.log_abundance)
        + rng_b.normal(0, 0.1, len(np.asarray(obs_host.log_abundance))))
    obs_l = (obs_host, obs_b)
    times_l = (times_fit,) * K
    y0_l = (y0, np.asarray(y0) * 1.13)
    C, NITS = (10000, 2000) if on_tpu else (256, 12)
    rng = np.random.default_rng(0)
    th0 = (np.array([0.6, 2.4e-8, 24.0])
           * np.exp(rng.normal(0, 0.05, (C, 3)))).astype(np.float32)
    kw = dict(seed=0, nits=NITS, burnin=NITS // 2, substeps_list=[4] * K,
              interpret=not on_tpu,
              tile_chains=None if on_tpu else 128)

    def run():
        out = joint_metropolis_hastings_fused(
            specs, idxs, obs_l, times_l, y0_l, th0, **kw)
        _sync(out.chi[-1:, -1:])
        return out

    out = run()
    med = _timed(run, reps=3)
    rate = C * (NITS - 1) / med

    # measure the single-experiment fused rate on the SAME shapes so the
    # ideal-cost denominator is apples-to-apples
    from odelib_tpu.ops.pallas_mh import metropolis_hastings_fused

    def run_single():
        o = metropolis_hastings_fused(
            spec, obs_host, times_fit, y0, th0, seed=0, nits=NITS,
            burnin=NITS // 2, substeps=4, interpret=not on_tpu,
            tile_chains=None if on_tpu else 128)
        _sync(o.chi[-1:, -1:])
        return o

    run_single()
    med_single = _timed(run_single, reps=3)
    single_rate = C * (NITS - 1) / med_single
    frac_ideal = rate / (single_rate / K)
    return {"config": 9,
            "metric": "fused JOINT (K=2 experiments) MCMC chain-steps/sec "
                      "at 10k chains",
            "value": round(rate, 1), "unit": "joint chain-steps/sec",
            "elapsed_s": round(med, 4), "k_experiments": K,
            "mean_acceptance": round(float(np.mean(np.asarray(
                out.acceptance_ratio)[:, -1])), 3),
            "finite_chi_frac": round(float(np.mean(np.isfinite(
                np.asarray(out.chi)))), 4),
            "single_experiment_rate": round(single_rate, 1),
            "fraction_of_ideal": round(frac_ideal, 3),
            "note": "ideal = single-experiment fused rate / K; "
                    "fraction_of_ideal ~ 1.0 means zero joint overhead",
            "vs_baseline": None}


def config8_fused_ensemble(base):
    """Fused affine-invariant ensemble vs fused random-walk MH at equal
    device budget: raw chain-steps/sec (the kernels should be at parity —
    two half-tile solves == one full-tile solve) and min-over-parameters
    ESS/sec on the demo posterior, where the phi-beta ridge (corr ~ -0.9)
    is exactly the geometry stretch moves are invariant to."""
    import jax

    import bench as B
    from odelib_tpu.ops.pallas_mh import (ensemble_fused,
                                          metropolis_hastings_fused)
    from odelib_tpu.utils.diagnostics import effective_sample_size

    if jax.default_backend() == "cpu":
        return {"config": 8, "metric": "fused ensemble (TPU only)",
                "value": None, "skipped": "no TPU", "vs_baseline": None}
    spec, obs_host, times_fit, y0 = B.build_problem()
    C, NITS = 10240, 1000
    rng = np.random.default_rng(0)
    th0 = np.asarray(np.array([0.9, 3.0e-8, 25.0])
                     * np.exp(rng.normal(0, 0.05, (C, 3))), np.float32)

    runs = {}
    for name, fn in (("ensemble", ensemble_fused),
                     ("mh", metropolis_hastings_fused)):
        def run(fn=fn):
            out = fn(spec, obs_host, times_fit, y0, th0, seed=1,
                     nits=NITS, burnin=NITS // 2, substeps=4)
            _sync(out.chi[-1:, -1:])
            return out
        out = run()
        t = _timed(run, reps=3)
        # ESS over the identified, strongly-correlated (phi, beta) ridge —
        # the geometry this row probes. mu is practically unidentified
        # below ~0.1 (flat chi), which the ensemble's affine moves actually
        # discover (walkers reach the f32-underflow floor, recorded as 0)
        # while the 0.05-std random walk never diffuses there; comparing
        # "ESS" on a direction one sampler hasn't explored is meaningless.
        th = np.log(np.maximum(np.asarray(out.theta), 1e-37))
        ess = min(effective_sample_size(th[:, :, p]) for p in (1, 2))
        runs[name] = {
            "elapsed_s": round(t, 3),
            "chain_steps_per_s": round(C * (NITS - 1) / t, 0),
            "min_ess": round(ess, 1), "ess_per_s": round(ess / t, 1),
            "mean_acceptance": round(float(np.mean(np.asarray(
                out.acceptance_ratio)[:, -1])), 3)}
    e, m = runs["ensemble"], runs["mh"]
    return {"config": 8,
            "metric": "fused ensemble (stretch moves) vs fused MH, 10k "
                      "walkers x 1000 iters on the demo posterior",
            "value": e["chain_steps_per_s"], "unit": "chain-steps/sec",
            "ensemble": e, "mh": m,
            "steps_parity": round(e["chain_steps_per_s"]
                                  / m["chain_steps_per_s"], 3),
            "ess_ratio_ensemble_over_mh": round(
                e["ess_per_s"] / m["ess_per_s"], 2) if m["ess_per_s"]
            else None,
            "note": "capability row - the reference has no ensemble "
                    "sampler; vs_baseline not defined",
            "vs_baseline": None}


def config15_fused_pt(base):
    """Fused Pallas parallel tempering: one dispatch holds the whole
    K-rung ladder in VMEM scratch, swaps are elementwise plane exchanges
    (ops/pallas_pt.py). Two claims measured: (a) replica-step throughput
    at parity with the fused MH kernel (K solves per iteration cost K MH
    iterations — nothing lost to the ladder), (b) a large multiple over
    the XLA ladder sampler. NOTE the XLA comparison runs at a SMALLER
    shape (1024 chains x 200 iters vs the kernel's 10240 x 500 — the
    full shape is infeasibly slow for the XLA ladder to rep 3x), so the
    fused_over_xla multiple is per-chain-step and shape-sensitive: the
    small XLA batch may not fully saturate the device."""
    import jax

    import bench as B
    from odelib_tpu.ops.pallas_mh import metropolis_hastings_fused
    from odelib_tpu.ops.pallas_pt import parallel_tempering_fused

    if jax.default_backend() == "cpu":
        return {"config": 15, "metric": "fused parallel tempering "
                "(TPU only)", "value": None, "skipped": "no TPU",
                "vs_baseline": None}
    spec, obs_host, times_fit, y0 = B.build_problem()
    TEMPS = (1.0, 2.0, 4.0, 8.0)
    K = len(TEMPS)
    C, NITS = 10240, 500
    rng = np.random.default_rng(0)
    th0 = np.asarray(np.array([0.9, 3.0e-8, 25.0])
                     * np.exp(rng.normal(0, 0.05, (C, 3))), np.float32)

    def run_pt():
        out, sw = parallel_tempering_fused(
            spec, obs_host, times_fit, y0, th0, seed=1,
            temperatures=TEMPS, nits=NITS, burnin=NITS // 2, substeps=4)
        _sync(out.chi[-1:, -1:])
        return out, sw

    out, sw = run_pt()
    t_pt = _timed(run_pt, reps=3)
    replica_rate = C * K * (NITS - 1) / t_pt
    cold_rate = C * (NITS - 1) / t_pt

    def run_mh():
        o = metropolis_hastings_fused(
            spec, obs_host, times_fit, y0, th0, seed=1,
            nits=NITS, burnin=NITS // 2, substeps=4)
        _sync(o.chi[-1:, -1:])
        return o

    run_mh()
    t_mh = _timed(run_mh, reps=3)
    mh_rate = C * (NITS - 1) / t_mh

    # XLA ladder sampler at a feasible shape; rates are per cold chain
    import jax.numpy as jnp
    from odelib_tpu.data import obsdata_to_device
    from odelib_tpu.samplers import parallel_tempering

    obs = obsdata_to_device(obs_host, jnp.float32)
    Cx, NX = 1024, 200
    keys = jax.random.split(jax.random.PRNGKey(1), Cx)
    thx = jnp.asarray(th0[:Cx])

    def run_xla():
        o, _ = parallel_tempering(
            spec, obs, jnp.asarray(times_fit, jnp.float32),
            jnp.asarray(y0, jnp.float32), thx, keys,
            temperatures=TEMPS, nits=NX, burnin=NX // 2,
            method="fixed_dopri5", substeps=4)
        _sync(o.chi[-1:, -1:])

    run_xla()
    t_xla = _timed(run_xla, reps=3)
    xla_cold_rate = Cx * (NX - 1) / t_xla

    return {"config": 15,
            "metric": "fused parallel tempering, 10,240 ladders x 4 "
                      "temperatures x 500 iters on the demo posterior",
            "value": round(cold_rate, 0), "unit": "cold-chain-steps/sec",
            "replica_steps_per_s": round(replica_rate, 0),
            "fused_mh_steps_per_s": round(mh_rate, 0),
            "ladder_parity": round(replica_rate / mh_rate, 3),
            "elapsed_s": round(t_pt, 3),
            "mean_cold_swap_acceptance": round(
                float(np.mean(np.asarray(sw))), 3),
            "xla_cold_steps_per_s": round(xla_cold_rate, 0),
            "fused_over_xla": round(cold_rate / xla_cold_rate, 1),
            "note": "capability row - the reference has no tempering; "
                    "ladder_parity >= 1 means the ladder costs no more "
                    "than its K solves (measured ~2.4x: only the cold "
                    "rung writes records, so per-replica HBM record "
                    "traffic drops by K vs the MH kernel)",
            "vs_baseline": None}


def config10_advi(base):
    """ADVI (full-rank variational posterior) vs prior-aware fused MCMC
    on the demo posterior: wall-clock, solver-evaluation budget, and
    log-space moment agreement. Honest framing: on this tiny posterior
    the fused random walk is so fast that MCMC wins wall-clock on TPU —
    ADVI's lane is solver-evaluation-bound regimes (adaptive/stiff XLA
    paths, expensive RHS) and quick full-covariance summaries."""
    import jax
    import jax.numpy as jnp

    import bench as B
    from odelib_tpu.data import obsdata_to_device
    from odelib_tpu.distributions import LogNormal
    from odelib_tpu.ops.pallas_mh import metropolis_hastings_fused
    from odelib_tpu.samplers import advi

    spec, obs_host, times_fit, y0 = B.build_problem()
    on_tpu = jax.default_backend() not in ("cpu",)
    obs = obsdata_to_device(obs_host, jnp.float32)
    dists = (LogNormal(s=0.5, scale=0.6), LogNormal(s=0.5, scale=2.4e-8),
             LogNormal(s=0.5, scale=24.0))

    def prior_logpdf(theta):
        return (dists[0].logpdf(theta[0]) + dists[1].logpdf(theta[1])
                + dists[2].logpdf(theta[2]))

    th_init = np.array([0.6, 2.4e-8, 24.0], np.float32)
    # 2400 steps = the measured variational optimum on this posterior
    # (600 steps leaves sigma mid-transition; 2400 matches 2400@n_mc=32)
    STEPS, N_MC, DRAWS = (2400, 8, 4096) if on_tpu else (60, 4, 256)

    def run_advi():
        r = advi(spec, obs, times_fit, y0, th_init, steps=STEPS,
                 n_mc=N_MC, full_rank=True, draws=DRAWS,
                 prior_logpdf=prior_logpdf, use_priors=True, seed=0,
                 method="fixed_dopri5", substeps=4)
        _sync(r.chi[-1:])
        return r

    res = run_advi()
    t_advi = _timed(run_advi, reps=3)

    # reference posterior: prior-aware fused MH (in-kernel LogNormal)
    C, NITS = (4096, 4096) if on_tpu else (128, 32)
    rng = np.random.default_rng(0)
    th0 = (th_init * np.exp(rng.normal(0, 0.05, (C, 3)))).astype(np.float32)

    def run_mcmc():
        o = metropolis_hastings_fused(
            spec, obs_host, times_fit, y0, th0, seed=1, nits=NITS,
            burnin=NITS // 2, substeps=4, priors=dists,
            interpret=not on_tpu, tile_chains=None if on_tpu else 128)
        _sync(o.chi[-1:, -1:])
        return o

    out = run_mcmc()
    t_mcmc = _timed(run_mcmc, reps=3)

    lv = np.log(np.maximum(np.asarray(res.theta), 1e-37))       # ADVI draws
    lm = np.log(np.maximum(np.asarray(out.theta), 1e-37)).reshape(-1, 3)
    mean_err_sigma = float(np.max(np.abs(lv.mean(0) - lm.mean(0))
                                  / lm.std(0)))
    std_ratio = [round(float(s), 3) for s in lv.std(0) / lm.std(0)]
    return {"config": 10,
            "metric": "ADVI (full-rank) vs prior-aware fused MCMC on the "
                      "demo posterior: fit wall-clock and log-space "
                      "moment agreement",
            "value": round(t_advi, 3), "unit": "s (ADVI fit + draws)",
            "advi": {"steps": STEPS, "n_mc": N_MC, "draws": DRAWS,
                     "solver_evals": STEPS * N_MC + DRAWS + 128,
                     "elapsed_s": round(t_advi, 3),
                     "converged": bool(res.converged)},
            "mcmc": {"chains": C, "nits": NITS,
                     "solver_evals": C * (NITS - 1),
                     "elapsed_s": round(t_mcmc, 3)},
            "max_mean_err_in_posterior_sigma": round(mean_err_sigma, 3),
            "log_std_ratio_advi_over_mcmc": std_ratio,
            "note": "capability row - the reference has no variational "
                    "inference; vs_baseline not defined. ADVI uses "
                    f"{(STEPS * N_MC + DRAWS + 128) / (C * (NITS - 1)):.1%}"
                    " of the MCMC solver-evaluation budget; the fused MH "
                    "kernel still wins wall-clock on this toy because its "
                    "per-solve cost is lower than XLA dispatch. The "
                    "~0.7-0.8 std ratio is the reverse-KL (mode-seeking) "
                    "Gaussian limit on this non-Gaussian posterior (mu "
                    "unidentified below ~0.1), not non-convergence: "
                    "doubling steps / quadrupling n_mc leaves it "
                    "unchanged, and on near-Gaussian posteriors ADVI "
                    "matches quadrature ground truth exactly "
                    "(tests/test_advi.py)",
            "vs_baseline": None}


def config11_hierarchical_funnel(base):
    """Hierarchical (partial-pooling) joint posterior: 3 decay
    experiments with per-experiment rates tied through a sampled
    lognormal population law — 5 joint dims (3 rate slots + pop_median +
    pop_sigma), funnel-shaped in pop_sigma. Measures min-over-dims
    ESS/sec for the random-walk joint sampler vs gradient-based
    hamiltonian_mc_custom on the identical posterior (both include the
    pooling density + hyperpriors). Capability row: the reference has no
    cross-experiment structure at all."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    import odelib_tpu
    from odelib_tpu import JointFit
    from odelib_tpu.distributions import LogNormal
    from odelib_tpu.samplers import hamiltonian_mc_custom
    from odelib_tpu.samplers.joint import joint_metropolis_hastings
    from odelib_tpu.utils.diagnostics import effective_sample_size

    def rhs(t, y, ps):
        (k,) = ps
        return jnp.stack([-k * y[0]])

    def decay_fw(k, seed):
        rng = np.random.default_rng(seed)
        df = pd.DataFrame(
            [{"organism": "y", "time": t,
              "abundance": 1e6 * np.exp(-k * t)
              * np.exp(rng.normal(0, 0.35)),
              "log_sigma": 0.35} for t in np.linspace(0, 3, 8)])
        return odelib_tpu.ModelFramework(
            ODE=rhs, parameter_names=["k"], state_names=["y"],
            dataframe=df, t_steps=32, ode_style="jax", random_seed=seed,
            k=odelib_tpu.parameter(stats_gen=LogNormal(s=0.7, scale=1.0),
                                   hyperparameters={}, random_seed=seed))

    jf = JointFit({f"e{i}": decay_fw(k, 40 + i)
                   for i, k in enumerate((0.8, 1.0, 1.25))},
                  hierarchical=["k"], random_seed=41)
    on_tpu = jax.default_backend() not in ("cpu",)
    C = 512 if on_tpu else 32
    NITS_H, NITS_M = (4096, 65536) if on_tpu else (96, 768)
    survey = jf.fit_survey(1024).dropna()
    top = survey.nsmallest(64, "chi")
    rng = np.random.default_rng(7)
    th0 = jf._seed_hyper_slots(
        jf._thetas_from_df(top.iloc[rng.integers(0, len(top), C)]))
    th0 = jnp.asarray(th0, jnp.result_type(float))
    keys = jax.random.split(jax.random.PRNGKey(3), C)
    prior_fn, _ = jf._effective_prior(False)
    chi_fn = jf._joint_chi_fn({"method": "fixed_dopri5", "substeps": 4})
    specs, idxs, obs, times, y0s, method, subs = jf._device_args(
        {"method": "fixed_dopri5", "substeps": 4})

    def run_hmc():
        out = hamiltonian_mc_custom(
            chi_fn, th0, keys, nits=NITS_H, burnin=NITS_H // 4,
            n_leapfrog=4, step_size=0.05, target_accept=0.65,
            prior_logpdf=prior_fn, use_priors=True)
        _sync(out.chi[-1:, -1:])
        return out

    def run_mh():
        out = joint_metropolis_hastings(
            specs, idxs, obs, times, y0s, th0, keys, nits=NITS_M,
            burnin=NITS_M // 2, rwalk_std=0.05, prior_logpdf=prior_fn,
            use_priors=True, method=method, substeps_list=subs)
        _sync(out.chi[-1:, -1:])
        return out

    out_h = run_hmc()
    t_h = _timed(run_hmc, reps=3)
    out_m = run_mh()
    t_m = _timed(run_mh, reps=3)

    def min_ess(out):
        th = np.log(np.asarray(out.theta))
        return min(effective_sample_size(th[:, :, d])
                   for d in range(th.shape[-1]))

    ess_h, ess_m = min_ess(out_h), min_ess(out_m)
    hmc_rate, mh_rate = ess_h / t_h, ess_m / t_m
    return {"config": "11",
            "metric": "hierarchical partial-pooling joint posterior "
                      "(3 experiments, 5 joint dims incl. the pop_sigma "
                      "funnel): min-over-dims effective samples/sec",
            "value": round(hmc_rate, 1), "unit": "ESS/sec (HMC)",
            "mh_ess_per_s": round(mh_rate, 1),
            "hmc_over_mh": round(hmc_rate / mh_rate, 2) if mh_rate else None,
            "hmc": {"chains": C, "nits": NITS_H,
                    "elapsed_s": round(t_h, 3),
                    "min_ess": round(ess_h, 1)},
            "mh": {"chains": C, "nits": NITS_M,
                   "elapsed_s": round(t_m, 3),
                   "min_ess": round(ess_m, 1)},
            "note": "capability row - the reference cannot express "
                    "cross-experiment pooling at any speed; vs_baseline "
                    "not defined",
            "vs_baseline": None}


def config13_forcings_overhead(base):
    """Forcing-table lookups are free in the fused kernel: its step times
    are static Python floats, so every lookup constant-folds to a scalar
    literal at trace time. The clean control is a CONSTANT driver — same
    RHS, same per-step arithmetic, a 1-point table — vs the 17-point
    sinusoid table: their ratio isolates the lookup machinery (expect
    ~1.0). The undriven zero_i is reported for context; it is a cheaper
    MODEL (one fewer vector multiply per RHS term), so its gap is the
    driver's own arithmetic, not forcing overhead. Headline workload
    (10k chains x 1000 its, substeps=4)."""
    import jax
    import jax.numpy as jnp

    import bench as B
    from odelib_tpu.model import make_spec
    from odelib_tpu.ops.pallas_mh import metropolis_hastings_fused

    if jax.default_backend() == "cpu":
        return {"config": 13, "metric": "forcings overhead (TPU only)",
                "value": None, "skipped": "no TPU", "vs_baseline": None}
    spec, obs_host, times_fit, y0 = B.build_problem()

    def forced_zero_i(t, y, ps, u):
        mu, phi, beta = ps
        S, V = y
        dS = mu * u["g"] * S - phi * S * V
        dV = beta * phi * S * V - phi * S * V
        return jnp.stack([dS, dV])

    ft = np.linspace(0.0, 3.2, 17)
    fv = 1.0 + 0.2 * np.sin(2 * np.pi * ft / 1.6)
    table_spec = make_spec(forced_zero_i, spec.pnames, spec.snames,
                           forcings={"g": (ft, fv)})
    # control: identical RHS/arithmetic, the lookup always folds to 1.1
    const_spec = make_spec(forced_zero_i, spec.pnames, spec.snames,
                           forcings={"g": ((0.0,), (1.1,))})

    C, NITS = 10240, 1000
    rng = np.random.default_rng(0)
    th0 = np.asarray(np.array([0.9, 3.0e-8, 25.0])
                     * np.exp(rng.normal(0, 0.05, (C, 3))), np.float32)

    variants = (("undriven_model", spec), ("const_driver", const_spec),
                ("table_driver", table_spec))

    def run(s):
        out = metropolis_hastings_fused(s, obs_host, times_fit, y0,
                                        th0, seed=1, nits=NITS,
                                        burnin=NITS // 2, substeps=4)
        _sync(out.chi[-1:, -1:])

    # interleave the reps (A,B,C,A,B,C,...): tunnel/clock drift between
    # variants otherwise swamps the few-percent effect being measured
    for _, s in variants:
        run(s)  # compile all three before any timing
    samples = {name: [] for name, _ in variants}
    for _ in range(7):
        for name, s in variants:
            t0 = time.perf_counter()
            run(s)
            samples[name].append(time.perf_counter() - t0)
    rates = {name: round(C * (NITS - 1) / float(np.median(ts)), 0)
             for name, ts in samples.items()}
    spread = max(float(np.std(ts) / np.median(ts))
                 for ts in samples.values())
    return {"config": 13,
            "metric": "forcing-table lookup overhead in the fused MH "
                      "kernel (10k chains x 1000 its; 17-point sinusoid "
                      "vs constant driver, identical RHS arithmetic)",
            "value": rates["table_driver"], "unit": "chain-steps/sec",
            "const_driver": rates["const_driver"],
            "undriven_model": rates["undriven_model"],
            "table_over_const": round(rates["table_driver"]
                                      / rates["const_driver"], 3),
            "driver_arithmetic_cost": round(
                rates["const_driver"] / rates["undriven_model"], 3),
            "rep_noise_frac": round(spread, 3),
            "note": "table_over_const ~1.0: lookups constant-fold at the "
                    "kernel's static step times, so table size is free; "
                    "the gap to the undriven model is the driver's own "
                    "multiply in the RHS, not forcing machinery; "
                    "vs_baseline not defined (capability row)",
            "vs_baseline": None}


def config14_pmmh(base):
    """Particle-marginal MH (stochastic model, process noise): C chains,
    each proposal scored by a K-particle bootstrap filter over the GBM
    state-space SDE — C x K particle trajectories per iteration as ONE
    device program. Denominator measured inline: the same algorithm in
    vectorized numpy, one chain at a time (particles vectorized — the
    best a CPU re-implementation following the reference's
    chain-per-process architecture would do; generous, since the
    reference itself has no stochastic solver or filter at all)."""
    import jax
    import jax.numpy as jnp

    from odelib_tpu.model import ObsData, make_spec
    from odelib_tpu.samplers.pf import pmmh

    SIG, S_OBS = 0.3, 0.15

    def rhs(t, y, ps):
        return jnp.stack([ps[0] * y[0]])

    def diff(t, y, ps):
        return jnp.stack([SIG * y[0]])

    spec = make_spec(rhs, ("mu",), ("N",), diffusion=diff)
    rng = np.random.default_rng(42)
    T_obs = np.arange(1, 9) * 0.5
    z = np.log(2.0)
    zs = []
    for dt in np.diff(np.concatenate([[0.0], T_obs])):
        z = z + (0.4 - 0.5 * SIG ** 2) * dt + SIG * np.sqrt(dt) * rng.normal()
        zs.append(z)
    logO = np.array(zs) + S_OBS * rng.normal(size=len(zs))
    times = np.linspace(0, 4.0, 41)
    t_idx = np.array([int(round(t / 0.1)) for t in T_obs])
    obs = ObsData(log_abundance=logO, log_sigma=np.full(len(logO), S_OBS),
                  abundance=np.exp(logO), t_index=t_idx,
                  state_index=np.zeros(len(logO), np.int64),
                  sstot=float(np.var(np.exp(logO)) * len(logO)))

    C, K, NITS, SUB = 10240, 128, 200, 8
    th0 = np.exp(rng.normal(np.log(0.4), 0.3, (C, 1))).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(3), C)

    # Prior-aware target (lognormal on mu) with burn-in proposal-scale
    # adaptation toward the pseudo-marginal 0.3 optimum. r3 ran this row
    # likelihood-only at a hand-picked step; that target is nearly flat
    # as mu -> 0 (the process noise absorbs drift misfit), so acceptance
    # saturated ~0.74 no matter the step — the 'timid proposal' finding
    # was really a flat-tail artifact. The proper posterior both pins the
    # chain and lets adaptation land acceptance on target.
    PRI_MU, PRI_SD = np.log(0.4), 0.5

    def prior_lp(th):
        z = (jnp.log(th[0]) - PRI_MU) / PRI_SD
        return -0.5 * z * z - jnp.log(th[0])   # + const

    from odelib_tpu import distributions as _D
    from odelib_tpu.ops.pallas_pf import pmmh_fused
    pri = (_D.LogNormal(s=PRI_SD, loc=0.0, scale=float(np.exp(PRI_MU))),)

    def run_fused():
        out = pmmh_fused(spec, obs, times, np.array([2.0], np.float32),
                         th0, seed=3, nits=NITS, burnin=NITS // 2,
                         rwalk_std=0.4, n_particles=K, substeps=SUB,
                         priors=pri, adapt_proposal=True,
                         target_accept=0.3, adapt_rate=0.15)
        _sync(out.chi[-1:, -1:])
        return out

    def run_xla():
        out = pmmh(spec, obs, times, np.array([2.0], np.float32),
                   jnp.asarray(th0), keys, nits=NITS, burnin=NITS // 2,
                   rwalk_std=0.4, n_particles=K, substeps=SUB,
                   use_priors=True, prior_logpdf=prior_lp,
                   adapt_proposal=True, target_accept=0.3,
                   adapt_rate=0.15)
        _sync(out.chi[-1:, -1:])
        return out

    out = run_fused()  # compile + correctness probe
    # frozen-phase acceptance (records carry the running ratio since
    # iteration 1; difference out the burn-in segment)
    ar = np.asarray(out.acceptance_ratio)
    it = np.asarray(out.iteration, float)
    acc = float(np.mean((ar[:, -1] * it[-1] - ar[:, 0] * it[0])
                        / (it[-1] - it[0])))
    t_dev = _timed(run_fused, reps=3)
    rate = C * (NITS - 1) / t_dev
    run_xla()
    t_xla = _timed(run_xla, reps=3)
    xla_rate = C * (NITS - 1) / t_xla

    # r5 (VERDICT push item 3): the widened in-kernel envelope —
    # Milstein propagation (must stay within ~10% of Euler: one extra
    # diffusion-gradient FMA per substep) and a 256-particle plane
    # (>128 sublanes tiled across the VMEM plane).
    def run_fused_v(sde_method, k):
        def f():
            out = pmmh_fused(spec, obs, times,
                             np.array([2.0], np.float32), th0, seed=3,
                             nits=NITS, burnin=NITS // 2, rwalk_std=0.4,
                             n_particles=k, substeps=SUB,
                             sde_method=sde_method, priors=pri,
                             adapt_proposal=True, target_accept=0.3,
                             adapt_rate=0.15)
            _sync(out.chi[-1:, -1:])
        return f

    run_fused_v("milstein", K)()
    t_mil = _timed(run_fused_v("milstein", K), reps=3)
    mil_rate = C * (NITS - 1) / t_mil
    run_fused_v("euler", 256)()
    t_k256 = _timed(run_fused_v("euler", 256), reps=3)
    k256_rate = C * (NITS - 1) / t_k256

    # ---- inline numpy denominator: same filter, one serial chain ----
    dt_sub = np.diff(times)[0] / SUB

    def np_pf(mu, rng_l):
        parts = np.full(K, 2.0)
        ll, prev_t = 0.0, 0.0
        for t, y in zip(T_obs, logO):
            nsub = int(round((t - prev_t) / dt_sub))
            for _ in range(nsub):
                parts = np.abs(parts + mu * parts * dt_sub
                               + SIG * parts * np.sqrt(dt_sub)
                               * rng_l.normal(size=K))
            prev_t = t
            logw = -0.5 * ((np.log(np.maximum(parts, 1e-300)) - y)
                           / S_OBS) ** 2
            m = logw.max()
            w = np.exp(logw - m)
            ll += m + np.log(w.mean())
            cum = np.cumsum(w / w.sum())
            pos = (np.arange(K) + rng_l.uniform()) / K
            parts = parts[np.clip(np.searchsorted(cum, pos), 0, K - 1)]
        return -ll

    def np_prior_lp(mu):
        z = (np.log(mu) - PRI_MU) / PRI_SD
        return -0.5 * z * z - np.log(mu)

    rng_l = np.random.default_rng(0)
    NB = 30
    mu, chi = 0.4, None
    t0 = time.perf_counter()
    chi = np_pf(mu, rng_l)
    for _ in range(NB - 1):
        prop = mu * np.exp(0.4 * rng_l.normal())
        c_new = np_pf(prop, rng_l)
        if np.exp(chi - c_new + np_prior_lp(prop)
                  - np_prior_lp(mu)) > rng_l.uniform():
            mu, chi = prop, c_new
    t_np = (time.perf_counter() - t0) / NB
    np_rate = 1.0 / t_np

    return {"config": 14,
            "metric": "particle-marginal MH (GBM state-space SDE): 10240 "
                      "chains x 128-particle bootstrap filter per "
                      "proposal, 200 iterations, prior-aware, "
                      "adapted proposal, fused Pallas kernel",
            "value": round(rate, 0), "unit": "chain-steps/sec",
            "n_particles": K, "mean_acceptance": round(acc, 3),
            "xla_chain_steps_per_sec": round(xla_rate, 0),
            "fused_over_xla": round(rate / xla_rate, 2),
            "milstein_chain_steps_per_sec": round(mil_rate, 0),
            "milstein_over_euler": round(mil_rate / rate, 3),
            "k256_chain_steps_per_sec": round(k256_rate, 0),
            "numpy_serial_chain_steps_per_sec": round(np_rate, 2),
            "vs_baseline": round(rate / np_rate, 1),
            "note": "denominator = same algorithm in vectorized numpy, "
                    "one chain at a time (reference architecture; the "
                    "reference itself cannot express process noise)"}


def config12_roofline():
    """VPU roofline of the headline kernel (bench/roofline.py): exact
    per-iteration lane-op count from the kernel body's jaxpr, converted
    to sustained ops/s at the measured end-to-end rate."""
    import contextlib
    import io

    import roofline

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        row = roofline.main()
    row["config"] = 12
    return row


def main():
    import bench as B
    spec, obs_host, times_fit, y0 = B.build_problem()
    base = _baselines()

    results = [
        config1_integrate_chi(spec, obs_host, times_fit, y0, base),
        config2_single_chain(spec, obs_host, times_fit, y0, base),
        config3_theory_sweep(base),
        config4_headline(),
        config4b_full_grid_adaptive(base),
        config5_stiff_and_aic(base),
        config6_stiff_mcmc(base),
        config7_hmc_ess(base),
        config7b_hmc_hard(base),
        config8_fused_ensemble(base),
        config9_joint_fused(base),
        config10_advi(base),
        config11_hierarchical_funnel(base),
        config12_roofline(),
        config13_forcings_overhead(base),
        config14_pmmh(base),
        config15_fused_pt(base),
    ]
    for r in results:
        print(json.dumps(r))
    with open(os.path.join(ROOT, "BENCH_SUITE.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
