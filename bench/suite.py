"""Full benchmark suite: one JSON line per BASELINE.json config.

Honest timing on the remote TPU runtime: every timed region ends with a
1-element device->host fetch (``block_until_ready`` returns before remote
execution finishes), and kernel planners only ever see host arrays.

  1. fixed-param integrate + chi vs demo data (single solve latency)
  2. single-chain Metropolis-Hastings posterior (latency)
  3. theoretical parameter sweep, no data (Lotka-Volterra batch throughput)
  4. 10k vmapped MH chains (the bench.py headline, included for one report)
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


def config1_integrate_chi(spec, obs_host, times_fit, y0):
    """Fixed-parameter integrate + chi (reference call stack 3.2)."""
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

    # the framework's host-side native core covers the single-solve latency
    # regime where a device round-trip can't win
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
    return {"config": 1, "metric": "integrate+chi latency",
            "value": round(med * 1e3, 3), "unit": "ms",
            "tpu_adaptive_ms": round(med * 1e3, 3),
            "native_cpp_dopri5_ms": round(med_native * 1e3, 4)}


def config2_single_chain(spec, obs_host, times_fit, y0):
    """Single-chain MH, 1000 iterations (reference demo: minutes/chain)."""
    from odelib_tpu.ops.pallas_mh import metropolis_hastings_fused

    theta0 = np.array([[0.9, 3.0e-8, 25.0]], np.float32)

    def run():
        out = metropolis_hastings_fused(spec, obs_host, times_fit, y0,
                                        theta0, seed=0, nits=1000,
                                        substeps=4)
        _sync(out.chi[-1:, -1:])

    med = _timed(run)
    return {"config": 2,
            "metric": "single-chain MH posterior, 1000 iterations",
            "value": round(med * 1e3, 3), "unit": "ms"}


def config3_theory_sweep():
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
    return {"config": 3,
            "metric": f"Lotka-Volterra sweep, {N} adaptive trajectories",
            "value": round(N / med, 1), "unit": "trajectories/sec",
            "elapsed_ms": round(med * 1e3, 2)}


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


def config5_stiff_and_aic():
    """Stiff batch (Robertson, Kvaerno3) + the 3-model AIC comparison."""
    import jax
    import jax.numpy as jnp

    from odelib_tpu.ops.integrate import odeint_grid

    def rober(t, y, k):
        k1, k2, k3 = k
        y1, y2, y3 = y
        return jnp.stack([-k1 * y1 + k3 * y2 * y3,
                          k1 * y1 - k2 * y2 * y2 - k3 * y2 * y3,
                          k2 * y2 * y2])

    N = 256
    rng = np.random.default_rng(0)
    ks = jnp.asarray(np.array([0.04, 3e7, 1e4])
                     * np.exp(rng.normal(0, 0.1, (N, 3))), jnp.float32)
    ts = jnp.asarray(np.concatenate([[0.0], np.geomspace(1e-5, 1e3, 31)]),
                     jnp.float32)
    y0 = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

    solve = jax.jit(jax.vmap(
        lambda k: odeint_grid(rober, y0, ts, k, rtol=1e-5, atol=1e-8,
                              method="kvaerno5", max_steps=4096).ys[-1]))

    def run():
        _sync(solve(ks)[-1:, -1:])

    med = _timed(run, reps=3)
    return {"config": 5,
            "metric": f"stiff Robertson batch ({N} Kvaerno5 solves)",
            "value": round(N / med, 1), "unit": "solves/sec",
            "elapsed_ms": round(med * 1e3, 2),
            "aic_ranking": "see examples/demo_infection_states.py"}


def main():
    import bench as B
    spec, obs_host, times_fit, y0 = B.build_problem()

    results = [
        config1_integrate_chi(spec, obs_host, times_fit, y0),
        config2_single_chain(spec, obs_host, times_fit, y0),
        config3_theory_sweep(),
        config4_headline(),
        config5_stiff_and_aic(),
    ]
    for r in results:
        print(json.dumps(r))
    with open(os.path.join(ROOT, "BENCH_SUITE.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
