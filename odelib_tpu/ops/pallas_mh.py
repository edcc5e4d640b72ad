"""Fully-fused Metropolis-Hastings chains as a single Pallas TPU kernel.

The XLA path (samplers/mh.py) is a scan of ~50-100 small fused ops per
iteration over (C,) arrays — latency-bound on TPU because each op touches a
tiny tile. This kernel is the speed-of-light version (SURVEY.md section 7,
"Pallas kernel pass"): the ENTIRE chain loop — lognormal proposal (Box-Muller
on the in-core PRNG), fixed-step Dopri5 integration of the user RHS over the
compact observation grid, chi/R^2/AIC scoring, accept/reject, posterior
recording — runs inside one kernel per chain tile, with every intermediate in
VMEM/registers and zero HBM traffic except the recorded posterior rows.

TPU-native specializations:
  * chains are tiled (SUB x 128) lanes; each state variable and parameter is
    its own 2-D tile, so the VPU sees full (8,128) vectors at every op;
  * the observation metadata (grid times, per-observation state index,
    log-abundance, log-sigma, summation membership) is STATIC per model, so
    chi contributions compile to inline fused multiply-adds — no gathers, no
    index math at runtime;
  * the time grid is baked in as constants; the integrator is a fully
    unrolled fixed-step Dopri5 (substeps per observation interval), which is
    both uniform across lanes (no worst-lane adaptivity) and exactly the
    structure the Mosaic scheduler pipelines best.

Use via samplers.metropolis_hastings(..., method='pallas') or directly
through :func:`metropolis_hastings_fused`. Validated against the XLA path in
tests (chi parity in eval mode; statistical parity for full chains).
"""
from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model import ModelSpec, ObsData

_LANES = 128
_DEF_SUB = 8  # sublanes per tile (f32 min tile is (8, 128))


# --- Dopri5 stage coefficients (same tableau as runge_kutta.py) -----------
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0)


def _dopri5_fixed_step(rhs, t, y, h, ps):
    """One fixed-size Dopri5 step; y is (S, sub, 128)."""
    ks = [rhs(t, y, ps)]
    for i in range(1, 6):
        yi = y + h * sum(a * k for a, k in zip(_A[i], ks) if a != 0.0)
        ks.append(rhs(t + _C[i] * h, yi, ps))
    return y + h * sum(a * k for a, k in zip(_A[6], ks) if a != 0.0)


def _rk4_fixed_step(rhs, t, y, h, ps):
    k1 = rhs(t, y, ps)
    k2 = rhs(t + 0.5 * h, y + 0.5 * h * k1, ps)
    k3 = rhs(t + 0.5 * h, y + 0.5 * h * k2, ps)
    k4 = rhs(t + h, y + h * k3, ps)
    return y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def _mix(x):
    """SplitMix32 finalizer on uint32 lanes (wrapping arithmetic)."""
    x = x + jnp.uint32(0x9E3779B9)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


class _Rng:
    """Counter-based per-lane PRNG in pure jnp ops.

    Backend-independent (runs identically compiled on TPU and in Pallas
    interpret mode on CPU) — each draw hashes (lane_id, stream_counter) with
    a double SplitMix32 round. The stream counter is `iteration * n_slots +
    static_slot`, so every (chain, iteration, draw-site) gets an independent
    word.
    """

    def __init__(self, shape, seed, program_id, tile):
        row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        lane = row * jnp.uint32(shape[1]) + col
        base = (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
                + program_id.astype(jnp.uint32) * jnp.uint32(tile))
        self._lane = _mix(base + lane)
        self._slot = 0

    def bits(self, it):
        ctr = (it.astype(jnp.uint32) * jnp.uint32(1024)
               + jnp.uint32(self._slot))
        self._slot += 1
        return _mix(self._lane ^ _mix(ctr))

    def uniform(self, it):
        """(0,1) uniform. (24-bit mantissa path; uint32->int32 first since
        Mosaic has no direct uint32->f32 cast.)"""
        b24 = (self.bits(it) >> 8).astype(jnp.int32)
        u = b24.astype(jnp.float32) * (1.0 / (1 << 24))
        return u + (0.5 / (1 << 24))

    def normal(self, it):
        """Standard normal via Box-Muller."""
        u1 = self.uniform(it)
        u2 = self.uniform(it)
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)


class _StaticPlan(NamedTuple):
    """Everything the kernel bakes in at trace time."""
    step_ts: tuple          # (t, h) per integration sub-step
    obs_after: tuple        # per grid index: ((members, log_ab, log_sig,
    #                         abundance), ...) contributions recorded there
    sstot: float
    n_grid: int


def _build_plan(spec: ModelSpec, obs: ObsData, times, substeps: int):
    times = np.asarray(times, np.float64)
    t_index = np.asarray(obs.t_index)
    state_index = np.asarray(obs.state_index)
    log_ab = np.asarray(obs.log_abundance, np.float64)
    log_sig = np.asarray(obs.log_sigma, np.float64)

    # post-summation state j -> tuple of raw-state member indices
    if spec.sum_matrix is not None:
        m = np.asarray(spec.sum_matrix)
        members = tuple(tuple(int(i) for i in np.where(m[:, j])[0])
                        for j in range(m.shape[1]))
    else:
        members = tuple((j,) for j in range(len(spec.snames)))

    obs_after = [[] for _ in range(len(times))]
    for o in range(len(log_ab)):
        obs_after[int(t_index[o])].append(
            (members[int(state_index[o])], float(log_ab[o]),
             float(log_sig[o]), float(np.exp(log_ab[o]))))

    step_ts = []
    for i in range(len(times) - 1):
        h = (times[i + 1] - times[i]) / substeps
        for s in range(substeps):
            step_ts.append((float(times[i] + s * h), float(h)))
    return _StaticPlan(step_ts=tuple(step_ts),
                       obs_after=tuple(tuple(x) for x in obs_after),
                       sstot=float(np.asarray(obs.sstot)),
                       n_grid=len(times))


def _make_scorer(spec: ModelSpec, plan: _StaticPlan, y0_base, stepper,
                 substeps: int):
    """Returns score(theta_list) -> (chi, rsq): integrate + score, fully
    unrolled with static obs contributions."""
    y0_base = tuple(float(v) for v in np.asarray(y0_base))
    S = len(spec.snames)
    init_pidx = spec.init_pidx

    def rhs(t, y, ps):
        return jnp.stack(list(spec.rhs(t, y, ps)))

    def contrib(y, gi, chi, ssres):
        for mem, lab, lsig, ab in plan.obs_after[gi]:
            pred = sum(y[m] for m in mem) if len(mem) > 1 else y[mem[0]]
            pred = jnp.maximum(pred, 1e-37)  # f32-safe floor: log(<=0) guard
            c = jnp.log(pred)
            chi = chi + (lab - c) ** 2 / (2.0 * lsig * lsig)
            ssres = ssres + (pred - ab) ** 2
        return chi, ssres

    def score(theta_list, shape):
        y = jnp.stack([
            theta_list[init_pidx[s]] if init_pidx[s] >= 0
            else jnp.full(shape, y0_base[s], jnp.float32)
            for s in range(S)])
        chi = jnp.zeros(shape, jnp.float32)
        ssres = jnp.zeros(shape, jnp.float32)
        chi, ssres = contrib(y, 0, chi, ssres)
        gi = 1
        for si, (t, h) in enumerate(plan.step_ts):
            y = stepper(rhs, t, y, h, theta_list)
            if (si + 1) % substeps == 0:
                chi, ssres = contrib(y, gi, chi, ssres)
                gi += 1
        rsq = 1.0 - ssres / plan.sstot
        return chi, rsq

    return score


def _make_scorer_from_key(spec, plan, y0_key, step_fn, substeps):
    """Hashable-argument wrapper over _make_scorer for the lru_caches."""
    return _make_scorer(spec, plan, np.asarray(y0_key), step_fn, substeps)


def metropolis_hastings_fused(
        spec: ModelSpec, obs: ObsData, times, y0_base, theta0, seed: int, *,
        nits: int = 1000, burnin: Optional[int] = None,
        walk_mask: Optional[Sequence[float]] = None, rwalk_std: float = 0.05,
        substeps: int = 4, stepper: str = "dopri5",
        tile_chains: int = 1024, interpret: bool = False,
        _rec_cap: Optional[int] = None):
    """Run C chains of reference-semantics MH fully inside a Pallas kernel.

    theta0: (C, P) float32 (C padded to a multiple of tile_chains
    internally). Returns the same record structure as the XLA sampler:
    (theta (C, R, P), chi, rsq, aic, acc_ratio (C, R), iteration (R,)).
    Scalar parameters only (array-valued params use the XLA path).
    """
    if burnin is None:
        burnin = int(nits / 2)
    R = max(nits - 1 - burnin, 0)
    P = len(spec.pnames)
    if any(s for s in spec.pshapes):
        raise ValueError("pallas MH path supports scalar parameters only")
    theta0 = np.asarray(theta0, np.float32)
    C0 = theta0.shape[0]
    tile = int(tile_chains)
    # compiled path needs full (8,128) f32 tiles; interpret mode (CPU tests)
    # may use a single-sublane tile to keep emulation cheap
    min_tile = _LANES if interpret else _DEF_SUB * _LANES
    assert tile % min_tile == 0, \
        f"tile_chains must be a multiple of {min_tile}"
    C = int(-(-C0 // tile) * tile)
    if C > C0:
        theta0 = np.concatenate(
            [theta0, np.tile(theta0[-1:], (C - C0, 1))], axis=0)
    num = int(np.count_nonzero(theta0[0]))
    if walk_mask is None:
        walk_mask = [1.0] * P
    walk = tuple(float(w) for w in walk_mask)

    plan = _build_plan(spec, obs, times, substeps)
    y0_key = tuple(float(v) for v in np.asarray(y0_base))

    # Records live in VMEM per segment; cap segment length so the record
    # block (L*(P+4)*tile*4 bytes) stays well under the VMEM budget. The
    # chain loop is CHUNKED over host-level kernel calls: a burn segment with
    # no record outputs, then fully-recorded segments. Chain state (theta,
    # accept count) carries between calls; chi/R^2 are recomputed from theta
    # at each segment start (deterministic scorer => identical value); RNG
    # streams are counter-based on the global iteration, so chunking does not
    # change the sample stream.
    L_REC = max(1, min(128, (4 * 1024 * 1024) // ((P + 4) * tile * 4)))
    if _rec_cap is not None:  # test hook: force multi-segment chunking
        L_REC = min(L_REC, int(_rec_cap))

    # chain state crosses segment boundaries in LOG space (the random walk's
    # native domain) so chunked runs are bitwise-identical to unchunked ones
    def seg_call(length, record, it0, theta_t, acc):
        fn = _cached_mh_seg(spec, plan, y0_key, P, tile, C, int(length),
                            bool(record), walk, float(rwalk_std), num,
                            stepper, substeps, bool(interpret))
        seed_arr = jnp.asarray([seed], jnp.int32)
        it0_arr = jnp.asarray([it0], jnp.int32)
        return fn(seed_arr, it0_arr, theta_t, acc)

    theta_t = jnp.log(jnp.asarray(theta0.T))                 # (P, C), log
    acc = jnp.zeros((1, C), jnp.float32)
    it = 1
    if burnin > 0:
        theta_t, acc = seg_call(burnin, False, it, theta_t, acc)
        it += burnin
    recs = []
    remaining = nits - 1 - burnin
    while remaining > 0:
        L = min(L_REC, remaining)
        theta_t, acc, th_r, chi_r, rsq_r, aic_r, ar_r = seg_call(
            L, True, it, theta_t, acc)
        recs.append((th_r, chi_r, rsq_r, aic_r, ar_r))
        it += L
        remaining -= L

    def cat(i):
        return jnp.concatenate([r[i] for r in recs], axis=0)

    theta_s = jnp.transpose(cat(0), (2, 0, 1))[:C0]      # (C, R, P)
    squeeze = lambda a: jnp.transpose(a[:, 0, :], (1, 0))[:C0]
    iterations = jnp.arange(1, nits)[burnin:]
    from ..samplers.mh import MHOutput
    return MHOutput(theta=theta_s, chi=squeeze(cat(1)),
                    rsquared=squeeze(cat(2)), aic=squeeze(cat(3)),
                    acceptance_ratio=squeeze(cat(4)), iteration=iterations)


@lru_cache(maxsize=64)
def _cached_mh_seg(spec, plan, y0_key, P, tile, C, length, record, walk,
                   rwalk_std, num, stepper, substeps, interpret):
    """Build (once per static config) one traced MH segment pallas_call.

    pallas_call tracing of the fully-unrolled kernel costs seconds of host
    time; caching on the hashable static config makes repeat invocations
    dispatch-only. Inputs: seed (SMEM), it0 (SMEM), log-theta (P, C),
    acc_count (1, C). Outputs: final log-theta/acc, plus (when ``record``)
    theta/chi/rsq/aic/acceptance-ratio blocks of ``length`` rows.
    """
    sub = tile // _LANES
    shape = (sub, _LANES)
    step_fn = _dopri5_fixed_step if stepper == "dopri5" else _rk4_fixed_step
    score = _make_scorer_from_key(spec, plan, y0_key, step_fn, substeps)

    def kernel(seed_ref, it0_ref, theta_in, acc_in, theta_fin, acc_fin,
               *rec_refs):
        rng = _Rng(shape, seed_ref[0], pl.program_id(0), tile)
        it0 = it0_ref[0]
        logtheta = [theta_in[p].reshape(shape) for p in range(P)]
        chi, rsq = score([jnp.exp(lt) for lt in logtheta], shape)
        acc0 = acc_in[0].reshape(shape)

        def body(i, carry):
            logtheta, chi, rsq, acc_count = carry
            it = it0 + i
            prop = [lt + (rwalk_std * walk[p]) * rng.normal(it)
                    if walk[p] != 0.0 else lt
                    for p, lt in enumerate(logtheta)]
            theta_p = [jnp.exp(lt) for lt in prop]
            chi_new, rsq_new = score(theta_p, shape)
            u = rng.uniform(it)
            accept = jnp.exp(chi - chi_new) > u
            logtheta = [jnp.where(accept, pn, lo)
                        for pn, lo in zip(prop, logtheta)]
            chi = jnp.where(accept, chi_new, chi)
            rsq = jnp.where(accept, rsq_new, rsq)
            acc_count = acc_count + accept.astype(jnp.float32)

            if record:
                theta_out, chi_out, rsq_out, aic_out, ar_out = rec_refs
                for p in range(P):
                    theta_out[i, p] = jnp.exp(logtheta[p]).reshape(tile)
                chi_out[i, 0] = chi.reshape(tile)
                rsq_out[i, 0] = rsq.reshape(tile)
                aic_out[i, 0] = 2.0 * chi.reshape(tile) + 2.0 * num
                ar_out[i, 0] = (acc_count
                                / it.astype(jnp.float32)).reshape(tile)

            return logtheta, chi, rsq, acc_count

        logtheta, chi, rsq, acc_count = jax.lax.fori_loop(
            0, length, body, (logtheta, chi, rsq, acc0))
        for p in range(P):
            theta_fin[p] = logtheta[p].reshape(tile)
        acc_fin[0] = acc_count.reshape(tile)

    grid = C // tile

    def spec2d(k):
        return pl.BlockSpec((k, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def spec3d(k):
        return pl.BlockSpec((length, k, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((P, C), jnp.float32),
                  jax.ShapeDtypeStruct((1, C), jnp.float32)]
    out_specs = [spec2d(P), spec2d(1)]
    if record:
        out_shapes += [jax.ShapeDtypeStruct((length, P, C), jnp.float32)] + \
            [jax.ShapeDtypeStruct((length, 1, C), jnp.float32)] * 4
        out_specs += [spec3d(P)] + [spec3d(1)] * 4

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),          # it0
            spec2d(P),                                      # theta (P, C)
            spec2d(1),                                      # acc count
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )


def survey_fused(spec: ModelSpec, obs: ObsData, times, y0_base, thetas, *,
                 substeps: int = 4, stepper: str = "dopri5",
                 tile_chains: int = 1024, interpret: bool = False):
    """Batched chi evaluation in one kernel (fused fit_survey) — also the
    parity oracle for the MH kernel's in-loop scorer."""
    P = len(spec.pnames)
    thetas = np.asarray(thetas, np.float32)
    N0 = thetas.shape[0]
    tile = int(tile_chains)
    N = int(-(-N0 // tile) * tile)
    if N > N0:
        thetas = np.concatenate(
            [thetas, np.tile(thetas[-1:], (N - N0, 1))], axis=0)
    plan = _build_plan(spec, obs, times, substeps)
    y0_key = tuple(float(v) for v in np.asarray(y0_base))
    fn = _cached_survey_call(spec, plan, y0_key, P, tile, N, stepper,
                             substeps, bool(interpret))
    return fn(jnp.asarray(thetas.T))[0, :N0]


@lru_cache(maxsize=64)
def _cached_survey_call(spec, plan, y0_key, P, tile, N, stepper, substeps,
                        interpret):
    sub = tile // _LANES
    shape = (sub, _LANES)
    step_fn = _dopri5_fixed_step if stepper == "dopri5" else _rk4_fixed_step
    score = _make_scorer_from_key(spec, plan, y0_key, step_fn, substeps)

    def kernel(theta_in, chi_out):
        theta = [theta_in[p].reshape(shape) for p in range(P)]
        chi, _ = score(theta, shape)
        chi_out[0] = chi.reshape(tile)

    return pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((P, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        interpret=interpret,
    )
