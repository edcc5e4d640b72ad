"""Fused Pallas particle-marginal MH kernel — the whole PMMH loop
(proposal, K-particle bootstrap filter, pseudo-marginal accept) in ONE
TPU dispatch.

Layout is the transpose of the fused MH kernel's: PARTICLES live on the
sublane axis and CHAINS on the lane axis, so each filter plane is a
(K, 128) VREG block per state. That orientation makes every reduction
the hardware wants to do cheap:

* per-chain weight normalization (max / logsumexp over particles) is a
  sublane reduction ending in a natural (1, 128) per-chain lane row;
* the systematic-resampling prefix sum is a log2(K) masked sublane-roll
  ladder;
* selection needs NO gather and NO transpose: output slot ``i`` copies
  particle ``j`` iff ``cum_{j-1} <= pos_i < cum_j``, so each of the K
  output rows is one masked sublane reduction of the particle plane —
  the same one-hot contraction the XLA path does on the MXU
  (samplers/pf.py), unrolled here as K VPU reductions with everything
  resident in registers/VMEM.

Chain state that persists across iterations is only (log-theta, chi,
accept count, log proposal scale) — particle planes are rebuilt from the
initial condition for every proposal, so the filter never touches HBM:
the XLA path's per-substep (C, K, S) array traffic and threefry calls
(the measured bottlenecks, BASELINE.md config 14) disappear entirely.
RNG is the counter-based per-lane SplitMix stream of ops/pallas_mh.py
keyed on the GLOBAL tile index (sharding-invariant), with a per-kernel
slot stride sized to the filter's draw count. The step schedule,
observation constants and dose plan are the SAME host-side `_build_plan`
the fused MH kernel compiles against.

Semantics match :func:`odelib_tpu.samplers.pf.pmmh` (likelihood-only or
prior-aware acceptance, burn-in Robbins-Monro proposal-scale adaptation
frozen for the recording phase, all-particles-dead -> -inf estimate ->
rejection) with a different — but equally counter-based — RNG stream, so
fused and XLA runs agree statistically, not bitwise. Reference: has no
stochastic models at all (/root/reference/ODElib/Framework.py:622-683
integrates one deterministic trajectory per likelihood).
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model import ModelSpec, ObsData
from .pallas_mh import (_LANES, _Rng, _assemble_params, _build_plan,
                        _kernel_logpdf, _log_ndtr_kernel,
                        _normalize_substeps, _static_prior,
                        _t_logcdf_kernel, kernel_priors_supported)

_TC = _LANES          # chains per tile = lane count


class _RngS(_Rng):
    """_Rng with a configurable per-iteration slot stride: the filter
    draws two slots per (substep, state) plane, which overflows the MH
    kernel's fixed 1024-slot budget on fine grids."""

    def __init__(self, shape, seed, program_id, tile, stride):
        super().__init__(shape, seed, program_id, tile)
        self._stride = int(stride)

    def bits(self, it):
        if self._slot >= self._stride:
            raise ValueError("PF kernel RNG slot stride exhausted (bug: "
                             "stride sized too small)")
        ctr = (it.astype(jnp.uint32) * jnp.uint32(self._stride)
               + jnp.uint32(self._slot))
        self._slot += 1
        from .pallas_mh import _mix
        return _mix(self._lane ^ _mix(ctr))

    def normal_pair(self, it):
        """BOTH Box-Muller halves for the price of one transcendental
        set (cos AND sin of the same angle) — the filter consumes
        hundreds of normal planes per iteration, so the discarded-sin
        convention of _Rng.normal would waste ~1/3 of the VPU's
        transcendental budget."""
        u1 = self.uniform(it)
        u2 = self.uniform(it)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        a = (2.0 * jnp.pi) * u2
        return r * jnp.cos(a), r * jnp.sin(a)


@lru_cache(maxsize=256)
def sde_supports_tiles(spec: ModelSpec) -> bool:
    """True when BOTH the drift and the diffusion trace elementwise in
    the kernel's (K, 128) tiled layout (mirrors rhs_supports_tiles)."""
    if spec.diffusion is None:
        return False
    try:
        shape = (8, _TC)
        theta_list = [jnp.zeros((1, _TC), jnp.float32)
                      for _ in range(spec.theta_size)]

        def f(y, *tl):
            ps = _assemble_params(spec, list(tl))
            a = jnp.stack(list(spec.rhs(0.0, y, ps)))
            b = jnp.stack(list(spec.diffusion(0.0, y, ps)))
            return a + b

        y = jnp.zeros((len(spec.snames),) + shape, jnp.float32)
        out = jax.eval_shape(f, y, *theta_list)
        return tuple(out.shape) == (len(spec.snames),) + shape
    except Exception:
        return False


def _plan_obs_grid_indices(plan):
    """Grid indices carrying at least one observation, ascending."""
    return [gi for gi in range(plan.n_grid) if plan.obs_after[gi]]


def _count_slots(plan, S, P_walked, n_obs):
    """Per-iteration RNG slot consumption (trace-time bookkeeping)."""
    return (2 * P_walked + 1            # proposal normals + accept u
            + 2 * S * len(plan.step_ts)  # filter increments (Box-Muller)
            + n_obs)                     # one resample uniform per block


@lru_cache(maxsize=64)
def _cached_pf_grid(spec, plan, y0_key, P, K, C, L_SEG, n_segs, nits,
                    burnin, walk, rwalk_std, num, interpret, priors,
                    use_adapt, target_accept, adapt_rate, milstein=False,
                    R_chunk=None, resume=False):
    """Build (once per static config) the whole-run PMMH pallas_call.

    ``R_chunk``: checkpointed-chunk mode (the _cached_mh_grid pattern) —
    covers R_chunk proposals from global iteration ``it_base+1``, emits
    the P+3 chain-state planes (log-theta, chi, accept count, log
    proposal scale) as an extra output; ``resume=True`` loads them from
    an extra input. Counter-based RNG on the global iteration keeps
    chunked runs bitwise identical to the single dispatch."""
    stateful = R_chunk is not None
    NS = P + 3
    S = len(spec.snames)
    row_shape = (1, _TC)
    plane = (K, _TC)
    obs_model, obs_param = spec.obs_model, spec.obs_param
    init_pidx = spec.init_pidx
    y0_base = tuple(float(v) for v in y0_key)
    obs_gis = _plan_obs_grid_indices(plan)
    last_obs_gi = obs_gis[-1] if obs_gis else -1
    LOGK = float(np.log(K))
    stride = 1 << int(math.ceil(math.log2(max(
        2, _count_slots(plan, S, sum(1 for w in walk if w != 0.0),
                        len(obs_gis))))))
    if float(nits) * stride >= 2.0 ** 32:
        raise ValueError("nits * RNG stride exceeds the 32-bit counter — "
                         "use the XLA PMMH sampler for this run length")

    lps = [None] * P if priors is None else [_kernel_logpdf(d)
                                             for d in priors]
    use_priors = any(f is not None for f in lps)

    def logprior(theta_rows):
        tot = jnp.zeros(row_shape, jnp.float32)
        for f, th in zip(lps, theta_rows):
            if f is not None:
                tot = tot + f(th)
        return tot

    def weigh(y, gi, chi_b):
        """Accumulate the block's per-particle chi: the MH scorer's
        contrib formulas (ops/pallas_mh.py:_make_scorer) on (K, TC)
        particle planes."""
        for mem, lab, lsig, ab, cen in plan.obs_after[gi]:
            pred = sum(y[m] for m in mem) if len(mem) > 1 else y[mem[0]]
            if cen and obs_model == "student_t":
                z = (lab - jnp.log(pred)) / lsig
                if cen == 2:
                    z = -z
                chi_b = chi_b - _t_logcdf_kernel(z, obs_param)
            elif obs_model == "student_t":
                t = (lab - jnp.log(pred)) / lsig
                chi_b = chi_b + (0.5 * (obs_param + 1.0)
                                 * jnp.log1p(t * t / obs_param))
            elif obs_model == "poisson":
                term = pred - (ab * jnp.log(pred) if ab > 0 else 0.0)
                chi_b = chi_b + jnp.where(pred >= 0, term, jnp.nan)
            elif obs_model == "negbinom":
                r = obs_param
                term = r * jnp.log1p(pred / r)
                if ab > 0:
                    term = term + ab * jnp.log1p(r / pred)
                chi_b = chi_b + jnp.where(pred >= 0, term, jnp.nan)
            elif cen:
                z = (lab - jnp.log(pred)) / lsig
                if cen == 2:
                    z = -z
                chi_b = chi_b - _log_ndtr_kernel(z)
            else:
                c = jnp.log(pred)
                chi_b = chi_b + (lab - c) ** 2 / (2.0 * lsig * lsig)
        return chi_b

    def apply_dose(y, gi):
        if not plan.dose_after or not plan.dose_after[gi]:
            return y
        adds = [0.0] * S
        for s_idx, amt in plan.dose_after[gi]:
            adds[s_idx] += amt
        return [y[s] + adds[s] if adds[s] != 0.0 else y[s]
                for s in range(S)]

    def resample_block(y, gi, loglik, rng, it):
        """Weight + normalize + (systematic) resample one observation
        block. Returns (new particle planes, updated (1,TC) loglik)."""
        chi_b = weigh(y, gi, jnp.zeros(plane, jnp.float32))
        # dead particle -> weight 0 (NaN/inf never propagates: the
        # comparisons below are False for NaN)
        finite = (chi_b == chi_b) & (chi_b < 1e30)
        logw = jnp.where(finite, -chi_b, -jnp.inf)
        m = jnp.max(logw, axis=0, keepdims=True)              # (1, TC)
        lw = logw - m
        w = jnp.where(lw > -60.0, jnp.exp(lw), 0.0)           # NaN -> 0
        sumw = jnp.sum(w, axis=0, keepdims=True)
        loglik = loglik + m + jnp.log(sumw) - LOGK
        if gi == last_obs_gi:
            return y, loglik       # nothing downstream needs the cloud
        # inclusive prefix sum over particles: log2(K) masked sublane
        # rolls (pltpu.roll is circular; rows < d take 0)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, plane, 0)
        cum = w
        d = 1
        while d < K:
            rolled = pltpu.roll(cum, d, 0)
            cum = cum + jnp.where(row_iota >= d, rolled, 0.0)
            d *= 2
        u = rng.uniform(it)[0:1, :]
        total = cum[K - 1:K, :]
        pos = ((row_iota.astype(jnp.float32) + u) * (1.0 / K)) * total
        # lower edge = the EXACT shifted cumsum, not cum - w: in f32
        # cum[j] - w[j] != cum[j-1] by an ulp, which can make adjacent
        # selection intervals overlap (a two-particle sum row) or gap
        # (a zeroed particle). The masked roll tiles [0, total) exactly.
        cumprev = jnp.where(row_iota >= 1, pltpu.roll(cum, 1, 0), 0.0)
        # selection, 8 output rows per pass: sel (8, K, TC) contracted
        # over the source-particle axis -> one (8, TC) f32 tile each
        rows = [[] for _ in range(S)]
        for c0 in range(0, K, 8):
            pos_c = pos[c0:c0 + 8, :]                         # (8, TC)
            sel = ((pos_c[:, None, :] >= cumprev[None, :, :])
                   & (pos_c[:, None, :] < cum[None, :, :]))   # (8, K, TC)
            for s in range(S):
                rows[s].append(jnp.sum(
                    jnp.where(sel, y[s][None, :, :], 0.0), axis=1))
        return [jnp.concatenate(rows[s], axis=0)
                for s in range(S)], loglik

    def particle_filter(theta_rows, rng, it):
        """chi estimate (1, TC) for one proposal across the tile."""
        ps = _assemble_params(spec, theta_rows)
        y = [jnp.broadcast_to(
                theta_rows[init_pidx[s]] if init_pidx[s] >= 0
                else jnp.full(row_shape, y0_base[s], jnp.float32),
                plane)
             for s in range(S)]
        loglik = jnp.zeros(row_shape, jnp.float32)
        stash = []

        def xi(it_):
            # consume Box-Muller pairs fully (trace-time stash)
            if stash:
                return stash.pop()
            a, b = rng.normal_pair(it_)
            stash.append(b)
            return a

        if plan.obs_after[0]:
            y, loglik = resample_block(y, 0, loglik, rng, it)
        y = apply_dose(y, 0)
        for t, h, gi in plan.step_ts:
            sqrt_h = float(np.sqrt(h))
            ys = jnp.stack(y)
            f = list(spec.rhs(t, ys, ps))
            g = list(spec.diffusion(t, ys, ps))
            x_s = [xi(it) for _ in range(S)]
            y = [y[s] + h * f[s] + sqrt_h * g[s] * x_s[s]
                 for s in range(S)]
            if milstein:
                # Milstein correction 0.5*g*(dg_s/dy_s)*(xi^2-1)*h —
                # the diagonal diffusion gradient via S one-hot jvps of
                # the traced diffusion (elementwise in the tiled layout,
                # so each jvp is a handful of VPU FMAs; same noise
                # draws as Euler, so the Euler bitstream is unchanged).
                # Matches the XLA form samplers/pf.py flat_step /
                # ops/sde.py milstein.
                def _gfun(yy, _t=t):
                    return jnp.stack(list(spec.diffusion(_t, yy, ps)))
                for s in range(S):
                    # one-hot tangent by STATIC stacking — .at[s].set
                    # would lower to a scatter, which Mosaic has no
                    # TPU lowering for (s is a Python int here)
                    tang = jnp.stack(
                        [jnp.ones_like(ys[i]) if i == s
                         else jnp.zeros_like(ys[i]) for i in range(S)])
                    _, jv = jax.jvp(_gfun, (ys,), (tang,))
                    y[s] = y[s] + (0.5 * h) * g[s] * jv[s] \
                        * (x_s[s] * x_s[s] - 1.0)
            if gi >= 0:
                if plan.obs_after[gi]:
                    y, loglik = resample_block(y, gi, loglik, rng, it)
                y = apply_dose(y, gi)
        return -loglik

    def kernel(*refs):
        if stateful and resume:
            (seed_ref, off_ref, itb_ref, state_in, theta_in, theta_out,
             chi_out, ar_out, state_out, lt_s, chi_s, acc_s,
             lsc_s) = refs
        elif stateful:
            (seed_ref, off_ref, itb_ref, theta_in, theta_out, chi_out,
             ar_out, state_out, lt_s, chi_s, acc_s, lsc_s) = refs
            state_in = None
        else:
            (seed_ref, off_ref, theta_in, theta_out, chi_out, ar_out,
             lt_s, chi_s, acc_s, lsc_s) = refs
            itb_ref = state_in = state_out = None
        # both instances constructed at kernel top level (program_id is
        # not available inside lax control-flow bodies in interpret
        # mode); draw SITES get static slot ids at trace time, so every
        # fori iteration reuses the same slots with a different `it` —
        # the _Rng discipline of ops/pallas_mh.py. The init instance
        # only ever draws at it=0; the loop instance at it>=1.
        # Per-chain values are (1, TC) rows internally; every block-I/O
        # boundary pads the sublane dim to 8 (Mosaic's f32 min tile) by
        # row-replication on store / row-0 reads on load.
        pid = pl.program_id(0) + off_ref[0]
        # Lane ids inside one tile span the full (K, _TC) particle plane
        # (K * _TC ids), so the per-tile program-id stride must be the
        # plane size — NOT the chain count _TC — or neighboring tiles'
        # particle noise fields would be shifted copies of each other,
        # correlating chains' likelihood estimates across tiles.
        rng0 = _RngS(plane, seed_ref[0], pid, K * _TC, stride)
        rng = _RngS(plane, seed_ref[0], pid, K * _TC, stride)
        j = pl.program_id(1)
        rep = lambda v: jnp.broadcast_to(v, (8, _TC))

        @pl.when(j == 0)
        def _init():
            if stateful and resume:
                for p in range(P):
                    lt_s[p] = state_in[0, p]
                chi_s[...] = state_in[0, P]
                acc_s[...] = state_in[0, P + 1]
                lsc_s[...] = state_in[0, P + 2]
                return
            theta = [theta_in[0, p, 0:1, :] for p in range(P)]
            it0_ = jnp.asarray(0, jnp.int32)
            chi0 = particle_filter(theta, rng0, it0_)
            for p in range(P):
                lt_s[p] = rep(jnp.log(theta[p]))
            chi_s[...] = rep(chi0)
            acc_s[...] = jnp.zeros((8, _TC), jnp.float32)
            lsc_s[...] = jnp.zeros((8, _TC), jnp.float32)

        it0 = 1 + j * L_SEG
        if stateful:
            it0 = it0 + itb_ref[0]

        def body(i, carry):
            lt, chi, acc, lsc = carry
            it = it0 + i
            active = it < nits
            if stateful:
                # rows past this CHUNK belong to the next chunk
                active = active & (j * L_SEG + i < R_chunk)
            std = rwalk_std * jnp.exp(lsc)
            prop = [lt[p] + (std * walk[p]) * rng.normal(it)[0:1, :]
                    if walk[p] != 0.0 else lt[p]
                    for p in range(P)]
            theta_p = [jnp.exp(x) for x in prop]
            u = rng.uniform(it)[0:1, :]
            chi_new = particle_filter(theta_p, rng, it)
            log_ratio = chi - chi_new
            if use_priors:
                log_ratio = log_ratio + (logprior(theta_p)
                                         - logprior([jnp.exp(x)
                                                     for x in lt]))
            accept = (jnp.exp(log_ratio) > u) & active
            lt = [jnp.where(accept, pn, lo) for pn, lo in zip(prop, lt)]
            chi = jnp.where(accept, chi_new, chi)
            acc = acc + accept.astype(jnp.float32)
            if use_adapt:
                lsc_new = lsc + adapt_rate * (
                    accept.astype(jnp.float32) - target_accept)
                lsc = jnp.where((it <= burnin) & active, lsc_new, lsc)
            for p in range(P):
                theta_out[0, i, p] = rep(jnp.exp(lt[p]))
            chi_out[0, i, 0] = rep(chi)
            ar_out[0, i, 0] = rep(acc / it.astype(jnp.float32))
            return lt, chi, acc, lsc

        carry0 = ([lt_s[p, 0:1, :] for p in range(P)], chi_s[0:1, :],
                  acc_s[0:1, :], lsc_s[0:1, :])
        lt, chi, acc, lsc = jax.lax.fori_loop(0, L_SEG, body, carry0)
        for p in range(P):
            lt_s[p] = rep(lt[p])
        chi_s[...] = rep(chi)
        acc_s[...] = rep(acc)
        lsc_s[...] = rep(lsc)
        if stateful:
            # state block's index map ignores j (resident across the
            # segment axis); the last write wins
            for p in range(P):
                state_out[0, p] = rep(lt[p])
            state_out[0, P] = rep(chi)
            state_out[0, P + 1] = rep(acc)
            state_out[0, P + 2] = rep(lsc)

    n_tiles = C // _TC

    padded_R = n_segs * L_SEG
    out_shapes = [
        jax.ShapeDtypeStruct((n_tiles, padded_R, P, 8, _TC), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, padded_R, 1, 8, _TC), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, padded_R, 1, 8, _TC), jnp.float32),
    ]

    def spec_rec(k):
        return pl.BlockSpec((1, L_SEG, k, 8, _TC),
                            lambda i, j: (i, j, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec_state():
        return pl.BlockSpec((1, NS, 8, _TC), lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),      # global tile offset
    ]
    out_specs = [spec_rec(P), spec_rec(1), spec_rec(1)]
    if stateful:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # it_base
        if resume:
            in_specs.append(spec_state())           # incoming chain state
        out_shapes = out_shapes + [
            jax.ShapeDtypeStruct((n_tiles, NS, 8, _TC), jnp.float32)]
        out_specs = out_specs + [spec_state()]
    in_specs.append(
        pl.BlockSpec((1, P, 8, _TC), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM))      # theta0

    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_segs),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((P, 8, _TC), jnp.float32),       # log-theta
            pltpu.VMEM((8, _TC), jnp.float32),          # chi
            pltpu.VMEM((8, _TC), jnp.float32),          # accept count
            pltpu.VMEM((8, _TC), jnp.float32),          # log prop scale
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.ARBITRARY, pltpu.ARBITRARY)),
        interpret=interpret,
    )


@lru_cache(maxsize=64)
def _cached_pf_run(spec, plan, y0_key, P, K, C, L_SEG, n_segs, nits,
                   burnin, walk, rwalk_std, num, interpret, C0, mesh,
                   priors, use_adapt, target_accept, adapt_rate,
                   milstein=False):
    """One jitted program: PF pallas kernel + record layout, optionally
    shard_map'd over a 1-D chain mesh (same pattern as _cached_mh_run)."""
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    C_local = C // n_dev
    inner = _cached_pf_grid(spec, plan, y0_key, P, K, C_local, L_SEG,
                            n_segs, nits, burnin, walk, rwalk_std, num,
                            interpret, priors, use_adapt, target_accept,
                            adapt_rate, milstein)
    padded_R = n_segs * L_SEG
    lo, hi = burnin, nits - 1

    def local_run(seed_arr, off_arr, theta_tiles):
        # records: (n_tiles, padded_R, k, 8, TC) with identical sublane
        # rows; keep row 0 and flatten (tile, lane) -> chain
        th_r, chi_r, ar_r = inner(seed_arr, off_arr, theta_tiles)
        th = th_r[:, :, :, 0, :]                 # (tiles, R, P, TC)
        theta_s = jnp.transpose(th, (0, 3, 1, 2)).reshape(
            C_local, padded_R, P)[:, lo:hi]
        sq = lambda a: jnp.transpose(
            a[:, :, 0, 0, :], (0, 2, 1)).reshape(
                C_local, padded_R)[:, lo:hi]
        return theta_s, sq(chi_r), sq(ar_r)

    if mesh is None:
        def run(seed_arr, theta_tiles):
            outs = local_run(seed_arr, jnp.zeros((1,), jnp.int32),
                             theta_tiles)
            return tuple(o[:C0] for o in outs)
    else:
        from jax.sharding import PartitionSpec as PS
        axis = mesh.axis_names[0]
        tiles_local = C_local // _TC

        def shard_body(seed_arr, theta_tiles):
            off = (jax.lax.axis_index(axis) * tiles_local)[None].astype(
                jnp.int32)
            return local_run(seed_arr, off, theta_tiles)

        smap = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(PS(), PS(axis, None, None, None)),
            out_specs=tuple([PS(axis)] * 3), check_vma=False)

        def run(seed_arr, theta_tiles):
            return tuple(o[:C0] for o in smap(seed_arr, theta_tiles))

    return jax.jit(run)


@lru_cache(maxsize=64)
def _cached_pf_run_chunk(spec, plan, y0_key, P, K, C, L_SEG, n_segs,
                         nits, burnin, walk, rwalk_std, num, interpret,
                         C0, mesh, priors, use_adapt, target_accept,
                         adapt_rate, R_chunk, resume, milstein=False):
    """Jitted program for ONE PMMH checkpoint chunk (mirrors
    _cached_mh_run_chunk)."""
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    C_local = C // n_dev
    inner = _cached_pf_grid(spec, plan, y0_key, P, K, C_local, L_SEG,
                            n_segs, nits, burnin, walk, rwalk_std, num,
                            interpret, priors, use_adapt, target_accept,
                            adapt_rate, milstein, R_chunk=R_chunk,
                            resume=resume)
    padded_R = n_segs * L_SEG

    def local_run(seed_arr, off_arr, itb_arr, theta_tiles, state_in):
        ins = (seed_arr, off_arr, itb_arr)
        if resume:
            ins = ins + (state_in,)
        th_r, chi_r, ar_r, state = inner(*ins, theta_tiles)
        th = th_r[:, :, :, 0, :]
        theta_s = jnp.transpose(th, (0, 3, 1, 2)).reshape(
            C_local, padded_R, P)[:, :R_chunk]
        sq = lambda a: jnp.transpose(
            a[:, :, 0, 0, :], (0, 2, 1)).reshape(
                C_local, padded_R)[:, :R_chunk]
        return theta_s, sq(chi_r), sq(ar_r), state

    if mesh is None:
        def run(seed_arr, itb_arr, theta_tiles, state_in=None):
            outs = local_run(seed_arr, jnp.zeros((1,), jnp.int32),
                             itb_arr, theta_tiles, state_in)
            return tuple(o[:C0] for o in outs[:3]) + (outs[3],)
    else:
        from jax.sharding import PartitionSpec as PS
        axis = mesh.axis_names[0]
        tiles_local = C_local // _TC
        state_spec = PS(axis, None, None, None)

        def shard_body(seed_arr, itb_arr, theta_tiles, state_in):
            off = (jax.lax.axis_index(axis) * tiles_local)[None].astype(
                jnp.int32)
            return local_run(seed_arr, off, itb_arr, theta_tiles,
                             state_in)

        in_specs = (PS(), PS(), PS(axis, None, None, None),
                    state_spec if resume else PS())
        smap = jax.shard_map(
            shard_body, mesh=mesh, in_specs=in_specs,
            out_specs=tuple([PS(axis)] * 3) + (state_spec,),
            check_vma=False)

        def run(seed_arr, itb_arr, theta_tiles, state_in=None):
            if state_in is None:
                state_in = jnp.zeros((0,), jnp.float32)
            outs = smap(seed_arr, itb_arr, theta_tiles, state_in)
            return tuple(o[:C0] for o in outs[:3]) + (outs[3],)

    return jax.jit(run)


def _pf_fused_chunked(spec, plan, y0_key, P, K, C, nits, burnin, walk,
                      rwalk_std, num, interpret, C0, mesh, priors,
                      use_adapt, target_accept, adapt_rate, theta_tiles,
                      seed, checkpoint_every, checkpoint_path,
                      resume_from, _stop_after_chunks=None,
                      config_token="", l_seg_cap=64, milstein=False):
    """Checkpointed fused PMMH: chunks of ``checkpoint_every`` proposals,
    chain state persisted after each chunk (npz, atomic rename), bitwise
    resume — the _mh_fused_chunked discipline for the costliest
    per-iteration sampler in the framework."""
    import os

    R = nits - 1
    E = int(checkpoint_every)
    if E < 1:
        raise ValueError("checkpoint_every must be >= 1")
    n_chunks = -(-R // E)
    sig = repr(("pmmh-fused", spec.pnames, P, K, C, nits, int(burnin), E,
                walk, rwalk_std, num, C0, int(seed), priors,
                bool(use_adapt), float(target_accept), float(adapt_rate),
                None if mesh is None else int(mesh.devices.size),
                str(config_token), bool(milstein)))
    seed_arr = jnp.asarray([seed], jnp.int32)

    k0, state, recs = 0, None, []
    if resume_from:
        with np.load(resume_from, allow_pickle=False) as z:
            saved_sig = bytes(z["sig"]).decode()
            if saved_sig != sig:
                raise ValueError(
                    "checkpoint was written by a different PMMH "
                    f"configuration:\n  saved: {saved_sig}\n  this:  {sig}")
            k0 = int(z["next_chunk"])
            state = z["state"]
            if k0 > 0:
                recs = [tuple(z[f"rec{i}"] for i in range(3))]

    for k in range(k0, n_chunks):
        R_chunk = min(E, R - k * E)
        L_SEG = max(1, min(int(l_seg_cap), R_chunk))
        n_segs = -(-R_chunk // L_SEG)
        run = _cached_pf_run_chunk(
            spec, plan, y0_key, P, K, C, L_SEG, n_segs, nits, burnin,
            walk, rwalk_std, num, interpret, C0, mesh, priors, use_adapt,
            target_accept, adapt_rate, R_chunk, resume=(k > 0),
            milstein=milstein)
        itb = jnp.asarray([k * E], jnp.int32)
        if k == 0:
            outs = run(seed_arr, itb, theta_tiles)
        else:
            outs = run(seed_arr, itb, theta_tiles, jnp.asarray(state))
        rec = tuple(np.asarray(o) for o in outs[:3])
        state = np.asarray(outs[3])
        recs.append(rec)
        if checkpoint_path:
            merged = tuple(np.concatenate([r[i] for r in recs], axis=1)
                           for i in range(3))
            recs = [merged]
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez_compressed(
                    f, sig=np.frombuffer(sig.encode(), np.uint8),
                    next_chunk=np.asarray(k + 1), state=state,
                    **{f"rec{i}": merged[i] for i in range(3)})
            os.replace(tmp, checkpoint_path)
        if (_stop_after_chunks is not None
                and k + 1 - k0 >= _stop_after_chunks and k + 1 < n_chunks):
            return None

    th, chi, ar = (np.concatenate([r[i] for r in recs], axis=1)
                   for i in range(3))
    from .. import stats as jstats
    from ..samplers.pf import PMMHOutput
    iterations = jnp.arange(1, nits)[burnin:]
    chi_b = jnp.asarray(chi[:, burnin:])
    return PMMHOutput(theta=jnp.asarray(th[:, burnin:]), chi=chi_b,
                      aic=jstats.AIC(chi_b, num),
                      acceptance_ratio=jnp.asarray(ar[:, burnin:]),
                      iteration=iterations)


_K_MAX = 512   # particle sublane planes: S*(K,128) f32 in VMEM + the
               # (8,K,128) selection temp — 512 keeps the worst case
               # well under the ~16 MB VMEM budget for small S


def pmmh_supported(spec: ModelSpec, n_particles: int,
                   sde_method: str) -> bool:
    """Static eligibility of the fused kernel for this PMMH run."""
    return (spec.diffusion is not None
            and sde_method in ("euler", "milstein")
            and 8 <= int(n_particles) <= _K_MAX
            and int(n_particles) % 8 == 0
            and sde_supports_tiles(spec))


def pmmh_fused(spec: ModelSpec, obs: ObsData, times, y0_base, theta0,
               seed: int, *, nits: int = 1000,
               burnin: Optional[int] = None, walk_mask=None,
               rwalk_std: float = 0.05, n_particles: int = 128,
               substeps: int = 4, sde_method: str = "euler",
               priors=None, adapt_proposal: bool = False,
               target_accept: float = 0.3, adapt_rate: float = 0.05,
               interpret: bool = False, mesh=None,
               checkpoint_every: Optional[int] = None,
               checkpoint_path: Optional[str] = None,
               resume_from: Optional[str] = None, config_token: str = "",
               _stop_after_chunks: Optional[int] = None):
    """Run C chains of particle-marginal MH fully inside a Pallas kernel.

    ``theta0``: (C, P) float32 flat theta slots (C padded to a multiple
    of 128 chains per device internally). ``obs`` must be a HOST
    (numpy) ObsData — observation constants compile into the kernel.
    Priors are per-slot static distribution objects like the MH
    kernel's. Returns the same record structure as
    :func:`odelib_tpu.samplers.pf.pmmh` (PMMHOutput).
    """
    if spec.diffusion is None:
        raise ValueError("pmmh_fused requires a spec with diffusion=")
    if sde_method not in ("euler", "milstein"):
        raise ValueError("the fused PMMH kernel integrates "
                         "Euler-Maruyama or Milstein; use the XLA "
                         f"sampler for sde_method={sde_method!r}")
    milstein = sde_method == "milstein"
    K = int(n_particles)
    if not (8 <= K <= _K_MAX and K % 8 == 0):
        raise ValueError(f"fused PMMH needs n_particles in [8, {_K_MAX}]"
                         " and a multiple of 8 (particles are sublanes);"
                         " use the XLA sampler otherwise")
    if burnin is None:
        burnin = int(nits / 2)
    R = nits - 1
    if R <= burnin:
        raise ValueError(f"nits={nits} leaves no recorded iterations "
                         f"after burnin={burnin}")
    P = spec.theta_size
    theta0 = np.asarray(theta0, np.float32)
    C0 = theta0.shape[0]
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    if n_dev == 1:
        mesh = None
    C = int(-(-C0 // (_TC * n_dev)) * (_TC * n_dev))
    if C > C0:
        theta0 = np.concatenate(
            [theta0, np.tile(theta0[-1:], (C - C0, 1))], axis=0)
    num = int(np.count_nonzero(theta0[0]))
    if walk_mask is None:
        walk_mask = [1.0] * P
    walk = tuple(float(w) for w in np.asarray(walk_mask).ravel())

    substeps = _normalize_substeps(substeps, len(np.asarray(times)) - 1)
    plan = _build_plan(spec, obs, times, substeps)
    y0_key = tuple(float(v) for v in np.asarray(y0_base))

    if priors is not None:
        priors = tuple(priors)
        if len(priors) != P:
            raise ValueError(f"priors must have one entry per theta "
                             f"slot ({P}), got {len(priors)}")
        if not kernel_priors_supported(priors):
            raise ValueError("unsupported prior family for the fused "
                             "kernel; use the XLA sampler")
        if not any(d is not None for d in priors):
            priors = None
        else:
            priors = tuple(None if d is None else _static_prior(d)
                           for d in priors)

    # record block is (L_SEG, P+2, 8, TC) double-buffered in VMEM
    L_SEG = max(1, min(64, R,
                       (2 * 1024 * 1024) // ((P + 2) * 8 * _TC * 4)))
    n_segs = -(-R // L_SEG)
    # kernel-native layout: (n_tiles, P, 8, TC) — chains are LANES;
    # the sublane dim is row-replicated padding to the f32 min tile
    arr = theta0.T.reshape(P, C // _TC, _TC).transpose(1, 0, 2)
    theta_tiles = jnp.asarray(
        np.broadcast_to(arr[:, :, None, :],
                        (C // _TC, P, 8, _TC)).copy())

    if checkpoint_every is not None or resume_from is not None:
        return _pf_fused_chunked(
            spec, plan, y0_key, P, K, C, int(nits), int(burnin), walk,
            float(rwalk_std), num, bool(interpret), C0, mesh, priors,
            bool(adapt_proposal), float(target_accept),
            float(adapt_rate), theta_tiles, int(seed),
            checkpoint_every if checkpoint_every is not None else nits,
            checkpoint_path, resume_from, _stop_after_chunks,
            config_token=config_token, l_seg_cap=L_SEG,
            milstein=milstein)

    run = _cached_pf_run(spec, plan, y0_key, P, K, C, L_SEG, n_segs,
                         int(nits), int(burnin), walk, float(rwalk_std),
                         num, bool(interpret), C0, mesh, priors,
                         bool(adapt_proposal), float(target_accept),
                         float(adapt_rate), milstein)
    theta_s, chi_s, ar_s = run(jnp.asarray([seed], jnp.int32),
                               theta_tiles)
    from .. import stats as jstats
    from ..samplers.pf import PMMHOutput
    iterations = jnp.arange(1, nits)[burnin:]
    return PMMHOutput(theta=theta_s, chi=chi_s,
                      aic=jstats.AIC(chi_s, num),
                      acceptance_ratio=ar_s, iteration=iterations)
