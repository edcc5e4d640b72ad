#!/usr/bin/env python3
"""Roofline analysis of the fused MH kernel: how close is the headline
chain-steps/sec number to this chip's speed of light?

Method: the kernel's per-iteration body (proposal -> unrolled fixed-step
Dopri5 over the compact observation grid -> chi/R^2 scoring -> accept/
reject -> record) is re-composed here as a pure function on one (8, 128)
chain tile — the same `_Rng`, `_make_scorer` and stepper objects the
kernel traces — and counted op-by-op from its jaxpr. Every elementwise
primitive contributes numel(output) VPU lane-ops (float and integer: the
VPU executes both). The analysis then converts the measured end-to-end
rate (bench.py) into sustained lane-ops/s and reports utilization
against the chip's published vector-unit peak.

Why this matters for the design (SURVEY.md section 7): the model state is
a length-2..5 vector, so there is NO matrix contraction anywhere — the
MXU is structurally idle and the kernel's ceiling is the VPU, not the
usual matmul roofline. The HBM side is negligible by construction: the
only HBM traffic in the hot loop is the recorded posterior row,
(P+4) * 4 bytes per chain-step.

Peak figures (TPU v5e / "v5 lite", public): VPU = 4 ALUs x (8x128) lanes
per core at ~0.94 GHz => ~3.85e12 lane-ops/s issue rate (each ALU slot
retires one lane-op; an FMA retires two FLOPs in one slot, so the
*FLOP* peak is 2x that for perfectly fused mul-adds). Utilization is
reported against the conservative issue-rate peak; a jaxpr mul+add pair
that Mosaic fuses into one FMA makes true occupancy higher than printed.

Prints one JSON line; run on the real chip for the measured rate (falls
back to the recorded BENCH value when offline).
"""
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# elementwise primitives the VPU executes, one lane-op per output element
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "max", "min", "neg", "abs", "sign",
    "and", "or", "xor", "not", "shift_right_logical", "shift_left",
    "shift_right_arithmetic", "rem", "floor", "ceil", "round",
    "gt", "lt", "ge", "le", "eq", "ne", "select_n", "convert_element_type",
    "integer_pow", "square",
}
# transcendentals lower to multi-op polynomial/range-reduction sequences on
# the VPU; count a conservative fixed cost per element
_TRANSCENDENTAL = {"exp": 6, "log": 6, "sqrt": 4, "rsqrt": 4, "cos": 8,
                   "sin": 8, "tanh": 8, "erf": 8, "logistic": 8, "pow": 12}
_FREE = {"broadcast_in_dim", "reshape", "iota", "copy", "stop_gradient",
         "squeeze", "slice", "concatenate", "transpose", "pjit",
         "custom_jvp_call", "custom_vjp_call"}


def _count_jaxpr(jaxpr):
    """(lane_ops, float_flops) over a ClosedJaxpr, recursing into calls."""
    ops = flops = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("pjit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat", "checkpoint"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                if hasattr(inner, "jaxpr"):
                    o, f = _count_jaxpr(inner.jaxpr)
                else:
                    o, f = _count_jaxpr(inner)
                ops += o
                flops += f
            continue
        n = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars
                if hasattr(v.aval, "shape"))
        if name in _TRANSCENDENTAL:
            ops += n * _TRANSCENDENTAL[name]
            flops += n * _TRANSCENDENTAL[name]
        elif name in _ELEMENTWISE:
            ops += n
            is_float = any(
                hasattr(v.aval, "dtype")
                and np.issubdtype(v.aval.dtype, np.floating)
                for v in eqn.outvars)
            if is_float:
                flops += n
        elif name not in _FREE:
            # unknown primitive: count one lane-op per element, flag it
            ops += n
    return ops, flops


def build_iteration_fn():
    """The fused kernel's per-iteration math on one (8,128) tile, as a
    pure function (mirrors ops/pallas_mh.py kernel `body`)."""
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from odelib_tpu.ops.pallas_mh import (_DEF_SUB, _LANES, _Rng,
                                          _FIXED_STEPPERS, _build_plan,
                                          _make_scorer)

    spec, obs_host, times_fit, y0 = bench_mod.build_problem()
    from odelib_tpu.ops.pallas_mh import _normalize_substeps
    substeps = _normalize_substeps(4, len(np.asarray(times_fit)) - 1)
    plan = _build_plan(spec, obs_host, times_fit, substeps)
    score = _make_scorer(spec, plan, np.asarray(y0),
                         _FIXED_STEPPERS["dopri5"])
    shape = (_DEF_SUB, _LANES)
    P = spec.theta_size
    rwalk_std, num = 0.05, P

    def one_iteration(logtheta, chi, rsq, acc_count, seed, it):
        rng = _Rng(shape, seed, jnp.int32(0), _DEF_SUB * _LANES)
        prop = [lt + rwalk_std * rng.normal(it) for lt in logtheta]
        theta_p = [jnp.exp(lt) for lt in prop]
        chi_new, rsq_new = score(theta_p, shape)
        u = rng.uniform(it)
        accept = jnp.exp(chi - chi_new) > u
        logtheta = [jnp.where(accept, pn, lo)
                    for pn, lo in zip(prop, logtheta)]
        chi = jnp.where(accept, chi_new, chi)
        rsq = jnp.where(accept, rsq_new, rsq)
        acc_count = acc_count + accept.astype(jnp.float32)
        recs = ([jnp.exp(lt) for lt in logtheta], chi, rsq,
                2.0 * chi + 2.0 * num, acc_count / it.astype(jnp.float32))
        return logtheta, chi, rsq, acc_count, recs

    lt0 = [jnp.zeros(shape, jnp.float32) for _ in range(P)]
    z = jnp.zeros(shape, jnp.float32)
    args = (lt0, z, z, z, jnp.int32(7), jnp.float32(3.0))
    jaxpr = jax.make_jaxpr(one_iteration)(*args)
    return jaxpr, shape, P, plan


def main():
    jaxpr, shape, P, plan = build_iteration_fn()
    lane_ops, flops = _count_jaxpr(jaxpr.jaxpr)
    tile_elems = int(np.prod(shape))
    ops_per_chain_step = lane_ops / tile_elems
    flops_per_chain_step = flops / tile_elems

    n_steps = len(plan.step_ts)

    # measured end-to-end rate: prefer a fresh run on the real chip
    rate = None
    try:
        import jax
        if jax.default_backend() not in ("cpu",):
            import io
            import contextlib
            import bench as bench_mod
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                bench_mod.main()
            rate = json.loads(buf.getvalue())["value"]
    except Exception:
        rate = None
    if rate is None:
        for fname in ("BENCH_r02.json",):
            p = os.path.join(ROOT, fname)
            if os.path.exists(p):
                with open(p) as f:
                    rate = json.load(f)["value"]
                break
    if rate is None:
        raise SystemExit("no measured rate available")

    sustained_ops = rate * ops_per_chain_step
    # v5e vector-unit issue peak: 4 ALUs x 1024 lanes x ~0.94 GHz
    peak_issue = 4 * 8 * 128 * 0.94e9
    util = sustained_ops / peak_issue

    # HBM side: the only hot-loop traffic is the posterior record row
    hbm_bytes_per_step = (P + 4) * 4
    hbm_gbps = rate * hbm_bytes_per_step / 1e9

    result = {
        "metric": "fused MH kernel VPU roofline (lane-op utilization of "
                  "the v5e vector-unit issue peak)",
        "value": round(util, 3),
        "unit": "fraction of VPU issue peak (FMA fusion raises true "
                "occupancy above this)",
        "vs_baseline": None,
        "lane_ops_per_chain_step": round(ops_per_chain_step, 1),
        "float_flops_per_chain_step": round(flops_per_chain_step, 1),
        "rk_steps_per_iteration": n_steps,
        "measured_chain_steps_per_s": rate,
        "sustained_vpu_ops_per_s": round(sustained_ops / 1e12, 3),
        "vpu_issue_peak_ops_per_s": round(peak_issue / 1e12, 3),
        "hbm_record_traffic_gb_per_s": round(hbm_gbps, 2),
        "hbm_peak_gb_per_s": 819,
        "note": "structurally VPU-bound: the ODE state is a 2-vector, no "
                "matrix contraction exists, the MXU is idle by problem "
                "shape; HBM traffic is only the recorded posterior rows "
                "(<1% of peak bandwidth) — the kernel runs out of VMEM/"
                "registers otherwise",
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
