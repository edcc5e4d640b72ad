"""Chain-parallel execution over a TPU mesh.

The reference's only parallelism is share-nothing chain/data parallelism over
OS processes (``/root/reference/ODElib/Framework.py:755-798``). Its TPU-native
equivalent (SURVEY.md section 5.8) is:

* ``vmap`` over chains within a chip (done in samplers/mh.py), and
* a 1-D ``jax.sharding.Mesh`` over the chain axis across chips: pure data
  parallelism, zero collectives in the hot loop, ICI/DCN touched only when the
  posterior is gathered at the end.

The model spec is closed over (replicated); chain state arrays are sharded on
their leading axis. ``jax.jit`` with sharded inputs lets XLA partition the
whole MCMC program across the mesh — the reference's pickle-a-copy-per-worker
pattern (``Framework.py:808,1014``) becomes sharding annotations.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chains"


def chain_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'chains'.

    Respects an active ``jax.default_device`` override (the tiny-workload
    host routing, :meth:`ModelFramework.MCMC` ``route=``): with a default
    device set, the mesh spans that device's platform rather than
    unconditionally ``jax.devices()`` — otherwise a host-routed run would
    shard its chain batch straight back onto the accelerator."""
    if devices is None:
        dd = jax.config.jax_default_device
        devices = jax.devices(dd.platform) if dd is not None \
            else jax.devices()
    devices = list(devices)
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (chain) axis; replicate the rest."""
    return NamedSharding(mesh, P(CHAIN_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_chains(n: int, mesh: Mesh) -> int:
    """Chains must divide the mesh; round up (extra chains are free lanes)."""
    d = mesh.devices.size
    return int(-(-n // d) * d)


def shard_chain_batch(tree, mesh: Mesh):
    """Place a pytree of (C, ...) arrays with the chain axis sharded."""
    sh = chain_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Mesh:
    """Multi-host entry point: initialize ``jax.distributed`` and return the
    global chain mesh over every chip in the pod slice.

    The reference never leaves one machine (SURVEY.md section 5.8); here the
    same share-nothing chain parallelism spans hosts: each process feeds its
    addressable shard of the chain batch, XLA runs the identical partitioned
    program everywhere, and only the final posterior gather crosses
    ICI/DCN. With no arguments, coordinates via the cluster environment
    (TPU pod metadata / SLURM), per ``jax.distributed.initialize`` defaults.

    Idempotent: safe to call when already initialized (e.g. single-process
    runs), in which case it just returns :func:`chain_mesh`.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError:
        pass  # already initialized (or single-process local backend)
    return chain_mesh()


def local_chain_slice(n_chains: int, mesh: Mesh):
    """(start, stop) of the chain rows this process owns under the mesh.

    Multi-host feeding: each process materializes only its slice and wraps
    it with ``jax.make_array_from_process_local_data``; single-process
    meshes get the full range. Uses jax's equal-block semantics — per-device
    blocks of ceil(n / n_devices) with the trailing shard short — so a
    non-divisible ``n_chains`` loses no rows (prefer :func:`pad_chains`).
    """
    devs = list(mesh.devices.flat)
    pid = jax.process_index()
    block = -(-n_chains // len(devs))
    first = next((i for i, d in enumerate(devs) if d.process_index == pid),
                 len(devs))
    n_local = sum(d.process_index == pid for d in devs)
    return (min(first * block, n_chains),
            min((first + n_local) * block, n_chains))


def sharded_jit(fn, mesh: Mesh, num_batched_args: int):
    """jit ``fn`` with its first ``num_batched_args`` arguments sharded over
    the chain axis and the outputs sharded likewise. XLA inserts no
    collectives for the data-parallel MCMC program — the partitioned program
    is embarrassingly parallel by construction."""
    sh = chain_sharding(mesh)
    in_sh = tuple(sh for _ in range(num_batched_args))
    return jax.jit(fn, in_shardings=in_sh, out_shardings=sh)
