"""Device-mesh construction helpers.

The reference's only parallelism is a joblib fork-join on one host
(``/root/reference/auditory_lfp/fit_mean_function.py:327-328``); restart,
chain, bootstrap and trial loops are serial Python.  Here every one of those
loops is an axis of a ``jax.sharding.Mesh``:

- ``chain``: NUTS chains / SMC particle blocks / MAP restarts
- ``trial``: LFP trials (likelihood terms, psum-reduced)

Multi-host: call :func:`init_distributed` first (jax.distributed), then the
same mesh code spans hosts; collectives ride ICI within a host/pod slice.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Initialize jax.distributed for multi-host meshes (no-op if single)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(chain: int | None = None, trial: int | None = None, devices=None) -> Mesh:
    """Build a (chain, trial) mesh over the available devices.

    If sizes are omitted, all devices go to the chain axis.  ``chain*trial``
    must divide the device count; extra devices are left unused (sliced off).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if chain is None and trial is None:
        chain, trial = n, 1
    elif chain is None:
        chain = n // trial
    elif trial is None:
        trial = n // chain
    need = chain * trial
    if need > n:
        raise ValueError(f"mesh ({chain}x{trial}) needs {need} devices, have {n}")
    grid = np.asarray(devices[:need]).reshape(chain, trial)
    return Mesh(grid, axis_names=("chain", "trial"))


def chain_spec() -> P:
    return P("chain")


def trial_spec() -> P:
    return P("trial")


def replicated() -> P:
    return P()


def shard_trials(mesh: Mesh, Y):
    """Place a (ntrials, nx, nt) trial batch sharded over the trial axis."""
    return jax.device_put(Y, NamedSharding(mesh, P("trial")))


def pad_to_multiple(Y, multiple: int, axis: int = 0):
    """Zero-pad the trial axis so it divides the mesh axis; returns
    (padded, true_count).  Zero trials contribute zero to the quad form, and
    the log-determinant term uses the true count, so padding is exact."""
    n = Y.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return Y, n
    pad = [(0, 0)] * Y.ndim
    pad[axis] = (0, rem)
    return np.pad(np.asarray(Y), pad), n
