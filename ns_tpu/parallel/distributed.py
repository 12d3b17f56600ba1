"""Multi-process (multi-host) runtime: bootstrap, global arrays, per-host IO.

The reference has no distributed backend of any kind (SURVEY.md §2: no
NCCL/MPI/Gloo/multiprocessing anywhere); this layer is the north-star
capability that takes the SPMD solver code — already validated on
single-process fake meshes — to real multi-controller form: one Python
process per host, `jax.distributed` coordination, global `jax.Array`s
assembled from per-process shards, and per-host sharded output.

Design notes (TPU-first):
  - On a real TPU pod slice, `initialize()` with no arguments lets JAX
    auto-detect the coordinator/topology from the TPU environment; the
    explicit coordinator/num_processes/process_id path is for CPU
    multi-process runs (tests, CI) and manual launchers.
  - All the solver/mesh code in ns_tpu.parallel is process-count agnostic:
    meshes are built over `jax.devices()` (global), shard_map blocks see
    only their local shard, and collectives lower to ICI/Gloo the same
    way. Nothing else in the package changes between 1 and N processes.
  - Host data feeding uses `global_array` (per-process local shards ->
    global Array) — the multi-controller replacement for `device_put`.

The launcher lives in `ns_tpu/launch.py` (`python -m ns_tpu.launch`).
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Sequence

import jax
import numpy as np

_ENV_PREFIX = "NS_TPU"


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               platform: str | None = None,
               local_device_count: int | None = None) -> None:
    """Bootstrap jax.distributed for this process.

    Explicit args win; otherwise NS_TPU_COORDINATOR / NS_TPU_NUM_PROCESSES
    / NS_TPU_PROCESS_ID / NS_TPU_PLATFORM / NS_TPU_LOCAL_DEVICES (set by
    `python -m ns_tpu.launch`) are read; with neither, falls through to
    `jax.distributed.initialize()` auto-detection (TPU pod environments).

    `platform`/`local_device_count` are applied via jax.config BEFORE the
    backend initializes — on this harness env vars cannot override the
    platform (sitecustomize pre-imports jax; CLAUDE.md), so config updates
    are the only reliable mechanism, and they must precede any jax call
    that instantiates a backend.
    """
    env = os.environ
    coordinator_address = (coordinator_address
                           or env.get(f"{_ENV_PREFIX}_COORDINATOR"))
    if num_processes is None and f"{_ENV_PREFIX}_NUM_PROCESSES" in env:
        num_processes = int(env[f"{_ENV_PREFIX}_NUM_PROCESSES"])
    if process_id is None and f"{_ENV_PREFIX}_PROCESS_ID" in env:
        process_id = int(env[f"{_ENV_PREFIX}_PROCESS_ID"])
    platform = platform or env.get(f"{_ENV_PREFIX}_PLATFORM")
    if local_device_count is None and f"{_ENV_PREFIX}_LOCAL_DEVICES" in env:
        local_device_count = int(env[f"{_ENV_PREFIX}_LOCAL_DEVICES"])

    if platform:
        jax.config.update("jax_platforms", platform)
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)

    if coordinator_address is None:
        jax.distributed.initialize()  # TPU pod auto-detection
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def initialize_from_env() -> None:
    """`initialize()` from NS_TPU_* env vars only (worker entry point)."""
    initialize()


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "ns_tpu_barrier") -> None:
    """Block until every process reaches this point."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def make_global_mesh(axes: Mapping[str, int] | str | None = None):
    """A Mesh over ALL global devices (every process's). Accepts the same
    {axis: size} dicts / preset names as ns_tpu.parallel.make_mesh."""
    from ns_tpu.parallel.mesh import make_mesh
    return make_mesh(axes, devices=jax.devices())


def global_array(sharding, local_data: np.ndarray) -> jax.Array:
    """Build a global jax.Array on `sharding` from this process's LOCAL
    block of the data (multi-controller device_put).

    `local_data` is the contiguous slab of the global array that this
    process's devices own under `sharding` — e.g. rows
    [pid*nx/P : (pid+1)*nx/P] for a row-sharded field over P processes
    with one mesh axis laid out process-major (the mesh_utils default).
    """
    return jax.make_array_from_process_local_data(sharding, local_data)


def replicated(sharding_or_mesh, data: np.ndarray) -> jax.Array:
    """Fully-replicated global array from host data (identical on every
    process) — for constants/configs that every shard reads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    if isinstance(sharding_or_mesh, Mesh):
        sharding = NamedSharding(sharding_or_mesh, P())
    else:
        sharding = sharding_or_mesh
    return jax.make_array_from_process_local_data(sharding, data)


def local_shards(arr: jax.Array) -> list[tuple[tuple, np.ndarray]]:
    """This process's addressable shards as (global_index, numpy) pairs.
    global_index is a tuple of (start, stop) per dimension."""
    from ns_tpu.utils.host import to_host
    shards = list(arr.addressable_shards)
    # ONE to_host over all local shards (one laundering program, one
    # dispatch): spectral rollout outputs come from complex-op
    # executables, whose buffers the axon tunnel cannot np.asarray
    # directly (utils/host.py); shards stay per-host, never gathered
    datas = to_host([s.data for s in shards])
    out = []
    for s, data in zip(shards, datas):
        idx = tuple((sl.start or 0, sl.stop if sl.stop is not None else dim)
                    for sl, dim in zip(s.index, arr.shape))
        out.append((idx, data))
    return out


def save_array_shards(folder: str, name: str, arr: jax.Array) -> str:
    """Per-host sharded output: each process writes ONLY its addressable
    shards to `folder/name.proc{pid:04d}.npz` (arrays `shard0..`, with a
    JSON manifest of global indices + full shape). No cross-process
    gather, no host holding the full array — the multi-host form of the
    reference's final `np.savez` dump (direct_fd/simulate.py:194).
    Reassemble with `assemble_shards` (offline, or on one host)."""
    os.makedirs(folder, exist_ok=True)
    pid = jax.process_index()
    shards = local_shards(arr)
    manifest = {
        "name": name,
        "process": pid,
        "num_processes": jax.process_count(),
        "global_shape": list(arr.shape),
        "dtype": str(arr.dtype),
        "shards": [{"key": f"shard{i}", "index": [list(se) for se in idx]}
                   for i, (idx, _) in enumerate(shards)],
    }
    path = os.path.join(folder, f"{name}.proc{pid:04d}.npz")
    arrays = {f"shard{i}": data for i, (_, data) in enumerate(shards)}
    np.savez(path, __manifest__=np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8), **arrays)
    return path


def assemble_shards(folder: str, name: str) -> np.ndarray:
    """Reassemble the global array from every process's shard file.
    Replicated/overlapping shards overwrite identically; raises if any
    cell was never covered."""
    import glob
    files = sorted(glob.glob(os.path.join(folder, f"{name}.proc*.npz")))
    if not files:
        raise FileNotFoundError(f"no shard files for {name!r} in {folder}")
    full = None
    covered = None
    for f in files:
        data = np.load(f)
        manifest = json.loads(bytes(data["__manifest__"]).decode())
        # stale-file guard: a shard set from an earlier run with MORE
        # processes would still cover the array and silently overwrite
        # fresh rows (sorted() loads higher pids last) — every manifest
        # must agree that exactly len(files) processes wrote this set
        if manifest["num_processes"] != len(files):
            raise ValueError(
                f"{f} says {name!r} was written by "
                f"{manifest['num_processes']} processes but {len(files)} "
                f"shard files are present — stale shard files from a "
                f"previous run? Clean {folder} and re-run")
        if full is None:
            full = np.zeros(manifest["global_shape"],
                            dtype=np.dtype(manifest["dtype"]))
            covered = np.zeros(manifest["global_shape"], dtype=bool)
        for rec in manifest["shards"]:
            sl = tuple(slice(a, b) for a, b in rec["index"])
            full[sl] = data[rec["key"]]
            covered[sl] = True
    if not covered.all():
        raise ValueError(f"shard files for {name!r} do not cover the full "
                         f"array ({covered.sum()}/{covered.size} cells)")
    return full


def process_local_rows(n_rows: int, mesh, axis: str = "x",
                       pid: int | None = None) -> tuple[int, int]:
    """The [start, stop) global-row range this process owns for an array
    row-sharded over `axis` of `mesh`, assuming (as mesh_utils lays out)
    that each process's devices are contiguous along the axis. Raises if
    the mesh assigns this process a non-contiguous or misaligned row set.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    pid = jax.process_index() if pid is None else pid
    # indices over a 1D view of length n_rows; dedupe (other mesh axes
    # replicate this sharding, so several local devices can own the same
    # row range)
    ranges = set()
    for dev, idx in sharding.devices_indices_map((n_rows,)).items():
        if dev.process_index != pid:
            continue
        sl = idx[0]
        ranges.add((sl.start or 0,
                    sl.stop if sl.stop is not None else n_rows))
    if not ranges:
        raise ValueError(f"process {pid} owns no rows on axis {axis!r}")
    lo = min(a for a, _ in ranges)
    hi = max(b for _, b in ranges)
    if hi - lo != sum(b - a for a, b in ranges):
        raise ValueError("process rows are non-contiguous under this mesh; "
                         "feed with global_array(full sharding) instead")
    return lo, hi
