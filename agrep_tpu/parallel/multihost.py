"""Multi-host orchestration (SURVEY.md sections 2.3, 5).

The scan itself never communicates (each shard carries its own halo,
parallel/dist.py); multi-host runs only need
  * jax.distributed initialization (one controller per host),
  * a global mesh spanning every process's devices,
  * a deterministic corpus/file partition so the host merge can impose
    the reference's global ordering (file order x byte offset,
    agrep.c:3229-3231),
  * failure recovery: a file whose worker dies is re-queued and, on a
    second failure, re-run on the exact host backend (scans are
    stateless, so re-execution is idempotent) -- the file-level analog
    of the chunk retry in ops/scan.py scan_event_list.

Single-process runs degrade to no-ops: init_multihost() without a
coordinator is a local-only init, global_mesh() is the local mesh.
"""

from __future__ import annotations

import os

import numpy as np


_initialized = False


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns (process_id, num_processes); (0, 1) when single-process.
    Idempotent: repeated calls after a successful init are no-ops."""
    global _initialized
    import jax
    coordinator = coordinator or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return 0, 1
    if _initialized:
        return jax.process_index(), jax.process_count()
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    try:
        # CPU backends need an explicit cross-process collective
        # implementation (gloo); TPU slices ignore this knob
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the output-owning process (process 0), and always True
    single-process -- gates the Grand Total line and stdout writes."""
    if not _initialized:
        return True
    import jax
    return jax.process_index() == 0


def global_mesh():
    """Mesh over every device of every process (ICI within a host's
    slice, DCN across hosts -- XLA owns the transport)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), ("shards",))


def assign_files(files: list[str], num_processes: int,
                 process_id: int) -> list[tuple[int, str]]:
    """Deterministic per-host file assignment: file i goes to process
    i % num_processes.  Returns (global_index, path) pairs so each
    host's results can be merged back in file order."""
    return [(i, f) for i, f in enumerate(files)
            if i % num_processes == process_id]


def run_with_requeue(items: list, worker, fallback=None,
                     retries: int = 1) -> list:
    """Run worker(item) over items with failure re-queueing: a failed
    item is retried `retries` times, then handed to `fallback` (the
    exact host backend) -- SURVEY section 5 'a failed host's file
    shards get re-queued'.  Returns results in item order; raises only
    if the fallback also fails."""
    results = [None] * len(items)
    queue = [(i, 0) for i in range(len(items))]
    while queue:
        i, attempt = queue.pop(0)
        try:
            results[i] = worker(items[i])
        except Exception:
            if attempt < retries:
                queue.append((i, attempt + 1))
            elif fallback is not None:
                results[i] = fallback(items[i])
            else:
                raise
    return results


def gather_pieces(local_blob: bytes, marks: list,
                  local_count: int) -> tuple[list, int]:
    """All-gather every process's per-file output chunks; returns
    ((global_file_index, bytes) pairs sorted in global file order,
    global_match_count) -- identical on every process."""
    import jax
    from jax.experimental import multihost_utils
    nproc = jax.process_count()
    arr = np.frombuffer(local_blob, dtype=np.uint8)
    meta = np.asarray([len(arr), len(marks), local_count],
                      dtype=np.int64)
    metas = np.asarray(multihost_utils.process_allgather(meta))
    total = int(metas[:, 2].sum())
    maxb = max(1, int(metas[:, 0].max()))
    maxm = max(1, int(metas[:, 1].max()))
    pb = np.zeros(maxb, dtype=np.uint8)
    pb[:len(arr)] = arr
    blobs = np.asarray(multihost_utils.process_allgather(pb))
    mk = np.full((maxm, 2), -1, dtype=np.int64)
    for i, (gi, off) in enumerate(marks):
        mk[i] = (gi, off)
    mks = np.asarray(multihost_utils.process_allgather(mk))
    pieces = []
    for p in range(nproc):
        nb, nm = int(metas[p, 0]), int(metas[p, 1])
        for i in range(nm):
            gi, off = int(mks[p, i, 0]), int(mks[p, i, 1])
            end = int(mks[p, i + 1, 1]) if i + 1 < nm else nb
            pieces.append((gi, blobs[p, off:end].tobytes()))
    pieces.sort(key=lambda t: t[0])
    return pieces, total


def merge_outputs(local_blob: bytes, marks: list,
                  local_count: int) -> tuple[bytes, int]:
    """All-gather every process's per-file output chunks and rebuild
    the single stream in GLOBAL file order (the reference's ordering
    contract: file order x byte offset, agrep.c:3229-3231).

    local_blob: this process's concatenated per-file output;
    marks: (global_file_index, start_offset_in_blob) pairs, ascending;
    Returns (merged_bytes, global_match_count) -- identical on every
    process; only process 0 should write the bytes."""
    pieces, total = gather_pieces(local_blob, marks, local_count)
    return b"".join(b for _, b in pieces), total


def allgather_rows(rows: np.ndarray) -> np.ndarray:
    """All-gather variable-count int64 rows from every process.
    rows: (n, k) local array; returns the concatenation over all
    processes (padded exchange, then trimmed)."""
    import jax
    from jax.experimental import multihost_utils
    rows = np.asarray(rows, dtype=np.int64).reshape(len(rows), -1)
    k = rows.shape[1] if rows.size else 1
    meta = np.asarray([len(rows), k], dtype=np.int64)
    metas = np.asarray(multihost_utils.process_allgather(meta))
    maxn = max(1, int(metas[:, 0].max()))
    k = max(k, int(metas[:, 1].max()))
    pad = np.zeros((maxn, k), dtype=np.int64)
    if rows.size:
        pad[:len(rows), :rows.shape[1]] = rows
    alls = np.asarray(multihost_utils.process_allgather(pad))
    out = [alls[p, :int(metas[p, 0])]
           for p in range(alls.shape[0])]
    return (np.concatenate(out) if out
            else np.zeros((0, k), dtype=np.int64))


def global_count(local_count: int, mesh=None) -> int:
    """Reduce per-host match counts to the Grand Total with a psum
    over the global mesh (single-process: identity)."""
    import jax
    if jax.process_count() == 1 and mesh is None:
        return int(local_count)
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    mesh = mesh or global_mesh()
    n = mesh.devices.size
    local = np.zeros(n, dtype=np.int64)
    # each process contributes its count on its first local device slot
    import jax as _j
    base = _j.process_index() * _j.local_device_count()
    local[base] = local_count

    def red(x):
        return jax.lax.psum(x, "shards")

    out = shard_map(red, mesh=mesh, in_specs=P("shards"),
                    out_specs=P("shards"))(jnp.asarray(local))
    return int(np.asarray(out)[0])
