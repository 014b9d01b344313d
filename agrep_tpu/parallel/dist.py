"""Distributed scan: shard_map over a device mesh.

Design (SURVEY.md sections 2.3, 5):
  * the corpus is split into per-device byte shards with a
    `max_record`-byte overlap (the reference's residue-copy logic,
    bitap.c:286-297, reborn as a halo);
  * every device runs the same windowed-parallel scan over its shard --
    no communication during the scan (carried state is O(k) words and
    lives inside a tile, never crossing devices);
  * counts are reduced with lax.psum over the mesh axis; match offsets
    are returned per-shard and merged (deduped in the overlap) on the
    host, which imposes the reference's global ordering (file order,
    then byte offset).
"""

from __future__ import annotations

import numpy as np

MAX_RECORD = 49152  # agrep.h:49


def make_mesh(n_devices: int | None = None):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("shards",))


def shard_corpus(data: np.ndarray, n_shards: int,
                 overlap: int = MAX_RECORD):
    """Split a byte stream into n_shards equal shards plus a halo of
    `overlap` preceding bytes each (shard 0's halo is a newline
    sentinel pad).  Returns (shards u8[n, halo+shard_len], starts)."""
    N = len(data)
    shard_len = -(-N // n_shards)
    total = shard_len * n_shards
    padded = np.full(overlap + total, 0x0A, dtype=np.uint8)
    padded[overlap:overlap + N] = data
    shards = np.stack([
        padded[i * shard_len:overlap + (i + 1) * shard_len]
        for i in range(n_shards)])
    starts = np.arange(n_shards) * shard_len
    return shards, starts


def distributed_scan_count(shards: np.ndarray, mask_table: np.ndarray,
                           consts: dict, D: int, mesh=None,
                           costs: tuple | None = None,
                           n_bytes: int | None = None):
    """Scan shards data-parallel over the mesh; returns
    (total_event_count, per_shard_event_counts).

    Each device scans its shard with the same tiled machine as the
    single-chip path and counts part-pulse events past its halo; the
    total is a psum over ICI.  Events in the zero-pad / trailing fill
    past n_bytes are excluded (same bound as the offsets path).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    if mesh is None:
        mesh = make_mesh()
    n = mesh.devices.size
    assert shards.shape[0] == n, (shards.shape, n)

    from ..ops.scan import _pad_and_window

    # halo length: recover from caller via consts; default MAX_RECORD
    halo = consts.get("shard_halo", MAX_RECORD)
    shard_len = shards.shape[1] - halo

    W = max(consts.get("m", 32) + D + 2, 48)
    L = 1024
    windows_list = []
    for i in range(n):
        w, _ = _pad_and_window(shards[i], W, L)
        windows_list.append(w)
    windows = np.stack(windows_list)     # [n, T, S]

    cvec = np.asarray([
        consts.get("init0", 0), consts.get("init1_ns", 0),
        consts.get("noerr", 0), consts.get("d_endpos", 0),
        consts.get("endpos", 0), consts.get("d_mask", 0xFFFFFFFF),
        0, 0], dtype=np.uint32)
    # replicate per shard so machine constants are device-varying inside
    # shard_map (keeps the scan's carry manual-axis types consistent)
    cvec_sh = np.broadcast_to(cvec, (n, 8)).copy()
    # per-shard count of real (non-fill) bytes, so machines firing on
    # the NUL/newline fill are not counted (mirrors the offsets path's
    # pos < n_bytes filter)
    if n_bytes is None:
        n_bytes = n * shard_len
    starts = np.arange(n, dtype=np.int64) * shard_len
    valid = np.clip(n_bytes - starts, 0, shard_len) \
        .astype(np.int32).reshape(n, 1)

    from ..ops.scan import _get_jit
    scan_fn = _get_jit()

    endpos = np.uint32(consts.get("endpos", 0))

    def per_shard(wnd, mt, cv, nvalid):
        # wnd: [1, T, S] on this device
        ev = scan_fn(wnd[0], mt, cv[0], D, W, "bitap", costs)   # [T, S]
        body = ev[:, W:]
        flat = body.reshape(-1)[halo:halo + shard_len]
        in_range = jnp.arange(shard_len, dtype=jnp.int32) < nvalid[0]
        local = jnp.sum(((flat & endpos) != 0) & in_range) \
            .astype(jnp.int32)
        total = jax.lax.psum(local, "shards")
        return total[None], local[None]

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("shards"), P(), P("shards"), P("shards")),
        out_specs=(P("shards"), P("shards")))
    total, locals_ = fn(jnp.asarray(windows), jnp.asarray(mask_table),
                        jnp.asarray(cvec_sh), jnp.asarray(valid))
    return int(np.asarray(total)[0]), np.asarray(locals_)


def distributed_scan_offsets(shards: np.ndarray, starts: np.ndarray,
                             n_bytes: int, mask_table: np.ndarray,
                             consts: dict, D: int, mesh=None,
                             costs: tuple | None = None) -> np.ndarray:
    """Scan shards data-parallel and return the GLOBAL sorted offsets
    of part-pulse events -- the reference's output ordering (byte
    order within the stream), imposed by a host merge.

    Devices exchange nothing during the scan; each returns its shard's
    event bitmap (halo columns dropped, so overlap events are counted
    exactly once by their owning shard)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    if mesh is None:
        mesh = make_mesh()
    n = mesh.devices.size
    assert shards.shape[0] == n, (shards.shape, n)

    from ..ops.scan import _pad_and_window, _get_jit
    halo = consts.get("shard_halo", MAX_RECORD)
    W = max(consts.get("m", 32) + D + 2, 48)
    L = 1024
    windows = np.stack(
        [_pad_and_window(shards[i], W, L)[0] for i in range(n)])
    cvec = np.asarray([
        consts.get("init0", 0), consts.get("init1_ns", 0),
        consts.get("noerr", 0), consts.get("d_endpos", 0),
        consts.get("endpos", 0), consts.get("d_mask", 0xFFFFFFFF),
        0, 0], dtype=np.uint32)
    cvec_sh = np.broadcast_to(cvec, (n, 8)).copy()
    scan_fn = _get_jit()
    endpos = np.uint32(consts.get("endpos", 0))
    shard_len = shards.shape[1] - halo

    def per_shard(wnd, mt, cv):
        ev = scan_fn(wnd[0], mt, cv[0], D, W, "bitap", costs)
        body = ev[:, W:].reshape(-1)[halo:halo + shard_len]
        return (((body & endpos) != 0).astype(jnp.uint8))[None]

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("shards"), P(), P("shards")),
        out_specs=P("shards"))
    bitmaps = np.asarray(fn(jnp.asarray(windows),
                            jnp.asarray(mask_table),
                            jnp.asarray(cvec_sh)))
    outs = []
    for i in range(n):
        pos = np.flatnonzero(bitmaps[i]) + int(starts[i])
        outs.append(pos[pos < n_bytes])
    return np.concatenate(outs)   # shard order == byte order
