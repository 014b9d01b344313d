"""Windowed-parallel shift-or scan (production path).

The sequential bit-parallel automaton has a bounded dependence window:
any state bit after byte i is determined by at most m+D preceding bytes
(plus statically-on bits), and delimiter resets only shorten chains.
So the stream is cut into T tiles of L bytes, each prefixed with a halo
of W >= m+D+1 real preceding bytes, and all tiles are scanned in
parallel from a cold state -- by the end of the halo every tile's state
is exact.  This turns the reference's strictly sequential loops
(bitap.c:169-283, asearch.c:94-232) into an embarrassingly parallel
computation that maps onto TPU lanes; there is no cross-tile
communication at all.

Variants:
  'bitap'  -- the mask machine: exact / k-error / non-uniform costs,
              record resets at exact delimiter completion.
  'sgrep'  -- the simple-pattern engine: k-error shift-or with newline
              reset (sgrep.c agrep():1177-1237 semantics).

Backends: 'jax' (CPU/TPU; the Pallas kernel lives in kernels.py) and
'numpy' (vectorized host fallback, also the test oracle).

Output: a uint32 event word per input byte; bit layout equals the mask
machine's word (delimiter bit = d_endpos, part pulses = endposition
bits).  For 'sgrep', bit 0 = match pulse.
"""

from __future__ import annotations

import functools
import os

import numpy as np

DEFAULT_TILE = 1024

# Backend selection: 'jax' (default; TPU when available) or 'numpy'
# (vectorized host fallback -- also the oracle for kernel tests).
_BACKEND = os.environ.get("AGREP_TPU_BACKEND", "jax")


def set_backend(name: str) -> None:
    global _BACKEND
    _BACKEND = name


def _pad_and_window(text: np.ndarray, W: int, L: int):
    """Return (windows u8[T, W+L], n_tiles) built on host."""
    N = text.shape[0]
    T = max(1, -(-N // L))
    total = T * L
    padded = np.zeros(W + total, dtype=np.uint8)
    padded[W:W + N] = text
    body = padded[W:].reshape(T, L)
    halo = padded[:total].reshape(T, L)[:, :W]
    return np.concatenate([halo, body], axis=1), T


def scan_events(text: np.ndarray, mask_table: np.ndarray, consts: dict,
                D: int, variant: str = "bitap",
                costs: tuple | None = None,
                tile: int = DEFAULT_TILE) -> np.ndarray:
    """Scan a byte stream; returns a uint32 event word per byte.

    text: uint8[N] (host); mask_table: uint32[256] (pre-folded);
    consts: dict from bitword.machine_constants (bitap) or
    {'endpos': final-bit, 'm': m} (sgrep).
    """
    N = int(text.shape[0])
    if N == 0:
        return np.zeros(0, dtype=np.uint32)
    from ..runtime import trace
    if trace.ENABLED:
        trace.add("device_scans")
        trace.add("scan_bytes", N)
    m = consts.get("m", 32)
    W = min(max(m + D + 2, 48), tile)
    L = tile
    use_numpy = _BACKEND == "numpy"
    if not use_numpy:
        out = _try_pallas(text, mask_table, consts, D, W, L, N,
                          variant, costs,
                          interpret=(_BACKEND == "interpret"))
        if out is not None:
            if trace.ENABLED:
                trace.add("pallas_scans")
            return out
        if _on_tpu():
            # Pallas-rejected shapes on TPU: the XLA lax.scan path's
            # ~2000-step while loop runs ~0.1 GB/s -- slower than the
            # vectorized host backend.  Route to numpy and say so.
            if trace.ENABLED:
                trace.add("pallas_reject_%s" % _last_reject[0])
                trace.add("host_fallback_bytes", N)
            if os.environ.get("AGREP_TPU_STATS"):
                import sys
                print("agrep-tpu stats: query not kernel-eligible "
                      "(%s); using vectorized host backend"
                      % _last_reject[0], file=sys.stderr)
            use_numpy = True
    if use_numpy and N >= (1 << 20):
        # sequential C twin of the windowed machine: exact whenever
        # the dependence window is bounded (no sticky/wildcard bits,
        # i.e. init1_ns == init0; the sgrep machine is always bounded)
        bounded = (variant == "sgrep"
                   or consts.get("init1_ns") == consts.get("init0"))
        if bounded:
            from .. import native
            pairs = native.bitap_scan_events(text, mask_table, consts,
                                             D, variant, costs)
            if pairs is not None:
                pos, words = pairs
                ev_out = np.zeros(N, dtype=np.uint32)
                ev_out[pos] = words
                return ev_out
    windows, T = _pad_and_window(text, W, L)
    cvec = np.asarray([
        consts.get("init0", 0), consts.get("init1_ns", 0),
        consts.get("noerr", 0), consts.get("d_endpos", 0),
        consts.get("endpos", 0), consts.get("d_mask", 0xFFFFFFFF),
        0, 0], dtype=np.uint32)
    if use_numpy:
        ev = _scan_windows_np(windows, mask_table, cvec, D, W, variant,
                              costs)
    else:
        ev = _scan_windows_jax(windows, mask_table, cvec, D, W, variant,
                               costs)
    return np.asarray(ev)[:, W:].reshape(-1)[:N]


STREAM_CHUNK = int(os.environ.get("AGREP_TPU_CHUNK_MB", "32")) << 20


def scan_event_list(reader, n: int, mask_table: np.ndarray, consts: dict,
                    D: int, variant: str = "bitap",
                    costs: tuple | None = None,
                    tile: int = DEFAULT_TILE, chunk: int | None = None):
    """Chunked scan over a random-access byte source; yields sparse
    (pos int64[], ev uint32[]) event batches in stream order using
    O(chunk) memory (the streaming path for large files).

    reader(lo, hi) -> uint8[hi-lo].  Every chunk after the first is
    scanned with a W-byte halo of real preceding bytes and its first W
    events dropped: by the halo-warmup argument (module docstring) the
    states at the chunk body are exact, so the concatenated event
    stream equals a whole-stream scan bit-for-bit."""
    if chunk is None:
        chunk = STREAM_CHUNK
    m = consts.get("m", 32)
    W = min(max(m + D + 2, 48), tile)
    bounded = (variant == "sgrep"
               or consts.get("init1_ns") == consts.get("init0"))
    g0 = 0
    while g0 < n:
        g1 = min(n, g0 + chunk)
        lo = g0 - W if g0 >= W else 0
        text = reader(lo, g1)
        if _BACKEND == "numpy" and bounded:
            # sparse C scan: skip the dense event array round-trip
            from .. import native
            pairs = native.bitap_scan_events(text, mask_table, consts,
                                             D, variant, costs)
            if pairs is not None:
                pos, words = pairs
                keep = pos >= (g0 - lo)
                yield (pos[keep] + lo).astype(np.int64), \
                    words[keep].copy()
                g0 = g1
                continue
        # failure recovery (SURVEY.md section 5): a chunk whose device
        # scan dies (preemption, tunnel drop) is re-queued -- retried
        # once on the device, then re-run on the host backend, which
        # is exact by construction.  Chunks are idempotent.
        try:
            ev = scan_events(text, mask_table, consts, D, variant,
                             costs, tile)
        except Exception:
            try:
                ev = scan_events(text, mask_table, consts, D, variant,
                                 costs, tile)
            except Exception:
                cvec = np.asarray([
                    consts.get("init0", 0), consts.get("init1_ns", 0),
                    consts.get("noerr", 0), consts.get("d_endpos", 0),
                    consts.get("endpos", 0),
                    consts.get("d_mask", 0xFFFFFFFF), 0, 0],
                    dtype=np.uint32)
                windows, _ = _pad_and_window(text, W, tile)
                ev = np.asarray(_scan_windows_np(
                    windows, mask_table, cvec, D, W, variant,
                    costs))[:, W:].reshape(-1)[:len(text)]
        ev = ev[g0 - lo:]
        p = np.flatnonzero(ev)
        yield p.astype(np.int64) + g0, ev[p]
        g0 = g1


_cache_enabled = False


def _enable_compile_cache() -> None:
    """Persist compiled kernels across CLI invocations (the compare
    tree bakes the pattern into the kernel, so each new pattern costs
    a Mosaic compile -- cached, repeat searches skip it; the
    reference's agrep_saved_pattern precedent, agrep.c:3063)."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    try:
        import jax
        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "agrep_tpu", "jax")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _on_tpu() -> bool:
    try:
        import jax
        _enable_compile_cache()
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


_put_bw = [None]


def device_put_bandwidth() -> float:
    """Measured host->device upload bandwidth in GB/s (one 4MB
    device_put, cached).  The corpus-placement gate: a real TPU host
    uploads at PCIe/DMA rates (tens of GB/s) and should scan on
    device; the remote-tunnel dev harness uploads at ~0.04 GB/s and
    should not."""
    if _put_bw[0] is None:
        try:
            import time

            import jax
            buf = np.zeros(4 << 20, dtype=np.uint8)
            jax.device_put(buf).block_until_ready()      # warm path
            t0 = time.perf_counter()
            jax.device_put(buf).block_until_ready()
            dt = max(time.perf_counter() - t0, 1e-9)
            _put_bw[0] = (len(buf) / dt) / 1e9
        except Exception:
            _put_bw[0] = 0.0
    return _put_bw[0]


def fast_device_link() -> bool:
    """True when scanning on device beats the host even counting the
    upload (threshold ~1 GB/s; AGREP_TPU_ASSUME_FAST_LINK=1 forces it
    for end-to-end validation on slow-link harnesses)."""
    if os.environ.get("AGREP_TPU_ASSUME_FAST_LINK") == "1":
        return True
    if os.environ.get("AGREP_TPU_ASSUME_FAST_LINK") == "0":
        return False
    return device_put_bandwidth() >= 1.0


_last_reject = ["none"]    # reason of the most recent _try_pallas None


def _try_pallas(text, mask_table, consts, D, W, L, N, variant, costs,
                interpret=False):
    """The TPU fast path: the fused Pallas kernel (ops/kernels.py).

    XLA's lax.scan path compiles the per-byte recurrence into a
    ~2000-step while loop whose per-step overhead caps it near 0.1
    GB/s on a v5e chip; the Pallas kernel runs the same machine at
    ~44 GB/s.  Multi-bit endpos (AND patterns, packed multi-term
    groups) gets one packed hit plane per part bit; non-uniform costs
    (-D/-I/-S) are static wiring in the kernel.  Falls back (returns
    None) off-TPU, for >12 part bits, and for mask tables with no
    compact range decomposition.

    interpret=True (AGREP_TPU_BACKEND=interpret) runs the SAME kernel
    through the Pallas interpreter on CPU -- the conformance suite's
    hook for exercising the production kernel path without a TPU."""
    if variant not in ("bitap", "sgrep"):
        _last_reject[0] = "variant"
        return None
    if costs is not None and variant != "bitap":
        _last_reject[0] = "costs-variant"
        return None   # costs exist only in the mask machine (asearch1)
    endpos = int(consts.get("endpos", 0))
    if endpos == 0:
        _last_reject[0] = "no-endpos"
        return None
    single = (endpos & (endpos - 1)) == 0
    ep_bits: tuple = ()
    if not single:
        # multi-part endpos (AND patterns, packed multi-term groups):
        # one packed hit plane per part bit
        ep_bits = tuple(1 << b for b in range(32) if endpos & (1 << b))
        if len(ep_bits) > 12:
            _last_reject[0] = "part-bits"
            return None
    if not interpret and not _on_tpu():
        _last_reject[0] = "off-tpu"
        return None
    from . import kernels
    out = kernels.pallas_scan_stream(text, mask_table, consts, D, W, L,
                                     variant, ep_bits,
                                     interpret=interpret,
                                     costs=costs)
    if out is None:
        _last_reject[0] = "mask-ranges"
        return None
    d, hs = out
    if variant == "sgrep":
        # sgrep events are the 0/1 pulse convention (bit 0)
        ev = kernels.planes_to_events(
            np.zeros_like(d), hs[0], {"d_endpos": 0, "endpos": 1},
            W, L, N)
    elif single:
        ev = kernels.planes_to_events(d, hs[0], consts, W, L, N)
    else:
        ev = kernels.planes_to_events(
            d, np.zeros_like(d), {"d_endpos": consts.get("d_endpos", 0),
                                  "endpos": 0}, W, L, N)
        for bv, hp in zip(ep_bits, hs):
            ev |= kernels.planes_to_events(
                np.zeros_like(d), hp, {"d_endpos": 0, "endpos": bv},
                W, L, N)
    return ev


def scan_lanes(lanes: np.ndarray, lens: np.ndarray, mask_table: np.ndarray,
               consts: dict, D: int, costs: tuple | None,
               init_states: np.ndarray, sticky_endpos: bool):
    """Record-parallel bitap scan for machines whose sticky bits make
    the dependence window unbounded (-p supersequence: Init1 == ~0;
    FASTREGEX '#' wildcards: wildmask stickies -- bitap.c:123,
    agrep.h WILDCD).  Each lane is one record (content + trailing
    delimiter bytes), starting from the post-reset state.

    Returns hits u32[R]: OR of (state_D & endpos) over the lane's
    columns 0..lens[r] (the reference's sticky accumulation, evaluated
    at the record end)."""
    R, L = lanes.shape
    init1 = np.uint32(consts["init1"] if sticky_endpos
                      else consts["init1_ns"])
    noerr = np.uint32(consts["noerr"])
    endpos = np.uint32(consts["endpos"])
    cmasks = mask_table[lanes].astype(np.uint32)
    states = np.broadcast_to(init_states[:, None], (D + 1, R)) \
        .astype(np.uint32).copy()
    hits = np.zeros(R, dtype=np.uint32)
    for j in range(L):
        cm = cmasks[:, j]
        new0 = ((states[0] >> 1) & cm) | (init1 & states[0])
        new = [new0]
        if costs is None:
            for k in range(1, D + 1):
                r2 = states[k - 1] | (((new[k - 1] | states[k - 1]) >> 1)
                                     & noerr)
                new.append(((states[k] >> 1) & cm)
                           | (init1 & states[k]) | r2)
        else:
            ci, cs, cd = costs
            new = []
            for k in range(0, D + 1):
                r = ((states[k] >> 1) & cm) | (init1 & states[k])
                if k - ci >= 0:
                    r = r | states[k - ci]
                err = np.uint32(0)
                if k - cd >= 0:
                    err = err | new[k - cd]
                if k - cs >= 0:
                    err = err | states[k - cs]
                r = r | ((err >> 1) & noerr)
                new.append(r)
        active = j <= lens
        hits = np.where(active, hits | (new[D] & endpos), hits)
        states = np.stack(new)
    return hits


# ---------------------------------------------------------------------
# numpy backend
# ---------------------------------------------------------------------

def _scan_windows_np(windows, mask_table, cvec, D, W, variant, costs):
    T, S = windows.shape
    init0, init1_ns, noerr, d_endpos, endpos, d_mask = (
        np.uint32(cvec[i]) for i in range(6))
    cmasks = mask_table[windows]                       # u32[T, S]
    events = np.zeros((T, S), dtype=np.uint32)

    if variant == "bitap":
        states = np.broadcast_to(init0, (D + 1, T)).astype(np.uint32).copy()
        init_states = states.copy()
    else:
        levels = [np.uint32(0)]
        for _ in range(D):
            prev = int(levels[-1])
            levels.append(np.uint32(((prev >> 1) | prev | 0x80000000)
                                    & 0xFFFFFFFF))
        init_states = np.broadcast_to(
            np.asarray(levels, dtype=np.uint32)[:, None], (D + 1, T)).copy()
        states = init_states.copy()

    def bitap_levels(sts, cm):
        new0 = ((sts[0] >> 1) & cm) | (init1_ns & sts[0])
        new = [new0]
        if costs is None:
            for k in range(1, D + 1):
                r2 = sts[k - 1] | (((new[k - 1] | sts[k - 1]) >> 1) & noerr)
                new.append(((sts[k] >> 1) & cm) | (init1_ns & sts[k]) | r2)
        else:
            ci, cs, cd = costs
            new = []
            for k in range(0, D + 1):
                r = ((sts[k] >> 1) & cm) | (init1_ns & sts[k])
                if k - ci >= 0:
                    r = r | sts[k - ci]
                err = np.uint32(0)
                if k - cd >= 0:
                    err = err | new[k - cd]
                if k - cs >= 0:
                    err = err | sts[k - cs]
                r = r | ((err >> 1) & noerr)
                new.append(r)
        return new

    top = np.uint32(0x80000000)
    for j in range(S):
        cm = cmasks[:, j]
        if j == W:
            states[:, 0] = init_states[:, 0]   # stream start: tile 0 only
        if variant == "bitap":
            new = bitap_levels(states, cm)
            ev = (new[0] & d_endpos) | (new[D] & endpos)
            trig = (new[0] & d_endpos) != 0
            if trig.any():
                b0 = np.broadcast_to(init0, cm.shape).astype(np.uint32)
                rs = bitap_levels(np.stack([b0] * (D + 1)), cm)
                rs[0] = rs[0] & d_mask
                for k in range(D + 1):
                    new[k] = np.where(trig, rs[k], new[k])
            states = np.stack(new)
        else:
            # the \n state reset exists only in the D>0 engine
            # (sgrep.c agrep():1179-1181); bm/monkey (D==0) are plain
            # comparisons and match straight across newlines -- needed
            # when the pattern itself contains \n (-x wrap, ^/$).
            if D > 0:
                nl = windows[:, j] == 0x0A
                if nl.any():
                    states = np.where(nl[None, :], init_states, states)
            new0 = ((states[0] >> 1) | top) & cm
            new = [new0]
            for k in range(1, D + 1):
                new.append((((states[k] >> 1) | top) & cm)
                           | states[k - 1]
                           | (((new[k - 1] | states[k - 1]) >> 1) | top))
            ev = np.where((new[D] & endpos) != 0, np.uint32(1),
                          np.uint32(0))
            states = np.stack(new)
        events[:, j] = ev
    return events


# ---------------------------------------------------------------------
# jax backend
# ---------------------------------------------------------------------

def _scan_windows_jax(windows, mask_table, cvec, D, W, variant, costs):
    import jax
    n_dev = jax.device_count()
    if n_dev > 1 and windows.shape[0] >= 2 * n_dev:
        out = _scan_windows_jax_sharded(windows, mask_table, cvec, D,
                                        W, variant, costs, n_dev)
        if out is not None:
            return out
    return np.asarray(jax.device_get(_scan_windows_jit(
        windows, mask_table, cvec, D, W, variant, costs)))


def _scan_windows_jax_sharded(windows, mask_table, cvec, D, W, variant,
                              costs, n_dev):
    """Data-parallel scan over every visible device: tiles are already
    independent (each carries its own halo), so the mesh partition is
    just a sharding annotation on the tile axis -- XLA runs the same
    compiled scan per shard with zero communication (SURVEY.md section
    5: collectives only at reduction, which here is the host merge).
    Tile padding rows are dropped before returning, so results are
    byte-identical to the single-device path by construction."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    try:
        T = windows.shape[0]
        Tp = -(-T // n_dev) * n_dev
        wp = windows
        if Tp != T:
            wp = np.zeros((Tp, windows.shape[1]), windows.dtype)
            wp[:T] = windows
        mesh = Mesh(np.asarray(jax.devices()), ("shards",))
        sh = NamedSharding(mesh, P("shards", None))
        wd = jax.device_put(jnp.asarray(wp), sh)
        fn = _get_jit()
        ev = fn(wd, jnp.asarray(mask_table), jnp.asarray(cvec), D, W,
                variant, costs)
        return np.asarray(jax.device_get(ev))[:T]
    except Exception:
        # any partitioning failure falls back to the single-device
        # path (shard retry semantics: the work is re-run, not lost)
        return None


@functools.cache
def _get_jit():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit,
                       static_argnames=("D", "W", "variant", "costs"))
    def _scan(windows, mask_table, consts, D, W, variant, costs):
        T, S = windows.shape
        cmasks = mask_table[windows.astype(jnp.int32)]      # u32[T, S]
        is_nl = windows == 0x0A

        init0 = consts[0]
        init1_ns = consts[1]
        noerr = consts[2]
        d_endpos = consts[3]
        endpos = consts[4]
        d_mask = consts[5]
        zero = jnp.uint32(0)

        if variant == "bitap":
            init_states = jnp.broadcast_to(init0, (D + 1, T)) \
                .astype(jnp.uint32)
        else:
            levels = [0]
            for _ in range(D):
                prev = levels[-1]
                levels.append(((prev >> 1) | prev | 0x80000000) & 0xFFFFFFFF)
            init_states = jnp.broadcast_to(
                jnp.asarray(levels, dtype=jnp.uint32)[:, None], (D + 1, T))

        first_tile = (jnp.arange(T) == 0)

        def bitap_levels(states, cm):
            new0 = ((states[0] >> 1) & cm) | (init1_ns & states[0])
            new = [new0]
            if costs is None:
                for k in range(1, D + 1):
                    r2 = states[k - 1] | (((new[k - 1] | states[k - 1]) >> 1)
                                         & noerr)
                    new.append(((states[k] >> 1) & cm)
                               | (init1_ns & states[k]) | r2)
            else:
                ci, cs, cd = costs
                new = []
                for k in range(0, D + 1):
                    r = ((states[k] >> 1) & cm) | (init1_ns & states[k])
                    if k - ci >= 0:
                        r = r | states[k - ci]
                    err = zero
                    if k - cd >= 0:
                        err = err | new[k - cd]
                    if k - cs >= 0:
                        err = err | states[k - cs]
                    r = r | ((err >> 1) & noerr)
                    new.append(r)
            return new

        def step_bitap(states, xs):
            cm, col_idx = xs
            states = jnp.where(
                (col_idx == W) & first_tile[None, :], init_states, states)
            new = bitap_levels(states, cm)
            ev = (new[0] & d_endpos) | (new[D] & endpos)
            trigger = (new[0] & d_endpos) != 0
            b0 = jnp.broadcast_to(init0, cm.shape).astype(jnp.uint32)
            rs = bitap_levels(jnp.stack([b0] * (D + 1)), cm)
            rs[0] = rs[0] & d_mask
            new = [jnp.where(trigger, rs[k], new[k]) for k in range(D + 1)]
            return jnp.stack(new), ev

        def step_sgrep(states, xs):
            cm, col_idx, nl = xs
            states = jnp.where(
                (col_idx == W) & first_tile[None, :], init_states, states)
            if D > 0:    # \n reset only in agrep() (sgrep.c:1179-1181)
                states = jnp.where(nl[None, :], init_states, states)
            top = jnp.uint32(0x80000000)
            new0 = ((states[0] >> 1) | top) & cm
            new = [new0]
            for k in range(1, D + 1):
                new.append((((states[k] >> 1) | top) & cm)
                           | states[k - 1]
                           | (((new[k - 1] | states[k - 1]) >> 1) | top))
            ev = jnp.where((new[D] & endpos) != 0, jnp.uint32(1),
                           jnp.uint32(0))
            return jnp.stack(new), ev

        cols = jnp.arange(S, dtype=jnp.int32)
        if variant == "bitap":
            _, events = jax.lax.scan(step_bitap, init_states,
                                     (cmasks.T, cols))
        else:
            _, events = jax.lax.scan(step_sgrep, init_states,
                                     (cmasks.T, cols, is_nl.T))
        return events.T

    return _scan


def _scan_windows_jit(windows, mask_table, cvec, D, W, variant, costs):
    import jax.numpy as jnp
    fn = _get_jit()
    return fn(jnp.asarray(windows), jnp.asarray(mask_table),
              jnp.asarray(cvec), D, W, variant, costs)
