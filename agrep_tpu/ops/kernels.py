"""Pallas TPU kernels for the bit-parallel scan.

The flagship kernel runs the k-error mask machine over a column-major
window array u8[S, G, 8, 128] (S byte columns; G x 8 x 128 = T parallel
tile-lanes laid out as native Mosaic (sublane, lane) tiles):

  * grid = (G, S/ROWS): the lane-group dimension is parallel, the
    column dimension iterates sequentially on-core with the k+1 u32
    state tiles living in VMEM scratch (persisted across grid steps,
    like a matmul accumulator);
  * every vector op is on a native (8, 128) tile -- (1, T) row vectors
    trip Mosaic relayout errors ("non-singleton dimension replicated");
  * the per-byte mask lookup is a static compare tree: each pattern
    position contributes (byte in ranges) << bit -- a few VPU ops per
    position, no table lookup at all (this environment's Mosaic
    crashes on tpu.DynamicGatherOp, and a one-hot MXU lookup costs
    16 KFLOP/byte);
  * the ROWS-deep inner loop is fully unrolled, so every slice and
    store index is static (no alignment constraints);
  * events are emitted bit-packed -- one u32 word per 32 byte
    positions per lane for "delimiter completed" and "part matched"
    -- cutting HBM write traffic 32x vs dense event words.

Reference semantics carried: the transition is asearch.c:100-115 /
bitap.c:169-283 (exact when D == 0); delimiter completion resets the
machine through the d_mask gate exactly like the numpy/XLA backends.
"""

from __future__ import annotations

import functools

import numpy as np

ROWS = 128        # byte columns per grid step (128 keeps the fully
                  # unrolled body's Mosaic compile under ~6 s and ran
                  # fastest of 64/128/256 on v5e)
SUB, LANE = 8, 128
GLANES = SUB * LANE   # tile-lanes per lane-group (one (8,128) tile)


def _cube_cover_u8(byte_set: set, cap: int = 16):
    """Cover a byte set with (mask, value) cubes -- a cube holds the
    bytes b with (b & mask) == value, so one masked-equality compare
    tests a whole subcube (maskgen.c:96-127 builds these classes for
    free; this recovers a compact device test for scattered sets).
    Greedy: free every maskable bit of each seed.  Returns a tuple of
    cubes or None past cap."""
    remaining = set(byte_set)
    cubes = []
    while remaining:
        seed = min(remaining)
        mask = 0xFF
        for b in range(8):
            trial = mask & ~(1 << b)
            val = seed & trial
            ok = True
            for v in range(256):
                if (v & trial) == val and v not in byte_set:
                    ok = False
                    break
            if ok:
                mask = trial
        val = seed & mask
        cubes.append((mask, val))
        remaining = {v for v in remaining if (v & mask) != val}
        if len(cubes) > cap:
            return None
    return tuple(cubes)


def ranges_from_mask(mask_table: np.ndarray):
    """Decompose a uint32[256] mask table into per-bit byte tests.

    Returns a tuple of (bit_value, ((lo, hi), ...), (fold_c, ...),
    ((cube_mask, cube_val), ...)) entries -- static kernel parameters.
    A fold_c entry matches the case pair {c, c^0x20} with ONE compare
    on (byte | 0x20); a cube entry matches (byte & mask) == val --
    scattered character classes (maskgen.c:96-127) that defeat the
    run decomposition usually collapse into a few cubes.  Per bit the
    cheaper decomposition wins; returns None when the table is too
    irregular even for cubes (caller falls back to XLA)."""
    out = []
    total = 0
    for b in range(32):
        bit = np.uint32(1 << b)
        sel_all = set(int(v) for v in
                      np.flatnonzero((mask_table & bit) != 0))
        if not sel_all:
            continue
        sel = set(sel_all)
        folds = []
        for c in sorted(sel):
            if (c & 0x20) and (c ^ 0x20) in sel and c in sel:
                folds.append(c)
                sel.discard(c)
                sel.discard(c ^ 0x20)
        ranges = []
        run = sorted(sel)
        i = 0
        while i < len(run):
            lo = prev = run[i]
            i += 1
            while i < len(run) and run[i] == prev + 1:
                prev = run[i]
                i += 1
            ranges.append((lo, prev))
        n_rf = len(ranges) + len(folds)
        cubes = _cube_cover_u8(sel_all) if n_rf > 2 else None
        if cubes is not None and len(cubes) < n_rf:
            out.append((int(bit), (), (), tuple(cubes)))
        elif n_rf <= 16:
            out.append((int(bit), tuple(ranges), tuple(folds), ()))
        else:
            return None
    # positions with identical byte sets (repeated pattern chars)
    # share ONE compare: merge their bits
    merged: dict = {}
    for bit, ranges, folds, cubes in out:
        key = (ranges, folds, cubes)
        merged[key] = merged.get(key, 0) | bit
    out = [(bits, r, f, cu) for (r, f, cu), bits in merged.items()]
    total = sum(len(r) + len(f) + len(cu) for _, r, f, cu in out)
    if total > 64:
        return None
    return tuple(out)


def _single_bit(v) -> int | None:
    """Bit index when v has exactly one set bit, else None."""
    v = int(v)
    if v and (v & (v - 1)) == 0:
        return v.bit_length() - 1
    return None


@functools.cache
def _get_pallas_scan(D: int, W: int, bit_ranges: tuple,
                     variant: str = "bitap", ep_bits: tuple = (),
                     interpret: bool = False, rows: int = ROWS,
                     costs: tuple | None = None,
                     d_bit: int | None = None,
                     e_bit: int | None = None):
    """interpret=True runs the kernel through the Pallas interpreter on
    CPU -- same kernel body, no Mosaic -- so the production kernel's
    logic is testable in CI without a TPU (tests/test_pallas_kernel.py).
    rows shrinks the unrolled column block (the interpreter pays XLA
    compile time per unrolled step; 32 keeps it ~10 s).
    costs = (I, S, DD) non-uniform edit costs (asearch1.c:90-97): the
    level a transition draws from is a static offset, so the cost
    variant is the same unrolled chain with different wiring.
    d_bit/e_bit: static bit index of d_endpos/endpos when single-bit
    (the usual case) -- the event test is then one shift pair instead
    of the 4-op nonzero mask."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ones = np.uint32(0xFFFFFFFF)

    # sgrep initial state chain (scan.py _scan_windows_np)
    sg_lvl_v = [np.uint32(0)]
    for _ in range(D):
        _prev = int(sg_lvl_v[-1])
        sg_lvl_v.append(np.uint32(((_prev >> 1) | _prev | 0x80000000)
                                  & 0xFFFFFFFF))

    n_hit = max(1, len(ep_bits))

    def kernel(consts_ref, windows_ref, *outs):
        # windows_ref: u8[ROWS, 1, 8, 128]; outputs u32[ROWS//32, 1, 8, 128]
        # outs = (delim_out, hit_out... [one per endpos bit], states_ref)
        delim_out = outs[0]
        hit_outs = outs[1:1 + n_hit]
        states_ref = outs[-1]
        i_grp = pl.program_id(0)
        i_col = pl.program_id(1)
        init0 = consts_ref[0]
        init1_ns = consts_ref[1]
        noerr = consts_ref[2]
        d_endpos = consts_ref[3]
        endpos = consts_ref[4]
        d_mask = consts_ref[5]

        if variant == "bitap":
            def init_level(k):
                return init0
        else:
            def init_level(k):
                return jnp.uint32(sg_lvl_v[k])

        @pl.when(i_col == 0)
        def _():
            for k in range(D + 1):
                states_ref[k] = (jnp.zeros((SUB, LANE), dtype=jnp.uint32)
                                 | init_level(k))

        blk = windows_ref[...]                    # u8[ROWS, 1, 8, 128]

        # Branchless integer masks only: this Mosaic build cannot
        # relayout non-singleton i1 vectors, so every "select" is an
        # all-ones/all-zeros u32 mask built from sign-bit arithmetic.
        def nz(v):
            # u32 -> all-ones where v != 0 (sign of v | -v)
            x = v.astype(jnp.int32)
            return ((x | (0 - x)) >> 31).astype(jnp.uint32)

        def bit_mask(v, b):
            # u32 -> all-ones where bit b of v is set (b static)
            x = v.astype(jnp.int32)
            if b != 31:
                x = x << (31 - b)
            return (x >> 31).astype(jnp.uint32)

        any_folds = any(f for _, _, f, _ in bit_ranges)

        def cmask_row(row32):
            # static compare-tree mask lookup on one (8,128) i32 tile:
            # lo <= x <= hi  iff  sign((x-lo) | (hi-x)) == 0; single
            # chars and case pairs {c, c^0x20} are one equality --
            # x == c  iff  sign((x^c) - 1) < 0 (x^c is in [0, 255]),
            # three ops instead of the two-sided range test's five;
            # cubes test (x & mask) == val -- one masked equality per
            # subcube covers a scattered class (maskgen.c:96-127)
            cm = jnp.zeros((SUB, LANE), dtype=jnp.uint32)
            rowf = (row32 | 0x20) if any_folds else row32
            for bitval, ranges, folds, cubes in bit_ranges:
                hit = None                       # all-ones on hit
                for (lo, hi) in ranges:
                    if lo == hi:
                        h = ((row32 ^ lo) - 1) >> 31
                    else:
                        h = ~(((row32 - lo) | (hi - row32)) >> 31)
                    hit = h if hit is None else (hit | h)
                for c in folds:
                    h = ((rowf ^ c) - 1) >> 31
                    hit = h if hit is None else (hit | h)
                for (cmask, cval) in cubes:
                    h = (((row32 & cmask) ^ cval) - 1) >> 31
                    hit = h if hit is None else (hit | h)
                cm = cm | (hit.astype(jnp.uint32) & jnp.uint32(bitval))
            return cm

        def levels(states, cm):
            if costs is not None:
                # asearch1 wiring: insert from level k-I, substitute
                # from k-S, delete from k-DD (asearch1.c:90-97), same
                # indexing as the numpy/XLA backends
                ci, cs, cd = costs
                new = []
                for k in range(0, D + 1):
                    r = ((states[k] >> 1) & cm) | (init1_ns & states[k])
                    if k - ci >= 0:
                        r = r | states[k - ci]
                    err = None
                    if k - cd >= 0:
                        err = new[k - cd]
                    if k - cs >= 0:
                        err = states[k - cs] if err is None \
                            else (err | states[k - cs])
                    if err is not None:
                        r = r | ((err >> 1) & noerr)
                    new.append(r)
                return new
            new0 = ((states[0] >> 1) & cm) | (init1_ns & states[0])
            new = [new0]
            for k in range(1, D + 1):
                r2 = states[k - 1] | (((new[k - 1] | states[k - 1]) >> 1)
                                     & noerr)
                new.append(((states[k] >> 1) & cm)
                           | (init1_ns & states[k]) | r2)
            return new

        top = jnp.uint32(0x80000000)

        def levels_sgrep(states, cm):
            # sgrep.c agrep():1183-1186, inverted-bit shift-or
            new0 = ((states[0] >> 1) | top) & cm
            new = [new0]
            for k in range(1, D + 1):
                new.append(((((states[k] >> 1) | top) & cm)
                            | states[k - 1])
                           | (((new[k - 1] | states[k - 1]) >> 1) | top))
            return new

        # stream start: global lane 0 begins its real data at column W
        # with a zero halo -- force the cold state there.
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
        z = iota_s + iota_l
        lane0 = (~((z | (0 - z)) >> 31)).astype(jnp.uint32)  # 1s at (0,0)

        states = [states_ref[k] for k in range(D + 1)]
        for w in range(rows // 32):
            dword = jnp.zeros((SUB, LANE), dtype=jnp.uint32)
            hwords = [jnp.zeros((SUB, LANE), dtype=jnp.uint32)
                      for _ in range(n_hit)]
            for b in range(32):
                r = w * 32 + b
                row32 = blk[r, 0].astype(jnp.int32)
                cm = cmask_row(row32)
                if r == W % rows:
                    # cold start: global lane 0's real data begins at
                    # column W -- the blend is needed at exactly ONE
                    # static unrolled step (g == W), not per byte
                    g = i_col * rows + r
                    cold = (((g == W) & (i_grp == 0))
                            .astype(jnp.uint32) * lane0)
                    states = [(s & ~cold) | (init_level(k) & cold)
                              for k, s in enumerate(states)]
                bit = jnp.uint32(1 << b)
                if variant == "bitap":
                    new = levels(states, cm)
                    m_d = (bit_mask(new[0], d_bit) if d_bit is not None
                           else nz(new[0] & d_endpos))
                    # Restart chain: levels() on all-init0 states
                    # constant-folds -- every term except the cm blend
                    # and the k-1 carry is a SCALAR expression (rides
                    # the scalar core), so the restart costs ~5 vector
                    # ops per level instead of a second full levels()
                    s_half = init0 >> 1
                    s_base0 = init1_ns & init0
                    t_cm = cm & s_half
                    rs = [t_cm | s_base0]
                    if costs is not None:
                        ci, cs, cd = costs
                        for k in range(1, D + 1):
                            r = t_cm | s_base0
                            if k - ci >= 0:
                                r = r | init0
                            err = None
                            if k - cd >= 0:
                                err = rs[k - cd]
                            if k - cs >= 0:
                                err = init0 if err is None \
                                    else (err | init0)
                            if err is not None:
                                r = r | ((err >> 1) & noerr)
                            rs.append(r)
                    else:
                        s_basek = s_base0 | init0
                        for k in range(1, D + 1):
                            rs.append(t_cm | s_basek
                                      | (((rs[k - 1] | init0) >> 1)
                                         & noerr))
                    rs[0] = rs[0] & d_mask
                    final = new[D]
                    states = [(rs[k] & m_d) | (new[k] & ~m_d)
                              for k in range(D + 1)]
                    dword = dword | (bit & m_d)
                else:
                    if D > 0:
                        # \n state reset, sgrep.c agrep():1179-1181
                        s_nl = ((row32 - 10) | (10 - row32)) >> 31
                        m_nl = (~s_nl).astype(jnp.uint32)
                        states = [(s & ~m_nl)
                                  | (init_level(k) & m_nl)
                                  for k, s in enumerate(states)]
                    new = levels_sgrep(states, cm)
                    final = new[D]
                    states = new
                if ep_bits:
                    for e, bv in enumerate(ep_bits):
                        eb = _single_bit(bv)
                        hm = (bit_mask(final, eb) if eb is not None
                              else nz(final & jnp.uint32(bv)))
                        hwords[e] = hwords[e] | (bit & hm)
                else:
                    hm = (bit_mask(final, e_bit) if e_bit is not None
                          else nz(final & endpos))
                    hwords[0] = hwords[0] | (bit & hm)
            delim_out[w, 0] = dword
            for e in range(n_hit):
                hit_outs[e][w, 0] = hwords[e]
        for k in range(D + 1):
            states_ref[k] = states[k]

    @jax.jit
    def run(windows_t, consts):
        S, G = windows_t.shape[:2]
        grid = (G, S // rows)
        spec = pl.BlockSpec((rows // 32, 1, SUB, LANE),
                            lambda i, j: (j, i, 0, 0))
        shape = jax.ShapeDtypeStruct((S // 32, G, SUB, LANE), jnp.uint32)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, 1, SUB, LANE),
                             lambda i, j: (j, i, 0, 0)),
            ],
            out_specs=[spec] * (1 + n_hit),
            out_shape=[shape] * (1 + n_hit),
            scratch_shapes=[
                pltpu.VMEM((D + 1, SUB, LANE), jnp.uint32),
            ],
            interpret=interpret,
        )(consts, windows_t)

    return run


def pack_windows(windows: np.ndarray, rows: int = ROWS):
    """u8[T0, S0] row-major -> (u8[S, G, 8, 128] device layout, T0, S0).

    Pads S0 to a multiple of rows and T0 to a multiple of 8*128; lane
    t = (g*8 + su)*128 + l."""
    T0, S0 = windows.shape
    S = -(-S0 // rows) * rows
    T = -(-T0 // GLANES) * GLANES
    wp = np.zeros((T, S), dtype=np.uint8)
    wp[:T0, :S0] = windows
    G = T // GLANES
    wt = np.ascontiguousarray(
        wp.reshape(G, SUB, LANE, S).transpose(3, 0, 1, 2))
    return wt


def unpack_planes(plane: np.ndarray, T0: int, S0: int) -> np.ndarray:
    """u32[S//32, G, 8, 128] -> u32[T0, ceil(S0/32)] row-major packed
    bit planes (bit j of word w = column w*32 + j)."""
    s32_full, G = plane.shape[:2]
    out = plane.transpose(1, 2, 3, 0).reshape(G * GLANES, s32_full)
    return out[:T0, :-(-S0 // 32)]


@functools.cache
def _get_device_packer():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit,
                       static_argnames=("W", "L", "T", "G", "S"))
    def pack(text_dev, W, L, T, G, S):
        """u8[N] -> u8[S, G, 8, 128] window layout, built on device
        (three HBM-speed passes instead of a host transpose + full
        re-upload)."""
        N = text_dev.shape[0]
        total = T * L
        padded = jnp.pad(text_dev, (W, total - N))
        body = padded[W:].reshape(T, L)
        halo = padded[:total].reshape(T, L)[:, :W]
        win = jnp.concatenate([halo, body], axis=1)      # (T, W+L)
        TP = G * GLANES
        S0 = W + L
        win = jnp.pad(win, ((0, TP - T), (0, S - S0)))
        return win.reshape(G, SUB, LANE, S).transpose(3, 0, 1, 2)

    return pack


def pallas_scan_stream(text: np.ndarray, mask_table: np.ndarray,
                       consts: dict, D: int, W: int, L: int,
                       variant: str = "bitap", ep_bits: tuple = (),
                       interpret: bool = False,
                       costs: tuple | None = None):
    """Scan a raw byte stream: upload u8[N] once, build the window
    layout on device, run the kernel.  Returns (delim_p, [hit_p...])
    packed planes in window coordinates, plus (T, W, L) geometry; or
    None when the mask table has no compact range decomposition."""
    import jax
    import jax.numpy as jnp
    br = ranges_from_mask(mask_table.astype(np.uint32))
    if br is None:
        return None
    rows = 32 if interpret else ROWS
    N = int(text.shape[0])
    T = max(1, -(-N // L))
    G = -(-T // GLANES)
    S = -(-(W + L) // rows) * rows
    cvec = np.asarray([
        consts.get("init0", 0), consts.get("init1_ns", 0),
        consts.get("noerr", 0), consts.get("d_endpos", 0),
        consts.get("endpos", 0), consts.get("d_mask", 0xFFFFFFFF),
        0, 0], dtype=np.uint32)
    packf = _get_device_packer()
    wt = packf(jnp.asarray(text), W, L, T, G, S)
    run = _get_pallas_scan(D, W, br, variant, ep_bits, interpret, rows,
                           costs, _single_bit(cvec[3]),
                           None if ep_bits else _single_bit(cvec[4]))
    outs = run(wt, jnp.asarray(cvec))
    outs = [unpack_planes(np.asarray(jax.device_get(o)), T, W + L)
            for o in outs]
    return outs[0], outs[1:]


def pallas_scan_packed(windows: np.ndarray, mask_table: np.ndarray,
                       consts: dict, D: int, W: int,
                       variant: str = "bitap", ep_bits: tuple = (),
                       interpret: bool = False,
                       costs: tuple | None = None):
    """windows: u8[T, S] row-major from _pad_and_window.  Returns
    (delim_packed, hit_planes) with hit_planes a list of
    u32[T, ceil(S/32)] packed planes -- one per entry of ep_bits, or a
    single combined plane when ep_bits is empty.  None when the mask
    table has no compact range decomposition."""
    import jax
    import jax.numpy as jnp
    T0, S0 = windows.shape
    br = ranges_from_mask(mask_table.astype(np.uint32))
    if br is None:
        return None
    rows = 32 if interpret else ROWS
    wt = pack_windows(windows, rows)
    cvec = np.asarray([
        consts.get("init0", 0), consts.get("init1_ns", 0),
        consts.get("noerr", 0), consts.get("d_endpos", 0),
        consts.get("endpos", 0), consts.get("d_mask", 0xFFFFFFFF),
        0, 0], dtype=np.uint32)
    run = _get_pallas_scan(D, W, br, variant, ep_bits, interpret, rows,
                           costs, _single_bit(cvec[3]),
                           None if ep_bits else _single_bit(cvec[4]))
    outs = run(jnp.asarray(wt), jnp.asarray(cvec))
    outs = [unpack_planes(np.asarray(jax.device_get(o)), T0, S0)
            for o in outs]
    return outs[0], outs[1:]


def planes_to_events(delim_p: np.ndarray, hit_p: np.ndarray,
                     consts: dict, W: int, L: int, N: int) -> np.ndarray:
    """Rebuild the dense u32 event stream from packed bit planes.

    Work is O(set bits): only words with any event touch the output.
    Valid when endpos is a single bit (the hit plane cannot say WHICH
    part bit fired); callers gate on that."""
    d_endpos = np.uint32(consts.get("d_endpos", 0))
    endpos = np.uint32(consts.get("endpos", 0))
    events = np.zeros(N, dtype=np.uint32)
    for plane, val in ((delim_p, d_endpos), (hit_p, endpos)):
        if val == 0:
            continue
        # u32 words -> per-column bits, LSB first (bit j of word w is
        # column w*32+j); drop the cold-start halo columns, flatten to
        # stream order.  Three vectorized passes over ~N bytes.
        bits = np.unpackbits(
            np.ascontiguousarray(plane).view(np.uint8)
            .reshape(plane.shape[0], -1),
            axis=1, bitorder="little")
        sel = bits[:, W:W + L].reshape(-1)[:N] != 0
        events[sel] |= val
    return events
