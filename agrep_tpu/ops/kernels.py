"""Pallas TPU kernels for the bit-parallel scan.

The flagship kernel runs the k-error mask machine over a column-major
window array u8[S, T] (S byte columns, T parallel tile-lanes):

  * grid = (T/LANES, S/ROWS): the lane dimension is parallel, the
    column dimension iterates sequentially on-core with the k+1 u32
    state vectors living in VMEM scratch (persisted across grid steps,
    like a matmul accumulator);
  * the per-byte mask lookup is a static compare tree: each pattern
    position contributes (byte in ranges) << bit -- a few VPU ops per
    position, no table lookup at all (this environment's Mosaic
    crashes on tpu.DynamicGatherOp, and a one-hot MXU lookup costs
    16 KFLOP/byte);
  * the 256-row inner loop is fully unrolled, so every slice and store
    index is static (no alignment constraints);
  * events are emitted bit-packed -- one u32 word per 32 byte
    positions per lane for "delimiter completed" and "part matched"
    -- cutting HBM write traffic 32x vs dense event words.
"""

from __future__ import annotations

import functools

import numpy as np

ROWS = 256       # byte columns per grid step
LANES = 1024     # tile-lanes per grid step (= 8 sublanes x 128 lanes)


def ranges_from_mask(mask_table: np.ndarray):
    """Decompose a uint32[256] mask table into per-bit byte ranges.

    Returns a tuple of (bit_value, ((lo, hi), ...)) entries -- static
    kernel parameters.  Feasible when every bit's byte set is a union
    of few ranges (literal chars, [a-b] classes, folded chars); returns
    None when the table is too irregular (caller falls back to XLA)."""
    out = []
    for b in range(32):
        bit = np.uint32(1 << b)
        sel = np.flatnonzero((mask_table & bit) != 0)
        if len(sel) == 0:
            continue
        ranges = []
        lo = prev = int(sel[0])
        for v in sel[1:]:
            v = int(v)
            if v == prev + 1:
                prev = v
                continue
            ranges.append((lo, prev))
            lo = prev = v
        ranges.append((lo, prev))
        if len(ranges) > 8:
            return None
        out.append((int(bit), tuple(ranges)))
    if sum(len(r) for _, r in out) > 48:
        return None
    return tuple(out)


@functools.cache
def _get_pallas_scan(D: int, W: int, bit_ranges: tuple):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(consts_ref, windows_ref, delim_out, hit_out,
               states_ref):
        # windows_ref: u8[ROWS, LANES] block
        # outputs: u32[ROWS//32, LANES]; states_ref: u32[D+1, LANES]
        i_lane = pl.program_id(0)
        i_col = pl.program_id(1)
        init0 = consts_ref[0]
        init1_ns = consts_ref[1]
        noerr = consts_ref[2]
        d_endpos = consts_ref[3]
        endpos = consts_ref[4]
        d_mask = consts_ref[5]

        @pl.when(i_col == 0)
        def _():
            states_ref[...] = (jnp.zeros((D + 1, LANES),
                                         dtype=jnp.uint32) | init0)

        bytes_blk = windows_ref[...]                      # u8[ROWS, LANES]

        def cmask_row(row):
            # static compare-tree mask lookup on one byte row
            cm = jnp.zeros((1, LANES), dtype=jnp.uint32)
            for bitval, ranges in bit_ranges:
                hit = None
                for (lo, hi) in ranges:
                    if lo == hi:
                        t = row == np.uint8(lo)
                    else:
                        t = (row >= np.uint8(lo)) & (row <= np.uint8(hi))
                    hit = t if hit is None else (hit | t)
                cm = jnp.where(hit, cm | jnp.uint32(bitval), cm)
            return cm

        def levels(states, cm):
            new0 = ((states[0] >> 1) & cm) | (init1_ns & states[0])
            new = [new0]
            for k in range(1, D + 1):
                r2 = states[k - 1] | (((new[k - 1] | states[k - 1]) >> 1)
                                     & noerr)
                new.append(((states[k] >> 1) & cm)
                           | (init1_ns & states[k]) | r2)
            return new

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        states = [states_ref[k:k + 1, :] for k in range(D + 1)]
        for w in range(ROWS // 32):
            dword = jnp.zeros((1, LANES), dtype=jnp.uint32)
            hword = jnp.zeros((1, LANES), dtype=jnp.uint32)
            for b in range(32):
                r = w * 32 + b
                cm = cmask_row(bytes_blk[r:r + 1, :])
                # stream start: lane 0 of lane-block 0 begins its real
                # data at global column W -- force the cold state there
                g = i_col * ROWS + r
                if True:
                    start_mask = ((lane_iota == 0)
                                  & (g == W) & (i_lane == 0))
                    states = [jnp.where(start_mask,
                                        jnp.zeros_like(s) | init0, s)
                              for s in states]
                new = levels(states, cm)
                ev_d = (new[0] & d_endpos) != 0
                ev_h = (new[D] & endpos) != 0
                b0 = jnp.broadcast_to(init0, cm.shape).astype(jnp.uint32)
                rs = levels([b0] * (D + 1), cm)
                rs[0] = rs[0] & d_mask
                states = [jnp.where(ev_d, rs[k], new[k])
                          for k in range(D + 1)]
                bit = jnp.uint32(1 << b)
                dword = jnp.where(ev_d, dword | bit, dword)
                hword = jnp.where(ev_h, hword | bit, hword)
            delim_out[w:w + 1, :] = dword
            hit_out[w:w + 1, :] = hword
        for k in range(D + 1):
            states_ref[k:k + 1, :] = states[k]

    @jax.jit
    def run(windows_t, consts):
        S, T = windows_t.shape
        grid = (T // LANES, S // ROWS)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ROWS, LANES), lambda i, j: (j, i)),
            ],
            out_specs=[
                pl.BlockSpec((ROWS // 32, LANES), lambda i, j: (j, i)),
                pl.BlockSpec((ROWS // 32, LANES), lambda i, j: (j, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S // 32, T), jnp.uint32),
                jax.ShapeDtypeStruct((S // 32, T), jnp.uint32),
            ],
            scratch_shapes=[
                pltpu.VMEM((D + 1, LANES), jnp.uint32),
            ],
        )(consts, windows_t)

    return run


def pallas_scan_packed(windows: np.ndarray, mask_table: np.ndarray,
                      consts: dict, D: int, W: int):
    """windows: u8[T, S] row-major from _pad_and_window.  Pads S to a
    multiple of ROWS and T to a multiple of LANES, transposes, runs the
    kernel, and returns (delim_packed, hit_packed) u32[T, ceil(S/32)]
    row-major (padded region trimmed)."""
    import jax
    import jax.numpy as jnp
    T0, S0 = windows.shape
    br = ranges_from_mask(mask_table.astype(np.uint32))
    if br is None:
        return None
    S = -(-S0 // ROWS) * ROWS
    T = -(-T0 // LANES) * LANES
    wt = np.zeros((S, T), dtype=np.uint8)
    wt[:S0, :T0] = windows.T
    cvec = np.asarray([
        consts.get("init0", 0), consts.get("init1_ns", 0),
        consts.get("noerr", 0), consts.get("d_endpos", 0),
        consts.get("endpos", 0), consts.get("d_mask", 0xFFFFFFFF),
        0, 0], dtype=np.uint32)
    run = _get_pallas_scan(D, W, br)
    d, h = run(jnp.asarray(wt), jnp.asarray(cvec))
    s32 = -(-S0 // 32)
    d = np.asarray(jax.device_get(d)).T[:T0, :s32]
    h = np.asarray(jax.device_get(h)).T[:T0, :s32]
    return d, h
