"""Pallas TPU kernel for the regex-with-errors record lanes.

The record-parallel NFA scan (ops/renfa.py docstring; reference
re()/re1(), agrep.c:468-1917): lines are lanes, the 32-bit position-set
state advances one byte per column, and the per-line verdict is read at
the lane's newline column.  This kernel runs the SAME machine as
renfa._scan_records_np on a (8, 128) tile of lanes per group:

  * follow_bits, Init closures, init1/no_err/head_bit and the byte
    mask table are STATIC kernel parameters (baked per compiled query,
    cached across invocations like the bitap kernel);
  * nxt(S) = head_bit | U{follow_bits[p] : p in S} unrolls into one
    sign-trick select per nonzero follow entry -- no table gather
    (this Mosaic build has no DynamicGatherOp);
  * the byte -> CMask lookup reuses the compare-tree trick
    (kernels.ranges_from_mask) with a wider budget: regex masks are
    range-friendly (classes are literal ranges, NOCARE is 0-255);
  * per-lane line length rides in as one i32 tile per group; the
    verdict OR-accumulates in VMEM scratch and the final column block
    writes it out.

interpret=True runs the identical kernel body through the Pallas
interpreter on CPU (the conformance suite's hook, no TPU needed).
"""

from __future__ import annotations

import functools

import numpy as np

from . import kernels

SUB, LANE = 8, 128
GLANES = SUB * LANE
ROWS = 32      # unrolled column block: the regex body is ~10x heavier
               # per byte than bitap's, keep Mosaic compile bounded


def ranges_wide(mask_table: np.ndarray):
    """ranges_from_mask with a regex-sized budget (classes and NOCARE
    decompose into few ranges; M can be 30 bits)."""
    out = []
    total = 0
    for b in range(32):
        bit = np.uint32(1 << b)
        sel = sorted(int(v) for v in
                     np.flatnonzero((mask_table & bit) != 0))
        if not sel:
            continue
        ranges = []
        i = 0
        while i < len(sel):
            lo = prev = sel[i]
            i += 1
            while i < len(sel) and sel[i] == prev + 1:
                prev = sel[i]
                i += 1
            ranges.append((lo, prev))
        if len(ranges) > 2:
            # scattered class: a cube cover (OR of masked equalities)
            # is usually far cheaper -- see kernels._cube_cover_u8
            from .kernels import _cube_cover_u8
            cubes = _cube_cover_u8(set(sel))
            if cubes is not None and len(cubes) < len(ranges):
                ranges = [(-int(m), int(v)) for m, v in cubes]
        if len(ranges) > 16:
            return None
        total += len(ranges)
        out.append((int(bit), tuple(ranges)))
    if total > 128:
        return None
    return tuple(out)


@functools.cache
def _get_lanes_kernel(D: int, M: int, bit_ranges: tuple,
                      follow_bits: tuple, head_bit: int, init1: int,
                      noerr: int, inits: tuple, tail: bool,
                      interpret: bool = False, rows: int = ROWS):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(lanes_ref, lens_ref, out_ref, states_ref, matched_ref):
        # lanes_ref: u8[rows, 1, 8, 128]; lens_ref: i32[1, 1, 8, 128]
        i_col = pl.program_id(1)

        @pl.when(i_col == 0)
        def _():
            for k in range(D + 1):
                states_ref[k] = (jnp.zeros((SUB, LANE), dtype=jnp.uint32)
                                 | jnp.uint32(inits[k]))
            matched_ref[0] = jnp.zeros((SUB, LANE), dtype=jnp.uint32)

        blk = lanes_ref[...]
        lens = lens_ref[0, 0]

        def nz(v):
            x = v.astype(jnp.int32)
            return ((x | (0 - x)) >> 31).astype(jnp.uint32)

        def bit_mask(v, b):
            # u32 -> all-ones where (static) bit b of v is set
            x = v.astype(jnp.int32)
            if b != 31:
                x = x << (31 - b)
            return (x >> 31).astype(jnp.uint32)

        def cmask_row(row32):
            cm = jnp.zeros((SUB, LANE), dtype=jnp.uint32)
            for bitval, ranges in bit_ranges:
                hit = None
                for (lo, hi) in ranges:
                    if lo < 0:
                        # cube entry (-mask, val): (x & mask) == val
                        h = (((row32 & (-lo)) ^ hi) - 1) >> 31
                    elif lo == hi:
                        h = ((row32 ^ lo) - 1) >> 31
                    else:
                        h = ~(((row32 - lo) | (hi - row32)) >> 31)
                    hit = h if hit is None else (hit | h)
                cm = cm | (hit.astype(jnp.uint32) & jnp.uint32(bitval))
            return cm

        # Glushkov follow sets are mostly LINEAR (position p feeds only
        # p+1 -- plain concatenation); those entries collapse into one
        # masked shift.  Only genuinely nonlinear entries (closures,
        # alternations, epsilon tails) pay a per-entry sign spread, so
        # nxt costs 2 + 3*(#metachar edges) ops instead of 4*(M-1).
        lin_src = 0
        nonlin = []
        for p in range(1, M):
            fb = follow_bits[p]
            if fb == 0:
                continue
            nb = 1 << (M - p - 1)
            if fb & nb:
                lin_src |= 1 << (M - p)
                rest = fb & ~nb
            else:
                rest = fb
            if rest:
                nonlin.append((M - p, rest))

        def nxt(state):
            acc = (((state & jnp.uint32(lin_src)) >> 1)
                   | jnp.uint32(head_bit))
            for b, fbv in nonlin:
                acc = acc | (bit_mask(state, b) & jnp.uint32(fbv))
            return acc

        u_init1 = jnp.uint32(init1)
        u_noerr = jnp.uint32(noerr)
        states = [states_ref[k] for k in range(D + 1)]
        matched = matched_ref[0]
        for r in range(rows):
            row32 = blk[r, 0].astype(jnp.int32)
            cm = cmask_row(row32)
            col = i_col * rows + r
            # verdict BEFORE the char transition (renfa._scan_records_np)
            eq = ((lens - col) | (col - lens)) >> 31    # -1 where !=
            at_nl = (~eq).astype(jnp.uint32)            # ones where ==
            nxt_D = nxt(states[D])
            ad = (nxt_D & cm) | (u_init1 & states[D])
            if tail:
                ad = nxt(ad) | ad
            matched = matched | (at_nl & ad & jnp.uint32(1))
            nxt_k = [nxt(states[k]) for k in range(D)] + [nxt_D]
            new = [(nxt_k[0] & cm) | (u_init1 & states[0])]
            for k in range(1, D + 1):
                r0 = states[k - 1] | new[k - 1]
                new.append((nxt_k[k] & cm)
                           | ((states[k - 1] | nxt(r0)) & u_noerr)
                           | (u_init1 & states[k]))
            states = new
        for k in range(D + 1):
            states_ref[k] = states[k]
        matched_ref[0] = matched
        # same out block for every column step: the last write wins
        out_ref[0, 0] = matched

    @jax.jit
    def run(lanes_t, lens_t):
        S, G = lanes_t.shape[:2]
        grid = (G, S // rows)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rows, 1, SUB, LANE),
                             lambda i, j: (j, i, 0, 0)),
                pl.BlockSpec((1, 1, SUB, LANE),
                             lambda i, j: (0, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, SUB, LANE),
                                   lambda i, j: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, G, SUB, LANE),
                                           jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((D + 1, SUB, LANE), jnp.uint32),
                pltpu.VMEM((1, SUB, LANE), jnp.uint32),
            ],
            interpret=interpret,
        )(lanes_t, lens_t)

    return run


def pallas_scan_records(lanes: np.ndarray, lens: np.ndarray, mc,
                        interpret: bool = False):
    """Drop-in runner for renfa.scan_records (all lanes start from the
    same post-reset states, which regex_engine always passes).
    Returns matched bool[R], or None when the mask table is not
    range-decomposable."""
    import jax
    import jax.numpy as jnp
    br = ranges_wide(mc["mask"].astype(np.uint32))
    if br is None:
        return None
    R, L = lanes.shape
    rows = ROWS
    S = -(-L // rows) * rows
    T = -(-R // GLANES) * GLANES
    G = T // GLANES
    lp = np.zeros((T, S), dtype=np.uint8)
    lp[:R, :L] = lanes
    lanes_t = np.ascontiguousarray(
        lp.reshape(G, SUB, LANE, S).transpose(3, 0, 1, 2))
    lv = np.full(T, -1, dtype=np.int32)   # padding lanes never match
    lv[:R] = lens
    lens_t = np.ascontiguousarray(
        lv.reshape(1, G, SUB, LANE))
    run = _get_lanes_kernel(
        int(mc["D"]), int(mc["M"]), br,
        tuple(int(v) for v in mc["follow_bits"]),
        int(mc["head_bit"]), int(mc["init1"]), int(mc["no_err"]),
        tuple(int(v) for v in mc["inits"]), bool(mc["tail"]),
        interpret, rows)
    out = np.asarray(jax.device_get(run(jnp.asarray(lanes_t),
                                        jnp.asarray(lens_t))))
    flat = out.reshape(G * GLANES)[:R]
    return flat != 0
