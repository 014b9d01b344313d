"""Pallas TPU kernels for the bit-parallel scan.

The flagship kernel runs the k-error mask machine over a [S, LANES]
column-major window array: each grid step owns a block of lanes, loops
over the S byte columns with the k+1 u32 state vectors held in
registers (VPU lanes), and emits *bit-packed* event planes -- one bit
per byte position for "delimiter completed here" and "part matched
here" -- so HBM write traffic is N/8 bytes instead of 4N.

The per-byte mask lookup (CMask = Mask[byte]) is performed on the MXU
as a one-hot matmul: a [LB, 256] one-hot of the byte column against the
[256, 32] bit-plane expansion of the mask table gives the 32 mask bits
exactly (each one-hot row selects one table row; bf16 sums of one
nonzero term are exact).  This keeps the kernel gather-free.
"""

from __future__ import annotations

import functools

import numpy as np


def mask_bitplanes(mask_table: np.ndarray) -> np.ndarray:
    """uint32[256] -> bfloat16[256, 32] bit planes (LSB first)."""
    bits = ((mask_table[:, None] >> np.arange(32)[None, :]) & 1)
    return bits.astype(np.float32)


@functools.cache
def _get_pallas_scan():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(consts_ref, windows_ref, planes_ref, delim_out, hit_out,
               *, D, W, S):
        # windows_ref: u8[S, LB]; planes_ref: f32[256, 32]
        # outputs: u32[S32, LB] packed bits (bit j of word w = column
        # w*32+j)
        LB = windows_ref.shape[1]
        init0 = consts_ref[0]
        init1_ns = consts_ref[1]
        noerr = consts_ref[2]
        d_endpos = consts_ref[3]
        endpos = consts_ref[4]
        d_mask = consts_ref[5]

        def levels(states, cm):
            new0 = ((states[0] >> 1) & cm) | (init1_ns & states[0])
            new = [new0]
            for k in range(1, D + 1):
                r2 = states[k - 1] | (((new[k - 1] | states[k - 1]) >> 1)
                                     & noerr)
                new.append(((states[k] >> 1) & cm)
                           | (init1_ns & states[k]) | r2)
            return new

        def step(j, carry):
            states, dword, hword = carry
            col = windows_ref[pl.ds(j, 1), :]             # u8[1, LB]
            onehot = (col.astype(jnp.int32)
                      == jax.lax.broadcasted_iota(jnp.int32, (256, LB), 0)
                      ).astype(jnp.float32)               # [256, LB]
            # [32, 256] x [256, LB] -> [32, LB] exact 0/1 floats
            bits = jax.lax.dot_general(
                planes_ref[:, :], onehot,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [32, LB]
            # pack the 32 bit-planes into u32 lanes (int32 arithmetic;
            # Mosaic lacks float->uint32 casts, so go via int32+bitcast)
            shifts = jax.lax.broadcasted_iota(jnp.int32, (32, LB), 0)
            terms = jnp.left_shift(bits.astype(jnp.int32), shifts)
            cm = pltpu.bitcast(
                jnp.sum(terms, axis=0, keepdims=True), jnp.uint32)

            states = [jnp.where(j == W, jnp.uint32(init0), s)
                      for s in states]
            new = levels(states, cm)
            ev_delim = (new[0] & d_endpos) != 0
            ev_hit = (new[D] & endpos) != 0
            trig = ev_delim
            b0 = jnp.broadcast_to(jnp.uint32(init0), cm.shape)
            rs = levels([b0] * (D + 1), cm)
            rs[0] = rs[0] & d_mask
            new = [jnp.where(trig, rs[k], new[k]) for k in range(D + 1)]

            bit = jnp.uint32(1) << jnp.uint32(j % 32)
            dword = dword | jnp.where(ev_delim, bit, jnp.uint32(0))
            hword = hword | jnp.where(ev_hit, bit, jnp.uint32(0))

            flush = (j % 32) == 31

            @pl.when(flush)
            def _():
                delim_out[pl.ds(j // 32, 1), :] = dword
                hit_out[pl.ds(j // 32, 1), :] = hword
            dword = jnp.where(flush, jnp.uint32(0), dword)
            hword = jnp.where(flush, jnp.uint32(0), hword)
            return new, dword, hword

        states0 = [jnp.zeros((1, LB), dtype=jnp.uint32)
                   for _ in range(D + 1)]
        zero = jnp.zeros((1, LB), dtype=jnp.uint32)
        states, dword, hword = jax.lax.fori_loop(
            0, S, step, (states0, zero, zero))
        if S % 32 != 0:
            delim_out[pl.ds(S // 32, 1), :] = dword
            hit_out[pl.ds(S // 32, 1), :] = hword

    @functools.partial(jax.jit,
                       static_argnames=("D", "W", "lane_block"))
    def pallas_scan(windows_t, planes, consts, D, W, lane_block=512):
        """windows_t: u8[S, T] (column major); returns packed
        (delim u32[S32, T], hits u32[S32, T])."""
        import jax.numpy as jnp
        S, T = windows_t.shape
        S32 = -(-S // 32)
        kern = functools.partial(kernel, D=D, W=W, S=S)
        grid = (-(-T // lane_block),)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((S, lane_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((256, 32), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((S32, lane_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S32, lane_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((S32, T), jnp.uint32),
                jax.ShapeDtypeStruct((S32, T), jnp.uint32),
            ],
        )(consts, windows_t, planes)

    return pallas_scan


def pallas_scan_packed(windows: np.ndarray, mask_table: np.ndarray,
                       consts: dict, D: int, W: int):
    """Run the Pallas kernel; windows u8[T, S] row-major as produced by
    _pad_and_window.  Returns (delim_packed, hit_packed) as u32[T, S32]
    row-major (transposed back)."""
    import jax
    import jax.numpy as jnp
    scan = _get_pallas_scan()
    planes = jnp.asarray(mask_bitplanes(mask_table))
    cvec = jnp.asarray([
        consts.get("init0", 0), consts.get("init1_ns", 0),
        consts.get("noerr", 0), consts.get("d_endpos", 0),
        consts.get("endpos", 0), consts.get("d_mask", 0xFFFFFFFF),
        0, 0], dtype=jnp.uint32)
    wt = jnp.asarray(windows).T
    d, h = scan(wt, planes, cvec, D, W)
    return (np.asarray(jax.device_get(d)).T,
            np.asarray(jax.device_get(h)).T)
