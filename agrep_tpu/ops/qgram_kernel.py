"""Pallas TPU kernel: dense q-gram membership filter for the one-pass
multi-pattern engine.

The host filter (compile/multi.py qgram_occurrences) tests, at every
byte position, whether the folded 2-gram hash
    h = (tr1[c] << 5) | tr1[c_prev]        (tr1[x] == tr[x] & 31)
belongs to the set of pattern-prefix tail grams.  On device the
1024-bit member set factors beautifully: bit h of the set == bit
tr1[c_prev] of word tr1[c] in a 32xu32 table, so the lookup is a
5-level blend tree over STATIC words (selected by the current char's
low 5 bits) + one per-lane variable shift by the previous char -- no
gather (XLA's jnp.take runs at 0.10 GB/s on this chip; this kernel is
~two orders faster).

The 2-char hash is the non-LONG prepf variant (newmgrep.c:1741-1743).
When the reference would use the 3-char LONG hash, this filter is still
a sound SUPERSET (any 3-gram member's tail 2-gram is a 2-gram member),
so the sparse host verify stays exact; only the candidate rate rises.

Layout and conventions mirror ops/kernels.py: windows u8[S, G, 8, 128],
grid (G, S/ROWS), candidate bits packed 32 positions per u32 plane
word.  The previous-byte carry lives in VMEM scratch across column
steps, so tiles only need a 1-byte halo (W covers it).
"""

from __future__ import annotations

import functools

import numpy as np

from . import kernels

SUB, LANE = kernels.SUB, kernels.LANE
GLANES = kernels.GLANES
ROWS = kernels.ROWS


def member_words(member: np.ndarray) -> tuple:
    """bool[1024] -> 32 static u32 words; bit p of word c == member
    of hash (c << 5) | p."""
    assert member.shape == (1024,)
    out = []
    for c in range(32):
        w = 0
        for p in range(32):
            if member[(c << 5) | p]:
                w |= 1 << p
        out.append(w)
    return tuple(out)


@functools.cache
def _get_qgram_kernel(words: tuple, interpret: bool = False,
                      rows: int = ROWS):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(windows_ref, out_ref, prev_ref):
        i_col = pl.program_id(1)

        @pl.when(i_col == 0)
        def _():
            prev_ref[0] = jnp.zeros((SUB, LANE), dtype=jnp.uint32)

        blk = windows_ref[...]

        def nz(v):
            x = v.astype(jnp.int32)
            return ((x | (0 - x)) >> 31).astype(jnp.uint32)

        prev = prev_ref[0]
        for w in range(rows // 32):
            cword = jnp.zeros((SUB, LANE), dtype=jnp.uint32)
            for b in range(32):
                r = w * 32 + b
                row32 = blk[r, 0].astype(jnp.uint32)
                f1 = row32 & jnp.uint32(31)
                # 5-level blend tree: select words[f1] from the 32
                # static constants
                m = [nz(f1 & jnp.uint32(1 << k)) for k in range(5)]
                lvl = [(jnp.uint32(words[2 * i + 1]) & m[0])
                       | (jnp.uint32(words[2 * i]) & ~m[0])
                       for i in range(16)]
                for k in range(1, 5):
                    lvl = [(lvl[2 * i + 1] & m[k])
                           | (lvl[2 * i] & ~m[k])
                           for i in range(len(lvl) // 2)]
                word = lvl[0]
                hit = (word >> prev) & jnp.uint32(1)
                cword = cword | (jnp.uint32(1 << b) & nz(hit))
                prev = f1
            out_ref[w, 0] = cword
        prev_ref[0] = prev

    @jax.jit
    def run(windows_t):
        S, G = windows_t.shape[:2]
        grid = (G, S // rows)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rows, 1, SUB, LANE),
                             lambda i, j: (j, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((rows // 32, 1, SUB, LANE),
                                   lambda i, j: (j, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((S // 32, G, SUB, LANE),
                                           jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((1, SUB, LANE), jnp.uint32),
            ],
            interpret=interpret,
        )(windows_t)

    return run


def qgram_candidates(text: np.ndarray, member1024: np.ndarray,
                     interpret: bool = False) -> np.ndarray | None:
    """Candidate positions i (text coords) where the 2-gram
    (text[i-1], text[i]) is a member.  Position 0 is tested against a
    zero previous byte (the halo cold start), mirroring the host
    filter's anchor range which starts at p_size-1 >= 1."""
    import jax
    import jax.numpy as jnp
    words = member_words(member1024)
    rows = 32 if interpret else ROWS
    N = int(text.shape[0])
    W, L = 8, 2048 - 8
    T = max(1, -(-N // L))
    G = -(-T // GLANES)
    S = -(-(W + L) // rows) * rows
    packf = kernels._get_device_packer()
    wt = packf(jnp.asarray(text), W, L, T, G, S)
    run = _get_qgram_kernel(words, interpret, rows)
    plane = np.asarray(jax.device_get(run(wt)))
    packed = kernels.unpack_planes(plane, T, W + L)
    bits = np.unpackbits(
        np.ascontiguousarray(packed).view(np.uint8)
        .reshape(packed.shape[0], -1), axis=1, bitorder="little")
    sel = bits[:, W:W + L].reshape(-1)[:N] != 0
    return np.flatnonzero(sel)
