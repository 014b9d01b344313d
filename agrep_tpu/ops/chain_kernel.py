"""Pallas TPU kernel: exact multi-pattern match via bit-plane
shifted-AND chains -- the one-pass `-f` engine's device scan.

The reference matches N patterns in one pass with a hashed Boyer-Moore
skip table plus per-candidate verify (newmgrep.c:1725-1851 f_prep /
:803-1043 monkey1).  Skipping is a scalar-CPU idiom; a TPU wants every
byte touched densely but CHEAPLY.  This kernel spends O(1) vector ops
per (pattern position, 32 bytes) with no per-byte machine state at all:

  1. Byte bit-planes.  Each lane packs 32 consecutive bytes into one
     u32 per bit: P_b bit r = bit b of byte (32*w + r).  8 planes, 3
     vector ops per byte.
  2. Equality planes.  For each distinct folded character class of the
     pattern set, EQ_c = AND over the 8 planes (negated where the char
     bit is 0) -- a byte-parallel LUT-free compare; case pairs
     {c, c^0x20} drop the bit-5 plane, and general fold classes are a
     small OR of such cubes.  Shared across every pattern position
     using that class.
  3. Shifted-AND chains.  Pattern p matches starting at i iff
     EQ_{p[t]}[i+t] for all t.  On packed planes a +t byte shift is
     (EQ[w] >> t) | (EQ[w+1] << 32-t), so a length-L pattern is an
     L-term AND chain (4 vector ops per position per 32 bytes); the OR
     over patterns is the output plane: bit r of word w == some
     pattern starts at byte 32*w + r.

Unlike the q-gram member filter (qgram_kernel.py) this is EXACT: the
host never verifies false positives, only attributes term ids at true
hits (compile/multi.py qgram_occurrences consumes the starts as
`cand_anchor_rel` and its progressive compare degenerates to sparse
bookkeeping).  There is no sequential state, so the grid is
embarrassingly parallel: each step re-derives one extra word of
equality planes (the `nxt` input) instead of carrying scratch.

Layout mirrors ops/kernels.py: windows u8[S, G, 8, 128] column-major,
grid (G, S/ROWS), output bits packed 32 positions per u32.  Windows
carry a TAIL halo (match starts need lookahead, not history).
"""

from __future__ import annotations

import functools

import numpy as np

from . import kernels

SUB, LANE = kernels.SUB, kernels.LANE
GLANES = kernels.GLANES
ROWS = kernels.ROWS

LANE_BODY = 4096          # bytes per lane (multiple of 32)
TAIL_HALO = 64            # >= 32 (next-word access) + max term len - 1

# compile caps: beyond these the unrolled kernel body gets too large
# for a sane Mosaic compile; callers fall back to the q-gram filter
MAX_POSITIONS = 2400      # total pattern chars across all terms
MAX_EQ_SETS = 96          # distinct folded character classes
MAX_CUBES = 8             # OR-of-AND cover terms per class


def _cube_cover(byte_set: frozenset) -> tuple | None:
    """Cover a byte set by (mask, value) cubes: the cube contains all
    bytes b with (b & mask) == value.  Greedy largest-cube-first;
    returns None when the cover needs more than MAX_CUBES cubes."""
    remaining = set(byte_set)
    cubes = []
    while remaining:
        seed = min(remaining)
        mask = 0xFF
        # try to free each bit (largest win first is moot at 8 bits)
        for b in range(8):
            trial = mask & ~(1 << b)
            # cube (trial, seed & trial) must lie inside the SET (not
            # just inside `remaining`: overlap with prior cubes is fine)
            width = 1 << (8 - bin(trial).count("1"))
            val = seed & trial
            members = [v for v in range(256)
                       if (v & trial) == val]
            if len(members) == width and all(m in byte_set
                                             for m in members):
                mask = trial
        val = seed & mask
        cubes.append((mask, val))
        for v in range(256):
            if (v & mask) == val:
                remaining.discard(v)
        if len(cubes) > MAX_CUBES:
            return None
    return tuple(cubes)


def compile_chain(terms: list, tr: np.ndarray):
    """Static chain program for a term set under fold table tr.

    Returns (eq_specs, term_specs, term_ids, maxlen) or None when the
    set exceeds the kernel caps / a term is too long for the 31-byte
    lookahead.  term_specs[i] is the tuple of eq-plane indices for
    term_ids[i]'s byte positions."""
    tr = np.asarray(tr, dtype=np.uint8)
    # preimage classes of the fold map, computed once
    inv: dict = {}
    for b in range(256):
        inv.setdefault(int(tr[b]), []).append(b)
    eq_index: dict = {}
    eq_specs: list = []
    term_specs: list = []
    term_ids: list = []
    total = 0
    maxlen = 0
    for tid, t in enumerate(terms):
        if not t:
            continue
        if len(t) > 128:
            # the multi-word chain covers terms to 4 lookahead words
            # (LOOK <= rows/32); longer takes the word-packed/host path
            return None
        spec = []
        for ch in t:
            f = int(tr[ch])
            key = f
            if key not in eq_index:
                cubes = _cube_cover(frozenset(inv[f]))
                if cubes is None:
                    return None
                eq_index[key] = len(eq_specs)
                eq_specs.append(cubes)
            spec.append(eq_index[key])
        total += len(spec)
        maxlen = max(maxlen, len(spec))
        term_specs.append(tuple(spec))
        term_ids.append(tid)
    if (not term_specs or total > MAX_POSITIONS
            or len(eq_specs) > MAX_EQ_SETS):
        return None
    return tuple(eq_specs), tuple(term_specs), tuple(term_ids), maxlen


@functools.cache
def _chain_look(term_specs: tuple) -> int:
    """Lookahead words needed: terms longer than 32 positions chain
    across words.  Restricted to {1, 2, 4} so the lookahead BlockSpec
    index (j+1)*nw/LOOK stays integral (nw = rows/32 = 4)."""
    t_max = max((len(s) for s in term_specs), default=1) - 1
    lk = t_max // 32 + 1
    return 1 if lk <= 1 else (2 if lk <= 2 else 4)


def _get_chain_kernel(eq_specs: tuple, term_specs: tuple,
                      interpret: bool = False, rows: int = ROWS):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    nw = rows // 32
    look = _chain_look(term_specs)
    if look > nw:
        look = nw            # interpret's rows=32: single-word only

    def kernel(windows_ref, next_ref, out_ref):
        blk = windows_ref[...]           # u8[rows, 1, 8, 128]
        nxt = next_ref[...]              # u8[32*look, 1, 8, 128]

        # 1. byte bit-planes for this step's nw words + look lookahead
        planes = []
        for w in range(nw + look):
            acc = [jnp.zeros((SUB, LANE), dtype=jnp.uint32)
                   for _ in range(8)]
            for r in range(32):
                row = (blk[w * 32 + r, 0] if w < nw
                       else nxt[(w - nw) * 32 + r, 0]).astype(jnp.uint32)
                for b in range(8):
                    v = row & jnp.uint32(1 << b)
                    if r > b:
                        v = v << (r - b)
                    elif r < b:
                        v = v >> (b - r)
                    acc[b] = acc[b] | v
            planes.append(acc)

        # 2. equality planes per word (cube OR-of-ANDs over planes)
        eqs = []
        for w in range(nw + look):
            P8 = planes[w]
            N8 = [~p for p in P8]
            row_eqs = []
            for cubes in eq_specs:
                acc_e = None
                for (mask, val) in cubes:
                    t = None
                    for b in range(8):
                        if mask & (1 << b):
                            src = P8[b] if (val >> b) & 1 else N8[b]
                            t = src if t is None else (t & src)
                    if t is None:        # mask 0: every byte matches
                        t = jnp.full((SUB, LANE), 0xFFFFFFFF,
                                     dtype=jnp.uint32)
                    acc_e = t if acc_e is None else (acc_e | t)
                row_eqs.append(acc_e)
            eqs.append(row_eqs)

        # 3. shifted-AND chains, OR over terms (position t draws from
        # word w + t//32 shifted by t%32 -- multi-word terms chain
        # through the lookahead words)
        for w in range(nw):
            shifted: dict = {}           # (eq_idx, t) -> plane

            def sh(e, t, w=w):
                wo, tb = t // 32, t % 32
                if tb == 0:
                    return eqs[w + wo][e]
                key = (e, t)
                if key not in shifted:
                    shifted[key] = ((eqs[w + wo][e] >> tb)
                                    | (eqs[w + wo + 1][e] << (32 - tb)))
                return shifted[key]

            out = jnp.zeros((SUB, LANE), dtype=jnp.uint32)
            for spec in term_specs:
                m = sh(spec[0], 0)
                for t in range(1, len(spec)):
                    m = m & sh(spec[t], t)
                out = out | m
            out_ref[w, 0] = out

    @jax.jit
    def run(windows_t):
        # the array carries one trailing all-pad block (S_arr = S_data
        # + rows) so the final step's lookahead block stays in range;
        # the grid covers only the data blocks
        S_arr, G = windows_t.shape[:2]
        S_data = S_arr - rows
        grid = (G, S_data // rows)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rows, 1, SUB, LANE),
                             lambda i, j: (j, i, 0, 0)),
                # the next grid step's first `look` words: same array,
                # starting one row-block past this step's rows
                # ((j+1)*nw/look is integral: look in {1,2,4}, nw=4)
                pl.BlockSpec((32 * look, 1, SUB, LANE),
                             lambda i, j: ((j + 1) * nw // look,
                                           i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((nw, 1, SUB, LANE),
                                   lambda i, j: (j, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((S_data // 32, G, SUB, LANE),
                                           jnp.uint32),
            interpret=interpret,
        )(windows_t, windows_t)

    return run


@functools.cache
def _get_tail_packer():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit,
                       static_argnames=("H", "L", "T", "G", "S"))
    def pack(text_dev, H, L, T, G, S):
        """u8[N] -> u8[S, G, 8, 128] windows with TAIL halos, built on
        device.  Lane t covers bytes [t*L, t*L + L + H)."""
        N = text_dev.shape[0]
        total = T * L + L       # the tail view needs a full extra lane
        padded = jnp.pad(text_dev, (0, total - N))
        body = padded[:T * L].reshape(T, L)
        tail = padded[L:L + T * L].reshape(T, L)[:, :H]
        win = jnp.concatenate([body, tail], axis=1)    # (T, L+H)
        TP = G * GLANES
        win = jnp.pad(win, ((0, TP - T), (0, S - (L + H))))
        return win.reshape(G, SUB, LANE, S).transpose(3, 0, 1, 2)

    return pack


def chain_plane(text, prog, interpret: bool = False):
    """Run the chain kernel; returns (plane u32[T, S//32], T, L) in
    lane-packed form, device geometry included.  `text` may be a host
    ndarray or an already-uploaded jax array."""
    import jax
    import jax.numpy as jnp
    eq_specs, term_specs, _tids, _maxlen = prog
    look = _chain_look(term_specs)
    # interpret runs a 32-row block for compile time, but multi-word
    # lookahead needs nw >= look: use the full block then
    rows = ROWS if (not interpret or look > 1) else 32
    N = int(text.shape[0])
    L, H = LANE_BODY, 32 * (look + 1)
    T = max(1, -(-N // L))
    G = -(-T // GLANES)
    # one full trailing pad block so the (j+1) lookahead block of the
    # final grid step is in range (see _get_chain_kernel.run)
    S = (-(-(L + H) // rows) * rows) + rows  # S_arr = S_data + rows
    packf = _get_tail_packer()
    wt = packf(jnp.asarray(text), H, L, T, G, S)
    run = _get_chain_kernel(eq_specs, term_specs, interpret, rows)
    plane = np.asarray(jax.device_get(run(wt)))
    return kernels.unpack_planes(plane, T, L + H), T, L


def chain_match_starts(text, prog,
                       interpret: bool = False) -> np.ndarray:
    """Exact match-start positions (any term) in text coordinates."""
    packed, T, L = chain_plane(text, prog, interpret)
    N = int(text.shape[0])
    bw = L // 32
    body = np.ascontiguousarray(packed[:, :bw])
    bits = np.unpackbits(body.view(np.uint8).reshape(T, -1),
                         axis=1, bitorder="little")
    sel = bits.reshape(-1)[:N] != 0
    return np.flatnonzero(sel).astype(np.int64)
