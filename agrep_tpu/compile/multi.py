"""Multi-pattern device machines: pack many exact patterns into 32-bit
shift-or words.

The reference's mgrep uses a hashed Boyer-Moore skip table
(newmgrep.c SHIFT1/HASH); on TPU we instead pack terms into machine
words -- term positions separated by always-on separator bits (the same
mechanism maskgen uses for AND patterns) -- and run the dense windowed
scan once per word-group.  A group's event word identifies which term's
last character matched at each byte.  Terms longer than 31 positions
fall back to the host matcher.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

WORD = 32


@dataclass
class TermGroup:
    mask: np.ndarray          # uint32[256], fold pre-composed
    consts: dict              # machine constants for ops.scan 'bitap'
    term_ids: list            # global term index per packed term
    term_bits: list           # event bit (int) per packed term
    term_lens: list           # length per packed term


def pack_terms(terms: list[bytes], tr: np.ndarray):
    """Greedy packing of terms into <=32-position machine words.

    Returns (groups, leftover_ids): leftover terms are too long for a
    word and must be matched on the host."""
    groups: list[TermGroup] = []
    leftover: list[int] = []
    batch: list[int] = []
    used = 0
    for i, t in enumerate(terms):
        if not t:
            continue
        need = len(t) + (1 if batch else 0)
        if len(t) > WORD - 1:
            leftover.append(i)
            continue
        # cap at 31 positions: the first term needs at least one
        # always-on prefix bit to feed its first position
        if used + need > WORD - 1:
            groups.append(_build_group(batch, terms, tr))
            batch, used = [], 0
            need = len(t)
        batch.append(i)
        used += need
    if batch:
        groups.append(_build_group(batch, terms, tr))
    return groups, leftover


def _build_group(ids: list[int], terms: list[bytes],
                 tr: np.ndarray) -> TermGroup:
    # layout: [t0 chars] SEP [t1 chars] SEP ... (1-based positions);
    # separators and the prefix padding are always-on (Init0), so every
    # term restarts at any byte.  Bit for position k of M: 1 << (M - k).
    positions: list = []   # (char byte or None for separator)
    term_bits = []
    term_lens = []
    for j, ti in enumerate(ids):
        if j > 0:
            positions.append(None)
        for b in terms[ti]:
            positions.append(b)
        term_bits.append(None)  # fill later (needs M)
        term_lens.append(len(terms[ti]))
    M = len(positions)
    bit = lambda k: 1 << (M - k)  # noqa: E731

    init0 = 0
    for k in range(1, WORD - M + 1):
        init0 |= (1 << (WORD - k)) & 0xFFFFFFFF
    endpos = 0
    sep_bits = 0
    term_bits = []
    k = 1
    for j, ti in enumerate(ids):
        if j > 0:
            sep_bits |= bit(k)
            k += 1
        k += len(terms[ti]) - 1
        term_bits.append(bit(k))
        endpos |= bit(k)
        k += 1
    init0 = (init0 | sep_bits) & 0xFFFFFFFF

    mask = np.zeros(256, dtype=np.uint32)
    folded_pos = [None if p is None else int(tr[p]) for p in positions]
    for c in range(256):
        fc = int(tr[c])
        m = 0
        for k2, fp in enumerate(folded_pos, start=1):
            if fp is not None and fp == fc:
                m |= bit(k2)
        mask[c] = m

    consts = dict(
        init0=init0,
        init1_ns=init0,
        noerr=0,
        d_endpos=0,
        endpos=endpos,
        d_mask=0xFFFFFFFF,
        m=M,
    )
    return TermGroup(mask=mask, consts=consts, term_ids=list(ids),
                     term_bits=term_bits, term_lens=term_lens)
