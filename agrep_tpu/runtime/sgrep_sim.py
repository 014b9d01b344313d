"""Faithful emulation of sgrep.c's block-driver control-flow quirks.

The dense scan finds the same matches as the reference's Boyer-Moore /
partition engines (the filters never miss), but two *observable*
behaviours depend on the reference's control flow rather than the match
set:

1. bm() early-return: when the skip loop lands past textend and the
   emergency-stop copy of the pattern (sgrep.c:382) produces a bogus
   full match, bm returns before printing the INVERSE tail
   (sgrep.c:746-748, 987-1013).  Whether this happens depends on the
   skip-loop's landing alignment -- and, on multi-block files, on stale
   buffer contents between the trimmed block end and the stop bytes.

2. agrep() (the D>0 partition engine) counts an event again when a new
   candidate region re-scans the tail of an already-output record
   (sgrep.c:1187-1199: num_of_matched++ happens before the
   i <= lastend check).

Both are deterministic functions of the input bytes, emulated here over
a virtual copy of the reference's buffer layout.  This layer is only
consulted for the affected modes (INVERSE tails, D>0 counts); the hot
scan stays on the device.
"""

from __future__ import annotations

import numpy as np

BLOCKSIZE = 16384          # sgrep.c:56
MAXLINE = 1024
MAXPATT = 256
OFFSET = 2 * MAXLINE


def _tolower(b: int) -> int:
    return b + 32 if 65 <= b <= 90 else b


class VirtualSgrepBuffer:
    """Reproduces sgrep()'s buffer layout and block loop
    (sgrep.c:325-486): yields (block_index, start, end, first_time)
    with the evolving virtual buffer accessible as .buf."""

    def __init__(self, data: np.ndarray, pat: bytes, delimiter: bool,
                 d_pattern: bytes = b"\n"):
        self.data = data
        self.pat = pat
        self.m = len(pat)
        self.buf = np.zeros(2 * BLOCKSIZE + 2 * MAXLINE + MAXPATT + 64,
                            dtype=np.uint8)
        self.buf[OFFSET - 1] = 0x0A
        self.delimiter = delimiter
        self.d_pattern = d_pattern
        self.pos = 0

    def blocks(self):
        """Yields (start, end, gstart): scan span in buffer coordinates
        plus the global data offset of `start`."""
        start = OFFSET
        gstart = 0
        residue = 0
        first = True
        while True:
            num_read = min(2 * BLOCKSIZE, len(self.data) - self.pos)
            if num_read <= 0:
                break
            chunk = self.data[self.pos:self.pos + num_read]
            self.pos += num_read
            self.buf[OFFSET:OFFSET + num_read] = chunk
            buf_end = end = OFFSET + num_read - 1
            if first:
                # emergency stop copy of the pattern (sgrep.c:382)
                for i in range(1, self.m + 1):
                    self.buf[end + i] = self.pat[-1]
                first = False
            if not self.delimiter:
                if num_read == 2 * BLOCKSIZE:
                    while self.buf[end] != 0x0A and end > OFFSET:
                        end -= 1
                self.buf[start - 1] = 0x0A
            residue = buf_end - end + 1
            yield start, end, gstart
            gstart = gstart + (end - start) + 1
            start = OFFSET - residue
            if start < MAXLINE:
                start = MAXLINE
            self.buf[start:start + residue] = \
                self.buf[end:end + residue].copy()
            start += 1
            if len(self.data) - self.pos <= 0:
                break
        # post-loop residue processing (sgrep.c:478-486)
        if residue > 1:
            if not self.delimiter:
                self.buf[start - 1] = 0x0A
                self.buf[start + residue] = 0x0A
            end = start + residue - 2
            yield start, end, gstart


def build_bm_tables(pat: bytes, tr: np.ndarray):
    """prep_bm (sgrep.c:1486-1525): SHIFT table + shift_1."""
    m = len(pat)
    shift = np.full(256, m, dtype=np.int32)
    for i in range(m - 1, -1, -1):
        h = tr[pat[i]]
        if shift[h] >= m - 1:
            shift[h] = m - 1 - i
    shift_1 = m - 1
    lastc = tr[pat[m - 1]]
    for i in range(m - 2, -1, -1):
        if tr[pat[i]] == lastc:
            shift_1 = m - 1 - i
            break
    if shift_1 == 0:
        shift_1 = 1
    for c in range(ord("A"), ord("Z") + 1):
        shift[c] = shift[c + 32]
    return shift, shift_1


def bm_inverse_survives(buf: np.ndarray, start: int, end: int,
                        pat: bytes, tr: np.ndarray, shift_tab, shift_1,
                        resume_positions) -> bool:
    """Walk bm()'s skip loop over one block and report whether the
    function reaches its INVERSE tail print (True) or early-returns on a
    stop-region pseudo-match (False).

    resume_positions: sorted record-end buffer positions where matches
    jump the scan (text = curtextend after output)."""
    m = len(pat)
    patf = [int(tr[b]) for b in pat]
    text = start
    sh = 0
    textend = end
    ridx = 0
    guard = 0
    blen = len(buf)
    while text < textend:
        while sh:
            text += sh
            if text >= blen:
                return False  # ran off the virtual buffer: treat as early
            sh = int(shift_tab[buf[text]])
            guard += 1
            if guard > 10 * (end - start + m + MAXPATT + 64):
                return False
        # full backward compare at text
        j = 0
        while j < m and text - j >= 0 and int(tr[buf[text - j]]) == patf[m - 1 - j]:
            j += 1
        if j == m:
            if text > textend:
                return False        # sgrep.c:748 early return
            # a real match: jump to its record end
            while ridx < len(resume_positions) and \
                    resume_positions[ridx] <= text:
                ridx += 1
            if ridx - 1 >= 0 and ridx - 1 < len(resume_positions) and \
                    resume_positions[ridx - 1] > text:
                text = resume_positions[ridx - 1]
            else:
                # find next newline end (non-delim default)
                t = text + 1
                while t < textend and buf[t] != 0x0A:
                    t += 1
                text = t + 1
            sh = int(shift_tab[buf[text]]) if text < blen else 1
        else:
            sh = shift_1
    return True


def agrep_c_count(data: np.ndarray, events_g: np.ndarray, nl_g: np.ndarray,
                  pat: bytes, D: int, delimiter: bool = False,
                  d_pattern: bytes = b"\n") -> int:
    """Reproduce agrep()'s num_of_matched over a whole file, including
    the candidate-round overcount (sgrep.c:1187-1199).

    events_g: global data offsets of match-end events (0-based, i.e.
    C's i-1); nl_g: global offsets of newlines."""
    vb = VirtualSgrepBuffer(data, pat, delimiter, d_pattern)
    count = 0
    for (start, end, gstart) in vb.blocks():
        n = end - start  # textend - textbegin
        cands = agrep_candidates(vb.buf, start, end, pat, D)
        lo_g = gstart
        hi_g = gstart + n
        lastend = 0
        for (clo, chi) in cands:
            sel = events_g[(events_g - lo_g >= clo)
                           & (events_g - lo_g < chi)]
            # walk the round like the C scan: after an event the scan
            # index jumps (to the record end, or to lastend), so events
            # inside the jumped-over span are never encountered.
            i = clo
            for e in sel:
                idx = int(e) - lo_g + 1   # C's i after consuming the char
                if idx <= i:
                    continue              # jumped over: never seen
                count += 1
                if idx <= lastend:
                    i = lastend           # counted but not output
                else:
                    # s_output advances i to the record end (curtextend)
                    j = int(np.searchsorted(nl_g, int(e) + 1, side="left"))
                    rec_end_g = int(nl_g[j]) + 1 if j < len(nl_g) \
                        else len(data) + 1
                    i = rec_end_g - lo_g
                lastend = i
        _ = hi_g
    return count


def build_agrep_tables(pat: bytes, D: int):
    """prep() (sgrep.c:1053-1099): fragment SHIFT + 3-char MEMBER set."""
    M = len(pat)
    m = M // (D + 1)
    p = M - m * (D + 1)
    shift = np.full(256, m, dtype=np.int32)
    for i in range(M - 1, p - 1, -1):
        sh = (M - 1 - i) % m
        h = pat[i]
        if shift[h] > sh:
            shift[h] = sh
    shift_1 = m
    for i in range(D + 1):
        j = M - 1 - m * i
        for k in range(1, m):
            for q in range(D + 1):
                if j - k >= 0 and pat[j - k] == pat[M - 1 - m * q]:
                    if k < shift_1:
                        shift_1 = k
    if shift_1 == 0:
        shift_1 = 1
    member = np.zeros(8192, dtype=np.uint8)
    b_size = 3 if m >= 3 else m
    for i in range(D + 1):
        j = M - 1 - m * i
        h = 0
        for k in range(b_size):
            if j - k >= 0:
                h = ((h << 2) + pat[j - k])
        member[h % 8192] = 1
    return shift, shift_1, member, m, b_size


def agrep_candidates(buf: np.ndarray, start: int, end: int,
                     pat: bytes, D: int):
    """Walk agrep()'s filter loop (sgrep.c:1130-1154) over one block and
    return the candidate list [(lo, hi)] in buffer coordinates relative
    to textbegin (= start), exactly as Candidate[][] is built."""
    shift_tab, d1, member, m, b_size = build_agrep_tables(pat, D)
    M = len(pat)
    r1 = m if m < 3 else 3
    text = start
    textend = end
    cands = [(0, 0)]
    sh = m - 1
    blen = len(buf)
    while text < textend:
        text += sh
        if text >= blen:
            break
        sh = int(shift_tab[buf[text]])
        while sh:
            text += sh
            if text >= blen:
                break
            sh = int(shift_tab[buf[text]])
            text += sh
            if text >= blen:
                break
            sh = int(shift_tab[buf[text]])
        if text >= blen:
            break
        h = int(buf[text])
        j = 1
        while j < r1:
            h = (h << 2) + int(buf[text - j])
            j += 1
        if member[h % 8192]:
            i = text - start
            if (i - M - D - 10) > cands[-1][1]:
                cands.append((i - M - D - 2, i + M + D))
            else:
                cands[-1] = (cands[-1][0], i + M + D)
        sh = d1
    n = textend - start
    out = []
    for (lo, hi) in cands[1:] if len(cands) > 1 else []:
        out.append((max(lo, 0), min(hi, n)))
    return out
