"""Multi-pattern / boolean record engine (reference newmgrep.c).

Semantics reproduced from monkey1()/m_short() (newmgrep.c:803-1506):
exact multi-string matching (tr-folded under -i), record extraction
around the *anchor* position (match start + shortest-pattern-length -
1), one output per record for flat OR, full-record terminal accumulation
for flat AND and complex boolean trees, MULTI_OUTPUT per-occurrence
mode, and the -P pattern-index decoration.

The occurrence finding itself is dense and vectorized (the reference's
hashed Boyer-Moore skip loop is a scalar-CPU idiom; on TPU/SIMD dense
scanning wins -- SURVEY.md section 7).  The device fast path scans all
terms in packed bit-parallel words; the host fallback uses vectorized
numpy compares.
"""

from __future__ import annotations

import sys

import numpy as np

from ..compile import boolean
from ..options import AgrepError, PROGNAME
from .output import Sink

MAXLINE = 1024


def _fold_tr(nocase: bool) -> np.ndarray:
    tr = np.arange(256, dtype=np.uint8)
    if nocase:
        for i in range(ord("A"), ord("Z") + 1):
            tr[i] = i + 32
    return tr


def _prep_terms(raw_terms: list[str], opts) -> list[bytes]:
    """prepf pattern normalization (newmgrep.c:323-345)."""
    out = []
    for t in raw_terms:
        b = bytearray(t.encode("latin-1"))
        if b and b[0:1] in (b"^", b"$"):
            b[0] = 0x0A
        if len(b) > 1 and b[-1:] in (b"^", b"$") and b[-2:-1] != b"\\":
            b[-1] = 0x0A
        # strip escapes
        res = bytearray()
        i = 0
        while i < len(b):
            if b[i] == 0x5C:  # backslash
                i += 1
                if i < len(b):
                    res.append(b[i])
                    i += 1
            else:
                res.append(b[i])
                i += 1
        if opts.wholeline:
            res = bytearray(b"\n") + res + bytearray(b"\n")
        out.append(bytes(res))
    return out


def _find_occurrences(stream: np.ndarray, term: bytes,
                      tr: np.ndarray) -> np.ndarray:
    """Start positions of folded-exact occurrences of term."""
    n, L = len(stream), len(term)
    if L == 0 or n < L:
        return np.zeros(0, dtype=np.int64)
    from .. import native
    if native.get_lib() is not None:
        out = native.find_occurrences(stream, term, tr)
        if out is not None:
            return out
    folded = tr[stream]
    tf = tr[np.frombuffer(term, dtype=np.uint8)]
    hit = folded[:n - L + 1] == tf[0]
    for k in range(1, L):
        hit &= folded[k:n - L + 1 + k] == tf[k]
    return np.flatnonzero(hit)


class MgrepEngine:
    def __init__(self, q):
        self.q = q
        o = q.opts
        self.terms = _prep_terms(q.terminals, o)
        if not any(self.terms):
            raise AgrepError("%s: the pattern file is empty" % PROGNAME)
        self.p_size = min(len(t) for t in self.terms if t)
        self.tr = _fold_tr(o.nocase is not None)
        self.total_line = 0

    def _all_occurrences(self, stream: np.ndarray) -> dict:
        """Start positions per term.  Large scans use the packed
        bit-parallel machine (compile/multi.py): all terms of a word
        group are matched in ONE dense device pass; the reference's
        hashed skip loop (newmgrep.c SHIFT1) has no TPU analog worth
        keeping.  Small scans / oversized terms use the native host
        matcher."""
        occ = {}
        use_device = len(stream) >= (1 << 16)
        groups, leftover = ([], None)
        if use_device:
            from ..compile.multi import pack_terms
            from ..ops import scan as scan_ops
            groups, leftover_ids = pack_terms(self.terms, self.tr)
            for g in groups:
                ev = scan_ops.scan_events(stream, g.mask, g.consts, 0,
                                          "bitap", None)
                pos = np.flatnonzero(ev)
                w = ev[pos]
                for tid, bit, ln in zip(g.term_ids, g.term_bits,
                                        g.term_lens):
                    sel = pos[(w & np.uint32(bit)) != 0]
                    occ[tid] = (sel - ln + 1).astype(np.int64)
            rest = leftover_ids
        else:
            rest = [i for i, t in enumerate(self.terms) if t]
        for i in rest:
            occ[i] = _find_occurrences(stream, self.terms[i], self.tr)
        for i, t in enumerate(self.terms):
            if i not in occ:
                occ[i] = np.zeros(0, dtype=np.int64)
        return occ

    def search_stream(self, data: np.ndarray, sink: Sink, D: int,
                      memory_mode: bool = False) -> None:
        q, o = self.q, self.q.opts
        dl = len(q.delim)
        if memory_mode:
            stream = data
            base = 0
        else:
            if q.delimiter_opt:
                # mgrep() overwrites the first D_length data bytes with
                # the delimiter on the first block (newmgrep.c:511-512
                # runs with residue==0) and appends one at EOF
                # (newmgrep.c:574) -- observable, pinned behaviour.
                stream = np.concatenate([
                    data, np.frombuffer(q.delim, dtype=np.uint8)])
                stream[:dl] = np.frombuffer(q.delim, dtype=np.uint8)
                base = 0
            else:
                stream = np.concatenate([
                    np.frombuffer(b"\n", dtype=np.uint8), data,
                    np.frombuffer(b"\n", dtype=np.uint8)])
                base = 1
        N = len(stream)
        if o.invert and o.count:
            self.total_line += int(np.count_nonzero(data == 0x0A))

        m1 = self.p_size - 1
        # gather (anchor, pat_index, start, length) for all terms
        occ = self._all_occurrences(stream)
        anchors = []
        for idx, t in enumerate(self.terms):
            if not t:
                continue
            starts = occ[idx]
            if o.wordbound:
                keep = []
                for s in starts:
                    s = int(s)
                    after = int(stream[s + len(t)]) if s + len(t) < N else 0
                    before = int(stream[s - 1]) if s - 1 >= 0 else 0
                    if not _isalnum(after) and not _isalnum(before):
                        keep.append(s)
                starts = np.asarray(keep, dtype=np.int64)
            for s in starts:
                anchors.append((int(s) + m1, idx, int(s), len(t)))
        anchors.sort()

        nl = np.flatnonzero(stream == 0x0A)
        delim_ends = _find_delims_arr(stream, q.delim) \
            if q.delimiter_opt else None

        n_terms = len(self.terms)
        # m_short's `if (MATCHED) text--` (newmgrep.c:1471) decrements
        # the scan pointer without adjusting CurrentByteOffset, so -b/-q
        # offsets drift +1 per previously output record when the
        # shortest pattern is a single char
        short_drift = [0]
        matched_terms = np.zeros(n_terms, dtype=bool)
        in_record = False
        cur_begin = cur_end = 0
        lastout = base
        resume_at = -1

        def record_span(anchor: int):
            return _mgrep_record_span(stream, nl, delim_ends, anchor,
                                      q, base)

        def do_output(pat_index: int, anchor: int, begin: int, end: int,
                      change_text: bool) -> bool:
            """DO_OUTPUT macro (newmgrep.c:911-971). Returns stop flag."""
            sink.num_matched += 1
            if o.filename_only or o.silent:
                if o.filename_only:
                    sink.write_str("%s\n" % sink.current_filename)
                return True
            if not o.count:
                printed = sink.emit_fname_prefix()
                if o.printpattern:
                    sink.write_str("%d- " % (pat_index + 1))
                    printed = True
                cbo = anchor - base - m1 + 1 + short_drift[0]
                if o.bytecount:
                    sink.write_str("%d= " % cbo)
                    printed = True
                if o.printoffset:
                    sink.write_str("@%d{%d} " % (cbo - (anchor - begin),
                                                 end - begin))
                    printed = True
                if not o.invert:
                    if o.printrecord:
                        sink.write(bytes(bytearray(stream[begin:end])))
                    elif printed:
                        sink.write_str("\n")
                else:
                    nonlocal lastout
                    _write_complement(sink, stream, lastout, begin,
                                      block_marks, base)
                    lastout = end
            if (o.limit_output > 0 and sink.num_matched >= o.limit_output) \
                or (o.limit_per_file > 0 and
                    sink.num_matched - sink.prev_num_matched
                    >= o.limit_per_file):
                return True
            return False

        is_and = q.bool_op == "and" and q.bool_tree is None
        is_complex = q.bool_tree is not None

        # INVERSE block quirk: mgrep's residue copy has no start++
        # (newmgrep.c:556-560 vs sgrep.c:469-471), so every block's
        # trailing newline is also the next block's first complement
        # byte and prints twice.  Compute the virtual block boundaries.
        block_marks = []
        if (o.invert and not o.count and not memory_mode
                and not q.delimiter_opt and len(data) > 2 * 16384):
            block_marks = _mgrep_block_ends(data)

        stop = False
        for (anchor, idx, s, tl) in anchors:
            if stop:
                break
            if anchor < resume_at:
                continue
            if in_record and anchor >= cur_end - 1 + 1:
                # crossed the record boundary: flush complex verdict
                if is_complex:
                    hits = matched_terms[None, :]
                    if boolean.eval_tree_vec(q.bool_tree, "or", hits)[0]:
                        stop = do_output(0, cur_anchor, cur_begin, cur_end,
                                         False)
                in_record = False
                matched_terms[:] = False
            if not in_record:
                cur_begin, cur_end = record_span(anchor)
                cur_anchor = anchor
                in_record = True
            matched_terms[idx] = True
            if is_complex:
                continue
            if is_and and not matched_terms.all():
                continue
            stop = do_output(idx, anchor, cur_begin, cur_end, True)
            if o.multi_output:
                resume_at = s + tl - 1
                continue
            if self.p_size == 1:
                short_drift[0] += 1
            resume_at = cur_end
            in_record = False
            matched_terms[:] = False

        if not stop and in_record and is_complex:
            hits = matched_terms[None, :]
            if boolean.eval_tree_vec(q.bool_tree, "or", hits)[0]:
                do_output(0, cur_anchor, cur_begin, cur_end, False)

        if o.invert and not o.count and not stop:
            # monkey1's tail stops at the last data byte (textend),
            # excluding the driver's appended delimiter
            data_end = base + len(data)
            if lastout <= data_end - 1:
                _write_complement(sink, stream, lastout, data_end,
                                  block_marks, base)


def _isalnum(b: int) -> bool:
    return (48 <= b <= 57) or (65 <= b <= 90) or (97 <= b <= 122)


def _find_delims_arr(stream: np.ndarray, delim: bytes) -> np.ndarray:
    if len(delim) == 1:
        return np.flatnonzero(stream == delim[0])
    if len(stream) < len(delim):
        return np.zeros(0, dtype=np.int64)
    hit = np.ones(len(stream) - len(delim) + 1, dtype=bool)
    for k, b in enumerate(delim):
        hit &= stream[k:len(stream) - len(delim) + 1 + k] == b
    return np.flatnonzero(hit) + len(delim) - 1


def _mgrep_record_span(stream, nl, delim_ends, anchor, q, base):
    """Record boundaries around an anchor (newmgrep.c:878-887)."""
    N = len(stream)
    if not q.delimiter_opt:
        i = int(np.searchsorted(nl, anchor - 1, side="right")) - 1
        begin = int(nl[i]) + 1 if i >= 0 else 0
        j = int(np.searchsorted(nl, anchor + 1, side="left"))
        end = int(nl[j]) + 1 if j < len(nl) else N
        return begin, end
    dl = len(q.delim)
    i = int(np.searchsorted(delim_ends, anchor, side="left")) - 1
    if i >= 0:
        dstart = int(delim_ends[i]) - dl + 1
        begin = dstart + dl if q.outtail else dstart
    else:
        begin = 0
    j = int(np.searchsorted(delim_ends, anchor + dl, side="left"))
    if j < len(delim_ends):
        dstart = int(delim_ends[j]) - dl + 1
        end = dstart + dl if q.outtail else dstart
    else:
        end = N
    return begin, end


def _mgrep_block_ends(data: np.ndarray) -> list:
    """Data offsets of each block's trailing newline (mgrep's 32KB
    block loop, newmgrep.c:480-567).  The byte at each mark prints
    twice under INVERSE (the residue copy lacks a start++)."""
    BLK = 2 * 16384
    marks = []
    pos = 0
    end_g = -1
    residue = 0
    N = len(data)
    while pos < N:
        num_read = min(BLK, N - pos)
        span_start = end_g if end_g >= 0 else 0
        span_end = pos + num_read          # exclusive, data coords
        seg = data[span_start:span_end]
        nl = np.flatnonzero(seg == 0x0A)
        if len(nl):
            e = span_start + int(nl[-1])
        else:
            e = span_end - 1
        pos += num_read
        residue = span_end - e
        if pos < N:
            marks.append(e)
        end_g = e
    return marks


def _write_complement(sink, stream, a: int, b: int, marks: list,
                      base: int) -> None:
    """Write stream[a:b], duplicating the byte at each block mark
    (data coords + base) contained in the span."""
    if b <= a:
        return
    if not marks:
        sink.write(bytes(bytearray(stream[a:b])))
        return
    cur = a
    for m in marks:
        p = m + base
        if cur <= p < b:
            sink.write(bytes(bytearray(stream[cur:p + 1])))
            sink.write(bytes(bytearray(stream[p:p + 1])))
            cur = p + 1
    sink.write(bytes(bytearray(stream[cur:b])))
