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
        trim_end = None      # block-trim boundary (stream coords)
        if memory_mode:
            stream = data
            base = 0
        else:
            delim_marks = []
            if q.delimiter_opt:
                # mgrep()'s -d block loop (newmgrep.c:480-567):
                # `memcpy(text+start+residue, D_pattern)` overwrites
                # the first D_length bytes of EVERY block (residue==0
                # makes that the file head on block one); each block is
                # cut back to the last complete delimiter found in its
                # RAW data (the trim search at :503 runs before the
                # overwrite at :512), with the trim byte duplicated
                # into the next scan region (the residue copy at :560
                # has no start++); the EOF residue is rescanned with a
                # delimiter appended (:573-575) only when >1 byte, so
                # anchors past the final trim are seen only by that
                # rescan.
                ow, delim_marks, trim_end, live_append = \
                    _mgrep_blocks_delim(data, q.delim, q.outtail)
                head = data.copy()
                dpat = np.frombuffer(q.delim, dtype=np.uint8)
                for off in ow:
                    k = min(dl, len(data) - off)
                    head[off:off + k] = dpat[:k]
                if live_append:
                    stream = np.concatenate([head, dpat])
                else:
                    stream = head
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
        # gather (anchor, pat_index, start, length) for all terms.
        # With -d the scan buffer is preceded by a memcpy'd delimiter
        # (newmgrep.c:511): a term may match with its head inside those
        # bytes, so search over delim+stream and shift starts by -dl.
        if q.delimiter_opt and not memory_mode:
            ext = np.concatenate(
                [np.frombuffer(q.delim, dtype=np.uint8), stream])
            occ = self._all_occurrences(ext)
            occ = {k: v - dl for k, v in occ.items()}
        else:
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
                    if s - 1 >= 0:
                        before = int(stream[s - 1])
                    elif q.delimiter_opt and dl + (s - 1) >= 0:
                        before = q.delim[dl + (s - 1)]
                    else:
                        before = 0
                    if not _isalnum(after) and not _isalnum(before):
                        keep.append(s)
                starts = np.asarray(keep, dtype=np.int64)
            for s in starts:
                s = int(s)
                anchor = s + m1
                if anchor < m1 - 1 or s < -dl:
                    continue       # before the first scanned position
                if q.delimiter_opt and not memory_mode and delim_marks:
                    # each scan region's buffer holds data[b_prev..]
                    # preceded by the memcpy'd delimiter (the residue
                    # copy truncates backward context): a hit whose
                    # start precedes its region's lower boundary
                    # survives only if the missing prefix coincides
                    # with the delimiter tail
                    import bisect
                    ki = bisect.bisect_left(delim_marks, anchor)
                    lb = delim_marks[ki - 1] if ki > 0 else None
                    if lb is not None and s < lb:
                        k = lb - s
                        if k > dl or t[:k] != q.delim[dl - k:]:
                            continue
                anchors.append((anchor, idx, s, len(t)))
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

        def record_span(anchor: int, s: int = None, tl: int = 0):
            lo = hi = None
            if q.delimiter_opt and not memory_mode and delim_marks:
                import bisect
                ki = bisect.bisect_left(delim_marks, anchor)
                lo = delim_marks[ki - 1] if ki > 0 else None
                hi = delim_marks[ki] if ki < len(delim_marks) else None
            return _mgrep_record_span(stream, nl, delim_ends, anchor,
                                      q, base, len(data), lo, hi)

        def do_output(pat_index: int, anchor: int, begin: int, end: int,
                      change_text: bool, cbo_override=None) -> bool:
            """DO_OUTPUT macro (newmgrep.c:911-971). Returns stop flag."""
            sink.num_matched += 1
            if o.filename_only or o.silent:
                if o.filename_only:
                    sink.write_str("%s\n" % sink.current_filename)
                return True
            if not o.count:
                if o.invert:
                    # pending region tails are raw fwrites that precede
                    # this hit's decorations (monkey1 prints each
                    # block's tail before the next block runs)
                    inv_advance(_bisect.bisect_left(bounds, anchor))
                printed = sink.emit_fname_prefix()
                if o.printpattern:
                    sink.write_str("%d- " % (pat_index + 1))
                    printed = True
                # each block boundary's duplicate byte advances the
                # per-block CurrentByteOffset accumulation by one
                # (newmgrep.c:556-560 copies text[end] twice)
                if cbo_override is not None:
                    cbo = cbo_override
                else:
                    drift = 0
                    for mk in cbo_marks:
                        if mk + base < anchor - m1 + 1:
                            drift += 1
                    cbo = anchor - base - m1 + 1 + short_drift[0] + drift
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
                    if lastout < begin:
                        sink.write(bytes(bytearray(stream[lastout:begin])))
                    lastout = end
            if (o.limit_output > 0 and sink.num_matched >= o.limit_output) \
                or (o.limit_per_file > 0 and
                    sink.num_matched - sink.prev_num_matched
                    >= o.limit_per_file):
                return True
            return False

        is_and = q.bool_op == "and" and q.bool_tree is None
        is_complex = q.bool_tree is not None

        # Per-block scan regions (newmgrep.c:480-567): every block's
        # INVERSE complement pointer starts at its own region start --
        # the previous block's trim byte (the residue copy at :560 has
        # no start++, so that byte belongs to both regions and prints
        # twice when no record covers it).
        cbo_marks = []
        if not memory_mode:
            if not q.delimiter_opt:
                cbo_marks = _mgrep_block_ends(data)
            else:
                cbo_marks = list(delim_marks)
        bounds = [m + base for m in cbo_marks]       # inclusive ends
        # final region's exclusive end (the INVERSE tail bound)
        final_end = base + len(data)
        if not memory_mode and not q.delimiter_opt and len(data) \
                and data[-1] != 0x0A:
            final_end += 1          # appended newline (newmgrep.c:570)
        elif not memory_mode and q.delimiter_opt \
                and trim_end is not None:
            final_end += 1          # one appended delim byte (:576)

        import bisect as _bisect
        r_cur = 0

        def _region_start(i):
            return base if i == 0 else bounds[i - 1]

        def _region_end_excl(i):
            return bounds[i] + 1 if i < len(bounds) else final_end

        def inv_advance(region):
            nonlocal r_cur, lastout
            while r_cur < region:
                e = _region_end_excl(r_cur)
                if lastout < e:
                    sink.write(bytes(bytearray(stream[lastout:e])))
                r_cur += 1
                lastout = _region_start(r_cur)

        if q.delimiter_opt and not memory_mode:
            # Registration ORDER matters for booleans with -d: a hit
            # can land exactly on the record boundary before the
            # scan's crossing reset fires (newmgrep.c:894 vs :980,
            # :1001), terminals containing the delimiter anchor at
            # curtextend, and satisfied outputs jump the scan to the
            # record end.  Replay monkey1's actual skip walk.
            p_size = self.p_size
            m1w = p_size - 1
            short_mode = p_size == 1   # m_short (newmgrep.c:1300-1506)
            multilen = sum(len(t) + 1 for t in self.terms if t)
            LONG = 1 if (multilen > 400 and p_size > 2) else 0
            HB = 5
            tr1 = (self.tr & 31).astype(np.int32)
            SHIFT1 = np.full(32768, p_size - 1 - LONG, dtype=np.int32)
            for t in self.terms:
                if not t:
                    continue
                tbuf = np.frombuffer(t, dtype=np.uint8)
                for jj in range(p_size - 1, LONG, -1):
                    h = int(tr1[tbuf[jj]])
                    h = (h << HB) + int(tr1[tbuf[jj - 1]])
                    if LONG:
                        h = (h << HB) + int(tr1[tbuf[jj - 2]])
                    if SHIFT1[h] >= p_size - 1 - jj:
                        SHIFT1[h] = p_size - 1 - jj
            # bucket order is descending pattern index (f_prep1 fills
            # HASH slots top-down); one entry processed per candidate
            # (the hit path goto-exits the bucket loop)
            occ_first = {}
            for (a_, i_, s_, l_) in anchors:
                cur = occ_first.get(a_)
                if cur is None or i_ > cur[0]:
                    occ_first[a_] = (i_, s_, l_)
            nz_terms = np.asarray([bool(t) for t in self.terms])
            # hash context: the bytes before each scan start are the
            # memcpy'd delimiter (newmgrep.c:511)
            hsrc = np.concatenate([
                tr1[np.frombuffer(q.delim, dtype=np.uint8)],
                tr1[stream]]).astype(np.int64)
            de_arr = delim_ends

            cbo_base = [0]

            def walk_region(r):
                nonlocal lastout
                if o.invert and not o.count:
                    # each block call resets its complement pointer to
                    # its own region start BEFORE scanning (m_short
                    # :1313, monkey1 :829) -- switch regions eagerly so
                    # lastout never rewinds over consumed records
                    inv_advance(r)
                tb_region = _region_start(r)
                te = _region_end_excl(r) - 1      # inclusive textend
                text = tb_region if short_mode else tb_region + m1w - 1
                cbo = cbo_base[0]   # CurrentByteOffset (m_short carries
                                    # it exactly; the text-- quirk makes
                                    # it drift ahead of the position)
                DOW = False
                amatched = np.zeros(len(self.terms), dtype=bool)
                MATCHED = False
                curb = cure = cur_anchor = 0
                tb_jump = tb_region

                def flush_cross():
                    nonlocal DOW
                    if DOW and text >= cure - 1:
                        DOW = False
                        if is_complex and boolean.eval_tree_vec(
                                q.bool_tree, "or", amatched[None, :])[0]:
                            if do_output(0, cur_anchor, curb, cure,
                                         False,
                                         cbo if short_mode else None):
                                return True
                        amatched[:] = False
                    return False

                while text <= te:
                    if short_mode:
                        cbo += 1     # `while (++text...) CBO++`
                        sh = 0       # m_short visits every byte
                    else:
                        h = int(hsrc[text + dl])
                        h = (h << HB) + int(hsrc[text + dl - 1])
                        if LONG:
                            h = (h << HB) + int(hsrc[text + dl - 2])
                        sh = int(SHIFT1[h])
                    if sh == 0:
                        hit = occ_first.get(text)
                        if hit is not None:
                            idx, s_, tl_ = hit
                            if short_mode and text >= te:
                                # m_short aborts the whole block scan
                                # on a hit at textend (newmgrep.c:1345)
                                # BEFORE any registration or output --
                                # its return 0 also skips the block's
                                # INVERSE tail print
                                if o.invert and not o.count:
                                    nonlocal r_cur
                                    inv_advance(r)
                                    r_cur = r + 1
                                    lastout = (_region_start(r + 1)
                                               if r + 1 <= len(bounds)
                                               else final_end)
                                return False
                            if not DOW:
                                # record extraction bounded by the
                                # advancing textbegin (monkey1:885-886)
                                i2 = int(np.searchsorted(
                                    de_arr, text - 1, "right")) - 1
                                curb = tb_jump
                                while i2 >= 0:
                                    de = int(de_arr[i2])
                                    ds = de - dl + 1
                                    if ds >= tb_jump and ds + dl <= text:
                                        curb = ds + dl if q.outtail \
                                            else ds
                                        break
                                    if de < tb_jump:
                                        break
                                    i2 -= 1
                                j2 = int(np.searchsorted(
                                    de_arr, text + dl, "left"))
                                cure = te + 1
                                while j2 < len(de_arr):
                                    de = int(de_arr[j2])
                                    ds = de - dl + 1
                                    if ds >= text + 1 and ds <= te - dl:
                                        cure = ds + dl if q.outtail \
                                            else ds
                                        break
                                    if ds > te - dl:
                                        break
                                    j2 += 1
                                if (not q.outtail) or o.invert:
                                    tb_jump = cure
                                else:
                                    tb_jump = cure - dl
                                DOW = True
                                cur_anchor = text
                            amatched[idx] = True
                            if is_complex:
                                cbo += tl_ - 1
                                text = text + tl_ - 1
                                MATCHED = False
                            elif (not is_and
                                  or bool(amatched[nz_terms].all())):
                                MATCHED = True
                                if do_output(idx, text, curb, cure, True,
                                             cbo if short_mode else None):
                                    return True
                                if o.multi_output:
                                    cbo += (text + tl_ - 1) - text
                                    text = text + tl_ - 1
                                    MATCHED = False
                                else:
                                    cbo += tb_jump - text
                                    text = tb_jump
                        if not MATCHED:
                            sh = 1
                        elif short_mode:
                            # `if (MATCHED) text--` cancels the loop's
                            # ++ without touching CurrentByteOffset:
                            # cbo drifts ahead of the position
                            MATCHED = False
                            sh = 0
                        else:
                            MATCHED = False
                            sh = m1w - 1 if m1w - 1 > 0 else 1
                    if flush_cross():
                        return True
                    text += sh
                return flush_cross()

            for r in range(len(bounds) + 1):
                stop_all = walk_region(r)
                cbo_base[0] += (_region_end_excl(r) - 1
                                - _region_start(r) + 1)
                if stop_all:
                    break
            else:
                if o.invert and not o.count:
                    inv_advance(len(bounds))
                    if lastout < final_end:
                        sink.write(bytes(bytearray(
                            stream[lastout:final_end])))
            return

        stop = False
        for (anchor, idx, s, tl) in anchors:
            if stop:
                break
            if anchor < resume_at:
                continue
            if in_record and anchor >= cur_end:
                # crossed the record boundary: flush complex verdict
                if is_complex:
                    hits = matched_terms[None, :]
                    if boolean.eval_tree_vec(q.bool_tree, "or", hits)[0]:
                        stop = do_output(0, cur_anchor, cur_begin, cur_end,
                                         False)
                in_record = False
                matched_terms[:] = False
            if not in_record:
                cur_begin, cur_end = record_span(anchor, s, tl)
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
            inv_advance(len(bounds))
            if lastout < final_end:
                sink.write(bytes(bytearray(stream[lastout:final_end])))


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


def _mgrep_record_span(stream, nl, delim_ends, anchor, q, base,
                       n_data=None, lo_b=None, hi_b=None):
    """Record boundaries around an anchor (newmgrep.c:878-887).

    With -d, extraction is bounded by the scan region the hit fell
    into (monkey1 passes the region's textbegin/textend to
    backward_/forward_delimiter): each region starts at the previous
    block's trim byte (lo_b) and ends at its own trim (hi_b); the
    final region spans to EOF plus the appended delimiter (which the
    forward search can never *find* -- it sits at textend -- so tail
    records print through it)."""
    N = len(stream)
    if not q.delimiter_opt:
        i = int(np.searchsorted(nl, anchor - 1, side="right")) - 1
        begin = int(nl[i]) + 1 if i >= 0 else 0
        j = int(np.searchsorted(nl, anchor + 1, side="left"))
        end = int(nl[j]) + 1 if j < len(nl) else N
        return begin, end
    dl = len(q.delim)
    lo = 0
    hi_data = (n_data if n_data is not None else N) - 1
    # textend sits ON the first appended-delimiter byte
    # (newmgrep.c:576), so a tail record prints exactly one of them
    end_nf = hi_data + 1 + (1 if N > hi_data + 1 else 0)
    if hi_b is not None:                 # bounded (non-final) region
        hi_data = hi_b
        end_nf = hi_b + 1
    if lo_b is not None:
        lo = lo_b
    i = int(np.searchsorted(delim_ends, anchor, side="left")) - 1
    begin = lo
    while i >= 0:
        dstart = int(delim_ends[i]) - dl + 1
        if dstart >= lo:
            begin = dstart + dl if q.outtail else dstart
            break
        i -= 1
    j = int(np.searchsorted(delim_ends, anchor + dl, side="left"))
    end = end_nf
    while j < len(delim_ends):
        dend = int(delim_ends[j])
        dstart = dend - dl + 1
        if dend <= hi_data:
            end = dstart + dl if q.outtail else dstart
            break
        j += 1
    return begin, end


def _mgrep_block_ends(data: np.ndarray) -> list:
    """Data offsets of each block's trailing newline (mgrep's 32KB
    block loop, newmgrep.c:480-567).  The byte at each mark prints
    twice under INVERSE (the residue copy lacks a start++)."""
    BLK = 2 * 16384
    marks = []
    pos = 0
    end_g = -1
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
            # no newline in the block: `end` walks back to the scan
            # start (newmgrep.c:498), i.e. the previous block's mark
            e = span_start
        pos += num_read
        residue = span_end - e             # includes the duplicate byte
        if pos < N or residue > 1:
            # intermediate block, or the EOF residue rescan
            # (newmgrep.c:577 runs only when residue > 1)
            marks.append(e)
        end_g = e
    return marks


def _mgrep_blocks_delim(data, delim, outtail):
    """The -d block walk (newmgrep.c:480-567, :568-585): returns
    (overwrites, marks, final_trim, live_append).

    overwrites: data offsets whose first dl bytes the loop replaces
    with the delimiter (every block's head); marks: duplicated bytes
    (each block's trim byte -- the residue copy lacks a start++);
    final_trim: the last block's trim boundary, set only when the EOF
    residue rescan runs (residue > 1); live_append: that rescan sees
    an appended delimiter."""
    BLK = 2 * 16384
    dl = len(delim)
    N = len(data)
    overwrites = []
    marks = []
    pos = 0
    trim_end = None
    live = False
    while pos < N:
        num_read = min(BLK, N - pos)
        overwrites.append(pos)
        blk = data[pos:pos + num_read]
        dends = _find_delims_arr(blk, delim)
        t = None
        if len(dends):
            le_end = int(dends[-1])
            le_start = le_end - dl + 1
            if outtail:
                t = pos + le_end
            elif le_start >= dl:        # else `newbuf < MAXLINE+D_length`
                t = pos + le_start - 1
        last_block = pos + num_read >= N
        if t is not None:
            if last_block:
                live = t < N - 1
                trim_end = t if live else None
                if live:
                    marks.append(t)
            else:
                marks.append(t)
        elif not last_block:
            # untrimmed block: residue==1 still duplicates the last byte
            marks.append(pos + num_read - 1)
        pos += num_read
    return overwrites, marks, trim_end, live


