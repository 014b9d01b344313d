"""Round-3 fuzz-sweep findings, minimized and pinned (tools/
fuzz_sweep.py seeds 9112-9322).  Each case is a distinct reference
quirk the dense models missed."""

import pytest

from .oracle import compare


def test_silent_allows_boolean_split(tmp_path):
    # checksg's `if (SILENT) return 1` (checksg.c:135) sits after the
    # blocking-flag rejections: -s terms still split to mgrep
    p = tmp_path / "c.txt"
    p.write_bytes(b"alpha\nalpha hello\nhello\nxx\n")
    compare(["-x", "-s", "alpha;hello", str(p)])
    compare(["-s", "alpha;hello", str(p)])


def test_silent_counts_per_scan_call(tmp_path):
    # DO_OUTPUT's `return 0` under SILENT exits only the current
    # block/rescan call (newmgrep.c:912): one count per firing call
    p = tmp_path / "c.txt"
    p.write_bytes(b"bbb early\n"
                  + (b"filler word lines\n" * 2000)[:33000]
                  + b"\nccc late\n")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"bbb\nccc\n")
    compare(["-c", "-s", "-f", str(pf), str(p)])
    p2 = tmp_path / "c2.txt"
    p2.write_bytes(b"xx\n\nbbb<$$ccc\n\nyy\n")
    compare(["-c", "-d", "$$", "-s", "-f", str(pf), str(p2)])


def test_raw_delimiter_when_sgrep_off(tmp_path):
    # with -f the pattern is empty and preprocess() returns before
    # converting "<PAT>; " (preproce.c:68-70); only agrep_search's
    # SGREP branch converts it (agrep.c:3182-3189) -- JUMP costs,
    # SILENT, or errors+-i leave the raw "<"+PAT bytes as the record
    # delimiter
    p = tmp_path / "c.txt"
    p.write_bytes(b"xx\n\nbbb<$$ccc\n\nyy\n")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"bbb\nccc\n")
    for flags in (["-D2", "-I1", "-S1"], ["-s"], ["-1", "-i"], [],
                  ["-1"], ["-u"]):
        compare(["-c", "-d", "$$"] + flags + ["-f", str(pf), str(p)])
    compare(["-d", "$$", "-D2", "-I1", "-S1", "-f", str(pf), str(p)])


def test_inverse_count_sees_head_overwrites(tmp_path):
    # countline runs AFTER the block-head memcpy of D_pattern
    # (newmgrep.c:512 before :518): '$$' = "\n\n" inflates the
    # inverse line count by the injected newlines
    for corpus in (b"abc\ndef\n", b"abc\ndef", b"no newlines at all",
                   b"abc$$def\n"):
        p = tmp_path / "c.txt"
        p.write_bytes(corpus)
        compare(["-c", "-v", "-t", "-d", "$$", "alpha;hello", str(p)])
        compare(["-c", "-v", "-d", "$$", "alpha,hello", str(p)])


@pytest.mark.parametrize("corpus", [b"\n", b"\nab\n", b"\n\n",
                                    b"\n\n\n\n", b"ab\n\ncd\n"])
def test_regex_empty_first_line_guard(tmp_path, corpus):
    # r_output's `CurrentByteOffset < 0` guard (agrep.c:1927): an
    # empty FIRST line is neither counted nor printed, matched or
    # inverse (CBO is still -1 from the FIRST_TIME decrement)
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    compare(["-c", "-2", "x*y", str(p)])
    compare(["-n", "-2", "x*y", str(p)])
    compare(["-v", "-c", "-2", "x*y", str(p)])


def test_mgrep_eof_rescan_nul_clamp(tmp_path):
    # the EOF rescan's residue carry is strncpy (newmgrep.c:585): a
    # NUL in the final residue zero-fills the rescanned copy -- for
    # files of ANY size, not just block-crossing ones
    import random
    r = random.Random(9112)
    corpus = bytes(r.randrange(256) for _ in range(5000))
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"zz\nzz\nq000\nq001\nq002\n")
    compare(["-1", "-v", "-f", str(pf), str(p)])
    compare(["-v", "-f", str(pf), str(p)])


@pytest.mark.parametrize("args", [
    ["-B", "-y", "-v", "a,b"],       # mixed-boolean maskgen error
    ["-B", "-y", "-v", "-t", "a,b"],
    ["-B", "-y", "-w", "a,b"],
    ["-B", "-y", "-v", "a;b"],       # meta-soup machine CAN match
    ["-B", "-y", "-v", "abc"],
    ["-B", "-y", "a,b"],             # no corruption without -w/-x/-v
    ["-B", "-y", "-w", "hello"],
    ["-B", "-y", "-x", "ab"],
])
def test_bestmatch_double_preprocess(tmp_path, args):
    """-B with -w/-x/-v re-preprocesses the ALREADY internal pattern
    (agrep.c:3584-3589): flat ORs die in maskgen with the mixed-
    boolean error (late Grand Total + rc 255), other shapes become a
    meta-soup machine that can still match at high D.  (Known residual
    divergence: -B -y -v on some 3-char patterns, see
    docs/CONFORMANCE.md.)"""
    p = tmp_path / "c.txt"
    p.write_bytes(b"tgaaccc")
    compare(args + [str(p)])
    p2 = tmp_path / "c2.txt"
    p2.write_bytes(b"hello world\nsome text here\nxyz\n")
    compare(args + [str(p2)])


def test_delim_residue_nul_clamp(tmp_path):
    """-d residue carries are strncpy too (newmgrep.c:560, :585): a
    NUL in a block's residue zero-fills the carried copy, erasing
    matches AND delimiters past it from the next scan / EOF rescan."""
    import random
    r = random.Random(30331)
    body = bytes(x if x != 0x6C else 0x6B     # keep interior 'll' rare
                 for x in (r.randrange(256) for _ in range(32760)))
    corpus = body + b"\x93,G\n\xccm0Si\xb0k\xd2\x91\x06\x86\xd0]\xd0M" \
        + b"\x8dQll\x00Ab\x86"
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"ab\nmatching\nq000\nq001\nq002\n")
    compare(["-i", "-w", "-d", "ll", "-f", str(pf), str(p)])
    compare(["-c", "-d", "ll", "-f", str(pf), str(p)])


@pytest.mark.parametrize("corpus", [b"bar", b"bar\nzz", b"zz\nbar",
                                    b"zz\nbar\n", b"foo\nbar\nbaz\n",
                                    b"aa", b"q\nq\nq\n"])
def test_wholeline_inverse_sentinel(tmp_path, corpus):
    """-x decrements the first scan start onto the sentinel newline
    (WHOLELINE start--): the first complement write leads with '\\n',
    the walk alignment shifts by one, and an emergency-stop
    pseudo-match past textend early-returns the call before ANY
    output (sgrep.c:723-748)."""
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    compare(["-v", "-x", "bar", str(p)])
    compare(["-v", "-x", "q", str(p)])


def test_regex_residue_backscan_clamp(tmp_path):
    """D>0 regex block carry is the LAST Maxline bytes
    (agrep.c:1739 strncpy): its NUL clamp can erase the line-start
    newline, so r_output's backscan lands on an earlier clamped
    newline (or the buffer[Maxline] fallback) and the printed record
    grows backwards through zero-filled residue bytes."""
    import random
    r = random.Random(130218)
    corpus = bytes(r.randrange(256) for _ in range(70000))
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    for flags in (["-1", "-i"], ["-1", "-i", "-s"], ["-2", "-i"],
                  ["-1", "-i", "-b"]):
        compare(flags + ["a(b|c)x", str(p)])


def test_mshort_textend_abort_nodelim(tmp_path):
    """m_short's `if(text >= textend) return 0` (newmgrep.c:1345)
    also swallows the match itself: a 1-byte file whose only byte is
    a 1-char -f term counts zero -- with -l, no filename prints."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"a")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"a\nzz\nq000\n")
    compare(["-3", "-c", "-n", "-l", "-f", str(pf), str(p)])
    compare(["-c", "-f", str(pf), str(p)])
    compare(["-f", str(pf), str(p)])


def test_inverse_count_clamp_order(tmp_path):
    """countline runs on the read with head overwrites but BEFORE the
    residue strncpy clamp zeroes anything -- clamped-away newlines
    still count (newmgrep.c:512-518 vs :560)."""
    import random
    r = random.Random(130384)
    corpus = (b"d$d" * 6 + b"$$aa\n" + bytes(
        r.randrange(256) for _ in range(64)) + b"\x00zz\nq$$\n") * 3
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"koala\nzz\nq000\nq001\n")
    compare(["-c", "-i", "-n", "-v", "-d", "$$", "-f", str(pf),
             str(p)])


def test_empty_file_never_scanned(tmp_path):
    """fill_buf returns 0 on an empty file, so no engine ever runs --
    in particular the bitap INVERSE machinery must not synthesize a
    record from the appended delimiter (-l printed a phantom
    filename)."""
    p = tmp_path / "empty.txt"
    p.write_bytes(b"")
    compare(["-2", "-n", "-v", "-l", "-D2", "-I1", "-S1",
             "fkbjpobaidhihgjlgkhanljgcip", str(p)])
    compare(["-v", "-l", "pat", str(p)])
    compare(["-d", "$$", "-v", "pat", str(p)])


def test_multifile_inverse_count_cumulative(tmp_path):
    """-v -c per-file emission is total_line - (num - prev) where
    total_line is the GLOBAL newline accumulator, never reset between
    files (agrep.c:3445-3486): file 2's printed count includes file
    1's line total."""
    f1 = tmp_path / "a.txt"
    f1.write_bytes(b"aa\nbb\n")
    f2 = tmp_path / "b.txt"
    f2.write_bytes(b"alpha x\ncc\ndd\nee\n")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"alpha\nzz\n")
    compare(["-c", "-v", "-f", str(pf), str(f1), str(f2)])
    compare(["-c", "-v", "-i", "-f", str(pf), str(f1), str(f2)])
    compare(["-v", "-c", "-d", "$$", "-f", str(pf), str(f1), str(f2)])


def test_mshort_abort_reprocesses_next_region(tmp_path):
    """m_short scans textend inclusively (`while (++text <= textend)`,
    newmgrep.c:1330) but a match there aborts before output
    (:1345) -- the duplicated byte re-fires in the EOF rescan, whose
    complement pointer starts fresh, so the inverse output prints the
    decorations with NO record bytes."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"ac")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"a\nzz\nq000\nq001\nq002\n")
    compare(["-b", "-v", "-f", str(pf), str(p)])
    compare(["-v", "-f", str(pf), str(p)])
    p2 = tmp_path / "c2.txt"
    p2.write_bytes(b"zz here\na")
    compare(["-v", "-f", str(pf), str(p2)])


def test_dup_byte_wordbound_context(tmp_path):
    """A term occurrence starting exactly at a region's scan start
    (the residue dup byte) has the context memcpy'd delimiter before
    it (newmgrep.c:511), so -w judges `before` against delim[-1], not
    the raw previous byte."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"x" * 32767 + b"a" + b"q")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"a\nzz\nq0\n")
    compare(["-b", "-w", "-d", "%%", "-f", str(pf), str(p)])
    p2 = tmp_path / "c2.txt"
    p2.write_bytes(b"x" * 32766 + b"ab" + b"q")
    pf2 = tmp_path / "p2.txt"
    pf2.write_bytes(b"ab\nzz\n" + b"".join(b"q%03d\n" % k
                                           for k in range(24)))
    compare(["-b", "-w", "-d", "%%", "-f", str(pf2), str(p2)])
    compare(["-w", "-d", "ll", "-f", str(pf2), str(p2)])


def test_silent_count_interior_textend_abort(tmp_path):
    """Under SILENT, DO_OUTPUT counts once per sub-engine call then
    returns 0 (newmgrep.c:913); m_short additionally aborts a term
    STARTING at the call's last byte (:1346) BEFORE counting, so a
    no-newline block whose only hit sits on the trim boundary counts
    in the EOF rescan call, not the block call (sweep seed 550118)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"abab$$" + b"koala" * 6 + b"koal")  # no newline
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"a\n")
    compare(["-c", "-s", "-f", str(pf), str(p)])
    compare(["-s", "-f", str(pf), str(p)])
    p2 = tmp_path / "c2.txt"
    p2.write_bytes(b"aa\nbb a")      # trailing residue fires its own call
    compare(["-c", "-s", "-f", str(pf), str(p2)])
    p3 = tmp_path / "c3.txt"
    p3.write_bytes(b"a\n" * 33000)   # multi-block: one count per block
    compare(["-c", "-s", "-f", str(pf), str(p3)])


def test_mshort_trim_abort_clips_refire_record(tmp_path):
    """A SHORT term matching AT a block call's trim newline aborts the
    call before output (newmgrep.c:1345); the residue copy rescans the
    byte as the NEXT call's first position, where the record span is
    pinned past the newline and clipped to that call's trim -- the
    record that prints is the residue-clipped one, never the full one
    (sweep seeds 19/20: '$a' patterns translate to '\\na' and anchor on
    trim newlines)."""
    # block1 = [0, 32768): newline-rich filler; last nl near the end.
    # block2: a record whose trailing newline IS the trim byte, with
    # 'a ' after it so the '\na' pattern matches at the trim.
    body = (b"xx yy zz ww\n" * 2800)[:32760] + b"junk999\n"  # 32768
    tail = b"alpha middle words$$\na "
    p = tmp_path / "c.txt"
    p.write_bytes(body + tail)
    pf = tmp_path / "p.txt"
    # 'z' (len 1) forces m_short; '$a' -> '\na'; 'alpha' makes the
    # clipped-vs-full record difference observable
    pf.write_bytes(b"z\n$a\nalpha\n")
    compare(["-f", str(pf), str(p)])
    compare(["-c", "-f", str(pf), str(p)])
    # same shape against an interior (non-final) block boundary
    body2 = body + b"alpha mid$$\na " + (b"qq rr ss tt\n" * 2800)[:32726]
    p2 = tmp_path / "c2.txt"
    p2.write_bytes(body2 + b"ending line\n")
    compare(["-f", str(pf), str(p2)])


def test_leading_virtual_newline_not_matchable(tmp_path):
    """text[start-1]='\\n' (newmgrep.c:477) is record-span CONTEXT, not
    scannable data: a '\\n'-leading term (prepf's ^/$ translation) must
    not match with its newline on the virtual byte before the file's
    first character (sweep seeds 43/65/89/122)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"a first line\nsecond a line\na third\n")
    pf = tmp_path / "p.txt"
    # '$a' -> '\na'; 'z' keeps m_short; file STARTS with 'a'
    pf.write_bytes(b"z\n$a\nq0\n")
    compare(["-f", str(pf), str(p)])
    compare(["-c", "-f", str(pf), str(p)])
    # monkey1 variant (p_size > 1): '\n'-leading 3-char term
    pf2 = tmp_path / "p2.txt"
    pf2.write_bytes(b"$a f\nqq0\n")
    compare(["-f", str(pf2), str(p)])


def test_delim_clamped_residue_virtual_stream(tmp_path):
    """-d residues beyond MAXLINE=1024 clamp start to 1
    (newmgrep.c:557-559): residue bytes past 1023 are clobbered by the
    next read, and the head splice memcpy lands INSIDE the new block's
    data.  The engine must search the stitched virtual stream the
    reference actually scanned (sweep seeds 30/274/276... -- 21 cases
    in the round-4 targeted sweep)."""
    import random
    rnd = random.Random(99)
    words = [b"alpha", b"xy", b"a", b"zz", b"ab", b"o", b"l"]
    out = bytearray()
    # sparse 'll' delimiters leave >1KB residues at 32KB boundaries
    while len(out) < 40000:
        out += b" ".join(rnd.choice(words) for _ in range(8))
        out += b"ll" if rnd.random() < 0.02 else b" "
    p = tmp_path / "c.txt"
    p.write_bytes(bytes(out[:40000]))
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"a\nalpha\nzz\nxy\n")
    compare(["-d", "ll", "-f", str(pf), str(p)])
    compare(["-c", "-d", "ll", "-f", str(pf), str(p)])
    compare(["-v", "-c", "-d", "ll", "-f", str(pf), str(p)])
    # monkey1 variant (p_size > 1)
    pf2 = tmp_path / "p2.txt"
    pf2.write_bytes(b"alpha\nzz\nxy\n")
    compare(["-d", "ll", "-f", str(pf2), str(p)])


def test_agrep_postjump_reset_unseeded(tmp_path):
    """agrep()'s post-match reset zeroes the machine to the UNSEEDED
    ~0 state and jumps past the record end (sgrep.c:1199-1204): a
    k-error match needing a leading deletion right after the jump
    (e.g. '-hello' against a line-initial 'hello') never fires,
    while round starts ARE seeded (sweep seed 700507)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"a hello b\nhello c\n")
    for args in (["-1", "-c", "-e", "-hello"],
                 ["-1", "-e", "-hello"],
                 ["-1", "-c", "-t", "-e", "-hello"],
                 ["-1", "-v", "-e", "-hello"]):
        compare(args + [str(p)])
    p2 = tmp_path / "c2.txt"
    p2.write_bytes(b"hello hello\nhello x\nhello y\n")
    compare(["-1", "-e", "-hello", str(p2)])
    compare(["-1", "-c", "-e", "-hello", str(p2)])
    # far-apart occurrences start fresh candidate rounds (seeded)
    p3 = tmp_path / "c3.txt"
    p3.write_bytes(b"a hello b\n" + b"w" * 60 + b"\nhello c\n")
    compare(["-1", "-c", "-e", "-hello", str(p3)])


def test_mgrep_silent_inverse_no_tail(tmp_path):
    """Under SILENT, DO_OUTPUT returns from the scan call BEFORE the
    INVERSE tail flush (newmgrep.c:912 vs :1024): a firing call prints
    no complement at all, -d included (sweep seed 700240)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"aaa alpha bbb\nccc ddd\neee alpha\n" * 3)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"alpha\nq000\n")
    compare(["-v", "-s", "-d", "\\n", "-f", str(pf), str(p)])
    compare(["-b", "-v", "-s", "-d", "\\n", "-f", str(pf), str(p)])
    compare(["-v", "-s", "-f", str(pf), str(p)])


def test_bestmatch_inverse_never_fires(tmp_path):
    """-B with -v: the double-preprocess reduces D_pattern twice,
    leaving old_D_pat EMPTY (preproce.c:223 via agrep.c:3587), so the
    rescan machine has no delimiter events and INVERSE counting --
    which happens only at delimiter completions -- can never fire at
    any escalation level (instrumented reference: nm==0 through
    D=MaxError)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"xy hello tgaab hello zz a alpha\n"
                  b"alpha a zz hello\na zz alpha")
    compare(["-B", "-y", "-v", "alpha", str(p)])
    p2 = tmp_path / "c2.txt"
    p2.write_bytes(b"tga here\ntga there\n")
    compare(["-B", "-y", "-v", "tga", str(p2)])
    compare(["-B", "-y", "-v", "-i", "TGA", str(p2)])


def test_supersequence_multibyte_delim_subsequence_events(tmp_path):
    """-p makes Init1 = ~0 (bitap.c:123): the delimiter-end bit then
    accumulates the delimiter as a SUBSEQUENCE, so a multi-byte -d
    fires record events (and machine resets) wherever the delimiter's
    chars have appeared in order -- e.g. 'alpha lorem' completes 'll'
    (sweep seed 901399)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"matching matching matching matching matching "
                  b"matching matching alpha lorem matching$$\nalpha")
    for args in (["-c", "-p", "-d", "ll", "acgtacgtacgtacgt"],
                 ["-c", "-p", "-d", "ll", "acgtacgtacgtacg"],
                 ["-p", "-d", "ll", "acgtacgtacgt"],
                 ["-1", "-p", "-d", "ll", "acgtacgtacgt"],
                 ["-c", "-n", "-p", "-d", "ll", "acgtacgtacgtacgt"]):
        compare(args + [str(p)])


def test_inverse_delim_partition_engine_replay(tmp_path):
    """-v -d under the D>0 partition engine: events, jumps, and record
    spans all come from the candidate-round machine (post-jump
    unseeded resets, s_output's forward/backward_delimiter jumps) --
    the inverse complements are driven by the exact replay's s_output
    events and spans (family sweep sgrepvd, seeds 0/3/6...)."""
    import random
    rnd = random.Random(61)
    words = [b"alpha", b"hello", b"matching", b"zz", b"xy", b"koala"]
    out = bytearray()
    while len(out) < 40000:
        out += b" ".join(rnd.choice(words) for _ in range(rnd.randint(1, 7)))
        out += rnd.choice([b"\n", b"$$", b"%%", b""])
    p = tmp_path / "c.txt"
    p.write_bytes(bytes(out[:40000]))
    for args in (["-v", "-d", "o", "-2", "koala"],
                 ["-v", "-d", "$$", "-1", "alphahello"],
                 ["-v", "-d", "%%", "-2", "hello"],
                 ["-v", "-d", "o", "-1", "-n", "koala"]):
        compare(args + [str(p)])


def test_complex_flush_cbo_no_own_trim_drift(tmp_path):
    """The complex-boolean crossing flush can fire at the walk's loop
    EXIT past its own region's trim (monkey1:1019 residual check): the
    CBO there has not rescanned that seam's duplicate byte yet, so the
    per-seam drift must cap at the record's region (sweep seed
    1201234: -b offset 33 vs 34 on the final record)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"y koalakoala d$dd$dd$dd$dd$dd$dd$d\nCaSeCaSeCaSeC")
    compare(["-b", "-v", "{alpha;bravo},koala", str(p)])
    compare(["-b", "{alpha;bravo},koala", str(p)])
    compare(["-q", "-v", "{alpha;bravo},koala", str(p)])


def test_agrep_inverse_per_block_flush(tmp_path):
    """agrep() D>0 INVERSE without -d: each engine call's complement
    accounting (lastout + the sgrep.c:1242 tail flush) is PER BLOCK --
    records that tile a long-line corpus leave almost no complement
    output, where a single whole-file flush would print the entire
    uncovered tail (sweep seed 830254: 1 byte vs 8302)."""
    import random
    rnd = random.Random(830254)
    words = [b"hello", b"lorem", b"zz", b"ab", b"matching", b"d$d"]
    out = bytearray()
    # long lines: few newlines, records span thousands of bytes
    while len(out) < 70000:
        out += b" ".join(rnd.choice(words) for _ in range(500))
        out += rnd.choice([b"\n", b" "])
    p = tmp_path / "c.txt"
    p.write_bytes(bytes(out[:70000]))
    for args in (["-2", "-v", "hello"], ["-1", "-v", "hello"],
                 ["-2", "-v", "-b", "hello"]):
        compare(args + [str(p)])


def test_vmode_region_crossing_occurrence(tmp_path):
    """A multi-pattern term straddling a vmode scan-region seam cannot
    verify in the reference: the byte before each region's start is
    the spliced newline (newmgrep.c:500/:571), not the previous
    region's trim byte that the virtual stream abuts there (sweep
    seed 830047: phantom 'zz' match built from one 'z')."""
    pf = tmp_path / "p.txt"
    pf.write_text("zz\nq000\n")
    p = tmp_path / "c.txt"
    # no-newline 300-byte buffer starting 'z' + NUL at offset 2: the
    # EOF rescan's carried copy opens with the duplicated 'z'
    body = bytearray(b"z\xa0\x00" + bytes(range(1, 250)) + b"q0q0" * 10)
    p.write_bytes(bytes(body[:300]))
    for args in (["-f", str(pf)], ["-c", "-f", str(pf)],
                 ["-v", "-f", str(pf)], ["-u", "-f", str(pf)]):
        compare(args + [str(p)])


def test_seam_candidate_byte_substitution(tmp_path):
    """Round-5 fuzz find (seed 910035, minimized to 32769 bytes): a
    term whose start abuts a -d block seam.  Each scan region's
    candidate at start-1 reads the spliced delimiter's last byte
    (newmgrep.c:511, monkey1 :832), not the previous block's data the
    flattened stream abuts there -- and the raw-byte twin at the same
    anchor belongs to the PREVIOUS region, where the record jump can
    consume it.  JUMP costs keep D_pattern in the raw "<o" form
    (agrep.c:2682-2694, preproce.c:68-70)."""
    import random
    rnd = random.Random(910035)
    words = [b"alpha", b"bravo", b"hello", b"matching", b"xy", b"a",
             b"koala", b"zz", b"ab", b"lorem", b"CaSe", b"d$d"]
    out = bytearray()
    while len(out) < 40000:
        out += rnd.choice(words) * rnd.randint(1, 9)
        out += rnd.choice([b"\n", b" ", b"$$"])
    pf = tmp_path / "p.txt"
    pats = [rnd.choice(words) for _ in range(15)]
    pf.write_bytes(b"".join(x + b"\n" for x in pats)
                   + b"".join(b"q%03d\n" % k for k in range(15)))
    # the minimized shape: one byte past the 32KB block boundary with
    # the 2-byte straddler "xy" ending exactly at the seam
    p = tmp_path / "c.txt"
    body = bytearray(b"xy hello zz\n")
    while len(body) < 32766:
        body += b"lorem alpha "
    p.write_bytes(bytes(body[:32766]) + b"xyx")
    for flags in (["-c", "-w"], ["-c"], ["-w"], [], ["-v", "-c"]):
        compare(flags + ["-d", "o", "-D2", "-I1", "-S1",
                         "-f", str(pf), str(p)])
    # the original 40KB corpus across several flag mixes
    p2 = tmp_path / "c2.txt"
    p2.write_bytes(bytes(out[:40000]))
    for flags in (["-c", "-w"], ["-c"], []):
        compare(flags + ["-d", "o", "-D2", "-I1", "-S1",
                         "-f", str(pf), str(p2)])
        compare(flags + ["-d", "ll", "-D2", "-I1", "-S1",
                         "-f", str(pf), str(p2)])


def test_complex_boolean_terminal_stack_leak(tmp_path):
    """aparse_tree's plain-terminal path appends one stack byte to
    each terminal (asplit.c:239-260): frames at equal recursion depth
    reuse the same slot, so the byte is the previous same-depth
    terminal's residue.  {kernel;device},zebra => third terminal
    "zebral" (stable across runs)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"zebra x\nzebral x\nkernel device\nccc\nccca\n"
                  b"kernel device zebra\nkernel device zebral\n")
    for pat in ("{kernel;device},zebra", "{kernel,device},zebra",
                "{aaaa;bb},ccc", "{aaaa;bb},cccaa", "{a;b},c"):
        compare(["-c", pat, str(p)])
        compare([pat, str(p)])


def test_silent_inverse_limit_stops_block_loop(tmp_path):
    """-v -s with -L: a fired-silent call trips the block loop's
    post-call limit check (newmgrep.c:562-565) -- later regions are
    neither scanned nor complement-flushed (round-5 seed 510130)."""
    body = bytearray()
    while len(body) < 40000:
        body += b"xyxy lorem koala zz words\n"
    p = tmp_path / "c.txt"
    p.write_bytes(bytes(body[:40000]))
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"zz\nxy\nq000\n")
    compare(["-v", "-s", "-L", "5:1:1", "-f", str(pf), str(p)])
    compare(["-v", "-s", "-L", "1:0:0", "-f", str(pf), str(p)])


def test_mshort_eof_refire_skips_stale_suppression(tmp_path):
    """A term matching AT the final trim byte refires in the EOF
    rescan (newmgrep.c:1345), where the after-context is the appended
    newline -- the previous file's stale buffer byte must NOT
    suppress it under -w (round-5 seed 510156: 2-byte file 'zz'
    scanned after a 32KB file)."""
    big = tmp_path / "big.txt"
    big.write_bytes((b"d$dd$d words filler\n" * 2000)[:32761])
    small = tmp_path / "small.txt"
    small.write_bytes(b"zz")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"zz\na\nq000\n")
    compare(["-w", "-c", "-f", str(pf), str(big), str(small)])


def test_mshort_refire_cbo_drift_resets(tmp_path):
    """The m_short text-- drift desyncs CBO only within ONE scan
    call (the block loop recomputes it, newmgrep.c:550): an anchor ON
    a non-newline trim mark fires in the NEXT call's rescan with a
    fresh drift (round-5 seed 510197, -q offset off-by-one)."""
    body = bytearray()
    while len(body) < 32742:
        body += b"filler words here xx\n"
    body = body[:32742]
    body[-1:] = b"\n"
    data = bytes(body) + b"zz hello borase xx\n" + b"bravobravobravobravo"
    p = tmp_path / "c.txt"
    p.write_bytes(data)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"a\nbravo\nq000\n")
    compare(["-D2", "-I2", "-S1", "-t", "-q", "-h", "-u",
             "-f", str(pf), str(p)])
    compare(["-q", "-f", str(pf), str(p)])


def test_limit_stop_clamps_inverse_countline(tmp_path):
    """-v -c with -L: the limit stop exits the block loop mid-file
    (newmgrep.c:562-565), so countline never sees unread blocks --
    the inverse count drops their newlines (round-5 seeds
    520011/520311)."""
    body = bytearray()
    while len(body) < 70000:
        body += b"lorem hello words zz xy\n"
    p = tmp_path / "c.txt"
    p.write_bytes(bytes(body[:70000]))
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"zz\nxy\nhello\nq000\n")
    compare(["-v", "-c", "-L", "3:0:0", "-f", str(pf), str(p)])
    compare(["-v", "-c", "-L", "0:0:2", "-f", str(pf), str(p)])


def test_ordinary_term_crossing_nonnewline_trim(tmp_path):
    """A term straddling a NON-newline block trim (newline-free final
    block) is scanned by neither call: the block call trims before
    it, the rescan's copy starts past its head (round-5 seed 520159:
    'alpha' spanning the final 32KB boundary counted once too many)."""
    body = bytearray()
    while len(body) < 65535:
        body += b"filler words and text\n"
    body = bytes(body[:65534]) + b"\n"
    data = body + b"alpha koala koala "
    p = tmp_path / "c.txt"
    p.write_bytes(data)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"alpha\nq000\nq001\n")
    for flags in (["-b"], ["-c"], [], ["-D3", "-I1", "-S1", "-t",
                                       "-i", "-b"]):
        compare(flags + ["-f", str(pf), str(p)])
    pf2 = tmp_path / "p2.txt"
    pf2.write_bytes(b"koala\nq000\nq001\n")
    compare(["-b", "-f", str(pf2), str(p)])


def test_wordbound_at_nonnewline_trim_refire(tmp_path):
    """A term starting ON a block trim mark refires in the next scan
    call where the byte before it is the WRITTEN newline
    (newmgrep.c:500/:571), not the raw previous byte -- -w must not
    reject it on the raw neighbour (round-5 seed 530213: term 'a' at
    a non-newline trim preceded by 'h')."""
    body = bytearray()
    while len(body) < 65375:
        body += b"word lines filler\n"
    body = bytes(body[:65374]) + b"\n"
    mid = (b"alpha" * 33)[:161]          # no newline to EOF
    data = body + mid + b"a xyozzzzzzzzzz$$b"
    assert data[65536:65537] == b"a"
    p = tmp_path / "c.txt"
    p.write_bytes(data)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"a\nxy\nzz\nq000\n")
    compare(["-w", "-f", str(pf), str(p)])
    compare(["-w", "-c", "-f", str(pf), str(p)])


def test_sgrep_delim_head_wordbound_context(tmp_path):
    """sgrep -d: the byte before the stream head is the spliced
    delimiter tail (sgrep.c:400-402), so a -w match at offset 0 is
    rejected when delim[-1] is alnum (round-5 seed 540255)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"matching bravo\nmore matching words\n"
                  b"other matching\n")
    compare(["-d", "o", "-w", "matching", str(p)])
    compare(["-d", "$$", "-w", "matching", str(p)])
    compare(["-d", "o", "-w", "-c", "matching", str(p)])


def test_textend_probe_record_at_dirty_trim(tmp_path):
    """monkey1 probes its textend (text == textend passes the strict
    > check): a p>=2 term anchored ON a non-newline trim fires with
    curtextend = text+1 and curtextbegin floored at the previous
    match's advanced textbegin (round-5 seed 540744: the 2-byte 'Ca'
    record).  The stale-completed EOF candidate at the m_short
    textend also never fires (seeds 540199/540366)."""
    body = bytearray()
    while len(body) < 32580:
        body += b"filler words xx\n"
    body = bytes(body[:32579]) + b"\n"
    mid = (b"zz lorem ab koala " * 12)[:188]
    data = body + mid + b"CaSe d$d a mat"[:14]
    p = tmp_path / "c.txt"
    p.write_bytes(data)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"CaSe\nab\nxy\nzz\nd$d\nq000\n")
    for flags in (["-b", "-t", "-i"], ["-b"], ["-c"], [],
                  ["-D2", "-I2", "-S1", "-w", "-t", "-i", "-b",
                   "-2"]):
        compare(flags + ["-f", str(pf), str(p)])


def test_vmode_no_rescan_final_record_cap(tmp_path):
    """Clamped-residue (vmode) corpora with a 1-byte final read and
    no trailing newline: the final scan call's record stops before
    its textend byte with no appended newline -- same no-rescan rule
    as the plain path (round-5 seed 550395).  (Match terms are kept
    sparse: dense 1-char terms make the ORACLE quadratic on the
    clamped 6KB line.)"""
    body = bytearray()
    while len(body) < 26658:
        body += b"zz uvw lor xy wordss\n"
    body = bytes(body[:26657]) + b"\n"
    # 6110-byte newline-free run (residue > MAXLINE: clamp regime),
    # one term inside the surviving 1023-byte carry window
    tail = bytearray((b"bro kol mm xy " * 500)[:6110])
    tail[943:948] = b"match"
    data = body + bytes(tail) + b"h"
    assert len(data) % 32768 == 1 and data[-1:] != b"\n"
    p = tmp_path / "c.txt"
    p.write_bytes(data)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"j\nmatch\nq000\n")
    for flags in (["-D1", "-I1", "-S2", "-t"], [], ["-c"]):
        compare(flags + ["-f", str(pf), str(p)])


def test_textend_probe_needs_outtail_revisit(tmp_path):
    """The scan resumes at textbegin+shift after an output
    (newmgrep.c:890,1040): without -t the pointer lands PAST the
    region's textend, so the anchor-on-trim probe fires only when
    OUTTAIL backs textbegin onto it (round-5 seed 560321 vs 540744)."""
    body = bytearray()
    while len(body) < 32731:
        body += b"xy lorem matching words here\n"
    body = bytes(body[:32730]) + b"\n"
    data = body + b"matching hello a lorem aba alpha a"
    p = tmp_path / "c.txt"
    p.write_bytes(data)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"ab\nalpha\nxy\nq000\n")
    for flags in (["-D3", "-I2", "-S2", "-c"], ["-c"], [],
                  ["-t"], ["-t", "-c"]):
        compare(flags + ["-f", str(pf), str(p)])


def test_newline_anchored_terms_record_hop(tmp_path):
    """'^'-converted terms start with '\\n': their records span the
    FOLLOWING line and the jump hops alternate matches -- the flat
    vectorized walk cannot model that, so newline-bearing terms take
    the sequential walk (pre-existing gap found round 5)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"foo bar\nfoo baz\nother\nfoo qux\n" * 3)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"^foo\nqq\n")
    compare(["-f", str(pf), str(p)])
    compare(["-c", "-f", str(pf), str(p)])
    pf2 = tmp_path / "p2.txt"
    pf2.write_bytes(b"foo$\nqq\n")
    compare(["-f", str(pf2), str(p)])
    compare(["-c", "-f", str(pf2), str(p)])


def test_silent_delim_limit_stops_block_loop(tmp_path):
    """-s with -d and -L: a fired-silent call trips the post-call
    limit check even on the delimiter walk (round-5 seed 560812)."""
    body = bytearray()
    while len(body) < 40000:
        body += b"xy hello koala words lorem\n"
    p = tmp_path / "c.txt"
    p.write_bytes(bytes(body[:40000]))
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"xy\nhello\nq000\n")
    compare(["-D1", "-I1", "-S2", "-d", "%%", "-t", "-s",
             "-L", "5:1:1", "-f", str(pf), str(p)])
    compare(["-d", "%%", "-s", "-L", "0:0:1", "-f", str(pf), str(p)])


def test_sgrep_delim_overlap_textbegin_floor(tmp_path):
    """sgrep -d: every output advances textbegin to the record's END
    (sgrep.c:812, no OUTTAIL backoff), and the next backward
    delimiter search floors there -- an overlapping occurrence
    ('ll' over 'lll') starting below the floor is invisible, so the
    next record begins AT the floor (round-5 seeds 560314/560273)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"xy aaall" + b"bravo\nxyxyxylll"
                  + b"orem\naaaa\nxy end mm\n")
    compare(["-d", "ll", "-t", "xy", str(p)])
    compare(["-d", "ll", "xy", str(p)])
    # the 560314 shape: the record before the lll ends exactly after
    # the first ll, flooring the next search past the overlap
    body = bytearray()
    while len(body) < 660:
        body += b"words filler lines\n"
    data = (bytes(body[:660]) + b"koalakoalall"
            + b"bravo\nxyxyxyxyxyxyxylll"
            + b"oremlorem\naaaa$$zz\nxyxy mm hellohello end\n")
    p2 = tmp_path / "c2.txt"
    p2.write_bytes(data)
    compare(["-d", "ll", "-t", "xy", str(p2)])
    compare(["-d", "ll", "-t", "-c", "xy", str(p2)])


def test_filenameonly_early_return_freezes_stale(tmp_path):
    """-l returns from mgrep after the FIRST firing block
    (newmgrep.c:531-545): later blocks are never read, so the reused
    buffer keeps the EARLIER blocks' bytes -- the next (1-byte) file's
    candidate completes against those, m_short aborts at textend, and
    its INVERSE tail never prints (round-5 seed 570891)."""
    body = bytearray(b"koala CaSe words a lorem\n")
    while len(body) < 32792:
        body += b"filler a words lines here\n"
    p1 = tmp_path / "c.txt"
    p1.write_bytes(bytes(body[:32792]))
    p2 = tmp_path / "k.txt"
    p2.write_bytes(b"k")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"a\nkoala\nq000\n")
    compare(["-v", "-t", "-l", "-f", str(pf), str(p1), str(p2)])
    compare(["-D3", "-I1", "-S2", "-v", "-t", "-l", "-f", str(pf),
             str(p1), str(p2)])


def test_vmode_phantom_match_on_dup_mark(tmp_path):
    """NUL corpus, no trailing newline, p_size==1, -v: the virtual
    stream embeds the dup trim byte twice, so a term spanning the seam
    ('zz' over dup-'z'+rescan-'z') scans as a match that NEITHER
    reference call sees -- m_short aborts on the candidate AT textend
    (newmgrep.c:1345) and the rescan call starts past it.  The phantom
    row must be dropped or it rewinds the inverse lastout over the
    (abort-suppressed) dup byte and double-counts (round-5 seed
    580808)."""
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"a\nzz\n")
    for body in (b"zz\x00qq", b"z\x00qq", b"qq\x00zz", b"zz\x00",
                 b"aa\x00qq", b"zz\x00qq\x00rr"):
        p = tmp_path / "c.txt"
        p.write_bytes(body)
        compare(["-v", "-f", str(pf), str(p)])
        compare(["-v", "-n", "-f", str(pf), str(p)])
        compare(["-f", str(pf), str(p)])
        compare(["-c", "-f", str(pf), str(p)])
