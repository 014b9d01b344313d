"""Round-5 continuation: the 1000-case stratified sweep's second
batch (seeds 850000-850999) found six divergence families; each is
minimized here as a structural corpus.

 1. vmode appended-newline guard must consult the RAW file: a 1-byte
    final read (len % 32768 == 1) skips the EOF rescan even when the
    clamped virtual stream's length says otherwise (seed 850832).
 2. -d inverse complement: backward_delimiter floors at textbegin,
    which every output advances to the record END -- an overlapping
    delimiter occurrence starting below the floor is invisible
    ('-d ll -t' over an 'lll' chain, seed 850473).
 3. -L limit stop inside a vmode (clamped) stream: the countline
    clamp maps the stopping anchor through the vmode marks to the
    RAW block, not the stitched stream (seed 850457).
 4. SILENT per-call counting: the EOF rescan after a NON-newline
    final trim holds only the residue, so an occurrence straddling
    the final block boundary fires the final-block call (forward
    verify past textend), never the rescan (seed 850258).
 5. mgrep's buffer is re-malloc'd per file: when the run's FIRST
    output is a count line (printed between free_buf and the next
    alloc_buf), the stdio chunk is carved from the freed space and
    the next file's buffer shifts +4112 -- its stale tail is the old
    content shifted (seed 850115).
 6. m_short's textend-abort precedes the WORDBOUND check and applies
    to -d trims: a raw verify hit AT the trim aborts the call and
    its INVERSE tail flush even when -w rejects the match
    (seed 850121)."""

from .oracle import compare


def test_vmode_one_byte_final_read_no_rescan(tmp_path):
    # block 1: last newline early enough to clamp (residue > 1024);
    # total 32769 = one extra byte -- the reference never appends a
    # newline to the final record
    p = tmp_path / "c.txt"
    p.write_bytes((b"word hello zz\n" * 2100)[:29400] + b"\n"
                  + b"y" * 3367 + b"t")
    assert p.stat().st_size == 32769
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"hello\nzz\nq000\n")
    compare(["-D3", "-I2", "-S1", "-v", "-f", str(pf), str(p)])
    compare(["-v", "-f", str(pf), str(p)])
    # and the appended-newline case still fires for a longer tail
    p2 = tmp_path / "c2.txt"
    p2.write_bytes((b"word hello zz\n" * 2100)[:29400] + b"\n"
                   + b"y" * 3360 + b"tail bytes")
    compare(["-D3", "-I2", "-S1", "-v", "-f", str(pf), str(p2)])


def test_inverse_delim_overlap_floor(tmp_path):
    # 'lll' chains under '-d ll': the second (overlapping) occurrence
    # starts below the advanced textbegin and is invisible to the
    # complement's backward search
    p = tmp_path / "c.txt"
    body = (b"zebra words here ll CaSelllorem stuff ll bravo more ll"
            b" lllchain ll tail\n") * 600
    p.write_bytes(body)
    compare(["-d", "ll", "-v", "-t", "bravo", str(p)])
    compare(["-d", "ll", "-v", "bravo", str(p)])
    compare(["-d", "lll", "-v", "-t", "zebra", str(p)])


def test_limit_clamp_in_vmode(tmp_path):
    # clamped stream + -L stop: the inverse count line must drop only
    # the newlines past the RAW stopping block
    p = tmp_path / "c.txt"
    p.write_bytes(b"koala hello\n" * 200 + b"x" * 30000 + b"\n"
                  + b"koala again\n" * 2000 + b"x" * 31000 + b"\n")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"koala\nq000\n")
    compare(["-D1", "-I2", "-S2", "-w", "-v", "-c", "-L", "3:0:0",
             "-f", str(pf), str(p)])
    compare(["-v", "-c", "-L", "2:0:0", "-f", str(pf), str(p)])


def test_silent_rescan_needs_whole_occurrence(tmp_path):
    # 'bravo' straddles the final 32KB boundary with 3 carried bytes:
    # the final-block call fires it via the forward verify; the EOF
    # rescan holds only 'vo...' and must NOT fire again
    p = tmp_path / "c.txt"
    p.write_bytes(b"x" * 32752 + b"\n" + b"y" * 15
                  + b"z" * 32764 + b"\n" + b"bra" + b"vo a lore")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"koala\nbravo\nq000\nq001\nq002\n")
    compare(["-w", "-t", "-c", "-i", "-s", "-f", str(pf), str(p)])
    compare(["-c", "-s", "-f", str(pf), str(p)])
    compare(["-w", "-t", "-c", "-i", "-f", str(pf), str(p)])


def test_count_gap_shifts_stale_buffer(tmp_path):
    # file 1's count line is the run's first output: file 2's buffer
    # lands 4112 bytes past file 1's, so the wordbound after-byte at
    # file 2's EOF reads the SHIFTED stale content
    a = tmp_path / "a.txt"
    a.write_bytes(b"ko zebra hello word koala lorem\n" * 1024
                  + b"tail bytes here no delim")
    b = tmp_path / "b.txt"
    b.write_bytes(b"ab CaSe")
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"CaSe\nab\nkoala\nq000\n")
    for order in ((a, b), (b, a)):
        compare(["-d", "o", "-w", "-v", "-c", "-i", "-f", str(pf),
                 str(order[0]), str(order[1])])
        compare(["-d", "o", "-w", "-c", "-i", "-f", str(pf),
                 str(order[0]), str(order[1])])
    compare(["-w", "-c", "-f", str(pf), str(a), str(b), str(b)])


def test_dtrim_abort_precedes_wordbound(tmp_path):
    # term 'a' raw-matches AT the -d trim byte; -w would reject it,
    # but the reference aborts the call first -- the INVERSE tail
    # [last record end .. trim] must not print
    p = tmp_path / "c.txt"
    body = bytearray(b"yy$yx\ny\nao$yaaba$oao\na\no\noooxo$yoaxbbyo\n"
                     * 800)
    body = body[:32735] + b"\naoabxxyxy$$xab$b$\nbax\n\n"
    p.write_bytes(bytes(body))
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"alpha\nxy\nkoala\na\nbravo\nab\nq000\n")
    compare(["-d", "o", "-w", "-v", "-f", str(pf), str(p)])
    compare(["-d", "o", "-v", "-f", str(pf), str(p)])
    compare(["-d", "o", "-w", "-v", "-s", "-c", "-f", str(pf),
             str(p)])


def test_vmode_rescan_start_wordbound(tmp_path):
    # seed 860332: a clamped block (residue > 1024) followed by a
    # tiny final read whose term OPENS the EOF rescan -- the byte
    # before the rescan's scan start is the written newline
    # (newmgrep.c:571), so -w must not read region r-1's V byte
    p = tmp_path / "c.txt"
    p.write_bytes(b"koala words here\n" * 1654 + b"x" * 4650
                  + b"alpha ")
    assert p.stat().st_size % 32768 > 1 and p.stat().st_size > 32768
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"alpha\nkoala\nq000\n")
    compare(["-w", "-i", "-c", "-f", str(pf), str(p)])
    compare(["-w", "-t", "-i", "-f", str(pf), str(p)])
    compare(["-w", "-v", "-c", "-f", str(pf), str(p)])


def test_inverse_outtail_no_jump_backoff(tmp_path):
    # seed 880159: INVERSE keeps textbegin = curtextend regardless of
    # OUTTAIL (monkey1:889) -- with -t the non-inverse backoff was
    # re-visiting an anchor ON the final non-newline trim, double
    # counting the record and skipping the call-end flush byte
    p = tmp_path / "c.txt"
    body = bytearray(b"." * 32792)
    body[32298] = 0x0A
    body[32322:32327] = b"hello"
    body[32767:32769] = b"zz"
    p.write_bytes(bytes(body))
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"hello\nzz\nq000\n")
    compare(["-w", "-v", "-t", "-f", str(pf), str(p)])
    compare(["-v", "-t", "-f", str(pf), str(p)])
    compare(["-v", "-f", str(pf), str(p)])
    # zz fully inside the final read / fully inside the carry
    for lo in (32769, 32700):
        b2 = bytearray(body)
        b2[32767:32769] = b".."
        b2[lo:lo + 2] = b"zz"
        p.write_bytes(bytes(b2))
        compare(["-w", "-v", "-t", "-f", str(pf), str(p)])
