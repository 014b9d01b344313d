"""Records outgrowing the reference's buffers: the residue clamps
(bitap.c:286-297 `ResidueSize > Max_record`, asearch.c:308-320 with
its `lasti == 0 -> 1` head erosion, sgrep.c:465-471 MAXLINE clobber)
reshape printed records and can silently lose matches -- all
byte-exact here via _bitap_clamped_synth and the agrep_exact replay."""

import pytest

from .oracle import compare


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    d = tmp_path_factory.mktemp("clamp")
    out = {}
    cases = {
        # one 400KB line, match in the middle
        "longline": b"x" * 200000 + b" hello " + b"y" * 200000 + b"\n",
        # 120KB records repeated
        "megarec": (b"a" * 60000 + b"hello" + b"b" * 60000 + b"\n") * 3,
        # 200KB record with short neighbours and head/tail markers
        "marked": (b"xx hello\n" + b"ZW" + b"a" * 100000 + b" hello "
                   + b"b" * 100000 + b"YQ\ntail hello\n"),
        # 60KB record: clamps once, prints all but one byte
        "mid": (b"a" * 30000 + b" hello " + b"b" * 30000
                + b"\nshort hello line\n"),
        # no trailing newline on a long record
        "nonl": b"p" * 60000 + b"hello" + b"q" * 60000,
    }
    for name, data in cases.items():
        p = d / (name + ".txt")
        p.write_bytes(data)
        out[name] = str(p)
    return out


@pytest.mark.parametrize("flags", [
    ["-n"], [], ["-b"], ["-c"], ["-v", "-c"],
    ["-2", "-n"], ["-1"], ["-2", "-b"], ["-2", "-c"], ["-1", "-c"],
    ["-i", "-n"],
])
@pytest.mark.parametrize("name", ["longline", "megarec", "marked",
                                  "mid", "nonl"])
def test_clamped_record_conformance(corpora, flags, name):
    compare(flags + ["hello", corpora[name]], check_stderr=True)


@pytest.mark.parametrize("flags", [["-n"], [], ["-b"],
                                   ["-1", "-n"], ["-2", "-c"]])
def test_clamped_regex_records(tmp_path, flags):
    """re()/re1() residue clamps (agrep.c:1426-1431 for D==0; the D>0
    loop carries only the last Maxline bytes, :1739): a crossing line
    prints head+final-block (D==0) or the final block alone (D>0)."""
    p = tmp_path / "c.txt"
    p.write_bytes(b"ab cd\n" + b"Z" + b"a" * 60000 + b" theq "
                  + b"b" * 40000 + b"YQ\ntail theq\n")
    compare(flags + ["(theq|zzz)", str(p)])
    for gap in (1023, 1024, 1025, 1500):
        pre = 49152 - gap
        p2 = tmp_path / ("g%d.txt" % gap)
        p2.write_bytes(b"a" * pre + b"\n" + b"c" * (gap - 1)
                       + b"d" * 3000 + b" theqv " + b"e" * 200
                       + b"YQ\ntail\n")
        compare(["-1", "-n", "(theqv|zzz)", str(p2)])


@pytest.mark.parametrize("flags", [
    [], ["-n"], ["-b"], ["-c"], ["-2"], ["-2", "-c"], ["-5", "-n"],
    # -I/-S/-D set JUMP (agrep.c:2682-2694): dispatch goes to
    # asearch1 (bitap.c:113-116), whose copy-back does NOT erode at
    # lasti == 0 (asearch1.c:244 `if(lasti < 0)`)
    ["-2", "-I2", "-n"], ["-3", "-D2", "-S2"],
])
@pytest.mark.parametrize("pat", ["br[ao]vo", "de#ta", "bravo"])
def test_clamped_first_record(tmp_path, flags, pat):
    """A FIRST record spanning the whole first block: bitap.c:141 /
    asearch.c:69 start lasti at Max_record (the first data byte, not
    the prefilled newline), so block one's residue is exactly
    Max_record and the first copy-back never clamps -- the record
    prints continuously across the boundary.  -d '$$' is paragraph
    mode ('$' -> '\\n' via maskgen), so a corpus with no blank line
    until late is one giant first record."""
    data = (b"bravo alpha\n" + b"ab" * 40000 + b"\n"
            + b"delta the koala\n\n" + b"tail bravo zz\n")
    p = tmp_path / "para.txt"
    p.write_bytes(data)
    compare(flags + ["-d", "$$", pat, str(p)], check_stderr=True)
    # and a variant where the SECOND record is the clamping one
    p2 = tmp_path / "para2.txt"
    p2.write_bytes(b"first bravo\n\n" + b"cd" * 40000 + b"\n"
                   + b"bravo end\n\n" + b"zz\n")
    compare(flags + ["-d", "$$", pat, str(p2)], check_stderr=True)


@pytest.mark.parametrize("flags", [
    ["-2", "-n"], ["-2"], ["-5", "-n"], ["-2", "-I2", "-n"], ["-b"],
])
def test_clamped_strncpy_bands(tmp_path, flags):
    """The residue copies are real strncpy calls (bitap.c:292,
    asearch.c:317): on the eroded asearch path the copy is the fully
    overlapping strncpy(buf, buf+1, Max_record), whose glibc
    vectorized implementation mis-shifts small windows that depend on
    the destination's address mod 128 -- reproduced by running the
    process's own strncpy on an alignment-matched scratch
    (engine.oracle_buf_align replays the reference's heap layout from
    the invocation's pattern/delimiter/file-name lengths)."""
    import random
    rnd = random.Random(4242)
    body = bytes(rnd.randrange(1, 256) for _ in range(130000))
    body = body.replace(b"\n", b"*").replace(b"$", b"*")
    data = (b"head bravo\n\n" + body[:300] + b"\n" + body[300:]
            + b" bravo zz\n\nbravo tail\n")
    p = tmp_path / "bands.txt"
    p.write_bytes(data)
    compare(flags + ["-d", "$$", "bravo", str(p)], check_stderr=True)


@pytest.mark.parametrize("flags", [
    ["-n"], ["-2", "-n"], ["-2", "-I2", "-n"], ["-d", "$$", "-n"],
    ["-d", "$$", "-2"], ["-2", "-c"],
])
def test_clamped_nul_truncation(tmp_path, flags):
    """strncpy NUL-truncates and zero-fills: a NUL byte anywhere in a
    carried residue erases the rest of the preserved head in the
    reference's buffer.  Inherited exactly by driving libc strncpy."""
    data = (b"x" * 20000 + b"\x00" + b"y" * 40000 + b" hello bravo "
            + b"z" * 30000 + b"\n\nshort hello bravo\n")
    p = tmp_path / "nul.txt"
    p.write_bytes(data)
    pat = "bravo" if "-d" in flags else "hello"
    compare(flags + [pat, str(p)], check_stderr=True)


@pytest.mark.parametrize("flags", [["-v"], ["-v", "-c"], [], ["-c"]])
@pytest.mark.parametrize("corpus_kind", ["clamped-interior", "pure-run",
                                         "run-after-line", "trimmed-small"])
def test_inverse_clamped_seams(tmp_path, flags, corpus_kind):
    """INVERSE over clamped/newline-less blocks: each block call prints
    its complement tail and the copied residue re-prints the trim byte
    once (monkey1 lastout = text+start, newmgrep.c:831); a final block
    with no newline leaves its WHOLE residue for the EOF rescan
    (strncpy to text+1 with no clobbering read after it); bm's skip
    walk past a small trimmed span legitimately strides the whole raw
    read before deciding the tail print (sgrep.c:723-748)."""
    data = {
        "clamped-interior": b"aaa bbb\n" * 2000 + b"q" * 40000
                            + b"\nccc ddd\n" * 2000,
        "pure-run": b"ab" * 40000,
        "run-after-line": b"x\n" + b"ab" * 40000,
        "trimmed-small": b"one hello line\nx zz\n" + b"ab" * 30000
                         + b"\ntail hello\n",
    }[corpus_kind]
    p = tmp_path / "seam.bin"
    p.write_bytes(data)
    compare(flags + ["hello;world", str(p)])
    compare(flags + ["hello", str(p)])


@pytest.mark.parametrize("flags", [["-b"], ["-c"], [], ["-n"]])
def test_mshort_cbo_and_complex_booleans(tmp_path, flags):
    """m_short's text-- drift dies at each block end (CBO re-derived
    from the scan span, newmgrep.c:555), and AComplexBoolean outputs
    fire at the record-crossing check where CurrentByteOffset has
    reached the record end (newmgrep.c:1015-1019)."""
    filler = b"aaa bbb ccc ddd\n" * 2100
    data = (b"x zz one\nx zz two\n" + filler + b"x zz three\nx zz four\n")
    p = tmp_path / "cbo.bin"
    p.write_bytes(data)
    compare(flags + ["x;zz", str(p)])
    compare(flags + ["x,zz;the", str(p)])
    # clamped seam variant + dirty (non-newline) trim grouping
    p2 = tmp_path / "cbo2.bin"
    p2.write_bytes(b"x zz the\n" + b"q" * 40000 + b"\nthe zz x\n"
                   + b"x" * 9000 + b"\nx zz the end\n")
    compare(flags + ["x,zz;the", str(p2)])


@pytest.mark.parametrize("case", ["straddle", "zeroed-match", "cascade"])
@pytest.mark.parametrize("engine", ["sgrep", "sgrep-d1", "mgrep",
                                    "regex", "regex-clamped"])
def test_nul_residue_truncation(tmp_path, engine, case):
    """Every engine's residue carry is strncpy (sgrep.c:470,
    newmgrep.c:560, agrep.c:1430): a NUL in the carried span zero-fills
    the rest of the copy, erasing record bytes -- and any matches --
    past it from the next block's scan."""
    BLK = 32768
    head = b"x" * (BLK - 60 - 1) + b"\n"
    if engine.startswith("regex"):
        gap = 300 if engine == "regex" else 3000
        head = b"y" * (49152 - gap - 1) + b"\n"
        body = {"straddle": b"s " + b"c" * 100 + b"\x00" + b"d" * (gap + 200)
                            + b" theq end\n",
                "zeroed-match": b"s " + b"\x00" + b" theq gone "
                                + b"d" * (gap + 300) + b" end\n",
                "cascade": b"s \x00\x00" + b"c" * (gap + 49152 + 50)
                           + b" theq\n"}[case]
        data = head + body + b"tail theq\n"
        args = ["(theq|zzz)"]
    else:
        body = {"straddle": b"begin " + b"a" * 20 + b"\x00" + b"b" * 80
                            + b" hello word\n",
                "zeroed-match": b"begin " + b"a" * 10 + b"\x00"
                                + b" hello gone " + b"b" * 60 + b" word\n",
                "cascade": b"s \x00" + b"c" * 50 + b" hello "
                           + b"d" * (BLK - 30) + b"\x00q hello word\n"}[case]
        data = head + body + b"final hello word\n"
        args = {"sgrep": ["hello"], "sgrep-d1": ["-1", "hello"],
                "mgrep": ["hello;word"]}[engine]
    p = tmp_path / "nul.bin"
    p.write_bytes(data)
    for extra in ([], ["-c"]):
        compare(extra + args + [str(p)])


@pytest.mark.parametrize("pat", ["hello;tail", "hello,zzz",
                                 "hello,world"])
@pytest.mark.parametrize("flags", [["-c"], [], ["-n"], ["-b"],
                                   ["-c", "-v"]])
@pytest.mark.parametrize("name", ["longline", "megarec", "marked",
                                  "mid"])
def test_clamped_multipattern(corpora, pat, flags, name):
    """mgrep's MAXLINE residue clamp (newmgrep.c:556-562): matches in
    the clobbered spans are lost and records stitch across the hole --
    the virtual-stream replay (_mgrep_virtual_stream) reproduces it."""
    compare(flags + [pat, corpora[name]])
