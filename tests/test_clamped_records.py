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
