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
