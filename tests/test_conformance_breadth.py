"""Conformance breadth: -CP codepages, high error counts (-5..-8),
-p supersequence, and -G/-A output combos (VERDICT round-1 item #7).

Patterns here are latin-1 strings; tests/oracle.py encodes argv as
latin-1 bytes, so high-byte codepage characters reach both binaries
exactly as the reference expects.
"""

import pytest

from .oracle import compare

ISO_TEXT = ("Gr\xfcn ist die Heide\n"        # u-umlaut
            "GR\xdcN war alles\n"
            "\xfcbel die \xdcbel\n"
            "caf\xe9 ol\xe9\n"
            "na\xefve N\xe4ive\n"
            "plain ascii line\n")


@pytest.fixture(scope="module")
def iso_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("cp") / "iso.txt"
    p.write_bytes(ISO_TEXT.encode("latin-1"))
    return str(p)


@pytest.mark.parametrize("args", [
    ["-i", "-CP850", "gr\xfcn"],
    ["-i", "-CP437", "gr\xfcn"],
    ["-i", "-CP8859", "gr\xfcn"],
    ["-i", "-CP850", "-c", "GR\xdcN"],
    ["-i", "-CP437", "-c", "\xdcbel"],
    ["-i", "-CP8859", "\xfcBEL"],
    ["-ia", "caf\xe9"],
    ["-ia", "-CP850", "cafe"],
    ["-i#", "-CP850", "na\xefve"],
    ["-i0", "GR\xdcN"],
    ["-1", "-i", "-CP850", "gr\xfcm"],
])
def test_codepage_folds(iso_file, args):
    compare(args + [iso_file])


@pytest.fixture(scope="module")
def text_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("hi") / "t.txt"
    p.write_text("hello world\nabcdefghijk xyz\n"
                 "abXdeYghiZk q\naaaaaaa\nshort\n")
    return str(p)


@pytest.mark.parametrize("args", [
    ["-5", "-c", "abcdefghijk"],
    ["-5", "abXdeYghiZQ"],          # 5 errors from a 11-char pattern
    ["-6", "-c", "abcdefghijk"],
    ["-7", "-c", "abcdefghijkxx"],
    ["-8", "-c", "abcdefghijkxxx"],
    ["-8", "-n", "abcdefghijkxxx"],
])
def test_high_error_counts(text_file, args):
    compare(args + [text_file])


@pytest.fixture(scope="module")
def super_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("sup") / "s.txt"
    p.write_text("A Company that Manufactures Everything\n"
                 "acme inc\nnothing here\nA C M E\nAxCxMxE trailer\n")
    return str(p)


@pytest.mark.parametrize("args", [
    ["-p", "ACME"],
    ["-p", "-c", "ACME"],
    ["-p", "-i", "acme"],
    ["-p", "-n", "ACME"],
    ["-p", "-v", "-c", "ACME"],
])
def test_supersequence(super_file, args):
    compare(args + [super_file])


@pytest.fixture(scope="module")
def two_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("ga")
    a = d / "a.txt"
    b = d / "b.txt"
    a.write_text("hello one\nmiss\nhello two\n")
    b.write_text("nothing\nhello three\n")
    return [str(a), str(b)]


@pytest.mark.parametrize("args", [
    ["-G"], ["-A"], ["-G", "-A"], ["-A", "-c"], ["-A", "-n"],
    ["-G", "-c"], ["-A", "-v", "-c"],
    ["-O"], ["-O", "-A"], ["-O", "-n"], ["-G", "-O"], ["-M"],
])
def test_G_A_O_combos(two_files, args):
    compare(args + ["hello"] + two_files)


@pytest.mark.parametrize("args", [
    ["-V4", "-c"],
    ["-V5", "-i", "-c"],
    ["-V5", "-ia"],
    ["-V5", "-CP850", "-i#", "-c"],
    ["-V5", "-CP437", "-c"],
    ["-V4", "-CP999", "-c"],
])
def test_verbose_lut_dump(two_files, args):
    """-V4 codepage warning (agrep.c:2754) and the -V5 256-line
    translation-table dump (agrep.c:2794-2818), byte-exact."""
    compare(args + ["hello", two_files[0]])
