"""Conformance: -x whole-line span quirks and the -B prompt paths.

Pins the behaviors characterized against the oracle:
  * -x match spans run through the FOLLOWING record (the wrapped
    pattern's trailing \n is the match's last char; bm:757-758 /
    monkey:1597-1599 then scan forward from text+1);
  * monkey (m>20) lacks bm's EOF adjustment (sgrep.c:786-789): it
    truncates a final line without \n and reads the sentinel pattern
    copy on a last-byte match (extra blank line when pat ends in \n);
  * ^/$ anchors become literal \n bytes in sgrep patterns and must
    match across newlines (no \n state reset at D == 0);
  * -B counting accumulates across every (D, file) scan, escalates
    until the LAST file has a hit, prompts on stderr, and keeps the
    accumulated count as Grand Total/exit code on 'n'/EOF;
  * -B with -w/-x/-v re-runs preprocess() on the preprocessed pattern
    (agrep.c:3584-3588), so its rescans can never match.
"""

import os

import pytest

from .oracle import compare

FILES = {
    "f1.txt": (b"hello world\nthe quick brown fox\n"
               b"jumps over the lazy dog\nHello Again\n"
               b"pattern matching with agrep\nhelllo typo line\n"
               b"approximate string search\n"),
    "t3.txt": b"one\ntwo\nthree\n",
    "ne.txt": b"no newline at eof",
    "m2.txt": b"second\nthe very last long line here23\n",
    "m3.txt": b"the very last long line no newline2",
    "m5.txt": b"abc\nthe very long line here no newlineX",
    "m6.txt": b"abc\nshort line no newlineX",
    "bm1.txt": b"helo here\n",
    "bm2.txt": b"nothing relevant\n",
    "bm3.txt": b"heo two errors\n",
    "v3.txt": b"aa\nbb\ncc\n",
}

F = {}


@pytest.fixture(scope="module", autouse=True)
def corpus(tmp_path_factory, oracle_bin):
    root = tmp_path_factory.mktemp("xb")
    for name, data in FILES.items():
        p = root / name
        p.write_bytes(data)
        F[name] = str(p)
    yield


XCASES = [
    (["-x", "hello world"], "f1.txt"),
    (["-x", "Hello Again"], "f1.txt"),
    (["-x", "approximate string search"], "f1.txt"),  # monkey, EOF \n
    (["-x", "no newline at eof"], "ne.txt"),          # no match
    (["-x", "two"], "t3.txt"),
    (["-x", "one"], "t3.txt"),
    (["-x", "three"], "t3.txt"),                      # bm EOF clamp
    (["-x", "the very last long line here23"], "m2.txt"),
    (["-x", "the very last long line no newline2"], "m3.txt"),
    (["long line no newline2"], "m3.txt"),            # monkey, no append
    (["the very long line here no"], "m5.txt"),       # monkey truncation
    (["short line"], "m6.txt"),                       # bm appends \n
    (["^hello"], "f1.txt"),
    (["hello$"], "f1.txt"),
    (["search$"], "f1.txt"),
    (["-c", "hello$"], "f1.txt"),
    (["-x", "hello"], "f1.txt"),
]


@pytest.mark.parametrize("args,fname", XCASES,
                         ids=lambda v: "_".join(v) if isinstance(v, list)
                         else v)
def test_wholeline_and_anchors(args, fname):
    compare(args + [F[fname]])


BCASES = [
    ["-B", "helo", "f1.txt"],
    ["-B", "-y", "helo", "f1.txt"],
    ["-B", "hello", "bm1.txt", "bm2.txt"],   # escalate past 1st-file hit
    ["-B", "hello", "bm2.txt", "bm1.txt"],
    ["-B", "hello", "bm1.txt", "bm3.txt"],
    ["-B", "hello", "bm3.txt", "bm1.txt"],
    ["-B", "-y", "hello", "bm1.txt", "bm2.txt"],
    ["-B", "-w", "helo", "f1.txt"],          # corrupted re-preprocess
    ["-B", "-w", "-y", "helo", "f1.txt"],
    ["-B", "-x", "hellx", "f1.txt"],
    ["-B", "-x", "hello world", "f1.txt"],   # D=0 pass hits, no loop
    ["-B", "-v", "helo", "f1.txt"],
    ["-B", "-v", "a", "v3.txt"],
]


@pytest.mark.parametrize("args", BCASES, ids=lambda a: "_".join(a))
def test_bestmatch_paths(args):
    full = [a if a not in FILES else F[a] for a in args]
    compare(full)
