"""Conformance: -d block-trim region semantics at EOF and boundaries.

Pins the behaviors characterized against the oracle:
  * sgrep/mgrep cut each block back to the last complete delimiter in
    its RAW data (sgrep.c:393-399 / newmgrep.c:503-507); the residue
    is rescanned at EOF only when >1 byte;
  * matches straddling the trim are seen by neither scan (sgrep adds
    a start++ to its residue copy; mgrep keeps the duplicate byte);
  * mgrep overwrites every block's first D_length bytes with the
    delimiter (newmgrep.c:511-512) and appends one delimiter after the
    EOF residue, of which records/INVERSE print exactly one byte;
  * record extraction is bounded by the scan region the hit fell into;
  * the regex engines' (re/re1) D>0 loop updates CurrentByteOffset
    once per unrolled byte-pair, lagging -b/-q offsets by one on
    even data offsets.
"""

import pytest

from .oracle import compare

FILES = {
    "a.txt": (b"hello world\nthe quick brown fox\nHello Again\n"
              b"helllo typo\npattern matching\n"),
    "c.txt": b"x\n\n\nyy hello\n" + b"z" * 100 + b"\nend hello\n",
    "d.txt": b"no trailing newline hello",
    "f.txt": b"o" + b"data first byte delim\nhello o mid\nlast bit",
    "g2.txt": b"Xaaaa bbbb\ncccc dddd\n",
    "e3.txt": (b"one hello\n" + b"filler line with ooo\n" * 2000
               + b"tail hello no nl"),
}

F = {}


@pytest.fixture(scope="module", autouse=True)
def corpus(tmp_path_factory, oracle_bin):
    root = tmp_path_factory.mktemp("dreg")
    for name, data in FILES.items():
        p = root / name
        p.write_bytes(data)
        F[name] = str(p)
    yield


CASES = [
    # sgrep -d trims
    (["-d", "ll", "hello"], ["d.txt"]),
    (["-d", "ll", "hello"], ["c.txt"]),
    (["-d", "ll", "hello"], ["a.txt"]),
    (["-v", "-d", "o", "hello"], ["a.txt"]),
    (["-v", "-d", "ll", "hello"], ["c.txt"]),
    # mgrep -d trims / overwrites / appended delimiter
    (["-t", "-d", "o", "alpha;delta"], ["a.txt"]),
    (["-t", "-d", "X", "aaaa;dddd"], ["g2.txt"]),
    (["-d", "X", "aaaa;dddd"], ["g2.txt"]),
    (["-t", "-d", "ll", "hello,fox,delta"], ["f.txt"]),
    (["-v", "-d", "ll", "hello,fox,delta"], ["c.txt"]),
    (["-v", "-d", "o", "hello,fox,ooo"], ["d.txt"]),
    (["-t", "-d", "o", "hello,fox,ooo"], ["a.txt", "d.txt"]),
    (["-v", "hello,world"], ["a.txt", "d.txt"]),
    (["-d", "oo", "hello,world"], ["e3.txt"]),
    (["-t", "-d", "oo", "hello,world"], ["e3.txt"]),
    (["-v", "-d", "ll", "alpha,delta"], ["e3.txt"]),
    # regex CBO parity
    (["-b", "-2", "hel*o"], ["e3.txt"]),
    (["-q", "-1", "hel*o"], ["c.txt"]),
    (["-b", "hel*o"], ["c.txt"]),
    # count fast paths
    (["-c", "hello"], ["e3.txt"]),
    (["-1", "-c", "hello"], ["e3.txt"]),
    (["-2", "-c", "hello"], ["e3.txt"]),
]


@pytest.mark.parametrize("args,files", CASES,
                         ids=lambda v: "_".join(v))
def test_delim_regions(args, files):
    compare(args + [F[f] for f in files])


RUN_CASES = [
    b"aaa alpha bbb\n\nccc ddd\n",
    b"aaa alpha bbb\n\n\n\nccc ddd\n",          # 4-newline run at trim
    b"aaa alpha bbb\n\n\nccc ddd\n",            # 3-run
    b"qq\n\naaa alpha bbb\n\n\n\nccc ddd\n\nee\n",
    b"aaa alpha bbb\n\n\n\nccc alpha ddd\n\nee\n",
    b"qq\n\n\n\naaa alpha bbb\n\nee\n",          # leading run
    b"alpha\n\n\n\n\n\nalpha\n",                 # 6-run between matches
    b"aaa alpha bbb",                            # no delimiter at all
    b"\n\naaa alpha\n\n",
]


@pytest.mark.parametrize("flags", [
    [], ["-b"], ["-c"], ["-n"], ["-t"], ["-v"], ["-v", "-c"],
    ["-t", "-v"], ["-v", "-n"],
])
@pytest.mark.parametrize("ci", range(len(RUN_CASES)))
def test_delimiter_runs(tmp_path, flags, ci):
    """Overlapping delimiter occurrences (newline RUNS under paragraph
    mode): forward_delimiter's range stops AT a trimmed block's last
    byte (delim.c:64 curbegin+len <= end), so a delimiter overlapping
    the trim is not found and the record absorbs the run's leading
    bytes; bm's post-match skip loop can then land past textend and
    early-return, dropping the INVERSE tail (sgrep.c:746-748)."""
    p = tmp_path / ("run%d.txt" % ci)
    p.write_bytes(RUN_CASES[ci])
    compare(["-d", "$$"] + flags + ["alpha", str(p)])
