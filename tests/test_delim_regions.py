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
