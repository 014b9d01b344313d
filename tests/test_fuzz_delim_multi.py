"""Randomized oracle conformance for the -d multi-pattern fast path
(the per-anchor native event pass + replay-safe record jumps added in
round 2): random word corpora crossing the 32KB block grid, random
delimiters -- including delimiters that occur INSIDE pattern terms,
the shape that makes the jump pruning and the skip-walk ambiguity
windows observable."""

import random

import pytest

from .oracle import compare

WORDS = [b"alpha", b"bravo", b"hello", b"charlie", b"matching",
         b"delta", b"koala"]


def _corpus(seed, size):
    r = random.Random(seed)
    out = bytearray()
    while len(out) < size:
        out += b" ".join(r.choice(WORDS)
                         for _ in range(r.randint(3, 9)))[:200]
        out += r.choice([b"\n", b"\n", b"$$\n", b"##", b"o"])
    return bytes(out)


CASES = [
    # (delim, flags, patterns)
    ("$$", ["-c"], "hello,alpha,charlie"),
    ("$$", [], "hello,alpha"),
    ("$$", ["-t", "-c"], "hello,matching"),
    ("o", ["-c"], "hello,alpha"),          # delimiter inside a term
    ("o", ["-b"], "hello,bravo"),          # two terms containing 'o'
    ("ll", ["-c"], "hello,delta"),
    ("##", ["-c", "-w"], "hello,alpha,delta"),
    ("\\n", ["-c"], "hello,alpha,koala"),
]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    d = tmp_path_factory.mktemp("fdm")
    paths = []
    for seed, size in ((1, 9000), (2, 70000), (3, 140000)):
        p = d / ("c%d.txt" % seed)
        p.write_bytes(_corpus(seed, size))
        paths.append(str(p))
    return paths


@pytest.mark.parametrize("case", CASES)
def test_delim_multi_fuzz(corpora, case):
    delim, flags, pats = case
    for path in corpora:
        compare(flags + ["-d", delim, pats, path])


@pytest.mark.parametrize("seed", range(4))
def test_delim_patfile_fuzz(corpora, tmp_path, seed):
    r = random.Random(seed + 50)
    pats = [r.choice(WORDS).decode() for _ in range(6)]
    pats += ["zz%02d" % i for i in range(40)]       # one-pass filter
    pf = tmp_path / ("p%d.txt" % seed)
    pf.write_text("".join(x + "\n" for x in pats))
    delim = r.choice(["$$", "o", "##"])
    for path in corpora:
        compare(["-c", "-d", delim, "-f", str(pf), path])
        compare(["-d", delim, "-f", str(pf), path])
