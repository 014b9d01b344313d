"""Conformance: the monkey1/m_short skip-walk replay for -d scans.

Terms that contain the record delimiter make registration order,
boundary-landing hits, the m_short `text--` resume compensation, the
hit-at-textend block abort, and exact CurrentByteOffset carry all
observable (runtime/mgrep.py walk_region vs newmgrep.c:803-1506)."""

import random

import pytest

from .oracle import compare

F = {}


def _corpus(seed, size=70000):
    r = random.Random(seed)
    out = bytearray()
    words = [b"alpha", b"bravo", b"hello", b"charlie", b"matching"]
    while len(out) < size:
        out += b" ".join(r.choice(words)
                         for _ in range(r.randint(3, 9))) + b"\n"
    return bytes(out)


@pytest.fixture(scope="module", autouse=True)
def corpus(tmp_path_factory, oracle_bin):
    root = tmp_path_factory.mktemp("walk")
    data = {
        "a.txt": (b"hello world\nthe quick brown fox\nHello Again\n"
                  b"helllo typo\npattern matching\n"),
        "d.txt": b"no trailing newline hello",
        "c.txt": b"x\n\n\nyy hello\n" + b"z" * 100 + b"\nend hello\n",
        "big.txt": _corpus(3),
        "dna.txt": (b"xxxx acgtacgtacgtacgtacgt yyyy\n"
                    b"plain line\n"
                    b"zz acgtacgtacgtacgtacgt ww acgtacgtacgtacgtacgt\n"
                    b"acgtacgtacgtacgtacgt end\n"),
    }
    for name, d in data.items():
        p = root / name
        p.write_bytes(d)
        F[name] = str(p)
    yield


CASES = [
    # monkey1 walk: flat AND/OR with self-delimiter terms
    (["-d", "o", "hello;bravo"], "big.txt"),
    (["-c", "-d", "o", "hello;bravo"], "big.txt"),
    (["-d", "o", "hello,alpha"], "big.txt"),
    (["-d", "o", "-v", "hello,alpha"], "big.txt"),
    (["-d", "o", "-b", "hello,alpha"], "big.txt"),
    (["-d", "ll", "hello,alpha"], "big.txt"),
    (["-t", "-d", "ll", "hello,alpha"], "big.txt"),
    # m_short walk (p_size == 1)
    (["-d", "o", "o,nl"], "d.txt"),
    (["-t", "-d", "o", "o,nl"], "d.txt"),
    (["-d", "o", "-b", "o,nl"], "a.txt"),
    (["-d", "o", "-b", "x,y,z"], "a.txt"),
    (["-d", "o", "-q", "o,nl"], "a.txt"),
    (["-d", "o", "-v", "e;o"], "d.txt"),
    (["-d", "o", "-v", "l,t"], "d.txt"),
    (["-d", "o", "-v", "l,t"], "c.txt"),
    (["-d", "o", "-c", "o,n"], "big.txt"),
    (["-d", "l", "a;b"], "a.txt"),
    # monkey4 (DNA) filter-walk emulation
    (["-1", "acgtacgtacgtacgtacgt"], "dna.txt"),
    (["-2", "-b", "acgtacgtacgtacgtacgt"], "dna.txt"),
    (["-2", "-q", "acgtacgtacgtacgtacgt"], "dna.txt"),
    (["-3", "-c", "acgtacgtacgtacgtacgt"], "dna.txt"),
    (["-2", "-v", "acgtacgtacgtacgtacgt"], "dna.txt"),
]


@pytest.mark.parametrize("args,fname", CASES,
                         ids=lambda v: "_".join(v) if isinstance(v, list)
                         else v)
def test_mgrep_walk(args, fname):
    compare(args + [F[fname]])
