"""Equivalence fuzz for the native flat-OR -d count walk
(native/agrep_host.cpp mgrep_or_count_walk): the C replay must count
exactly what the Python walk_region replay counts, across random
corpora that cross the 32KB block grid, random delimiters (including
delimiters inside terms and multi-byte delimiters with -t outtail),
case folding, and word bounds.  A subset is also pinned against the
oracle binary."""

import io
import os
import random

import pytest

from .oracle import ORACLE, compare

WORDS = [b"alpha", b"bravo", b"hello", b"charlie", b"matching",
         b"delta", b"koala", b"oo", b"zebra", b"lima"]


def _corpus(seed, size):
    r = random.Random(seed)
    out = bytearray()
    while len(out) < size:
        out += b" ".join(r.choice(WORDS)
                         for _ in range(r.randint(2, 10)))[:240]
        out += r.choice([b"\n", b"\n", b"$$\n", b"##", b"o", b"%%\n"])
    return bytes(out)


def _run_count(args, native: bool) -> bytes:
    from agrep_tpu.api import fileagrep
    old = os.environ.get("AGREP_TPU_NO_NATIVE_WALK")
    os.environ["AGREP_TPU_NO_NATIVE_WALK"] = "0" if native else "1"
    try:
        buf = io.BytesIO()
        fileagrep(args, output=buf)
        return buf.getvalue()
    finally:
        if old is None:
            os.environ.pop("AGREP_TPU_NO_NATIVE_WALK", None)
        else:
            os.environ["AGREP_TPU_NO_NATIVE_WALK"] = old


@pytest.mark.parametrize("seed", range(8))
def test_native_walk_equivalence_fuzz(tmp_path, seed):
    r = random.Random(seed * 131 + 7)
    size = r.choice([4000, 40000, 90000, 220000])
    path = tmp_path / "c.txt"
    path.write_bytes(_corpus(seed, size))
    pats = [r.choice(WORDS).decode() for _ in range(r.randint(2, 8))]
    pats += ["zz%02d" % i for i in range(r.randint(0, 40))]
    pf = tmp_path / "p.txt"
    pf.write_text("".join(x + "\n" for x in pats))
    delim = r.choice(["$$", "o", "##", "%%", "ll"])
    flags = ["-c", "-d", delim]
    if r.random() < 0.3:
        flags.append("-t")
    if r.random() < 0.3:
        flags.append("-w")
    if r.random() < 0.3:
        flags.append("-i")
    args = flags + ["-f", str(pf), str(path)]
    a = _run_count(args, native=False)
    b = _run_count(args, native=True)
    assert a == b, "native walk diverges for %r\npy: %r\nC:  %r" % (
        args, a, b)


@pytest.mark.parametrize("case", [
    ("$$", ["-c"], 30),
    ("o", ["-c"], 28),          # delimiter inside terms
    ("%%", ["-c", "-t"], 26),   # outtail with 2-byte delimiter
    ("##", ["-c", "-w"], 30),
])
def test_native_walk_oracle(tmp_path, case):
    if not os.path.exists(ORACLE):
        pytest.skip("oracle not built")
    delim, flags, npat = case
    path = tmp_path / "c.txt"
    path.write_bytes(_corpus(99, 150000))
    r = random.Random(3)
    pats = ([r.choice(WORDS).decode() for _ in range(6)]
            + ["qq%02d" % i for i in range(npat - 6)])
    pf = tmp_path / "p.txt"
    pf.write_text("".join(x + "\n" for x in pats))
    compare(flags + ["-d", delim, "-f", str(pf), str(path)])
