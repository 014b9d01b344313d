"""Randomized conformance fuzzing vs the reference binary.

Random corpora x random patterns x random flag sets, asserting
byte-identical stdout and exit codes.  Areas documented as divergent
(docs/CONFORMANCE.md) are excluded from generation.
"""

import os
import random

import pytest

from .oracle import run_oracle, run_ours

WORDS = ("alpha beta gamma delta hello world fox jumps matching pattern "
         "lorem ipsum grep search quick brown").split()


def _mk_text(rng, path, n_lines=60, long_lines=False):
    lines = []
    for _ in range(n_lines):
        k = rng.randint(0, 10 if long_lines else 6)
        lines.append(" ".join(rng.choice(WORDS) for _ in range(k)))
    data = "\n".join(lines)
    if rng.random() < 0.8:
        data += "\n"
    with open(path, "w") as f:
        f.write(data)


def _mutate(rng, word):
    w = list(word)
    op = rng.random()
    if not w:
        return word
    i = rng.randrange(len(w))
    if op < 0.4:
        w[i] = rng.choice("abcdefghijklmnop")
    elif op < 0.7:
        del w[i]
    else:
        w.insert(i, rng.choice("abcdefghijklmnop"))
    return "".join(w)


FLAG_POOL = [[], ["-c"], ["-n"], ["-i"], ["-v"], ["-b"], ["-w"],
             ["-c", "-v"], ["-h"], ["-i", "-c"], ["-n", "-b"],
             ["-x"], ["-l"], ["-w", "-c"], ["-A", "-n"], ["-G"],
             ["-u"], ["-x", "-c"], ["-v", "-n"], ["-i", "-w"]]


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_simple(tmp_path, oracle_bin, seed):
    rng = random.Random(1000 + seed)
    path = str(tmp_path / "t.txt")
    _mk_text(rng, path)
    for trial in range(6):
        word = rng.choice(WORDS)
        if rng.random() < 0.5:
            word = _mutate(rng, word)
        flags = list(rng.choice(FLAG_POOL))
        D = rng.choice([0, 0, 1, 2, 3])
        if D and len(word) > D:
            flags = ["-%d" % D] + flags
        args = flags + [word, path]
        o = run_oracle(args)
        m = run_ours(args)
        assert m[0] == o[0] and m[2] == o[2], (
            "fuzz mismatch seed=%d args=%r\noracle=%r\nours=%r"
            % (seed, args, o[0][:400], m[0][:400]))


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_regex(tmp_path, oracle_bin, seed):
    rng = random.Random(2000 + seed)
    path = str(tmp_path / "t.txt")
    _mk_text(rng, path)
    pieces = ["he", "lo", "wor", "ma", "[a-f]", "[lmn]", "."]
    for trial in range(4):
        n = rng.randint(2, 4)
        pat = ""
        for _ in range(n):
            p = rng.choice(pieces)
            if rng.random() < 0.3:
                p += "*" if rng.random() < 0.5 else "?"
            pat += p
        if "*" not in pat and "|" not in pat:
            pat += "|" + rng.choice(["fox", "grep"])
        D = rng.choice([0, 0, 1, 2])
        flags = (["-%d" % D] if D else []) + \
            list(rng.choice([[], ["-c"], ["-n"], ["-v"]]))
        args = flags + [pat, path]
        o = run_oracle(args)
        m = run_ours(args)
        assert m[0] == o[0] and m[2] == o[2], (
            "fuzz regex mismatch seed=%d args=%r\noracle=%r\nours=%r"
            % (seed, args, o[0][:400], m[0][:400]))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_multiblock(tmp_path, oracle_bin, seed):
    """Files crossing the 32KB sgrep / 48KB bitap block boundaries."""
    rng = random.Random(3000 + seed)
    path = str(tmp_path / "big.txt")
    _mk_text(rng, path, n_lines=4000, long_lines=True)
    assert os.path.getsize(path) > 2 * 16384
    for args in ([rng.choice(WORDS), path],
                 ["-c", rng.choice(WORDS), path],
                 ["-1", "-c", rng.choice(WORDS), path],
                 ["-n", rng.choice(WORDS), path]):
        o = run_oracle(args)
        m = run_ours(args)
        assert m[0] == o[0] and m[2] == o[2], (
            "multiblock mismatch args=%r" % (args,))


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_degenerate_m_eq_d1(tmp_path, oracle_bin, seed):
    """m = D+1 fragment-length-1 patterns: the partition engine's
    per-round machine resets, pair-unroll overrun re-counts, and
    block-boundary partial record prints (sgrep.c:1166-1238) -- served
    by the exact round-machine replay (sgrep_sim.agrep_exact)."""
    rng = random.Random(4000 + seed)
    path = str(tmp_path / "d.txt")
    _mk_text(rng, path, n_lines=3000, long_lines=True)
    for pat in ("ab", "foo", "hello"):
        D = len(pat) - 1
        for flags in ([], ["-c"], ["-b"], ["-v"], ["-q"], ["-c", "-v"]):
            args = ["-%d" % D] + flags + [pat, path]
            o = run_oracle(args)
            m = run_ours(args)
            assert m[0] == o[0] and m[2] == o[2], (
                "degenerate mismatch seed=%d args=%r" % (seed, args))
