"""Chain kernel (ops/chain_kernel.py) vs a naive numpy oracle.

Runs the production kernel body through the Pallas interpreter on CPU
(same discipline as tests/test_pallas_kernel.py); the real-hardware
run is gated by bench.py's conformance section.
"""

import numpy as np
import pytest

from agrep_tpu.ops import chain_kernel as CK


def naive_starts(stream: np.ndarray, terms, tr) -> np.ndarray:
    folded = tr[stream]
    hits = np.zeros(len(stream), dtype=bool)
    for t in terms:
        if not t:
            continue
        tf = tr[np.frombuffer(t, dtype=np.uint8)]
        L = len(tf)
        if L > len(stream):
            continue
        m = np.ones(len(stream) - L + 1, dtype=bool)
        for k in range(L):
            m &= folded[k:len(stream) - L + 1 + k] == tf[k]
        hits[:len(m)] |= m
    return np.flatnonzero(hits).astype(np.int64)


def ident_tr():
    return np.arange(256, dtype=np.uint8)


def fold_tr():
    tr = np.arange(256, dtype=np.uint8)
    for c in range(ord("A"), ord("Z") + 1):
        tr[c] = c + 32
    return tr


def run_kernel(stream, terms, tr):
    prog = CK.compile_chain(terms, tr)
    assert prog is not None
    return CK.chain_match_starts(stream, prog, interpret=True)


def test_cube_cover_singleton():
    assert CK._cube_cover(frozenset([0x61])) == ((0xFF, 0x61),)


def test_cube_cover_case_pair():
    cubes = CK._cube_cover(frozenset([0x41, 0x61]))
    assert cubes == ((0xDF, 0x41),)


def test_cube_cover_digit_range():
    cubes = CK._cube_cover(frozenset(range(0x30, 0x3A)))
    got = set()
    for mask, val in cubes:
        for v in range(256):
            if (v & mask) == val:
                got.add(v)
    assert got == set(range(0x30, 0x3A))


def test_small_text_exact():
    rng = np.random.default_rng(0)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps"]
    stream = b" ".join(words[i] for i in rng.integers(0, 5, 400))
    stream = np.frombuffer(stream, dtype=np.uint8)
    terms = [b"quick", b"fox", b"jumps over", b"q"]
    got = run_kernel(stream, terms, ident_tr())
    want = naive_starts(stream, terms, ident_tr())
    assert np.array_equal(got, want)
    assert len(want) > 0


def test_case_folded():
    stream = np.frombuffer(b"The QUICK brown the thE fox Quick ",
                           dtype=np.uint8)
    terms = [b"the", b"quick"]
    tr = fold_tr()
    got = run_kernel(stream, terms, tr)
    want = naive_starts(stream, terms, tr)
    assert np.array_equal(got, want)
    assert len(want) == 5


def test_lane_boundary_matches():
    """Matches straddling the 4096-byte lane boundary ride the tail
    halo; plant terms across every lane edge of a 3-lane stream."""
    L = CK.LANE_BODY
    n = 3 * L + 100
    stream = np.full(n, ord("x"), dtype=np.uint8)
    term = b"boundary_term_123456789012345"    # 29 bytes (max-ish)
    for edge in (L, 2 * L, 3 * L):
        for off in range(-len(term), 1, 7):
            s = edge + off
            if 0 <= s and s + len(term) <= n:
                stream[s:s + len(term)] = np.frombuffer(term, np.uint8)
    terms = [term, b"zz"]
    got = run_kernel(stream, terms, ident_tr())
    want = naive_starts(stream, terms, ident_tr())
    assert np.array_equal(got, want)
    assert len(want) > 0


def test_full_byte_range():
    rng = np.random.default_rng(3)
    stream = rng.integers(0, 256, 20000).astype(np.uint8)
    terms = [bytes(stream[100:103]), bytes(stream[5000:5009]),
             b"\x00\xff", bytes([10, 10])]
    got = run_kernel(stream, terms, ident_tr())
    want = naive_starts(stream, terms, ident_tr())
    assert np.array_equal(got, want)
    assert len(want) > 0


def test_hundred_terms():
    rng = np.random.default_rng(7)
    vocab = [bytes(rng.integers(97, 123, int(rng.integers(3, 12)))
                   .astype(np.uint8)) for _ in range(100)]
    stream = b" ".join(vocab[i] for i in rng.integers(0, 100, 3000))
    stream = np.frombuffer(stream, dtype=np.uint8)
    prog = CK.compile_chain(vocab, ident_tr())
    assert prog is not None
    got = CK.chain_match_starts(stream, prog, interpret=True)
    want = naive_starts(stream, vocab, ident_tr())
    assert np.array_equal(got, want)


def test_compile_rejects_oversize():
    tr = ident_tr()
    # round 5: multi-word chains accept terms to 128 bytes
    assert CK.compile_chain([b"x" * 32], tr) is not None
    assert CK.compile_chain([b"x" * 128], tr) is not None
    assert CK.compile_chain([b"x" * 129], tr) is None
    many = [bytes([97 + (i % 26)]) * 30 for i in range(100)]
    assert CK.compile_chain(many, tr) is None   # 3000 positions


def test_empty_and_tail_clamp():
    stream = np.frombuffer(b"abcab", dtype=np.uint8)
    terms = [b"ab", b"cab"]
    got = run_kernel(stream, terms, ident_tr())
    want = naive_starts(stream, terms, ident_tr())
    assert np.array_equal(got, want)
    assert 3 in want and 2 in want


@pytest.mark.parametrize("nbytes", [31, 32, 33, 4095, 4096, 4097])
def test_stream_length_edges(nbytes):
    rng = np.random.default_rng(nbytes)
    stream = rng.choice(
        np.frombuffer(b"abc \n", dtype=np.uint8), nbytes)
    terms = [b"ab", b"c a", b"\na"]
    got = run_kernel(stream, terms, ident_tr())
    want = naive_starts(stream, terms, ident_tr())
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------
# Engine integration: the chain kernel as the one-pass -f scan
# ---------------------------------------------------------------------

def test_chain_feeds_qgram_occurrences():
    """Exact chain starts passed as cand_anchor_rel must reproduce the
    dense host filter's occurrence table bit-for-bit."""
    from agrep_tpu.compile.multi import (build_qgram_tables,
                                         qgram_occurrences)
    rng = np.random.default_rng(13)
    alpha = b"abcdefgh \n"
    terms = []
    for _ in range(40):
        L = int(rng.integers(2, 9))
        terms.append(bytes(alpha[i] for i in rng.integers(0, 8, L)))
    stream = np.frombuffer(
        bytes(alpha[i] for i in rng.integers(0, len(alpha), 120000)),
        dtype=np.uint8).copy()
    for t in terms[:10]:
        off = int(rng.integers(0, len(stream) - len(t)))
        stream[off:off + len(t)] = np.frombuffer(t, dtype=np.uint8)
    tr = ident_tr()
    tb = build_qgram_tables(terms, tr)
    prog = CK.compile_chain(terms, tr)
    assert prog is not None
    starts = CK.chain_match_starts(stream, prog, interpret=True)
    got = qgram_occurrences(stream, terms, tr, tb,
                            cand_anchor_rel=starts)
    want = qgram_occurrences(stream, terms, tr, tb)
    for i in range(len(terms)):
        assert np.array_equal(got[i], want[i]), (i, terms[i])


def test_chain_cli_count_and_print(tmp_path):
    """Full -f CLI via the interpret backend (chain kernel drives the
    count fast path and the occurrence path) vs the oracle binary."""
    import random
    from .oracle import run_oracle, run_ours
    corpus = tmp_path / "c.txt"
    rnd = random.Random(23)
    words = ["alpha", "beta", "kernel", "device", "zeta", "engine",
             "gamma", "delta"]
    with open(corpus, "w") as f:
        for _ in range(4000):
            f.write(" ".join(rnd.choices(words,
                                         k=rnd.randint(3, 8))) + "\n")
    pats = [rnd.choice(words) for _ in range(20)]
    pats += ["qx" + rnd.choice(words) + str(i) for i in range(20)]
    pf = tmp_path / "p.txt"
    pf.write_text("".join(p + "\n" for p in pats))
    for args in (["-c", "-f", str(pf), str(corpus)],
                 ["-n", "-f", str(pf), str(corpus)],
                 ["-c", "-w", "-f", str(pf), str(corpus)]):
        o_out, _, o_rc = run_oracle(args)
        m_out, _, m_rc = run_ours(args, backend="interpret")
        assert (m_out, m_rc) == (o_out, o_rc), args


def test_device_route_small_term_set(tmp_path, monkeypatch):
    """Round 5: the device chain route engages for ANY term count
    (ONE_PASS_MIN applies only to the host pruning paths) behind the
    corpus-placement gate; interpret mode opts in via
    AGREP_TPU_DEVICE_ROUTE=1."""
    import io
    import subprocess

    import numpy as np

    from agrep_tpu.api import fileagrep
    from agrep_tpu.ops import scan as scan_ops
    from tests.oracle import ORACLE

    monkeypatch.setenv("AGREP_TPU_DEVICE_ROUTE", "1")
    old = scan_ops._BACKEND
    scan_ops.set_backend("interpret")
    try:
        corpus = (b"alpha bravo words\nhello zebra\n" * 3000)
        p = tmp_path / "c.txt"
        p.write_bytes(corpus)
        pf = tmp_path / "p.txt"
        pf.write_text("hello\nzebra\nalpha\n")     # 3 terms < 24
        ref = subprocess.run(
            [ORACLE, "-c", "-f", str(pf), str(p)],
            capture_output=True).stdout
        buf = io.BytesIO()
        fileagrep(["-c", "-f", str(pf), str(p)], output=buf)
        assert buf.getvalue() == ref
        # long multi-word term through the same route
        pf2 = tmp_path / "p2.txt"
        longt = "alpha bravo words\nhello zebra\nalpha bravo"[:40]
        pf2.write_text(longt.replace("\n", " ") + "\nnosuch\n")
        ref2 = subprocess.run(
            [ORACLE, "-c", "-f", str(pf2), str(p)],
            capture_output=True).stdout
        buf2 = io.BytesIO()
        fileagrep(["-c", "-f", str(pf2), str(p)], output=buf2)
        assert buf2.getvalue() == ref2
    finally:
        scan_ops.set_backend(old)
