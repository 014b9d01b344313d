"""Regex lanes Pallas kernel: interpret-mode equivalence vs the numpy
runner, and kernel-path CLI conformance vs the oracle.

The kernel (ops/renfa_kernel.py) is the TPU production path for the
regex-with-errors engine; these tests run the identical kernel body
through the Pallas interpreter on CPU (the same discipline as
tests/test_pallas_kernel.py for the bitap kernel).
"""

import numpy as np
import pytest

from agrep_tpu.compile.query import compile_query
from agrep_tpu.options import Options
from agrep_tpu.ops import renfa
from agrep_tpu.ops.renfa_kernel import pallas_scan_records

from .oracle import run_oracle, run_ours

PATTERNS = [
    ("ab*c", 0),
    ("a(bc|de)f", 1),
    ("[a-d]x*[0-9]", 1),
    ("ab*c", 2),
    ("x.*y", 1),
    ("wo(r|t)king", 2),
]


def _mc(pattern, d):
    opts = Options(D=d, approx=d > 0)
    q = compile_query(pattern, opts)
    assert q.engine_class == "regex"
    return q.re_mc


@pytest.mark.parametrize("pattern,d", PATTERNS)
def test_kernel_matches_numpy_runner(pattern, d):
    mc = _mc(pattern, d)
    rng = np.random.default_rng(hash((pattern, d)) & 0xFFFF)
    alpha = b"abcdefxy0189 \t"
    R, L = 23, 32
    lanes = np.zeros((R, L), dtype=np.uint8)
    lens = np.empty(R, dtype=np.int64)
    for r in range(R):
        n = int(rng.integers(1, L - 1))
        lanes[r, :n] = np.frombuffer(
            bytes(alpha[i] for i in rng.integers(0, len(alpha), n)),
            dtype=np.uint8)
        lanes[r, n] = 0x0A
        lens[r] = n
    # plant likely matches
    for r, s in ((0, b"abbbc"), (1, b"adef"), (2, b"ax3"), (3, b"xqqy")):
        m = min(len(s), L - 2)
        lanes[r, :m] = np.frombuffer(s[:m], dtype=np.uint8)

    cs = mc["inits"]
    want = renfa._scan_records_np(lanes, lens, mc, cs, cs)
    got = pallas_scan_records(lanes, lens, mc, interpret=True)
    assert got is not None
    assert np.array_equal(got, want), (pattern, d)


def test_kernel_cli_conformance(tmp_path):
    """Full CLI through the interpret backend (kernel path) vs oracle."""
    corpus = tmp_path / "c.txt"
    lines = ["the quick brown fox", "a fine abc here", "abbbc matches",
             "nothing", "worming along", "working hard", "x123y",
             "last line no newline"]
    corpus.write_text("\n".join(lines) + "\n")
    for args in (["-1", "ab*c"], ["-2", "-c", "wor..ng"],
                 ["-1", "-n", "x.*y"]):
        o_out, _, o_rc = run_oracle(args + [str(corpus)])
        m_out, _, m_rc = run_ours(args + [str(corpus)],
                                  backend="interpret")
        assert m_out == o_out, args
        assert m_rc == o_rc, args
