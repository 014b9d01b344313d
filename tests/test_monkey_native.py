"""Native C twins of the a_monkey/monkey4 filter walks must be
byte-for-byte equivalent to the pure-Python emulation loops in
runtime/sgrep_sim.py (which are themselves oracle-pinned by the
conformance suite).  sgrep.c:1839-2068 (a_monkey), :2221-2480
(monkey4)."""

import numpy as np
import pytest

import agrep_tpu.native as native
from agrep_tpu.runtime import sgrep_sim


def _python_only(fn_name, *args):
    real_a, real_4 = native.a_monkey_block, native.monkey4_block
    native.a_monkey_block = lambda *a, **k: None
    native.monkey4_block = lambda *a, **k: None
    try:
        return getattr(sgrep_sim, fn_name)(*args)
    finally:
        native.a_monkey_block = real_a
        native.monkey4_block = real_4


@pytest.mark.skipif(native.get_lib() is None,
                    reason="native library unavailable")
@pytest.mark.parametrize("fn", ["a_monkey_scan", "monkey4_scan"])
@pytest.mark.parametrize("seed", range(12))
def test_native_walk_equals_python(fn, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(200, 60000))
    alpha = b"abcdefgh \n" if seed % 2 == 0 else b"acgtACGT\n"
    data = np.frombuffer(
        bytes(alpha[i] for i in rng.integers(0, len(alpha), n)),
        dtype=np.uint8).copy()
    plen = int(rng.integers(18, 40))
    pat = bytes(alpha[i] for i in
                rng.integers(0, len(alpha) - 1, plen)).replace(b"\n",
                                                               b"a")
    for _ in range(3):
        off = int(rng.integers(0, max(1, n - plen)))
        data[off:off + plen] = np.frombuffer(pat, dtype=np.uint8)
    D = int(rng.integers(1, 5))
    delim = bool(rng.integers(0, 2))
    dpat = b"xx" if delim else b"\n"
    got = getattr(sgrep_sim, fn)(data, pat, D, delim, dpat)
    want = _python_only(fn, data, pat, D, delim, dpat)
    got_m = [list(map(int, x)) for x in got[0]]
    want_m = [list(map(int, x)) for x in want[0]]
    assert got_m == want_m
    assert got[1] == want[1]
