"""Production-kernel correctness tests (VERDICT round 1, item 1).

The Pallas kernel (ops/kernels.py) is the TPU production path; the rest
of the suite runs on the numpy/XLA backends.  These tests run the SAME
kernel body through the Pallas interpreter on CPU (interpret=True, no
Mosaic) and assert its packed event planes are bit-identical to the
numpy backend over randomized corpora, for every kernel shape class:
variant x D x single/multi-part endpos x delimiters x case folds.

A kernel-path regression now fails CI instead of shipping silently.
"""

from __future__ import annotations

import numpy as np
import pytest

from agrep_tpu.options import Options
from agrep_tpu.compile.query import compile_query
from agrep_tpu.ops import scan as scan_ops


def _corpus(rng, n, plants=(), nl_every=61, delim=None):
    """Random printable bytes + newline structure + planted strings."""
    text = rng.integers(32, 127, size=n, dtype=np.uint8)
    text[::nl_every] = 0x0A
    if delim:
        d = np.frombuffer(delim, dtype=np.uint8)
        for off in rng.integers(0, max(1, n - len(d)), 13):
            text[off:off + len(d)] = d
    for p in plants:
        pb = np.frombuffer(p, dtype=np.uint8)
        for off in rng.integers(0, max(1, n - len(pb)), 17):
            text[off:off + len(pb)] = pb
    return text


def _events_both(text, mask, consts, D, variant):
    """Scan once through the interpret-mode Pallas kernel and once on
    the numpy oracle backend; return (kernel_events, numpy_events)."""
    old = scan_ops._BACKEND
    try:
        scan_ops.set_backend("interpret")
        ev_k = scan_ops.scan_events(text, mask, consts, D, variant)
        scan_ops.set_backend("numpy")
        ev_n = scan_ops.scan_events(text, mask, consts, D, variant)
    finally:
        scan_ops.set_backend(old)
    return ev_k, ev_n


def _assert_kernel_used(text, mask, consts, D, variant):
    """The interpret path must actually take the kernel (not fall back
    to lax.scan): _try_pallas returns non-None."""
    W = min(max(consts.get("m", 32) + D + 2, 48), 1024)
    out = scan_ops._try_pallas(text, mask, consts, D, W, 1024,
                               len(text), variant, None, interpret=True)
    assert out is not None, "kernel path not taken -- test is vacuous"


CASES = [
    # (pattern, opts, D, sizes)
    ("matching", Options(D=2, approx=True, linenum=True), 2,
     [3000, 5003]),
    ("hello", Options(linenum=True), 0, [2500]),
    ("wor[kd]s", Options(D=1, approx=True, linenum=True), 1, [4096]),
]


@pytest.mark.parametrize("pattern,opts,D,sizes", CASES)
def test_bitap_kernel_matches_numpy(pattern, opts, D, sizes):
    q = compile_query(pattern, opts)
    assert q.engine_class == "bitap"
    rng = np.random.default_rng(hash(pattern) & 0xFFFF)
    for n in sizes:
        text = _corpus(rng, n, plants=(b"matching", b"hello", b"works",
                                       b"matchxng", b"hellp"))
        _assert_kernel_used(text, q.folded_mask, q.consts, D, "bitap")
        ev_k, ev_n = _events_both(text, q.folded_mask, q.consts, D,
                                  "bitap")
        assert np.array_equal(ev_k, ev_n), \
            "kernel/numpy divergence for %r n=%d" % (pattern, n)
        assert (ev_n != 0).any(), "no events -- test is vacuous"


def test_bitap_kernel_case_fold():
    # -i folds through the LUT into the mask table; the kernel matches
    # case pairs with the (x | 0x20) single-compare trick
    q = compile_query("Hello", Options(D=1, approx=True, linenum=True,
                                       nocase="i"))
    rng = np.random.default_rng(5)
    text = _corpus(rng, 4000, plants=(b"hello", b"HELLO", b"HeLLo",
                                      b"heLLp"))
    _assert_kernel_used(text, q.folded_mask, q.consts, 1, "bitap")
    ev_k, ev_n = _events_both(text, q.folded_mask, q.consts, 1, "bitap")
    assert np.array_equal(ev_k, ev_n)
    assert (ev_n != 0).any()


def test_bitap_kernel_multibyte_delim():
    # multi-byte -d: d_endpos pulses + d_mask machine resets
    # -n bars the simple fast path (checksg.c:132) so the record-aware
    # mask machine runs
    q = compile_query("alice", Options(linenum=True, delimiter="From "))
    assert q.engine_class == "bitap"
    rng = np.random.default_rng(6)
    text = _corpus(rng, 5000, plants=(b"alice",), delim=b"From ")
    _assert_kernel_used(text, q.folded_mask, q.consts, 0, "bitap")
    ev_k, ev_n = _events_both(text, q.folded_mask, q.consts, 0, "bitap")
    assert np.array_equal(ev_k, ev_n)
    assert (ev_n & np.uint32(q.consts["d_endpos"])).any()


def test_bitap_kernel_multipart_endpos():
    # AND pattern: endpos has one bit per term -> per-bit hit planes
    q = compile_query("cat;dog", Options(linenum=True))
    assert q.engine_class == "bitap" and q.and_flag
    endpos = int(q.consts["endpos"])
    assert endpos & (endpos - 1) != 0, "expected multi-bit endpos"
    rng = np.random.default_rng(7)
    text = _corpus(rng, 4000, plants=(b"cat", b"dog"))
    _assert_kernel_used(text, q.folded_mask, q.consts, 0, "bitap")
    ev_k, ev_n = _events_both(text, q.folded_mask, q.consts, 0, "bitap")
    assert np.array_equal(ev_k, ev_n)
    # both part bits must actually fire somewhere
    acc = 0
    for w in ev_n:
        acc |= int(w)
    assert (acc & endpos) == endpos


@pytest.mark.parametrize("ci,cs,cd", [(2, 1, 1), (1, 2, 3), (3, 1, 2)])
def test_bitap_kernel_nonuniform_costs(ci, cs, cd):
    """-D/-I/-S cost wiring (asearch1.c:90-97) as static kernel params."""
    opts = Options(D=3, approx=True, linenum=True, jump=True,
                   cost_insert=ci, cost_subst=cs, cost_delete=cd)
    q = compile_query("matching", opts)
    assert q.engine_class == "bitap" and q.costs is not None
    rng = np.random.default_rng(ci * 16 + cs * 4 + cd)
    text = _corpus(rng, 4000, plants=(b"matching", b"matchng",
                                      b"matxching", b"mitchong"))
    W = min(max(q.consts["m"] + 3 + 2, 48), 1024)
    assert scan_ops._try_pallas(text, q.folded_mask, q.consts, 3, W,
                                1024, len(text), "bitap", q.costs,
                                interpret=True) is not None
    old = scan_ops._BACKEND
    try:
        scan_ops.set_backend("interpret")
        ev_k = scan_ops.scan_events(text, q.folded_mask, q.consts, 3,
                                    "bitap", costs=q.costs)
        scan_ops.set_backend("numpy")
        ev_n = scan_ops.scan_events(text, q.folded_mask, q.consts, 3,
                                    "bitap", costs=q.costs)
    finally:
        scan_ops.set_backend(old)
    assert np.array_equal(ev_k, ev_n)
    assert (ev_n & np.uint32(q.consts["endpos"])).any()


@pytest.mark.parametrize("D", [0, 2])
def test_sgrep_kernel_matches_numpy(D):
    opts = Options(D=D, approx=(D > 0))
    q = compile_query("pattern", opts)
    assert q.engine_class == "sgrep"
    rng = np.random.default_rng(10 + D)
    text = _corpus(rng, 4500, plants=(b"pattern", b"pattxrn"))
    _assert_kernel_used(text, q.sg_mask, q.sg_consts, D, "sgrep")
    ev_k, ev_n = _events_both(text, q.sg_mask, q.sg_consts, D, "sgrep")
    assert np.array_equal(ev_k, ev_n)
    assert (ev_n != 0).any()


def test_cli_conformance_on_kernel_path(oracle_bin, tmp_path):
    """End-to-end: CLI output vs the reference binary with the scan
    routed through the interpret-mode Pallas kernel (planes -> events
    -> records -> formatted bytes, the full production pipeline)."""
    from .oracle import run_oracle, run_ours_inproc
    rng = np.random.default_rng(42)
    lines = []
    words = [b"matching", b"hello", b"pattern", b"alice", b"bob"]
    for i in range(400):
        ws = [words[j] for j in rng.integers(0, len(words), 4)]
        if i % 17 == 0:
            lines.append(b"From " + ws[0])
        lines.append(b" ".join(ws))
    payload = b"\n".join(lines) + b"\n"
    f = tmp_path / "corpus.txt"
    f.write_bytes(payload)
    cases = [
        ["-2", "-c", "matching", str(f)],
        ["-1", "-n", "hello", str(f)],
        ["-n", "-d", "From ", "alice", str(f)],
        ["-2", "pattern", str(f)],
        # BASELINE config 3: non-uniform costs on the kernel path
        ["-3", "-D2", "-I1", "-S1", "-w", "-i", "-c", "matching",
         str(f)],
    ]
    old = scan_ops._BACKEND
    try:
        scan_ops.set_backend("interpret")
        for args in cases:
            o_out, _e, o_rc = run_oracle(args)
            m_out, m_rc = run_ours_inproc(args)
            assert m_out == o_out, (
                "kernel-path stdout mismatch for %r\n-- oracle --\n%r\n"
                "-- ours --\n%r" % (args, o_out, m_out))
            assert m_rc == o_rc, (args, o_rc, m_rc)
    finally:
        scan_ops.set_backend(old)


def test_kernel_fuzz_small_shapes():
    """Random patterns/corpora, including sizes that leave a partial
    final tile and matches planted across tile boundaries (L=1024)."""
    rng = np.random.default_rng(99)
    words = [b"alpha", b"bravo", b"charlie", b"matching"]
    for trial in range(4):
        pat = words[trial % len(words)]
        D = int(rng.integers(0, 3))
        opts = Options(D=D, approx=(D > 0), linenum=True)
        q = compile_query(pat.decode(), opts)
        n = int(rng.integers(900, 3500))
        text = _corpus(rng, n, plants=(pat,))
        # straddle the tile boundary explicitly
        if n > 1100:
            text[1024 - len(pat) // 2:1024 - len(pat) // 2 + len(pat)] \
                = np.frombuffer(pat, dtype=np.uint8)
        ev_k, ev_n = _events_both(text, q.folded_mask, q.consts, D,
                                  "bitap")
        assert np.array_equal(ev_k, ev_n), (pat, D, n)


def test_wide_class_eligible_and_exact():
    """Round 4 raised the compare-tree budget (16 tests/bit, 64 total):
    an 11-single-char class is now kernel-eligible and must match the
    numpy backend exactly; an 18-single non-foldable class stays
    rejected (the host-fallback shape in bench.py)."""
    import numpy as np
    from agrep_tpu.compile.query import compile_query
    from agrep_tpu.options import Options
    from agrep_tpu.ops import scan as scan_ops
    from agrep_tpu.ops.kernels import ranges_from_mask
    q = compile_query("[acegikmoqsu]atching",
                      Options(D=1, approx=True, linenum=True))
    mt = q.folded_mask.astype(np.uint32)
    assert ranges_from_mask(mt) is not None
    rng = np.random.default_rng(5)
    text = rng.choice(np.frombuffer(b"macegikmoqsu thing\n", np.uint8),
                      200000)
    old = scan_ops._BACKEND
    try:
        scan_ops.set_backend("interpret")
        ev_k = scan_ops.scan_events(text, mt, q.consts, 1, "bitap")
        scan_ops.set_backend("numpy")
        ev_n = scan_ops.scan_events(text, mt, q.consts, 1, "bitap")
    finally:
        scan_ops.set_backend(old)
    assert np.array_equal(ev_k, ev_n)
    assert int((ev_n != 0).sum()) > 0
    # round 5: the 18-single scattered class decomposes via cube
    # entries (masked equalities) and must ALSO match numpy exactly
    q2 = compile_query("[a1c3e5g7i9k!m#o%q=]atching",
                       Options(D=1, approx=True, linenum=True))
    mt2 = q2.folded_mask.astype(np.uint32)
    assert ranges_from_mask(mt2) is not None
    text2 = rng.choice(np.frombuffer(b"ma1c3e5gatching !%q=\n", np.uint8),
                       200000)
    try:
        scan_ops.set_backend("interpret")
        ev_k2 = scan_ops.scan_events(text2, mt2, q2.consts, 1, "bitap")
        scan_ops.set_backend("numpy")
        ev_n2 = scan_ops.scan_events(text2, mt2, q2.consts, 1, "bitap")
    finally:
        scan_ops.set_backend(old)
    assert np.array_equal(ev_k2, ev_n2)


def test_cube_cover_decomposition_soundness():
    """ranges_from_mask with cube entries must reconstruct the exact
    mask table for scattered classes (maskgen.c:96-127 shapes)."""
    import numpy as np
    from agrep_tpu.ops.kernels import ranges_from_mask

    rng = np.random.RandomState(7)
    for trial in range(40):
        mt = np.zeros(256, dtype=np.uint32)
        nbits = rng.randint(1, 6)
        for b in range(nbits):
            k = rng.randint(1, 30)
            sel = rng.choice(256, size=k, replace=False)
            for c in sel:
                mt[c] |= np.uint32(1 << b)
        r = ranges_from_mask(mt)
        if r is None:
            continue
        rec = np.zeros(256, dtype=np.uint32)
        for x in range(256):
            xf = x | 0x20
            for bits, ranges, folds, cubes in r:
                hit = False
                for (lo, hi) in ranges:
                    hit |= lo <= x <= hi
                for c in folds:
                    hit |= xf == c
                for (cm, cv) in cubes:
                    hit |= (x & cm) == cv
                if hit:
                    rec[x] |= np.uint32(bits)
        assert (rec == mt).all(), trial


def test_cube_cover_scattered_class_accepted():
    """The 18-scattered-char class that used to reject to the host
    ('mask-ranges') must now decompose (BENCH fallback_class18)."""
    import numpy as np
    from agrep_tpu.ops.kernels import ranges_from_mask

    cls = b"a1c3e5g7i9k!m#o%q="
    mt = np.zeros(256, dtype=np.uint32)
    for c in cls:
        mt[c] |= np.uint32(1)
    for i, ch in enumerate(b"atching"):
        mt[ch] |= np.uint32(1 << (i + 1))
    r = ranges_from_mask(mt)
    assert r is not None
    total = sum(len(a) + len(b) + len(c) for _, a, b, c in r)
    assert total <= 20
