"""The sequential C host scanners must equal the windowed numpy
backend bit-for-bit: bitap/sgrep machines (native bitap_scan_events
vs ops/scan._scan_windows_np) and the regex NFA (renfa_scan_lines vs
the lane runner).  The windowed backend is the conformance-pinned
semantic reference."""

import numpy as np
import pytest

import agrep_tpu.native as native
from agrep_tpu.compile.query import compile_query
from agrep_tpu.options import parse_args
from agrep_tpu.ops import renfa
from agrep_tpu.ops import scan as so

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")

CASES = [
    ["-2", "-c", "-n", "matching"],
    ["-1", "-n", "br[ao]wn"],
    ["-3", "-D2", "-I1", "-S1", "-n", "-c", "pattern"],
    ["-c", "-d", "$$", "hello"],
    ["-5", "-n", "-c", "abcdefghij"],
    ["-2", "-c", "approximate"],
    ["-1", "-c", "hello"],
    ["-0", "-c", "-d", "xx", "hello"],
    ["-c", "hello"],          # folded-exact BMH fast path
    ["-c", "Hello"],
    ["-c", "12a34"],
]


def _corpus(rng, n, plant):
    text = rng.integers(32, 127, n).astype(np.uint8)
    text[rng.integers(0, n, n // 50)] = 0x0A
    for _ in range(5):
        off = int(rng.integers(0, max(1, n - len(plant))))
        text[off:off + len(plant)] = np.frombuffer(plant,
                                                   dtype=np.uint8)
    return text


@pytest.mark.parametrize("args", CASES)
@pytest.mark.parametrize("seed", range(3))
def test_bitap_scan_events_equals_windowed(args, seed):
    opts, pats, _ = parse_args(args + ["/dev/null"])
    q = compile_query(pats, opts)
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5000, 150000))
    plant = pats.encode("latin-1", "ignore").replace(b"[", b"") \
                                            .replace(b"]", b"")
    text = _corpus(rng, n, plant)
    if q.engine_class == "sgrep":
        mask, consts, variant = q.sg_mask, q.sg_consts, "sgrep"
    elif q.engine_class == "bitap":
        mask, consts, variant = q.folded_mask, q.consts, "bitap"
    else:
        pytest.skip("non-mask engine")
    costs = getattr(q, "costs", None)
    want = so.scan_events(text, mask, consts, q.D, variant, costs)
    pairs = native.bitap_scan_events(text, mask, consts, q.D, variant,
                                     costs)
    got = np.zeros(n, dtype=np.uint32)
    got[pairs[0]] = pairs[1]
    assert np.array_equal(got, want)


@pytest.mark.parametrize("pat", ["wo(r|t)king", "a(b|c)*d",
                                 "he.lo", "x#y"])
@pytest.mark.parametrize("seed", range(2))
def test_renfa_scan_lines_equals_lanes(pat, seed):
    opts, pats, _ = parse_args(["-2", "-n", pat, "/dev/null"])
    q = compile_query(pats, opts)
    if q.engine_class != "regex":
        pytest.skip("not routed to the regex engine")
    mc = q.re_mc
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3000, 60000))
    text = _corpus(rng, n, pat.encode("latin-1", "ignore"))
    if text[-1] != 0x0A:
        text = np.concatenate([text,
                               np.frombuffer(b"\n", dtype=np.uint8)])
    cont, _ = renfa.step_newline(list(mc["inits"]),
                                 int(mc["mask"][0x0A]), mc)
    got = native.renfa_scan_lines(text, mc, cont)
    # lane-runner reference over the same stream
    nlp = np.flatnonzero(text == 0x0A)
    starts = np.concatenate([[0], nlp[:-1] + 1])
    lens = nlp - starts
    L = int(lens.max()) + 1
    lanes = np.zeros((len(starts), L), dtype=np.uint8)
    for r, (s, ln) in enumerate(zip(starts.tolist(), lens.tolist())):
        lanes[r, :ln + 1] = text[s:s + ln + 1]
    want = renfa._scan_records_np(lanes, lens, mc, cont, cont)
    assert np.array_equal(np.asarray(got, dtype=bool), want)


def test_parallel_find_delims_equals_bruteforce():
    """find_delims_all splits big streams across a thread pool with
    dl-1 overlap; ends must match the single-pass definition exactly,
    including occurrences straddling the chunk cuts."""
    import numpy as np
    from agrep_tpu import native
    if native.get_lib() is None:
        import pytest
        pytest.skip("no native lib")
    rng = np.random.default_rng(12)
    n = 9 << 20
    data = rng.integers(60, 70, n, dtype=np.uint8).astype(np.uint8)
    # plant occurrences right at the 4 chunk cut points
    for k in range(1, 4):
        cut = n * k // 4
        data[cut - 1:cut + 2] = ord("A")
    for dlm in (b"\n", b"AB", b"AA"):
        d2 = data.copy()
        ins = rng.integers(0, n - 3, 200)
        for i in ins:
            d2[i:i + len(dlm)] = np.frombuffer(dlm, np.uint8)
        got = native.find_delims_all(d2, dlm)
        dl = len(dlm)
        if dl == 1:
            want = np.flatnonzero(d2 == dlm[0])
        else:
            hit = np.ones(n - dl + 1, bool)
            for k in range(dl):
                hit &= d2[k:n - dl + 1 + k] == dlm[k]
            want = np.flatnonzero(hit) + dl - 1
        assert np.array_equal(got, want), dlm
