"""Packed multi-term machine == host matcher on random inputs."""

import numpy as np
import pytest

from agrep_tpu.compile.multi import pack_terms
from agrep_tpu.ops import scan as scan_ops
from agrep_tpu.runtime.mgrep import _find_occurrences, _fold_tr


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("nocase", [False, True])
def test_packed_occurrences_match_host(seed, nocase):
    rng = np.random.default_rng(seed)
    alpha = b"abcdeF \n"
    n_terms = rng.integers(2, 20)
    terms = []
    for _ in range(n_terms):
        L = int(rng.integers(1, 12))
        terms.append(bytes(alpha[i] for i in
                           rng.integers(0, 6, L)))
    stream = np.frombuffer(
        bytes(alpha[i] for i in rng.integers(0, len(alpha), 5000)),
        dtype=np.uint8).copy()
    # plant some occurrences
    for t in terms[:4]:
        off = int(rng.integers(0, len(stream) - len(t)))
        stream[off:off + len(t)] = np.frombuffer(t, dtype=np.uint8)

    tr = _fold_tr(nocase)
    groups, leftover = pack_terms(terms, tr)
    assert not leftover
    got = {}
    for g in groups:
        ev = scan_ops.scan_events(stream, g.mask, g.consts, 0, "bitap",
                                  None)
        pos = np.flatnonzero(ev)
        w = ev[pos]
        for tid, bit, ln in zip(g.term_ids, g.term_bits, g.term_lens):
            got[tid] = (pos[(w & np.uint32(bit)) != 0] - ln + 1)
    for i, t in enumerate(terms):
        ref = _find_occurrences(stream, t, tr)
        assert np.array_equal(np.sort(got[i]), ref), (
            "term %d %r" % (i, t))
