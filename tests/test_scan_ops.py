"""Scan-operator equivalence: scalar spec == numpy backend == jax
backend, across machines, error budgets and tile boundaries."""

import numpy as np
import pytest

from agrep_tpu.compile.query import compile_query
from agrep_tpu.options import Options
from agrep_tpu.ops import bitword
from agrep_tpu.ops import scan as scan_ops


def _random_text(n, seed, alpha=b"abcdef \n"):
    rng = np.random.default_rng(seed)
    return np.frombuffer(
        bytes(alpha[i] for i in rng.integers(0, len(alpha), n)),
        dtype=np.uint8).copy()


def _events_ref(stream, mask, consts, D, costs=None):
    out = np.zeros(len(stream), dtype=np.uint32)
    for i, ev in bitword.scan_stream_ref(bytes(stream), mask, consts, D,
                                         costs):
        out[i] = ev
    return out


@pytest.mark.parametrize("pattern,D,flags", [
    ("abcd", 0, {}),
    ("abcd", 1, {}),
    ("abcd", 2, {}),
    ("fabc", 3, {}),
    ("ab;cd", 0, {"linenum": True}),
    ("abcd", 2, {"wordbound": True}),
    ("a[b-d]e", 1, {}),
])
@pytest.mark.parametrize("tile", [64, 256])
def test_bitap_scan_matches_spec(pattern, D, flags, tile):
    opts = Options(D=D, approx=D > 0, linenum=True, **{
        k: v for k, v in flags.items() if k != "linenum"})
    q = compile_query(pattern, opts)
    assert q.engine_class == "bitap"
    stream = np.concatenate([
        np.frombuffer(b"\n", dtype=np.uint8),
        _random_text(900, seed=D * 7 + len(pattern)),
        np.frombuffer(q.delim, dtype=np.uint8)])
    ref = _events_ref(stream, q.folded_mask, q.consts, D, q.costs)
    for backend in ("numpy", "jax"):
        scan_ops.set_backend(backend)
        try:
            got = scan_ops.scan_events(stream, q.folded_mask, q.consts,
                                       D, "bitap", q.costs, tile=tile)
        finally:
            scan_ops.set_backend("numpy")
        assert np.array_equal(ref, got), (
            "backend %s tile %d: first diff at %r" % (
                backend, tile,
                np.flatnonzero(ref != got)[:5]))


@pytest.mark.parametrize("pattern,D", [
    (b"abcd", 0), (b"abcd", 1), (b"abcde", 2), (b"ab", 1)])
@pytest.mark.parametrize("tile", [64, 512])
def test_sgrep_scan_matches_spec(pattern, D, tile):
    m = len(pattern)
    mask = np.asarray(bitword.sgrep_mask(pattern), dtype=np.uint32)
    consts = {"endpos": (0x80000000 >> (m - 1)) & 0xFFFFFFFF, "m": m}
    stream = np.concatenate([
        np.frombuffer(b"\n", dtype=np.uint8), _random_text(700, seed=m)])
    # scalar reference
    ref = np.zeros(len(stream), dtype=np.uint32)
    states = bitword.sgrep_init(D)
    for i, b in enumerate(stream):
        states, hit = bitword.step_sgrep(states, int(b), int(mask[b]), m, D)
        if hit:
            ref[i] = 1
    for backend in ("numpy", "jax"):
        scan_ops.set_backend(backend)
        try:
            got = scan_ops.scan_events(stream, mask, consts, D, "sgrep",
                                       tile=tile)
        finally:
            scan_ops.set_backend("numpy")
        assert np.array_equal(ref, got), "backend %s tile %d" % (
            backend, tile)


def test_dryrun_multichip():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    import os
    import jax
    spec = importlib.util.spec_from_file_location(
        "graft_entry2", os.path.join(os.path.dirname(__file__), "..",
                                     "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape[0] > 0
