"""Distributed scan over a simulated 8-device CPU mesh.

The sharded scan must agree exactly with the single-stream scan:
psum'd counts and host-merged global offsets (SURVEY.md section 5
'distributed communication backend' -- ordering = byte order, overlap
events deduped by ownership)."""

import numpy as np
import pytest

from agrep_tpu.options import Options
from agrep_tpu.compile.query import compile_query
from agrep_tpu.ops import scan as scan_ops
from agrep_tpu.parallel.dist import (distributed_scan_count,
                                     distributed_scan_offsets,
                                     make_mesh, shard_corpus)


@pytest.fixture(scope="module")
def mesh8():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


@pytest.mark.parametrize("D", [0, 2])
def test_distributed_matches_single_stream(mesh8, D):
    rng = np.random.default_rng(11)
    text = rng.integers(32, 127, size=64 * 1024, dtype=np.uint8)
    text[::64] = 0x0A
    pat = b"matching"
    # plant matches, including dead on shard boundaries
    shard_len = -(-len(text) // 8)
    for off in (5, 1000, shard_len - 3, shard_len + 1,
                3 * shard_len - len(pat) // 2, len(text) - 40):
        text[off:off + len(pat)] = np.frombuffer(pat, dtype=np.uint8)

    opts = Options(D=D, approx=D > 0, linenum=True)
    q = compile_query("matching", opts)

    scan_ops.set_backend("numpy")
    ev = scan_ops.scan_events(text, q.folded_mask, q.consts, D, "bitap")
    ref_pos = np.flatnonzero(ev & np.uint32(q.consts["endpos"]))

    halo = 256
    consts = dict(q.consts)
    consts["shard_halo"] = halo
    shards, starts = shard_corpus(text, 8, overlap=halo)
    scan_ops.set_backend("jax")
    total, locals_ = distributed_scan_count(
        shards, q.folded_mask, consts, D, mesh=mesh8)
    got_pos = distributed_scan_offsets(
        shards, starts, len(text), q.folded_mask, consts, D, mesh=mesh8)
    scan_ops.set_backend("numpy")

    assert total == len(ref_pos) == int(locals_.sum())
    assert np.array_equal(np.sort(got_pos), ref_pos)
    # the host merge already yields global byte order
    assert np.array_equal(got_pos, np.sort(got_pos))
