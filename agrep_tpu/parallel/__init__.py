"""Multi-chip scaling: corpus sharding over a jax.sharding.Mesh.

The reference is single-threaded C (SURVEY.md section 2.3); this layer
is new design: corpus shards are scanned data-parallel (one byte-stream
shard per device, overlapped by the maximum record length), match/record
counts are reduced with psum over ICI, and match offsets are gathered to
the host for ordered output.
"""

from .dist import make_mesh, distributed_scan_count, shard_corpus

__all__ = ["make_mesh", "distributed_scan_count", "shard_corpus"]
