"""agrep_tpu -- a TPU-native approximate-pattern-matching engine.

A from-scratch rebuild of the capability surface of agrep 3.41.5/TG
(Wu/Manber/Gopal/Gries; reference at /root/reference) designed for TPU:

* pattern compilation produces an explicit, immutable CompiledQuery
  (reference keeps ~80 globals; see reference agrep.c:107-220),
* all scanning is dense and data-parallel -- the bit-parallel shift-or
  automaton runs as JAX/XLA programs and Pallas TPU kernels over tiled
  byte streams with bounded-window halos (no Boyer-Moore skip loops:
  on a VPU, skipping is slower than scanning every byte),
* record extraction and byte-exact output formatting happen on the host,
  fully separated from the scan (the reference interleaves output with
  its hot loops; see SURVEY.md section 1),
* multi-chip scaling uses jax.sharding over a Mesh with psum/gather
  collectives (the reference is single-threaded C).

Public API mirrors the reference library surface (agrep.c:3017-3313):
fileagrep()/memagrep() two-phase init/search, plus a pythonic Query API.
"""

from .version import __version__
from .api import Query, fileagrep, memagrep, search_buffer, search_files

__all__ = [
    "__version__",
    "Query",
    "fileagrep",
    "memagrep",
    "search_buffer",
    "search_files",
]
