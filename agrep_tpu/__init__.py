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

def _tune_malloc() -> None:
    """Keep large numpy temporaries on the retained heap.

    glibc services every allocation above MMAP_THRESHOLD (128KB) with
    a fresh mmap and returns it on free, so each multi-MB scan
    temporary pays first-touch page faults -- on virtualized hosts
    that costs more than the scan itself.  Raising the threshold and
    the trim threshold makes the heap grow once and be reused
    (M_MMAP_THRESHOLD = -3, M_TRIM_THRESHOLD = -1)."""
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)
        libc.mallopt(-1, 1 << 30)
    except Exception:
        pass


_tune_malloc()

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
