"""Streaming block I/O (reference bitap.c:450-505 reborn).

The reference refills a 48KB buffer forever, so a 10GB file scans in
constant memory; round 1's engines slurped whole files.  This module
restores O(chunk) scanning:

  * ByteStream -- a random-access view over a list of byte segments
    (numpy arrays, memmaps, bytes) WITHOUT concatenating them: the
    engines' virtual streams ("\\n" + file + delimiter [+ the
    block-glitch byte]) become zero-copy views over a read-only
    np.memmap of the file.
  * open_bytes -- np.memmap a file read-only (np.fromfile for empty
    files, which memmap rejects).

The chunked scan itself lives in ops.scan.scan_event_list: each chunk
is scanned with a W-byte halo of real preceding bytes (the same
tile+halo restart argument as in-chunk tiling, applied at chunk
granularity), so carried machine state never crosses a chunk host-side.
"""

from __future__ import annotations

import numpy as np


class ByteStream:
    """Concatenated random-access byte source over segments.

    Supports len(), integer indexing, step-1 slicing, and bulk read();
    every access materializes only the requested range (memmap segments
    fault in O(range) pages)."""

    def __init__(self, segments):
        self.segs = []
        offs = [0]
        for s in segments:
            if isinstance(s, (bytes, bytearray)):
                s = np.frombuffer(bytes(s), dtype=np.uint8)
            if len(s) == 0:
                continue
            self.segs.append(s)
            offs.append(offs[-1] + len(s))
        if not self.segs:
            offs = [0, 0]
            self.segs = [np.zeros(0, dtype=np.uint8)]
        self.offs = np.asarray(offs, dtype=np.int64)
        self.n = int(self.offs[-1])

    def __len__(self) -> int:
        return self.n

    def read(self, lo: int, hi: int) -> np.ndarray:
        """uint8 copy of [lo, hi) clamped to the stream bounds."""
        lo = max(0, min(int(lo), self.n))
        hi = max(lo, min(int(hi), self.n))
        out = np.empty(hi - lo, dtype=np.uint8)
        i = int(np.searchsorted(self.offs, lo, side="right")) - 1
        pos = lo
        while pos < hi:
            seg = self.segs[i]
            s0 = int(self.offs[i])
            take = min(hi, s0 + len(seg)) - pos
            out[pos - lo:pos - lo + take] = seg[pos - s0:pos - s0 + take]
            pos += take
            i += 1
        return out

    def __getitem__(self, key):
        if isinstance(key, slice):
            start, stop, step = key.indices(self.n)
            if step != 1:
                raise ValueError("ByteStream slices must be step-1")
            return self.read(start, stop)
        key = int(key)
        if key < 0:
            key += self.n
        if not (0 <= key < self.n):
            raise IndexError(key)
        i = int(np.searchsorted(self.offs, key, side="right")) - 1
        return int(self.segs[i][key - int(self.offs[i])])


def open_bytes(path: str) -> np.ndarray:
    """Read-only byte view of a file: memmap when possible (O(1)
    memory), tiny array for empty files."""
    import os
    if os.path.getsize(path) == 0:
        return np.zeros(0, dtype=np.uint8)
    return np.memmap(path, dtype=np.uint8, mode="r")
