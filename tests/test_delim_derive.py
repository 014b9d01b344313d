"""_delim_ends_after_overwrite must equal a full rescan of the
overwritten stream (the -d fast path derives the delimiter index from
the raw scan + per-block-overwrite windows instead of a second
whole-file pass)."""

import numpy as np
import pytest

from agrep_tpu.runtime.mgrep import (_delim_ends_after_overwrite,
                                     _find_delims_arr)


@pytest.mark.parametrize("seed", range(40))
def test_derived_equals_rescan(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 4000))
    dl = int(rng.integers(1, 5))
    delim = bytes(rng.integers(97, 100, dl).astype(np.uint8))
    data = rng.integers(97, 101, n).astype(np.uint8)
    ow = []
    for b in sorted(set(int(x) for x in
                        rng.integers(0, max(1, n),
                                     int(rng.integers(0, 6))))):
        if not ow or b - ow[-1] >= 3 * dl:   # blocks are 32KB apart
            ow.append(b)
    stream = data.copy()
    for b in ow:
        k = min(dl, n - b)
        stream[b:b + k] = np.frombuffer(delim, dtype=np.uint8)[:k]
    raw = _find_delims_arr(data, delim)
    want = _find_delims_arr(stream, delim)
    got = _delim_ends_after_overwrite(stream, raw, ow, delim)
    assert np.array_equal(np.sort(got), want)
