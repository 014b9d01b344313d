"""Conformance for pathological sgrep block geometry: residues past the
1024-byte copy-back headroom (clamped strncpy, sgrep.c:464-468) and
no-delimiter fallback blocks (:399).  These corpora route through
sgrep_sim.sgrep_block_replay — the byte-exact buffer replay — instead
of the dense event model; here we pin that routing against the oracle.
"""

import os

import numpy as np
import pytest

from .oracle import compare


def _mk_long_records(path, seed, rec_words, period, n=200_000,
                     long_lines=False):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"matching", b"hello", b"alice", b"bob",
             b"pattern", b"extraordinarily_long_needle_word", b"zebra"]
    buf, total, i = [], 0, 0
    while total < n:
        k = int(rng.integers(3, rec_words))
        ws = [words[j] for j in rng.integers(0, len(words), k)]
        line = b" ".join(ws) + b" " * int(rng.integers(0, 3))
        line += b"\n" if not long_lines or rng.random() < 0.08 else b" "
        if i % period == 0:
            line = b"From " + line
        buf.append(line)
        total += len(line)
        i += 1
    with open(path, "wb") as f:
        f.write(b"".join(buf))


@pytest.fixture(scope="module")
def clobber_dir(tmp_path_factory, oracle_bin):
    d = tmp_path_factory.mktemp("clobber")
    # >1KB residues between "From " delimiters (clamped copy path)
    _mk_long_records(d / "recs.txt", 5, 200, 4)
    # mostly-unbroken >32KB lines (no-newline fallback blocks)
    _mk_long_records(d / "lines.txt", 5, 500, 3, long_lines=True)
    return d


@pytest.mark.parametrize("args", [
    ["-c", "-d", "From ", "alice"],
    ["-b", "-d", "From ", "alice"],
    ["-d", "From ", "alice"],
    ["-t", "-d", "From ", "alice"],
    ["-v", "-d", "From ", "alice"],
    ["-w", "-c", "-d", "From ", "alice"],
    ["-b", "-d", "From ", "extraordinarily_long_needle_word"],
])
def test_clobbered_delim_records(clobber_dir, args):
    compare(args + [str(clobber_dir / "recs.txt")])


@pytest.mark.parametrize("args", [
    ["-c", "alice"],
    ["-b", "alice"],
    ["alice"],
    ["-v", "alice"],
    ["-c", "extraordinarily_long_needle_word"],     # monkey (m > 20)
    ["extraordinarily_long_needle_word"],
])
def test_fallback_long_lines(clobber_dir, args):
    compare(args + [str(clobber_dir / "lines.txt")])


def test_chunked_count_takeover(clobber_dir):
    """Streaming -c hands off to the replay at the first clamped
    boundary (chunk-aligned takeover)."""
    from .oracle import run_oracle, run_ours
    path = str(clobber_dir / "lines.txt")
    o_out, _, o_rc = run_oracle(["-c", "alice", path])
    env_mb = os.environ.get("AGREP_TPU_STREAM_MB")
    os.environ["AGREP_TPU_STREAM_MB"] = "0"
    try:
        m_out, _, m_rc = run_ours(["-c", "alice", path])
    finally:
        if env_mb is None:
            os.environ.pop("AGREP_TPU_STREAM_MB", None)
        else:
            os.environ["AGREP_TPU_STREAM_MB"] = env_mb
    assert (m_out, m_rc) == (o_out, o_rc)
