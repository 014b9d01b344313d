"""Streaming block I/O tests (VERDICT round 1 item 3 / ADVICE medium).

Large files scan in O(chunk) memory through memmap + chunked halo
scans.  These tests force tiny stream thresholds and chunk sizes so a
~1-2MB corpus crosses many chunk boundaries, then assert (a) streamed
output is byte-identical to the whole-file path, and (b) both match the
reference binary.
"""

from __future__ import annotations

import numpy as np
import pytest

from agrep_tpu.ops import scan as scan_ops
from agrep_tpu.runtime.stream_io import ByteStream

from .oracle import compare, run_oracle, run_ours_inproc


def test_bytestream_basics():
    bs = ByteStream([b"\n", np.arange(256, dtype=np.uint8), b"tail"])
    assert len(bs) == 1 + 256 + 4
    assert bs[0] == 0x0A
    assert bs[1] == 0
    assert bs[256] == 255
    assert bytes(bytearray(bs[257:261])) == b"tail"
    assert np.array_equal(bs.read(0, 3), np.asarray([10, 0, 1],
                                                    dtype=np.uint8))
    # cross-segment read
    assert np.array_equal(bs.read(255, 259),
                          np.frombuffer(b"\xfeffta"[:0] or bytes(
                              [254, 255, 116, 97]), dtype=np.uint8))
    # clamping
    assert len(bs.read(-5, 10_000)) == len(bs)
    assert len(bs.read(300, 200)) == 0


def test_scan_event_list_equals_whole_scan():
    from agrep_tpu.options import Options
    from agrep_tpu.compile.query import compile_query
    q = compile_query("matching", Options(D=2, approx=True,
                                          linenum=True))
    rng = np.random.default_rng(3)
    text = rng.integers(32, 127, size=300_000, dtype=np.uint8)
    text[::67] = 0x0A
    for off in rng.integers(0, len(text) - 8, 40):
        text[off:off + 8] = np.frombuffer(b"matching", np.uint8)
    # plant matches straddling the chunk boundary exactly
    for b in (65536, 131072, 262144):
        text[b - 4:b + 4] = np.frombuffer(b"matching", np.uint8)
    scan_ops.set_backend("numpy")
    whole = scan_ops.scan_events(text, q.folded_mask, q.consts, 2,
                                 "bitap")
    pos_w = np.flatnonzero(whole)
    ev_w = whole[pos_w]
    ps, es = [], []
    for p, e in scan_ops.scan_event_list(
            lambda lo, hi: text[lo:hi], len(text), q.folded_mask,
            q.consts, 2, "bitap", chunk=65536):
        ps.append(p)
        es.append(e)
    pos_c = np.concatenate(ps)
    ev_c = np.concatenate(es)
    assert np.array_equal(pos_w, pos_c)
    assert np.array_equal(ev_w, ev_c)
    assert len(pos_w) > 40


def _make_corpus(path, n_bytes=1_600_000, seed=11):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"matching", b"hello", b"alice", b"bob",
             b"pattern", b"lorem", b"matchxng", b"hellp"]
    chunks = []
    total = 0
    i = 0
    while total < n_bytes:
        ws = [words[j] for j in rng.integers(0, len(words), 6)]
        line = b" ".join(ws) + b"\n"
        if i % 23 == 0:
            line = b"From " + line
        chunks.append(line)
        total += len(line)
        i += 1
    path.write_bytes(b"".join(chunks))
    return path


STREAM_CASES = [
    ["-n", "matching"],                     # bitap record output
    ["-c", "matching"],                     # sgrep D=0 line count
    ["-2", "-c", "matching"],               # sgrep agrep() count walk
    ["-1", "-n", "hello"],                  # bitap k=1
    ["-b", "-2", "-n", "matching"],         # byte offsets
    ["-n", "-d", "From ", "alice"],         # bitap multi-byte -d
    ["-c", "-n", "-d", "From ", "alice"],   # -d count
    ["-3", "-D2", "-I1", "-S1", "-w", "-i", "-c", "matching"],  # costs
    ["-w", "-c", "hello"],                  # D=0 wordbound count
    ["-2", "-c", "match(i|x)ng"],           # regex chunked count
    ["-1", "-c", "-v", "hel*o"],            # regex inverse count
    ["-c", "h#llo"],                        # FASTREGEX wildcard count
    ["hello"],                              # bm record PRINT stream
    ["-b", "hello"],                        # ... with byte offsets
    ["-w", "matching"],                     # ... wordbound
    ["-i", "HELLO"],                        # ... case fold
    ["hello,matching"],                     # mgrep flat-OR PRINT stream
    ["-i", "HELLO,koala"],                  # ... case fold
    ["hel*o"],                              # regex record PRINT stream
    ["-2", "mat.hing"],                     # ... with errors
    ["-c", "-v", "hello"],                  # inverse count == count
    ["-c", "-v", "-w", "matching"],         # ... wordbound
    ["-2", "-c", "-v", "koala"],            # ... approx (round 5b)
    ["-l", "hello"],                        # -l last-file early exit
    ["-l", "-w", "matching"],               # ... wordbound gate
]


@pytest.mark.parametrize("args", STREAM_CASES)
def test_streaming_matches_oracle(args, oracle_bin, tmp_path,
                                  monkeypatch):
    f = _make_corpus(tmp_path / "big.txt")
    monkeypatch.setenv("AGREP_TPU_STREAM_MB", "0")
    monkeypatch.setenv("AGREP_TPU_CHUNK_MB", "1")
    full = args + [str(f)]
    o_out, _e, o_rc = run_oracle(full)
    old_chunk = scan_ops.STREAM_CHUNK
    scan_ops.STREAM_CHUNK = 1 << 20
    try:
        m_out, m_rc = run_ours_inproc(full)
    finally:
        scan_ops.STREAM_CHUNK = old_chunk
    assert m_out == o_out, (
        "streaming stdout mismatch for %r\n-- oracle --\n%r\n"
        "-- ours --\n%r" % (full, o_out[:2000], m_out[:2000]))
    assert m_rc == o_rc, (full, o_rc, m_rc)


@pytest.mark.parametrize("args", STREAM_CASES)
def test_streaming_equals_wholefile(args, tmp_path, monkeypatch):
    """Streamed and whole-file paths agree byte-for-byte even on
    corpora where the oracle is not consulted (different seed, chunk
    64KB so dozens of boundaries)."""
    f = _make_corpus(tmp_path / "big2.txt", n_bytes=400_000, seed=29)
    full = args + [str(f)]
    monkeypatch.setenv("AGREP_TPU_STREAM_MB", "1024")  # force whole
    w_out, w_rc = run_ours_inproc(full)
    monkeypatch.setenv("AGREP_TPU_STREAM_MB", "0")     # force stream
    old_chunk = scan_ops.STREAM_CHUNK
    scan_ops.STREAM_CHUNK = 65536
    try:
        s_out, s_rc = run_ours_inproc(full)
    finally:
        scan_ops.STREAM_CHUNK = old_chunk
    assert s_out == w_out, (
        "stream/whole divergence for %r\n-- whole --\n%r\n"
        "-- stream --\n%r" % (full, w_out[:2000], s_out[:2000]))
    assert s_rc == w_rc


def test_streaming_inverse_and_offsets(tmp_path, monkeypatch):
    """Inverse (-v) and @offset (-q/-u style) record modes through the
    streaming bitap path."""
    f = _make_corpus(tmp_path / "big3.txt", n_bytes=300_000, seed=31)
    for args in (["-v", "-n", "matching"], ["-q", "-2", "-n", "hello"]):
        full = args + [str(f)]
        o_out, _e, o_rc = run_oracle(full)
        monkeypatch.setenv("AGREP_TPU_STREAM_MB", "0")
        old_chunk = scan_ops.STREAM_CHUNK
        scan_ops.STREAM_CHUNK = 65536
        try:
            m_out, m_rc = run_ours_inproc(full)
        finally:
            scan_ops.STREAM_CHUNK = old_chunk
        assert m_out == o_out, (full, o_out[:800], m_out[:800])
        assert m_rc == o_rc


def test_regex_streaming_rss(tmp_path, monkeypatch):
    """Chunked regex -c holds O(chunk) anonymous memory: a 64MB file
    must not add a same-order RSS spike (the whole-file path would
    materialize a padded copy + lane matrices)."""
    import resource
    f = tmp_path / "huge.txt"
    line = b"the quick matching hello pattern lorem\n"
    with open(f, "wb") as fh:
        for _ in range((64 << 20) // len(line)):
            fh.write(line)
    size = f.stat().st_size
    assert size > (48 << 20)
    monkeypatch.setenv("AGREP_TPU_STREAM_MB", "0")
    old_chunk = scan_ops.STREAM_CHUNK
    old_backend = scan_ops._BACKEND
    scan_ops.STREAM_CHUNK = 1 << 20
    scan_ops.set_backend("numpy")     # the host streaming path
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    try:
        out, rc = run_ours_inproc(["-2", "-c", "match(i|x)ng", str(f)])
    finally:
        scan_ops.STREAM_CHUNK = old_chunk
        scan_ops.set_backend(old_backend)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # count is per-line over a uniform file: every line matches
    assert int(out.split()[0]) > 1_000_000
    # ru_maxrss (KB on Linux) counts the memmapped file pages once as
    # they stream through; the whole-file path would add the padded
    # anonymous copy + lane matrices on top (several x the file size)
    assert rss1 - rss0 < (size >> 10) + (24 << 10), (rss0, rss1, size)


def test_regex_streaming_under_lane_backend(tmp_path, monkeypatch):
    """Round 5: regex -c and plain record print stream under the
    jax/interpret backends too -- per-chunk verdicts ride the lanes
    kernel (every line restarts from the same post-newline closure),
    byte-identical to the whole-file path."""
    import io
    import random
    import subprocess

    from agrep_tpu.api import fileagrep
    from agrep_tpu.ops import scan as scan_ops
    from tests.oracle import ORACLE

    rnd = random.Random(5)
    words = ["working", "wotking", "worming", "lorem", "hello"]
    out = []
    for _ in range(6000):
        out.append(" ".join(rnd.choice(words)
                            for _ in range(rnd.randint(2, 6))))
    data = ("\n".join(out) + "\n").encode()
    p = tmp_path / "c.txt"
    p.write_bytes(data)
    monkeypatch.setattr(scan_ops, "STREAM_CHUNK", 1 << 16)
    old = scan_ops._BACKEND
    scan_ops.set_backend("interpret")
    try:
        for args in (["-2", "-c", "wo(r|t)king"],
                     ["-c", "wo(r|t)king"],
                     ["wo(r|t)king"],
                     ["-1", "w[aeiou]rking"]):
            ref = subprocess.run([ORACLE] + args + [str(p)],
                                 capture_output=True).stdout
            buf = io.BytesIO()
            fileagrep(args + [str(p)], output=buf)
            assert buf.getvalue() == ref, args
    finally:
        scan_ops.set_backend(old)


def test_boolean_stream_chunked_equivalence(tmp_path, monkeypatch):
    """Round 5: boolean AND / complex-tree record print+count stream
    in O(chunk); forced 64KB chunks must be byte-identical to the
    oracle (and hence to the whole-file walk)."""
    import io
    import random
    import subprocess

    from agrep_tpu.api import fileagrep
    from agrep_tpu.ops import scan as scan_ops
    from tests.oracle import ORACLE

    rnd = random.Random(9)
    words = ["kernel", "device", "zebra", "words", "filler", "alpha"]
    out = []
    for _ in range(8000):
        out.append(" ".join(rnd.choice(words)
                            for _ in range(rnd.randint(2, 6))))
    data = "\n".join(out).encode()          # no trailing newline
    p = tmp_path / "c.txt"
    p.write_bytes(data)
    monkeypatch.setenv("AGREP_TPU_STREAM_MB", "0")
    monkeypatch.setattr(scan_ops, "STREAM_CHUNK", 1 << 16)
    for pat in ("kernel;device", "kernel,zebra",
                "{kernel;device},zebra", "~kernel;zebra"):
        for flags in ([], ["-c"]):
            args = flags + [pat, str(p)]
            ref = subprocess.run([ORACLE] + args,
                                 capture_output=True).stdout
            buf = io.BytesIO()
            fileagrep(args, output=buf)
            assert buf.getvalue() == ref, (pat, flags)


def test_no_rescan_final_byte_record(tmp_path, monkeypatch):
    """N % 32768 == 1 without a trailing newline: the EOF rescan (and
    its appended newline) never runs, so the final record stops
    BEFORE the last byte -- pinned for both the streamed and the
    whole-file mgrep print paths."""
    import io
    import subprocess

    from agrep_tpu.api import fileagrep
    from tests.oracle import ORACLE

    body = bytearray()
    while len(body) < 32780:
        body += b"some words lines here\n"
    data = bytes(body[:32760]) + b"\nkoala ab"
    data = data[:32768] + b"x"
    assert len(data) % 32768 == 1 and data[-1:] != b"\n"
    p = tmp_path / "c.txt"
    p.write_bytes(data)
    pf = tmp_path / "p.txt"
    pf.write_bytes(b"words\nkoala\nq000\n"
                   + b"".join(b"t%03d\n" % i for i in range(30)))
    ref = subprocess.run([ORACLE, "-f", str(pf), str(p)],
                         capture_output=True).stdout
    for stream_mb in ("0", "99999"):
        monkeypatch.setenv("AGREP_TPU_STREAM_MB", stream_mb)
        buf = io.BytesIO()
        fileagrep(["-f", str(pf), str(p)], output=buf)
        assert buf.getvalue() == ref, stream_mb


def test_streaming_rss_bounded(tmp_path):
    """Large-file streaming print stays memory-bounded: the streamed
    run's subprocess peak RSS must undercut the forced whole-file
    walk's by at least half the corpus (relative bound -- absolute
    RSS drifts with the jax import baseline and machine load)."""
    import subprocess
    import sys

    line = b"kernel words device filler zebra lines here\n"
    p = tmp_path / "big.txt"
    with open(p, "wb") as f:
        blk = line * 40000
        for _ in range(192 * 1024 * 1024 // len(blk) + 1):
            f.write(blk)
    size = p.stat().st_size
    code = (
        "import io, resource, sys\n"
        "from agrep_tpu.api import fileagrep\n"
        "class Null:\n"
        "    def write(self, b): return len(b)\n"
        "fileagrep(['kernel;device', %r], output=Null())\n"
        "print(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)\n"
        % str(p))
    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(
        __file__)))

    def peak(stream_mb):
        env = dict(_os.environ)
        env["AGREP_TPU_BACKEND"] = "numpy"
        env["JAX_PLATFORMS"] = "cpu"
        env["AGREP_TPU_STREAM_MB"] = stream_mb
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, env=env, timeout=600,
                           cwd=repo)
        assert r.returncode == 0, r.stderr[-500:]
        return int(r.stdout.split()[-1]) * 1024

    # one retry: concurrent memory pressure (full-suite load) can
    # reclaim the whole-file run's mmap pages and shrink the gap
    for attempt in range(2):
        streamed = peak("8")
        whole = peak("999999")
        if streamed < whole - size // 2:
            break
    assert streamed < whole - size // 2, (streamed, whole, size)


def test_regex_decorated_streaming(tmp_path, monkeypatch):
    """Round 5: -n/-b/-q regex record print streams -- decorations
    are cumulative counters (line index; byte offset with the 49152
    glitch lag and the D>0 pair parity), and the precheck already
    routes residue-clamp shapes whole-file."""
    import io
    import random
    import subprocess

    from agrep_tpu.api import fileagrep
    from tests.oracle import ORACLE

    rnd = random.Random(5)
    words = ["working", "wotking", "worming", "lorem", "hello"]
    out = []
    for _ in range(18000):
        out.append(" ".join(rnd.choice(words)
                            for _ in range(rnd.randint(2, 6))))
    data = ("\n".join(out) + "\n").encode()
    assert len(data) > 3 * 49152       # several glitch boundaries
    p = tmp_path / "c.txt"
    p.write_bytes(data)
    monkeypatch.setenv("AGREP_TPU_STREAM_MB", "0")
    monkeypatch.setattr(scan_ops, "STREAM_CHUNK", 1 << 16)
    p2 = tmp_path / "c2.txt"           # leading empty line + no final
    p2.write_bytes(b"\n" + data[:-1])  # newline (appended-line guard)
    for args in (["-n", "wo(r|t)king"], ["-b", "wo(r|t)king"],
                 ["-n", "-b", "wo(r|t)king"], ["-q", "wo(r|t)king"],
                 ["-1", "-n", "w[aeiou]rking"],
                 ["-2", "-b", "wo(r|t)king"],
                 # round-5 continuation: INVERSE streams too
                 ["-v", "wo(r|t)king"], ["-v", "-n", "wo(r|t)king"],
                 ["-v", "-b", "w[aeiou]rking"],
                 ["-1", "-v", "-n", "-b", "wo(r|t)king"]):
        for path in (p, p2):
            ref = subprocess.run([ORACLE] + args + [str(path)],
                                 capture_output=True).stdout
            buf = io.BytesIO()
            fileagrep(args + [str(path)], output=buf)
            assert buf.getvalue() == ref, (args, path.name)
