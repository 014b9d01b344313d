"""Binary (NUL-bearing) corpora vs the reference -- the block loop's
strncpy residue carries (sgrep.c:470), block-bounded record spans for
the long-approx engines, and monkey's inverse early return all show
only on corpora with NULs near 32KB boundaries.

Round-4 closures pinned here:
- the NUL-clamped print view (engine._sgrep_nul_clamp_view): residue
  and EOF-residue carries zero-fill after their first NUL, and both
  the scan AND the printed bytes reflect that;
- monkey()'s INVERSE per-block early return (sgrep.c:1581) via
  sgrep_sim.monkey_inverse_survives;
- a_monkey/monkey4 record spans bounded by the engine call's
  textbegin/textend (sgrep.c:2325-2331, forward_delimiter's end+1
  not-found return);
- _inverse_delim_replay / _inverse_blocks_delim complements printed
  from the evolving virtual buffer, not the raw stream.
"""

import io
import random
import subprocess

import pytest

import os

from .oracle import ORACLE

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="reference binary not built")


def run_oracle(args, corpus, tmp_path):
    f = tmp_path / "f"
    f.write_bytes(corpus)
    p = subprocess.run([ORACLE] + args + [str(f)], capture_output=True)
    return p.stdout, p.returncode & 0xFF, str(f)


def run_ours(args, path):
    from agrep_tpu.api import fileagrep
    from agrep_tpu.options import AgrepError
    buf = io.BytesIO()
    try:
        rc = fileagrep(args + [path], output=buf) & 0xFF
    except AgrepError:
        rc = 255
    return buf.getvalue(), rc


def check(args, corpus, tmp_path):
    o_out, o_rc, path = run_oracle(args, corpus, tmp_path)
    m_out, m_rc = run_ours(args, path)
    assert m_out == o_out, (args, o_out[:200], m_out[:200])
    assert m_rc == o_rc, (args, o_rc, m_rc)


def _corpus(seed, n, words=(b"hello", b"matching", b"zz",
                            b"acgtacgtacgtacgtacgt",
                            b"verylongpatternabcdefghij")):
    rnd = random.Random(seed)
    body = bytearray(rnd.randbytes(n))
    for _ in range(n // 150):
        body[rnd.randrange(n)] = 0x0A
    for _ in range(8):
        w = rnd.choice(list(words))
        p0 = rnd.randrange(n - 30)
        body[p0:p0 + len(w)] = w
    return bytes(body)


def test_nul_clamp_prints_dna(tmp_path):
    # monkey4 inverse + record prints read the strncpy-clamped buffer
    c = _corpus(101, 70000)
    for args in (["-1", "acgtacgtacgtacgtacgt"],
                 ["-2", "-v", "acgtacgtacgtacgtacgt"],
                 ["-1", "-b", "acgtacgtacgtacgtacgt"]):
        check(args, c, tmp_path)


def test_monkey_inverse_early_return(tmp_path):
    c = _corpus(202, 40000)
    for args in (["-v", "verylongpatternabcdefghij"],
                 ["-v", "-n", "verylongpatternabcdefghij"],
                 ["verylongpatternabcdefghij"]):
        check(args, c, tmp_path)


def test_amonkey_block_bounded_records(tmp_path):
    # -d with a delimiter absent from the data: records stop at the
    # engine call's textend, and forward_delimiter's end+1 not-found
    # return includes the byte AT textend
    c = _corpus(303, 70000)
    for args in (["-1", "-d", "From ", "acgtacgtacgtacgtacgt"],
                 ["-1", "-d", "From ", "-v", "acgtacgtacgtacgtacgt"],
                 ["-3", "-v", "-d", "$$", "matching"]):
        check(args, c, tmp_path)


def test_agrep_inverse_delim_clamped_bytes(tmp_path):
    c = _corpus(404, 140000)
    for args in (["-3", "-v", "-d", "$$", "matching"],
                 ["-1", "-v", "-b", "hello"],
                 ["-2", "-v", "hello"]):
        check(args, c, tmp_path)


def test_binary_fuzz(tmp_path):
    rnd = random.Random(808)
    for case in range(40):
        n = rnd.choice([40000, 70000, 140000])
        c = _corpus(rnd.randrange(1 << 30), n)
        pat = rnd.choice(["hello", "matching", "zz",
                          "acgtacgtacgtacgtacgt",
                          "verylongpatternabcdefghij"])
        flags = []
        for f_, pr in (("-v", .3), ("-c", .3), ("-n", .15), ("-b", .1),
                       ("-i", .1), ("-w", .08), ("-s", .04)):
            if rnd.random() < pr:
                flags.append(f_)
        if rnd.random() < .35:
            flags.append("-%d" % rnd.randint(1, 3))
        if rnd.random() < .3:
            flags += ["-d", rnd.choice(["$$", "o", "From "])]
        check(flags + [pat], c, tmp_path)
