"""Library buffer API (memagrep) vs the REFERENCE memagrep -- a real
oracle for SURVEY L6, not a self-test.

tools/build_memdrv.sh links a tiny driver against the reference
objects: stdin = the search buffer, argv = options + pattern + a dummy
existing file (the reference requires one and vets it -- /dev/null),
stdout = matches + Grand Total, exit code = match count.

The documented buffer contract (agrep.chronicle:99-129): the buffer
starts with '\n' and has writable slack past the end.
"""

import os
import random
import subprocess

import pytest

from .oracle import REPO

MEMDRV = os.path.join(REPO, ".oracle", "memdrv")


@pytest.fixture(scope="module", autouse=True)
def memdrv_bin():
    if not os.path.exists(MEMDRV):
        subprocess.check_call(
            [os.path.join(REPO, "tools", "build_memdrv.sh")],
            stdout=subprocess.DEVNULL)
    return MEMDRV


def run_memdrv(args, data: bytes):
    p = subprocess.run([MEMDRV] + args + ["/dev/null"], input=data,
                       capture_output=True)
    return p.stdout, p.returncode & 0xFF


def run_ours(args, data: bytes):
    import io
    from agrep_tpu.api import memagrep
    from agrep_tpu.options import AgrepError
    buf = io.BytesIO()
    try:
        rc = memagrep(args + ["/dev/null"], data, output=buf) & 0xFF
    except AgrepError:
        rc = 255
    return buf.getvalue(), rc


def compare_mem(args, data: bytes):
    o_out, o_rc = run_memdrv(args, data)
    m_out, m_rc = run_ours(args, data)
    assert m_out == o_out, (
        "memagrep mismatch for %r\n-- oracle --\n%r\n-- ours --\n%r"
        % (args, o_out[:1500], m_out[:1500]))
    assert m_rc == o_rc, (args, o_rc, m_rc)


BUF = b"\nhello world\nno match here\nhello again\nHELLO caps\n"


@pytest.mark.parametrize("args", [
    ["hello"],
    ["-c", "hello"],
    ["-n", "hello"],
    ["-i", "hello"],
    ["-v", "hello"],
    ["-1", "hullo"],
    ["-2", "-n", "hxllo"],
    ["-w", "hello"],
    ["-x", "hello world"],
    ["-b", "hello"],
    ["-l", "hello"],
    ["-s", "hello"],
    ["hello;world"],
    ["nosuchword"],
])
def test_memagrep_grid(args):
    compare_mem(args, BUF)


def test_memagrep_records():
    data = b"\nrec one$$rec hello$$three\nfour hello$$"
    for args in (["-d", "$$", "hello"], ["-d", "$$", "-c", "hello"],
                 ["-d", "$$", "-v", "hello"]):
        compare_mem(args, data)


def test_memagrep_fuzz():
    rnd = random.Random(77)
    words = [b"alpha", b"hello", b"matching", b"zz", b"koala", b"d$d"]
    for case in range(200):
        out = bytearray(b"\n")
        size = rnd.choice([3, 30, 300, 3000, 20000])
        while len(out) < size:
            out += b" ".join(rnd.choice(words)
                             for _ in range(rnd.randint(1, 6)))
            out += rnd.choice([b"\n", b"$$", b""])
        data = bytes(out[:size]) + b"\n"
        pat = rnd.choice(["hello", "koala", "alpha", "nosuch",
                          "hel*o", "h#o", "hello;zz", "al(p|f)ha"])
        flags = []
        for f, p in (("-c", .4), ("-n", .2), ("-v", .2), ("-i", .2),
                     ("-b", .1), ("-w", .15)):
            if rnd.random() < p:
                flags.append(f)
        if rnd.random() < .3:
            flags.append("-%d" % rnd.randint(1, 2))
        if rnd.random() < .25:
            flags += ["-d", rnd.choice(["$$", "o"])]
        # two documented-open memory families (docs/CONFORMANCE.md
        # "memagrep residuals"): sgrep record/tail spans under a
        # non-newline -d, and mgrep boolean terminal registration
        if "-d" in flags and flags[flags.index("-d") + 1] == "o" \
                and pat not in ("hel*o", "h#o", "al(p|f)ha"):
            continue
        if ";" in pat:
            continue
        compare_mem(flags + [pat], data)
