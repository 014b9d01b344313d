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


def test_memagrep_and_inverse_verdict():
    # bitap verdict precedence (bitap.c:342): ^ binds tighter than ||,
    # so -v with an AND boolean fires on EVERY record
    data = (b'\nalpha d$d zz\nkoala d$d zz d$d alpha hello\n'
            b'd$d helloalpha zz koala\n')
    for args in (["-v", "-n", "alpha;koala;zz"], ["-n", "alpha;koala;zz"],
                 ["-v", "-n", "-c", "alpha;koala;zz"]):
        compare_mem(args, data)


def test_memagrep_delim_trim_guards():
    # sgrep's -d trim guard is the stale 2*MAXLINE offset; mgrep's is
    # D_length -- both observable only via the library API
    big = (b"\nzz koala matching hello alpha " * 120)[:3000] + b"\n"
    for args in (["-d", "o", "-1", "koala"], ["-d", "o", "alpha"],
                 ["-d", "o", "-v", "alpha"], ["-d", "o", "hello,zz"],
                 ["-d", "o", "-c", "-1", "hello"]):
        compare_mem(args, big)
    compare_mem(["-d", "o", "hello,zz"], b"\nmatching hello zz HELLO\nkOaLa")


def test_memagrep_bm_tail_flush():
    # the skip walk's overshoot candidate decides the INVERSE flush
    compare_mem(["-v", "koala"], b"\nzz d$dozz koala alphaomatchin")
    compare_mem(["-v", "nosuchpat"], b"\nzz d$dozz koala alphaomatchin")
    compare_mem(["-v", "-l", "koala"], b"\nzz d$dozz koala alphaomatchin")


def test_memagrep_regex_memory_conventions():
    data = b'\nxx hello yy\nabc hello def\nno match\nzz hello\n'
    for args in (["-n", "-b", "-2", "hel*o"], ["-n", "-b", "hel*o"],
                 ["-n", "-v", "-1", "al(p|f)ha"], ["-b", "-3", "hel*o"]):
        compare_mem(args, data)


def test_memagrep_late_error_grand_total():
    # exec conflicts still print Grand Total: 0 before the -1 return
    compare_mem(["-x", "-d", "From ", "hello"], b"\nhi\n")


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
        # partial trailing record: exercises the memory end trims
        data = bytes(out[:size]) + rnd.choice(
            [b"\n", b"\n", b"", b" tail no newline"])
        pat = rnd.choice(["hello", "koala", "alpha", "nosuch",
                          "hel*o", "h#o", "hello;zz", "al(p|f)ha",
                          "alpha;koala;zz", "hello,zz"])
        flags = []
        for f, p in (("-c", .4), ("-n", .2), ("-v", .2), ("-i", .2),
                     ("-b", .1), ("-w", .15)):
            if rnd.random() < p:
                flags.append(f)
        if rnd.random() < .3:
            flags.append("-%d" % rnd.randint(1, 2))
        if rnd.random() < .25:
            flags += ["-d", rnd.choice(["$$", "o"])]
        compare_mem(flags + [pat], data)


def test_memagrep_fuzz_wide():
    """Broadened grid (round-5 continuation): boolean trees, classes,
    `~` negation, -t/-x/-k/-l/-s, non-uniform costs, multi-char and
    subsequence-prone delimiters, 32KB/64KB seam-straddling buffers.
    400 fresh-seed cases (951000-951399) ran clean before pinning."""
    words = [b"alpha", b"hello", b"matching", b"zz", b"koala",
             b"d$d", b"bravo", b"CaSe"]
    pats = ["hello", "koala", "alpha", "nosuch", "hel*o", "h#o",
            "hello;zz", "al(p|f)ha", "alpha;koala;zz", "hello,zz",
            "br#vo", "[a-h]ello", "~hello", "{alpha;bravo},koala"]
    for case in range(120):
        seed = 951000 + case
        rnd = random.Random(seed)
        out = bytearray(b"\n")
        size = rnd.choice([3, 30, 300, 3000, 20000, 33000, 65600])
        style = rnd.randrange(3)
        while len(out) < size:
            if style == 0:
                out += b" ".join(rnd.choice(words)
                                 for _ in range(rnd.randint(1, 6)))
                out += rnd.choice([b"\n", b"$$", b""])
            elif style == 1:
                out += rnd.choice(words) * rnd.randint(1, 9)
                out += rnd.choice([b"\n", b" ", b"o", b"ll"])
            else:
                out += bytes(rnd.choice(b"ab\nxyo$")
                             for _ in range(64))
        data = bytes(out[:size]) + rnd.choice(
            [b"\n", b"\n", b"", b" tail no newline"])
        flags = []
        for f, p in (("-c", .4), ("-n", .2), ("-v", .2), ("-i", .2),
                     ("-b", .1), ("-w", .15), ("-t", .1), ("-l", .05),
                     ("-s", .05), ("-x", .05), ("-k", .05)):
            if rnd.random() < p:
                flags.append(f)
        if rnd.random() < .3:
            flags.append("-%d" % rnd.randint(1, 3))
        if rnd.random() < .25:
            flags += ["-d", rnd.choice(["$$", "o", "ll"])]
        if rnd.random() < .1:
            flags += ["-D2", "-I1", "-S1"]
        compare_mem(flags + [rnd.choice(pats)], data)
