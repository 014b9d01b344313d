"""The asearch -d -l double-free family (round-5 seed 820060).

The reference's delimiter-mode FILENAMEONLY early return frees the
scan buffer twice (asearch.c:237 and :264); the stdio stdout buffer
is then carved from the freed chunk and freed again, so multi-file
-l runs end in use-after-free fallout: garbage after the filename
lines, later lines vanishing, or a glibc SIGABRT ("double free or
corruption (top)") -- which one flips with file order and argv path
lengths.  Documented in docs/CONFORMANCE.md; our behavior (every
matching file listed, true count as status) is pinned here, and the
corruption shapes are asserted loosely so a reference rebuild that
fixes them retires the entry."""

import subprocess

from .oracle import ORACLE, run_ours_inproc


def _corpora(tmp_path):
    # a: every 'll' record contains 'koala'; b: none do -- with -v
    # both files fire the FILENAMEONLY early return, and both are
    # large enough that the next scan clobbers the freed-chunk stdio
    # buffer before the exit flush
    a = tmp_path / "a.txt"
    a.write_bytes(b"bravo koala zz hello ll " * 1365)
    b = tmp_path / "b.txt"
    b.write_bytes(b"lorem words here zz ll " * 3043)
    return str(a), str(b)


def test_multi_file_l_lists_every_match(tmp_path):
    a, b = _corpora(tmp_path)
    for order in ((a, b), (b, a)):
        out, rc = run_ours_inproc(["-d", "ll", "-w", "-v", "-t", "-l",
                                   "-3", "koala", *order])
        assert out == ("%s\n%s\nGrand Total: 2 match(es) found.\n"
                       % order).encode()
        assert rc == 2


def test_oracle_corruption_shapes(tmp_path):
    # all that is stable about the oracle: it starts with the first
    # file's line, then garbage / missing lines / SIGABRT.  If this
    # ever matches our clean output, retire the CONFORMANCE entry.
    a, b = _corpora(tmp_path)
    clean_seen = 0
    for order in ((a, b), (b, a)):
        p = subprocess.run([ORACLE, "-d", "ll", "-w", "-v", "-t",
                            "-l", "-3", "koala", *order],
                           capture_output=True)
        assert p.stdout.startswith((order[0] + "\n").encode())
        clean = p.stdout == ("%s\n%s\nGrand Total: 2 match(es) "
                             "found.\n" % order).encode() \
            and (p.returncode & 0xFF) == 2
        clean_seen += clean
    assert clean_seen < 2, "oracle no longer corrupts: retire entry"
