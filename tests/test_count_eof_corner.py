"""Final-byte walk alignment (sgrep.c bm:723-789 / monkey:1563-1801):
a match ending on the file's last byte (no trailing newline) only
fires when the real skip walk REACHES textend -- the entry gate
`while (text < textend)`, false candidates at textend-1 (monkey's
CONT text++), skip-run overshoot, and record jumps landing at/past
textend all kill it.  Round-3 regression: the dense event model
counted such matches unconditionally
(engine._drop_phantom_tail_event / sgrep_sim.walk_fires_at_end).
Also pins sgrep's -v -c quirk (the COUNT branch ignores INVERSE,
sgrep.c:808-817)."""

import random

import pytest

from .oracle import compare

P24 = "x" * 24                      # repeated-char monkey pattern
P24B = "abcdefghijklmnopqrstuvwx"   # distinct-char monkey pattern

CASES = [
    # (pattern, corpus)
    ("a", b"za\na"),       # bm: record extension eats the 1-byte tail
    ("a", b"zaX\na"),
    ("a", b"a\na"),
    ("a", b"a\nzz\na"),    # line before tail does not match: no eat
    ("a", b"aa\na"),
    ("a", b"b\na"),
    ("a", b"a\nb"),
    ("a", b"za\naa"),      # 2-byte tail: found via skip-run
    ("a", b"a\na\n"),      # trailing newline: no EOF games
    ("a", b"a"),           # bm entry gate: 1-byte span scans nothing
    ("a", b"\na"),
    ("a", b"ab"),
    ("a", b"ba"),
    ("ab", b"ab"),
    ("ab", b"Xab"),
    ("aa", b"aa"),
    ("aa", b"baa"),
    ("abc", b"xabc"),
    ("abc", b"abcabc"),
    ("aba", b"aba"),
    ("aba", b"xaba"),
    ("aba", b"ababa"),
    (P24, P24.encode()),             # monkey entry gate: n == m
    (P24, b"z" + P24.encode()),      # false candidate at textend-1
    (P24, b"zz" + P24.encode()),
    (P24, b"zzz" + P24.encode()),
    (P24, P24.encode() + b"\n"),
    (P24B, P24B.encode()),
    (P24B, b"z" + P24B.encode()),    # skip-run lands ON textend: fires
    (P24B, b"y" + P24B.encode() + b"\nz" + P24B.encode()),
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_tail_byte_walk(tmp_path, i):
    pat, corpus = CASES[i]
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    compare(["-c", pat, str(p)])
    compare([pat, str(p)])


@pytest.mark.parametrize("flags", [["-v", "-c"], ["-c", "-i"],
                                   ["-c", "-w"]])
def test_tail_byte_flag_modes(tmp_path, flags):
    for pat, corpus in CASES[:12]:
        p = tmp_path / "c.txt"
        p.write_bytes(corpus)
        compare(flags + [pat, str(p)])


@pytest.mark.parametrize("seed", range(6))
def test_tail_byte_fuzz(tmp_path, seed):
    """Random corpora whose last bytes spell the pattern, no trailing
    newline -- the shapes where walk alignment decides the count."""
    r = random.Random(seed * 97 + 13)
    alpha = b"abx"
    pat = bytes(r.choice(alpha) for _ in range(r.randint(1, 6)))
    body = bytearray()
    for _ in range(r.randint(0, 30)):
        body += bytes(r.choice(alpha + b"\n")
                      for _ in range(r.randint(0, 8)))
    corpus = bytes(body) + pat       # match ends at the last byte
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    compare(["-c", pat.decode("latin-1"), str(p)])
    compare([pat.decode("latin-1"), str(p)])


# ---- D>0 agrep() tail shapes (round-3 sweep findings): a match
# ending on the stream's last byte fires for OUTPUT only through the
# EOF rescan's round machine + 2x-unroll overrun (sgrep.c:1169-1238);
# complex-boolean -b offsets fire at the crossing VISIT; the appended
# mgrep newline is visible only when the EOF rescan runs.
D_TAIL_CASES = [
    ("bravo", b"oala\nxy koala\nbrav"),
    ("bravo", b"brav"),
    ("bravo", b"xx\nbrav"),
    ("bravo", b"brav\n"),
    ("bravo", b"bravz"),
    ("bravo", b"abravo"),
    ("bravoo", b"xx\nbrav"),
    ("hello", b"hell"),
]


@pytest.mark.parametrize("i", range(len(D_TAIL_CASES)))
@pytest.mark.parametrize("flags", [["-1"], ["-1", "-c"], ["-1", "-v"],
                                   ["-2"], ["-1", "-v", "-d", "$$"]])
def test_d_tail_shapes(tmp_path, i, flags):
    pat, corpus = D_TAIL_CASES[i]
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    compare(flags + [pat, str(p)])


@pytest.mark.parametrize("corpus", [b"alpha", b"alpha\n", b"xalpha",
                                    b"alpha\nalpha", b"b",
                                    b"alpha xx\nyy alpha",
                                    b"zz here\nalpha"])
def test_complex_boolean_crossing_cbo(tmp_path, corpus):
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    compare(["-b", "alpha;~zz", str(p)])
    compare(["-v", "alpha;~zz", str(p)])
    compare(["-b", "-t", "alpha;~zz", str(p)])


@pytest.mark.parametrize("flags", [["-b"], ["-q"], ["-b", "-q"]])
@pytest.mark.parametrize("corpus", [
    b"alpha one\nzz koala here\n",   # flush visit past the newline
    b"xxalpha\nzz here\n",           # registration jump >= record end
    b"alpha alpha one\nzz x\n",      # two registrations per record
    b"yy alpha\nzz x\n",
])
def test_complex_boolean_flush_offsets(tmp_path, corpus, flags):
    """monkey1's complex-boolean flush CurrentByteOffset: the walk
    position at the crossing check (newmgrep.c:1015-1019) minus the
    p_size-1 warmup; -q additionally subtracts (pointer -
    curtextbegin) from that same pointer (print_options :780-784)."""
    p = tmp_path / "c.txt"
    p.write_bytes(corpus)
    compare(flags + ["alpha;~koala", str(p)])
