"""The negative-length s_output INVERSE fwrite (round-5 stratified
seeds 570276/810111, minimized).

In the D>0 partition engine, a match's backward_delimiter is floored
at the CALL's textbegin (sgrep.c:1311 passes agrep()'s local `text`),
while lastout can sit at textend+1 from an earlier record whose
forward_delimiter found no delimiter ahead.  A later in-call match
(the pair-unroll overrun past lastend) then calls
`fwrite(*lastout, 1, curtextbegin - *lastout, fp)` with a NEGATIVE
length (sgrep.c:1355).  glibc copies `buf_end - write_ptr` bytes from
the wild pointer into the stdout stdio buffer before the huge direct
write(2) EFAULTs: up to 4096 bytes of scan-buffer tail, malloc chunk
metadata, and the stdio buffer's own lingering content are printed.
With no prior output the stream has no buffer yet, so the first such
write emits nothing -- but it ALLOCATES the buffer, arming any later
one in the same run.  Emulated in SgrepEngine._wild_inverse_write +
the Sink's virtual stdio model (runtime/output.py _vs_feed)."""

from .oracle import compare


def _corpora(tmp_path):
    # w1: delimiter-rich, primes the stdio buffer with real output and
    # leaves its bytes in the reused scan buffer; w2: delimiter-free
    # two-block file whose every record matches (inverse prints
    # nothing legitimately -- everything printed is the wild write)
    w1 = tmp_path / "w1.txt"
    w1.write_bytes(b"ko zebra o hello o world\n" * 40)
    w2 = tmp_path / "w2.txt"
    w2.write_bytes(b"acgt" * 10000)
    return str(w1), str(w2)


def test_wild_write_first_file_silent(tmp_path):
    # single file, no prior output: block 1's wild write emits nothing
    # (no stdio buffer yet) but allocates; block 2's emits 4096 bytes
    # of stale block-1 data
    _, w2 = _corpora(tmp_path)
    compare(["-d", "o", "-v", "-4", "alpha", w2])


def test_wild_write_primed_by_prior_file(tmp_path):
    # file 1's records flush through the stdio buffer; file 2's wild
    # write then emits the scan-buffer tail + chunk metadata + the
    # buffer's lingering output image
    w1, w2 = _corpora(tmp_path)
    compare(["-d", "o", "-v", "-4", "alpha", w1, w2])
    compare(["-d", "o", "-v", "-4", "alpha", w2, w1])


def test_wild_write_across_three_files(tmp_path):
    w1, w2 = _corpora(tmp_path)
    compare(["-d", "o", "-v", "-2", "alpha", w1, w2, w2])
    compare(["-d", "o", "-v", "-1", "alpha", w2, w2])


def test_wild_write_other_delims_conform(tmp_path):
    # a delimiter the corpus does contain: spans stay ordered, no wild
    # write -- pin that the new path does not overfire
    w1, w2 = _corpora(tmp_path)
    compare(["-d", "$$", "-v", "-3", "alpha", w2, w1])
    compare(["-d", " ", "-v", "-2", "alpha", w1, w2])
