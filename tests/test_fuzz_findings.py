"""Regressions pinned from randomized-fuzz findings (round 2).

Three root causes:
 1. duplicate boolean terminals: the bucket loop only breaks once
    MATCHED (newmgrep.c:978), so `hello;hello` registers both entries
    at one anchor;
 2. records between Max_record and ~2 blocks long print WHOLE (no
    clamp fires; the old blanket Max_record truncation was wrong);
 3. the sgrep block replay's event finder must fold the BUFFER too
    (char_tr folds unconditionally, sgrep.c:216-236)."""

import pytest

from .oracle import compare


def test_duplicate_and_terminal(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("alpha charlie hello charlie bravo\nab")
    compare(["-t", "-d", "$$", "hello;hello", str(p)])
    compare(["-d", "$$", "hello;hello", str(p)])
    compare(["-c", "hello;hello", str(p)])
    compare(["-c", "-d", "$$", "hello;hello;bravo", str(p)])


def test_unclamped_big_record_prints_whole(tmp_path):
    # one newline early, then a ~49KB record to EOF: the residue fits
    # (49144 <= Max_record), so the reference prints it ALL
    p = tmp_path / "c.txt"
    data = b"koala th\n" + b"the koala matching czz " * 2100
    p.write_bytes(data)
    compare(["-2", "-n", "czz", str(p)], check_stderr=True)
    compare(["-n", "czz", str(p)], check_stderr=True)
    compare(["-b", "koala", str(p)])


def test_vmode_region_cut_record(tmp_path):
    # a no-newline block trim cuts the record at the scan end without
    # consuming the trim byte (curtextend stops at textend)
    p = tmp_path / "c.bin"
    p.write_bytes(b"q" * 31740 + b"o\nbravo charliea" + b"q" * 1015)
    compare(["-b", "bravo;charlie", str(p)])
    compare(["-c", "bravo;charlie", str(p)])
    compare(["bravo,zzz", str(p)])


def test_no_newline_corpus_no_crash(tmp_path):
    p = tmp_path / "c.bin"
    p.write_bytes(b"q" * 32771)
    compare(["-b", "bravo;charlie", str(p)])
    compare(["-2", "-c", "bravo", str(p)])


def test_replay_case_fold(tmp_path):
    # uppercase match inside a clobbered/fallback block layout: the
    # replay's dense event finder must case-fold the buffer
    p = tmp_path / "c.bin"
    p.write_bytes(b"q" * 32968 + b"X\xc2\xe7\x16\xfa\xbbh@")
    compare(["-b", "x", str(p)])
    compare(["-c", "x", str(p)])
    p2 = tmp_path / "c2.bin"
    p2.write_bytes(b"q" * 40000 + b"\nHELLO q\n" + b"r" * 30000)
    compare(["-c", "hello", str(p2)])
