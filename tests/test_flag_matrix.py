"""Every user-visible flag, exercised at least once against the
oracle (stdout + exit code).  Interaction depth lives in the dedicated
suites; this matrix guarantees no flag regresses to unhandled."""

import pytest

from .oracle import compare

FLAGS = ["-c", "-n", "-b", "-i", "-ia", "-i#", "-i0", "-v", "-l",
         "-h", "-s", "-w", "-x", "-y", "-u", "-q", "-p", "-t",
         "-A", "-G", "-L", "-M", "-O", "-P", "-Z", "-k",
         "-1", "-2", "-V0", "-V1", "-CP437", "-CP850", "-g", "-a"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("fm") / "c.txt"
    p.write_text("hello world\nHELLO again\nbye hello\nlast line\n")
    return str(p)


@pytest.mark.parametrize("flag", FLAGS)
def test_flag_once(corpus, flag):
    compare([flag, "hello", corpus])


def test_flag_e(corpus):
    compare(["-e", "hello", corpus])


def test_flag_B(corpus):
    compare(["-y", "-B", "hello", corpus])


def test_flag_f(corpus, tmp_path):
    pf = tmp_path / "p.txt"
    pf.write_text("hello\nworld\n")
    compare(["-c", "-f", str(pf), corpus])


def test_flag_H(corpus, tmp_path):
    compare(["-H", str(tmp_path), "hello", corpus])


def test_flag_d(corpus):
    compare(["-d", "$$", "hello", corpus])
