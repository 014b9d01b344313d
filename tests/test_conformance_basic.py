"""Byte-exact conformance vs the reference binary: core single-pattern
paths (exact, k errors, output decorations)."""

import os

import pytest

from .corpus import make_corpus
from .oracle import compare

CORPUS = {}


@pytest.fixture(scope="module", autouse=True)
def corpus(tmp_path_factory, oracle_bin):
    root = tmp_path_factory.mktemp("corpus")
    CORPUS.update(make_corpus(str(root)))
    yield


def F(*names):
    return [CORPUS[n] for n in names]


BASIC_FLAGS = [
    [], ["-c"], ["-n"], ["-b"], ["-i"], ["-v"], ["-l"], ["-h"], ["-s"],
    ["-c", "-v"], ["-n", "-i"], ["-q"], ["-u", "-n"],
]


@pytest.mark.parametrize("flags", BASIC_FLAGS,
                         ids=lambda f: "_".join(f) or "plain")
@pytest.mark.parametrize("pat", ["hello", "world", "zzz", "o", "Hello"])
def test_exact_single_file(flags, pat):
    compare(flags + [pat, CORPUS["text.txt"]])


@pytest.mark.parametrize("k", ["-1", "-2", "-3"])
@pytest.mark.parametrize("flags", [[], ["-c"], ["-n"], ["-i"], ["-v"]],
                         ids=lambda f: "_".join(f) or "plain")
def test_approx_single_file(k, flags):
    compare([k] + flags + ["matching", CORPUS["text.txt"]])


@pytest.mark.parametrize("pat", ["hello", "line"])
def test_edge_files(pat):
    for name in ("nonl.txt", "empty.txt", "onlynl.txt", "leadnl.txt",
                 "longline.txt", "binaryish.txt"):
        compare([pat, CORPUS[name]])


def test_multiple_files():
    compare(["hello"] + F("text.txt", "nonl.txt", "leadnl.txt"))
    compare(["-c", "hello"] + F("text.txt", "nonl.txt"))
    compare(["-l", "hello"] + F("text.txt", "nonl.txt", "empty.txt"))
    compare(["-h", "hello"] + F("text.txt", "nonl.txt"))


@pytest.mark.parametrize("flags", [["-w"], ["-w", "-c"], ["-x"],
                                   ["-x", "-c"]],
                         ids=lambda f: "_".join(f))
def test_word_and_line_anchors(flags):
    compare(flags + ["hello", CORPUS["text.txt"]])
    compare(flags + ["hello world", CORPUS["repeats.txt"]])


def test_delimiters():
    compare(["-d", "$$", "hello", CORPUS["dollar.txt"]])
    compare(["-d", "$$", "-c", "hello", CORPUS["dollar.txt"]])
    compare(["-d", "From ", "hello", CORPUS["mail.txt"]])
    compare(["-d", "From ", "-t", "hello", CORPUS["mail.txt"]])


def test_costs():
    compare(["-2", "-D2", "-I1", "-S1", "matching", CORPUS["text.txt"]])
    compare(["-3", "-D2", "-I1", "-S1", "-w", "-i", "matching",
             CORPUS["text.txt"]])


def test_booleans():
    compare(["hello;world", CORPUS["text.txt"]])
    compare(["hello,world", CORPUS["text.txt"]])
    compare(["-c", "hello;world", CORPUS["text.txt"]])


def test_anchored():
    compare(["^hello", CORPUS["leadnl.txt"]])
    compare(["hello$", CORPUS["leadnl.txt"]])
    compare(["-n", "^From", CORPUS["mail.txt"]])
