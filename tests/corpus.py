"""Conformance-test corpus generator (SURVEY.md section 4 step 1)."""

from __future__ import annotations

import os
import random

WORDS = ("the quick brown fox jumps over lazy dog hello world matching "
         "string approximate pattern search grep homogenous Homogenos "
         "bibliography dictionary ACGT acgtacgt lorem ipsum dolor sit "
         "amet consectetur").split()


def make_corpus(root: str) -> dict:
    os.makedirs(root, exist_ok=True)
    rng = random.Random(42)
    files = {}

    def put(name, data: bytes):
        p = os.path.join(root, name)
        with open(p, "wb") as f:
            f.write(data)
        files[name] = p
        return p

    lines = []
    for _ in range(200):
        n = rng.randint(0, 8)
        lines.append(" ".join(rng.choice(WORDS) for _ in range(n)))
    put("text.txt", ("\n".join(lines) + "\n").encode())

    put("nonl.txt", b"hello world\nlast line has no newline")
    put("empty.txt", b"")
    put("onlynl.txt", b"\n\n\n")
    put("leadnl.txt", b"\nhello\n\nworld\n")
    put("dna.txt", b"".join(
        bytes(rng.choice(b"acgt") for _ in range(60)) + b"\n"
        for _ in range(50)))
    put("iso.txt", "café naïve söße Füße ÄÖÜ àéîõû\nCAFÉ NAÏVE\n"
        .encode("latin-1"))
    put("longline.txt",
        (b"x" * 300 + b" hello " + b"y" * 300 + b"\n") * 5)
    put("mail.txt", b"From alice\nsubject one\nbody a\n"
                    b"From bob\nsubject two\nbody b hello\n"
                    b"From carol\nsubject three\n")
    put("dollar.txt", b"rec one$$rec two hello$$rec three$$")
    put("binaryish.txt", bytes(rng.randrange(1, 255) for _ in range(400))
        + b"\nhello\n")
    put("repeats.txt", b"aaaa bb aaaa\naa\nabab ababab\n" * 3)
    return files
