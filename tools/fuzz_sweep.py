"""Offline randomized conformance sweep: random corpora x random
flag/pattern combos, ours (in-process) vs the reference binary.
Broader and longer than the CI fuzz tests -- run it between rounds to
hunt divergences; anything it finds should be minimized and pinned as
a regression test.

  python tools/fuzz_sweep.py [n_cases] [seed0]
  python tools/fuzz_sweep.py --stratified [n_cases] [seed0]
  python tools/fuzz_sweep.py --regex [n_cases] [seed0]

Stratified mode de-biases the grid (round-4 verdict: the uniform grid
samples rare flag intersections like -f+costs+-d+-w with ~0.5% joint
probability): every case draws at least TWO of {-f, costs, -d, -w,
-v, -t} and a corpus size straddling a 32KB mgrep block boundary.
"""

import io
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("AGREP_TPU_BACKEND", "numpy")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

ORACLE = os.path.join(REPO, ".oracle", "agrep")

WORDS = [b"alpha", b"bravo", b"hello", b"matching", b"xy", b"a",
         b"koala", b"zz", b"ab", b"lorem", b"CaSe", b"d$d"]


def make_corpus(r: random.Random) -> bytes:
    style = r.randrange(8)
    out = bytearray()
    size = r.choice([0, 1, 2, 7, 40, 300, 5000, 40000, 70000])
    while len(out) < size:
        if style == 0:
            out += b" ".join(r.choice(WORDS)
                             for _ in range(r.randint(1, 8)))
            out += r.choice([b"\n", b"\n", b"$$\n", b""])
        elif style == 1:
            out += bytes(r.randrange(256) for _ in range(32))
        elif style == 2:
            out += bytes(r.choice(b"ab\n") for _ in range(64))
        elif style == 3:
            out += bytes(r.choice(b"acgt") for _ in range(64))
            out += r.choice([b"\n", b""])
        elif style == 4:
            out += r.choice(WORDS) * r.randint(1, 9)
            out += r.choice([b"\n", b" ", b"$$"])
        elif style == 5:
            # very long lines: one newline per ~2KB (residue clamps)
            out += b" ".join(r.choice(WORDS) for _ in range(300))
            out += r.choice([b"\n", b""])
        elif style == 6:
            # latin-1 high bytes + words (codepage folds)
            out += bytes(r.choice(
                b"\xe9\xc9\xfc\xdc\x80\xa0ab ") for _ in range(48))
            out += r.choice([b"\n", b""])
        else:
            # NUL-sprinkled word soup (strncpy truncation paths)
            out += b" ".join(r.choice(WORDS)
                             for _ in range(r.randint(1, 8)))
            out += r.choice([b"\x00", b"\n", b""])
    if r.random() < 0.5 and out.endswith(b"\n"):
        out = out[:-1]
    return bytes(out[:size]) if size else bytes(out)


def make_args(r: random.Random):
    kind = r.randrange(7)
    if kind == 0:
        pat = r.choice([w.decode("latin-1") for w in WORDS])
    elif kind == 1:
        pat = "".join(r.choice("abxy") for _ in range(r.randint(1, 28)))
    elif kind == 2:
        pat = r.choice(["a(b|c)x", "ab#yz", "[a-h]ello", "wo.ds",
                        "x*y", "<al>pha", "h[^e]llo"])
    elif kind == 3:
        pat = r.choice(["alpha;hello", "a,b", "{alpha;bravo},koala",
                        "~hello", "alpha;~zz"])
    elif kind == 4:
        pat = "acgt" * r.randint(4, 8)          # DNA monkey4
    elif kind == 5:
        pat = "".join(r.choice("abcdefghijklmnop")
                      for _ in range(r.randint(21, 30)))  # monkey
    else:
        pat = "-" + r.choice(["ab", "hello", "a-b"])      # -e escape
    flags = []
    d = r.randrange(9)
    if d:
        if d <= 4 and kind != 2:
            flags.append("-%d" % d)
        elif d <= 4:
            flags.append("-%d" % r.randint(1, 2))
    for f, p in (("-c", .4), ("-i", .25), ("-n", .15), ("-b", .1),
                 ("-v", .15), ("-w", .15), ("-x", .08), ("-l", .05),
                 ("-u", .05), ("-G", .03), ("-s", .05), ("-t", .1),
                 ("-q", .08), ("-h", .08), ("-A", .05), ("-p", .05),
                 ("-k", .08)):
        if r.random() < p:
            flags.append(f)
    if r.random() < 0.06:
        flags += ["-L", r.choice(["3:0:0", "0:2:0", "0:0:2", "5:1:1"])]
    if r.random() < 0.25:
        flags += ["-d", r.choice(["$$", "o", "%%", "\\n", "ll"])]
    if r.random() < 0.1:
        flags += ["-D2", "-I1", "-S1"]
    return flags, pat


def make_corpus_straddle(r: random.Random) -> bytes:
    """Corpus whose size lands within +-24 bytes of a 32KB (or 64KB)
    mgrep block boundary -- the residue/seam machinery fires on every
    case instead of almost never."""
    blk = r.choice([32768, 32768, 65536])
    size = blk + r.randint(-24, 24)
    out = bytearray()
    style = r.randrange(4)
    while len(out) < size:
        if style == 0:
            out += b" ".join(r.choice(WORDS)
                             for _ in range(r.randint(1, 8)))
            out += r.choice([b"\n", b"\n", b"$$\n", b"", b"o"])
        elif style == 1:
            out += r.choice(WORDS) * r.randint(1, 9)
            out += r.choice([b"\n", b" ", b"$$", b"o", b"ll"])
        elif style == 2:
            # long lines: residues grow past MAXLINE (clamp regime)
            out += b" ".join(r.choice(WORDS) for _ in range(300))
            out += r.choice([b"\n", b""])
        else:
            out += bytes(r.choice(b"ab\nxyo$") for _ in range(64))
    return bytes(out[:size])


STRATA = ("f", "costs", "d", "w", "v", "t")

REGEX_POOL = [
    "a(b|c)x", "ab#yz", "[a-h]ello", "wo.ds", "x*y", "<al>pha",
    "h[^e]llo", "(al|br)a", "ko#la", "a[l-p]pha", "he(l|r)*o",
    "[abx]y[abx]", "al.ha", "b.a?o", "<he>(ll|xx)o",
]


def make_args_regex(r: random.Random):
    """Regex pattern x >=2 of {-d, costs, -w, -v, -t, -x, -B}: the
    intersections both existing modes sample at <1% joint probability
    (regex kind is 1/7 of uniform and absent from stratified)."""
    pool = ("d", "costs", "w", "v", "t", "x", "B")
    picks = r.sample(pool, r.choice([2, 2, 2, 3, 3]))
    flags = []
    if "costs" in picks:
        flags += ["-%d" % r.randint(1, 2)]
        if r.random() < 0.5:
            flags += ["-D%d" % r.choice([1, 2]),
                      "-I%d" % r.choice([1, 2]),
                      "-S%d" % r.choice([1, 2])]
    if "d" in picks:
        flags += ["-d", r.choice(["$$", "o", "ll", "%%", "\\n"])]
    if "w" in picks:
        flags.append("-w")
    if "v" in picks:
        flags.append("-v")
    if "t" in picks:
        flags.append("-t")
    if "x" in picks and "d" not in picks:
        flags.append("-x")
    if "B" in picks:
        flags = ["-B", "-y"] + flags
    for f, p in (("-c", .45), ("-i", .2), ("-n", .1), ("-b", .1),
                 ("-l", .05), ("-s", .08), ("-q", .08), ("-h", .08),
                 ("-u", .05), ("-k", .08)):
        if r.random() < p:
            flags.append(f)
    if r.random() < 0.06:
        flags += ["-L", r.choice(["3:0:0", "0:2:0", "5:1:1"])]
    pat = r.choice(REGEX_POOL)
    return flags, pat


def make_args_stratified(r: random.Random):
    """At least two of {-f, costs, -d, -w, -v, -t} per case."""
    picks = r.sample(STRATA, r.choice([2, 2, 2, 3, 3, 4]))
    flags = []
    use_f = "f" in picks
    if "costs" in picks:
        flags += ["-D%d" % r.choice([1, 2, 3]),
                  "-I%d" % r.choice([1, 2]), "-S%d" % r.choice([1, 2])]
    if "d" in picks:
        flags += ["-d", r.choice(["$$", "o", "ll", "%%", "\\n"])]
    if "w" in picks:
        flags.append("-w")
    if "v" in picks:
        flags.append("-v")
    if "t" in picks:
        flags.append("-t")
    for f, p in (("-c", .5), ("-i", .2), ("-b", .1), ("-l", .05),
                 ("-s", .08), ("-q", .08), ("-h", .08), ("-u", .05),
                 ("-k", .05)):
        if r.random() < p:
            flags.append(f)
    if not use_f and r.random() < 0.3:
        flags.append("-%d" % r.randint(1, 4))
    if r.random() < 0.06:
        flags += ["-L", r.choice(["3:0:0", "0:2:0", "5:1:1"])]
    pat = r.choice([w.decode("latin-1") for w in WORDS]
                   + ["alpha;hello", "a,b", "xy"])
    return flags, pat, use_f


def run_case(i, seed, tmpdir, stratified=False, regex=False):
    r = random.Random(seed)
    if regex:
        corpus = (make_corpus_straddle(r) if r.random() < 0.6
                  else make_corpus(r))
        flags, pat = make_args_regex(r)
        force_f = False
    elif stratified:
        corpus = make_corpus_straddle(r)
        flags, pat, force_f = make_args_stratified(r)
    else:
        corpus = make_corpus(r)
        flags, pat = make_args(r)
        force_f = False
    path = os.path.join(tmpdir, "c%d.txt" % (i % 8))
    with open(path, "wb") as f:
        f.write(corpus)
    paths = [path]
    if r.random() < 0.3:
        # multi-file: FNAME prefixes, per-file counts, -l lists
        path2 = os.path.join(tmpdir, "d%d.txt" % (i % 8))
        with open(path2, "wb") as f:
            f.write(make_corpus(r))
        paths.append(path2)
    if (force_f or r.random() < 0.15) and not regex:
        # -f pattern file instead of a single pattern
        npat = r.choice([2, 5, 30, 120])
        pats = [r.choice(WORDS).decode("latin-1")
                for _ in range(npat // 2)]
        pats += ["q%03d" % k for k in range(npat - len(pats))]
        pf = os.path.join(tmpdir, "p%d.txt" % (i % 8))
        with open(pf, "w") as f:
            f.write("".join(x + "\n" for x in pats))
        flags = [fl for fl in flags
                 if fl not in ("-x", "-G")] + ["-f", pf]
        args = flags + paths
    else:
        if r.random() < 0.06:
            flags = ["-B", "-y"] + [fl for fl in flags
                                    if fl not in ("-B", "-y")]
        if r.random() < 0.05:
            flags.append(r.choice(["-CP437", "-CP850"]))
        if pat.startswith("-"):
            flags.append("-e")
        args = flags + [pat] + paths
    p = subprocess.run([ORACLE] + args, capture_output=True, timeout=30)
    # mirror cli.main()'s error mapping in-process (subprocess startup
    # would dominate the sweep)
    from agrep_tpu import help as helpmod
    from agrep_tpu.api import fileagrep
    from agrep_tpu.options import AgrepError
    from agrep_tpu.runtime.output import OutputOverflow
    buf = io.BytesIO()
    try:
        rc = fileagrep(args, output=buf) & 0xFF
    except AgrepError as e:
        rc = 255
        if getattr(e, "version", False):
            import contextlib
            s = io.StringIO()
            with contextlib.redirect_stdout(s):
                helpmod.print_version()
            buf.write(s.getvalue().encode())
        elif getattr(e, "late", False) and getattr(e, "verbose", 1) > 0:
            buf.write(b"Grand Total: 0 match(es) found.\n")
    except OutputOverflow:
        rc = 255
    ours = buf.getvalue()
    if ours != p.stdout or rc != (p.returncode & 0xFF):
        if "-l" in args and rc == (p.returncode & 0xFF):
            # FILENAMEONLY early returns leave the reference's Grand
            # Total buffer uninitialized in some engines: its tail is
            # ASLR-dependent heap garbage (observed non-deterministic
            # across runs).  Compare only the filename lines then.
            cut = p.stdout.find(b"\x00")
            if cut != -1 and ours[:60].startswith(
                    p.stdout[:max(cut - 24, 1)][:40]):
                return None
        if ("-l" in args and "-d" in args and len(paths) > 1
                and any(f in args for f in ("-1", "-2", "-3", "-4"))):
            # asearch.c:237+264 (the -d FILENAMEONLY early return)
            # frees the scan buffer TWICE; the stdio buffer is then
            # carved from the freed chunk and freed again -- later
            # files' -l lines, the exit status, or the whole process
            # (SIGABRT under short argv paths) are heap-corruption
            # fallout, layout-dependent.  Classify when the oracle's
            # output is our filename-line prefix (or it aborted).
            first = ours.split(b"\n", 1)[0] + b"\n"
            o_clean = p.stdout.split(b"\x00")[0]
            # 134 = shell-style SIGABRT; 250 = raw returncode -6 & 0xFF
            if (p.returncode & 0xFF) in (134, 250) or (
                    p.stdout.startswith(first)
                    and ours.startswith(o_clean[:len(ours)])):
                print("  (documented -l double-free fallout, seed %d)"
                      % seed)
                return None
        return (seed, args, corpus, p.stdout, p.returncode & 0xFF,
                ours, rc)
    return None


def main():
    argv = sys.argv[1:]
    stratified = "--stratified" in argv
    regex = "--regex" in argv
    argv = [a for a in argv if a not in ("--stratified", "--regex")]
    n = int(argv[0]) if len(argv) > 0 else 500
    seed0 = int(argv[1]) if len(argv) > 1 else 1000
    import tempfile
    tmpdir = tempfile.mkdtemp(prefix="sweep_")
    bad = 0
    for i in range(n):
        try:
            res = run_case(i, seed0 + i, tmpdir, stratified, regex)
        except subprocess.TimeoutExpired:
            continue
        except Exception as e:      # noqa: BLE001 -- report and go on
            print("case seed=%d CRASH: %r" % (seed0 + i, e))
            bad += 1
            continue
        if res is not None:
            seed, args, corpus, o_out, o_rc, m_out, m_rc = res
            bad += 1
            print("DIVERGENCE seed=%d args=%r corpus[:80]=%r" %
                  (seed, args, corpus[:80]))
            print("  oracle rc=%d out[:120]=%r" % (o_rc, o_out[:120]))
            print("  ours   rc=%d out[:120]=%r" % (m_rc, m_out[:120]))
        if (i + 1) % 100 == 0:
            print("... %d/%d, %d divergences" % (i + 1, n, bad),
                  flush=True)
    print("sweep done: %d cases, %d divergences" % (n, bad))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
