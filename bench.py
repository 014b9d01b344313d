"""Benchmark: k=2 mask-machine scan throughput on one TPU chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology.  The remote-TPU harness has two traps that inflate naive
timings: identical (program, input) dispatches can be served from a
terminal-side cache, and block_until_ready() can return before the
result is actually materialized -- only fetching the scalar forces
completion.  So we time K chained kernel executions inside ONE jit
(each distinguished by an unused SMEM constant, which XLA cannot CSE
through an opaque pallas_call) against 1 execution, fetch the scalar
both times, and take the slope: (t_K - t_1) / (K - 1) is pure device
time per pass with dispatch/fetch latency cancelled out.

Baseline: the same corpus scanned by the reference agrep binary at
k=2 on this host's CPU (bytes/s); vs_baseline is our multiple of it.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SIZE_MB = int(os.environ.get("BENCH_MB", "256"))
KCHAIN = int(os.environ.get("BENCH_K", "9"))


def make_text(n_bytes: int) -> np.ndarray:
    rng = np.random.default_rng(7)
    words = [b"the", b"quick", b"brown", b"matching", b"pattern",
             b"approximate", b"search", b"hello", b"world", b"lorem",
             b"ipsum", b"bibliography"]
    chunks = []
    total = 0
    while total < (1 << 20):
        line = b" ".join(words[i] for i in
                         rng.integers(0, len(words), 8)) + b"\n"
        chunks.append(line)
        total += len(line)
    tmpl = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    reps = -(-n_bytes // len(tmpl))
    return np.tile(tmpl, reps)[:n_bytes]


def bench_scan(text: np.ndarray) -> float:
    """Device time of the k=2 Pallas scan; returns bytes/sec."""
    import jax
    import jax.numpy as jnp
    from agrep_tpu.options import Options
    from agrep_tpu.compile.query import compile_query
    from agrep_tpu.ops import kernels as K
    from agrep_tpu.ops.scan import _pad_and_window

    return bench_mask_machine(text, D=2)


def bench_mask_machine(text: np.ndarray, D: int,
                       costs: tuple | None = None,
                       pattern: str = "matching") -> float:
    """Device time of the D-error Pallas mask-machine scan (optionally
    with non-uniform -D/-I/-S costs); returns bytes/sec."""
    import jax
    import jax.numpy as jnp
    from agrep_tpu.options import Options
    from agrep_tpu.compile.query import compile_query
    from agrep_tpu.ops import kernels as K
    from agrep_tpu.ops.scan import _pad_and_window

    opts = Options(D=D, approx=D > 0, linenum=True)
    if costs is not None:
        ci, cs, cd = costs
        opts.jump = True
        opts.cost_insert, opts.cost_subst, opts.cost_delete = ci, cs, cd
    q = compile_query(pattern, opts)
    c = q.consts
    W = 48
    windows, _ = _pad_and_window(text, W, 2048 - W)
    wt = K.pack_windows(windows)
    del windows
    br = K.ranges_from_mask(q.folded_mask.astype(np.uint32))
    cvec = np.asarray([c["init0"], c["init1_ns"], c["noerr"],
                       c["d_endpos"], c["endpos"], c["d_mask"], 0, 0],
                      dtype=np.uint32)
    run = K._get_pallas_scan(D, W, br, "bitap", (), False, K.ROWS,
                             q.costs, K._single_bit(cvec[3]),
                             K._single_bit(cvec[4]))
    bdev = jax.device_put(jnp.asarray(wt))
    jax.block_until_ready(bdev)
    del wt

    def many(b, k):
        s = jnp.uint32(0)
        for i in range(k):
            # consts[6] is unused by the kernel: it only defeats CSE
            cv = jnp.asarray(cvec).at[6].set(np.uint32(i))
            d, h = run(b, cv)
            s = s + jnp.sum(h) + jnp.sum(d)
        return s

    # slope over (1, KCHAIN) executions; the short-chain time carries
    # most of the dispatch noise through the tunnel, so take the MIN of
    # several interleaved samples of each (observed 54-70 GB/s
    # run-to-run at min-of-3; min-of-6 interleaved pins the floor)
    fns = {k: jax.jit(lambda b, k=k: many(b, k)) for k in (1, KCHAIN)}
    times = {k: 1e9 for k in fns}
    for k, f in fns.items():
        int(f(bdev))                      # compile + warm
    for _ in range(6):
        for k, f in fns.items():
            t0 = time.perf_counter()
            int(f(bdev))                  # fetch forces completion
            times[k] = min(times[k], time.perf_counter() - t0)
    per_exec = (times[KCHAIN] - times[1]) / (KCHAIN - 1)
    return len(text) / per_exec


def bench_regex(text: np.ndarray) -> float:
    """Device time of the regex-with-errors lanes kernel (D=2);
    bytes/sec over a record bucket built from the corpus shape."""
    import jax
    import jax.numpy as jnp
    from agrep_tpu.options import Options
    from agrep_tpu.compile.query import compile_query
    from agrep_tpu.ops import renfa_kernel as RK

    q = compile_query("wo(r|t)king", Options(D=2, approx=True))
    mc = q.re_mc
    br = RK.ranges_wide(mc["mask"].astype(np.uint32))
    Rb, Lb = 128 * RK.GLANES, 512
    nbytes = Rb * Lb
    lanes = np.ascontiguousarray(text[:nbytes]).reshape(Rb, Lb).copy()
    lanes[lanes == 0x0A] = 0x20      # one record per lane
    lanes[:, Lb - 2] = 0x0A
    run = RK._get_lanes_kernel(
        int(mc["D"]), int(mc["M"]), br,
        tuple(int(v) for v in mc["follow_bits"]),
        int(mc["head_bit"]), int(mc["init1"]), int(mc["no_err"]),
        tuple(int(v) for v in mc["inits"]), bool(mc["tail"]),
        False, RK.ROWS)
    S = -(-Lb // RK.ROWS) * RK.ROWS
    G = Rb // RK.GLANES
    lp = np.zeros((Rb, S), dtype=np.uint8)
    lp[:, :Lb] = lanes
    lanes_t = np.ascontiguousarray(
        lp.reshape(G, RK.SUB, RK.LANE, S).transpose(3, 0, 1, 2))
    lv = np.full((1, G, RK.SUB, RK.LANE), Lb - 2, dtype=np.int32)
    lt = jax.device_put(jnp.asarray(lanes_t))
    lvt = jax.device_put(jnp.asarray(lv))

    def many(args, k):
        lt, lvt = args
        s = jnp.uint32(0)
        for i in range(k):
            out = run(lt.at[0, 0, 0, 0].set(np.uint8(i)), lvt)
            s = s + jnp.sum(out)
        return s

    f = jax.jit(many, static_argnums=1)
    # min-of-6 interleaved samples (see bench_mask_machine)
    times = {k: 1e9 for k in (1, 9)}
    for k in times:
        int(f((lt, lvt), k))              # compile + warm
    for _ in range(6):
        for k in times:
            t0 = time.perf_counter()
            int(f((lt, lvt), k))
            times[k] = min(times[k], time.perf_counter() - t0)
    per = (times[9] - times[1]) / 8
    return nbytes / per


def _host_backend():
    """Context pinning the HOST scan backend for end-to-end -f rows.

    The engine is device-first by design: on a real TPU host the chain
    kernel wins.  This bench box reaches its chip through a ~0.04 GB/s
    tunnel, so an end-to-end row that uploads the corpus measures the
    tunnel, not the engine -- the device rate is reported by the
    corpus-resident f100_chain_kernel row instead."""
    import contextlib
    from agrep_tpu.ops import scan as scan_ops

    @contextlib.contextmanager
    def cm():
        old = scan_ops._BACKEND
        scan_ops.set_backend("numpy")
        try:
            yield
        finally:
            scan_ops.set_backend(old)
    return cm()


def bench_f100(path: str, patfile: str) -> float:
    """End-to-end bytes/s of the one-pass 100-pattern -f search on the
    HOST path (see _host_backend).  Best of two: the first run pays
    compile/page-fault warmup."""
    import io
    from agrep_tpu.api import fileagrep
    best = 0.0
    with _host_backend():
        for _ in range(2):
            t0 = time.perf_counter()
            fileagrep(["-c", "-f", patfile, path], output=io.BytesIO())
            dt = time.perf_counter() - t0
            best = max(best, os.path.getsize(path) / dt)
    return best


def bench_f100_chain_kernel(text: np.ndarray, patfile: str) -> float:
    """Device time of the 100-term exact chain kernel
    (ops/chain_kernel.py) -- the one-pass -f scan with the corpus
    resident in HBM; returns bytes/sec."""
    import jax
    import jax.numpy as jnp
    from agrep_tpu.ops import chain_kernel as CK
    from agrep_tpu.ops import kernels as K

    terms = [ln.encode() for ln in open(patfile).read().splitlines()
             if ln]
    tr = np.arange(256, dtype=np.uint8)
    prog = CK.compile_chain(terms, tr)
    if prog is None:
        return 0.0
    eq_specs, term_specs = prog[0], prog[1]
    N = len(text)
    L, H = CK.LANE_BODY, CK.TAIL_HALO
    rows = K.ROWS
    T = -(-N // L)
    G = -(-T // K.GLANES)
    S = (-(-(L + H) // rows) * rows) + rows
    wt = CK._get_tail_packer()(jnp.asarray(text), H, L, T, G, S)
    jax.block_until_ready(wt)
    run = CK._get_chain_kernel(eq_specs, term_specs, False, rows)

    def many(b, k):
        s = jnp.uint32(0)
        for i in range(k):
            # poke one halo byte per iteration to defeat CSE; the
            # update cost is negligible vs the scan
            bi = b.at[S - 1, 0, 0, 0].set(jnp.uint8(i & 0xFF))
            s = s + jnp.sum(run(bi))
        return s

    # min-of-6 interleaved (1, 5)-chain samples, like the mask-machine
    # slope: min-of-3 sequential showed a 63-90 GB/s run-to-run band
    # from tunnel dispatch noise in the short-chain term
    fns = {k: jax.jit(lambda b, k=k: many(b, k)) for k in (1, 5)}
    times = {k: 1e9 for k in fns}
    for k, f in fns.items():
        int(f(wt))                        # compile + warm
    for _ in range(6):
        for k, f in fns.items():
            t0 = time.perf_counter()
            int(f(wt))
            times[k] = min(times[k], time.perf_counter() - t0)
    per_exec = (times[5] - times[1]) / 4
    return N / per_exec


def make_patfile(dirpath: str) -> str:
    import random
    rnd = random.Random(11)
    words = ["the", "quick", "brown", "matching", "pattern",
             "approximate", "search", "hello", "world", "lorem"]
    pats = []
    for i in range(100):
        r = i % 3
        if r == 0:
            pats.append(rnd.choice(words))
        elif r == 1:
            pats.append("nosuch%03d" % i)
        else:
            pats.append(rnd.choice(words)[:3] + rnd.choice(words)[-3:])
    p = os.path.join(dirpath, "bench_pats.txt")
    open(p, "w").write("".join(x + "\n" for x in pats))
    return p


def make_para_corpus(dirpath: str, n_mb: int = 128,
                     name: str = "bench_para.txt") -> str:
    """'$$'-delimited paragraph corpus (BASELINE config 5 records)."""
    import random
    rnd = random.Random(3)
    words = ["the", "quick", "brown", "matching", "pattern",
             "approximate", "search", "hello", "world", "lorem"]
    paras = []
    tot = 0
    while tot < (1 << 20):
        p = "\n".join(" ".join(rnd.choices(words,
                                           k=rnd.randint(4, 8)))
                      for _ in range(rnd.randint(2, 5))) + "\n$$\n"
        paras.append(p)
        tot += len(p)
    tmpl = "".join(paras).encode()
    path = os.path.join(dirpath, name)
    with open(path, "wb") as f:
        for _ in range(n_mb):
            f.write(tmpl)
    return path


def bench_f100_records(para_path: str, patfile: str) -> float:
    """End-to-end bytes/s of 100-pattern -f with -d '$$' records --
    BASELINE config 5's exact shape (one-pass filter + replay walk)."""
    import io
    from agrep_tpu.api import fileagrep
    best = 0.0
    with _host_backend():
        for _ in range(2):
            t0 = time.perf_counter()
            fileagrep(["-c", "-d", "$$", "-f", patfile, para_path],
                      output=io.BytesIO())
            dt = time.perf_counter() - t0
            best = max(best, os.path.getsize(para_path) / dt)
    return best


def _oracle_exe() -> str | None:
    exe = os.path.join(REPO, ".oracle", "agrep")
    if not os.path.exists(exe):
        try:
            subprocess.check_call(
                [os.path.join(REPO, "tools", "build_oracle.sh")],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except Exception:
            return None
    return exe


def bench_reference(path: str, args: list | None = None) -> float:
    """Bytes/s of the reference binary on the same corpus."""
    exe = _oracle_exe()
    if exe is None:
        return 0.0
    if args is None:
        args = ["-2", "-c", "matching"]
    t0 = time.perf_counter()
    subprocess.run([exe] + args + [path], capture_output=True)
    dt = time.perf_counter() - t0
    return os.path.getsize(path) / dt


# ---------------------------------------------------------------------
# Conformance gate (VERDICT r3 #1): before any timing row is trusted,
# the DEVICE path (AGREP_TPU_BACKEND=jax on the real chip, i.e. the
# Mosaic-compiled kernels, not the interpreter) must produce
# byte-identical CLI output vs the oracle binary, and the raw kernel
# event planes must equal the numpy backend's bit-for-bit.  A Mosaic
# miscompile now turns the JSON's "conformance" field into
# "FAIL:<labels>" instead of shipping silently behind a fast number.
# ---------------------------------------------------------------------

def gate_cli(args: list, label: str, failures: list) -> None:
    """Oracle binary vs in-process device-path fileagrep, byte-equal."""
    import io
    from agrep_tpu.api import fileagrep
    from agrep_tpu.options import AgrepError
    exe = _oracle_exe()
    if exe is None:
        failures.append(label + ":no-oracle")
        return
    p = subprocess.run([exe] + args, capture_output=True)
    o_out, o_rc = p.stdout, p.returncode & 0xFF
    buf = io.BytesIO()
    try:
        m_rc = fileagrep(list(args), output=buf) & 0xFF
    except AgrepError:
        m_rc = 2
    except Exception as e:
        failures.append("%s:%s" % (label, type(e).__name__))
        return
    if buf.getvalue() != o_out or m_rc != o_rc:
        failures.append(label)


def gate_kernel_events(text: np.ndarray, D: int, costs: tuple | None,
                       label: str, failures: list,
                       pattern: str = "matching") -> None:
    """Pallas (device) event stream == numpy backend event stream."""
    from agrep_tpu.options import Options
    from agrep_tpu.compile.query import compile_query
    from agrep_tpu.ops import scan
    opts = Options(D=D, approx=D > 0, linenum=True)
    if costs is not None:
        ci, cs, cd = costs
        opts.jump = True
        opts.cost_insert, opts.cost_subst, opts.cost_delete = ci, cs, cd
    q = compile_query(pattern, opts)
    mt = q.folded_mask.astype(np.uint32)
    try:
        scan.set_backend("jax")
        ev_dev = scan.scan_events(text, mt, q.consts, D, "bitap", q.costs)
        scan.set_backend("numpy")
        ev_np = scan.scan_events(text, mt, q.consts, D, "bitap", q.costs)
    except Exception as e:
        failures.append("%s:%s" % (label, type(e).__name__))
        return
    finally:
        scan.set_backend("jax")
    if not np.array_equal(ev_dev, ev_np):
        failures.append(label)


def gate_regex_lanes(text: np.ndarray, label: str, failures: list) -> None:
    """Regex lanes kernel on device == numpy record runner."""
    from agrep_tpu.options import Options
    from agrep_tpu.compile.query import compile_query
    from agrep_tpu.ops import renfa
    from agrep_tpu.ops.renfa_kernel import pallas_scan_records
    q = compile_query("wo(r|t)king", Options(D=2, approx=True))
    mc = q.re_mc
    R, L = 512, 192
    lanes = np.ascontiguousarray(text[:R * L]).reshape(R, L).copy()
    lanes[lanes == 0x0A] = 0x20
    lanes[:, L - 2] = 0x0A
    lens = np.full(R, L - 2, dtype=np.int64)
    cs = mc["inits"]
    try:
        want = renfa._scan_records_np(lanes, lens, mc, cs, cs)
        got = pallas_scan_records(lanes, lens, mc)
    except Exception as e:
        failures.append("%s:%s" % (label, type(e).__name__))
        return
    if got is None:
        failures.append(label + ":kernel-unavailable")
        return
    if not np.array_equal(np.asarray(got), want):
        failures.append(label)


def gate_chain(text: np.ndarray, patfile: str, label: str,
               failures: list) -> None:
    """Device chain-kernel starts == naive numpy multi-pattern oracle."""
    from agrep_tpu.ops import chain_kernel as CK
    terms = [ln.encode() for ln in open(patfile).read().splitlines()
             if ln]
    tr = np.arange(256, dtype=np.uint8)
    prog = CK.compile_chain(terms, tr)
    if prog is None:
        failures.append(label + ":compile-rejected")
        return
    try:
        got = CK.chain_match_starts(text, prog)
    except Exception as e:
        failures.append("%s:%s" % (label, type(e).__name__))
        return
    folded = tr[text]
    hits = np.zeros(len(text), dtype=bool)
    for t in terms:
        tf = tr[np.frombuffer(t, dtype=np.uint8)]
        L = len(tf)
        m = np.ones(len(text) - L + 1, dtype=bool)
        for k in range(L):
            m &= folded[k:len(text) - L + 1 + k] == tf[k]
        hits[:len(m)] |= m
    want = np.flatnonzero(hits)
    if not np.array_equal(got, want):
        failures.append(label)


def gate_qgram(text: np.ndarray, patfile: str, label: str,
               failures: list) -> None:
    """Device q-gram member filter == direct numpy membership test."""
    from agrep_tpu.compile import multi as M
    from agrep_tpu.ops import qgram_kernel
    terms = [ln.encode() for ln in open(patfile).read().splitlines()
             if ln]
    tr = np.arange(256, dtype=np.uint8)
    tb = M.build_qgram_tables(terms, tr)
    proj = M.member_projection_1024(tb)
    if proj is None:
        return   # projection not available for this table shape
    try:
        got = qgram_kernel.qgram_candidates(text, proj)
    except Exception as e:
        failures.append("%s:%s" % (label, type(e).__name__))
        return
    tr1 = (tr & 31).astype(np.uint32)
    f = tr1[text]
    prev = np.concatenate([[np.uint32(0)], f[:-1]])
    want = np.flatnonzero(proj[(f << 5) | prev])
    if not np.array_equal(np.asarray(got), want):
        failures.append(label)


def run_conformance_gate(tmpd: str, patfile: str, para_path: str,
                         text: np.ndarray) -> str:
    """Run every gate; returns "pass" or "FAIL:<labels>"."""
    failures: list = []
    conf_path = os.path.join(tmpd, "conf.txt")
    conf_mb = 8
    with open(conf_path, "wb") as f:
        f.write(text[:conf_mb << 20].tobytes())
    # CLI gates: one per benchmarked config class plus print modes,
    # all through the real engine on the device backend.
    gate_cli(["-c", "matching", conf_path], "cli_exact_count", failures)
    gate_cli(["-n", "bibliography", conf_path], "cli_exact_print",
             failures)
    gate_cli(["-1", "-c", "matching", conf_path], "cli_sgrep_k1",
             failures)
    gate_cli(["-2", "-c", "matching", conf_path], "cli_k2", failures)
    gate_cli(["-3", "-D2", "-I1", "-S1", "-c", "matching", conf_path],
             "cli_costs", failures)
    gate_cli(["-2", "-c", "wo(r|t)king", conf_path], "cli_regex",
             failures)
    gate_cli(["-c", "-f", patfile, conf_path], "cli_f100", failures)
    gate_cli(["-c", "-d", "$$", "-f", patfile, para_path],
             "cli_f100_records", failures)
    # Raw kernel gates: event-plane equality vs the numpy backend.
    # Half the bytes are the timed corpus; half are uniform random over
    # the full 0-255 range so that compare-tree aliasing bugs (wrong
    # equality constant, off-by-one range bound) cannot hide behind the
    # 12-word bench vocabulary.
    rnd = np.random.default_rng(11).integers(
        0, 256, 2 << 20, dtype=np.uint8).astype(np.uint8)
    ktext = np.concatenate([text[:2 << 20], rnd])
    gate_kernel_events(ktext, 0, None, "kernel_k0", failures)
    gate_kernel_events(ktext, 2, None, "kernel_k2", failures)
    gate_kernel_events(ktext, 3, (1, 1, 2), "kernel_costs", failures)
    gate_kernel_events(ktext, 1, None, "kernel_class18", failures,
                       pattern="[a1c3e5g7i9k!m#o%q=]atching")
    gate_regex_lanes(ktext, "kernel_regex", failures)
    gate_qgram(text[:1 << 20], patfile, "kernel_qgram", failures)
    gate_chain(ktext, patfile, "kernel_chain", failures)
    return "pass" if not failures else "FAIL:" + ",".join(failures)


def _retry(fn, *args, tries=3):
    """The remote-TPU tunnel occasionally drops a request mid-compile;
    a transient failure must not zero out the round's benchmark."""
    last_err = None
    for attempt in range(tries):
        try:
            return fn(*args)
        except Exception as e:   # noqa: BLE001 -- retry any backend error
            last_err = e
            time.sleep(30 * (attempt + 1))
    print("bench %s failed after retries: %r" % (fn.__name__, last_err),
          file=sys.stderr)
    return 0.0


def main():
    text = make_text(SIZE_MB << 20)

    # reference corpus on disk (bounded size: the C binary is ~0.25GB/s)
    ref_mb = min(SIZE_MB, 64)
    tmpd = tempfile.mkdtemp(prefix="agrep_bench_")
    path = os.path.join(tmpd, "corpus.txt")
    with open(path, "wb") as f:
        f.write(text[:ref_mb << 20].tobytes())
    patfile = make_patfile(tmpd)

    # conformance gate first: every timing row below is only
    # meaningful if the device path is byte-exact vs the oracle
    conf_para = make_para_corpus(tmpd, n_mb=8, name="conf_para.txt")
    conformance = _retry(run_conformance_gate, tmpd, patfile,
                         conf_para, text, tries=2)
    if not isinstance(conformance, str):
        conformance = "FAIL:gate-crashed"

    # headline: k=2 mask-machine Pallas scan
    bps = _retry(bench_scan, text)

    # BASELINE config breadth (VERDICT round-1 item #6): every config
    # class gets a number; sub-rows ride inside the single JSON line
    configs = {}

    def cfg(name, ours_bps, ref_args):
        ref = 0.0
        try:
            ref = bench_reference(path, ref_args)
        except Exception:
            pass
        configs[name] = {
            "gbs": round(ours_bps / 1e9, 3),
            "ref_gbs": round(ref / 1e9, 4),
            "vs_ref": round(ours_bps / ref, 1) if ref > 0 else 0.0,
        }

    cfg("exact_k0", _retry(bench_mask_machine, text, 0),
        ["-c", "matching"])
    cfg("costs_k3_D2I1S1", _retry(bench_mask_machine, text, 3,
                                  (1, 1, 2)),
        ["-3", "-D2", "-I1", "-S1", "-c", "matching"])
    cfg("regex_k2", _retry(bench_regex, text),
        ["-2", "-c", "wo(r|t)king"])
    cfg("f100_onepass", _retry(bench_f100, path, patfile),
        ["-c", "-f", patfile])
    # device-resident one-pass -f scan (the chain kernel): same slope
    # methodology as every other kernel row
    configs["f100_chain_kernel"] = {
        "gbs": round(_retry(bench_f100_chain_kernel, text, patfile)
                     / 1e9, 3),
        "ref_gbs": configs["f100_onepass"]["ref_gbs"],
    }
    ck = configs["f100_chain_kernel"]
    ck["vs_ref"] = (round(ck["gbs"] / ck["ref_gbs"], 1)
                    if ck["ref_gbs"] > 0 else 0.0)

    # END-TO-END device engagement (VERDICT r4 #3): the real CLI with
    # the corpus-placement gate forced open -- fileagrep -> mgrep ->
    # chain kernel -> host walk, counts checked against the oracle
    # inline.  On this harness the wall time is upload-bound (the
    # tunnel moves ~0.04 GB/s; link_gbs is reported so a real TPU
    # host's number is interpretable); the row PROVES the device path
    # end-to-end rather than inferring it from the kernel row.
    def bench_f100_device_e2e():
        import io
        import subprocess
        from agrep_tpu.api import fileagrep
        from agrep_tpu.ops import scan as scan_ops
        e2e_path = os.path.join(tmpd, "dev_e2e.txt")
        e2e_mb = 16
        with open(e2e_path, "wb") as f:
            f.write(text[:e2e_mb << 20].tobytes())
        exe = _oracle_exe()
        ref_out = subprocess.run(
            [exe, "-c", "-f", patfile, e2e_path],
            capture_output=True).stdout if exe else None
        os.environ["AGREP_TPU_ASSUME_FAST_LINK"] = "1"
        try:
            best, out = 0.0, b""
            for _ in range(2):
                buf = io.BytesIO()
                t0 = time.perf_counter()
                fileagrep(["-c", "-f", patfile, e2e_path], output=buf)
                dt = time.perf_counter() - t0
                if (e2e_mb << 20) / dt > best:
                    best = (e2e_mb << 20) / dt
                out = buf.getvalue()
        finally:
            os.environ.pop("AGREP_TPU_ASSUME_FAST_LINK", None)
        ok = out == ref_out
        return best, ok, round(scan_ops.device_put_bandwidth(), 3)

    dev_bps, dev_ok, link = _retry(bench_f100_device_e2e) or (0.0,
                                                              False, 0)
    configs["f100_device_e2e"] = {
        "gbs": round(dev_bps / 1e9, 3),
        "ref_gbs": configs["f100_onepass"]["ref_gbs"],
        "conformance": "pass" if dev_ok else "FAIL",
        "link_gbs": link,
        "note": "CLI end-to-end, device route forced; upload-bound "
                "on this tunnel harness",
    }
    de = configs["f100_device_e2e"]
    de["vs_ref"] = (round(de["gbs"] / de["ref_gbs"], 1)
                    if de["ref_gbs"] > 0 else 0.0)
    para = make_para_corpus(tmpd)
    configs["f100_records"] = {
        "gbs": round(_retry(bench_f100_records, para, patfile) / 1e9,
                     3),
        "ref_gbs": round(bench_reference(
            para, ["-c", "-d", "$$", "-f", patfile]) / 1e9, 4),
    }
    c5 = configs["f100_records"]
    c5["vs_ref"] = (round(c5["gbs"] / c5["ref_gbs"], 1)
                    if c5["ref_gbs"] > 0 else 0.0)

    # kernel-eligibility fallback row (VERDICT r3 #8): a class with 18
    # scattered characters exceeds the compare-tree budget (16 tests
    # per bit), so _try_pallas rejects it ("mask-ranges") and the scan
    # rides the vectorized host backend.  This row makes that fallback cost
    # visible next to the kernel rows; AGREP_TPU_STATS=2 names the
    # rejection reason (pallas_reject_mask-ranges).
    FB_PAT = "[a1c3e5g7i9k!m#o%q=]atching"

    # round 5: the scattered class decomposes into cube tests
    # (kernels.ranges_from_mask) and rides the same Pallas mask
    # machine as every other shape -- same slope methodology
    fb_bps = _retry(bench_mask_machine, text, 1, None, FB_PAT)
    configs["fallback_class18"] = {
        "gbs": round(fb_bps / 1e9, 3),
        "ref_gbs": round(bench_reference(
            path, ["-1", "-c", FB_PAT]) / 1e9, 4),
        "note": "18-char scattered class, cube-cover kernel path",
    }
    fbc = configs["fallback_class18"]
    fbc["vs_ref"] = (round(fbc["gbs"] / fbc["ref_gbs"], 1)
                     if fbc["ref_gbs"] > 0 else 0.0)

    ref_bps = bench_reference(path)
    try:
        import shutil
        shutil.rmtree(tmpd)
    except Exception:
        pass

    gbs = bps / 1e9
    vs = (bps / ref_bps) if ref_bps > 0 else 0.0
    print(json.dumps({
        "metric": "k2_scan_throughput_per_chip",
        "value": round(gbs, 3),
        "unit": "GB/s",
        "vs_baseline": round(vs, 2),
        "conformance": conformance,
        "configs": configs,
    }))


if __name__ == "__main__":
    main()
