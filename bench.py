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

    opts = Options(D=2, approx=True, linenum=True)
    q = compile_query("matching", opts)
    c = q.consts
    D, W = 2, 48
    windows, _ = _pad_and_window(text, W, 2048 - W)
    wt = K.pack_windows(windows)
    del windows
    br = K.ranges_from_mask(q.folded_mask.astype(np.uint32))
    cvec = np.asarray([c["init0"], c["init1_ns"], c["noerr"],
                       c["d_endpos"], c["endpos"], c["d_mask"], 0, 0],
                      dtype=np.uint32)
    run = K._get_pallas_scan(D, W, br)
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

    times = {}
    for k in (1, KCHAIN):
        f = jax.jit(lambda b, k=k: many(b, k))
        int(f(bdev))                      # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(f(bdev))                  # fetch forces completion
            ts.append(time.perf_counter() - t0)
        times[k] = min(ts)
    per_exec = (times[KCHAIN] - times[1]) / (KCHAIN - 1)
    return len(text) / per_exec


def bench_reference(path: str) -> float:
    """Bytes/s of the reference binary at k=2 on the same corpus."""
    exe = os.path.join(REPO, ".oracle", "agrep")
    if not os.path.exists(exe):
        try:
            subprocess.check_call(
                [os.path.join(REPO, "tools", "build_oracle.sh")],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except Exception:
            return 0.0
    t0 = time.perf_counter()
    subprocess.run([exe, "-2", "-c", "matching", path],
                   capture_output=True)
    dt = time.perf_counter() - t0
    return os.path.getsize(path) / dt


def main():
    text = make_text(SIZE_MB << 20)
    # the remote-TPU tunnel occasionally drops a request mid-compile;
    # a transient failure must not zero out the round's benchmark
    last_err = None
    bps = 0.0
    for attempt in range(3):
        try:
            bps = bench_scan(text)
            break
        except Exception as e:   # noqa: BLE001 -- retry any backend error
            last_err = e
            time.sleep(30 * (attempt + 1))
    if bps == 0.0 and last_err is not None:
        print("bench failed after retries: %r" % last_err, file=sys.stderr)

    ref_bps = 0.0
    try:
        f = tempfile.NamedTemporaryFile(delete=False, suffix=".txt")
        ref_mb = min(SIZE_MB, 64)
        f.write(text[:ref_mb << 20].tobytes())
        f.close()
        ref_bps = bench_reference(f.name)
        os.unlink(f.name)
    except Exception:
        pass

    gbs = bps / 1e9
    vs = (bps / ref_bps) if ref_bps > 0 else 0.0
    print(json.dumps({
        "metric": "k2_scan_throughput_per_chip",
        "value": round(gbs, 3),
        "unit": "GB/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
