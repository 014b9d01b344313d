"""Benchmark: scan throughput at k=2 errors on one chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference agrep's published exact-match rate is ~11 MB/s
on its 1992 hardware (BASELINE.md); as a living baseline we time the
reference binary itself at k=2 on this host and report our multiple of
it.  The headline metric is GB/s/chip of the k=2 mask-machine scan
(BASELINE.json).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SIZE_MB = int(os.environ.get("BENCH_MB", "256"))


def make_text(n_bytes: int) -> np.ndarray:
    rng = np.random.default_rng(7)
    words = [b"the", b"quick", b"brown", b"matching", b"pattern",
             b"approximate", b"search", b"hello", b"world", b"lorem",
             b"ipsum", b"bibliography"]
    # build ~1MB template of lines, then tile it
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
    """Time the k=2 bitap scan; returns bytes/sec."""
    from agrep_tpu.options import Options
    from agrep_tpu.compile.query import compile_query
    from agrep_tpu.ops.scan import _get_jit, _pad_and_window
    import jax
    import jax.numpy as jnp

    opts = Options(D=2, approx=True, linenum=True)
    q = compile_query("matching", opts)
    D, W, L = 2, 48, 2048
    windows, _ = _pad_and_window(text, W, L)
    c = q.consts
    cvec = jnp.asarray([c["init0"], c["init1_ns"], c["noerr"],
                        c["d_endpos"], c["endpos"], c["d_mask"], 0, 0],
                       dtype=jnp.uint32)
    scan = _get_jit()
    wnd = jax.device_put(jnp.asarray(windows))
    mask = jax.device_put(jnp.asarray(q.folded_mask))

    def run():
        ev = scan(wnd, mask, cvec, D, W, "bitap", None)
        # reduce on device so we don't time the event readback
        return jnp.sum((ev[:, W:] & jnp.uint32(c["endpos"])) != 0)

    out = run()
    out.block_until_ready()          # compile + warmup
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = run()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return len(text) / dt


def bench_reference(path: str) -> float:
    """Time the reference binary at k=2 on the same corpus file."""
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
    bps = bench_scan(text)

    ref_bps = 0.0
    try:
        import tempfile
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
