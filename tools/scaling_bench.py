"""Scaling harness: sharded-scan bytes/s at 1/2/4/8 devices.

Runs the Executor's sharded scan path (ops/scan.py
_scan_windows_jax_sharded) at each device count in a fresh subprocess
(device count must be fixed before jax initializes) and reports the
bytes/s curve + parallel efficiency.

On the CPU simulator the "devices" share physical cores, so efficiency
here validates the PARTITIONING (no serialization, no duplicated work,
correct merge), not ICI bandwidth; the same harness run on a real
multi-chip slice measures true scaling.  Usage:

    python tools/scaling_bench.py [--mb 64] [--devices 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = """
import json, os, sys, time
import numpy as np
sys.path.insert(0, %(repo)r)
from agrep_tpu.options import Options
from agrep_tpu.compile.query import compile_query
from agrep_tpu.ops import scan as scan_ops

n_mb = %(mb)d
rng = np.random.default_rng(7)
text = rng.integers(32, 127, size=n_mb << 20, dtype=np.uint8)
text[::70] = 0x0A
q = compile_query("matching", Options(D=2, approx=True, linenum=True))
scan_ops.set_backend("jax")
import jax
assert jax.device_count() == %(nd)d, jax.device_count()
# warm (compile)
scan_ops.scan_events(text[: 1 << 20], q.folded_mask, q.consts, 2)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    ev = scan_ops.scan_events(text, q.folded_mask, q.consts, 2)
    best = min(best, time.perf_counter() - t0)
n_ev = int(np.count_nonzero(ev))
print(json.dumps({"devices": %(nd)d, "bytes": len(text),
                  "sec": best, "bps": len(text) / best,
                  "events": n_ev}))
"""


OVERHEAD_WORKER = """
import json, os, sys, time
import numpy as np
sys.path.insert(0, %(repo)r)
from agrep_tpu.options import Options
from agrep_tpu.compile.query import compile_query
from agrep_tpu.ops import scan as scan_ops

# Partition-overhead measurement (BASELINE.md): the CPU-sim efficiency
# table is confounded by core sharing, so instead run the SAME N-way
# tile partition SEQUENTIALLY on one device and compare against the
# unpartitioned scan -- the difference is exactly the partition's cost
# (per-shard dispatch, ceil-padding, transfers, ordered event merge)
# with zero contention.  On real hardware the shards run concurrently,
# so per-chip throughput ~= whole / (1 + overhead).
n_mb = %(mb)d
n_shards = %(ns)d
rng = np.random.default_rng(7)
text = rng.integers(32, 127, size=n_mb << 20, dtype=np.uint8)
text[::70] = 0x0A
q = compile_query("matching", Options(D=2, approx=True, linenum=True))
mt = q.folded_mask.astype(np.uint32)
c = q.consts
W, L = 48, 2048 - 48
windows, T = scan_ops._pad_and_window(text, W, L)
cvec = np.asarray([c["init0"], c["init1_ns"], c["noerr"], c["d_endpos"],
                   c["endpos"], c["d_mask"], 0, 0], dtype=np.uint32)
fn = scan_ops._get_jit()
import jax.numpy as jnp

def run_whole():
    return np.asarray(fn(jnp.asarray(windows), jnp.asarray(mt),
                         jnp.asarray(cvec), 2, W, "bitap", None))

def run_parts():
    per = -(-T // n_shards)
    outs = []
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, T)
        if lo >= hi:
            break
        outs.append(np.asarray(fn(jnp.asarray(windows[lo:hi]),
                                  jnp.asarray(mt), jnp.asarray(cvec),
                                  2, W, "bitap", None)))
    return np.concatenate(outs, axis=0)

ev_w = run_whole()          # warm/compile both shapes
ev_p = run_parts()
assert np.array_equal(ev_w, ev_p), "partition changed results!"
tw = tp = 1e9
for _ in range(7):
    t0 = time.perf_counter(); run_whole(); tw = min(tw, time.perf_counter() - t0)
    t0 = time.perf_counter(); run_parts(); tp = min(tp, time.perf_counter() - t0)
print(json.dumps({"shards": n_shards, "whole_s": tw, "parts_s": tp,
                  "overhead_pct": 100.0 * (tp / tw - 1.0)}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--overhead", action="store_true",
                    help="measure partition overhead (sequential "
                         "shards on ONE device, no core contention)")
    args = ap.parse_args()
    if args.overhead:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for ns in (int(x) for x in args.devices.split(",")):
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env.pop("PALLAS_AXON_POOL_IPS", None)
            code = OVERHEAD_WORKER % dict(repo=repo, mb=args.mb, ns=ns)
            p = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, env=env, text=True)
            if p.returncode != 0:
                print("shards=%d FAILED:\n%s" % (ns, p.stderr[-800:]),
                      file=sys.stderr)
                continue
            row = json.loads(p.stdout.strip().splitlines()[-1])
            print("%d shard(s): whole %.3fs  sequential-parts %.3fs  "
                  "partition overhead %+.1f%%"
                  % (row["shards"], row["whole_s"], row["parts_s"],
                     row["overhead_pct"]))
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for nd in (int(x) for x in args.devices.split(",")):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=%d"
                            % nd)
        code = WORKER % dict(repo=repo, mb=args.mb, nd=nd)
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, env=env, text=True)
        if p.returncode != 0:
            print("devices=%d FAILED:\n%s" % (nd, p.stderr[-800:]),
                  file=sys.stderr)
            continue
        row = json.loads(p.stdout.strip().splitlines()[-1])
        rows.append(row)
        base = rows[0]["bps"]
        eff = row["bps"] / (base * row["devices"] / rows[0]["devices"])
        print("%d device(s): %7.1f MB/s  events=%d  efficiency=%.0f%%"
              % (row["devices"], row["bps"] / 1e6, row["events"],
                 100 * eff))
    if rows:
        ev0 = rows[0]["events"]
        assert all(r["events"] == ev0 for r in rows), \
            "event counts diverge across device counts!"
        print("event counts identical across device counts: %d" % ev0)


if __name__ == "__main__":
    main()
