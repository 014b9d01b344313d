"""Multi-host orchestration helpers (single-process degradations +
the deterministic partition and re-queue logic, which are pure)."""

import numpy as np
import pytest

from agrep_tpu.parallel import multihost as mh


def test_init_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert mh.init_multihost() == (0, 1)


def test_assign_files_partitions_everything():
    files = ["f%02d" % i for i in range(23)]
    seen = {}
    for p in range(4):
        for gi, f in mh.assign_files(files, 4, p):
            assert gi not in seen
            seen[gi] = (p, f)
    assert sorted(seen) == list(range(23))
    # deterministic order within a host preserves global file order
    idxs = [gi for gi, _ in mh.assign_files(files, 4, 2)]
    assert idxs == sorted(idxs)


def test_run_with_requeue_retries_then_fallback():
    calls = {"a": 0, "b": 0}

    def worker(x):
        calls[x] += 1
        if x == "b" and calls[x] <= 1:
            raise RuntimeError("preempted")
        return x.upper()

    out = mh.run_with_requeue(["a", "b"], worker)
    assert out == ["A", "B"]
    assert calls["b"] == 2          # initial attempt + 1 re-queue

    def always_fail(x):
        raise RuntimeError("dead host")

    out = mh.run_with_requeue(["a"], always_fail,
                              fallback=lambda x: "fb:" + x)
    assert out == ["fb:a"]
    with pytest.raises(RuntimeError):
        mh.run_with_requeue(["a"], always_fail)


def test_global_count_single_process():
    assert mh.global_count(42) == 42


def test_global_count_mesh():
    import jax
    mesh = mh.global_mesh()
    n = int(np.prod(mesh.devices.shape))
    assert mh.global_count(7, mesh=mesh) == 7
    assert jax.process_count() == 1


def test_executor_file_requeue(tmp_path, monkeypatch):
    """A device scan that dies is retried, then re-run on the exact
    host backend (SURVEY section 5 'a failed host's file shards get
    re-queued') -- output identical to a clean run, and partial-output
    failures propagate rather than replaying."""
    import io
    import numpy as np
    from agrep_tpu.api import fileagrep
    from agrep_tpu.ops import scan as scan_ops
    f = tmp_path / "c.txt"
    f.write_bytes(b"matching line one\nno hit\nmatching two\n" * 200)
    want_buf = io.BytesIO()
    want_rc = fileagrep(["-2", "-n", "matching", str(f)],
                        output=want_buf)
    calls = {"n": 0}
    orig = scan_ops.scan_events

    def dying(*a, **k):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("tunnel died")
        return orig(*a, **k)

    monkeypatch.setattr(scan_ops, "scan_events", dying)
    got_buf = io.BytesIO()
    got_rc = fileagrep(["-2", "-n", "matching", str(f)],
                       output=got_buf)
    assert calls["n"] >= 3
    assert (got_buf.getvalue(), got_rc) == (want_buf.getvalue(),
                                            want_rc)
