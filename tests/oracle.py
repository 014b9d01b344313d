"""Helpers to run the reference binary (the conformance oracle) and our
CLI on identical inputs and compare outputs byte-for-byte."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, ".oracle", "agrep")


def _enc(args):
    return [a.encode("latin-1") if isinstance(a, str) else a for a in args]


def run_oracle(args, cwd=None):
    p = subprocess.run([ORACLE.encode()] + _enc(args), capture_output=True,
                       cwd=cwd)
    return p.stdout, p.stderr, p.returncode & 0xFF


def run_ours(args: list[str], cwd=None, backend="numpy"):
    env = dict(os.environ)
    env["AGREP_TPU_BACKEND"] = backend
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep subprocesses off the TPU
    p = subprocess.run([sys.executable.encode(), b"-m", b"agrep_tpu.cli"]
                       + _enc(args), capture_output=True, cwd=cwd, env=env)
    return p.stdout, p.stderr, p.returncode & 0xFF


def run_ours_inproc(args: list[str]):
    """Fast in-process run (no subprocess): returns (stdout, exitcode)."""
    import io
    from agrep_tpu.api import fileagrep
    from agrep_tpu.options import AgrepError
    from agrep_tpu.runtime.output import OutputOverflow
    buf = io.BytesIO()
    try:
        ret = fileagrep(args, output=buf)
    except AgrepError:
        return buf.getvalue(), 2
    except OutputOverflow:
        return buf.getvalue(), 255
    return buf.getvalue(), ret & 0xFF


def compare(args: list[str], check_stderr=False, backend="numpy"):
    """Assert byte-identical stdout and exit code vs the oracle."""
    o_out, o_err, o_rc = run_oracle(args)
    m_out, m_err, m_rc = run_ours(args, backend=backend)
    assert m_out == o_out, (
        "stdout mismatch for %r\n--- oracle ---\n%r\n--- ours ---\n%r"
        % (args, o_out, m_out))
    assert m_rc == o_rc, ("exit code mismatch for %r: oracle %d ours %d"
                          % (args, o_rc, m_rc))
    if check_stderr:
        # Progname is argv[0]: the oracle prints its own path where we
        # print "agrep" -- normalize before the byte compare
        o_err = o_err.replace(ORACLE.encode() + b":", b"agrep:")
        assert m_err == o_err, (
            "stderr mismatch for %r\n--- oracle ---\n%r\n--- ours ---\n%r"
            % (args, o_err, m_err))
