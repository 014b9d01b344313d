"""Six-page interactive help conformance (agrephlp.c:100-295).

Byte-identical to the reference EXCEPT the version banner line (the
reference embeds its compile date -- documented divergence), so every
comparison drops banner lines first.
"""

import subprocess
import sys

import pytest

from .oracle import ORACLE


def _run_oracle(stdin: bytes) -> tuple:
    p = subprocess.run([ORACLE], input=stdin, capture_output=True)
    return p.stderr, p.returncode & 0xFF


def _run_ours(stdin: bytes) -> tuple:
    import os
    env = dict(os.environ, AGREP_TPU_BACKEND="numpy",
               JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("AGREPOPTS", None)
    p = subprocess.run([sys.executable, "-m", "agrep_tpu.cli"],
                       input=stdin, capture_output=True, env=env)
    return p.stderr, p.returncode & 0xFF


def _strip_banners(err: bytes) -> bytes:
    # the banner reprint after a page-1 revisit lands on the same line
    # as the previous page's footer -- strip as substrings, not lines
    import re
    err = re.sub(rb"AGREP 3\.41[^\n]*", b"", err)
    # page 6 "AGREP as of __DATE__" is the binary's compile date
    # (version.h:71) -- same documented divergence class as the banner
    err = re.sub(rb"AGREP as of [^\n]*", b"", err)
    return re.sub(rb"AGREP-TPU[^\n]*", b"", err)


def test_all_six_pages_on_eof():
    o_err, o_rc = _run_oracle(b"")
    m_err, m_rc = _run_ours(b"")
    assert m_rc == o_rc == 255
    assert _strip_banners(m_err) == _strip_banners(o_err)
    assert b"12345<6>Q" in m_err          # reached page 6
    assert b"METASYMBOLS:" in m_err       # page 2
    assert b"ISC open source license" in m_err   # page 5


@pytest.mark.parametrize("keys", [b"q", b"5q", b"3q", b"-q", b"2-q",
                                  b"66q"])
def test_navigation(keys):
    o_err, o_rc = _run_oracle(keys)
    m_err, m_rc = _run_ours(keys)
    assert m_rc == o_rc
    assert _strip_banners(m_err) == _strip_banners(o_err)
