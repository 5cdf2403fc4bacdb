"""Sanitizer harness (SURVEY.md section 5.2): the unmodified reference
sources run under ASan/UBSan through every module via
native/oracle_selftest.c. The reference itself ships no sanitizer story
(its Justfile builds with -g only); this is the framework's replacement.
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess

import pytest

_REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_reference_clean_under_asan_ubsan():
    if shutil.which("gcc") is None:
        pytest.skip("no gcc")
    if not pathlib.Path("/root/reference/src").exists():
        pytest.skip("reference mount unavailable")
    r = subprocess.run(
        ["make", "-C", str(_REPO / "native"), "sanitize"],
        capture_output=True, text=True, timeout=300,
    )
    if "asan" in r.stderr.lower() and "cannot find" in r.stderr.lower():
        pytest.skip(f"libasan unavailable: {r.stderr[-300:]}")
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "oracle sanitizer self-test OK" in r.stdout
