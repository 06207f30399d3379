"""Session temp hygiene (VERDICT r10 #3): all ksc-* scratch layouts root
under one per-process dir that an atexit handler removes, so pytest/bench
sessions leave /tmp as they found them."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import kinesis_stream_consumer_spark as pkg


def test_mkdtemp_lands_under_session_root():
    d = tempfile.mkdtemp(prefix="ksc-hygiene-")
    assert os.path.dirname(d) == pkg._KSC_TMP_ROOT
    assert os.path.basename(pkg._KSC_TMP_ROOT).startswith("ksc-session-")


def test_foreign_mkdtemp_untouched():
    """Non-ksc prefixes keep vanilla semantics: not rerooted, not
    deleted at exit — the redirect is scoped to this package's scratch
    layouts only."""
    root = pkg._session_tmp_root()
    d = tempfile.mkdtemp(prefix="other-lib-")
    try:
        assert os.path.dirname(d) != root
        assert os.path.dirname(d) == os.path.dirname(root)
    finally:
        os.rmdir(d)


def test_root_recreated_after_external_reaping():
    """A tmp reaper removing the session root mid-session must not break
    subsequent mkdtemp calls."""
    import shutil

    root = pkg._session_tmp_root()
    shutil.rmtree(root)
    d = tempfile.mkdtemp(prefix="ksc-reap-")
    assert os.path.isdir(d)
    assert os.path.dirname(d) == pkg._KSC_TMP_ROOT
    assert pkg._KSC_TMP_ROOT != root


def test_root_is_lazy_no_litter_from_import_only():
    """Spark workers import the package but never mkdtemp; they must not
    create a session root (they're hard-killed, atexit never runs)."""
    code = "import kinesis_stream_consumer_spark as pkg; print(pkg._KSC_TMP_ROOT)"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().splitlines()[-1] == "None"


def test_session_root_removed_at_interpreter_exit():
    """A fresh interpreter that imports the package and creates scratch
    dirs must remove its whole session root on clean exit."""
    code = (
        "import tempfile, kinesis_stream_consumer_spark as pkg;"
        "tempfile.mkdtemp(prefix='ksc-x-');"
        "print(pkg._KSC_TMP_ROOT)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert out.returncode == 0, out.stderr
    root = out.stdout.strip().splitlines()[-1]
    assert root and not os.path.exists(root)
