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


def test_stale_dead_pid_session_root_swept():
    """VERDICT r11 #4: a SIGKILL'd driver leaves its session root behind
    (atexit never runs). The pid is stamped into the dir name; the next
    session's first root creation sweeps siblings whose pid is dead."""
    import shutil

    tmp = tempfile.gettempdir()
    # a plausibly-dead pid: max pid space is far below 2**22+7 on default
    # kernels, but verify rather than assume
    dead_pid = 4194311
    while pkg._pid_alive(dead_pid):  # pragma: no cover - astronomically rare
        dead_pid += 1
    stale = os.path.join(tmp, f"ksc-session-{dead_pid}-deadbeef")
    os.makedirs(os.path.join(stale, "inner"), exist_ok=True)
    live = os.path.join(tmp, f"ksc-session-{os.getpid()}-selfcheck")
    os.makedirs(live, exist_ok=True)
    unstamped = os.path.join(tmp, "ksc-session-legacyformat")
    os.makedirs(unstamped, exist_ok=True)
    try:
        pkg._sweep_stale_session_roots(tmp)
        assert not os.path.exists(stale)  # dead pid: swept, recursively
        assert os.path.isdir(live)  # own/live pid: untouched
        assert os.path.isdir(unstamped)  # no pid stamp: left alone
    finally:
        shutil.rmtree(live, ignore_errors=True)
        shutil.rmtree(unstamped, ignore_errors=True)
        shutil.rmtree(stale, ignore_errors=True)


def test_fresh_process_sweeps_dead_sessions_on_first_mkdtemp():
    """End-to-end: a fresh interpreter's FIRST ksc mkdtemp removes a
    dead-pid session root; import alone must not (workers import too)."""
    import shutil

    tmp = tempfile.gettempdir()
    dead_pid = 4194311
    while pkg._pid_alive(dead_pid):  # pragma: no cover
        dead_pid += 1
    stale = os.path.join(tmp, f"ksc-session-{dead_pid}-e2e")
    os.makedirs(stale, exist_ok=True)
    cwd = os.path.dirname(os.path.dirname(__file__))
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import kinesis_stream_consumer_spark"],
            capture_output=True, text=True, cwd=cwd,
        )
        assert out.returncode == 0, out.stderr
        assert os.path.isdir(stale)  # import-only: no sweep, no litter
        out = subprocess.run(
            [
                sys.executable,
                "-c",
                "import tempfile, kinesis_stream_consumer_spark;"
                "tempfile.mkdtemp(prefix='ksc-sweep-e2e-')",
            ],
            capture_output=True, text=True, cwd=cwd,
        )
        assert out.returncode == 0, out.stderr
        assert not os.path.exists(stale)  # first mkdtemp swept it
    finally:
        shutil.rmtree(stale, ignore_errors=True)


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


def test_util_mkdtemp_explicit_helper():
    """The explicit helper (VERDICT r12 #6) reroots under the session root
    without relying on the stdlib monkey-patch's prefix sniffing — and
    keeps doing so even for a non-ksc prefix (the caller's intent, not the
    name, decides)."""
    from kinesis_stream_consumer_spark.util import mkdtemp

    d = mkdtemp(prefix="ksc-util-")
    assert os.path.dirname(d) == pkg._session_tmp_root()
    d2 = mkdtemp(prefix="anything-")
    assert os.path.dirname(d2) == pkg._session_tmp_root()
