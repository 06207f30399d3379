"""kinesis_stream_consumer_spark — a PySpark-native stream-analytics engine.

A ground-up re-expression of the capabilities of
``byron-dupreez/kinesis-stream-consumer`` (reference, read-only at
/root/reference) on Apache Spark:

- Structured-Streaming / ``foreachBatch`` micro-batches replace Lambda
  invocations (reference kinesis-consumer.js:112-178).
- DataFrame/SQL expressions replace the per-record JS pipeline
  (reference kinesis-processing.js:477-598).
- A keyed, MERGE-updated state table replaces the DynamoDB
  StreamConsumerBatchState item (reference kinesis-processing.js:102-105).
- The relational/analytics surface (filters, joins, aggregations, windows,
  dedup, similarity, text ops) is exposed Spark-first over the same message
  model.

Nothing here is a port: the reference is a single-threaded Node.js runtime;
this package declares logical plans and lets Catalyst/Tungsten execute them.

PROCESS-WIDE SIDE EFFECT (documented per ADVICE r11): importing this package
wraps stdlib ``tempfile.mkdtemp``. The wrapper only changes behavior for
calls whose prefix starts with ``"ksc-"`` (this package's scratch layouts —
many inside certified hash-held query bodies, which is why the redirect
lives here and not at the call sites): those dirs are rerooted under one
per-process session root that is removed at interpreter exit. A foreign
library in the same process that happens to use a ``ksc-`` prefix would be
rerooted too. Migration IN PROGRESS (VERDICT r12 #6): the explicit helper
``kinesis_stream_consumer_spark.util.mkdtemp`` exists and is the rule for
NEW code; ``session.py`` migrated r13. Remaining stdlib call sites: 16,
all inside certified hash-held query blocks (stable.py x4,
stream_parity.py x5, relational.py x4, engine_queries.py x1, r12.py x1,
r10.py x1) — each migrates when its block next re-enters the correctness
window for another reason.
"""

import atexit as _atexit
import os as _os
import shutil as _shutil
import tempfile as _tempfile

# Session temp hygiene (VERDICT r10 #3): every scratch layout in this
# package (state dirs, JSONL/ORC roundtrip fixtures, shipped-package zips)
# is created via tempfile.mkdtemp(prefix="ksc-..."). Root them all under
# ONE per-process directory and remove it at interpreter exit, so a
# pytest/bench session leaves the temp dir as it found it. The root is
# created LAZILY on first mkdtemp: Spark Python workers import this
# package but are hard-killed by the JVM (no atexit), so an eager root
# would leave one empty dir per worker. Scoped to this process only —
# concurrent sessions each get their own root.
_KSC_TMP_ROOT = None
_REAL_MKDTEMP = _tempfile.mkdtemp


def _pid_alive(pid: int) -> bool:
    try:
        _os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # pragma: no cover - alive, other user
        return True
    except (OverflowError, ValueError):  # pragma: no cover
        return False
    return True


def _sweep_stale_session_roots(tmp_dir: str) -> None:
    """Remove ksc-session-* roots left by hard-killed drivers (VERDICT r11
    #4: SIGKILL skips atexit, leaking one dir per killed session). The
    owning pid is stamped into the dir name; a dead pid means the session
    is gone and its scratch is garbage. Best-effort — concurrent sessions
    each guard their own (live) pid, races with another sweeper are
    harmless (rmtree ignore_errors)."""
    try:
        entries = _os.listdir(tmp_dir)
    except OSError:  # pragma: no cover - degraded environment
        return
    for name in entries:
        if not name.startswith("ksc-session-"):
            continue
        pid_part = name[len("ksc-session-"):].split("-", 1)[0]
        if not pid_part.isdigit():
            # pre-r12 roots carry no pid stamp; age out manually
            continue
        if int(pid_part) != _os.getpid() and not _pid_alive(int(pid_part)):
            _shutil.rmtree(_os.path.join(tmp_dir, name), ignore_errors=True)


def _session_tmp_root() -> str:
    global _KSC_TMP_ROOT
    # re-validate: a tmp reaper (systemd-tmpfiles age cleanup) can remove
    # the root mid-session; recreate rather than hand a dead dir= to the
    # real mkdtemp
    if _KSC_TMP_ROOT is None or not _os.path.isdir(_KSC_TMP_ROOT):
        if _KSC_TMP_ROOT is None:
            # first creation in this process: sweep siblings whose owner
            # died (lazy like the root itself — import-only processes,
            # e.g. Spark workers, neither create nor scan anything)
            _sweep_stale_session_roots(_tempfile.gettempdir())
        _KSC_TMP_ROOT = _REAL_MKDTEMP(prefix=f"ksc-session-{_os.getpid()}-")
        _atexit.register(_shutil.rmtree, _KSC_TMP_ROOT, ignore_errors=True)
    return _KSC_TMP_ROOT


def _ksc_mkdtemp(suffix=None, prefix=None, dir=None):
    # Scope the reroot to THIS package's scratch layouts (every internal
    # call site uses a ksc-* prefix — many inside certified hash-held
    # query bodies, which is why the redirect lives here and not at the
    # call sites). Foreign callers in the same process keep vanilla
    # mkdtemp semantics: their dirs are neither rerooted nor deleted.
    if dir is None and prefix is not None and prefix.startswith("ksc-"):
        try:
            dir = _session_tmp_root()
        except OSError:  # pragma: no cover - degraded environment
            dir = None
    return _REAL_MKDTEMP(suffix=suffix, prefix=prefix, dir=dir)


_tempfile.mkdtemp = _ksc_mkdtemp

from kinesis_stream_consumer_spark.config import EngineConfig, StreamType  # noqa: E402

__all__ = ["EngineConfig", "StreamType"]

__version__ = "0.1.0"
