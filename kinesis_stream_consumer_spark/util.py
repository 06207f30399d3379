"""Internal utilities.

``mkdtemp`` is the explicit, call-site-addressable replacement for the
process-wide ``tempfile.mkdtemp`` wrapper the package ``__init__``
installs (see its docstring): it reroots a scratch dir under the
per-process session root directly — no prefix sniffing, no stdlib
monkey-patch needed for the caller — so a foreign library using a
``ksc-`` prefix can never collide with call sites that have migrated
here. Adoption plan (VERDICT r12 #6): NEW code calls this helper; each
certified hash-held query block migrates when it next re-enters the
correctness window for some other reason (editing one purely to swap the
temp call would churn the certification ledger for zero behavior
change). The package docstring tracks the remaining stdlib call-site
count.
"""

from __future__ import annotations

import kinesis_stream_consumer_spark as _pkg


def mkdtemp(prefix: str) -> str:
    """Create a scratch directory under the package's per-process session
    root (created lazily, swept at interpreter exit — the same lifecycle
    the ``__init__`` wrapper gives ``ksc-`` prefixed stdlib calls).

    Falls back to a vanilla system-temp dir when the session root cannot
    be created (degraded environment) — callers always get a usable
    directory; hygiene is best-effort, matching the wrapper.
    """
    try:
        root = _pkg._session_tmp_root()
    except OSError:  # pragma: no cover - degraded environment
        root = None
    return _pkg._REAL_MKDTEMP(prefix=prefix, dir=root)
