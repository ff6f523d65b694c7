"""Locate a pure-Python ``google.protobuf`` runtime without pip.

``transformWithState``'s Python worker speaks protobuf to the JVM
state server (``pyspark/sql/streaming/proto/StateMessage_pb2``). This
container ships no ``protobuf`` package and no pip — but protobuf's
runtime is importable straight from source (it has a pure-Python
implementation selected automatically when the C/upb extension is
absent), so any vendored copy on disk unlocks the API.

``ensure_protobuf()`` searches, in order:

1. an already-importable ``google.protobuf`` (noop);
2. ``$RTES_PROTOBUF_PATH`` — a directory containing ``google/protobuf``;
3. known vendored copies (the Google Cloud SDK bundles the pure-Python
   runtime under ``platform/google_appengine``).

When a copy is found it is appended to ``sys.path`` AND exported via
``PYTHONPATH`` so Spark's forked Python workers inherit it — which is
why callers MUST invoke this BEFORE the JVM launches (the worker
daemon inherits the JVM's env, frozen at gateway start).

Version skew: PySpark's generated ``StateMessage_pb2`` may declare a
gencode version a minor release ahead of the found runtime (e.g.
gencode 6.33 vs runtime 6.32). The wire format is stable across minor
versions; protobuf's own escape hatch
(``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) exists for exactly
this window, so we set it when activating a vendored copy. A
same-major runtime is still required — the check only relaxes minor
skew, and `tests/test_streaming_tws.py` reconciles the full
stream==batch semantics on top, which would catch any real
incompatibility.
"""

from __future__ import annotations

import os
import sys

#: Directories that may contain a ``google/protobuf`` pure-Python tree.
_VENDOR_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def _runtime_importable() -> bool:
    """True only for a REAL protobuf runtime. A bare ``import
    google.protobuf`` succeeding is NOT enough: in Spark python
    workers the spark-core JAR sits on sys.path (zipimport), and its
    shaded ``google/protobuf/*.class`` directories register as empty
    Python NAMESPACE portions — the import "succeeds" and the runtime
    modules are missing. ``descriptor`` is the first module the
    generated ``StateMessage_pb2`` pulls, so it is the probe."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _purge_namespace_shell() -> None:
    """Drop ``google``/``google.protobuf`` namespace-shell modules so
    a retry can resolve the vendored REGULAR package (a regular
    package beats namespace portions wherever it sits on the path, so
    appending stays sufficient)."""
    import sys as _sys

    for name in [
        n
        for n in _sys.modules
        if n == "google" or n.startswith("google.")
    ]:
        mod = _sys.modules[name]
        if getattr(mod, "__file__", None) is None:
            del _sys.modules[name]


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable (driver AND Spark workers)
    if any pure-Python copy exists; return whether it is available.
    Call BEFORE creating the SparkSession when possible (PYTHONPATH
    then reaches forked workers); worker-side module imports (e.g.
    streaming.anomaly_tws) call it again as a same-process fallback."""
    if _runtime_importable():
        return True
    _purge_namespace_shell()

    candidates = (os.environ.get("RTES_PROTOBUF_PATH"), *_VENDOR_CANDIDATES)
    for root in candidates:
        if not root or not os.path.isdir(
            os.path.join(root, "google", "protobuf")
        ):
            continue
        sys.path.append(root)
        if not _runtime_importable():
            sys.path.remove(root)
            _purge_namespace_shell()
            continue
        # Relax the gencode-vs-runtime minor-skew check ONLY once the
        # candidate actually imports — a failed candidate must not
        # leave the escape hatch set for an unrelated later install.
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        # Propagate to forked Python workers via the JVM's env.
        # APPEND (driver-side sys.path.append above matches): the
        # vendored tree (e.g. the whole google_appengine platform
        # dir) may carry same-named top-level modules that must not
        # shadow the real ones in workers.
        prev = os.environ.get("PYTHONPATH", "")
        if root not in prev.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{prev}{os.pathsep}{root}" if prev else root
            )
        return True
    return False
