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


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable (driver AND Spark workers)
    if any pure-Python copy exists; return whether it is available.
    Call BEFORE creating the SparkSession."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass

    candidates = (os.environ.get("RTES_PROTOBUF_PATH"), *_VENDOR_CANDIDATES)
    for root in candidates:
        if not root or not os.path.isdir(
            os.path.join(root, "google", "protobuf")
        ):
            continue
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        sys.path.append(root)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            sys.path.remove(root)
            continue
        # propagate to forked Python workers via the JVM's env
        prev = os.environ.get("PYTHONPATH", "")
        if root not in prev.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{root}{os.pathsep}{prev}" if prev else root
            )
        return True
    return False
