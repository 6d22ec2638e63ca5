"""Fallback discovery of a ``google.protobuf`` runtime for the
``transformWithStateInPandas`` state backend.

PySpark 4's arbitrary-state-v2 operator (transformWithStateInPandas)
runs a per-worker control channel to the JVM state server whose wire
format is protobuf (``pyspark/sql/streaming/proto/StateMessage_pb2.py``),
so ``google.protobuf`` must be importable in BOTH the driver and every
Python worker. Standard cluster images ship it; a hermetic sandbox may
not, and may have no package index. Some such hosts still carry a
pure-python protobuf runtime bundled inside other tooling (for example
the Google Cloud SDK's App Engine platform bundles protobuf 6.x with
``internal/builder.py``, i.e. new-gencode capable).

:func:`ensure_protobuf` makes a bundled runtime importable WITHOUT
exposing the rest of that tool's ``google.*`` namespace. It builds a
tiny overlay directory containing only::

    google/__init__.py   (pkgutil-style namespace stub)
    google/protobuf   -> <bundle>/google/protobuf   (symlink)

then prepends the overlay to ``sys.path`` AND ``os.environ['PYTHONPATH']``.
Python workers inherit the environment from the JVM, which inherits it
from the driver process — so this must run BEFORE
``SparkSession.builder.getOrCreate()`` launches the JVM
(:func:`solana_event_stream_spark.session.get_spark` calls it first).

Version skew: PySpark 4.1's generated ``StateMessage_pb2`` declares
gencode 6.33.0. A discovered runtime may be slightly older (e.g.
6.32.0). The message file is plain proto3 — it parses and round-trips
fine on such a runtime (covered by ``tests/test_state.py``'s
transformWithStateInPandas parity case) — so when we activate a
fallback runtime we also set protobuf's own documented escape hatch
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true`` (checked inside
``google.protobuf.runtime_version.ValidateProtobufRuntimeVersion``).
We only do this for the discovered-fallback path, never when a
properly installed protobuf is present.

This module is pure environment setup: no Spark imports, safe to call
from any entry point (tests, bench, latency probe) and idempotent.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

# Directories that may contain a bundled pure-python google/protobuf
# package (the path must point AT the protobuf package dir itself).
_CANDIDATE_GLOBS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf",
    "/usr/lib64/google-cloud-sdk/platform/google_appengine/google/protobuf",
    "/opt/google-cloud-sdk/platform/google_appengine/google/protobuf",
]

_NAMESPACE_STUB = (
    "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n"
)


def have_native_protobuf() -> bool:
    """True when ``google.protobuf`` already imports (real install)."""
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


def _runtime_ok(pb_dir: str) -> bool:
    """A usable runtime for PySpark's generated protos needs the
    new-gencode ``internal/builder.py`` (protobuf >= 3.20) and the
    ``runtime_version`` module that ``StateMessage_pb2`` imports
    unconditionally (protobuf >= 5.27)."""
    return (os.path.isfile(os.path.join(pb_dir, "__init__.py"))
            and os.path.isfile(os.path.join(pb_dir, "internal",
                                            "builder.py"))
            and os.path.isfile(os.path.join(pb_dir, "runtime_version.py")))


def find_bundled_protobuf() -> str | None:
    """Return a path to a usable bundled ``google/protobuf`` dir, or
    None. ``SES_SPARK_PROTOBUF_DIR`` overrides the built-in candidate
    list (point it at the ``google/protobuf`` directory itself)."""
    override = os.environ.get("SES_SPARK_PROTOBUF_DIR")
    candidates = ([override] if override else []) + [
        p for pattern in _CANDIDATE_GLOBS for p in sorted(glob.glob(pattern))]
    for cand in candidates:
        if cand and os.path.isdir(cand) and _runtime_ok(cand):
            return cand
    return None


def _build_overlay(pb_dir: str, overlay: str) -> str:
    """Create (idempotently) the two-entry overlay exposing ONLY
    ``google.protobuf`` from ``pb_dir``. Returns the overlay root."""
    gdir = os.path.join(overlay, "google")
    link = os.path.join(gdir, "protobuf")
    os.makedirs(gdir, exist_ok=True)
    init = os.path.join(gdir, "__init__.py")
    if not os.path.isfile(init):
        with open(init, "w") as fh:
            fh.write(_NAMESPACE_STUB)
    if os.path.islink(link):
        if os.path.realpath(link) != os.path.realpath(pb_dir):
            os.unlink(link)
    if not os.path.exists(link):
        try:
            os.symlink(pb_dir, link)
        except OSError:
            # filesystems without symlink support: one-time copy
            shutil.copytree(pb_dir, link)
    return overlay


def _default_overlay_dir() -> str:
    import tempfile
    return os.path.join(tempfile.gettempdir(),
                        f"ses_spark_pbshim_{os.getuid()}")


def ensure_protobuf(overlay_dir: str | None = None) -> bool:
    """Make ``google.protobuf`` importable for driver AND workers.

    Call BEFORE the SparkSession JVM starts. Returns True when
    ``google.protobuf`` is importable afterwards (natively installed or
    via the overlay), False when no runtime could be found. Never
    raises on a missing runtime — callers gate on the return value /
    :func:`streaming.state.has_transform_with_state`.
    """
    if have_native_protobuf():
        return True
    pb_dir = find_bundled_protobuf()
    if pb_dir is None:
        return False
    overlay = _build_overlay(pb_dir, overlay_dir or _default_overlay_dir())
    if overlay not in sys.path:
        sys.path.insert(0, overlay)
    existing = os.environ.get("PYTHONPATH", "")
    if overlay not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            overlay + (os.pathsep + existing if existing else ""))
    # Official protobuf escape hatch for gencode-newer-than-runtime skew
    # (StateMessage_pb2 gencode 6.33 vs e.g. bundled 6.32); applied only
    # on this discovered-fallback path.
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK",
                          "true")
    return have_native_protobuf()
