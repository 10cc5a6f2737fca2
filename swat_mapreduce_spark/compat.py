"""Runtime-dependency shims.

``google.protobuf`` is required by Spark 4's transformWithStateInPandas
Python runner (the worker talks to the JVM state server via
``pyspark/sql/streaming/proto/StateMessage_pb2.py``), but this
container has no protobuf distribution installed. It DOES ship one on
disk: the Google Cloud SDK vendors a pure-Python protobuf 4.23 under
``/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf``
(rewritten to import from the ``cloudsdk.`` namespace).

:func:`ensure_protobuf` makes that runtime importable as
``google.protobuf`` via a meta-path alias finder. Three wrinkles:

* "importable" must be probed as ``from google.protobuf import
  descriptor``, NOT ``import google.protobuf``: inside Spark's python
  runners the JVM puts jar files on ``sys.path``, and
  ``spark-core_*.jar`` contains ``google/protobuf/*.proto`` resource
  files — zipimport happily resolves those as an EMPTY namespace
  package, which imports fine and then breaks on the first real
  symbol. Any such stale namespace entries are evicted from
  ``sys.modules`` before the alias takes over.
* The aliased modules keep their ``cloudsdk.*`` ``__name__``
  resolution, so ``from google.protobuf import X`` submodule fallbacks
  land on single module copies — no duplicate descriptor pools. The
  finder only has to map the ``google.protobuf*`` names pyspark's
  generated code imports.
* pyspark's gencode (protoc 6.33) validates the runtime via
  ``google.protobuf.runtime_version``, which 4.23 predates; a no-op
  stand-in module is fabricated. The StateMessage wire format is plain
  proto3, which 4.23 parses fine.

Both driver and executor side need the shim; executors and streaming
python runners get it because importing
``swat_mapreduce_spark.streaming.jobs`` (triggered when the pickled
StatefulProcessor is resolved there) calls :func:`ensure_protobuf` at
module import time, before the first lazy StateMessage_pb2 import.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.machinery
import os
import sys
import types

_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"


class _PbAliasFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Alias ``google.protobuf[.X]`` imports to the ``cloudsdk.``-
    namespaced vendored runtime (same module objects, both names)."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname == "google" or fullname == "google.protobuf" or (
            fullname.startswith("google.protobuf.")
        ):
            return importlib.machinery.ModuleSpec(
                fullname, self, is_package=True
            )
        return None

    def create_module(self, spec):
        if spec.name == "google":
            mod = types.ModuleType("google")
            mod.__path__ = []
            return mod
        return importlib.import_module("cloudsdk." + spec.name)

    def exec_module(self, module):
        pass


def _protobuf_usable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` usable; True if it (now) is.

    No-op when a real protobuf is installed; installs the cloudsdk
    alias otherwise. Idempotent and cheap to call from module scope.
    """
    if _protobuf_usable():
        return True
    if not os.path.isdir(
        os.path.join(_THIRD_PARTY, "cloudsdk", "google", "protobuf")
    ):
        return False
    # Evict junk namespace-package entries (e.g. the spark-core jar's
    # google/protobuf/*.proto resources resolved by zipimport) so the
    # alias finder is actually consulted.
    for name in [
        n
        for n in sys.modules
        if n == "google" or n == "google.protobuf"
        or n.startswith("google.protobuf.")
    ]:
        if getattr(sys.modules[name], "__file__", None) is None:
            del sys.modules[name]
    if _THIRD_PARTY not in sys.path:
        sys.path.append(_THIRD_PARTY)
    if not any(isinstance(f, _PbAliasFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _PbAliasFinder())
    try:
        pb = importlib.import_module("cloudsdk.google.protobuf")
    except ImportError:
        return False
    if not hasattr(pb, "runtime_version"):
        rv = types.ModuleType("cloudsdk.google.protobuf.runtime_version")

        class _Domain:
            GOOGLE_INTERNAL = 1
            PUBLIC = 2

        rv.Domain = _Domain
        rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        sys.modules["cloudsdk.google.protobuf.runtime_version"] = rv
        sys.modules["google.protobuf.runtime_version"] = rv
        pb.runtime_version = rv
    return _protobuf_usable()
