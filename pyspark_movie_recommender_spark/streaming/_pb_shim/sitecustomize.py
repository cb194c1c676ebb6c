"""Interpreter-start shim: replay protobuf_compat in Spark workers.

Python auto-imports ``sitecustomize`` at startup when this directory is
on PYTHONPATH (``protobuf_compat.enable_for_workers`` puts it there
before the JVM launches). Spark's Python processes — the
transformWithState driver worker and the executor UDF daemons — import
``StateMessage_pb2`` long after launch, so the bundled-runtime sys.path
fix and the lenient gencode/runtime check must already be in place;
there is no driver-side hook that reaches into those processes.

Loads ``protobuf_compat`` by FILE PATH (the engine package is not
necessarily importable inside a worker) under a sentinel module name so
a driver-side ``import pyspark_movie_recommender_spark`` later never
collides. Never raises: a broken shim would take down every Python
worker, protobuf-related or not.
"""

import importlib.util
import os
import sys

_COMPAT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir, "protobuf_compat.py"
)

try:
    _spec = importlib.util.spec_from_file_location(
        "_spark_graft_protobuf_compat", os.path.abspath(_COMPAT)
    )
    if _spec is not None and _spec.loader is not None:
        _mod = importlib.util.module_from_spec(_spec)
        sys.modules[_spec.name] = _mod
        _spec.loader.exec_module(_mod)
        _mod.ensure_protobuf()
except Exception:  # pragma: no cover - never break worker startup
    pass
