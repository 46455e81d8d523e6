"""Executor-side distribution of this package.

Arrow-batched UDFs (mapInPandas / pandas_udf) are pickled **by
reference**: the executor's Python worker must be able to import
``auraverse_etl_pipeline_spark`` itself. On a real cluster that is a
``--py-files`` wheel; for a session we don't own (the driver harness
builds its own SparkSession from an arbitrary cwd) the runtime
equivalent is ``sparkContext.addPyFile`` with a zip of the package,
built once per session.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PACKAGE_NAME = "auraverse_etl_pipeline_spark"
_SHIPPED_SESSIONS: set[int] = set()


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` that cleans up at interpreter exit.

    Registry queries stage fixture logs/indexes under a scratch root
    and return a DataFrame that reads the staged parquet LAZILY — the
    caller (driver, bench, pytest) collects after the query function
    returns, so the directory must outlive the call. Removing it at
    ``atexit`` keeps every scoring/bench invocation from leaking a
    ``*_<random>`` directory in the system temp dir while never racing
    the consumer (one process == one scoring run)."""
    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def _build_package_zip() -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), f"{_PACKAGE_NAME}_{os.getpid()}.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
    return zip_path


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors (idempotent per session)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    spark.sparkContext.addPyFile(_build_package_zip())
    _SHIPPED_SESSIONS.add(key)
