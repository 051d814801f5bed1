"""Self-ship the package to Python workers for pickled-by-reference UDFs.

mapInPandas / applyInPandas(WithState) kernels defined at module level are
pickled *by reference*: the worker deserializer re-imports
``example_kafkastreams_spark.…`` by name. That import only succeeds when
the package is on the worker's ``sys.path`` — true when the driver runs
from the repo root, false under an arbitrary caller session (e.g. a
harness running from another cwd, or a real cluster without ``--py-files``).

``ensure_package_shipped`` closes the gap at runtime: zip the installed
package once per driver process and ``sc.addPyFile`` it (idempotent;
runtime-addable; distributed to every current and future executor).
Cheap insurance — the zip is ~50 KB and built at most once.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[int] = set()


def _build_pkg_zip() -> str:
    import example_kafkastreams_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"example_kafkastreams_spark-{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "example_kafkastreams_spark",
                        os.path.relpath(full, pkg_dir),
                    )
                    zf.write(full, rel)
        os.replace(tmp, zpath)
    return zpath


def ensure_package_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_SESSIONS:
        return
    sc.addPyFile(_build_pkg_zip())
    _SHIPPED_SESSIONS.add(key)
