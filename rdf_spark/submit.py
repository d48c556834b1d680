"""Package shipping for executors — the ``spark-submit --py-files``
contract (BASELINE.json north_rule) as a library call.

On a cluster the package reaches executors via ``spark-submit
--py-files rdf_spark.zip``. When the engine is driven from a plain
SparkSession instead (notebooks, tests, the driver harness),
``ship_package(spark)`` builds the same zip once and registers it with
``SparkContext.addPyFile`` so every executor's Python worker can import
``rdf_spark`` regardless of its working directory.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[str] = set()


def build_zip(dest_dir: str | None = None) -> str:
    """Zip the installed rdf_spark package (deterministic layout);
    returns the zip path. Suitable for ``spark-submit --py-files``."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    dest_dir = dest_dir or tempfile.gettempdir()
    out = os.path.join(dest_dir, "rdf_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "rdf_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    return out


def ship_package(spark) -> None:
    """Idempotently make ``rdf_spark`` importable on all executors of
    this SparkContext (no-op on repeat calls for the same context)."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    sc.addPyFile(build_zip())
    _SHIPPED.add(key)
