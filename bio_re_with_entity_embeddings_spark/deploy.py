"""spark-submit --py-files equivalent for sessions we don't own.

The north rule deploys via ``spark-submit --py-files``; when the driver
hands us an already-built SparkSession (``__spark_entry__.entry``), we
ship the package to executors the same way: zip it once (content-
addressed, idempotent) and ``addPyFile`` it so Python workers can
unpickle mapInPandas functions defined in this package.
"""

from __future__ import annotations

import hashlib
import os
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)
_SHIPPED: set[str] = set()


def _build_zip() -> str:
    sources = []
    for root, _dirs, files in os.walk(_PKG_DIR):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if f.endswith(".py"):
                sources.append(os.path.join(root, f))
    h = hashlib.sha256()
    for s in sorted(sources):
        with open(s, "rb") as fh:
            h.update(s.encode())
            h.update(fh.read())
    out_dir = os.path.join(os.path.dirname(_PKG_DIR), ".build")
    os.makedirs(out_dir, exist_ok=True)
    zpath = os.path.join(out_dir, f"{_PKG_NAME}-{h.hexdigest()[:12]}.zip")
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for s in sorted(sources):
                arc = os.path.join(
                    _PKG_NAME, os.path.relpath(s, _PKG_DIR)
                )
                zf.write(s, arc)
        os.replace(tmp, zpath)
    return zpath


def ensure_shipped(spark: SparkSession) -> None:
    zpath = _build_zip()
    key = f"{id(spark.sparkContext)}:{zpath}"
    if key in _SHIPPED:
        return
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)
