"""Make ``sketchlib`` importable on Spark executor Python workers.

The driver process may import sketchlib from a path the executors don't
have on ``sys.path`` (e.g. the correctness harness runs from another cwd,
or a real cluster run forgot ``--py-files``).  ``ensure_on_workers``
zips the installed package once per SparkContext and ships it with
``addPyFile`` — the programmatic equivalent of
``spark-submit --py-files sketchlib.zip`` and a no-op when already shipped.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

import sketchlib

_SHIPPED: set[int] = set()


def ensure_on_workers(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(sketchlib.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"sketchlib-{os.getpid()}-{abs(hash(pkg_dir)) % 10**8}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith((".py",)):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "sketchlib", os.path.relpath(full, pkg_dir)
                        )
                        z.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
