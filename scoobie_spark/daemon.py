"""Python worker daemon with the heavy libraries preloaded.

Spark forks one Python worker per core from a single daemon process
(``spark.python.daemon.module``). With the stock daemon every worker
pays the pandas(+pyarrow) import on its first Arrow task — measured as
a visible O(cores) slice of session cold-start (3/3-consistent ~14%
off the cold 32-core flagship, BASELINE.md). Importing them HERE,
before ``manager()`` starts forking, lets every worker inherit the
loaded modules through copy-on-write for free. numpy specifically is
already inherited under the STOCK daemon too (pyspark.worker's import
chain pulls it at daemon load) — pandas and pyarrow are what this
module actually adds; the explicit numpy import just pins the
assumption.

Import only — no threads, no BLAS work — so the fork stays safe
(OpenBLAS thread pools are spun up lazily on first use, per worker).
"""

import numpy  # noqa: F401
import pandas  # noqa: F401

try:  # Arrow is always present in this image, but stay import-safe
    import pyarrow  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:
    # Parse + vectorize the EN perceptron artifacts once here: the
    # trained B5/B6 decode otherwise pays ~0.6s of gunzip/JSON/matrix
    # build per worker PROCESS on its first task (≈20s of CPU across 32
    # forks, all contending at once now that the tagger input is
    # spread). The module-level _load/_vectorize caches are inherited
    # through copy-on-write like the imports above. DE (TIGER) is ~2.6s
    # and only touched by explicitly German routes, so it stays lazy.
    from scoobie_spark import perceptron as _perceptron

    if _perceptron.models_available("en"):
        for _p in (_perceptron.POS_MODEL, _perceptron.CHUNK_MODEL):
            _perceptron._vectorize(_perceptron._load(_p))
except Exception:  # pragma: no cover — never block the daemon on this
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
