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

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
