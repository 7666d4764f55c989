"""Fork-server preload for PySpark workers (guide §4.5, applied one level up).

``spark.python.daemon.module`` points here instead of ``pyspark.daemon``.
The daemon process is the fork server every Python worker is forked
from, so anything imported HERE is inherited by all workers through
copy-on-write at ~zero cost — while anything imported lazily inside
``pyspark.worker`` is paid again in every fresh worker. On a 32-core
local master the first Python stage of a cold job forks 32 workers that
would otherwise each import pandas (+ the Arrow serializers and this
package's kernel, with its ~100 compiled regexes) concurrently: ~0.6 s
of per-process import work multiplied across the whole width of the
very first task wave.

Import order matters: ``pyspark.daemon`` resolves its worker entry point
from ``sys.argv`` at module-import time, so this module mirrors being
run as ``python -m pyspark.daemon`` exactly — same argv, same
``manager()`` call — with the preloads done first.

The kernel preload is best-effort: if this package is not importable in
the worker interpreter (different PYTHONPATH), the daemon still starts
and workers simply pay the import lazily as before.
"""

# The heavy third-party modules every mapInPandas/pandas-UDF worker
# needs. numpy is already pulled in by ``pyspark.worker`` itself; pandas
# and the Arrow serializer chain are normally imported lazily per worker.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyspark.sql.pandas.serializers  # noqa: F401
import pyspark.sql.pandas.types  # noqa: F401

try:  # this package (kernel + DOM + patterns): best-effort
    from readabilityimproved_spark.kernel import (  # noqa: F401
        htmldates,
        readability,
        title,
    )
    from readabilityimproved_spark.operators import extract  # noqa: F401
except Exception:  # pragma: no cover - package not on the worker path
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
