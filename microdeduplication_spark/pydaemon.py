"""PySpark worker daemon with the heavy imports preloaded.

The stock `pyspark.daemon` forks a fresh worker per task slot; each worker
then imports numpy/pandas/pyarrow on first use inside the UDF runner. With
32 concurrent first tasks that is 32 parallel cold imports (~1-2 s each,
measured: the first Python-UDF stage of a session burned ~108 core-s of
executor wait at 32 slots before any kernel ran). Importing the libraries
in the DAEMON process instead means every forked worker inherits the
already-initialized modules through copy-on-write fork memory -- the
per-worker import cost disappears (guide §4.5: heavyweight init once per
process, not per task).

Selected via spark.python.daemon.module (session.build_session sets it and
guarantees the repo root is on the workers' PYTHONPATH). The preloads are
best-effort: a missing library must not take down the worker machinery.
"""

try:  # pragma: no cover - trivial imports, exercised via any pandas_udf
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.compute  # noqa: F401
except Exception:  # pragma: no cover - preload is an optimization only
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
