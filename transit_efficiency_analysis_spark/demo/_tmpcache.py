"""Process-local temp-dir caches for demos that materialize a feed once.

Two demos stage data on local disk once per process (the BI-read bench
shape in ``demo/analytics.py`` and the ``binaryFile`` feed in
``demo/multimodal.py``). Both want the same contract:

- the directory is PRIVATE to this process (``tempfile.mkdtemp``), so two
  concurrent bench/driver runs can never race on a shared fixed path;
- it is written once and reused for the life of the process;
- it is removed at interpreter exit, so repeated bench runs don't
  accumulate copies in /tmp.
"""

from __future__ import annotations

import atexit
import shutil

_CACHES: list[dict[str, str]] = []


def _cleanup() -> None:
    for cache in _CACHES:
        for path in cache.values():
            shutil.rmtree(path, ignore_errors=True)
        cache.clear()


atexit.register(_cleanup)


def process_dir_cache() -> dict[str, str]:
    """A ``key -> tempdir`` dict whose directories are rmtree'd at exit."""
    cache: dict[str, str] = {}
    _CACHES.append(cache)
    return cache


#: one result dir per demo key, allocated lazily by :func:`lazy_result`
_RESULT_CACHE = process_dir_cache()


def lazy_result(spark, df, key: str):
    """Executor-side rewrite of ``df`` into the process-lifetime result
    dir for ``key``; returns the LAZY parquet read (no driver-side row
    materialization — the write is distributed and the read streams from
    disk on demand).

    The dir is keyed PER DEMO, not per invocation: the first call for a
    ``key`` mkdtemps it, later calls overwrite it in place (``mode=
    "overwrite"`` — a full delete+rewrite), so a median-of-N bench loop
    holds exactly one result dir per demo instead of N accumulating
    copies. Consequence callers accept: a DataFrame returned by an
    EARLIER invocation of the same demo becomes unreadable once the demo
    runs again — consume each invocation's result before re-invoking
    (bench and driver both do). The write is also the EAGERNESS point:
    running it inside a scoped-conf ``try`` executes the plan while the
    conf is live, without ``localCheckpoint``'s session-lifetime
    executor-storage pinning (a checkpoint's blocks are lost on executor
    failure; a parquet dir re-reads fine).
    """
    import tempfile

    d = _RESULT_CACHE.get(key)
    if d is None:
        d = tempfile.mkdtemp(prefix=f"demo_result_{key}_")
        _RESULT_CACHE[key] = d
    df.write.mode("overwrite").parquet(d)
    return spark.read.parquet(d)
