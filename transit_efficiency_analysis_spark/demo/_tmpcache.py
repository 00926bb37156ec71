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
