"""Executor-side log bootstrap (SURVEY §2.9; main/.../LogInitializer.java:1-99).

The reference ships a ``LogInitializer`` Runnable inside its per-trace
closures so each executor JVM configures java.util.logging to the
``ZIPKIN_LOG_LEVEL`` the driver saw. Our executors run Python workers for
the Arrow kernels; the equivalent is: the driver exports the level via
``spark.executorEnv.ZIPKIN_LOG_LEVEL`` (session.get_spark), and every kernel
calls :func:`init_worker_logging` once per worker process before doing work.

Idempotent and cheap: a module-level flag makes repeat calls (one per Arrow
batch iterator) free, matching the reference's same-named guard
(LogInitializer caches per classloader).
"""

from __future__ import annotations

import logging
import os

_DONE = False


def init_worker_logging() -> logging.Logger:
    """Configure the worker process's root logging once, honoring
    ZIPKIN_LOG_LEVEL from the executor environment; returns the engine
    logger. Safe to call from the driver too (env simply absent ⇒ no-op
    beyond returning the logger)."""
    global _DONE
    log = logging.getLogger("zipkin_dependencies_spark")
    if _DONE:
        return log
    level_name = os.environ.get("ZIPKIN_LOG_LEVEL")
    if level_name:
        level = getattr(logging, level_name.upper(), None)
        if isinstance(level, int):
            logging.basicConfig(
                level=level,
                format="%(asctime)s %(levelname)s %(name)s [worker %(process)d]: %(message)s",
            )
            log.setLevel(level)
    _DONE = True
    return log
