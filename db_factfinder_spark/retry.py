"""Transient-failure retry (reference calculate.py:376's
``@retry(tries=3, delay=5)``).

The reference wraps the whole query call because its downloads hit a
flaky REST API.  In this engine plan *construction* is deterministic,
but ``calculate_batch`` materializes checkpoint-cache entries while
building (sources/cache.py writes parquet), so per-task I/O can still
fail transiently — that is where the wrapper is applied.
"""

from __future__ import annotations

import functools
import logging
import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def with_retry(
    fn: Callable[[], T],
    tries: int = 3,
    delay: float = 5.0,
    backoff: float = 1.0,
) -> T:
    """Call ``fn`` up to ``tries`` times, sleeping ``delay`` (scaled by
    ``backoff`` each attempt) between failures; re-raises the last
    exception.  Matches the reference retry semantics (any Exception
    is retryable)."""
    attempt, wait = 0, delay
    while True:
        try:
            return fn()
        except Exception:  # noqa: BLE001 — parity: reference retries any error
            attempt += 1
            if attempt >= tries:
                raise
            logging.warning(
                "retry %d/%d after failure", attempt, tries, exc_info=True
            )
            if wait > 0:
                time.sleep(wait)
            wait *= backoff


def retry(
    tries: int = 3, delay: float = 5.0, backoff: float = 1.0
) -> Callable[[Callable[..., T]], Callable[..., T]]:
    """Decorator form, mirroring the reference's ``@retry(tries=3,
    delay=5)`` usage."""

    def deco(fn: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(fn)
        def wrapped(*args, **kwargs) -> T:
            return with_retry(
                lambda: fn(*args, **kwargs), tries=tries, delay=delay,
                backoff=backoff,
            )

        return wrapped

    return deco
