"""Retry-with-backoff for transient TPU-backend failures.

The dev TPU is reached through a tunnel that can drop mid-compile
(observed: "remote_compile: response body closed" killing a 66-minute
training run at its first validation).  Such failures are transient;
training drivers retry them instead of dying.
"""

from __future__ import annotations

import time

TRANSIENT_SIGNATURES = (
    "remote_compile",
    "read body",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection reset",
    "Socket closed",
)


def retry_transient(logger, what, fn, *args, attempts: int = 4, **kwargs):
    """Call ``fn`` retrying transient backend errors with linear backoff.

    Non-transient errors (and the final attempt's) propagate unchanged.
    """
    import jax

    for attempt in range(attempts):
        try:
            return fn(*args, **kwargs)
        except jax.errors.JaxRuntimeError as e:
            msg = str(e)
            if attempt == attempts - 1 or not any(
                s in msg for s in TRANSIENT_SIGNATURES
            ):
                raise
            wait = 15 * (attempt + 1)
            logger.warning(
                f"{what}: transient backend error (attempt {attempt + 1}), "
                f"retrying in {wait}s: {msg.splitlines()[0][:200]}"
            )
            for h in logger.handlers:
                h.flush()
            time.sleep(wait)
