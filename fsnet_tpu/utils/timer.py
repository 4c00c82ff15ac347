"""Step timing, ETA, and the DEBUGGING-gated profiling decorator.

Reference: ``vision_base/utils/timer.py``. The reference's ``profile`` decorator
wraps a callable with ``torch.cuda.synchronize()`` + wall clock when env
``DEBUGGING=1``; the JAX analogue blocks on the returned arrays
(``jax.block_until_ready``) so the async dispatch queue drains before timing.
"""
from __future__ import annotations

import functools
import os
import time

import jax


def _is_debugging() -> bool:
    return os.environ.get("DEBUGGING", "").lower() in ("1", "true")


def profile(name: str = "", start: int = 0, end: int = 100000):
    """Print per-call latency for calls in [start, end) when DEBUGGING is set.

    Reference ``vision_base/utils/timer.py:5-34``. The wrapped function's outputs
    are blocked on so the measured time includes device execution, mirroring the
    reference's ``torch.cuda.synchronize()``.
    """

    def decorator(func):
        if not _is_debugging():
            return func

        call_count = [0]

        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            idx = call_count[0]
            call_count[0] += 1
            if not (start <= idx < end):
                return func(*args, **kwargs)
            t0 = time.time()
            result = func(*args, **kwargs)
            try:
                result = jax.block_until_ready(result)
            except Exception:  # noqa: BLE001 - non-array outputs are fine
                pass
            print(f"[profile] {name or func.__name__} call {idx}: "
                  f"{(time.time() - t0) * 1000.0:.2f} ms")
            return result

        return wrapped

    return decorator


def formatting_time(seconds: float) -> str:
    """Format seconds into 'Dd HH:MM:SS' (reference ``timer.py:80-100``)."""
    seconds = int(max(seconds, 0))
    days, rem = divmod(seconds, 86400)
    hours, rem = divmod(rem, 3600)
    minutes, secs = divmod(rem, 60)
    if days > 0:
        return f"{days}d {hours:02d}:{minutes:02d}:{secs:02d}"
    return f"{hours:02d}:{minutes:02d}:{secs:02d}"


class Timer:
    """Wall-clock ETA for the training loop (reference ``timer.py:37-79``)."""

    def __init__(self):
        self.start_time = time.time()
        self.last_time = self.start_time

    def reset(self) -> None:
        self.start_time = time.time()
        self.last_time = self.start_time

    def tick(self) -> float:
        """Seconds since last tick."""
        now = time.time()
        delta = now - self.last_time
        self.last_time = now
        return delta

    def elapsed(self) -> float:
        return time.time() - self.start_time

    def compute_eta(self, done_steps: int, total_steps: int) -> str:
        if done_steps <= 0:
            return "--:--:--"
        rate = self.elapsed() / done_steps
        return formatting_time(rate * (total_steps - done_steps))
