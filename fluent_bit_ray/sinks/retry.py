"""Bounded sink retry with capped-exponential backoff.

Reference parity (studied, not copied): src/flb_scheduler.c:185-230 — the
engine schedules chunk-flush retries with "backoff full jitter"
(wait = uniform(0, min(cap, base * 2^n)), base 5s cap 2000s) and an
output's Retry_Limit bounds the attempts before the chunk is discarded.

Batch-engine layering (the documented retry design):
1. TRANSIENT sink errors (EAGAIN-class OSErrors on write) retry IN-TASK
   with this policy — deterministic jitter (hashed from the attempt count
   and a caller token, no process randomness) so reruns are reproducible.
2. Retries exhausted -> the exception propagates and RAY's task retry /
   lineage reconstruction takes over (worker loss, OOM kills).
3. Both layers are safe to replay because every sink write is
   content-addressed (writers.py _chunk_token): a re-executed write lands
   on the same path with identical bytes, never duplicating output. The
   reference instead discards the chunk after Retry_Limit — a batch engine
   must not silently drop data, so exhaustion FAILS the task (divergence,
   documented).
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass

# scaled-down defaults: the reference waits seconds between FLUSHES of a
# long-lived daemon; an in-task retry loop wants sub-second granularity
BASE_SEC = 0.05
CAP_SEC = 2.0


def backoff_full_jitter(attempt: int, token: str = "", base: float = BASE_SEC,
                        cap: float = CAP_SEC) -> float:
    """Deterministic full-jitter backoff: uniform(0, min(cap, base*2^n))
    with the uniform draw derived from blake2b(token, attempt)."""
    exp = min(cap, (1 << min(attempt, 30)) * base)
    h = hashlib.blake2b(f"{token}:{attempt}".encode(), digest_size=8)
    frac = int.from_bytes(h.digest(), "little") / float(2**64)
    return exp * frac


@dataclass(frozen=True)
class RetryPolicy:
    retry_limit: int = 3  # attempts AFTER the first try; <0 = unlimited off
    base_sec: float = BASE_SEC
    cap_sec: float = CAP_SEC

    def run(self, fn, token: str = "", sleep=time.sleep):
        """Call fn(); on OSError retry up to retry_limit times with
        deterministic backoff, then re-raise (Ray's task layer takes over).
        """
        attempt = 0
        while True:
            try:
                return fn()
            except OSError:
                if attempt >= self.retry_limit:
                    raise
                sleep(backoff_full_jitter(attempt, token,
                                          self.base_sec, self.cap_sec))
                attempt += 1
