"""Operator-internal cache bookkeeping.

Operators that return a LAZY DataFrame but ``persist()`` intermediate
frames (minhash candidate sets, LM count tables) cannot unpersist
inside the builder -- the caller's action is what materializes and
reuses the cache.  Left alone, those MEMORY_AND_DISK entries pin the
SQL CacheManager for the session lifetime per invocation (the leak
class operators/quantiles.py eliminated for its eager path).  Each such
module keeps a :class:`CacheRegistry`; builders register every frame
they persist, and callers that batch many invocations in one session
(the oracle sweep, bench loops, notebook exploration) sweep between
invocations with the module's ``release_*_caches()`` helper.

The registry holds strong references deliberately: an unreferenced
persisted Dataset is exactly the entry that can no longer be
unpersisted by anyone else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheRegistry:
    """Tracks DataFrames persisted by one operator family."""

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def track(self, df: DataFrame) -> DataFrame:
        """Register an already-``persist()``-ed frame; returns it."""
        self._frames.append(df)
        return df

    def release(self) -> int:
        """Unpersist every tracked frame (non-blocking); returns how
        many were released.  Safe to call repeatedly and with actions
        still pending elsewhere -- Spark recomputes lineage if a
        released cache is read again."""
        n = 0
        while self._frames:
            df = self._frames.pop()
            try:
                df.unpersist(False)
                n += 1
            except Exception:  # pragma: no cover - session already gone
                pass
        return n
