"""Python UDTF surface (SURVEY §2.9 — user extensibility).

The reference has no user-extensibility surface at all: every function
is engine-internal Clojure (core.clj). The engine exposes Spark's full
extension trio — row UDF, (pandas) vectorized UDF/UDAF, and this
module's member: a user-defined *table* function (Spark 4 `@udtf`),
invocable from SQL via `LATERAL`.

The demo op is the training-pipeline one: context chunking — split a
document into fixed-size word windows, one output row per chunk. UDTFs
are the Python slow path (row fan-out crosses the JVM↔Python boundary),
so the engine keeps them for genuinely imperative fan-out logic; for
everything expressible with arrays, `explode`/`posexplode` over
built-in functions stays JVM-side (see tvf_posexplode_name_tokens).

Arrow note: `useArrow=True` batches rows over Arrow instead of pickle —
same semantics, lower serialization cost; the harness falls back to
pickle transparently if Arrow UDTF support is unavailable.
"""

from __future__ import annotations

import sys

from pyspark.sql.functions import udtf

try:
    # UDTF handlers are classes, which cloudpickle serializes BY
    # REFERENCE (module + qualname): the Python worker would then have
    # to import this package, which fails whenever the driver process
    # was launched from a cwd outside the repo (sys.path manipulation
    # on the driver does not propagate to spawned workers). Registering
    # the module for by-value pickling ships the class definition
    # inside the serialized command instead — no import needed
    # worker-side.
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older pickler without the API
    pass

#: context-window size in words for `ChunkWords`
CHUNK_SIZE = 32


class _ChunkWords:
    """Emit (chunk_idx, chunk, n_words) context windows of
    `CHUNK_SIZE` whitespace-separated words per input document.

    Deterministic and oracle-parity-friendly: `str.split()` ==
    DuckDB `string_split_regex(trim(text), '\\s+')` on non-empty
    text; docs with no words emit no rows (like `explode` of an
    empty array).
    """

    def eval(self, text: str):
        if text is None:
            return
        words = text.split()
        for i in range(0, len(words), CHUNK_SIZE):
            w = words[i : i + CHUNK_SIZE]
            yield i // CHUNK_SIZE, " ".join(w), len(w)


_RETURN = "chunk_idx int, chunk string, n_words int"

try:  # Arrow-optimized UDTF (Spark 4); fall back to pickle transport
    ChunkWords = udtf(_ChunkWords, returnType=_RETURN, useArrow=True)
except Exception:  # pragma: no cover - environment-dependent
    ChunkWords = udtf(_ChunkWords, returnType=_RETURN)
