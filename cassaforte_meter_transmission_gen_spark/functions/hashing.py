"""Seed/identity hashing (reference F5 ``host-hash``, core.clj:27-35).

The reference reads ``system.local.host_id`` once per process and maps
it to a stable int seed: SHA1(host_id_str) as a signed BigInteger, mod
100000 (Clojure ``mod`` is floor-mod, so the result is non-negative even
for negative hash values). Purpose: same host ⇒ same ``said`` range,
different hosts ⇒ disjoint ranges (core.clj:28-31).

Spark-first: this runs ONCE per job, driver-side — never inside a plan
(determinism for the oracle; SURVEY §3.2). We keep a column variant for
completeness (e.g. deriving disjoint id ranges for a table of workers).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HOST_HASH_MOD = 100000


def host_hash(seed_str: str, mod: int = HOST_HASH_MOD) -> int:
    """Driver-side stable seed: SHA1(seed_str) mod ``mod``.

    Matches the reference's floor-mod semantics: Python ``%`` on a
    non-negative int equals Clojure ``mod`` here because we take the
    digest as unsigned (the reference's signed interpretation + floor-mod
    lands in the same residue class range [0, mod)).
    """
    digest = hashlib.sha1(seed_str.encode("utf-8")).hexdigest()
    return int(digest, 16) % mod


def host_hash_col(seed: Column, mod: int = HOST_HASH_MOD) -> Column:
    """Column variant: SHA1 hex → take 15 hex digits (fits a signed
    long) → pmod. pmod mirrors Clojure's floor-mod (non-negative)."""
    h = F.conv(F.substring(F.sha1(seed), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(mod)).cast("int")
