"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``sprin/cassaforte-meter-transmission-gen``
(a Clojure generator that writes 15 kHz power-meter samples and maintains
second/minute/hour/day energy rollups in Cassandra — see
``/root/reference/src/cassaforte_test/core.clj``), rebuilt Spark-first:

- deterministic DataFrame generation of meter transmissions
  (``sources.meter_generator``; reference core.clj:37-41,155-161)
- per-second energy from sample arrays via ``aggregate()``
  (``functions.energy``; reference core.clj:43-46)
- multi-granularity rollup chain second→minute→hour→day as grouped sums
  (``operators.rollups``; reference core.clj:110-153, COUNTER semantics)
- a general operator catalog (joins, windows, set ops, scalar functions)
  over the driver's TPC-H-ish corpus (``plans.*``)
- LLM-data-pipeline extensions: dedup, similarity search, text analysis,
  multimodal columns (``operators.dedup`` / ``operators.similarity`` / ...)
- Structured Streaming path replacing the reference's 1 Hz write loop
  (``streaming.pipeline``; reference core.clj:163-176)

Every operator is designed for a multi-executor cluster at ~100 TB:
declarative DataFrame plans (Catalyst does pushdown/pruning/reordering),
broadcast for small dims, partial aggregation for rollups, no
driver-side loops, Python only in Arrow-batched UDFs off the hot path.
"""

__version__ = "0.1.0"
