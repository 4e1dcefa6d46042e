"""llm_batch_processor_spark — a PySpark-native batch analytics + LLM-dataset engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ``keyasuda/llm-batch-processor`` (a Ruby
stdin→LLM-map→stdout batch tool; see SURVEY.md), generalized to a full
relational + LLM-data-pipeline operator inventory:

- ``sources/``   — JSONL/parquet scans and sinks (corrupt-record routing).
- ``functions/`` — scalar text/vector functions (think-strip, lang-id,
  quality scoring, token counting, fingerprints, cosine math).
- ``operators/`` — dataset-level operators (dedup exact/MinHash/SimHash/
  n-gram-Jaccard/embedding, similarity search, sessionization, as-of join,
  multimodal column plumbing).
- ``job/``       — reference-parity LLM batch jobs: YAML JobSpec, template
  rendering, chat backends (OpenAI-compatible + deterministic mock),
  Arrow-batched inference UDF, CLI.
- ``queries/``   — the declared query inventory (SURVEY.md §2 Part B) with
  DuckDB oracle SQL for the driver's correctness gate.
- ``streaming/`` — Structured Streaming variants of the batch operators.

Everything is DataFrame/Catalyst-first: built-in functions over UDFs,
broadcast hints for bounded dims, decimal-exact aggregation where the
oracle comparison demands bit-stable sums, AQE left on for skew/coalesce.
"""

__version__ = "0.1.0"
