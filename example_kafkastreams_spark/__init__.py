"""example_kafkastreams_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of mkuthan/example-kafkastreams.

The reference (see /root/reference, SURVEY.md) is a Kafka Streams demo:
windowed deduplication and a windowed stream-stream left join (clickstream
enrichment), implemented via the high-level DSL and a hand-optimized
Processor API. This package re-expresses every capability Spark-first:

- ``session``    — SparkSession factory tuned for local[N] and cluster scale
- ``schemas``    — explicit StructTypes for the clickstream model + testdata
- ``catalog``    — parquet table loaders / temp-view registration
- ``operators``  — batch operators: windowed dedup (A1/A2), as-of look-back
                   join (J2), symmetric interval join (J1), enrichment
                   pipeline (P1-P6 composition)
- ``functions``  — column-expression libraries (vectors, text, JSON props)
- ``sources``    — batch/streaming sources & sinks (parquet, kafka, rate,
                   memory) — reference §2.1 S1-S7
- ``streaming``  — Structured Streaming parity: watermarked windowed dedup,
                   stream-stream interval join, emission-anchored dedup via
                   applyInPandasWithState
- ``plans``      — plan introspection (exchange counting, pushdown checks)

LLM-data-pipeline ops at 100 TB design scale live in ``operators``
(``neardup``: exact + MinHash-LSH + SimHash + n-gram Jaccard dedup;
``knn``: similarity search; ``multimodal``: binary column plumbing)
with the text-analysis expressions in ``functions.portable`` — all
declared as q4x/q5x in ``queries_llm``.

Design rules (SURVEY.md §1.2, §4): DataFrame/SQL only — no RDDs; all hot
paths in built-in Column expressions (whole-stage codegen); Arrow-batched
pandas only where semantics demand state or vectorized Python; explicit
schemas so parquet pruning/pushdown work.
"""

__version__ = "0.1.0"
