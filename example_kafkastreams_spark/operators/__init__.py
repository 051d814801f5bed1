from .dedup import (
    dedup_emission_anchored,
    dedup_exact,
    dedup_tumbling_window,
)
from .asof_join import asof_lookback_left_join, interval_left_join
from .enrich import enrich_clickstream, split_clickstream
from .index_maint import COMPACTED_RUN, compact_index
from .retrieval import (
    all_terms_qrels,
    bm25_index_append_sink,
    ndcg_tables,
    bm25_index_compact,
    bm25_index_query,
    bm25_index_write,
    bm25_top_docs,
    retrieval_eval,
    rrf_fuse,
    term_overlap_top_docs,
)
from .ann_drift import (
    ann_index_drift,
    quantization_stats,
    record_train_stats,
    should_rebuild,
)
# Lazy (PEP 562): report/knn define @pandas_udf surfaces whose DDL
# return types parse against an ACTIVE SparkSession — an eager import
# here would make `import example_kafkastreams_spark.operators` fail
# before any session exists (pytest collection, plain tooling).
_LAZY = {
    "pq_ann_trained_build": "knn",
    "pq_ann_trained_serve": "knn",
    "ivf_pq_ann_trained_build": "knn",
    "ivf_pq_ann_trained_serve": "knn",
    "ivf_flat_ann_trained_build": "knn",
    "corpus_report": "report",
    "split_leakage_report": "report",
    "assign_split": "sampling",
    "stratified_sample": "sampling",
    "weighted_sample": "sampling",
    "kmv_distinct": "sketches",
    "kmv_set_ops": "sketches",
    "hll_registers": "sketches",
    "hll_registers_grouped": "sketches",
    "hll_estimate": "sketches",
    "hll_estimate_grouped": "sketches",
    "hll_merge": "sketches",
    "hll_corrected_estimate": "sketches",
    "bloom_words": "sketches",
    "bloom_vector": "sketches",
    "bloom_probe_expr": "sketches",
    "mix_sources_temperature": "mixing",
    "temperature_rates": "mixing",
    "scd2_from_changelog": "scd",
    "scd2_point_in_time_join": "scd",
    "scd2_dim_stats": "scd",
    "scd2_apply_delta": "scd",
    "scd2_store_read": "scd",
    "scd2_store_sink": "scd",
    "matryoshka_knn": "knn",
    "snapshot_diff": "diffs",
    "snapshot_diff_counts": "diffs",
    "contrastive_pairs": "mining",
    "epoch_shuffle_key": "mining",
    "curriculum_bins": "mining",
    "curriculum_order": "mining",
    "train_hashed_classifier": "quality_clf",
    "weights_vector": "quality_clf",
    "score_inline": "quality_clf",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(f".{_LAZY[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(name)


__all__ = [
    "pq_ann_trained_build",
    "pq_ann_trained_serve",
    "ivf_pq_ann_trained_build",
    "ivf_pq_ann_trained_serve",
    "ivf_flat_ann_trained_build",
    "corpus_report",
    "split_leakage_report",
    "COMPACTED_RUN",
    "compact_index",
    "bm25_top_docs",
    "bm25_index_write",
    "bm25_index_query",
    "bm25_index_append_sink",
    "bm25_index_compact",
    "rrf_fuse",
    "term_overlap_top_docs",
    "all_terms_qrels",
    "retrieval_eval",
    "ndcg_tables",
    "weighted_sample",
    "kmv_distinct",
    "kmv_set_ops",
    "hll_registers",
    "hll_registers_grouped",
    "hll_estimate",
    "hll_estimate_grouped",
    "hll_merge",
    "hll_corrected_estimate",
    "bloom_words",
    "bloom_vector",
    "bloom_probe_expr",
    "mix_sources_temperature",
    "temperature_rates",
    "scd2_from_changelog",
    "scd2_point_in_time_join",
    "scd2_dim_stats",
    "scd2_apply_delta",
    "scd2_store_read",
    "scd2_store_sink",
    "matryoshka_knn",
    "snapshot_diff",
    "snapshot_diff_counts",
    "contrastive_pairs",
    "epoch_shuffle_key",
    "curriculum_bins",
    "curriculum_order",
    "train_hashed_classifier",
    "weights_vector",
    "score_inline",
    "ann_index_drift",
    "quantization_stats",
    "record_train_stats",
    "should_rebuild",
    "dedup_tumbling_window",
    "dedup_exact",
    "dedup_emission_anchored",
    "asof_lookback_left_join",
    "interval_left_join",
    "enrich_clickstream",
    "split_clickstream",
]
