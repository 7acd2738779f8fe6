"""new_data_pipeline_spark — a PySpark-native analytics & data-pipeline engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ML data-ingestion pipeline
(Arya-ai/new_data_pipeline; see SURVEY.md), extended with a relational
query core, LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) and Structured Streaming — all
designed for 100 TB scale: declarative DataFrame plans so Catalyst can
push down filters/prune columns, broadcast joins for dimension tables,
AQE for skew, and no driver-side loops in any hot path.

Layout (SURVEY.md §7):
- ``session``    — SparkSession builder (AQE on, tuned shuffle partitions)
- ``catalog``    — testdata table loading + temp-view registration
- ``registry``   — query registry binding each operator to its DuckDB oracle
- ``operators/`` — relational core + LLM extension operators
- ``sources/``   — declarative ingest (reference S4-S8), tensorize, sink
- ``functions/`` — scalar/vector/text helper columns
- ``streaming/`` — Structured Streaming over the events table
"""

from new_data_pipeline_spark.registry import QUERIES, register  # noqa: F401


def load_all() -> None:
    """Import every operator module so their @register calls populate QUERIES."""
    import new_data_pipeline_spark.operators.relational  # noqa: F401
    import new_data_pipeline_spark.operators.joins  # noqa: F401
    import new_data_pipeline_spark.operators.aggregates  # noqa: F401
    import new_data_pipeline_spark.operators.windows  # noqa: F401
    import new_data_pipeline_spark.operators.setops  # noqa: F401
    import new_data_pipeline_spark.operators.composite  # noqa: F401
    import new_data_pipeline_spark.operators.tpch_suite  # noqa: F401
    import new_data_pipeline_spark.operators.tpch_suite2  # noqa: F401
    import new_data_pipeline_spark.operators.stats_agg  # noqa: F401
    import new_data_pipeline_spark.operators.sampling  # noqa: F401
    import new_data_pipeline_spark.operators.sketches  # noqa: F401
    import new_data_pipeline_spark.operators.quantile_sketch  # noqa: F401
    import new_data_pipeline_spark.operators.subqueries  # noqa: F401
    import new_data_pipeline_spark.operators.complex_types  # noqa: F401
    import new_data_pipeline_spark.operators.reshaping  # noqa: F401
    import new_data_pipeline_spark.operators.scalar_funcs  # noqa: F401
    import new_data_pipeline_spark.operators.dedup  # noqa: F401
    import new_data_pipeline_spark.operators.similarity  # noqa: F401
    import new_data_pipeline_spark.operators.pq  # noqa: F401
    import new_data_pipeline_spark.operators.clustering  # noqa: F401
    import new_data_pipeline_spark.operators.random_projection  # noqa: F401
    # ann_eval composes the similarity/pq/random_projection oracles at
    # import time — it must follow them
    import new_data_pipeline_spark.operators.ann_eval  # noqa: F401
    import new_data_pipeline_spark.operators.fuzzy_join  # noqa: F401
    import new_data_pipeline_spark.operators.incremental  # noqa: F401
    import new_data_pipeline_spark.operators.text_analysis  # noqa: F401
    import new_data_pipeline_spark.operators.sparse_retrieval  # noqa: F401
    import new_data_pipeline_spark.operators.attribution  # noqa: F401
    import new_data_pipeline_spark.operators.bpe  # noqa: F401
    import new_data_pipeline_spark.operators.boilerplate  # noqa: F401
    import new_data_pipeline_spark.operators.model_score  # noqa: F401
    import new_data_pipeline_spark.operators.nb_classifier  # noqa: F401
    import new_data_pipeline_spark.operators.source_rules  # noqa: F401
    import new_data_pipeline_spark.operators.graph  # noqa: F401
    import new_data_pipeline_spark.operators.hierarchy  # noqa: F401
    import new_data_pipeline_spark.operators.lm_score  # noqa: F401
    import new_data_pipeline_spark.operators.kmv_sketch  # noqa: F401
    import new_data_pipeline_spark.operators.setsim_join  # noqa: F401
    import new_data_pipeline_spark.operators.feature_eng  # noqa: F401
    import new_data_pipeline_spark.operators.assoc_rules  # noqa: F401
    import new_data_pipeline_spark.operators.privacy  # noqa: F401
    import new_data_pipeline_spark.operators.corpus_prep  # noqa: F401
    import new_data_pipeline_spark.operators.multimodal  # noqa: F401
    import new_data_pipeline_spark.operators.profiling  # noqa: F401
    import new_data_pipeline_spark.sources.ingest_queries  # noqa: F401
    import new_data_pipeline_spark.sources.acid_queries  # noqa: F401
    import new_data_pipeline_spark.streaming.event_queries  # noqa: F401
    import new_data_pipeline_spark.streaming.acid_sink  # noqa: F401
    import new_data_pipeline_spark.streaming.ann_serve  # noqa: F401
    import new_data_pipeline_spark.plans.layout_queries  # noqa: F401
