"""PySpark-native analytics engine with the query/data-processing
capabilities of ritsuka11/ETL-Visualization-of-cryptocurrency-trading-data.

Brand-new, Spark-first design (DataFrame/SQL/Catalyst/Structured
Streaming) — NOT a port of the reference's Kafka/Cassandra/Flask
plumbing. See SURVEY.md for the capability blueprint.

Layout:
    session      -- SparkSession factory tuned for local tests + cluster scale
    catalog      -- fixture-table loaders / temp-view registration
    operators/   -- relational + dataflow operators (derive, indicators,
                    latest-per-group, dedup, similarity, text)
    sources/     -- envelope (JSON) codec, table-router sink
    functions/   -- scalar-function library (SURVEY §2.8)
    plans/       -- serving-route query builders + oracle registry
    streaming/   -- Structured Streaming module (file-stream, stateful ops)
"""

__version__ = "0.1.0"
