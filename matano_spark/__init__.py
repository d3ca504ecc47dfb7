"""matano_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of matanolabs/matano (security data lake:
log ingestion/normalization, detections-as-code, stateful alerting,
enrichment joins, Iceberg-style lake maintenance), extended with
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Architecture is Spark-first: logical plans are declared with the
DataFrame/SQL API so Catalyst/Tungsten pick physical strategies
(broadcast joins, whole-stage codegen, AQE). See SURVEY.md for the
reference inventory this engine re-expresses.
"""

__version__ = "0.1.0"
