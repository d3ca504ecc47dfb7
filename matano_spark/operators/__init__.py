"""First-class DataFrame operators.

Library layer of the engine: each module exposes composable functions
(DataFrame -> DataFrame) built from Spark built-ins so Catalyst keeps
optimizing across operator boundaries. The workload queries in
matano_spark.workloads are thin wrappers over these with oracle SQL
attached for the correctness gate.
"""
