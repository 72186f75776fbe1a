"""novelti_dingo_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference system (novelti/novelti-dingo), built on the
public PySpark DataFrame/SQL API: declarative logical plans, Catalyst
optimization, whole-stage codegen, AQE. See SURVEY.md §2 for the binding
operator inventory and §0 for evidence provenance (the reference checkout is
empty; the contract is the driver's oracle gate).

Layout:
- ``schemas``    pinned StructTypes for the ten test tables
- ``sources``    parquet/csv/json readers, table registry, sinks
- ``operators``  relational / window / streaming-shaped / LLM-pipeline ops
- ``functions``  scalar & vector helper expressions (JVM-side, UDF-free)
- ``streaming``  batch/stream shared event-pipeline builders
- ``registry``   name -> (spark query fn, duckdb oracle SQL) catalogue
"""

__version__ = "0.1.0"
