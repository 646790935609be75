"""disq_spark — a PySpark-native analytics engine with the capabilities of
disq-bio/disq (distributed genomics-format I/O) re-expressed Spark-first,
plus the relational/LLM-data-pipeline operators a 100 TB training-data
pipeline needs.

Design (see SURVEY.md):
- DataFrames everywhere; genomics formats surface as typed DataFrames.
- Partition planning for splittable compressed formats happens driver-side
  (index-driven where indexes exist), decode happens in Arrow-batched
  Pandas stages (``mapInPandas``), relational work stays JVM-side in
  whole-stage codegen.
- Single-file outputs use the reference's signature pattern (headerless
  part files + header + terminator + filesystem concat), re-implemented as
  a post-commit merge.
"""

from disq_spark.session import get_session

__version__ = "0.1.0"

__all__ = ["get_session", "__version__"]
