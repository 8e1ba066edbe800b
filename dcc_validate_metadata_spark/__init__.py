"""dcc_validate_metadata_spark — a from-scratch PySpark-native
constraint-validation + analytics engine with the query capabilities of
``FAANG/dcc-validate-metadata`` (see SURVEY.md), rebuilt Spark-first.

Subpackages
-----------
sources    : table catalogs + the deterministic image+caption fixture
rules      : declarative rule model compiled to vectorized Column exprs
operators  : stats / uniqueness / referential / drift / dedup / similarity
functions  : scalar helpers (snake_case, date-unit parsing, …)
images     : pure-Python PNG codec + Arrow-batched decode invariants
plans      : end-to-end validation pipeline + checkpoint manifest
streaming  : Structured-Streaming validation
"""

__version__ = "0.1.0"
