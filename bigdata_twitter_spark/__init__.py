"""bigdata_twitter_spark — a PySpark-native analytics engine.

A from-scratch, Spark-idiomatic rebuild of the query/data-processing
capabilities of the ``ethanhanner/BigData-Twitter`` reference (a
tweet-log stream/batch analytics project; see SURVEY.md §0 — the
reference checkout is empty, so the binding spec is the driver harness
plus the reconstructed capability surface in SURVEY.md §2), extended
with LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Design: declare logical plans with the DataFrame/SQL API and let
Catalyst/Tungsten/AQE choose physical strategies.  Python touches data
only through Arrow-vectorized pandas UDFs, and only where built-in
functions genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
