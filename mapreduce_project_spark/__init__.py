"""mapreduce_project_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark DataFrame/SQL engine with the query and
data-processing capability surface of ``canyang25/mapreduce-project``
(a from-scratch Python/gRPC/HDFS MapReduce framework; see SURVEY.md),
re-expressed Spark-first:

- the generic ``iterator → map → shuffle → group → reduce`` programming
  model becomes a thin compatibility facade (`mapreduce.run_job`) over
  ``mapInPandas`` / ``repartition`` / ``applyInPandas``;
- the concrete analytics of the reference's example jobs (word count:
  ``client_folder/jobs/word_count.py``; inverted index:
  ``client_folder/jobs/inverted_index.py``) become native DataFrame
  queries (`jobs/`);
- the relational capability surface users write as map/reduce functions
  (SURVEY.md §2.B) is exposed natively (`operators/relational.py`,
  `operators/join.py`, `operators/windows.py`);
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns, event windowing) live in `operators/` and are
  designed for 100 TB scale (partitioning/broadcast/AQE notes inline).
"""

from mapreduce_project_spark.session import get_spark, prep_session

__all__ = ["get_spark", "prep_session"]
