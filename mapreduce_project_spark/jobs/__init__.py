from mapreduce_project_spark.jobs.inverted_index import inverted_index
from mapreduce_project_spark.jobs.word_count import word_count

__all__ = ["word_count", "inverted_index"]
