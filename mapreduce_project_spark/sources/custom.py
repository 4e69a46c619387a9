"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the reference's user-defined record splitting (`iterator_fn`,
``worker.py:123,131-138``) as a first-class, partition-aware Spark
source instead of a post-read UDF.

``linefile`` source: given a ``path`` glob of text files, yields one row
per line with ``(file_path, line_no, line)`` — exactly the reference's
default iterator record shape (key = line number, ``worker.py:141-145``)
plus the file provenance its metadata dict carries (``worker.py:133``).

Scale notes: one partition per file (the reference's map-task unit,
``master.py:234-256``); Spark schedules partitions across executors, so
N files → N-way parallel read with no driver involvement beyond the
listing. For many small files at 100 TB, pack multiple files per
partition (the ``files_per_partition`` option).
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class LineFileReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("linefile source requires a `path` option")
        self.files_per_partition = int(options.get("files_per_partition", 1))

    def partitions(self):
        files = sorted(_glob.glob(self.path))
        if not files:
            raise FileNotFoundError(f"linefile: no files match {self.path}")
        k = self.files_per_partition
        return [_FilePartition(files[i : i + k]) for i in range(0, len(files), k)]

    def read(self, partition: _FilePartition):
        for p in partition.paths:
            with open(p, encoding="utf-8") as fh:
                for i, line in enumerate(fh.read().splitlines()):
                    yield (p, i, line)


class LineFileDataSource(DataSource):
    """``spark.read.format("linefile").option("path", glob).load()``"""

    @classmethod
    def name(cls) -> str:
        return "linefile"

    def schema(self) -> str:
        return "file_path string, line_no long, line string"

    def reader(self, schema: StructType) -> DataSourceReader:
        return LineFileReader(self.options)


def register_linefile_source(spark) -> None:
    """Idempotently register the ``linefile`` format on this session."""
    spark.dataSource.register(LineFileDataSource)
