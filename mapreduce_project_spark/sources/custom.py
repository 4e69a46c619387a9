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

    def writer(self, schema: StructType, overwrite: bool):
        # sink half, defined later in this module (two-phase commit);
        # rows serialize as tab-joined text lines
        return LineFileWriter(self.options, overwrite)


def register_linefile_source(spark) -> None:
    """Idempotently register the ``linefile`` format on this session."""
    spark.dataSource.register(LineFileDataSource)


# ---------------------------------------------------------------------------
# Streaming variant: the same line-records contract as a STREAMING
# source (Spark 4 `SimpleDataSourceStreamReader`). Replays the matched
# files' lines in deterministic (file, line) order at a bounded
# per-batch rate — the local stand-in for a Kafka topic when testing
# streaming pipelines, and the reference's `iterator_fn` record model
# at stream time.
#
# The SIMPLE reader API is chosen deliberately: `read(start)` is a PURE
# function of the start offset (it returns the rows plus the next
# offset), so restart recovery is correct by construction — Spark
# replays any uncommitted batch with identical boundaries via
# `readBetweenOffsets`, and the file sink's per-batch log makes that
# replay idempotent. A stateful `latestOffset` on the full reader API
# is NOT restart-safe for a rate-limited source (the fresh reader's
# counter desynchronizes from the checkpointed offset — measured:
# shifted batch boundaries duplicate rows on restart). The trade-off:
# simple readers execute on the driver behind a prefetcher, which is
# the right cost for a replay/test source; a production
# partition-parallel source would keep the full-reader API and derive
# `latestOffset` from the external system's own cursor instead of
# local state.

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class LineFileStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("linefile stream requires a `path` option")
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        files = sorted(_glob.glob(self.path))
        if not files:
            raise FileNotFoundError(f"linefile: no files match {self.path}")
        # line counts once at planning time: fixes the replay extent and
        # makes every offset computation pure arithmetic
        self._files = []
        total = 0
        for p in files:
            with open(p, encoding="utf-8") as fh:
                n = len(fh.read().splitlines())
            self._files.append((p, total, total + n))
            total += n
        self._total = total

    def initialOffset(self):
        return {"idx": 0}

    def _slice(self, s: int, e: int):
        for path, fs, fe in self._files:
            lo, hi = max(s, fs), min(e, fe)
            if lo < hi:
                with open(path, encoding="utf-8") as fh:
                    lines = fh.read().splitlines()
                for i in range(lo - fs, hi - fs):
                    yield (path, i, lines[i])

    def read(self, start):
        s = start["idx"]
        e = min(s + self.rows_per_batch, self._total)
        # a concrete list ITERATOR, not a generator: the prefetcher
        # pickles the batch into its replay cache (generators cannot be
        # pickled; bare lists fail the iterator contract)
        return iter(list(self._slice(s, e))), {"idx": e}

    def readBetweenOffsets(self, start, end):
        # uncommitted-batch replay on recovery: same boundaries, same rows
        return iter(list(self._slice(start["idx"], end["idx"])))

    def commit(self, end):
        pass  # offsets are deterministic arithmetic; nothing to clean up


class LineFileStreamDataSource(DataSource):
    """``spark.readStream.format("linefile_stream").option("path", glob)
    .option("rows_per_batch", n).load()``"""

    @classmethod
    def name(cls) -> str:
        return "linefile_stream"

    def schema(self) -> str:
        return "file_path string, line_no long, line string"

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return LineFileStreamReader(self.options)


def register_linefile_stream_source(spark) -> None:
    """Idempotently register the ``linefile_stream`` format."""
    spark.dataSource.register(LineFileStreamDataSource)


# ---------------------------------------------------------------------------
# Custom Python DataSource WRITER — the sink half of the linefile
# surface. The reference's output protocol is exactly this two-phase
# shape: every worker writes its reduce partition to its own file and
# the master treats the job as committed only when all tasks report
# success (`worker.py:52-58,209`, `master.py`'s job_done accounting);
# here each Spark task writes a private temp file and returns a commit
# message, and the driver-side commit() atomically renames the
# reported temps into place (+ _SUCCESS marker) — failed or
# speculative attempts are aborted and their temps removed, so
# task retries never corrupt output.
# ---------------------------------------------------------------------------

from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _LineFileCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class LineFileWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        import os
        import uuid

        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("linefile sink requires a `path` option")
        self.overwrite = overwrite
        # job-scoped id, minted once on the driver and serialized to
        # every task: part files carry it so mode('append') lands new
        # uniquely-named parts instead of clobbering a prior write's
        # part-00000.txt, and the stale-temp sweep only touches THIS
        # job's temps (two concurrent writers can't delete each
        # other's in-flight task files)
        self.job_id = uuid.uuid4().hex[:12]
        os.makedirs(self.dir, exist_ok=True)

    def write(self, iterator):
        import os
        import uuid

        tmp = os.path.join(self.dir, f"_tmp-{self.job_id}-{uuid.uuid4().hex}")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    "\t".join("" if v is None else str(v) for v in row) + "\n"
                )
                n += 1
        return _LineFileCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages):
        import glob as g
        import os

        if self.overwrite:
            for old in g.glob(os.path.join(self.dir, "part-*.txt")):
                os.remove(old)
        committed = set()
        for i, m in enumerate(messages):
            dst = os.path.join(self.dir, f"part-{self.job_id}-{i:05d}.txt")
            os.replace(m.tmp_path, dst)
            committed.add(m.tmp_path)
        # stale temps from THIS job's failed/speculative attempts never
        # got a commit message — sweep them (job-scoped glob: a
        # concurrent writer's in-flight temps are not ours to touch)
        for leftover in g.glob(os.path.join(self.dir, f"_tmp-{self.job_id}-*")):
            if leftover not in committed:
                os.remove(leftover)
        # orphans from jobs that CRASHED before their own commit would
        # otherwise accumulate forever (nobody's job id matches them).
        # The age-based foreign sweep runs ONLY in overwrite mode: an
        # overwrite already claims exclusive ownership of the directory
        # (it deleted every part file above), so any foreign temp is by
        # definition from a dead job. Append mode promises concurrent-
        # writer safety, and a slow writer streaming a large partition
        # can legitimately hold an old-mtime temp (buffered writes only
        # advance mtime on flush) — its temps are never ours to touch.
        if self.overwrite:
            import time

            cutoff = time.time() - 3600
            for orphan in g.glob(os.path.join(self.dir, "_tmp-*")):
                try:
                    if orphan not in committed and os.path.getmtime(orphan) < cutoff:
                        os.remove(orphan)
                except OSError:  # already gone (racing sweeper) — fine
                    pass
        with open(os.path.join(self.dir, "_SUCCESS"), "w", encoding="utf-8") as fh:
            fh.write("")

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


