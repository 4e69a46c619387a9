"""Word count in the MapReduce-facade form (run via
``mapreduce.run_job``). Same contract as the reference job
(``client_folder/jobs/word_count.py``): iterator yields one
``(file_path, content)`` record per file (:10-21), map emits
``(word, 1)`` per token (:23-41), reduce sums (:44-56). Written fresh
against that contract, not copied.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"[a-z]+")


def mr_iterator(content: bytes, metadata: dict):
    # the facade hands iterators RAW FILE BYTES (reference contract,
    # worker.py:131-138); decode exactly like the reference job does
    # (client_folder/jobs/word_count.py)
    yield metadata["file_path"], content.decode("utf-8")


def mr_map(key, value):
    for word in _TOKEN_RE.findall(str(value).lower()):
        yield word, 1


def mr_reduce(key, values):
    return key, sum(int(v) for v in values)
