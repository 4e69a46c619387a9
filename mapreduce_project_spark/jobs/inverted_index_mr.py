"""Inverted index in the MapReduce-facade form (run via
``mapreduce.run_job``). Same contract as the reference job
(``client_folder/jobs/inverted_index.py``): map emits
``(word, doc_key)`` for the distinct words of a doc (:25-44), reduce
returns ``(word, sorted(set(values)))`` (:47-62). Values arrive
stringified (reference type-erasure at the shuffle,
``worker.py:137-138``), so postings sort lexicographically — faithful
to observed reference behavior. Written fresh, not copied.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"[a-z]+")


def mr_map(key, value):
    for word in set(_TOKEN_RE.findall(str(value).lower())):
        yield word, key


def mr_reduce(key, values):
    return key, sorted(set(values))
