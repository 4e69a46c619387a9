#!/usr/bin/env python
"""Generate the sf≈1 scaling fixture: a DETERMINISTIC key-shifted 10×
self-union of the driver's sf0.1 tables, written to ``.sf1/`` inside
the repo (gitignored — ~10× sf0.1 on disk, regenerate at will).

Construction (copy index i = 0..9; copy 0 is the identity):

- every id/foreign-key column shifts by ``i * 10_000_000`` — joins
  line up only within a copy, so the union behaves like one database
  at 10× the scale factor (10× customers/orders/suppliers, same
  per-entity cardinality ratios), not like 10 overlaid duplicates;
- ``events.ts`` shifts by ``i`` seconds. This keeps PER-USER timestamp
  uniqueness (user_ids are copy-shifted, so each user's events come from
  exactly one copy) — which is what the session/EWMA/TWAP paths key on.
  It does NOT guarantee corpus-wide uniqueness: two base events exactly
  1–9 seconds apart can collide across copies;
- ``documents.text`` for copies i≥1 gets a copy-specific purely-
  alphabetic marker token inserted every 5 tokens: cross-copy texts
  drop to Jaccard ≈ 0.25 on 3-shingles, so near-dup workloads scale
  like a 10× corpus with the SAME internal dup-rate instead of every
  doc gaining 9 artificial near-twins (which would explode pair
  outputs quadratically and measure output size, not plan scaling);
  ``n_chars`` is recomputed;
- ``embeddings.embedding`` for copies i≥1 gets a deterministic
  integer-hash jitter of ±0.1 per dimension (cross-copy cosine drops
  well below dedup thresholds — same reasoning as the text marker).

Usage: python scripts/make_sf1.py  (~1 min; skips if .sf1 exists)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1")
OFFSET = 10_000_000
N_COPIES = 10

KEY_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
MARKERS = [
    None, "cpalpha", "cpbravo", "cpcarol", "cpdelta",
    "cpecho", "cpfox", "cpgolf", "cphotel", "cpindia",
]


def main(force: bool = False) -> None:
    if os.path.isdir(DST):
        if not force:
            print(f"{DST} exists — skipping (pass --force to regenerate)")
            return
        shutil.rmtree(DST)

    from pyspark.sql import functions as F

    from mapreduce_project_spark.session import get_spark

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    for table, keys in KEY_COLS.items():
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        copies = []
        for i in range(N_COPIES):
            c = base
            for kc in keys:
                c = c.withColumn(kc, (F.col(kc) + F.lit(i * OFFSET)).cast("bigint"))
            if table == "events" and i:
                c = c.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} SECONDS"))
            if table == "documents" and i:
                mk = MARKERS[i]
                # insert the marker after every 5th token (aggregate
                # over the split array — deterministic, JVM-side)
                c = c.withColumn(
                    "text",
                    F.expr(
                        "array_join(flatten(transform("
                        "  split(text, ' '), "
                        f" (w, j) -> CASE WHEN (j + 1) % 5 = 0 THEN array(w, '{mk}') "
                        "   ELSE array(w) END)), ' ')"
                    ),
                ).withColumn("n_chars", F.length("text").cast("bigint"))
            if table == "embeddings" and i:
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, d) -> CAST(x + "
                        f"(((({i} * 1000003 + d * 7919) % 1000) / 1000.0) * 0.2 - 0.1)"
                        " AS FLOAT))"
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
        print(f"{table}: {base.count()} -> {out.count()} rows", flush=True)
    spark.stop()
    print(f"wrote {DST}")


if __name__ == "__main__":
    main(force="--force" in sys.argv)
