"""Derive an N x scaled dataset from a driver testdata dir — for
SCALING MEASUREMENT ONLY (never correctness: the oracle gates always
run on the driver's own parquet).

Usage:
    python tools/scale_testdata.py SRC_DIR DST_DIR [factor]

Construction: ``factor`` key-shifted copies of every fact/dim table,
copy 0 being the originals. The shifts keep the star schema's FK
structure intact per copy (orders copy i references customer copy i,
lineitem copy i references orders/part/supplier copy i), so join
selectivities and per-key cardinalities match the source distribution
and only VOLUME grows — which is what a scaling exponent should
measure.

Two tables need more than a key shift to stay representative:

- ``documents``: verbatim copies would make every doc a member of a
  10-way duplicate group, inflating near-dup candidate pairs ~45x per
  doc (quadratic in copies) — nothing like a real 10x corpus. Instead
  every whitespace token in copy i>0 gets a ``~i`` suffix: all shingles
  / minhash / simhash values change, so copies are unrelated to each
  other, while WITHIN a copy the exact-dup and near-dup relationships
  of the source corpus are reproduced exactly — duplicate structure
  scales linearly, like a corpus that actually grew.
- ``embeddings``: copy i>0 rotates each vector's dimensions by i
  positions. Rotation preserves norms and every intra-copy cosine
  (near-dup/kNN structure identical per copy) while cross-copy cosines
  decorrelate, again scaling neighbor structure linearly.
- ``part``/``customer``/``supplier`` name columns get the same
  per-token suffix as documents: verbatim name copies would either
  collapse under the fuzzy-match queries' ``.distinct()`` (zero growth)
  or, once distinct, form 10-way identical-name cliques (quadratic
  match growth). Suffixed copies keep intra-copy edit distances exactly
  (suffixes align token-wise) and put each copy in DISJOINT blocking
  buckets — distinct names and block COUNT grow 10x with block sizes
  constant. Note the real fixed-vocabulary regime grows block SIZE
  instead (quadratic pair work) — that regime is called out separately
  in SCALE.md's entity-resolution notes.

``region``/``nation`` are fixed dimensions at every TPC-H scale factor
and are copied verbatim. ``events`` keeps its time range (event RATE
grows 10x, the realistic shape — hour-grid grain stays constant while
volume scales).

Output is plain parquet, one file per table, readable by the same
``queries._t`` loader as the driver's dirs.
"""

from __future__ import annotations

import os
import sys

import duckdb

# (table, [key columns to shift], extra transform tag)
TABLES = [
    ("region", [], None),
    ("nation", [], None),
    ("customer", ["c_custkey"], "perturb:c_name"),
    ("supplier", ["s_suppkey"], "perturb:s_name"),
    ("part", ["p_partkey"], "perturb:p_name"),
    ("orders", ["o_orderkey", "o_custkey"], None),
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"], None),
    ("events", ["event_id", "user_id"], None),
    ("documents", ["doc_id"], "perturb:text"),
    ("embeddings", ["vec_id"], "rotate_vec"),
]

# which base table's max key each shifted column stretches over
KEY_BASE = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def scale_dir(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    maxes = {}
    for col, (table, base_col) in KEY_BASE.items():
        maxes[col] = con.execute(
            f"SELECT max({base_col}) + 1 FROM "
            f"'{src}/{table}.parquet'").fetchone()[0]

    for table, keys, extra in TABLES:
        src_pq = f"{src}/{table}.parquet"
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src_pq}'").fetchall()]
        selects = []
        for i in range(factor if keys else 1):
            perturb_col = (extra.split(":", 1)[1]
                           if extra and extra.startswith("perturb:") else None)
            proj = []
            for c in cols:
                if c in keys and i:
                    proj.append(f"{c} + {i * maxes[c]} AS {c}")
                elif c == perturb_col and i:
                    # suffix every token: all shingles/blocks change, so
                    # copies are unrelated while intra-copy duplicate and
                    # edit-distance structure is preserved (docstring)
                    proj.append(
                        rf"regexp_replace({c}, '(\S+)', "
                        f"'\\1~{i}', 'g') AS {c}")
                elif perturb_col == "text" and c == "n_chars" and i:
                    proj.append(
                        r"length(regexp_replace(text, '(\S+)', "
                        f"'\\1~{i}', 'g')) AS n_chars")
                elif extra == "rotate_vec" and c == "embedding" and i:
                    proj.append(
                        f"(embedding[{i + 1}:] || embedding[1:{i}])"
                        f"::FLOAT[] AS embedding")
                else:
                    proj.append(c)
            selects.append(
                f"SELECT {', '.join(proj)} FROM '{src_pq}'")
        union = " UNION ALL ".join(selects)
        out = f"{dst}/{table}.parquet"
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows -> {out}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit("usage: scale_testdata.py SRC_DIR DST_DIR [factor]")
    scale_dir(sys.argv[1], sys.argv[2],
              int(sys.argv[3]) if len(sys.argv) > 3 else 10)
