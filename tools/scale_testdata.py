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
- ``embeddings``: copy i>0 applies a distinct orthogonal transform —
  dimension rotation 1 + (i-1) % (dim-1) crossed with a whole-vector
  sign flip per (dim-1)-block. Each transform preserves norms and every
  intra-copy cosine (near-dup/kNN structure identical per copy) while
  cross-copy cosines decorrelate; 2*(dim-1) distinct copies exist at a
  given dim, and the tool REFUSES larger factors rather than silently
  repeating a transform (the old pure-rotation scheme clamped copies
  >= dim to the identity — exact cross-copy duplicates).
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


def scale_dir(src: str, dst: str, factor: int,
              tables: list[str] | None = None) -> None:
    """``tables``: optional subset to derive (e.g. just ``documents``
    for the text-dedup family) — a factor-1000 full derivation is
    ~17 GB dominated by lineitem; a documents-only one is ~1/10th."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # a factor-F derivation is an F-way UNION ALL; DuckDB's default
    # max_expression_depth (1000) rejects F >= ~1000
    con.execute(f"SET max_expression_depth TO {max(1000, 4 * factor)}")

    todo = TABLES if tables is None else [t for t in TABLES
                                          if t[0] in set(tables)]
    if tables is not None and len(todo) != len(set(tables)):
        unknown = set(tables) - {t[0] for t in TABLES}
        raise ValueError(f"unknown tables: {sorted(unknown)}")

    needed_cols = {c for _, keys, _ in todo for c in keys}
    maxes = {}
    for col, (table, base_col) in KEY_BASE.items():
        if col not in needed_cols:
            continue  # subset derivations may lack unrelated base tables
        maxes[col] = con.execute(
            f"SELECT max({base_col}) + 1 FROM "
            f"'{src}/{table}.parquet'").fetchone()[0]

    # embeddings: rotations repeat past the vector dimension — copy
    # i = dim under the old [i+1:]||[1:i] slicing silently CLAMPED to
    # the identity, making copies >= dim exact duplicates of copy 0
    # (cross-copy duplicate cliques a real 100x corpus does not have).
    # Use rotation 1 + (i-1) % (dim-1) (never identity) crossed with a
    # whole-vector sign flip per (dim-1)-block: 2*(dim-1) distinct
    # orthogonal transforms, each preserving norms and intra-copy
    # cosines while cross-copy cosines decorrelate (a flipped copy's
    # cosine against its unflipped twin is NEGATED — not a near-dup).
    dim = None
    if any(t[0] == "embeddings" for t in todo):
        dim = con.execute(
            f"SELECT len(embedding) FROM '{src}/embeddings.parquet' "
            f"LIMIT 1").fetchone()[0]
        if factor > 2 * (dim - 1) + 1:
            raise ValueError(
                f"embeddings supports at most {2 * (dim - 1) + 1} "
                f"decorrelated copies at dim={dim} (rotations x sign "
                f"flips); derive larger factors in steps or exclude "
                f"embeddings via --tables")

    for table, keys, extra in todo:
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
                    r = 1 + (i - 1) % (dim - 1)
                    flip = ((i - 1) // (dim - 1)) % 2
                    rot = f"(embedding[{r + 1}:] || embedding[1:{r}])"
                    if flip:
                        rot = f"list_transform({rot}, x -> -x)"
                    proj.append(f"{rot}::FLOAT[] AS embedding")
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
    argv = sys.argv[1:]
    tables = None
    if "--tables" in argv:
        i = argv.index("--tables")
        tables = argv[i + 1].split(",")
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit("usage: scale_testdata.py SRC_DIR DST_DIR [factor] "
                 "[--tables t1,t2]")
    scale_dir(argv[0], argv[1],
              int(argv[2]) if len(argv) > 2 else 10, tables)
