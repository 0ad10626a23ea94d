"""tools/scale_testdata.py — the derived-data generator behind the
measured-scaling table in SCALE.md. Guards the invariants the
measurement's validity rests on: exact row multiples, per-copy FK
integrity (join selectivity preserved), linear (not quadratic)
duplicate-structure growth for documents, and norm/cosine-preserving
embedding rotation."""

import sys
import os

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    from scale_testdata import scale_dir
    dst = str(tmp_path_factory.mktemp("scaled") / "x2")
    scale_dir(SRC, dst, 2)
    return dst


def test_row_multiples_and_fixed_dims(scaled):
    con = duckdb.connect()
    for t in ["customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"]:
        n_src = con.execute(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM '{scaled}/{t}.parquet'").fetchone()[0]
        assert n_dst == 2 * n_src, t
    for t in ["region", "nation"]:  # fixed dims at every scale factor
        n_src = con.execute(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM '{scaled}/{t}.parquet'").fetchone()[0]
        assert n_dst == n_src, t


def test_fk_integrity_preserved(scaled):
    """Every scaled fact row still joins a scaled dim row — the copies
    reference each other, never dangle, so join selectivities match the
    source distribution."""
    con = duckdb.connect()
    dangling = con.execute(f"""
        SELECT count(*) FROM '{scaled}/orders.parquet' o
        LEFT JOIN '{scaled}/customer.parquet' c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL""").fetchone()[0]
    assert dangling == 0
    dangling = con.execute(f"""
        SELECT count(*) FROM '{scaled}/lineitem.parquet' l
        LEFT JOIN '{scaled}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL""").fetchone()[0]
    assert dangling == 0
    # keys are globally unique after shifting
    for t, k in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("documents", "doc_id"), ("embeddings", "vec_id")]:
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {k}) "
            f"FROM '{scaled}/{t}.parquet'").fetchone()
        assert n == d, t


def test_document_duplicate_structure_scales_linearly(scaled):
    """The copy perturbation must NOT create cross-copy duplicates (a
    verbatim copy would give every doc a twin -> quadratic near-dup pair
    growth); within each copy the source's exact-dup group structure is
    reproduced, so distinct-text count exactly doubles."""
    con = duckdb.connect()
    d_src = con.execute(
        f"SELECT count(DISTINCT text) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    d_dst = con.execute(
        f"SELECT count(DISTINCT text) FROM '{scaled}/documents.parquet'"
    ).fetchone()[0]
    assert d_dst == 2 * d_src
    # n_chars recomputed for perturbed copies
    bad = con.execute(
        f"SELECT count(*) FROM '{scaled}/documents.parquet' "
        f"WHERE n_chars != length(text)").fetchone()[0]
    assert bad == 0
    # name columns too: distinct names double (verbatim copies would
    # collapse under the fuzzy-match queries' distinct())
    for t, c in [("part", "p_name"), ("customer", "c_name"),
                 ("supplier", "s_name")]:
        d_src = con.execute(
            f"SELECT count(DISTINCT {c}) FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        d_dst = con.execute(
            f"SELECT count(DISTINCT {c}) FROM '{scaled}/{t}.parquet'"
        ).fetchone()[0]
        assert d_dst == 2 * d_src, t


def test_embedding_rotation_preserves_norms(scaled):
    """Copy i rotates dimensions: norms identical to the source vector,
    so intra-copy cosine structure (what kNN/near-dup queries measure)
    is bit-preserved while copies decorrelate."""
    con = duckdb.connect()
    n_src = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    rows = con.execute(f"""
        WITH s AS (SELECT vec_id, embedding FROM '{SRC}/embeddings.parquet'),
             d AS (SELECT vec_id - {n_src} AS vec_id, embedding
                   FROM '{scaled}/embeddings.parquet'
                   WHERE vec_id >= {n_src})
        SELECT s.embedding AS a, d.embedding AS b
        FROM s JOIN d USING (vec_id) LIMIT 50""").fetchall()
    assert rows
    for a, b in rows:
        assert sorted(a) == sorted(b)  # rotation: same multiset
        assert a != b or all(x == a[0] for x in a)  # actually rotated


def test_adaptive_ann_formulas_match_sql_exactly():
    """auto_nbits / auto_nlist must agree with their SQL mirrors (the
    cfg CTEs in ann_sign_lsh / ann_ivf_knn oracles) at EVERY corpus
    size, not just the gate SFs — integer bit_length vs length(bin()),
    and floor(4*sqrt(n)) across engines. Sweeps sizes around every
    power-of-two and power-of-ten boundary where rounding could split."""
    from go_streams_spark.functions.similarity import auto_nbits, auto_nlist

    con = duckdb.connect()
    sizes = sorted({n + d for n in [1, 8, 64, 500, 2000, 20000, 10**6, 10**9]
                    for d in (-1, 0, 1) if n + d >= 1}
                   | {2**k + d for k in range(3, 31) for d in (-1, 0, 1)}
                   | {8 * 2**k for k in range(3, 28)})
    for n in sizes:
        sql_bits, sql_list = con.execute(f"""
            SELECT least(62, 64, greatest(8, length(bin(({n} + 7) // 8 - 1))))::INT,
                   greatest(16, floor(4 * sqrt({n})))::BIGINT""").fetchone()
        assert auto_nbits(n, 64) == sql_bits, n
        assert auto_nlist(n) == sql_list, n
