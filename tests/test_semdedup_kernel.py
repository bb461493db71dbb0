"""r9 SemDeDup Arrow-kernel coverage: the tiled within-cell GEMM and the
cogrouped fine-assignment only exercise their multi-tile / multi-block
branches on cells larger than the tile size (1024/2048 rows) — which the
production target_cell=128 never produces and the sf0.01 oracle
therefore never gates. Pin them against brute-force numpy references on
a corpus engineered to blow past the tile boundaries."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from azure_airbnb_cdc_ingestion_pipeline_spark.operators.similarity import (
    _min_id_prune,
    semdedup,
    unit_rows,
)


def _brute_keep(ids: np.ndarray, V: np.ndarray, thr: float) -> dict:
    """Reference: keep[i] unless a LOWER-id row has HALF_UP-4dp cosine
    >= thr (single full GEMM — fine at test sizes)."""
    order = np.argsort(ids, kind="stable")
    ids, V = ids[order], V[order]
    U = unit_rows(V)
    S = U @ U.T
    S = np.sign(S) * np.floor(np.abs(S) * 1e4 + 0.5) / 1e4
    n = len(ids)
    keep = {}
    for j in range(n):
        keep[int(ids[j])] = not bool((S[:j, j] >= thr).any())
    return keep


@pytest.mark.parametrize("n_rows", [700, 3000])
def test_min_id_prune_matches_bruteforce_across_tile_boundary(
    spark, n_rows
):
    """3000 rows in ONE cell crosses both the 1024-row row-block and the
    8192-col column-tile start; 700 stays single-tile — both must equal
    the brute-force reference exactly."""
    rng = np.random.default_rng(42)
    # clustered vectors so near-dups actually occur at 0.95
    base = rng.normal(size=(40, 16))
    V = base[rng.integers(0, 40, n_rows)] + rng.normal(
        scale=0.05, size=(n_rows, 16)
    )
    ids = rng.permutation(n_rows) * 7  # non-contiguous, shuffled ids
    rows = [
        (int(ids[i]), [float(x) for x in V[i]], 1) for i in range(n_rows)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, vv array<double>, cell bigint"
    )
    got = {
        r["id"]: r["keep"]
        for r in _min_id_prune(df, "vec_id", 0.95)
        .withColumnRenamed("vec_id", "id")
        .collect()
    }
    want = _brute_keep(ids.astype(np.int64), V, 0.95)
    assert got == want
    assert sum(got.values()) < n_rows  # near-dups exist by construction


def test_semdedup_fixed_centroids_big_cells(spark):
    """Fixed-centroid semdedup with 2 centroids over 2600 rows: each
    cell ≈ 1300 rows (crosses the row-block boundary inside the prune
    kernel) and the assignment kernel must agree with a numpy argmax."""
    rng = np.random.default_rng(7)
    c0, c1 = rng.normal(size=16), rng.normal(size=16)
    pick = rng.integers(0, 2, 2600)
    V = np.where(pick[:, None] == 0, c0, c1) + rng.normal(
        scale=0.3, size=(2600, 16)
    )
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(2600)],
        "vec_id bigint, v array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [float(x) for x in c0]), (1, [float(x) for x in c1])],
        "cell bigint, center array<double>",
    )
    out = semdedup(vecs, cents, id_col="vec_id", vec_col="v", threshold=0.95)
    rows = out.collect()
    assert len(rows) == 2600
    got_cell = {r["vec_id"]: r["cell"] for r in rows}
    # numpy argmax with the same 9dp HALF_UP + lowest-cell tie rule
    U = unit_rows(V)
    C = unit_rows(np.stack([c0, c1]))
    s = U @ C.T
    s = np.sign(s) * np.floor(np.abs(s) * 1e9 + 0.5) / 1e9
    want_cell = np.argmax(s, axis=1)
    assert all(got_cell[i] == int(want_cell[i]) for i in range(2600))
    # keep flags equal the brute-force reference per cell
    ids = np.arange(2600, dtype=np.int64)
    for cell in (0, 1):
        mask = want_cell == cell
        want = _brute_keep(ids[mask], V[mask], 0.95)
        got = {r["vec_id"]: r["keep"] for r in rows if r["cell"] == cell}
        assert got == want
