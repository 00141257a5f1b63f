"""embedding_pca_top vs numpy SVD on the full matrix — the pytest oracle
for the driver's rows-only PCA query (eigensolves aren't SQL)."""

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from subgraph_isomorphism_pregel_ray.pipelines.similarity import embedding_pca_top


def test_pca_matches_full_matrix_svd(ray_session):
    sf = "/root/testdata/sf0.001"
    got = embedding_pca_top(
        rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]),
        n_components=2,
    )
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    M = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    C = np.cov(M, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    total = w.sum()
    for ci in range(2):
        vec = V[:, order[ci]]
        if vec[np.argmax(np.abs(vec))] < 0:
            vec = -vec
        sub = got[got.component == ci].sort_values("dim")
        assert np.allclose(sub["weight"].to_numpy(), vec, atol=1e-5)
        assert abs(sub["explained_var"].iloc[0] - w[order[ci]] / total) < 1e-5
    # components are orthonormal as reported
    a = got[got.component == 0].sort_values("dim")["weight"].to_numpy()
    b = got[got.component == 1].sort_values("dim")["weight"].to_numpy()
    assert abs(a @ a - 1) < 1e-4 and abs(a @ b) < 1e-4


def test_pca_parallelism_stable(ray_session):
    # same input split into tiny blocks: weights agree to float-fold noise
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    a = embedding_pca_top(ds, n_components=1)
    b = embedding_pca_top(
        rd.read_parquet(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).repartition(13),
        n_components=1,
    )
    assert np.allclose(
        a.sort_values("dim")["weight"].to_numpy(),
        b.sort_values("dim")["weight"].to_numpy(),
        atol=1e-6,
    )
