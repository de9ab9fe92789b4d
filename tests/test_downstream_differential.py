"""Standing differentials for the downstream stack vs the reference's backends.

The numerics of `tl.infercnv`/scores are differential-tested against the
reference's own code verbatim (test_reference_differential.py).  The
downstream stack (PCA / kNN / leiden / umap) is validated here against the
reference's numerical backends wherever they are importable:

* sklearn (ARPACK TruncatedSVD, brute-force kNN) — available in this
  environment, so those differentials RUN;
* leidenalg/igraph, umap-learn, scanpy — skip-guarded: the moment those
  packages appear, the assertions fire without edits.

Reference call sites: tl/__init__.py:24-30 (leiden), :66-71 (ARPACK PCA),
:103,139 (umap/tsne), pp/__init__.py:43 (neighbors).
"""

import numpy as np
import numpy.testing as npt
import pytest

from infercnvpy_tpu.ops.graph import fuzzy_connectivities
from infercnvpy_tpu.ops.knn import exact_knn
from infercnvpy_tpu.ops.linalg import truncated_svd


@pytest.fixture(scope="module")
def cnv_like():
    """A CNV-matrix-shaped problem: blocky low-rank structure + noise."""
    rng = np.random.default_rng(0)
    n, d = 400, 180
    labels = np.repeat(np.arange(4), n // 4)
    centers = rng.normal(scale=3.0, size=(4, d))
    X = centers[labels] + rng.normal(size=(n, d))
    return X.astype(np.float32), labels


def test_pca_matches_sklearn_arpack(cnv_like):
    """truncated_svd == sklearn TruncatedSVD(algorithm='arpack') — the exact
    solver the reference uses via sc.tl.pca(svd_solver='arpack',
    zero_center=False) (reference tl/__init__.py:66-71)."""
    sk = pytest.importorskip("sklearn.decomposition")
    X, _ = cnv_like
    k = 30
    scores, comps, svals = truncated_svd(X, k)
    tsvd = sk.TruncatedSVD(n_components=k, algorithm="arpack", random_state=0)
    sk_scores = tsvd.fit_transform(X.astype(np.float64))
    npt.assert_allclose(svals, tsvd.singular_values_, rtol=1e-4)
    # per-component sign is arbitrary: align before comparing
    sign = np.sign(np.sum(scores * sk_scores, axis=0))
    sign[sign == 0] = 1
    npt.assert_allclose(scores * sign, sk_scores, rtol=1e-3, atol=1e-3 * float(svals[0]))


def test_knn_matches_sklearn_brute(cnv_like):
    """exact_knn == sklearn brute-force NearestNeighbors, row for row."""
    skn = pytest.importorskip("sklearn.neighbors")
    X, _ = cnv_like
    k = 15
    dists, idxs = exact_knn(X, k)
    nn = skn.NearestNeighbors(n_neighbors=k, algorithm="brute").fit(X)
    sk_d, sk_i = nn.kneighbors(X)
    npt.assert_allclose(np.sort(dists, axis=1), np.sort(sk_d, axis=1), atol=1e-3)
    # neighbor sets agree except where distance ties allow either pick
    agree = np.array([len(np.intersect1d(idxs[i], sk_i[i])) for i in range(len(X))])
    assert (agree >= k - 1).all()


def test_leiden_matches_leidenalg(cnv_like):
    """Skip-guarded: with leidenalg+igraph installed, our leiden must agree
    with the reference's backend at ARI >= 0.95 on the same graph
    (reference tl/__init__.py:24-30)."""
    leidenalg = pytest.importorskip("leidenalg")
    igraph = pytest.importorskip("igraph")
    from sklearn.metrics import adjusted_rand_score

    from infercnvpy_tpu.ops.leiden import leiden as our_leiden

    X, labels = cnv_like
    dists, idxs = exact_knn(X, 15)
    conn = fuzzy_connectivities(dists, idxs)
    ours = our_leiden(conn, resolution=1.0, seed=0)

    coo = conn.tocoo()
    mask = coo.row < coo.col
    g = igraph.Graph(
        n=conn.shape[0],
        edges=list(zip(coo.row[mask], coo.col[mask])),
        edge_attrs={"weight": coo.data[mask]},
    )
    part = leidenalg.find_partition(
        g,
        leidenalg.RBConfigurationVertexPartition,
        weights="weight",
        resolution_parameter=1.0,
        seed=0,
    )
    theirs = np.asarray(part.membership)
    assert adjusted_rand_score(ours, theirs) >= 0.95


def test_umap_matches_umap_learn(cnv_like):
    """Skip-guarded: with umap-learn installed, our layout must preserve the
    high-dimensional neighborhoods about as well as the reference backend
    (reference tl/__init__.py:103 via sc.tl.umap)."""
    umap = pytest.importorskip("umap")
    X, _ = cnv_like
    k = 15
    _, hi_idx = exact_knn(X, k)

    dists, idxs = exact_knn(X, k)
    conn = fuzzy_connectivities(dists, idxs)
    from infercnvpy_tpu.ops.umap_ import umap_layout

    ours = umap_layout(conn, n_epochs=200, seed=0)
    theirs = umap.UMAP(n_neighbors=k, random_state=0).fit_transform(X)

    def preservation(emb):
        _, e_idx = exact_knn(emb.astype(np.float32), k)
        return np.mean([len(np.intersect1d(hi_idx[i], e_idx[i])) / k for i in range(len(X))])

    p_ours, p_theirs = preservation(ours), preservation(theirs)
    assert p_ours >= 0.8 * p_theirs, (p_ours, p_theirs)


def test_neighbors_match_scanpy(cnv_like):
    """Skip-guarded: with scanpy installed, pp.neighbors' connectivity graph
    must agree with sc.pp.neighbors on the same representation
    (reference pp/__init__.py:43)."""
    sc = pytest.importorskip("scanpy")
    import anndata as ad

    import infercnvpy_tpu as cnv

    X, _ = cnv_like
    n = X.shape[0]

    ours = cnv.AnnData(
        X=np.zeros((n, 2), np.float32),
        obs=__import__("pandas").DataFrame(index=[f"c{i}" for i in range(n)]),
        var=__import__("pandas").DataFrame(index=["a", "b"]),
    )
    ours.obsm["X_cnv_pca"] = X
    cnv.pp.neighbors(ours, n_neighbors=15)
    A = ours.obsp["cnv_neighbors_connectivities"]

    theirs = ad.AnnData(X=np.zeros((n, 2), np.float32))
    theirs.obsm["X_pca"] = X
    sc.pp.neighbors(theirs, n_neighbors=15, use_rep="X_pca")
    B = theirs.obsp["connectivities"]

    # same sparsity structure up to pynndescent approximation: edge overlap
    inter = A.multiply(B.astype(bool)).nnz
    assert inter / max(A.nnz, 1) >= 0.85
