"""Independent numpy reference checks for the embedding-curation ops
(semantic_dedup_medoid, embedding_label_noise): a third implementation
besides Spark and the DuckDB oracle, over the real sf0.001 embeddings
and the same frozen centroid literals.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from trek_spark.spark import ops as O
from trek_spark.spark.session import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-embcur", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="module")
def ref():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    vec_ids = np.asarray(t["vec_id"])
    labels = np.asarray(t["label"])
    emb = np.asarray([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
    cents = np.asarray(O.IVF_KMEANS_CENTROIDS, dtype=np.float64)
    # nearest centroid, 1-based, first-minimum tie rule
    d = ((emb[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cell = d.argmin(axis=1) + 1
    d_own = d[np.arange(len(emb)), cell - 1]
    return vec_ids, labels, emb, cell, d_own


def _cos(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_semantic_dedup_medoid_matches_numpy(spark, ref):
    vec_ids, _labels, emb, cell, d_own = ref
    got = {r.vec_id: (r.cell, r.medoid_id, r.dropped)
           for r in O.OPS["semantic_dedup_medoid"][0](spark, SF).collect()}
    assert len(got) == len(vec_ids)
    for c in np.unique(cell):
        members = np.where(cell == c)[0]
        order = sorted(members, key=lambda i: (d_own[i], vec_ids[i]))
        med = order[0]
        for i in members:
            g_cell, g_med, g_drop = got[int(vec_ids[i])]
            assert g_cell == c and g_med == int(vec_ids[med])
            want_drop = int(i != med
                            and _cos(emb[i], emb[med]) > O._SEMDEDUP_COS)
            assert g_drop == want_drop, (vec_ids[i], c)
    # the medoid itself is never dropped
    assert all(d == 0 for (_c, m, d), v in
               ((got[k], k) for k in got) if m == v)


def test_embedding_label_noise_matches_numpy(spark, ref):
    vec_ids, labels, emb, cell, _d_own = ref
    got = {r.vec_id: (r.label, r.n_neighbors, r.n_agree, r.flagged)
           for r in O.OPS["embedding_label_noise"][0](spark, SF).collect()}
    flagged_n = 0
    for c in np.unique(cell):
        members = np.where(cell == c)[0]
        if len(members) < 2:
            continue
        for i in members:
            nbrs = [j for j in members if j != i]
            nbrs.sort(key=lambda j: (-_cos(emb[i], emb[j]), vec_ids[j]))
            top = nbrs[:3]
            agree = sum(labels[j] == labels[i] for j in top)
            g_label, g_n, g_agree, g_flag = got[int(vec_ids[i])]
            assert (g_label, g_n, g_agree) == (
                labels[i], len(top), agree), vec_ids[i]
            assert g_flag == int(agree == 0 and len(top) > 0)
            flagged_n += g_flag
    # the corpus's labels are geometry-independent, so the flag rate
    # sits near the random-label null (1 - 1/10)^3 ~ 0.73 — assert the
    # column fires in both directions and tracks that null loosely
    assert 0 < flagged_n < len(vec_ids)
    assert 0.5 < flagged_n / len(vec_ids) < 0.9
