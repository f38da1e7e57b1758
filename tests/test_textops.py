"""Text analysis, dedup family, similarity search over sf0.001 testdata."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(f"{SF}/documents.parquet")


def test_token_count(docs_table):
    from markdown_lab_ray.stages.text import token_count_batch
    out = token_count_batch(docs_table.slice(0, 20))
    ws = out.column("n_tokens_ws").to_pylist()
    texts = out.column("text").to_pylist()
    assert ws == [len(t.split()) for t in texts]
    assert all(b >= w for b, w in zip(out.column("n_tokens_bpe").to_pylist(), ws))


def test_quality(docs_table):
    from markdown_lab_ray.stages.text import quality_batch
    out = quality_batch(docs_table.slice(0, 20))
    q = out.column("quality").to_pylist()
    assert all(0 <= v <= 1 for v in q)
    empty = quality_batch(pa.table({"text": [""]}))
    assert empty.column("quality").to_pylist()[0] >= 0


def test_lang_id():
    from markdown_lab_ray.stages.text import lang_id_batch
    t = pa.table({"text": [
        "the cat and the dog is in a house for fun",
        "der Hund und die Katze ist ein Tier zu Hause",
        "el perro y el gato es un animal por la casa",
        "这是一个中文文档 测试",
    ]})
    assert lang_id_batch(t).column("lang_pred").to_pylist() == \
        ["en", "de", "es", "zh"]


def test_fingerprint_normalization():
    from markdown_lab_ray.stages.text import fingerprint_batch
    t = pa.table({"text": ["Hello   World ", "hello world"]})
    out = fingerprint_batch(t)
    md5s = out.column("fp_md5").to_pylist()
    assert md5s[0] == md5s[1]
    rolls = out.column("fp_roll").to_pylist()
    assert rolls[0] == rolls[1] > 0


def test_minhash_similar_vs_different():
    from markdown_lab_ray.stages.dedup import MinHasher, jaccard
    h = MinHasher(128)
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("lazy", "sleepy", 2)
    far = "completely different content about spark tables and rows " * 10
    sim_near = (h.signature(base) == h.signature(near)).mean()
    sim_far = (h.signature(base) == h.signature(far)).mean()
    assert sim_near > 0.5 > sim_far
    assert jaccard(base, base) == 1.0
    assert jaccard(base, far) < 0.1


def test_simhash_bands():
    from markdown_lab_ray.stages.dedup import hamming64_arr, simhash_batch
    t = pa.table({"doc_id": [1, 2, 3], "text": [
        "alpha beta gamma delta epsilon zeta eta theta " * 5,
        "alpha beta gamma delta epsilon zeta eta iota " * 5,
        "totally other words about crawling the web for images",
    ]})
    out = simhash_batch(t)
    sigs = np.array(out.column("simhash").to_pylist(), dtype=np.int64)
    d_near = hamming64_arr(sigs[:1], sigs[1:2])[0]
    d_far = hamming64_arr(sigs[:1], sigs[2:3])[0]
    assert d_near < d_far


def test_exact_dedup(ray_session):
    import ray.data as rd
    from markdown_lab_ray.stages.dedup import exact_dedup
    t = pa.table({"doc_id": [3, 1, 2, 10], "text": ["x", "x", "y", "y"]})
    out = exact_dedup(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2]


def test_minhash_near_dup_pipeline(ray_session):
    import ray.data as rd
    from markdown_lab_ray.stages.dedup import connected_components, minhash_near_dup_pairs
    base = "the quick brown fox jumps over the lazy dog and runs far away " * 8
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base.replace("lazy", "sleepy", 1)},
        {"doc_id": 2, "text": "unrelated words " * 40},
        {"doc_id": 3, "text": base.replace("quick", "rapid", 1)},
    ]
    pairs = minhash_near_dup_pairs(rd.from_items(rows), jaccard_threshold=0.6)
    got = {tuple(sorted(p)) for p in pairs[["a", "b"]].to_numpy().tolist()}
    assert (0, 1) in got and (0, 3) in got
    assert all(2 not in p for p in got)
    labels = connected_components(got, [0, 1, 2, 3])
    assert labels[0] == labels[1] == labels[3] == 0
    assert labels[2] == 2


def test_knn_brute_force_matches_numpy(ray_session):
    import ray.data as rd
    from markdown_lab_ray.stages.similarity import knn_brute_force
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ds = rd.from_arrow(emb)
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.array(emb.column("vec_id").to_pylist())
    query = vecs[0]

    got = knn_brute_force(ds, query, k=10, exclude_ids=[ids[0]])
    # local oracle
    qn = query / np.linalg.norm(query)
    scores = (vecs @ qn) / np.linalg.norm(vecs, axis=1)
    order = sorted(zip(np.round(scores, 6), ids), key=lambda t: (-t[0], t[1]))
    expect = [(i, s) for s, i in order if i != ids[0]][:10]
    assert got["vec_id"].tolist() == [i for i, _ in expect]


def test_knn_lsh_recall(ray_session):
    import ray.data as rd
    from markdown_lab_ray.stages.similarity import knn_brute_force, knn_lsh_bucketed
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    dim = len(emb.column("embedding")[0])
    ds = rd.from_arrow(emb)
    query = np.array(emb.column("embedding")[0].as_py(), dtype=np.float64)
    exact = knn_brute_force(ds, query, k=10)
    approx = knn_lsh_bucketed(ds, query, dim=dim, k=10, probe_hamming=2)
    overlap = len(set(exact["vec_id"]) & set(approx["vec_id"]))
    assert overlap >= 3  # recall with 8 planes + 2-bit probing
    assert approx["vec_id"].tolist()[0] == exact["vec_id"].tolist()[0]


def test_simhash_near_dup_pipeline(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.dedup import simhash_near_dup_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base.replace("kappa", "lambda", 1)},
        {"doc_id": 2, "text": "completely different words about oceans " * 12},
    ]
    pairs = simhash_near_dup_pairs(rd.from_items(rows), hamming_threshold=10)
    got = {tuple(p) for p in pairs[["a", "b"]].to_numpy().tolist()}
    assert (0, 1) in got
    assert all(2 not in p for p in got)


def test_knn_ivf_recall(ray_session):
    import ray.data as rd

    from markdown_lab_ray.stages.similarity import knn_brute_force, knn_ivf

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ds = rd.from_arrow(emb)
    query = np.array(emb.column("embedding")[0].as_py(), dtype=np.float64)
    exact = knn_brute_force(ds, query, k=10)
    approx = knn_ivf(ds, query, k=10, n_lists=8, n_probe=4)
    overlap = len(set(exact["vec_id"]) & set(approx["vec_id"]))
    assert approx["vec_id"].tolist()[0] == exact["vec_id"].tolist()[0]
    assert overlap >= 4


def test_knn_multi_matches_single_query(ray_session):
    """Multi-query brute force must agree with the single-query path
    per query (same rounding + tie-break order)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from markdown_lab_ray.stages.similarity import (
        knn_brute_force,
        knn_brute_force_multi,
    )

    sf = "/root/testdata/sf0.001"
    tab = pq.read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    queries = np.stack([np.asarray(tab.column("embedding")[i].as_py())
                        for i in (0, 1)])
    ds = rd.read_parquet(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    multi = knn_brute_force_multi(ds, queries, [0, 1], k=5)
    for qid in (0, 1):
        single = knn_brute_force(
            rd.read_parquet(f"{sf}/embeddings.parquet",
                            columns=["vec_id", "embedding"]),
            queries[qid], k=5, exclude_ids=[qid])
        part = multi[multi["query_id"] == qid]
        assert part["vec_id"].tolist() == single["vec_id"].tolist()
        assert part["score"].tolist() == single["score"].tolist()


def test_ngram_jaccard_identity_and_disjoint(ray_session):
    import pyarrow as pa

    from markdown_lab_ray.stages.dedup import ngram_jaccard_vs_ref_batch

    ref = "alpha beta gamma delta epsilon"
    batch = pa.table({"doc_id": [1, 2, 3, 4],
                      "text": [ref,                      # identical → 1.0
                               "one two three four",     # disjoint → 0.0
                               "alpha beta gamma zeta",  # partial
                               ""]})                     # empty-shingle
    out = ngram_jaccard_vs_ref_batch(batch, ref)
    sims = dict(zip(out.column("doc_id").to_pylist(),
                    out.column("jaccard_ref").to_pylist()))
    assert sims[1] == 1.0
    assert sims[2] == 0.0
    # ref shingles: {abg, bgd, gde}; doc3: {abg, bgz} → 1/4
    assert sims[3] == 0.25
    assert sims[4] == 0.0  # {''} vs 3 real shingles


def test_minhash_clusters_query_matches_union_find(ray_session):
    """The full near-dup clustering pipeline (LSH pairs → distributed
    CC) must agree with driver-side union-find over the same pairs."""
    import sys
    sys.path.insert(0, "/root/repo")
    import ray.data as rd

    import __ray_entry__ as entry
    from markdown_lab_ray.stages.dedup import (
        connected_components,
        minhash_near_dup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    mc = entry.queries()["minhash_clusters"](sf).to_pandas()
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = minhash_near_dup_pairs(docs, jaccard_threshold=0.5)
    ids = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"]
                          ).to_pandas()["doc_id"].tolist()
    uf = connected_components(list(zip(pairs.a, pairs.b)), ids)
    assert dict(zip(mc.doc_id, mc.cluster_id)) == uf


def test_knn_lsh_exhaustive_probe_equals_brute_force(ray_session):
    """With the probe radius covering every bucket, the LSH path scans
    everything and must return exactly the brute-force top-k."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from markdown_lab_ray.stages.similarity import (
        knn_brute_force,
        knn_lsh_bucketed,
    )

    sf = "/root/testdata/sf0.001"
    tab = pq.read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    dim = len(tab.column("embedding")[0])
    query = np.asarray(tab.column("embedding")[0].as_py(), dtype=np.float64)

    def ds():
        return rd.read_parquet(f"{sf}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    approx = knn_lsh_bucketed(ds(), query, dim=dim, k=10, n_planes=4,
                              probe_hamming=4)  # radius = all 16 buckets
    exact = knn_brute_force(ds(), query, k=10)
    assert approx["vec_id"].tolist() == exact["vec_id"].tolist()
    assert approx["score"].tolist() == exact["score"].tolist()


def test_knn_ivf_full_probe_equals_brute_force(ray_session):
    """Probing every IVF list is an exhaustive scan — must equal brute
    force exactly."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from markdown_lab_ray.stages.similarity import knn_brute_force, knn_ivf

    sf = "/root/testdata/sf0.001"
    tab = pq.read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    query = np.asarray(tab.column("embedding")[0].as_py(), dtype=np.float64)

    def ds():
        return rd.read_parquet(f"{sf}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    approx = knn_ivf(ds(), query, k=10, n_lists=4, n_probe=4)
    exact = knn_brute_force(ds(), query, k=10)
    assert approx["vec_id"].tolist() == exact["vec_id"].tolist()
    assert approx["score"].tolist() == exact["score"].tolist()


def test_repetition_batch_fractions(ray_session):
    import pyarrow as pa

    from markdown_lab_ray.stages.text import repetition_batch

    b = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["a a a b",          # top word 3/4, bigram "a a" 2/3
                           "x",                # 1 word, no bigrams
                           "",                 # empty
                           "p q p q p"]})      # "p" 3/5; "p q" 2/4
    out = repetition_batch(b).to_pydict()
    assert out["n_words"] == [4, 1, 0, 5]
    assert out["top_word_frac"] == [0.75, 1.0, 0.0, 0.6]
    assert out["top_bigram_frac"] == [
        round(2 / 3, 6) + 1e-6 * 0, 0.0, 0.0, 0.5]


def test_redact_batch_sequences_patterns(ray_session):
    import pyarrow as pa

    from markdown_lab_ray.stages.text import redact_batch

    b = pa.table({"text": [
        "contact john.doe+x@mail.example.org or call 5551234",
        "v1 has 7 items",          # single digit untouched
        "ids 42 and 4242",
        None]})
    out = redact_batch(b)
    assert out.column("redacted").to_pylist() == [
        "contact <EMAIL> or call <NUM>",
        "v1 has 7 items",
        "ids <NUM> and <NUM>",
        ""]
    assert out.column("n_redacted").to_pylist() == [2, 0, 2, 0]
