"""Training-data pipeline operators vs the DuckDB oracle (differential,
same compare the driver runs) plus targeted semantic properties:
planted-duplicate recovery, LSH recall, simhash distance axioms,
multimodal feature/frame invariants."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from inverted_index_and_search_spark.operators import dedup as dd
from inverted_index_and_search_spark.operators import multimodal as mm

SF_DIR = "/root/testdata/sf0.001"

#: the new operator families (older query names covered elsewhere)
PIPELINE_QUERIES = [
    "text_metrics",
    "dedup_exact", "dedup_jaccard_pairs",
    "simhash_dedup", "dedup_embedding_cosine",
    "ann_topk", "ann_lsh_neardup",
    "multimodal_features", "multimodal_frames", "symbol_defs",
    "event_windowed_counts", "event_sessions", "event_props_json",
    "input_budget",
    "tpch_pricing_summary", "tpch_shipping_priority", "tpch_region_revenue",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", PIPELINE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    srows = sorted(tuple(r) for r in sdf.collect())
    rel = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0].lower() for d in rel.description]
    drows = sorted(tuple(r) for r in rel.fetchall())
    assert [c.lower() for c in sdf.columns] == dcols
    assert srows == drows


@pytest.fixture(scope="module")
def aug_docs(spark):
    df = dd.docs_with_planted_dups(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    df.cache().count()
    return df


def test_exact_dedup_recovers_planted(aug_docs):
    rows = dd.exact_dup_groups(aug_docs).collect()
    # each of the 10 planted exact dups forms a 2-member group
    groups = {}
    for r in rows:
        groups.setdefault(r["canonical_doc_id"], set()).add(r["doc_id"])
    assert set(groups) == set(range(dd.EXACT_DUP_IDS))
    for cid, members in groups.items():
        assert members == {cid, cid + dd.EXACT_OFFSET}


def test_lsh_finds_all_planted_near_dups(aug_docs):
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dd.minhash_lsh_pairs(aug_docs).collect()}
    planted = {(i, i + dd.NEAR_OFFSET) for i in range(dd.NEAR_DUP_IDS)}
    assert planted <= pairs, planted - pairs


def test_lsh_subset_of_exact_jaccard(aug_docs):
    lsh = {(r["doc_a"], r["doc_b"], r["jaccard"])
           for r in dd.minhash_lsh_pairs(aug_docs).collect()}
    exact = {(r["doc_a"], r["doc_b"], r["jaccard"])
             for r in dd.ngram_jaccard_pairs(aug_docs).collect()}
    assert lsh <= exact


def _minhash_lsh_pairs_r5(docs, *, max_bucket_size=None,
                          max_shingle_df=None,
                          threshold=dd.JACCARD_T):
    """The round-5 exploded-relation formulation, kept verbatim as the
    equality reference for the r6 map-side array rewrite."""
    from pyspark.sql import functions as F

    sh = dd.shingle_df(docs).persist()
    if max_shingle_df is not None:
        sh = dd._drop_hot_shingles(sh, max_shingle_df).persist()
    sig = sh.groupBy("doc_id").agg(*dd._minhash_aggs())
    bands = F.array(*[
        F.md5(F.concat_ws("|", *[F.col(f"sig_{b * dd.LSH_ROWS + r}")
                                 for r in range(dd.LSH_ROWS)]))
        for b in range(dd.LSH_BANDS)
    ])
    banded = sig.select(
        "doc_id", F.posexplode(bands).alias("band", "bucket")).persist()
    if max_bucket_size is not None:
        big = (banded.groupBy("band", "bucket").count()
               .where(F.col("count") > max_bucket_size)
               .select("band", "bucket"))
        banded = banded.join(F.broadcast(big), ["band", "bucket"],
                             "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    cand_docs = (cand.select(F.col("doc_a").alias("doc_id"))
                 .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
                 .distinct())
    arrs = (sh.join(cand_docs, "doc_id", "left_semi")
            .groupBy("doc_id").agg(F.collect_list("shingle").alias("arr")))
    va = arrs.select(F.col("doc_id").alias("doc_a"),
                     F.col("arr").alias("arr_a"))
    vb = arrs.select(F.col("doc_id").alias("doc_b"),
                     F.col("arr").alias("arr_b"))
    i = F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
    union = F.size("arr_a") + F.size("arr_b") - i
    j = F.round(i / union, 6)
    return (cand.join(va, "doc_a").join(vb, "doc_b")
            .select("doc_a", "doc_b", j.alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


@pytest.mark.parametrize("kwargs", [
    {},
    {"max_bucket_size": 50, "max_shingle_df": 100},  # the bench config
    {"max_shingle_df": 3},                           # aggressive filter
])
def test_minhash_lsh_pairs_matches_r5_formulation(aug_docs, kwargs):
    """r6 map-side array rewrite ≡ r5 exploded groupBy formulation,
    byte-for-byte, across the guard configurations."""
    new = sorted(tuple(r) for r in
                 dd.minhash_lsh_pairs(aug_docs, **kwargs).collect())
    old = sorted(tuple(r) for r in
                 _minhash_lsh_pairs_r5(aug_docs, **kwargs).collect())
    assert new == old and new


def test_minhash_signatures_map_side_matches_agg(aug_docs):
    """Map-side array signatures ≡ the groupBy(min) formulation."""
    from pyspark.sql import functions as F

    new = sorted(tuple(r) for r in
                 dd.minhash_signatures(aug_docs,
                                       max_shingle_df=100).collect())
    sh = dd._drop_hot_shingles(dd.shingle_df(aug_docs), 100)
    old = sorted(tuple(r) for r in
                 sh.groupBy("doc_id").agg(*dd._minhash_aggs()).collect())
    assert new == old and new


def test_simhash_exact_dup_distance_zero(aug_docs):
    fp = {r["doc_id"]: r["simhash"]
          for r in dd.simhash_fingerprints(aug_docs).collect()}
    for i in range(dd.EXACT_DUP_IDS):
        assert fp[i] == fp[i + dd.EXACT_OFFSET]
        assert len(fp[i]) == 16


def test_simhash_pairs_include_exact_dups(aug_docs):
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in dd.simhash_pairs(aug_docs).collect()}
    for i in range(dd.EXACT_DUP_IDS):
        assert got.get((i, i + dd.EXACT_OFFSET)) == 0


def test_embedding_neardup_planted(spark):
    emb = dd.embeddings_with_planted_dups(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))
    rows = dd.embedding_neardup_pairs(emb).collect()
    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in rows}
    for i in range(dd.NEAR_DUP_IDS):
        assert pairs.get((i, i + dd.NEAR_OFFSET)) == 1.0


def test_multimodal_features_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feats = mm.extract_features(mm.media_table(docs)).collect()
    assert len(feats) == docs.count()
    for r in feats[:20]:
        assert len(r["features"]) == mm.FEAT_DIM
        assert abs(sum(r["features"]) - 1.0) < 1e-4
        assert r["n_bytes"] > 0 and r["byte_sum"] > 0


def test_multimodal_frame_math(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    media = mm.media_table(docs)
    frames = mm.sample_frames(media).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in media.collect():
        n_frames_total = -(-d["n_bytes"] // mm.FRAME_BYTES)
        expect = len(range(0, n_frames_total, mm.FRAME_EVERY))
        got = by_doc.get(d["doc_id"], [])
        assert len(got) == expect
        assert sum(r["frame_len"] for r in got) <= d["n_bytes"]


def test_decode_media_image_stubbed_audio_real():
    # image decode stays an honest stub (PIL absent in the sandbox)
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG", "image/png")
    # audio decode is REAL (stdlib wave): roundtrip through decode_media
    import numpy as np

    smp = mm.wav_samples(5)
    got = mm.decode_media(mm.encode_wav(smp), "audio/wav")
    assert np.array_equal(got, smp)


def test_wav_codec_roundtrip_and_features():
    """encode_wav produces a REAL RIFF/WAVE container (header fields
    parse back) and audio_features' math matches direct numpy over the
    decoded samples."""
    import numpy as np

    for doc_id in (0, 3, 6, 13):
        smp = mm.wav_samples(doc_id)
        payload = mm.encode_wav(smp, mm.WAV_SR)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        sr, back = mm.decode_wav(payload)
        assert sr == mm.WAV_SR
        assert np.array_equal(back, smp)
        s = smp.astype(np.float64)
        assert round(float(np.sqrt(np.mean(s * s))), 6) > 0
        assert int(np.abs(smp.astype(np.int64)).max()) <= 32768


def test_audio_features_match_numpy(spark):
    import numpy as np

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    rows = {r["doc_id"]: r for r in
            mm.audio_features(mm.synth_wav_table(docs)).collect()}
    for i in range(8):
        smp = mm.wav_samples(i)
        s = smp.astype(np.float64)
        r = rows[i]
        assert r["sample_rate"] == mm.WAV_SR
        assert r["n_samples"] == smp.size
        assert r["duration_s"] == round(smp.size / mm.WAV_SR, 6)
        assert r["peak"] == int(np.abs(smp.astype(np.int64)).max())
        assert abs(r["rms"] - float(np.sqrt(np.mean(s * s)))) < 1e-6


def test_ivf_kmeans_centroids(spark):
    """Seeded k-means cells: deterministic across calls, valid IVF
    results, and recall@10 no worse than the first-C oracle stand-in
    (measured 0.475 vs 0.375 on the sf0.01 embeddings)."""
    from inverted_index_and_search_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = sim.kmeans_centroids(emb)
    assert cents == sim.kmeans_centroids(emb)  # deterministic
    assert len(cents) == sim.IVF_C and len(cents[0]) == sim.DIM
    qs = [sim.fixture_query_vec(seed=s) for s in (13, 14)]
    rows = sim.ivf_topk(emb, qs[0], centroids=cents).collect()
    assert len(rows) == 10
    r_kmeans = sim.ivf_recall_at_k(emb, qs, centroids=cents)
    r_first = sim.ivf_recall_at_k(emb, qs)
    assert r_kmeans >= max(0.3, r_first - 0.1), (r_kmeans, r_first)


def test_ivf_persisted_matches_inmemory(spark, tmp_path_factory):
    """Persisted cell-partitioned IVF layout: identical ranking to the
    in-memory operator for the same centroids, and the probe prunes
    parquet partitions (cell IN (...) reaches PartitionFilters)."""
    from inverted_index_and_search_spark.operators import similarity as sim
    from tests.test_plans import explain

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = sim.kmeans_centroids(emb)
    out = str(tmp_path_factory.mktemp("ivf"))
    sim.write_ivf_index(emb, out, centroids=cents)
    for seed in (13, 14):
        qv = sim.fixture_query_vec(seed=seed)
        got = [(r["vec_id"], round(r["score"], 9)) for r in
               sim.ivf_topk_persisted(spark, out, qv).collect()]
        want = [(r["vec_id"], round(r["score"], 9)) for r in
                sim.ivf_topk(emb, qv, centroids=cents).collect()]
        assert got == want, seed
    plan = explain(sim.ivf_topk_persisted(spark, out, sim.fixture_query_vec()))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0] and "IN (" in pf[0].replace("in(", "IN ("), plan
    assert "TakeOrderedAndProject" in plan, plan


def test_queries_cap_and_flagship_first():
    """The driver's CORRECTNESS artifact caps at 50 rows: the registry
    must never silently spill past it again (r3 regression), and the
    flagship BM25 family must stay first so it is always inside the
    cap."""
    q = entrymod.queries()
    assert len(q) <= 50
    names = list(q)
    assert names[0] == "bm25_top10"
    assert "bm25_wand_top10" in names[:4]
    # every oracle key refers to a registered query
    extra = set(entrymod.oracle_sql()) - set(q)
    assert not extra, extra


def test_ppm_codec_roundtrip_and_features(spark):
    """encode_ppm produces a real P6 container (header parses back,
    comments tolerated) and image_features' math matches numpy over
    the decoded pixels; decode_media routes PPM to the real path."""
    import numpy as np

    for doc_id in (0, 4, 11):
        px = mm.ppm_pixels(doc_id)
        payload = mm.encode_ppm(px)
        assert payload[:2] == b"P6"
        assert np.array_equal(mm.decode_ppm(payload), px)
        assert np.array_equal(
            mm.decode_media(payload, "image/x-portable-pixmap"), px)
    # header comments are honored
    commented = b"P6\n# a comment\n2 1\n255\n" + bytes(6)
    assert mm.decode_ppm(commented).shape == (1, 2, 3)

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    rows = {r["doc_id"]: r for r in
            mm.image_features(mm.synth_ppm_table(docs)).collect()}
    for i in range(6):
        px = mm.ppm_pixels(i).astype(np.float64)
        r = rows[i]
        assert (r["height"], r["width"]) == px.shape[:2]
        for ch, col in enumerate(("mean_r", "mean_g", "mean_b")):
            assert abs(r[col] - px[:, :, ch].mean()) < 1e-6


# ------------------------------------------- codec properties (hypothesis)

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as hst  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(hst.lists(hst.integers(min_value=-32768, max_value=32767),
                 min_size=0, max_size=400))
def test_wav_roundtrip_property(samples):
    import numpy as np

    smp = np.asarray(samples, dtype=np.int16)
    sr, back = mm.decode_wav(mm.encode_wav(smp))
    assert sr == mm.WAV_SR
    assert np.array_equal(back, smp)


@settings(max_examples=25, deadline=None)
@given(hst.integers(min_value=1, max_value=12),
       hst.integers(min_value=1, max_value=12), hst.data())
def test_ppm_roundtrip_property(h, w, data):
    import numpy as np

    raw = data.draw(hst.binary(min_size=h * w * 3, max_size=h * w * 3))
    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(px)), px)


def test_neardup_clusters_recovers_planted(aug_docs):
    """Planted near/exact dups form clusters whose canonical id is the
    minimum member; a chain fixture verifies transitivity."""
    pairs = dd.minhash_lsh_pairs(aug_docs)
    got = {r["doc_id"]: r["cluster_id"]
           for r in dd.neardup_clusters(pairs).collect()}
    for i in range(dd.NEAR_DUP_IDS):
        # each planted copy lands in its original's cluster (the
        # cluster may also absorb genuinely-similar base docs, so the
        # canonical id is <= i, not necessarily == i)
        assert got.get(i + dd.NEAR_OFFSET) == got.get(i) is not None
        assert got[i] <= i
    # transitivity: a synthetic chain a-b, b-c collapses to min label
    spark = aug_docs.sparkSession
    chain = spark.createDataFrame(
        [(5, 3, 0.9), (3, 9, 0.9), (20, 21, 0.9)],
        "doc_a long, doc_b long, jaccard double")
    cc = {r["doc_id"]: r["cluster_id"]
          for r in dd.neardup_clusters(chain).collect()}
    assert cc == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_keep_canonical_drops_only_losers(aug_docs):
    clusters = dd.neardup_clusters(dd.minhash_lsh_pairs(aug_docs))
    kept = dd.keep_canonical(aug_docs, clusters)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in aug_docs.select("doc_id").collect()}
    cl = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    losers = {d for d, c in cl.items() if d != c}
    assert kept_ids == all_ids - losers
    # every cluster still has exactly its canonical member present
    for d, c in cl.items():
        assert c in kept_ids
