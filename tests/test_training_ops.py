"""Training-data operators: dedup tiers, similarity, text stats,
multimodal plumbing — tested on /root/testdata sf0.001 + synthetic edges."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from rdflib_jsonld_spark.operators import dedup, multimodal, similarity
from rdflib_jsonld_spark.operators.textstats import (
    with_fingerprint, with_lang_id, with_quality_score, with_token_counts)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_token_counts(docs):
    out = with_token_counts(docs).select("doc_id", "n_ws_tokens",
                                         "n_bpe_tokens").collect()
    by_id = {r.doc_id: r for r in out}
    sample = docs.where(F.col("doc_id") == 0).collect()[0]
    assert by_id[0].n_ws_tokens == len(sample.text.split())
    assert all(r.n_bpe_tokens >= r.n_ws_tokens for r in out)


def test_quality_score_bounds(docs):
    out = with_quality_score(docs)
    row = out.agg(F.min("quality_score"), F.max("quality_score")).collect()[0]
    assert 0.0 <= row[0] <= row[1] <= 1.0
    # word-salad corpus: long docs should score well
    good = out.where((F.col("n_chars") > 200)).agg(
        F.avg("quality_score")).collect()[0][0]
    assert good >= 0.6


def test_fingerprint_exact_dedup(spark, docs):
    # plant exact duplicates: copy 5 docs with new ids
    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    with_dups = docs.unionByName(dup)
    groups = dedup.exact_dedup_groups(with_dups)
    got = {tuple(sorted(r.member_ids)) for r in groups.collect()}
    assert len(got) == 5
    assert all(b == a + 1_000_000 for a, b in got)
    kept = dedup.exact_dedup(with_dups)
    assert kept.count() == docs.count()
    assert kept.where(F.col("doc_id") >= 1_000_000).count() == 0


def test_minhash_lsh_finds_near_dups(spark, docs):
    # plant near-duplicates: append a short suffix to 5 docs
    near = (docs.limit(5)
            .withColumn("doc_id", F.col("doc_id") + 2_000_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" extra tail"))))
    with_dups = docs.limit(200).unionByName(near)
    pairs = dedup.minhash_lsh_pairs(with_dups, jaccard_threshold=0.6)
    rows = pairs.collect()
    got = {(r.id_a, r.id_b) for r in rows}
    planted = {(i, i + 2_000_000) for i in range(5)}
    assert planted <= got, f"missing: {planted - got}"
    # precision vs the exact metric: every reported pair must have true
    # char-shingle jaccard near its estimate (the word-salad corpus has
    # genuine near-dups — tiny vocabulary — so we verify against ground
    # truth, not corpus intuition)
    texts = {r.doc_id: r.text for r in with_dups.collect()}
    for r in rows[:20]:
        a = set(dedup._char_shingles(texts[r.id_a], 5).tolist())
        b = set(dedup._char_shingles(texts[r.id_b], 5).tolist())
        true_j = len(a & b) / len(a | b)
        assert true_j >= 0.45, (r.id_a, r.id_b, true_j, r.est_jaccard)


def test_simhash_near_dups(spark, docs):
    near = (docs.limit(3)
            .withColumn("doc_id", F.col("doc_id") + 3_000_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" q"))))
    with_dups = docs.limit(150).unionByName(near)
    pairs = dedup.simhash_pairs(with_dups, max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 3_000_000) for i in range(3)}
    assert planted <= got


def test_winnowing_overlap(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, "alpha beta " + shared + " gamma delta"),
            (2, "totally different prefix " + shared + " and suffix here"),
            (3, "nothing in common with the others at all whatsoever zz")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.winnowing_overlap_pairs(df, min_shared=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got
    # density guarantee: every doc yields fingerprints
    fps = dedup.winnowing_fingerprints(df)
    per_doc = {r.doc_id: r["count"] for r in
               fps.groupBy("doc_id").count().collect()}
    assert all(per_doc[d] >= 5 for d in (1, 2, 3))


def test_ngram_jaccard(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.3)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def _winnow_reference(text: str, k: int = 8, window: int = 4) -> set:
    """Straightforward per-doc winnowing (the r01 formulation) used as a
    parity oracle for the vectorized batch kernel."""
    b = " ".join((text or "").lower().split()).encode("utf-8", "ignore")
    if len(b) < k:
        b = b.ljust(k, b"_")
    n = len(b) - k + 1
    arr = np.frombuffer(b, dtype=np.uint8)
    h = np.zeros(n, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    mask = np.uint64((1 << 64) - 1)
    for i in range(k):
        h = (h ^ arr[i:n + i].astype(np.uint64)) * prime & mask
    if n <= window:
        return {int(np.int64(h.min().astype(np.uint64)))}
    sel = set()
    for pe in range(window - 1, n):
        win = h[pe - window + 1:pe + 1]
        m = win.min()
        for j in range(window - 1, -1, -1):  # rightmost min
            if win[j] == m:
                sel.add(int(np.int64(win[j])))
                break
    return sel


def test_batch_winnow_matches_reference():
    """The whole-batch vectorized kernel must reproduce the per-doc
    formulation exactly — mixed lengths, short docs, empties, repeats."""
    import random
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "x", "yy", "the", "of"]
    texts = ["", "ab", "short one",
             "repeat repeat repeat repeat repeat repeat"]
    texts += [" ".join(rng.choices(words, k=rng.randrange(1, 120)))
              for _ in range(200)]
    d, f = dedup._batch_winnow(texts, 8, 4)
    got: dict = {}
    for di, fi in zip(d.tolist(), f.tolist()):
        got.setdefault(di, set()).add(fi)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow_reference(t), (i, t)


def test_ngram_jaccard_hot_gram_cap(spark):
    """VERDICT r01 scale-killer regression: 1000 docs share one
    boilerplate phrase. The df-cap keeps the phrase's grams out of the
    candidate join (a 10^6-row group at this size; 10^12 at web scale),
    while a genuinely near-dup pair held together by RARE grams is still
    found with its exact Jaccard."""
    rows = [(i, f"common boilerplate phrase shared everywhere "
                f"unique{i} word{i} tail{i} extra{i}")
            for i in range(1000)]
    rows.append((2000, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((2001, "alpha beta gamma delta epsilon zeta eta iota"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.ngram_jaccard_pairs(
               df, threshold=0.4, df_cap=50).collect()}
    assert (2000, 2001) in got
    assert abs(got[(2000, 2001)] - 5 / 7) < 1e-4
    # boilerplate-only overlap is entirely above the cap → no pairs
    assert all(a >= 2000 for a, _ in got)


def test_near_dup_clusters_and_dedup(spark):
    """Fuzzy dedup keep-one: three planted near-dup variants of one base
    text cluster together (root = min id); unrelated docs pass through."""
    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm windowsill nearby today")
    rows = [(1, base), (2, base + " extra"), (3, "prefix " + base),
            (10, "completely different text about spark shuffles and "
                 "partitions and joins and aggregations here"),
            (11, "another unrelated document that shares nothing with "
                 "either of the previous text groups at all")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    mapping = {r.doc_id: r.cluster_root for r in
               dedup.near_dup_clusters(docs, jaccard_threshold=0.5,
                                       bands=32).collect()}
    assert mapping == {2: 1, 3: 1}
    kept = sorted(r.doc_id for r in
                  dedup.near_dup_dedup(docs, jaccard_threshold=0.5,
                                       bands=32).collect())
    assert kept == [1, 10, 11]


def test_brute_force_topk_matches_numpy(emb):
    rows = emb.orderBy("vec_id").collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    q = list(map(float, rows[0].embedding))
    qv = np.array(q)
    sims = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = np.argsort(-sims)[:5]
    want = [rows[i].vec_id for i in order]
    got = [r.vec_id for r in
           similarity.brute_force_topk(emb, q, k=5).collect()]
    assert got == want
    assert got[0] == rows[0].vec_id  # self-match first


def test_ann_topk_recall_clustered(spark):
    """LSH-ANN recall is meaningful only on clustered data (the sf
    embeddings are isotropic-random → no locality to hash). Build 20
    clusters, query one member, require ≥4/5 of exact top-5 recovered."""
    rng = np.random.RandomState(0)
    centers = rng.normal(size=(20, 32))
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(30):
            v = centers[c] + 0.15 * rng.normal(size=32)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = rows[5][1]
    exact = [r.vec_id for r in similarity.brute_force_topk(df, q, k=5).collect()]
    approx = {r.vec_id for r in
              similarity.ann_topk(df, q, k=5, n_bits=10, n_tables=8).collect()}
    assert len(set(exact) & approx) >= 4
    assert rows[5][0] in approx


def test_ivf_topk_recall_clustered(spark):
    rng = np.random.RandomState(1)
    centers = rng.normal(size=(12, 24))
    rows, vid = [], 0
    for c in range(12):
        for _ in range(40):
            v = centers[c] + 0.1 * rng.normal(size=24)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = rows[7][1]
    exact = [r.vec_id for r in similarity.brute_force_topk(df, q, k=5).collect()]
    approx = [r.vec_id for r in
              similarity.ivf_topk(df, q, k=5, n_clusters=12, n_probe=3).collect()]
    assert len(set(exact) & set(approx)) >= 4
    assert rows[7][0] in approx


def test_ann_topk_runs_on_sf_embeddings(emb):
    rows = emb.limit(1).collect()
    q = list(map(float, rows[0].embedding))
    approx = {r.vec_id for r in
              similarity.ann_topk(emb, q, k=5, n_bits=8, n_tables=8).collect()}
    assert rows[0].vec_id in approx  # query always lands in its own bucket


def test_embedding_near_dup_pairs(spark, emb):
    # plant near-identical vectors: tiny perturbation of 4 existing rows
    base = emb.limit(4).collect()
    planted = [(r.vec_id + 5_000_000,
                [float(x) + 0.0005 for x in r.embedding], r.label)
               for r in base]
    extra = spark.createDataFrame(planted, ["vec_id", "embedding", "label"])
    both = emb.limit(400).unionByName(extra)
    pairs = similarity.embedding_near_dup_pairs(both, threshold=0.98)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    want = {(r.vec_id, r.vec_id + 5_000_000) for r in base}
    assert want <= got
    # verify precision against brute-force ground truth
    import itertools
    rows = both.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    for a, b in itertools.islice(got, 20):
        va, vb = vecs[a], vecs[b]
        cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert cos >= 0.98 - 1e-9


def test_pairwise_topk_shapes(emb):
    queries = emb.limit(3)
    out = similarity.pairwise_topk(emb.limit(100), queries, k=4)
    rows = out.collect()
    assert len(rows) == 12
    assert all(1 <= r.rank <= 4 for r in rows)


def test_lang_id(spark):
    rows = [(1, "the cat and the dog went to the house of friends"),
            (2, "der hund und die katze gingen in das schöne haus"),
            (3, "le chien et le chat sont entrés dans la maison que"),
            (4, "这是一个中文句子，我们在这里写了很多中文字。")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.pred_lang for r in with_lang_id(df).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "zh"


def test_multimodal_codecs_roundtrip():
    """The decode step is REAL for uncompressed formats: encode→decode is
    lossless byte parsing (BMP pixel-exact incl. row padding; WAV 16-bit
    PCM within quantization; RVID frame-exact)."""
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(11, 7, 3)).astype(np.uint8)  # odd width→pad
    assert (multimodal.decode_bmp(multimodal.encode_bmp(px)) == px).all()
    sig = 0.4 * np.sin(np.arange(500) / 9.0)
    back = multimodal.decode_wav(multimodal.encode_wav(sig))
    assert np.abs(back - sig).max() < 1e-3
    frames = [rng.randint(0, 256, size=(5, 6, 3)).astype(np.uint8)
              for _ in range(3)]
    out = multimodal.decode_rvid(multimodal.encode_rvid(frames))
    assert len(out) == 3 and all((a == b).all()
                                 for a, b in zip(out, frames))
    ppm = b"P6\n6 4\n255\n" + bytes(range(6 * 4 * 3))
    assert multimodal.decode_ppm(ppm).shape == (4, 6, 3)


def test_multimodal_features(spark):
    media = multimodal.synthetic_media_df(spark, n=30)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(r.error is None for r in rows)  # every payload decodes
    dims = {r.kind: len(r.feature) for r in rows}
    assert dims == {"image": 192, "audio": 64, "video": 256}
    # features derive from decoded CONTENT: all finite, image means in
    # [0,1], distinct payloads → distinct features
    img = [r.feature for r in rows if r.kind == "image"]
    assert all(0.0 <= v <= 1.0 for f in img for v in f)
    assert len({tuple(f) for f in img}) == len(img)
    # deterministic: same payload → same features
    again = {r.media_id: r.feature for r in
             multimodal.extract_features(media).collect()}
    first = {r.media_id: r.feature for r in rows}
    assert again == first
    plan = multimodal.frame_sample_plan(media, every_ms=40)
    per_vid = {r.media_id: r["count"] for r in
               plan.groupBy("media_id").count().collect()}
    durs = {r.media_id: r.duration_ms for r in
            media.where(media.kind == "video").collect()}
    assert per_vid == {k: v // 40 for k, v in durs.items()}


def test_multimodal_truncated_payload_surfaces_error(spark):
    """r02 review regression: truncated/corrupt payloads (valid magic,
    lying structure) must surface as row errors, not kill the task."""
    good = bytes(multimodal.encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8)))
    rvid_lying = multimodal.RVID_MAGIC + bytes.fromhex("01000000ffff0000")
    rows = [(0, "image", "image/bmp", good[:20], None, None, None),
            (1, "image", "image/x-portable-pixmap", b"P6 notanum", None,
             None, None),
            (2, "video", "video/x-rvid", rvid_lying, 4, 4, 100),
            (3, "audio", "audio/wav", b"RIFF1234", None, None, None)]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           multimodal.extract_features(media).collect()}
    assert len(out) == 4
    for i in range(4):
        assert out[i].feature is None and out[i].error, out[i]


def test_multimodal_compressed_payload_surfaces_error(spark):
    """Compressed formats (no codecs in this container) must NOT kill the
    batch: NULL feature + reason in `error` (the production swap-in
    point is _decode)."""
    rows = [(0, "image", "image/jpeg", b"\xff\xd8\xff\xe0 fake jpeg",
             None, None, None),
            (1, "image", "image/bmp",
             bytes(multimodal.encode_bmp(
                 np.zeros((4, 4, 3), dtype=np.uint8))), 4, 4, None)]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           multimodal.extract_features(media).collect()}
    assert out[0].feature is None and "codec" in out[0].error
    assert out[1].feature is not None and out[1].error is None


def test_ivf_topk_multi_guards_and_empty_queries(spark):
    """r02 review regressions: zero-norm corpus vectors score -1 (never
    NaN-top the ranking); an empty query set returns an empty result
    instead of crashing schema inference."""
    rows = [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [0.0, 0.0], 0),
            (3, [0.8, 0.2], 0)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    qs = emb.where(F.col("vec_id") == 0)
    out = similarity.ivf_topk_multi(emb, qs, k=3, n_clusters=2, n_probe=2)
    got = [(r.nbr_id, r.cosine) for r in
           out.orderBy("rank").collect()]
    assert [n for n, _ in got] == [1, 3, 2]
    assert got[-1] == (2, -1.0)  # zero-norm vector ranks last, not first
    empty_q = emb.where(F.col("vec_id") < 0)
    assert similarity.ivf_topk_multi(emb, empty_q, k=3,
                                     n_clusters=2, n_probe=2).count() == 0


def test_ppm_trailing_bytes_decode_exact():
    """r02 review regression: trailing bytes after the raster must not
    shift pixels (raster located by header offset, not from the end)."""
    import numpy as _np
    from rdflib_jsonld_spark.operators import multimodal as mm
    px = _np.arange(4 * 3 * 3, dtype=_np.uint8).reshape(4, 3, 3)
    body = b"P6\n3 4\n255\n" + px.tobytes()
    assert (mm.decode_ppm(body + b"\n") == px).all()  # trailing newline
    assert (mm.decode_ppm(body) == px).all()


def test_bgp_repeated_var_in_one_pattern(spark):
    """r02 review regression: ('?x', p, '?x') must bind only reflexive
    quads (positional equality), not every object."""
    from rdflib_jsonld_spark.operators.bgp import match_bgp
    rows = [(None, "http://e/a", False, "http://e/p", "iri", "http://e/a",
             None, None),
            (None, "http://e/a", False, "http://e/p", "iri", "http://e/b",
             None, None)]
    quads = spark.createDataFrame(
        rows, "g string, s string, s_is_bnode boolean, p string, "
              "o_kind string, o_value string, o_datatype string, "
              "o_lang string")
    got = {r.x for r in
           match_bgp(quads, [("?x", "http://e/p", "?x")]).collect()}
    assert got == {"http://e/a"}


def test_zero_norm_vector_never_tops_cosine_ranking(spark):
    """NaN sorts as largest in Spark orderings — an all-zero embedding must
    not fake its way into top-k (guard in _cosine_expr)."""
    from rdflib_jsonld_spark.operators.similarity import brute_force_topk
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = brute_force_topk(df, [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 2]
    assert out[-1]["cosine"] == -1.0


def test_multimodal_codec_swap_in_seam(spark):
    """VERDICT r02 #9: the documented production codec swap-in — a
    custom decoder passed via ``decoders=`` is consulted first, ships to
    executors inside the UDF closure, and compressed payloads flow
    through extract_features unchanged. Returning None falls through to
    the built-in parsers, so uncompressed formats keep working."""
    fake_jpegs = [b"\xff\xd8\xff\xe0 payload-" + bytes([i])
                  for i in range(3)]
    bmp = bytes(multimodal.encode_bmp(
        np.full((4, 4, 3), 7, dtype=np.uint8)))
    rows = [(i, "image", "image/jpeg", p, None, None, None)
            for i, p in enumerate(fake_jpegs)]
    rows.append((9, "image", "image/bmp", bmp, 4, 4, None))
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)

    def fake_jpeg_decoder(payload: bytes):
        if payload[:3] != b"\xff\xd8\xff":      # not JPEG → fall through
            return None
        shade = payload[-1] * 20 % 256           # deterministic content
        return np.full((16, 16, 3), shade, dtype=np.uint8)

    out = {r.media_id: r for r in
           multimodal.extract_features(
               media, decoders={"image": fake_jpeg_decoder}).collect()}
    assert len(out) == 4
    for i in range(3):
        assert out[i].error is None and len(out[i].feature) == 192, out[i]
        # block-mean of a constant image == shade/255 everywhere
        shade = fake_jpegs[i][-1] * 20 % 256
        assert all(abs(v - shade / 255.0) < 1e-6 for v in out[i].feature)
    # built-in BMP path untouched by the swap-in
    assert out[9].error is None and len(out[9].feature) == 192
    # and WITHOUT the decoder the same payloads still error cleanly
    base = {r.media_id: r for r in
            multimodal.extract_features(media).collect()}
    assert all(base[i].feature is None and "codec" in base[i].error
               for i in range(3))


def test_broadcast_small_query_guardrail(spark):
    """VERDICT r02 #4/#6: multi-query APIs collect/broadcast the query
    side; past max_queries they must fail loudly instead of OOMing the
    driver."""
    rows = [(i, [float(i), 1.0, 0.0]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="pairwise_topk"):
        similarity.pairwise_topk(emb, emb, k=2, max_queries=3)
    cents = np.array([[0.0, 1.0, 0.0], [7.0, 1.0, 0.0]])
    with pytest.raises(ValueError, match="ivf_topk_multi"):
        similarity.ivf_topk_multi(emb, emb, k=2, centroids=cents,
                                  max_queries=3)
    # within bounds both still work
    ok = similarity.pairwise_topk(emb, emb.limit(2), k=2, max_queries=3)
    assert ok.count() == 4


def test_custom_decoder_failure_surfaces_per_row(spark):
    """A user-supplied codec that THROWS must surface as a row error
    (like built-in decode failures), never kill the 100 TB task."""
    rows = [(0, "image", "image/jpeg", b"\xff\xd8\xff bad", None, None,
             None)]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)

    def exploding(payload):
        raise TypeError("boom")

    out = multimodal.extract_features(
        media, decoders={"image": exploding}).collect()
    assert out[0].feature is None
    assert "custom image decoder failed" in out[0].error


def test_ivf_topk_join_matches_multi(spark):
    """The fully-distributed corpus-vs-corpus IVF (shuffle join on
    cluster id, zero driver collects of the query side) must return
    exactly what the broadcast-small variant returns for the same
    centroids/probe settings."""
    import numpy as np
    rng = np.random.RandomState(3)
    base = rng.randn(8, 4)
    rows = []
    vid = 0
    for c in range(8):
        for i in range(12):
            v = base[c] + 0.05 * rng.randn(4)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = emb.where("vec_id % 12 = 0")
    cents = similarity.ivf_centroids(emb, 8, seed=11)
    a = similarity.ivf_topk_multi(emb, qs, k=4, n_probe=2,
                                  centroids=cents)
    b = similarity.ivf_topk_join(emb, qs, k=4, n_probe=2,
                                 centroids=cents)
    ra = {(r.query_id, r.nbr_id, r.rank, r.cosine) for r in a.collect()}
    rb = {(r.query_id, r.nbr_id, r.rank, r.cosine) for r in b.collect()}
    assert ra == rb and len(ra) == 8 * 4


def test_simhash_batch_kernel_matches_scalar_reference(spark):
    """The whole-batch simhash kernel (flat-buffer FNV passes +
    transposed unpackbits + dtype-promoting reduceat) must be
    bit-identical to the straightforward per-document scalar
    formulation, including empty/None/unicode/degenerate docs."""
    import numpy as np
    from rdflib_jsonld_spark.operators.dedup import _fnv1a

    def scalar_simhash(text):
        words = (text or "").lower().split()
        if not words:
            return 0
        bit_idx = np.arange(64, dtype=np.uint64)
        wh = np.array([_fnv1a(w.encode("utf-8", "ignore")) for w in words],
                      dtype=np.uint64)
        bits = ((wh[:, None] >> bit_idx[None, :]) & np.uint64(1)) \
            .astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        sh = np.uint64(0)
        for i in range(64):
            if v[i] > 0:
                sh |= np.uint64(1) << np.uint64(i)
        return int(sh.astype(np.int64))

    texts = ["doc %d lorem ipsum dolor sit amet %d" % (i, i)
             for i in range(40)]
    texts += ["", "   ", None, "one", "Ünïcode tëxt ünïcode", "a " * 500,
              "x" * 300]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.simhash
           for r in dedup.simhash_signatures(df).collect()}
    want = {i: scalar_simhash(t) for i, t in enumerate(texts)}
    assert got == want


def test_chunk_documents_coverage_and_grid(spark):
    """Chunking invariants: chunk0 + tail[overlap:] per chunk
    reconstructs the document exactly; start grid is (c-o)-spaced;
    short/empty docs yield exactly one chunk; original columns kept."""
    from rdflib_jsonld_spark.operators.textstats import chunk_documents
    import pytest
    texts = ["x" * 1000, "y" * 1001, "z" * 1900, "w" * 2000,
             "short", "", "a" * 450]
    rows = [(i, t, f"s{i % 2}") for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    ch = chunk_documents(docs, chunk_chars=1000, overlap=100)
    got = {}
    for r in ch.collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_start, r.chunk_text, r.source))
    for i, t in enumerate(texts):
        parts = sorted(got[i])
        assert [p[0] for p in parts] == list(range(len(parts)))
        assert all(p[1] == p[0] * 900 for p in parts)
        rebuilt = parts[0][2] + "".join(p[2][100:] for p in parts[1:])
        assert rebuilt == t, i
        assert all(p[3] == f"s{i % 2}" for p in parts)  # cols preserved
    assert len(got[0]) == 1      # exactly chunk_chars → one chunk
    assert len(got[1]) == 2      # one char over → two
    assert len(got[2]) == 2      # 1900 = 1000 + 900
    assert len(got[3]) == 3
    assert len(got[4]) == 1 and len(got[5]) == 1
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_chars=100, overlap=100)
