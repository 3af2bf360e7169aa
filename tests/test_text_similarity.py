"""Tests for training-data extensions: text ops, dedup family,
similarity search, multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from fintrack_etl_spark import textops as TX
from fintrack_etl_spark.operators import dedup_text as DD
from fintrack_etl_spark.similarity import cosine_topk_bruteforce, cosine_topk_lsh, ivf_topk


def docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog near the river bend today"),  # near dup of 1
        (4, "completely different text about spark query engines and shuffle plans here"),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_count(spark):
    df = docs_df(spark).select(TX.token_count("text").alias("n"), "doc_id")
    got = {r["doc_id"]: r["n"] for r in df.collect()}
    assert got[5] == 2 and got[1] == 14


def test_shingles(spark):
    df = docs_df(spark).filter(F.col("doc_id") == 5).select(
        TX.shingles(TX.tokens(F.col("text")), 2).alias("s")
    )
    assert df.first()["s"] == ["short text"]


def test_exact_dup_groups(spark):
    out = DD.exact_dup_groups(docs_df(spark), "doc_id", "text")
    dups = {r["keep_id"]: r["n_copies"] for r in out.collect()}
    assert dups[1] == 2  # docs 1+2 collapse, keep min id
    assert out.count() == 4


def test_ngram_jaccard_finds_near_dups(spark):
    pairs = DD.ngram_jaccard_pairs(docs_df(spark), "doc_id", "text", n=3, threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert all(4 not in p for p in got)


def boilerplate_docs_df(spark, n_docs=60):
    """Adversarial corpus for the stop-shingle guard: every doc starts
    with the same boilerplate sentence (each of its shingles has
    df == n_docs), followed by a unique tail. Docs 0 and 1 additionally
    share a rare 5-token sentence (df == 2 shingles) plus the
    boilerplate — a true near-dup pair whose overlap is mixed
    hot + rare."""
    boiler = "subscribe to our newsletter for updates and offers"
    shared = "alpha beta gamma delta epsilon"
    rows = []
    for i in range(n_docs):
        tail = f"unique token run number{i} payload{i} end{i}"
        mid = shared if i < 2 else f"filler{i} words{i} here{i} now{i} done{i}"
        rows.append((i, f"{boiler} {mid} {tail}"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_stop_shingles_identifies_boilerplate(spark):
    df = boilerplate_docs_df(spark)
    sh = DD._shingled(df, "doc_id", "text", 3)  # aliases id_col to "id"
    ex = sh.select("id", F.explode("sh").alias("s"))
    hot = {r["s"] for r in DD.stop_shingles(ex, max_df=10).collect()}
    # the all-doc boilerplate shingles are caught...
    assert "subscribe to our" in hot and "our newsletter for" in hot
    # ...and nothing rare is: every flagged shingle really is hot
    df_counts = {r["s"]: r["cnt"] for r in ex.groupBy("s").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert all(df_counts[s] > 10 for s in hot)
    # the guard prunes the quadratic join input: the hot shingles are
    # the ones that would each emit n_docs*(n_docs-1)/2 join rows
    rare_ex = ex.join(F.broadcast(DD.stop_shingles(ex, 10)), "s", "left_anti")
    worst = rare_ex.groupBy("s").agg(F.count(F.lit(1)).alias("cnt")).agg(F.max("cnt")).first()[0]
    assert worst <= 10


def test_ngram_jaccard_guard_is_exact_on_mixed_overlap(spark):
    """With the guard on, any pair sharing >=1 rare shingle gets its
    EXACT Jaccard (hot overlap restored via the hot-set correction) —
    identical output to the unguarded operator, while the join keys
    exclude the df=60 boilerplate shingles. (Threshold sits above the
    ~0.21 jaccard that boilerplate alone yields between any two docs —
    below that floor the unguarded join also returns the
    boilerplate-only pairs, which the guard by design does not; that
    case is covered by the drops-boilerplate-only test.)"""
    df = boilerplate_docs_df(spark)
    unguarded = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.3).collect()
    }
    guarded = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.3, max_df=10).collect()
    }
    assert (0, 1) in guarded  # the true near-dup survives the guard
    assert guarded == unguarded


def test_ngram_jaccard_guard_drops_boilerplate_only_pairs(spark):
    """Pairs whose ENTIRE overlap is stop-shingles are the documented
    miss: at a low threshold the unguarded join manufactures a pair for
    every two docs (quadratic — the skew bomb), the guarded one emits
    only pairs connected by rare shingles."""
    df = boilerplate_docs_df(spark, n_docs=30)
    unguarded = DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.01).count()
    guarded = DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.01, max_df=10).count()
    assert unguarded == 30 * 29 / 2  # every pair shares the boilerplate
    assert guarded == 1  # only (0, 1) share any rare shingle


def test_minhash_lsh_recall_vs_exact(spark):
    """Every exact near-dup pair (the x3 verifier) must be a MinHash
    LSH candidate at these parameters."""
    df = docs_df(spark)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.8).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in DD.minhash_lsh_candidates(df, "doc_id", "text", 3, 32, 8).collect()
    }
    assert exact, "fixture should contain at least one >=0.8 pair"
    assert exact <= cand, f"LSH missed exact pairs: {exact - cand}"


def test_simhash_identical_docs_zero_hamming(spark):
    pairs = DD.simhash_near_pairs(docs_df(spark), "doc_id", "text", max_hamming=10)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    # identical docs → identical simhash → same block, hamming 0
    assert got[(1, 2)] == 0
    # unrelated docs never collide at this radius
    assert all(4 not in p for p in got)


def test_simhash_multitable_recall_contract(spark):
    """Pigeonhole recall contract (Manku et al.): with n_tables disjoint
    16-bit chunks, EVERY pair at hamming <= n_tables-1 must be found,
    wherever the differing bits fall — including bits inside the
    single-table prefix block, which the old one-table blocking missed.
    Exact ground truth comes from an all-pairs bit_count(xor) on the
    same hashes (fine at test size)."""
    base_hash = 0x0123456789ABCDEF

    def flip(h, bits):
        for b in bits:
            h ^= 1 << b
        return h - (1 << 64) if h >= 1 << 63 else h

    rows = [
        (0, flip(base_hash, [])),
        (1, flip(base_hash, [63])),          # flips INSIDE table-0's prefix block
        (2, flip(base_hash, [0, 21, 42])),   # 3 flips spread across 3 chunks
        (3, flip(base_hash, [5, 6, 7])),     # 3 flips inside one chunk
        (4, flip(base_hash, [60, 40, 20])),  # 3 flips, three different chunks
        (5, flip(base_hash, list(range(0, 40)))),  # far away
        (6, 0x7EDCBA9876543210),             # unrelated
    ]
    base = spark.createDataFrame(rows, ["id", "sh"])

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in DD.simhash_near_pairs_from_table(
            base, max_hamming=3, prefix_bits=16, n_tables=4
        ).collect()
    }
    a, b = base.alias("a"), base.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    exact = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"), ham.alias("hamming"))
        .filter(ham <= 3)
        .collect()
    }
    assert exact, "ground truth must be non-empty"
    assert got == exact, f"missed: {set(exact) - set(got)}; extra: {set(got) - set(exact)}"
    # the single-table regression: doc 1 differs only in the prefix
    # block, so one-table blocking cannot find (0, 1)
    single = {
        (r["doc_a"], r["doc_b"])
        for r in DD.simhash_near_pairs_from_table(
            base, max_hamming=3, prefix_bits=16, n_tables=1
        ).collect()
    }
    assert (0, 1) in got and (0, 1) not in single


def emb_df(spark):
    import math

    rows = []
    for i in range(20):
        base = [math.sin(i * 0.7 + j) for j in range(8)]
        rows.append((i, [float(x) for x in base], i % 2))
    rows.append((100, rows[0][1], 0))  # exact dup of vec 0
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_cosine_topk_bruteforce(spark):
    emb = emb_df(spark)
    out = cosine_topk_bruteforce(emb.filter(F.col("vec_id") == 0), emb, k=3)
    rows = sorted(out.collect(), key=lambda r: r["rnk"])
    assert rows[0]["neighbor_id"] == 100 and abs(rows[0]["cosine"] - 1.0) < 1e-9
    assert len(rows) == 3


def test_cosine_topk_lsh_finds_exact_dup(spark):
    emb = emb_df(spark)
    out = cosine_topk_lsh(emb.filter(F.col("vec_id") == 0), emb, k=3, bits=4)
    rows = sorted(out.collect(), key=lambda r: r["rnk"])
    assert rows and rows[0]["neighbor_id"] == 100  # same bucket (identical vector)


def test_ivf_topk_runs(spark):
    emb = emb_df(spark)
    out = ivf_topk(emb.filter(F.col("vec_id") == 0), emb, k=3, nprobe=2)
    assert out.count() == 3


def test_embedding_cosine_pairs(spark):
    out = DD.embedding_cosine_pairs(emb_df(spark), "vec_id", "embedding", threshold=0.99)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 100) in got


def test_multimodal_extract_features(spark):
    from fintrack_etl_spark.multimodal import documents_as_media, extract_features

    docs = docs_df(spark).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text"))
    feats = extract_features(documents_as_media(docs))
    rows = {r["media_id"]: r for r in feats.collect()}
    assert rows[5]["n_bytes"] == len("short text".encode())
    assert rows[5]["head_hex"] == "short text".encode()[:4].hex()


def test_minipng_roundtrips_all_filters_and_color_types():
    """Pure-Python PNG codec: encode→decode is identity for every
    filter type and supported color type; corrupt bytes quarantine."""
    import pytest

    from fintrack_etl_spark.parse.minipng import PngError, decode_png, encode_png

    import random

    rng = random.Random(7)
    for ct in (0, 2, 4, 6):
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
        w, h = 13, 9
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            blob = encode_png(px, w, h, color_type=ct, filters=filters)
            assert decode_png(blob) == (w, h, ct, px), (ct, filters)
    good = encode_png(bytes(range(16)), 4, 4)
    with pytest.raises(PngError, match="CRC"):
        decode_png(good[:40] + bytes([good[40] ^ 0xFF]) + good[41:])
    with pytest.raises(PngError, match="signature"):
        decode_png(b"not a png at all")
    with pytest.raises(PngError, match="truncated|IEND"):
        decode_png(good[:-8])


def test_decode_image_real_codec_and_quarantine(spark):
    """decode_image runs the real PNG decode inside mapInPandas and
    quarantines non-image payloads as decode_error rows."""
    from fintrack_etl_spark.multimodal import decode_image
    from fintrack_etl_spark.parse.minipng import encode_png

    px = bytes(range(12))  # 4x3 gray
    rows = [
        (1, "image", encode_png(px, 4, 3, color_type=0, filters=[4]), None),
        (2, "image", b"definitely not an image", None),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary, meta map<string,string>"
    )
    got = {r["media_id"]: r for r in decode_image(media).collect()}
    ok = got[1]
    assert (ok["width"], ok["height"], ok["mode"]) == (4, 3, "gray")
    assert bytes(ok["pixels"]) == px and ok["decode_error"] is None
    bad = got[2]
    assert bad["pixels"] is None and "unknown container" in bad["decode_error"]


def test_resize_image_real_nearest_neighbor(spark):
    """A decodable PNG is resized by actual nearest-neighbor resampling
    of the decoded raster (not byte tiling)."""
    from fintrack_etl_spark.multimodal import resize_image
    from fintrack_etl_spark.parse.minipng import encode_png

    # 4x2 gray gradient; resize to 2x1 -> picks src cols 0,2 of row 0
    px = bytes([10, 20, 30, 40, 50, 60, 70, 80])
    media = spark.createDataFrame(
        [(1, "image", encode_png(px, 4, 2), None)],
        "media_id long, media_type string, content binary, meta map<string,string>",
    )
    out = resize_image(media, 2, 1).collect()[0]
    assert bytes(out["pixels"]) == bytes([10, 30])


def test_multimodal_resize_plumbing(spark, sf_dir):
    """Real mapInPandas plumbing around the faked codec: every media
    row yields a width×height payload, deterministically."""
    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.multimodal import documents_as_media, resize_image

    media = documents_as_media(table(spark, "documents", sf_dir)).limit(20)
    out = resize_image(media, 8, 4).collect()
    assert len(out) == 20
    assert all(len(r["pixels"]) == 32 for r in out if r["pixels"] is not None)
    again = resize_image(media, 8, 4).collect()
    assert {r["media_id"]: r["pixels"] for r in out} == {
        r["media_id"]: r["pixels"] for r in again
    }


def test_multimodal_frame_sample_fanout(spark, sf_dir):
    """flatMap shape: one input row → one output row per frame; frame
    count follows payload size; timestamps step by the sample period."""
    from pyspark.sql import functions as F

    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.multimodal import documents_as_media, sample_video_frames

    media = documents_as_media(table(spark, "documents", sf_dir)).limit(10)
    frames = sample_video_frames(media, every_n_seconds=0.5, frame_bytes=64)
    per = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_ts").alias("last_ts")
    )
    sizes = {r["media_id"]: r["n_bytes"] for r in media.select(
        "media_id", F.octet_length("content").alias("n_bytes")).collect()}
    for r in per.collect():
        expect = max(1, sizes[r["media_id"]] // 64)
        assert r["n"] == expect
        assert abs(r["last_ts"] - 0.5 * (expect - 1)) < 1e-9


def test_lang_guess(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in a house",),
            ("der hund und die katze ist nicht da",),
            ("xyzzy plugh",),
        ],
        ["text"],
    )
    got = [r["g"] for r in df.select(TX.lang_guess("text").alias("g")).collect()]
    assert got == ["en", "de", "unknown"]


def test_ann_quality_contracts(spark, sf_dir):
    """The rows-only ANN paths have no SQL oracle; their quality
    contracts are relative and structural (the fixture's vectors are
    weakly clustered, so absolute bucket-pruned recall is bounded by
    the probed fraction — measured and recorded in BASELINE.md):

    1. LSH finds EVERY exact duplicate (signature equality is
       invariant in all tables) — its job in the dedup family;
    2. more hash tables → monotonically more recall vs brute force;
    3. learned k-means partitions beat the fixture label partitions.
    """
    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
        ivf_topk,
        ivf_topk_kmeans,
    )

    emb = table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(cosine_topk_bruteforce(queries, emb, k=5))

    def recall(approx):
        got = topk_sets(approx)
        per_q = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
        return sum(per_q) / len(per_q)

    # 1. exact-duplicate recall is 1.0: re-crawled copies of the query
    # vectors must all surface as rank-1 cosine≈1 neighbors
    dup = queries.withColumn("vec_id", F.col("vec_id") + 100000)
    corpus_with_dups = emb.unionByName(dup)
    hits = topk_sets(cosine_topk_lsh(queries, corpus_with_dups, k=5, bits=8, tables=4))
    for q in (r["vec_id"] for r in queries.collect()):
        assert q + 100000 in hits.get(q, set()), f"LSH missed exact dup of {q}"

    # 2. the tables lever is monotone
    r1 = recall(cosine_topk_lsh(queries, emb, k=5, bits=8, tables=1))
    r8 = recall(cosine_topk_lsh(queries, emb, k=5, bits=8, tables=8))
    assert r8 >= r1, (r1, r8)

    # 3. learned partitions beat fixture labels, with a floor
    r_label = recall(ivf_topk(queries, emb, k=5, nprobe=2))
    r_kmeans = recall(ivf_topk_kmeans(queries, emb, k=5, kclusters=8, nprobe=2))
    assert r_kmeans >= r_label, (r_label, r_kmeans)
    assert r_kmeans >= 0.4, r_kmeans


def test_lsh_verify_equals_exact_jaccard(spark):
    """The LSH→verify pipeline (x4's shape) must reproduce the exact
    all-shared-shingle operator wherever banding recall covers the
    threshold — here on a corpus with exact and near dups."""
    df = docs_df(spark)
    exact = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.6).collect()
    }
    cand = DD.minhash_lsh_candidates(df, "doc_id", "text", 3, num_hashes=32, bands=8)
    verified = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in DD.verify_pairs_exact_jaccard(cand, df, "doc_id", "text", 3, 0.6).collect()
    }
    assert exact and verified == exact


def test_decontaminate_flags_eval_overlap(spark):
    """13-gram decontamination: a train doc embedding a verbatim eval
    passage is flagged; clean docs are not; hit counts are distinct
    collided n-grams."""
    eval_passage = " ".join(f"evaltok{i}" for i in range(20))  # 8 distinct 13-grams
    train = spark.createDataFrame(
        [
            (1, "prefix words here " + eval_passage + " suffix words"),
            (2, " ".join(f"clean{i}" for i in range(30))),
            (3, " ".join(f"evaltok{i}" for i in range(12))),  # <13 tokens of overlap
        ],
        ["doc_id", "text"],
    )
    eval_set = spark.createDataFrame([(100, eval_passage)], ["doc_id", "text"])
    got = {r.doc_id: r for r in DD.decontaminate(train, eval_set).collect()}
    assert got[1].contaminated and got[1].eval_ngram_hits == 8
    assert not got[2].contaminated and got[2].eval_ngram_hits == 0
    assert not got[3].contaminated  # a sub-13-gram prefix is not a collision
    # original columns survive untouched
    assert set(got[1].asDict()) == {"doc_id", "text", "eval_ngram_hits", "contaminated"}


def test_pq_quality_and_compression_contracts(spark, sf_dir):
    """IVF-PQ contracts:

    1. codes are genuinely compressed: exactly m codes per vector,
       code domain ≤ ksub per subspace (m small ints vs D floats);
    2. exact re-rank recall@5 vs brute force clears a floor on the
       fixture (ADC shortlist of 50 over 500 vectors);
    3. a bigger shortlist can only help (monotone refinement knob).
    """
    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.similarity import cosine_topk_bruteforce, pq_topk, pq_train

    emb = table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    codes, books = pq_train(emb, m=8, ksub=16)
    n_vecs = emb.count()
    assert codes.count() == 8 * n_vecs
    assert codes.groupBy("j").agg(F.countDistinct("code").alias("n")).filter(
        F.col("n") > 16
    ).count() == 0
    assert books.count() <= 8 * 16

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(cosine_topk_bruteforce(queries, emb, k=5))

    def recall(approx):
        got = topk_sets(approx)
        per_q = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
        return sum(per_q) / len(per_q)

    r_small = recall(pq_topk(queries, emb, k=5, shortlist=20))
    r_big = recall(pq_topk(queries, emb, k=5, shortlist=100))
    assert r_big >= r_small, (r_small, r_big)
    assert r_big >= 0.5, r_big


def test_ann_recall_contracts_sf01(spark):
    """Pinned recall@5 floors at sf0.1 (2 000 vectors, 80 queries) at
    STATED probe budgets — the tuned operating points recorded with the
    full recall-vs-probed-fraction curve in BASELINE.md §D:

    - learned IVF, kclusters=8, nprobe=5 (5/8 partitions probed):
      measured 0.82, floor 0.70;
    - IVF-PQ, m=16, ksub=16, shortlist=200 (10% exact re-rank):
      measured 0.92, floor 0.70.

    The fixture vectors are near-isotropic, so bucket-pruned recall is
    bounded by the probed fraction — these budgets are what honesty
    costs on unclustered data; real embedding corpora cluster and reach
    the same recall at far smaller fractions. Floors leave ≥0.1 margin
    for per-round fixture regeneration."""
    import os

    sf01 = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf01):
        pytest.skip("sf0.1 fixtures not present")

    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.similarity import (
        cosine_topk_bruteforce,
        ivf_topk_kmeans,
        pq_topk,
    )

    emb = table(spark, "embeddings", sf01).localCheckpoint()
    queries = emb.filter(F.col("vec_id") % 25 == 0).localCheckpoint()

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(cosine_topk_bruteforce(queries, emb, k=5))

    def recall(df):
        got = topk_sets(df)
        return sum(len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact) / len(exact)

    r_ivf = recall(ivf_topk_kmeans(queries, emb, k=5, kclusters=8, nprobe=5))
    assert r_ivf >= 0.70, f"learned-IVF recall@5 {r_ivf:.3f} < 0.70 at nprobe=5/8"

    r_pq = recall(pq_topk(queries, emb, k=5, m=16, ksub=16, shortlist=200))
    assert r_pq >= 0.70, f"IVF-PQ recall@5 {r_pq:.3f} < 0.70 at 10% shortlist"


def test_ivfpq_combined_contracts(spark, sf_dir):
    """Combined IVF-PQ (x21's operator): planted exact dups survive the
    stacked pruning (same coarse cell + same code word → probed, ADC-
    maximal, re-ranked to 1.0), and recall floors at the pinned budget
    (sf0.1 curve in BASELINE.md §D; misses multiply, so the floor is
    below the single-stage contracts)."""
    import os

    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.similarity import cosine_topk_bruteforce, ivfpq_topk

    emb = table(spark, "embeddings", sf_dir)
    dup = emb.filter(F.col("vec_id") % 50 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(dup)
    hits = {
        r.query_id: (r.neighbor_id, r.cosine)
        for r in ivfpq_topk(dup, corpus, k=5, kclusters=8, nprobe=2).filter(
            F.col("rnk") == 1
        ).collect()
    }
    for r in dup.select("vec_id").collect():
        nid, cos = hits[r.vec_id]
        assert nid == r.vec_id - 100000 and cos == 1.0

    sf01 = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf01):
        pytest.skip("sf0.1 fixtures not present")
    emb1 = table(spark, "embeddings", sf01).localCheckpoint()
    queries = emb1.filter(F.col("vec_id") % 25 == 0).localCheckpoint()

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(cosine_topk_bruteforce(queries, emb1, k=5))
    got = topk_sets(
        ivfpq_topk(queries, emb1, k=5, kclusters=8, nprobe=5, m=16, ksub=16, shortlist=200)
    )
    r = sum(len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact) / len(exact)
    assert r >= 0.6, f"combined IVF-PQ recall@5 {r:.3f} < 0.6 at nprobe=5/8, 10% shortlist"


def test_ivf_layout_partition_pruned_probe(spark, sf_dir, tmp_path):
    """The materialized IVF layout: results equal the in-memory learned
    IVF (same quantizer, same routing), and the probe's scan reads ONLY
    the probed cid= partition directories — asserted on the physical
    plan's PartitionFilters, the thing that makes a probe O(nprobe/k)
    I/O at 100 TB."""
    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.similarity import (
        ivf_topk_from_layout,
        ivf_topk_kmeans,
        write_ivf_layout,
    )

    emb = table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    root = str(tmp_path / "ivf")

    write_ivf_layout(emb, root, kclusters=8)
    import os

    cids = sorted(d for d in os.listdir(f"{root}/vectors") if d.startswith("cid="))
    assert len(cids) == 8  # one directory per coarse cell

    got = ivf_topk_from_layout(spark, root, queries, k=5, nprobe=2)
    want = ivf_topk_kmeans(queries, emb, k=5, kclusters=8, nprobe=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # partition pruning is in the plan, not hoped for
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan


def test_auto_kclusters_contract(spark, sf_dir):
    """VERDICT r8 #5: the measured √N lever is now the DEFAULT. Pins
    (a) growth — auto_kclusters is exactly max(8, ceil(√N)), so the
    coarse grid (and with it the probed fraction nprobe/k) scales as
    the corpus grows instead of staying a fixed 1/8th; (b) the recall
    floor the probe held while winning 6.6× warm — on the DEFAULT call
    path (kclusters unset) every planted exact dup still re-ranks to
    rank 1 / cosine 1.0 for both IVF and IVF-PQ: an exact dup shares
    its query's coarse cell WHATEVER the grid size, so dup self-recall
    is grid-invariant by construction and any auto-k regression here
    would be a routing/assignment mismatch bug."""
    import math

    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.similarity import (
        auto_kclusters,
        ivf_topk_kmeans,
        ivfpq_topk,
    )

    # (a) growth: floor at small N, ceil(sqrt) beyond it
    for n, want in ((1, 8), (64, 8), (65, 9), (100, 10), (2500, 50), (2501, 51)):
        df = spark.range(n).withColumnRenamed("id", "vec_id")
        assert auto_kclusters(df) == want, (n, want)
        assert auto_kclusters(df) == max(8, math.isqrt(n - 1) + 1)

    # (b) recall floor on the DEFAULT path (auto k, nprobe default)
    emb = table(spark, "embeddings", sf_dir)
    dup = emb.filter(F.col("vec_id") % 50 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(dup).localCheckpoint()
    n = corpus.count()
    assert auto_kclusters(corpus) == max(8, math.isqrt(n - 1) + 1)
    for builder in (ivf_topk_kmeans, ivfpq_topk):
        hits = {
            r.query_id: (r.neighbor_id, r.cosine)
            for r in builder(dup, corpus, k=5).filter(F.col("rnk") == 1).collect()
        }
        for r in dup.select("vec_id").collect():
            nid, cos = hits[r.vec_id]
            assert nid == r.vec_id - 100000 and cos == 1.0, (builder.__name__, r)


def test_kmeans_sampled_lloyd_contract(spark, sf_dir):
    """VERDICT r9 #3: the auto-√N cold build is bounded by running the
    Lloyd ROUNDS on a deterministic md5-threshold sample, with one
    exact full-corpus assignment pass at the end. Pins (a) below-cap
    identity — every fixture sits under the 4096-vector floor, so the
    default path is bit-identical to the explicit full-corpus opt-out
    (gate/bench values cannot move); (b) the sampled path (forced tiny
    cap) assigns EVERY corpus vector exactly once, and an exact
    duplicate vector lands in its original's cell even when NEITHER
    was sampled into training (assignment is exact, training-set
    membership is irrelevant); (c) the md5 threshold actually bites
    (the training set is a strict nonempty subset); (d) the sampled
    result is partition-count invariant (id-deterministic sample +
    integer-exact centroid means + deterministic argmax)."""
    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.operators.sampling import rate_threshold_hex
    from fintrack_etl_spark.similarity import kmeans_centroids

    emb = table(spark, "embeddings", sf_dir)
    n = emb.count()

    def rows(assigns):
        return sorted((r["vec_id"], r["cid"]) for r in assigns.collect())

    def cent_rows(cents):
        return sorted((r["cid"], tuple(r["ccv"])) for r in cents.collect())

    # (a) default cap (floor 4096 > n) == explicit full-corpus opt-out
    a_def, c_def = kmeans_centroids(emb, k=8, iters=2)
    a_full, c_full = kmeans_centroids(emb, k=8, iters=2, train_sample_cap=0)
    assert rows(a_def) == rows(a_full)
    assert cent_rows(c_def) == cent_rows(c_full)

    # (b)+(c) forced sampling: plant an exact dup whose md5 threshold
    # status differs from its original's possible status — the
    # contract must hold regardless
    cap = max(16, n // 4)
    dup = emb.filter(F.col("vec_id") % 97 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(dup).localCheckpoint()
    total = corpus.count()
    thresh = rate_threshold_hex(cap / total, digits=8)  # ADVICE r10: 8-digit threshold
    sampled_n = corpus.filter(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8) < thresh
    ).count()
    assert 0 < sampled_n < total  # the cap bites
    a_s, c_s = kmeans_centroids(corpus, k=8, iters=2, train_sample_cap=cap)
    got = {r["vec_id"]: r["cid"] for r in a_s.collect()}
    assert len(got) == total  # every vector assigned exactly once
    for r in dup.select("vec_id").collect():
        assert got[r["vec_id"]] == got[r["vec_id"] - 100000]

    # (d) partition-count invariance of the sampled result
    for parts in (3, 17):
        a_p, c_p = kmeans_centroids(
            corpus.repartition(parts), k=8, iters=2, train_sample_cap=cap
        )
        assert {r["vec_id"]: r["cid"] for r in a_p.collect()} == got
        assert cent_rows(c_p) == cent_rows(c_s)


def test_kmeans_below_cap_never_runs_python(spark, sf_dir, monkeypatch):
    """The BLAS assignment is gated to the sampled regime; below the
    train cap (every gate/bench fixture) the build must stay on the
    bit-exact JVM loop with ZERO Python — pinned by a mapInPandas
    tripwire so a future widening of the gate cannot silently move
    gate values."""
    from pyspark.sql import DataFrame

    from fintrack_etl_spark import similarity as S
    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.operators.memo import unpersist_checkpointed

    while S._TRAIN_CACHE:  # drain the memo so the build really runs
        _, stale = S._TRAIN_CACHE.popitem()
        unpersist_checkpointed(stale)

    def boom(self, *a, **k):
        raise AssertionError("mapInPandas reached on a below-cap kmeans build")

    monkeypatch.setattr(DataFrame, "mapInPandas", boom)
    emb = table(spark, "embeddings", sf_dir)
    assigns, cents = S.kmeans_centroids(emb, k=8, iters=2)
    assert assigns.count() == emb.count()
    assert cents.count() <= 8
    # same gate on the repo's OTHER Lloyd (pq_train)
    codes, books = S.pq_train(emb, m=8, ksub=16, iters=2)
    assert codes.count() == emb.count() * 8


def test_pq_sampled_training_contract(spark, sf_dir):
    """pq_train's sampled regime (forced tiny cap): (a) below-cap
    default is bit-identical to the full-corpus opt-out; (b) with the
    cap biting, EVERY (vector, subspace) row is encoded exactly once
    and an exact duplicate vector gets its original's codes in every
    subspace (encode is exact; training membership is irrelevant);
    (c) partition-count invariance."""
    from fintrack_etl_spark import similarity as S
    from fintrack_etl_spark.io import table

    emb = table(spark, "embeddings", sf_dir)
    n = emb.count()

    def rows(codes):
        return sorted((r["vec_id"], r["j"], r["code"]) for r in codes.collect())

    a_def, b_def = S.pq_train(emb, m=8, ksub=16, iters=2)
    a_full, b_full = S.pq_train(emb, m=8, ksub=16, iters=2, train_sample_cap=0)
    assert rows(a_def) == rows(a_full)

    cap = max(16, n // 4)
    dup = emb.filter(F.col("vec_id") % 97 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(dup).localCheckpoint()
    total = corpus.count()
    codes, books = S.pq_train(corpus, m=8, ksub=16, iters=2, train_sample_cap=cap)
    got = {(r["vec_id"], r["j"]): r["code"] for r in codes.collect()}
    assert len(got) == total * 8  # every (vector, subspace) exactly once
    for r in dup.select("vec_id").collect():
        for j in range(8):
            assert got[(r["vec_id"], j)] == got[(r["vec_id"] - 100000, j)]

    for parts in (3, 17):
        a_p, _ = S.pq_train(
            corpus.repartition(parts), m=8, ksub=16, iters=2, train_sample_cap=cap
        )
        assert {(r["vec_id"], r["j"]): r["code"] for r in a_p.collect()} == got


def _drain_train_cache():
    from fintrack_etl_spark import similarity as S
    from fintrack_etl_spark.operators.memo import unpersist_checkpointed

    while S._TRAIN_CACHE:
        _, stale = S._TRAIN_CACHE.popitem()
        unpersist_checkpointed(stale)


def test_sampled_train_empty_falls_back_to_full_corpus(spark, sf_dir, monkeypatch):
    """ADVICE r10 (medium): an EMPTY md5-threshold training sample
    (forced here with a keep-nothing threshold) must fall back to
    full-corpus training, not train on nothing and lose every
    assignment. With the fallback, the sampled-cap call is
    bit-identical to the explicit full-corpus opt-out — on BOTH
    Lloyds."""
    from fintrack_etl_spark import similarity as S
    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.operators import sampling

    _drain_train_cache()
    emb = table(spark, "embeddings", sf_dir)
    n = emb.count()
    cap = max(16, n // 4)

    want_k, _ = S.kmeans_centroids(emb, k=8, iters=2, train_sample_cap=0)
    want_kr = sorted((r["vec_id"], r["cid"]) for r in want_k.collect())
    want_p, _ = S.pq_train(emb, m=8, ksub=16, iters=2, train_sample_cap=0)
    want_pr = sorted((r["vec_id"], r["j"], r["code"]) for r in want_p.collect())

    monkeypatch.setattr(
        sampling, "rate_threshold_hex", lambda rate, digits=4: "0" * digits
    )
    a, _ = S.kmeans_centroids(emb, k=8, iters=2, train_sample_cap=cap)
    assert sorted((r["vec_id"], r["cid"]) for r in a.collect()) == want_kr
    codes, _ = S.pq_train(emb, m=8, ksub=16, iters=2, train_sample_cap=cap)
    assert sorted((r["vec_id"], r["j"], r["code"]) for r in codes.collect()) == want_pr
    _drain_train_cache()  # the forced-fallback rows must not outlive the patch


def test_blas_closure_cap_falls_back_to_jvm_join(spark, sf_dir, monkeypatch):
    """ADVICE r10 (low): the Arrow/BLAS exact pass serializes the k×D
    centroid (or m·ksub×dsub codebook) matrix into every task closure,
    so it is gated on ``_BLAS_CLOSURE_CAP_BYTES``; above the ceiling
    the sampled regime must keep the JVM broadcast-join argmax —
    pinned with a mapInPandas tripwire, contracts re-asserted on the
    fallback path."""
    from pyspark.sql import DataFrame

    from fintrack_etl_spark import similarity as S
    from fintrack_etl_spark.io import table

    monkeypatch.setattr(S, "_BLAS_CLOSURE_CAP_BYTES", 0)

    def boom(self, *a, **k):
        raise AssertionError("BLAS mapInPandas reached above the closure cap")

    monkeypatch.setattr(DataFrame, "mapInPandas", boom)
    emb = table(spark, "embeddings", sf_dir)
    n = emb.count()
    cap = max(16, n // 4)
    dup = emb.filter(F.col("vec_id") % 97 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(dup).localCheckpoint()
    total = corpus.count()

    a, _ = S.kmeans_centroids(corpus, k=8, iters=2, train_sample_cap=cap)
    got = {r["vec_id"]: r["cid"] for r in a.collect()}
    assert len(got) == total
    for r in dup.select("vec_id").collect():
        assert got[r["vec_id"]] == got[r["vec_id"] - 100000]

    codes, _ = S.pq_train(corpus, m=8, ksub=16, iters=2, train_sample_cap=cap)
    gotc = {(r["vec_id"], r["j"]): r["code"] for r in codes.collect()}
    assert len(gotc) == total * 8
    for r in dup.select("vec_id").collect():
        for j in range(8):
            assert gotc[(r["vec_id"], j)] == gotc[(r["vec_id"] - 100000, j)]


def test_spread_candidates_scale_partitioning(spark, sf_dir, tmp_path):
    """r11 (found by the 50× ANN probe): a compact single-split corpus
    file fed every ANN scoring join — and the Lloyd/BLAS assignment
    passes — at the SCAN's partition count, so 26M candidate pairs ran
    as ONE 16-minute task on a 32-core host. ``_spread_candidates``
    hash-repartitions the candidate side up to core parallelism when
    (and only when) the corpus is above the per-task floor AND the scan
    came back coarser; gate-scale corpora and already-parallel inputs
    pass through untouched (plan byte-identity for every oracle
    fixture)."""
    from fintrack_etl_spark import similarity as S
    from fintrack_etl_spark.io import table

    emb = table(spark, "embeddings", sf_dir)
    reps = spark.range(6).select(F.col("id").alias("r"))
    big = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("r") * 100_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + CAST(r AS FLOAT) * CAST(0.0001 AS FLOAT))"
        ).alias("embedding"),
        "label",
    )
    path = str(tmp_path / "big_emb")
    big.coalesce(1).write.parquet(path)  # ONE split — the hazard shape
    corpus = spark.read.parquet(path)
    n = corpus.count()
    assert n > S._SPREAD_ROWS_PER_TASK

    c = corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    assert c.rdd.getNumPartitions() == 1  # the compact-scan collapse is real
    spread = S._spread_candidates(c, "neighbor_id", S._corpus_count(corpus))
    want_parts = min(
        spark.sparkContext.defaultParallelism, -(-n // S._SPREAD_ROWS_PER_TASK)
    )
    assert spread.rdd.getNumPartitions() == want_parts > 1

    # pass-through contract: below the floor / unknown size / already parallel
    assert S._spread_candidates(c, "neighbor_id", S._SPREAD_ROWS_PER_TASK) is c
    assert S._spread_candidates(c, "neighbor_id", None) is c
    assert S._spread_candidates(spread, "neighbor_id", n) is spread


def test_spread_value_parity_bruteforce_and_builders(spark, sf_dir, tmp_path, monkeypatch):
    """The spread is value-NEUTRAL: per-row cosine + id-tie-broken
    windows (query paths) and exact integer micro-unit centroid sums
    (Lloyd) are partition-invariant by design. Pin it: the spread plan
    and the unspread plan return identical rows for the brute-force
    query path, and kmeans/pq assignments are identical when the spread
    is FORCED at gate scale via a lowered floor."""
    from fintrack_etl_spark import similarity as S
    from fintrack_etl_spark.io import table

    emb = table(spark, "embeddings", sf_dir)
    reps = spark.range(6).select(F.col("id").alias("r"))
    big = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("r") * 100_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + CAST(r AS FLOAT) * CAST(0.0001 AS FLOAT))"
        ).alias("embedding"),
        "label",
    )
    path = str(tmp_path / "parity_emb")
    big.coalesce(1).write.parquet(path)
    corpus = spark.read.parquet(path)
    queries = corpus.filter(F.col("vec_id") % 997 == 0)  # deterministic membership

    got = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["cosine"])
        for r in cosine_topk_bruteforce(queries, corpus, k=5).collect()
    )
    monkeypatch.setattr(S, "_SPREAD_ROWS_PER_TASK", 10**9)  # force the old plan
    want = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["cosine"])
        for r in cosine_topk_bruteforce(queries, corpus, k=5).collect()
    )
    assert got == want and len(got) >= 5  # ≥1 query × top-5

    # builders: force the spread at gate scale, assignments must not move
    _drain_train_cache()
    monkeypatch.setattr(S, "_SPREAD_ROWS_PER_TASK", 100)
    a_s, _ = S.kmeans_centroids(emb, k=8, iters=2)
    got_k = sorted((r["vec_id"], r["cid"]) for r in a_s.collect())
    c_s, _ = S.pq_train(emb, m=8, ksub=16, iters=1)
    got_p = sorted((r["vec_id"], r["j"], r["code"]) for r in c_s.collect())
    _drain_train_cache()
    monkeypatch.setattr(S, "_SPREAD_ROWS_PER_TASK", 10**9)
    a_u, _ = S.kmeans_centroids(emb, k=8, iters=2)
    assert sorted((r["vec_id"], r["cid"]) for r in a_u.collect()) == got_k
    c_u, _ = S.pq_train(emb, m=8, ksub=16, iters=1)
    assert sorted((r["vec_id"], r["j"], r["code"]) for r in c_u.collect()) == got_p
    _drain_train_cache()  # patched-plan artifacts must not outlive the patch


def test_pq_shortlist_includes_adc_ties(spark, sf_dir):
    """r11 (found by the 100× ANN probe): a code-collision class larger
    than the shortlist must not evict the exact match by id order. The
    family below is code-identical (1e-6 perturbations quantize to the
    same cells), its near-dup members hold the LOWEST ids, and the true
    original sits above ``shortlist`` of them — the old
    ``row_number``-over-(score, id) cut truncated the tied class and
    the exact match never reached the re-rank (100×: self-recall
    1285/2063). With rank() over exact integer ADC scores the whole
    tied class is re-ranked exactly and cosine 1.0 wins at rank 1 — on
    BOTH the PQ and the IVF-PQ path."""
    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.similarity import ivfpq_topk, pq_topk

    emb = table(spark, "embeddings", sf_dir)
    base = emb.filter(F.col("vec_id") == 7).select("embedding").first()["embedding"]
    near = [
        (1000 + i, [float(x) + (1e-6 if d == 0 else 0.0) for d, x in enumerate(base)], 0)
        for i in range(8)
    ]
    original = (2000, [float(x) for x in base], 0)
    rows = near + [original]
    fam = spark.createDataFrame(rows, emb.schema)
    corpus = emb.filter(F.col("vec_id") != 7).unionByName(fam)
    query = spark.createDataFrame(
        [(999_999, [float(x) for x in base], 0)], emb.schema
    )

    for fn in (
        lambda: pq_topk(query, corpus, k=5, m=8, ksub=16, shortlist=3),
        lambda: ivfpq_topk(
            query, corpus, k=5, kclusters=8, nprobe=2, m=8, ksub=16, shortlist=3
        ),
    ):
        top1 = fn().filter(F.col("rnk") == 1).collect()
        assert len(top1) == 1
        assert top1[0]["neighbor_id"] == 2000, top1
        assert top1[0]["cosine"] == 1.0, top1


def test_sniff_media_metadata_real_headers(spark):
    """The header sniffer is REAL (pure-Python spec parsing, no codec):
    hand-built valid PNG/JPEG/GIF/BMP/WAV headers yield exact
    dimensions / audio params; garbage and empty payloads quarantine
    as sniff_error rows."""
    import struct
    import zlib

    from fintrack_etl_spark.multimodal import sniff_media_metadata

    # PNG: signature + IHDR chunk for 640x480
    ihdr = struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00"
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    # JPEG: SOI + APP0 + SOF0 (100x200)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 100, 200) + b"\x01\x11\x00"
    jpeg = b"\xff\xd8" + app0 + sof0
    gif = b"GIF89a" + struct.pack("<HH", 320, 240) + b"\x00\x00\x00"
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, -128) + b"\x00" * 4
    # WAV: 16-bit stereo 44100 Hz, 1 second of data
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    wav_data = b"\x00" * (44100 * 4)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(wav_data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(wav_data)) + wav_data
    )

    media = spark.createDataFrame(
        [(1, "image", png), (2, "image", jpeg), (3, "image", gif),
         (4, "image", bmp), (5, "audio", wav), (6, "image", b"\x00garbage"),
         (7, "image", None)],
        "media_id long, media_type string, content binary",
    )
    got = {r.media_id: r for r in sniff_media_metadata(media).collect()}
    assert (got[1].format, got[1].width, got[1].height) == ("png", 640, 480)
    assert (got[2].format, got[2].width, got[2].height) == ("jpeg", 200, 100)
    assert (got[3].format, got[3].width, got[3].height) == ("gif", 320, 240)
    assert (got[4].format, got[4].width, got[4].height) == ("bmp", 64, 128)
    assert (got[5].format, got[5].sample_rate, got[5].channels, got[5].bits_per_sample) == ("wav", 44100, 2, 16)
    assert got[5].duration_ms == 1000.0
    assert got[6].format is None and got[6].sniff_error.startswith("unknown container")
    assert got[7].sniff_error == "empty"


def test_redact_pii_spans(spark):
    from fintrack_etl_spark import textops as TX

    rows = [
        ("a", "mail me at joao.silva+x@sub.example.com.br today"),
        ("b", "cpf 123.456.789-09 and phone (11) 98765-4321"),
        ("c", "not pii: 12.34.56-78, user@nodot, (1) 234-5678"),
        ("d", "two emails a@b.co c@d.org"),
    ]
    df = spark.createDataFrame(rows, "k string, t string")
    got = {
        r["k"]: (r["red"], r["ne"], r["nc"], r["np"])
        for r in df.select(
            "k",
            TX.redact_pii("t").alias("red"),
            TX.pii_count("t", "email").alias("ne"),
            TX.pii_count("t", "cpf").alias("nc"),
            TX.pii_count("t", "phone").alias("np"),
        ).collect()
    }
    assert got["a"] == ("mail me at [EMAIL] today", 1, 0, 0)
    assert got["b"] == ("cpf [CPF] and phone [PHONE]", 0, 1, 1)
    assert got["c"] == ("not pii: 12.34.56-78, user@nodot, (1) 234-5678", 0, 0, 0)
    assert got["d"] == ("two emails [EMAIL] [EMAIL]", 2, 0, 0)


def test_chunk_documents_invariants(spark):
    from fintrack_etl_spark import textops as TX

    rows = [
        (1, " ".join(f"t{i}" for i in range(100))),   # 100 toks → 5 chunks
        (2, " ".join(f"t{i}" for i in range(32))),    # exactly one window
        (3, " ".join(f"t{i}" for i in range(33))),    # one full + 9-tok tail
        (4, "solo"),                                   # sub-window doc
        (5, ""),                                       # empty text edge
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = TX.chunk_documents(df, window=32, stride=24)
    got = {
        (r.doc_id, r.chunk_id): r.chunk_tokens for r in out.collect()
    }
    by_doc = {}
    for (d, c), n in got.items():
        by_doc.setdefault(d, []).append((c, n))
    # chunk count = ceil(n_tokens / stride), min 1
    assert len(by_doc[1]) == 5 and len(by_doc[2]) == 2 and len(by_doc[3]) == 2
    assert len(by_doc[4]) == 1 and len(by_doc[5]) == 1
    # chunk i is clipped to [i*stride, min(i*stride+window, n)):
    # 100 toks → 32, 32, 32, 28, 4
    assert [got[(1, i)] for i in range(5)] == [32, 32, 32, 28, 4]
    assert got[(3, 0)] == 32 and got[(3, 1)] == 33 - 24
    # chunk_ids are dense from 0
    for d, chunks in by_doc.items():
        assert sorted(c for c, _ in chunks) == list(range(len(chunks)))
    # coverage: union of [i*stride, i*stride+len) spans all tokens
    assert max(c * 24 + n for c, n in by_doc[1]) == 100


def test_semdedup_learned_clusters_drop_planted_dups(spark):
    """SemDeDup over LEARNED k-means clusters (the non-oracle variant
    promised by x31's docstring): a planted exact dup has an identical
    vector, so argmax-cosine assignment routes it to the same cluster
    as its original and cosine 1.0 >= any threshold — every planted
    dup must be dropped, and its recorded neighbor sim must be 1.0."""
    from fintrack_etl_spark.io import table
    from fintrack_etl_spark.similarity import kmeans_centroids

    emb = table(spark, "embeddings", "/root/testdata/sf0.001")
    dup = emb.filter(F.col("vec_id") % 50 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(dup)
    assigned, _ = kmeans_centroids(corpus, k=4, iters=2)
    clustered = corpus.join(assigned, "vec_id")
    out = DD.semdedup(clustered, "vec_id", "embedding", "cid", threshold=0.9)
    planted = out.filter(F.col("id") >= 100000).collect()
    assert planted, "fixture must contain planted dups"
    for r in planted:
        assert not r["is_kept"], r
        assert r["nearest_earlier_sim"] == 1.0, r
    # keep-first: originals of the planted pairs survive unless they
    # themselves have an earlier >=0.9 neighbor — at minimum, SOME rows
    # are kept and kept+dropped partitions the corpus
    n_total = out.count()
    n_kept = out.filter(F.col("is_kept")).count()
    assert 0 < n_kept < n_total


def test_quantize_embeddings_roundtrip_error_bound(spark):
    """Int8 quantization contract: codes stay in [-127, 127] and the
    per-vector mean reconstruction error is below half a quantization
    step (scale/2 would be the worst case for round-to-nearest)."""
    from fintrack_etl_spark.queries_ext import x29_quantize_embeddings

    out = x29_quantize_embeddings(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        codes = [int(c) for c in r["q8_csv"].split(",")]
        assert all(-127 <= c <= 127 for c in codes), r["vec_id"]
        # mae_nano / scale_nano = mae/scale; round-to-nearest keeps
        # per-element error <= scale/2, so the mean must too
        assert r["mae_nano"] <= r["scale_nano"] / 2 + 1, r


def test_mmr_rerank_diversifies_near_dup_shortlist(spark):
    """Plant two tight clusters of candidates; plain top-k would return
    one cluster's copies back-to-back, MMR at λ=0.5 must interleave the
    clusters while rank 1 stays the most relevant item."""
    from fintrack_etl_spark.similarity import cosine_topk_bruteforce, mmr_rerank

    def vec(base, eps, dims=8):
        return [b + e for b, e in zip(base, eps)]

    a = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    q = [0.8, 0.6, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rows = [(0, q)]
    # cluster A (ids 1-3) slightly closer to q than cluster B (ids 4-6)
    for i, e in enumerate((0.00, 0.01, 0.02)):
        rows.append((1 + i, vec(a, [e] * 8)))
    for i, e in enumerate((0.00, 0.01, 0.02)):
        rows.append((4 + i, vec(b, [e] * 8)))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter("vec_id = 0")
    corpus = emb.filter("vec_id > 0")

    shortlist = cosine_topk_bruteforce(queries, corpus, k=6)
    plain = [r["neighbor_id"] for r in shortlist.orderBy("rnk").collect()]
    # relevance-only ordering clumps cluster A first
    assert set(plain[:3]) == {1, 2, 3}

    picked = mmr_rerank(shortlist, corpus, k=4, lam=0.5)
    ids = [p["neighbor_id"] for p in picked]
    assert len(ids) == 4 and len(set(ids)) == 4
    assert ids[0] == plain[0]  # rank 1 = pure relevance
    # diversity: the second pick must jump to the OTHER cluster
    assert ids[1] in {4, 5, 6}
    assert [p["rank"] for p in picked] == [1, 2, 3, 4]


def test_mmr_rerank_batch_matches_driver_loop(spark):
    """VERDICT r5 #7: the distributed applyInPandas batch face must be
    value-identical to the driver-side greedy loop, across multiple
    query groups with interleaved candidate sets."""
    import random

    from fintrack_etl_spark.similarity import (
        cosine_topk_bruteforce,
        mmr_rerank,
        mmr_rerank_batch,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter("vec_id < 3")
    corpus = emb.filter("vec_id >= 3")
    shortlist = cosine_topk_bruteforce(queries, corpus, k=10)

    serving = mmr_rerank(shortlist, corpus, k=4, lam=0.5)
    batch = mmr_rerank_batch(shortlist, corpus, k=4, lam=0.5).collect()
    key = lambda d: (d["query_id"], d["rank"])  # noqa: E731
    s_rows = sorted(
        ((p["query_id"], p["rank"], p["neighbor_id"], p["relevance"], p["mmr_score"]) for p in serving)
    )
    b_rows = sorted(
        ((r["query_id"], r["rank"], r["neighbor_id"], r["relevance"], r["mmr_score"]) for r in batch)
    )
    assert s_rows == b_rows and len(s_rows) == 12


def test_mmr_rerank_lambda_one_is_pure_relevance(spark):
    from fintrack_etl_spark.similarity import cosine_topk_bruteforce, mmr_rerank

    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(6)]) for i in range(6)],
        ["vec_id", "embedding"],
    )
    q = emb.filter("vec_id = 0")
    c = emb.filter("vec_id > 0")
    shortlist = cosine_topk_bruteforce(q, c, k=5)
    plain = [r["neighbor_id"] for r in shortlist.orderBy("rnk").collect()]
    picked = mmr_rerank(shortlist, c, k=5, lam=1.0)
    assert [p["neighbor_id"] for p in picked] == plain


def _mini_gif(indexes, w, h, palette, interlace=False, mcs=2):
    """Hand-build a GIF89a: clear-code-before-every-pixel LZW (valid
    per spec — the table reset keeps every code literal-width)."""
    import struct

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    codes = []
    for px in indexes:
        codes += [clear, px]
    codes.append(eoi)
    buf = nbits = 0
    data = bytearray()
    for c in codes:  # LSB-first packing
        buf |= c << nbits
        nbits += width
        while nbits >= 8:
            data.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        data.append(buf & 0xFF)
    gct_bits = mcs - 1  # global color table holds 2^(gct_bits+1) entries
    pal = b"".join(bytes(c) for c in palette)
    pal += bytes(3 * ((2 << gct_bits) - len(palette)))  # pad to table size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h) + bytes([0x80 | gct_bits, 0, 0]) + pal
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0, mcs])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_decode_gif_palette_and_interlace():
    """Real GIF decode: LSB-packed LZW, color-table lookup, and the
    4-pass interlace row order."""
    from fintrack_etl_spark.parse.minipng import decode_gif

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0]  # 2x4 image
    w, h, ct, px = decode_gif(_mini_gif(idx, 2, 4, palette))
    assert (w, h, ct) == (2, 4, 2)
    want = b"".join(bytes(palette[i]) for i in idx)
    assert px == want

    # interlaced: rows stored in pass order 0,4.. / 2.. / 1,3..;
    # h=4 -> storage order rows [0, 2, 1, 3]
    stored = [0, 1, 2, 3, 3, 2, 1, 0]
    w, h, ct, px2 = decode_gif(_mini_gif(stored, 2, 4, palette, interlace=True))
    rows = [px2[r * 6 : (r + 1) * 6] for r in range(4)]
    flat = b"".join(bytes(palette[i]) for i in stored)
    srows = [flat[r * 6 : (r + 1) * 6] for r in range(4)]
    assert rows[0] == srows[0] and rows[2] == srows[1]
    assert rows[1] == srows[2] and rows[3] == srows[3]


def test_decode_image_handles_gif(spark):
    from fintrack_etl_spark.multimodal import decode_image

    palette = [(10, 20, 30), (40, 50, 60), (0, 0, 0), (1, 1, 1)]
    blob = _mini_gif([0, 1, 1, 0], 2, 2, palette)
    media = spark.createDataFrame(
        [(1, "image", blob, None)],
        "media_id long, media_type string, content binary, meta map<string,string>",
    )
    row = decode_image(media).collect()[0]
    assert (row["width"], row["height"], row["mode"]) == (2, 2, "rgb")
    assert bytes(row["pixels"])[:3] == bytes((10, 20, 30))


def test_minipng_roundtrip_property():
    """Property: ANY raster survives encode→decode for every color
    type and a pseudorandom per-image filter schedule."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fintrack_etl_spark.parse.minipng import decode_png, encode_png

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 10),
        ct=st.sampled_from([0, 2, 4, 6]),
        seed=st.integers(0, 2**32 - 1),
    )
    def check(w, h, ct, seed):
        import random

        rng = random.Random(seed)
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        filters = [rng.randrange(5) for _ in range(h)]
        assert decode_png(encode_png(px, w, h, ct, filters)) == (w, h, ct, px)

    check()


def test_avi_codec_roundtrip_and_validation():
    """RIFF/AVI codec: encode→parse is identity (pixels, geometry,
    fps, frame count) across widths that do and don't need row
    padding; corrupt magic, idx1 tampering, and a truncated frame all
    raise instead of yielding garbage."""
    import random

    import pytest

    from fintrack_etl_spark.multimodal import encode_avi, parse_avi

    rng = random.Random(11)
    for w, h, n in [(8, 8, 1), (8, 8, 7), (9, 3, 4), (5, 7, 12), (1, 1, 3)]:
        frames = [bytes(rng.randrange(256) for _ in range(w * h)) for _ in range(n)]
        blob = encode_avi(frames, w, h, fps_rate=8)
        v = parse_avi(blob)
        assert v["frames"] == frames, (w, h, n)
        assert (v["width"], v["height"], v["n_frames"]) == (w, h, n)
        assert (v["fps_rate"], v["fps_scale"]) == (8, 1)

    blob = encode_avi([bytes(64)] * 3, 8, 8)
    with pytest.raises(AssertionError):
        parse_avi(b"RIFX" + blob[4:])
    # flip one idx1 offset byte → index/movi cross-check fires
    # (entry layout: 'idx1' + size + ckid at +8, flags +12, offset +16)
    i = blob.rfind(b"idx1")
    with pytest.raises(AssertionError, match="idx1"):
        parse_avi(blob[: i + 16] + bytes([blob[i + 16] ^ 0xFF]) + blob[i + 17 :])
    # declare one more frame than movi carries
    import struct

    j = blob.find(b"avih") + 8 + 16  # dwTotalFrames
    with pytest.raises(AssertionError):
        parse_avi(blob[:j] + struct.pack("<I", 4) + blob[j + 4 :])


def test_sample_avi_frames_real_codec_fanout(spark):
    """sample_avi_frames drives the real container parse inside
    mapInPandas: every 2nd frame comes back, pixels exact (top-down,
    unpadded), timestamps step by the frame period."""
    import pandas as pd

    from fintrack_etl_spark.multimodal import AVI_FRAME_SCHEMA, encode_avi, sample_avi_frames

    frames = [bytes([i] * 64) for i in range(10)]
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "content": [encode_avi(frames, 8, 8)]})
    )
    out = sorted(
        sample_avi_frames(media, every_n=2).collect(), key=lambda r: r["frame_no"]
    )
    assert [r["frame_no"] for r in out] == [0, 2, 4, 6, 8]
    assert [r["frame_ms"] for r in out] == [0, 250, 500, 750, 1000]
    assert all(r["n_frames"] == 10 and r["duration_ms"] == 1250 for r in out)
    assert [bytes(r["frame"]) for r in out] == [frames[i] for i in (0, 2, 4, 6, 8)]
    assert sample_avi_frames(media).schema == AVI_FRAME_SCHEMA


def test_sniff_avi_metadata():
    """Header sniff recognizes the AVI container and extracts
    geometry + duration from avih without decoding frames."""
    from fintrack_etl_spark.multimodal import _sniff_bytes, encode_avi

    out = _sniff_bytes(encode_avi([bytes(3 * 5)] * 16, 3, 5, fps_rate=8))
    assert out["format"] == "avi"
    assert (out["width"], out["height"]) == (3, 5)
    assert out["duration_ms"] == 2000.0
    assert out["sniff_error"] is None


def test_sentence_stats_pinned_values(spark):
    """sentence_stats: segmentation, syllable heuristic (vowel groups
    + no-vowel floor), and the integer Flesch score on known text."""
    from fintrack_etl_spark.textops import sentence_stats

    rows = [
        # "the cat sat. xyz!" -> 2 sentences, 4 words,
        # syllables: the(1) cat(1) sat(1) xyz(0 -> floor 1) = 4
        (1, "the cat sat. xyz!"),
        # no terminator -> 1 sentence; "queue" = 2 vowel groups (ueue
        # is one run? q-ueue: 'ueue' is a single maximal run -> 1)
        (2, "queue"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in sentence_stats(df).collect()}
    assert got[1]["n_sentences"] == 2
    assert got[1]["n_words"] == 4
    assert got[1]["n_syllables"] == 4
    # 206835 - 1015*4/2*1000/1000 - 84600*4/4 = 206835 - 2030 - 84600
    assert got[1]["flesch_milli"] == 206835 - 2030 - 84600
    assert got[2]["n_sentences"] == 1
    assert got[2]["n_words"] == 1
    assert got[2]["n_syllables"] == 1


def test_sentence_stats_rewrite_matches_hof(spark):
    """The r11 compiled-regex forms must equal the interpreted filter
    HOFs they replaced, on every edge the rewrite note claims:
    tab-only segments (trim strips spaces ONLY — both count them as
    sentences), adjacent terminators (empty segments dropped),
    space-only segments (dropped), leading/trailing separators (split
    keeps the empty tokens; they are no-vowel words in both forms),
    multi-vowel-group words, all-consonant words, and NULL text."""
    from pyspark.sql import functions as F

    from fintrack_etl_spark.textops import sentence_stats

    rows = [
        (1, "the cat sat. xyz!"),
        (2, "a.. b!? . c"),          # adjacent terminators, space segs
        (3, "x.\t.y"),               # tab-only segment between dots
        (4, "\trhythm myth\t"),      # no-vowel words + empty tokens
        (5, "queueing rhythms. ."),
        (6, None),
        (7, ""),
        (8, " . ! ? "),              # only space segments
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in sentence_stats(df).collect()}

    # the pre-r11 HOF forms, verbatim
    t = F.lower(F.col("text"))
    sent_hof = F.greatest(
        F.expr("size(filter(split(lower(text), '[.!?]+'), s -> length(trim(s)) > 0))"),
        F.lit(1),
    )
    n_words = F.size(F.split(F.trim(t), r"\s+"))
    vg = F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
    nv_hof = F.expr(
        "size(filter(split(trim(lower(text)), '\\\\s+'), w -> NOT (w RLIKE '[aeiouy]')))"
    )
    want = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            sent_hof.cast("long").alias("n_sentences"),
            n_words.cast("long").alias("n_words"),
            (vg + nv_hof).cast("long").alias("n_syllables"),
        ).collect()
    }
    for d, w in want.items():
        g = got[d]
        assert (g["n_sentences"], g["n_words"], g["n_syllables"]) == (
            w["n_sentences"], w["n_words"], w["n_syllables"],
        ), (d, g, w)


def test_bm25_ranks_rare_terms_above_common(spark):
    """BM25: a term appearing in one doc outranks one in every doc;
    length normalization discounts tf in long docs."""
    from fintrack_etl_spark.textops import bm25_topk

    rows = [
        (1, "common rare common xx yy"),
        (2, "common aa bb cc dd"),
        (3, "common ee ff gg hh"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    top = {
        (r["doc_id"], r["rnk"]): (r["term"], r["score"])
        for r in bm25_topk(df, k=5).collect()
    }
    # doc 1 has 4 distinct terms: 'rare' (df=1) must beat 'common'
    # (df=3) despite common's higher tf (2 vs 1)
    d1 = [top[(1, i)][0] for i in range(1, 5)]
    assert d1.index("rare") < d1.index("common")
    # scores positive and ranked by score desc
    scores = [top[(1, i)][1] for i in range(1, 5)]
    assert all(s > 0 for s in scores) and scores == sorted(scores, reverse=True)


def test_prefix_filter_completeness_vs_unfiltered(spark):
    """PPJoin completeness: prefix-filtered output EQUALS the
    unfiltered exact join at the same threshold — including on the
    adversarial boilerplate corpus where every doc shares hot
    shingles (which must stay out of the prefix join keys)."""
    for df in (docs_df(spark), boilerplate_docs_df(spark, n_docs=30)):
        want = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.3).collect()
        }
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in DD.prefix_filter_pairs(df, "doc_id", "text", 3, 0.3).collect()
        }
        assert got == want


def test_prefix_filter_prunes_hot_keys(spark):
    """At tight thresholds the prefix is short and rarity-ordered, so
    boilerplate shingles stay OUT of the join keys: on the 30-doc
    boilerplate corpus the unfiltered join compares every pair (435);
    the t=0.6 prefix join's candidate count collapses to the docs
    actually sharing rare shingles. (At loose thresholds the prefix
    legitimately grows to include hot shingles — that is what
    completeness costs; the equality test above covers t=0.3.)"""
    from pyspark.sql import functions as F

    df = boilerplate_docs_df(spark, n_docs=30)
    # reproduce the internal candidate stage to count it
    sh = DD._shingled(df, "doc_id", "text", 3)
    ex = sh.select("id", F.explode("sh").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    arr = (
        ex.join(dfreq, "s")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "s"))).alias("arr"))
        .select("id", F.size("arr").alias("sz"),
                F.transform("arr", lambda x: x.getField("s")).alias("ordered"))
    )
    t = 0.6
    pref = arr.select(
        "id",
        F.explode(
            F.slice("ordered", 1, (F.col("sz") - F.ceil(F.col("sz") * t) + 1).cast("int"))
        ).alias("s"),
    )
    cand = (
        pref.alias("a").join(pref.alias("b"), "s")
        .filter(F.col("a.id") < F.col("b.id"))
        .select("a.id", "b.id").distinct().count()
    )
    assert cand <= 5  # vs 435 all-pairs


def test_dsir_select_prefers_target_like_docs(spark):
    # Target docs speak "alpha beta gamma"; pool doc 10 mimics them,
    # pool doc 11 is off-distribution — 10 must outscore 11.
    rows = [
        (1, "alpha beta gamma alpha beta", True),
        (2, "alpha gamma beta gamma", True),
        (10, "alpha beta gamma beta", False),
        (11, "zeta eta theta iota kappa", False),
        (12, "alpha zeta beta eta", False),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    out = TX.dsir_select(df, F.col("is_t"), k=3, n_buckets=64)
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    assert set(got) == {10, 11, 12}  # target rows never selected
    assert got[10] > got[12] > got[11]


def test_dsir_select_scores_are_exact_integers(spark):
    rows = [(i, f"w{i % 3} w{i % 5} common", i % 2 == 0) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    out = TX.dsir_select(df, F.col("is_t"), k=5, n_buckets=32).collect()
    assert len(out) == 5
    for r in out:
        assert isinstance(r["score"], int) and r["score"] > 0
    # deterministic: re-run yields the identical selection
    out2 = TX.dsir_select(df, F.col("is_t"), k=5, n_buckets=32).collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in out2]


def test_phrase_search_finds_top_trigram_occurrences(spark):
    rows = [
        (1, "a b c a b c x"),     # "a b c" twice, first at 0
        (2, "z a b c z"),         # once at 1
        (3, "no match here at all"),
        (4, "a b"),               # too short for a trigram
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in TX.phrase_search(df, n=3).collect()}
    assert set(out) == {1, 2}
    assert out[1]["phrase"] == "a b c"
    assert out[1]["n_matches"] == 2 and out[1]["first_pos"] == 0
    assert out[2]["n_matches"] == 1 and out[2]["first_pos"] == 1
    assert out[1]["n_total"] == 3


def test_phrase_search_argmax_tiebreak_is_lexicographic(spark):
    # "a a b" and "a b a" both appear exactly once → gram asc wins.
    df = spark.createDataFrame([(1, "a a b a")], ["doc_id", "text"])
    out = TX.phrase_search(df, n=3).collect()
    assert len(out) == 1 and out[0]["phrase"] == "a a b"


def test_rrf_fusion_blends_both_rankers(spark, sf_dir):
    from fintrack_etl_spark.queries_ext import x74_rrf_fusion

    rows = x74_rrf_fusion(spark, sf_dir).collect()
    assert len(rows) == 10
    # fused order is strictly by rrf_nano desc (ties by id)
    scores = [r["rrf_nano"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # a doc ranked by BOTH rankers must outscore one ranked by only
    # one at the same positions — check additivity of the formula
    for r in rows:
        expect = 0
        if r["lex_rnk"] is not None:
            expect += 1_000_000_000 // (60 + r["lex_rnk"])
        if r["dense_rnk"] is not None:
            expect += 1_000_000_000 // (60 + r["dense_rnk"])
        assert r["rrf_nano"] == expect
    # both rankers contribute at least one doc to the fused head
    assert any(r["lex_rnk"] is not None for r in rows)
    assert any(r["dense_rnk"] is not None for r in rows)


def test_pcm_fingerprint_short_inputs_yield_empty_not_crash(spark):
    # sequence(0, n-1) with n == 0 is DESCENDING [0, -1] in Spark —
    # unguarded, any row under one frame (or one chunk of words)
    # indexed out of bounds (round-5 ADVICE). 5/12/39 samples cover:
    # sub-frame, sub-two-frames (no words), and sub-chunk word counts.
    from fintrack_etl_spark.multimodal import pcm_fingerprint

    rows = [
        (1, list(range(5))),          # < 1 frame  -> no energies
        (2, list(range(12))),         # 1 frame    -> no derivative words
        (3, list(range(39))),         # 4 words    -> still < chunk_frames=8
        (4, list(range(100))),        # 12 frames / 11 words -> 1 chunk
        (5, []),                      # empty array
    ]
    df = spark.createDataFrame(rows, ["media_id", "samples"])
    got = {r["media_id"]: r for r in pcm_fingerprint(df, chunk_frames=8).collect()}
    assert len(got) == 5  # no rows dropped, none crashed
    for mid in (1, 2, 3, 5):
        assert got[mid]["chunks"] == []
    assert len(got[4]["chunks"]) == 1
    assert got[4]["n_frames"] == 12


def test_fingerprint_match_pairs_finds_planted_twin(spark):
    from fintrack_etl_spark.multimodal import fingerprint_match_pairs, pcm_fingerprint

    base = [((i * 37) % 97) - 48 for i in range(256)]
    twin = [v + (1 if i % 7 == 0 else 0) for i, v in enumerate(base)]
    other = [((i * 53 + 11) % 89) - 44 for i in range(256)]
    df = spark.createDataFrame(
        [(1, base), (2, twin), (3, other)], ["media_id", "samples"]
    )
    fps = pcm_fingerprint(df, chunk_frames=4)
    pairs = fingerprint_match_pairs(fps, max_hamming=6).collect()
    assert any(r["id_a"] == 1 and r["id_b"] == 2 for r in pairs)
    assert not any({r["id_a"], r["id_b"]} == {1, 3} for r in pairs)
    # different-length fingerprints can never pair
    df2 = spark.createDataFrame(
        [(1, base), (2, base[:128])], ["media_id", "samples"]
    )
    pairs2 = fingerprint_match_pairs(pcm_fingerprint(df2, chunk_frames=4)).collect()
    assert pairs2 == []


def test_substring_dedup_finds_cross_doc_spans(spark):
    from fintrack_etl_spark.operators.dedup_text import substring_dedup

    shared = "X" * 10 + "SHAREDSPANSHAREDSPANSHAREDSPAN" + "Y" * 10  # 30-char core
    rows = [
        (1, shared),                         # shares the core with 2
        (2, "A" * 25 + shared[10:40] + "B" * 25),
        (3, "z" * 80),                       # unique (z-run only in doc 3)
        (4, "too short"),                    # < gram_len -> zero grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in substring_dedup(df, gram_len=30).collect()}
    assert set(out) == {1, 2, 3, 4}
    # docs 1 and 2 share exactly the 30-char core: one shared gram each,
    # covering exactly 30 chars
    assert out[1]["n_shared_grams"] == 1 and out[1]["covered_chars"] == 30
    assert out[2]["n_shared_grams"] == 1 and out[2]["covered_chars"] == 30
    assert out[3]["n_shared_grams"] == 0 and out[3]["covered_chars"] == 0
    assert out[4]["n_shared_grams"] == 0 and out[4]["n_chars"] == 9
    # identical twin docs -> full coverage; a NON-PERIODIC body makes
    # every window a distinct gram value (n - L + 1 of them)
    import string

    body = (string.ascii_letters + string.digits)[:60]
    twins = spark.createDataFrame(
        [(1, body), (2, body)], ["doc_id", "text"]
    )
    t = {r["doc_id"]: r for r in substring_dedup(twins, gram_len=30).collect()}
    assert t[1]["covered_chars"] == t[1]["n_chars"] == 60
    assert t[1]["n_shared_grams"] == 60 - 30 + 1


def test_rle8_codec_roundtrip_all_modes():
    import random

    from fintrack_etl_spark.multimodal import (
        encode_avi,
        parse_avi,
        rle8_decode,
        rle8_encode,
    )

    random.seed(11)
    frames = [
        bytes(random.choice([0, 0, 0, 128, 255]) for _ in range(8 * 8))
        for _ in range(5)
    ]
    blob = parse_avi(encode_avi(frames, 8, 8, codec="rle8"))
    assert blob["codec"] == "rle8" and blob["frames"] == frames
    assert len(blob["frame_bytes"]) == 5
    # flat frames compress: run-length beats the raw DIB payload
    flat = [bytes([7]) * 64 for _ in range(4)]
    v = parse_avi(encode_avi(flat, 8, 8, codec="rle8"))
    assert v["frames"] == flat
    assert all(fb == 34 for fb in v["frame_bytes"])  # 8 rows x (2+2) + EOB
    # foreign stream: absolute mode (word-padded), delta skip, EOL/EOB
    data = bytes(
        [0, 3, 1, 2, 3, 0, 0, 2, 2, 1, 2, 9, 0, 0, 0, 1]
    )
    f = rle8_decode(data, 8, 2)
    assert f[8:11] == bytes([1, 2, 3])  # absolute pixels on the bottom row
    assert f[5:7] == bytes([9, 9])  # delta skipped to row 1, x=5
    # malformed streams raise instead of yielding garbage
    import pytest as _pt

    with _pt.raises(ValueError):
        rle8_decode(bytes([200, 5, 0, 1]), 8, 2)  # run past row end
    with _pt.raises(ValueError):
        rle8_decode(bytes([2, 5]), 8, 2)  # missing end-of-bitmap


def test_rle8_vectorized_matches_loop():
    """The r11 vectorized encode/decode fast paths must be
    byte-identical to the per-frame loops on every accepted shape, and
    must REFUSE (None → caller falls back) every stream shape the
    four-mode loop decoder owns."""
    import random

    from fintrack_etl_spark.multimodal import (
        _rle8_decode_many,
        _rle8_encode_many,
        rle8_decode,
        rle8_encode,
    )

    random.seed(23)
    for w, h, nf in [(8, 8, 5), (1, 1, 3), (255, 4, 2), (13, 7, 4), (8, 8, 1)]:
        frames = [
            bytes(random.choice([0, 0, 0, 5, 9, 255]) for _ in range(w * h))
            for _ in range(nf)
        ]
        fast = _rle8_encode_many(frames, w, h)
        loop = [rle8_encode(f, w, h) for f in frames]
        assert fast == loop, (w, h, nf)
        dec = _rle8_decode_many(loop, w, h)
        assert dec == [rle8_decode(b, w, h) for b in loop] == frames, (w, h, nf)

    # width > 255 needs run capping: encoder must decline
    wide = [bytes([3]) * 300]
    assert _rle8_encode_many(wide, 300, 1) is None
    # decoder declines everything the loop owns: absolute mode,
    # delta skip, odd-size stream, early EOB, short row (zero-fill)
    absolute = bytes([0, 3, 1, 2, 3, 0, 0, 0, 8, 7, 0, 0, 0, 1])
    assert _rle8_decode_many([absolute], 3, 2) is None
    delta = bytes([0, 2, 1, 1, 2, 9, 0, 0, 0, 0, 0, 1])
    assert _rle8_decode_many([delta], 2, 2) is None
    assert _rle8_decode_many([bytes([2, 5, 0])], 2, 1) is None
    early_eob = bytes([2, 5, 0, 1, 0, 0])
    assert _rle8_decode_many([early_eob], 2, 1) is None
    short_row = bytes([1, 5, 0, 0, 0, 1])  # 1 of 2 px, rest zero-fill
    assert _rle8_decode_many([short_row], 2, 1) is None
    # ...and the loop decoder remains authoritative for those shapes
    assert rle8_decode(short_row, 2, 1) == bytes([5, 0])


def test_adpcm_codec_contracts():
    import math

    from fintrack_etl_spark.multimodal import (
        _ADPCM_SAMPLES_PER_BLOCK,
        _ima_step,
        encode_wav_adpcm,
        parse_wav_adpcm,
    )

    # exact IMA state-machine vector: (pred=0, idx=0, code=7)
    # step=7 -> vpdiff = 0 + 7 + 3 + 1 = 11, index += 8
    assert _ima_step(0, 0, 7) == (11, 8)
    assert _ima_step(0, 0, 15) == (-11, 8)      # sign bit
    # code 0 at index 20 (step 50): vpdiff = 50 >> 3 = 6, index -1
    assert _ima_step(100, 20, 0) == (106, 19)
    # clamps
    assert _ima_step(32760, 88, 7)[0] == 32767
    assert _ima_step(0, 0, 0)[1] == 0           # index floor

    # smooth-signal roundtrip: steady-state tracking after adaptation
    n = 1600
    sig = [int(8000 * math.sin(2 * math.pi * 100 * i / 8000)) for i in range(n)]
    out = parse_wav_adpcm(encode_wav_adpcm(sig))
    assert out["n_samples"] == n and out["sample_rate"] == 8000
    err = [a - b for a, b in zip(sig, out["samples"])]
    ps = sum(x * x for x in sig) / n
    pe = max(sum(x * x for x in err) / n, 1e-9)
    assert 10 * math.log10(ps / pe) > 25, "ADPCM SNR below spec-typical range"
    # steady state (post-adaptation) error stays within a few steps
    assert max(abs(e) for e in err[200:]) < 2500

    # block anchors are EXACT (header stores the first sample verbatim)
    spb = _ADPCM_SAMPLES_PER_BLOCK
    big = sig * 2
    dec = parse_wav_adpcm(encode_wav_adpcm(big))["samples"]
    for b in range(0, len(big), spb):
        assert dec[b] == big[b], f"block anchor at {b} not exact"

    # 4:1-class compression: data chunk = 256 bytes per 505 samples
    v = parse_wav_adpcm(encode_wav_adpcm(big))
    assert v["data_bytes"] == 256 * ((len(big) + spb - 1) // spb)


def test_suffix_ranks_exact_small(spark):
    from fintrack_etl_spark.operators.suffix import suffix_ranks

    # "banana": suffix array is a classic worked example
    df = spark.createDataFrame([(1, "banana")], ["doc_id", "text"])
    got = {r["p"]: r["srank"] for r in suffix_ranks(df, bound=8).collect()}
    # suffixes sorted: a(5) < ana(3) < anana(1) < banana(0) < na(4) < nana(2)
    assert got == {5: 1, 3: 2, 1: 3, 0: 4, 4: 5, 2: 6}
    # equal bounded suffixes SHARE a dense rank (the dedup contract)
    df2 = spark.createDataFrame(
        [(1, "xxabcdef"), (2, "yyabcdef")], ["doc_id", "text"]
    )
    got2 = {(r["doc_id"], r["p"]): r["srank"] for r in suffix_ranks(df2, bound=8).collect()}
    assert got2[(1, 2)] == got2[(2, 2)]  # both 'abcdef'
    assert got2[(1, 0)] != got2[(2, 0)]  # 'xxabcdef' vs 'yyabcdef'


def test_substring_dedup_against_store_probe_only_scans_batch(spark):
    from fintrack_etl_spark.operators.dedup_text import (
        gram_store,
        substring_dedup_against_store,
    )

    import string

    body = (string.ascii_letters + string.digits)[:60]
    corpus = spark.createDataFrame(
        [(1, body), (2, "z" * 80)], ["doc_id", "text"]
    )
    store = gram_store(corpus, gram_len=30)
    batch = spark.createDataFrame(
        [
            (10, body),             # exact re-crawl -> full coverage
            (11, "Q" * 25 + body[:30] + "W" * 5),  # one stored gram inside
            (12, "fresh and unseen content x" * 4),  # no hits
            (13, "short"),          # < gram_len
        ],
        ["doc_id", "text"],
    )
    out = {
        r["batch_id"]: r
        for r in substring_dedup_against_store(batch, store, gram_len=30).collect()
    }
    assert out[10]["covered_chars"] == out[10]["n_chars"] == 60
    assert out[10]["n_hit_grams"] == 31
    assert out[11]["n_hit_grams"] == 1 and out[11]["covered_chars"] == 30
    assert out[12]["n_hit_grams"] == 0 and out[12]["covered_chars"] == 0
    assert out[13]["n_hit_grams"] == 0 and out[13]["n_chars"] == 5


def test_winnowing_guarantee_and_density(spark):
    """The winnowing contract (SIGMOD 2003): any shared substring of
    length >= w + k - 1 produces at least one shared SELECTED
    fingerprint, at ~2/(w+1) density — checked on the fast xxhash64
    production path (the gate's md5 path re-checks selection logic
    value-for-value against DuckDB)."""
    import random
    import string

    from fintrack_etl_spark.textops import winnow_fingerprints

    rng = random.Random(3)

    def rand_text(n):
        return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))

    shared = rand_text(27)  # exactly w + k - 1 with k=20, w=8
    a = rand_text(100) + shared + rand_text(100)
    b = rand_text(80) + shared + rand_text(120)
    c = rand_text(260)
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    fps = winnow_fingerprints(df, k=20, w=8).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["id"], set()).add(r["fp"])
    # guarantee: docs 1 and 2 share at least one selected fingerprint
    assert by_doc[1] & by_doc[2], "winnowing guarantee violated"
    # density: ~2/(w+1) of gram positions selected (loose 3x bounds)
    n_grams = len(a) - 20 + 1
    n_sel = sum(1 for r in fps if r["id"] == 1)
    assert n_grams / 9 / 3 < n_sel < n_grams / 9 * 3
    # unrelated doc shares nothing with either (random 27-gram clash ~0)
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))


def test_suffix_ranks_empty_and_degenerate_docs(spark):
    """ADVICE r5: an empty text made sequence(0, size-1) descend to
    [0, -1] and the p = -1 element raised inside slice() — the guard
    must keep empty/whitespace docs from failing the whole query."""
    from fintrack_etl_spark.operators.suffix import suffix_ranks

    df = spark.createDataFrame(
        [(1, "banana"), (2, ""), (3, "a")], ["doc_id", "text"]
    )
    rows = suffix_ranks(df, bound=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc  # empty doc contributes no positions, no error
    assert len(by_doc[1]) == 6 and len(by_doc[3]) == 1
    # the non-4*2^n bound contract is now explicit
    import pytest as _pytest

    with _pytest.raises(ValueError, match="power of two"):
        suffix_ranks(df, bound=48)


def test_winnow_fingerprints_long_document_radix(spark):
    """ADVICE r5: the packed (hash, pos) form used radix 1024, so any
    document past ~1 Ki grams silently wrapped pos into the hash field.
    The 2^20 radix must keep positions exact for long documents."""
    from fintrack_etl_spark.textops import winnow_fingerprints

    text = ("abcdefghij" * 300) + "qzqzqzqzqzqzqzqzqzqzqzqzqzq"  # 3027 chars
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = winnow_fingerprints(df, k=20, w=8).collect()
    n_grams = len(text) - 20 + 1
    assert rows, "no fingerprints selected"
    # every selected position must be a REAL gram index (> 1024 exists)
    assert all(0 <= r["pos"] < n_grams for r in rows)
    assert max(r["pos"] for r in rows) > 1024


def test_prefix_filter_short_docs_emit_no_pairs(spark):
    """Sub-n-token docs have EMPTY shingle sets (textops.shingles is
    total) and must not pair with anything — in particular the
    exact-set collapse must not group two short docs into a bogus
    intra-group J=1 pair (round-7 review finding)."""
    rows = [
        (1, "tiny doc"),                      # 2 tokens -> no 3-grams
        (2, "also small"),                    # 2 tokens -> no 3-grams
        (3, "one two three four five six"),
        (4, "one two three four five six"),   # true exact dup of 3
        (5, ""),                              # empty text
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.prefix_filter_pairs(df, "doc_id", "text", 3, 0.6).collect()
    }
    assert got == {(3, 4): 1.0}


def test_ngram_jaccard_collapse_semantics(spark):
    """The round-8 collapse retrofit: ngram_jaccard_pairs now shares
    prefix_filter_pairs' exact-set collapse, so (a) identical shingle
    sets emit intra-group pairs at exactly J=1.0, (b) a collapsed
    group's near-dup match expands to EVERY member with the same
    jaccard, (c) short/empty docs still pair with nothing, and (d) the
    guarded path (max_df) agrees — all four on one fixture."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
        (3, "alpha beta gamma delta epsilon eta"),    # near-dup of 1/2
        (4, "tiny doc"),                              # no 3-grams
        (5, ""),                                      # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want_keys = {(1, 2), (1, 3), (2, 3)}
    for max_df in (None, 10):
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in DD.ngram_jaccard_pairs(
                df, "doc_id", "text", 3, 0.5, max_df=max_df
            ).collect()
        }
        assert set(got) == want_keys, (max_df, got)
        assert got[(1, 2)] == 1.0
        # docs 1 and 3 share 3 of 5 shingles: J = 3/(4+4-3) = 0.6, and
        # the expansion must give doc 2 the identical value
        assert got[(1, 3)] == got[(2, 3)] == 0.6


def test_df_guard_boundary_vs_prefix_filter(spark):
    """The df-guard's documented-and-now-MEASURED miss class (r8 20×
    probe): when a true near-dup pair's ENTIRE overlap sits above the
    hot line — here a 7-doc template family whose shared shingles span
    ALL 7 docs (100 % of the corpus, so the 1 %-of-representatives
    default frac judges them boilerplate too) and whose only rare
    shingle is unique per doc — the guarded join emits NOTHING while
    prefix filtering (theorem-complete at the threshold) finds every
    pair, identical to the unguarded join. Since r9 this is the STATED
    density contract of the guard (a "family" at 100 % corpus density
    IS boilerplate by the guard's definition), no longer a silent
    replication boundary — `test_df_guard_default_is_dup_safe` pins
    the case the default must now get right."""
    rows = [
        (i, f"c1 c2 c3 c4 c5 c6 t{i}") for i in range(7)
    ]  # 5 shingles each: 4 shared (df=7), 1 unique; J = 4/6 per pair
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    complete = {
        (r["doc_a"], r["doc_b"])
        for r in DD.prefix_filter_pairs(df, "doc_id", "text", 3, 0.6).collect()
    }
    assert len(complete) == 21  # C(7,2), every pair at J = 0.6666

    unguarded = {
        (r["doc_a"], r["doc_b"])
        for r in DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.6).collect()
    }
    assert unguarded == complete

    guarded = DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.6, max_df=3).count()
    assert guarded == 0  # entire overlap sits above BOTH cap terms


def test_df_guard_default_is_dup_safe(spark):
    """VERDICT r8 #2: the DEFAULT guarded call path (max_df alone, no
    opt-in) must survive the probe-measured replication boundary. A
    dup family whose shingle df crosses the absolute cap but stays
    under 1 % of the corpus is NOT boilerplate: the df profile sees
    the (max_df, frac·N] band occupied and ROUTES the call to the
    theorem-complete prefix-filter join, so every family pair is found
    — at base scale AND at 2× replication (the absolute cap alone,
    max_df_frac=0.0, never profiles, never routes, and silently drops
    them at both). True boilerplate (df = 100 % of docs) is above both
    cap terms throughout — the default keeps its skew valve while
    gaining completeness. The routing decision itself is asserted via
    ``_frac_cap_bites`` at both scales."""

    def corpus(reps_per_family: int):
        # 3 dup families × reps edited replicas, padded with enough
        # singleton filler docs that each family is < 1 % of the
        # corpus (the probe geometry: dup factor ≫ max_df in absolute
        # terms, tiny as a corpus fraction). Every doc carries the 4
        # true-boilerplate shingles (df = N); each family doc adds a
        # family shingle (df = reps > max_df) and a unique tail.
        fam = [
            (i * 1000 + r, f"c1 c2 c3 c4 c5 c6 t{i} u{i}_{r}")
            for i in range(3)
            for r in range(reps_per_family)
        ]
        n_fill = 350 * reps_per_family // 2  # keeps family frac < 1 %
        fill = [
            (900_000 + j, f"c1 c2 c3 c4 c5 c6 f{j} g{j}") for j in range(n_fill)
        ]
        return spark.createDataFrame(fam + fill, ["doc_id", "text"])

    for reps in (2, 4):  # 2× "replication" of the same corpus shape
        df = corpus(reps)
        # within a family: 5 of 7 shingles shared -> J = 5/7 >= 0.6;
        # across families / vs filler: 4 of 8 -> J = 0.5 < 0.6
        complete = {
            (r["doc_a"], r["doc_b"])
            for r in DD.prefix_filter_pairs(df, "doc_id", "text", 3, 0.6).collect()
        }
        assert len(complete) == 3 * reps * (reps - 1) // 2

        # the profile sees family shingles in (1, 0.01·N] -> route
        # (_frac_cap_bites consumes the PRE-AGGREGATED doc-frequency
        # table since the ADVICE-r9 reuse fix — the caller builds it
        # once and shares it with stop_shingles)
        _, sh = DD._collapsed_rep_sets(df, "doc_id", "text", 3)
        ex = sh.select("id", F.explode("sh").alias("s"))
        df_tab = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        assert DD._frac_cap_bites(df_tab, sh, 1, DD.DEFAULT_MAX_DF_FRAC)
        # ...and with a floor above the dup factor the band is empty
        assert not DD._frac_cap_bites(df_tab, sh, reps, DD.DEFAULT_MAX_DF_FRAC)

        # the DEFAULT path: absolute cap 1 < family df, routing saves it
        default_pairs = {
            (r["doc_a"], r["doc_b"])
            for r in DD.ngram_jaccard_pairs(
                df, "doc_id", "text", 3, 0.6, max_df=1
            ).collect()
        }
        assert default_pairs == complete, (reps, default_pairs)

        # explicit opt-out reproduces the pre-r9 silent drop
        assert (
            DD.ngram_jaccard_pairs(
                df, "doc_id", "text", 3, 0.6, max_df=1, max_df_frac=0.0
            ).count()
            == 0
        )


def test_df_guard_empty_hot_set_skips_guard_subplan(spark):
    """r11 optimization pin: when the one-job profile proves NO
    shingle exceeds the absolute cap, the guard's hot set is empty and
    the anti-join / per-doc hot-set collection / per-pair
    array_intersect are algebraic no-ops — the guarded call must skip
    that whole subplan (shape pinned: no LeftAnti join, no collect_set
    aggregate in the physical plan) while keeping the ``df_guard``
    route marker and values identical to the plain exact self-join
    (trivially so: an empty hot set drops nothing and contributes 0 to
    every intersection)."""
    # 3 near-dups (4 of 6 shingles shared -> J = 2/3 >= 0.6; shared
    # shingle df = 3, far under the cap) + unique filler docs.
    rows = [(i, f"x y z w q v t{i}") for i in range(3)]
    rows += [(100 + j, f"a{j} b{j} c{j} d{j} e{j} f{j}") for j in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    plain = DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.6)
    guarded = DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.6, max_df=100)
    assert DD.jaccard_route(guarded) == "df_guard"

    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan, plan
    assert "collect_set" not in plan, plan

    want = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in plain.collect()}
    assert len(want) == 3  # the 3 near-dup pairs
    got = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in guarded.collect()}
    assert got == want


def test_jaccard_route_marker_all_branches(spark):
    """VERDICT r10 #5: ngram_jaccard_pairs is SELF-DESCRIBING — the
    branch taken rides the result's ``doc_a`` column metadata
    (``jaccard_route`` reads it back), so downstream consumers can
    tell which miss-class contract their pairs carry. The marker is
    metadata, not a column: schema and values are untouched, and on
    this corpus (no hot-overlap-only pairs at the guard cap) all three
    branches agree pair-for-pair."""
    docs = [
        (i * 1000 + r, f"c1 c2 c3 c4 c5 c6 t{i} u{i}_{r}")
        for i in range(3)
        for r in range(4)
    ] + [(900_000 + j, f"c1 c2 c3 c4 c5 c6 f{j} g{j}") for j in range(700)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    # no guard requested -> exact self-join, no miss class
    plain = DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.6)
    assert DD.jaccard_route(plain) == "exact_self_join"

    # family shingle df=4 sits in the (1, 0.01·N] band -> routed
    routed = DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.6, max_df=1)
    assert DD.jaccard_route(routed) == "routed_prefix_filter"

    # floor at the dup factor empties the band -> classic df guard
    guarded = DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.6, max_df=4)
    assert DD.jaccard_route(guarded) == "df_guard"

    want = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in plain.collect()}
    assert len(want) == 3 * (4 * 3 // 2)  # the 18 within-family pairs
    assert {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in routed.collect()} == want
    assert {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in guarded.collect()} == want
    assert [f.name for f in routed.schema.fields] == ["doc_a", "doc_b", "jaccard"]

    # a frame that merely HAS a doc_a column reads as unmarked
    assert DD.jaccard_route(df.select(F.col("doc_id").alias("doc_a"))) is None


def test_df_guard_frac_is_replication_invariant(spark):
    """The fix for the measured boundary: ``max_df_frac`` draws the
    dup-vs-boilerplate line as a corpus fraction, which replication
    cannot cross — a family shingle's df and the corpus size scale
    together (exact-rational compare), so the profile's routing
    decision is identical at every scale, while true boilerplate
    (df = 100 % of docs here) stays above the line. The same absolute
    cap that drops EVERY pair keeps dropping them at both scales
    (opt-out path); the same frac setting finds the complete pair set
    at both (the occupied band routes to the prefix-filter join)."""

    def family_corpus(n_reps: int):
        # 7 template families × n_reps EDITED replicas (distinct
        # shingle sets — the collapse cannot merge them, like the 20×
        # probe corpus). Per doc: 4 core shingles shared by ALL docs
        # (true boilerplate), 1 family shingle (df = n_reps), 1 unique.
        # Within a family: J = 5/7 ≥ 0.6; across: J = 4/8 < 0.6.
        rows = [
            (i * 100 + r, f"c1 c2 c3 c4 c5 c6 t{i} u{i}_{r}")
            for i in range(7)
            for r in range(n_reps)
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    for n_reps in (4, 8):  # the "replication" lever: 28 → 56 docs
        df = family_corpus(n_reps)
        complete = {
            (r["doc_a"], r["doc_b"])
            for r in DD.prefix_filter_pairs(df, "doc_id", "text", 3, 0.6).collect()
        }
        assert len(complete) == 7 * n_reps * (n_reps - 1) // 2

        # absolute cap 3: family shingle df (= n_reps > 3) is "hot", so
        # every family pair's entire overlap is hot — nothing emitted
        assert (
            DD.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.6, max_df=3).count()
            == 0
        )

        # SAME settings plus frac 0.5: cap = ceil(0.5 · 7·n_reps) —
        # prunes the 4 everywhere-shingles (df = N), keeps the family
        # shingle (df = N/7), finds the complete set at BOTH scales
        frac_pairs = {
            (r["doc_a"], r["doc_b"])
            for r in DD.ngram_jaccard_pairs(
                df, "doc_id", "text", 3, 0.6, max_df=3, max_df_frac=0.5
            ).collect()
        }
        assert frac_pairs == complete


def test_quantize_batches_matches_hof(spark):
    """x29's Arrow kernel must equal the Column-HOF form bit-for-bit
    on the shapes its docstring argues parity for: exact half-way
    codes (positive and negative, HALF_UP = away from zero),
    shortest-repr traps (2.675 is really 2.67499…), values at the
    ±127 boundary, mixed-sign vectors, and NULL embedding (NULL
    audits, empty q8_csv)."""
    from pyspark.sql import functions as F

    from fintrack_etl_spark.queries_ext import quantize_embeddings_array
    from fintrack_etl_spark.similarity import quantize_batches

    rows = [
        (1, "a", [127.0, -127.0, 63.5, -63.5, 0.0]),   # scale 1.0: exact halves
        (2, "b", [2.675, -2.675, 1.0, 254.0]),          # scale 2.0: shortest-repr trap
        (3, "c", [0.1, 0.2, 0.30000000000000004, -0.7]),
        (4, "d", None),
        (5, "e", [1e-9, -1e-9, 5e-10]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")

    cols = ["vec_id", "label", "scale_nano", "q8_csv", "mae_nano"]
    got = {
        r["vec_id"]: tuple(r)
        for r in df.select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
        )
        .mapInArrow(
            quantize_batches,
            "vec_id bigint, label string, scale_nano bigint, q8_csv string, mae_nano bigint",
        )
        .collect()
    }
    q = quantize_embeddings_array(df)
    want = {
        r["vec_id"]: tuple(r)
        for r in q.select(
            "vec_id",
            "label",
            "scale_nano",
            F.concat_ws(",", F.col("q8").cast("array<string>")).alias("q8_csv"),
            "mae_nano",
        ).collect()
    }
    assert got == want, (got, want)


def test_quantize_batches_rejects_zero_scale_vectors():
    """ADVICE r11: a non-null all-zero (or empty) embedding has
    scale == 0 — quantization is undefined there and the JVM form
    fails with an ANSI divide-by-zero. The kernel must raise a clear
    ValueError naming the vec_id up front instead of letting NaN
    propagate into int8/int64 conversions (an opaque ArrowInvalid far
    from the cause)."""
    import pyarrow as pa
    import pytest

    from fintrack_etl_spark.similarity import quantize_batches

    batch = pa.record_batch(
        [
            pa.array([7, 8], pa.int64()),
            pa.array(["a", "b"]),
            pa.array([[1.0, 2.0], [0.0, 0.0]], pa.list_(pa.float64())),
        ],
        names=["vec_id", "label", "embedding"],
    )
    with pytest.raises(ValueError, match="vec_id=8"):
        list(quantize_batches(iter([batch])))

    empty = pa.record_batch(
        [
            pa.array([9], pa.int64()),
            pa.array(["c"]),
            pa.array([[]], pa.list_(pa.float64())),
        ],
        names=["vec_id", "label", "embedding"],
    )
    with pytest.raises(ValueError, match="vec_id=9"):
        list(quantize_batches(iter([empty])))

    # NULL embeddings stay the supported NULL flow, not an error
    nulls = pa.record_batch(
        [
            pa.array([10], pa.int64()),
            pa.array(["d"]),
            pa.array([None], pa.list_(pa.float64())),
        ],
        names=["vec_id", "label", "embedding"],
    )
    (out,) = list(quantize_batches(iter([nulls])))
    assert out.column("scale_nano")[0].as_py() is None


def test_adpcm_decode_block_rejects_nonpositive_n_samples():
    """ADVICE r11: the n_samples<=0 contract was incidental (1 row
    returned, not 0). It is now an explicit ValueError — the block
    header carries the first sample, so decoding zero samples of a
    block is never a meaningful request."""
    import struct

    import pytest

    from fintrack_etl_spark.multimodal import _ADPCM_BLOCK_ALIGN, adpcm_decode_block

    block = struct.pack("<hBB", 123, 0, 0) + bytes(_ADPCM_BLOCK_ALIGN - 4)
    for bad in (0, -1):
        with pytest.raises(ValueError, match="n_samples must be >= 1"):
            adpcm_decode_block(block, bad)
    samples, _ = adpcm_decode_block(block, 1)
    assert samples == [123]


def test_adpcm_encoder_end_index_matches_decoder_replay():
    """The r11 encode path takes the next block's step index from the
    encoder's own state track instead of re-decoding the block; both
    must be bit-identical on adapting, clamped, and short-block
    signals (the multi-block WAV roundtrip depends on it)."""
    import math
    import random

    from fintrack_etl_spark.multimodal import (
        _adpcm_encode_block_ex,
        adpcm_decode_block,
        adpcm_encode_block,
    )

    random.seed(31)
    signals = [
        [int(8000 * math.sin(2 * math.pi * 100 * i / 8000)) for i in range(505)],
        [random.randint(-32768, 32767) for _ in range(505)],  # max adaptation
        [0] * 505,                                            # index floor
        [32767, -32768] * 252 + [0],                          # clamp ping-pong
        [random.randint(-2000, 2000) for _ in range(17)],     # short final block
    ]
    for sig in signals:
        for start in (0, 44, 88):
            blk, end_enc = _adpcm_encode_block_ex(sig, start)
            assert blk == adpcm_encode_block(sig, start)
            dec, end_dec = adpcm_decode_block(blk, len(sig))
            assert end_enc == end_dec, (start, end_enc, end_dec)
