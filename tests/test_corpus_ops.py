"""Training-data pipeline operators: text analysis, dedup family,
similarity search, multimodal plumbing."""

import pyspark.sql.functions as F
import pytest

from nifi_processors_spark.operators import fuzzy, multimodal, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def neardup_docs(spark):
    """Synthetic docs with planted near-duplicates."""
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different text about spark query engines and shuffles at scale"),
        (4, base.upper()),  # case-normalized dup of 0
        (5, "yet another unrelated document mentioning gradient descent optimizers"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark):
    df = spark.createDataFrame([("hello, world! 42",), ("",)], "t string")
    r = df.select(
        text.whitespace_token_count(F.col("t")).alias("ws"),
        text.bpe_token_count(F.col("t")).alias("bpe"),
    ).collect()
    assert r[0]["ws"] == 3
    # hello , world ! 42 -> 5 BPE-ish tokens
    assert r[0]["bpe"] == 5
    assert r[1]["ws"] == 0 and r[1]["bpe"] == 0


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog went to the park and it was fun",),
            ("der Hund ist nicht mit der Katze und das ist gut",),
            ("xyzzy qwerty 12345",),
        ],
        "t string",
    )
    out = [r[0] for r in df.select(text.language_id(F.col("t"))).collect()]
    assert out == ["en", "de", "und"]


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [
            ("good", "The project is well documented and the code is tested. " * 20),
            ("shouty", "BUY NOW!!! " * 50),
            ("tiny", "ok"),
        ],
        "name string, t string",
    )
    scores = {
        r["name"]: r["q"]
        for r in df.select("name", text.quality_score(F.col("t")).alias("q")).collect()
    }
    assert scores["good"] > scores["shouty"]
    assert scores["good"] > scores["tiny"]
    assert all(0.0 <= v <= 1.0 for v in scores.values())


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("something else",)], "t string"
    )
    fps = [r[0] for r in df.select(text.content_fingerprint(F.col("t"))).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_rolling_hashes_overlap(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    b = a.replace("theta", "xxxxx", 1)  # equal-length in-place edit
    df = spark.createDataFrame([(0, a), (1, b)], "id long, t string")
    out = df.select("id", text.rolling_prefix_hashes(F.col("t")).alias("h")).collect()
    ha, hb = (set(r["h"]) for r in sorted(out, key=lambda r: r["id"]))
    shared = len(ha & hb) / max(len(ha | hb), 1)
    assert 0.3 < shared < 1.0  # near-dup shares most chunks but not all


def test_exact_dedup(neardup_docs):
    kept = fuzzy.exact_dedup_keep(neardup_docs, "text", "doc_id")
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    # 0,1,4 collapse (1 exact, 4 case-normalized) -> keep 0
    assert ids == [0, 2, 3, 5]


def test_minhash_lsh_finds_neardups(neardup_docs):
    pairs = fuzzy.minhash_lsh_pairs(
        neardup_docs, "text", "doc_id", threshold=0.5, num_hashes=32, bands=16, shingle_n=2
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 4) in got  # exact dups
    assert (0, 2) in got  # near dup
    assert (3, 5) not in got and (0, 3) not in got


def test_simhash_pairs(neardup_docs):
    pairs = fuzzy.simhash_pairs(neardup_docs, "text", "doc_id", max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 4) in got
    assert (0, 3) not in got


def test_simhash_block_layout():
    # k+1 blocks covering all 60 bits, contiguous, widths differ by <=1
    for k in (0, 3, 6, 8, 15, 59):
        layout = fuzzy.simhash_block_layout(k)
        assert len(layout) == k + 1
        assert sum(w for _, w in layout) == fuzzy.PORTABLE_BITS
        assert layout[0][0] == 0
        for (o1, w1), (o2, _) in zip(layout, layout[1:]):
            assert o1 + w1 == o2
        widths = {w for _, w in layout}
        assert max(widths) - min(widths) <= 1
    with pytest.raises(ValueError):
        fuzzy.simhash_block_layout(60)
    with pytest.raises(ValueError):
        fuzzy.simhash_block_layout(-1)


@pytest.mark.parametrize("max_hamming", [3, 6, 8])
def test_simhash_pairs_equals_brute_force(neardup_docs, max_hamming):
    """Pigeonhole recall: with max_hamming+1 blocks the bucketed operator
    must return EXACTLY the brute-force all-pairs result — the 4-fixed-
    quarter layout silently dropped distance-4..8 pairs (ADVICE r3)."""
    sk = fuzzy.with_simhash(neardup_docs, "text", "sim", shingle_n=2)
    a = sk.select(F.col("doc_id").alias("id_a"), F.col("sim").alias("sa"))
    b = sk.select(F.col("doc_id").alias("id_b"), F.col("sim").alias("sb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", fuzzy.hamming64(F.col("sa"), F.col("sb")))
        .filter(F.col("hamming") <= max_hamming)
    )
    want = {(r["id_a"], r["id_b"], r["hamming"]) for r in brute.collect()}
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in fuzzy.simhash_pairs(
            neardup_docs, "text", "doc_id", max_hamming=max_hamming
        ).collect()
    }
    assert got == want


def test_minhash_no_persist_leak(neardup_docs, spark):
    """Repeated LSH calls must not accumulate cached partitions (round-1
    leaked two persists per call; the groupBy-based candidate generation
    needs no cache at all). Asserted as a DELTA, not a global zero: the
    session is shared, and operators that legitimately localCheckpoint
    (budget prefix sum, connected components) keep their blocks alive
    until their DataFrame is garbage-collected."""
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for _ in range(2):
        fuzzy.minhash_lsh_pairs(
            neardup_docs, "text", "doc_id", threshold=0.5, num_hashes=32, bands=16, shingle_n=2
        ).collect()
    # <=, not ==: the ContextCleaner may garbage-collect OTHER tests'
    # checkpoint blocks while this runs; a minhash leak would only ADD
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before


def test_ngram_jaccard_oracle_agreement(neardup_docs):
    """LSH candidates at high threshold must be a subset of the exact
    all-pairs result, and must find everything at jaccard>=0.9."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in fuzzy.ngram_jaccard_pairs(neardup_docs, "text", "doc_id", 0.0, n=2).collect()
    }
    lsh = fuzzy.minhash_lsh_pairs(
        neardup_docs, "text", "doc_id", threshold=0.5, num_hashes=32, bands=16, shingle_n=2
    )
    for r in lsh.collect():
        assert abs(exact[(r["id_a"], r["id_b"])] - r["jaccard"]) < 1e-9
    sure = {k for k, v in exact.items() if v >= 0.9}
    got = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert sure <= got


def test_embedding_neardup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),  # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = fuzzy.embedding_neardup_pairs(df, "embedding", "vec_id", threshold=0.95)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(0, 1)}


def test_brute_force_topk(vecs, spark):
    queries = (
        vecs.limit(3)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    out = similarity.brute_force_topk(vecs, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        # rank 1 is the query itself (cosine ~1)
        assert rs[0]["vec_id"] == q and rs[0]["cosine"] > 0.999
        assert all(a["cosine"] >= b["cosine"] for a, b in zip(rs, rs[1:]))


def test_ivf_topk_recall(vecs):
    queries = (
        vecs.limit(5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    exact = similarity.brute_force_topk(vecs, queries, k=3)
    approx = similarity.ivf_topk(vecs, queries, k=3, n_cells=8, nprobe=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6  # nprobe=half the cells -> decent recall
    # the query itself must always be found (it lives in the probed cell)
    assert all((q, q) in a for q, _ in e if _ == q)


def test_ivf_persisted_index(vecs, spark, tmp_path):
    """Persisted IVF index: same results as the inline path, and the probe
    scan is partition-pruned to the probed cells (the write-once /
    query-many shape)."""
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(vecs, idx, n_cells=8)
    queries = vecs.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    inline = similarity.ivf_topk(vecs, queries, k=3, n_cells=8, nprobe=4)
    indexed = similarity.ivf_topk_indexed(spark, idx, queries, k=3, nprobe=4)
    a = {(r["query_id"], r["vec_id"], r["rank"]) for r in inline.collect()}
    b = {(r["query_id"], r["vec_id"], r["rank"]) for r in indexed.collect()}
    assert a == b
    # the probe plan prunes partitions (dynamic partition pruning on cell)
    plan = indexed._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan


def test_multimodal_plumbing(spark):
    media = multimodal.synthetic_media(spark, 20, kind="image")
    # names + types match the contract (nullability differs by construction)
    assert [(f.name, f.dataType.simpleString()) for f in media.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in multimodal.MEDIA_SCHEMA.fields
    ]
    feats = multimodal.extract_features(media, dim=8)
    rows = feats.select("media_id", "features").collect()
    assert len(rows) == 20
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic: same input -> same features
    again = multimodal.extract_features(media, dim=8).select("media_id", "features").collect()
    assert sorted(map(tuple, ((r["media_id"], tuple(r["features"])) for r in rows))) == sorted(
        map(tuple, ((r["media_id"], tuple(r["features"])) for r in again))
    )


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media(spark, 5, kind="video")
    frames = multimodal.frame_sample(media, every_ms=500)
    r = frames.groupBy("media_id").count().collect()
    meta = {x["media_id"]: x["duration_ms"] for x in media.select("media_id", "meta.duration_ms").collect()}
    for row in r:
        expect = (max(meta[row["media_id"]] - 1, 0)) // 500 + 1
        assert row["count"] == expect


def test_decode_image_real_bmp(spark):
    """synthetic_media now emits real BMPs; decode_image header-parses
    them (pure stdlib, no PIL) and must recover the encoded dimensions."""
    media = multimodal.synthetic_media(spark, 20, kind="image")
    out = multimodal.decode_image(media).select(
        "media_id", "format", "width", "height", "bpp", "decode_error",
        F.col("meta.width").alias("mw"), F.col("meta.height").alias("mh"),
    ).collect()
    assert len(out) == 20
    for r in out:
        assert r["decode_error"] is None
        assert r["format"] == "bmp" and r["bpp"] == 24
        assert r["width"] == r["mw"] and r["height"] == r["mh"]


def test_decode_image_png_and_errors(spark):
    import struct as _struct
    import zlib as _zlib

    ihdr = _struct.pack(">II", 320, 200) + bytes([8, 6, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _struct.pack(">I", 13) + b"IHDR" + ihdr
        + _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr))
    )
    rows = [(0, "image", bytearray(png)), (1, "image", bytearray(b"garbage-bytes-not-an-image-xx")),
            (2, "image", None)]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in multimodal.decode_image(df).collect()}
    assert got[0]["format"] == "png" and (got[0]["width"], got[0]["height"]) == (320, 200)
    assert got[0]["bpp"] == 32 and got[0]["decode_error"] is None
    assert got[1]["decode_error"] is not None and got[1]["width"] is None
    assert got[2]["decode_error"] is not None


def test_decode_audio_real_wav(spark):
    media = multimodal.synthetic_media(spark, 12, kind="audio")
    out = multimodal.decode_audio(media).select(
        "media_id", "channels", "sample_rate", "bits_per_sample",
        "duration_ms", "decode_error", F.col("meta.duration_ms").alias("md"),
        F.col("meta.sample_rate").alias("msr"),
    ).collect()
    assert len(out) == 12
    for r in out:
        assert r["decode_error"] is None
        assert r["channels"] == 1 and r["bits_per_sample"] == 16
        assert r["sample_rate"] == r["msr"]
        # n_samples = rate * duration_ms // 1000, so round-trip is exact
        assert r["duration_ms"] == r["md"]
    # non-WAV payloads surface an error, not an exception
    bad = spark.createDataFrame(
        [(99, "audio", bytearray(b"not riff data here"))],
        "media_id long, kind string, payload binary",
    )
    r = multimodal.decode_audio(bad).collect()[0]
    assert r["decode_error"] is not None and r["duration_ms"] is None


def test_real_documents_pipeline(docs):
    """The full text-feature pass over the driver's documents table."""
    out = docs.select(
        "doc_id",
        text.whitespace_token_count(F.col("text")).alias("ws_tokens"),
        text.bpe_token_count(F.col("text")).alias("bpe_tokens"),
        text.language_id(F.col("text")).alias("lang_id"),
        text.quality_score(F.col("text")).alias("quality"),
        text.content_fingerprint(F.col("text")).alias("fp"),
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r["bpe_tokens"] >= r["ws_tokens"] for r in rows if r["ws_tokens"] > 0)
    assert all(0 <= r["quality"] <= 1 for r in rows)


def test_pii_scrub(spark):
    rows = [
        (0, "contact user.99+x@example.co.uk or 192.168.0.1 now"),
        (1, "call 555-123-4567 or +1 800 555 0199, card 4111 1111 1111 1111"),
        (2, "clean text with number 42 and version 1.2.3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["s"], r["n_email"], r["n_ipv4"], r["n_digits"])
        for r in df.select(
            "doc_id", text.scrub_pii(F.col("text")).alias("s"),
            *[c.alias(f"n_{t}") for t, c in text.pii_counts(F.col("text")).items()],
        ).collect()
    }
    assert got[0] == ("contact <EMAIL> or <IP> now", 1, 1, 0)
    # the digit-run pattern consumes "1 800 555 0199" whole (leading
    # country digit included) — masking more is the right failure mode
    assert got[1][0] == "call <NUMBER> or +<NUMBER>, card <NUMBER>"
    assert got[1][1:] == (0, 0, 3)
    # short numbers and dotted versions survive
    assert got[2] == ("clean text with number 42 and version 1.2.3", 0, 0, 0)


def test_ngram_overlap_decontaminate(spark):
    """Benchmark decontamination: overlap counts are exact distinct-gram
    intersections; short/empty docs survive with 0; decontaminate drops
    exactly the flagged ids."""
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "lorem ipsum dolor sit amet consectetur"),
         (3, "quick brown fox is quick brown fox"),  # 2 distinct bench grams? see below
         (4, "hi"),          # shorter than n -> zero grams
         (5, "")],           # empty -> zero grams
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a quick brown fox appeared"),
         (101, "over the lazy dog he went")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_overlap"], r["contaminated"])
           for r in text.ngram_overlap(train, bench, n=3, min_overlap=2).collect()}
    # doc 1 grams hitting bench: 'quick brown fox', 'over the lazy',
    # 'the lazy dog' -> 3; doc 3: 'quick brown fox' (distinct) -> 1
    assert out[1] == (3, True)
    assert out[2] == (0, False)
    assert out[3] == (1, False)
    assert out[4] == (0, False) and out[5] == (0, False)
    kept = sorted(r["doc_id"] for r in
                  text.decontaminate(train, bench, n=3, min_overlap=2).collect())
    assert kept == [2, 3, 4, 5]
    with pytest.raises(ValueError, match="n must be"):
        text.with_word_ngrams(train, "text", 0)


def test_ngram_overlap_plan_is_broadcast(spark):
    """The bench gram probe must be a broadcast join (no corpus shuffle on
    the gram key); the only exchange is the per-doc count groupBy."""
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta "),
                 F.col("id").cast("string")).alias("text"))
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    plan = text.ngram_overlap(docs, bench, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
