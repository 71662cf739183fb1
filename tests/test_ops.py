"""Training-data-pipeline operator tests (dedup / similarity / multimodal /
eval metrics) over the driver testdata at sf0.001."""

import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_covers_true_jaccard_pairs(spark):
    """Every exact-Jaccard ≥ τ pair must be an LSH candidate (recall of the
    banding scheme at this τ; precision is then enforced by the exact
    verify stage = q_jaccard_pairs)."""
    from information_retrieval_spark.ops import dedup

    true_pairs = {(r.a, r.b) for r in dedup.q_jaccard_pairs(spark, SF).collect()}
    cand_pairs = {(r.a, r.b) for r in dedup.q_minhash_pairs(spark, SF).collect()}
    assert true_pairs, "fixture corpus should contain near-dup pairs"
    missed = true_pairs - cand_pairs
    assert not missed, f"LSH missed true near-dups: {missed}"


def test_exact_dedup_groups_consistent(spark):
    from pyspark.sql import functions as F

    from information_retrieval_spark.ops import dedup

    d = dedup.q_dedup_exact(spark, SF)
    # canonical is a member of its own group and the min doc_id
    bad = d.filter(F.col("canonical_id") > F.col("doc_id")).count()
    assert bad == 0
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert d.count() == n_docs


def test_ann_recall_against_brute_force(spark):
    from information_retrieval_spark.ops import similarity

    bf = {
        (r.query_id, r.vec_id)
        for r in similarity.q_cosine_topk(spark, SF).collect()
    }
    ann = {
        (r.query_id, r.vec_id)
        for r in similarity.q_ann_lsh_topk(spark, SF).collect()
    }
    recall = len(bf & ann) / len(bf)
    assert recall >= 0.4, f"multi-table SRP recall collapsed: {recall}"


def test_simhash_near_dup_hamming(spark):
    """Exact duplicates get identical simhash; the signature is 32-bit."""
    from information_retrieval_spark.ops import dedup

    sims = {r.doc_id: r.simhash for r in dedup.q_simhash(spark, SF).collect()}
    assert all(0 <= v < (1 << 32) for v in sims.values())
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    by_text = {}
    for did, t in docs.items():
        by_text.setdefault(t, []).append(did)
    for ids in by_text.values():
        if len(ids) > 1:
            assert len({sims[i] for i in ids}) == 1


def test_multimodal_features_schema_and_determinism(spark):
    from information_retrieval_spark.ops import multimodal

    media = multimodal.media_table(spark, SF)
    feats = multimodal.extract_features(media)
    assert "payload" not in feats.columns  # bytes must not flow forward
    rows1 = {r.doc_id: (r.payload_sha256, tuple(r.features))
             for r in feats.collect()}
    rows2 = {r.doc_id: (r.payload_sha256, tuple(r.features))
             for r in multimodal.extract_features(media).collect()}
    assert rows1 == rows2
    assert all(len(v[1]) == multimodal.FEATURE_DIM for v in rows1.values())


def test_multimodal_frame_sampling(spark):
    from pyspark.sql import functions as F

    from information_retrieval_spark.ops import multimodal

    media = multimodal.media_table(spark, SF)
    frames = multimodal.sample_frames(media, every_n=50)
    n_video = media.filter(F.col("media_type") == "video").count()
    assert frames.select("doc_id").distinct().count() == n_video
    # frame_no dense from 0 per doc
    mx = frames.groupBy("doc_id").agg(
        F.max("frame_no").alias("mx"), F.count("*").alias("n")
    )
    assert mx.filter(F.col("mx") != F.col("n") - 1).count() == 0


def test_decode_stub_rejects_bad_magic():
    from information_retrieval_spark.ops.multimodal import decode_image_stub

    with pytest.raises(ValueError):
        decode_image_stub(b"JPEGnotfake")


def _golden_bmp(w, h, bitcount=24, neg_height=False):
    import struct

    rowbytes = (w * (bitcount // 8) + 3) // 4 * 4
    psz = rowbytes * h
    hdr = b"BM" + struct.pack("<IHHI", 54 + psz, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if neg_height else h, 1, bitcount,
        0, psz, 2835, 2835, 0, 0,
    )
    return hdr + dib + b"\x00" * psz


def _golden_png(w, h, colortype=2, body=b""):
    import struct

    from information_retrieval_spark.ops.multimodal import PNG_MAGIC

    return (
        PNG_MAGIC + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", w, h)
        + bytes([8, colortype, 0, 0, 0]) + b"\x00" * 4 + body
    )


def test_decode_bmp_png_golden_images():
    """Header decoders against hand-built known files (real byte layouts:
    BITMAPINFOHEADER little-endian, PNG IHDR big-endian)."""
    from information_retrieval_spark.ops.multimodal import (
        decode_bmp_header,
        decode_png_header,
    )

    assert decode_bmp_header(_golden_bmp(3, 2)) == (3, 2, 3)
    assert decode_bmp_header(_golden_bmp(640, 480)) == (640, 480, 3)
    # top-down BMP (negative height) and 32-bit BGRA
    assert decode_bmp_header(_golden_bmp(5, 7, bitcount=32, neg_height=True)) \
        == (5, 7, 4)
    assert decode_png_header(_golden_png(7, 5)) == (7, 5, 3)
    assert decode_png_header(_golden_png(1920, 1080, colortype=6)) \
        == (1920, 1080, 4)
    assert decode_png_header(_golden_png(2, 2, body=b"trailing junk")) \
        == (2, 2, 3)
    with pytest.raises(ValueError):
        decode_bmp_header(b"BMshort")
    with pytest.raises(ValueError):
        decode_png_header(_golden_bmp(2, 2))
    with pytest.raises(ValueError):
        decode_png_header(_golden_png(1, 1, colortype=5))


def test_multimodal_real_image_decode_end_to_end(spark):
    """Image payloads in media_table are REAL BMP/PNG bytes: the Spark
    pipeline's decoded dims must equal an independent driver-side re-parse
    of the same payload bytes, and match the table's metadata columns."""
    from pyspark.sql import functions as F

    from information_retrieval_spark.ops import multimodal

    media = multimodal.media_table(spark, SF)
    imgs = {r.doc_id: r for r in media.filter(
        F.col("media_type") == "image").collect()}
    assert imgs, "fixture should contain image rows"
    feats = {r.doc_id: r for r in multimodal.extract_features(media).collect()}
    n_bmp = n_png = n_jpg = 0
    for did, m in imgs.items():
        f = feats[did]
        if m.payload[:2] == b"BM":
            w, h, c = multimodal.decode_bmp_header(bytes(m.payload))
            n_bmp += 1
        elif bytes(m.payload)[:8] == multimodal.PNG_MAGIC:
            w, h, c = multimodal.decode_png_header(bytes(m.payload))
            n_png += 1
        else:
            w, h, c = multimodal.decode_jpeg_header(bytes(m.payload))
            n_jpg += 1
        assert (f.dec_width, f.dec_height, f.dec_channels) == (w, h, c)
        assert (m.width, m.height) == (w, h)
        assert tuple(f.features[:3]) == (float(w), float(h), float(c))
    assert n_bmp and n_png and n_jpg, "all three real formats should appear"
    # non-image rows carry no decoded dims; WAV audio rows DO carry
    # decoded channels/sample-rate/bits, stub rows carry none
    n_wav = 0
    for did, f in feats.items():
        if did not in imgs:
            assert f.dec_width is None and f.dec_height is None
            if did % 6 == 1:
                n_wav += 1
                assert f.dec_channels in (1, 2)
                assert f.dec_sample_rate in range(8000, 40001, 8000)
                assert f.dec_bits == 16
            else:
                assert f.dec_channels is None
                assert f.dec_sample_rate is None and f.dec_bits is None
    assert n_wav, "fixture should contain WAV audio rows"


def _golden_wav(channels, sample_rate, bits=16, body=b""):
    import struct

    dsz = len(body)
    return (
        b"RIFF" + struct.pack("<I", 36 + dsz) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate,
            sample_rate * channels * (bits // 8),
            channels * (bits // 8), bits,
        )
        + b"data" + struct.pack("<I", dsz) + body
    )


def test_decode_wav_golden_files(spark):
    """WAV header decoder against hand-built known files (canonical
    RIFF/fmt/data little-endian layout), plus the media_table round trip:
    Spark-synthesized WAV bytes must re-parse to the hash-derived params."""
    from pyspark.sql import functions as F

    from information_retrieval_spark.ops import multimodal

    dec = multimodal.decode_wav_header
    assert dec(_golden_wav(1, 8000)) == (1, 8000, 16)
    assert dec(_golden_wav(2, 44100, body=b"\x01\x02" * 50)) == (2, 44100, 16)
    assert dec(_golden_wav(6, 192000, bits=24)) == (6, 192000, 24)
    with pytest.raises(ValueError):
        dec(b"RIFFshort")
    with pytest.raises(ValueError):
        dec(_golden_bmp(2, 2))
    with pytest.raises(ValueError):  # RIFF but not WAVE (e.g. AVI)
        dec(_golden_wav(1, 8000).replace(b"WAVE", b"AVI "))

    media = multimodal.media_table(spark, SF)
    wavs = [
        bytes(r.payload)
        for r in media.filter(F.col("doc_id") % 6 == 1).collect()
    ]
    assert wavs, "fixture should contain WAV rows"
    for p in wavs:
        c, sr, bits = dec(p)
        assert c in (1, 2) and sr in range(8000, 40001, 8000) and bits == 16
        # declared data size matches the actual body length
        import struct as _s

        assert _s.unpack_from("<I", p, 40)[0] == len(p) - 44


def test_eval_metrics_bounds(spark):
    from information_retrieval_spark.ops import metrics

    rows = metrics.q_eval_metrics(spark, SF).collect()
    assert rows
    for r in rows:
        for v in (r.p_r, r.r_r, r.f1_r, r.ap_r, r.ndcg_r, r.mrr_r):
            assert 0.0 <= v <= 1.0 + 1e-9
        assert r.n_hit <= r.n_ret
        assert r.n_hit <= max(r.n_rel, 0)


def test_ivf_recall_against_brute_force(spark):
    from information_retrieval_spark.ops import similarity

    bf = {
        (r.query_id, r.vec_id)
        for r in similarity.q_cosine_topk(spark, SF).collect()
    }
    ivf = {
        (r.query_id, r.vec_id)
        for r in similarity.q_ann_ivf_topk(spark, SF).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.8, f"IVF (2/4 probes) recall collapsed: {recall}"


def test_lsh_band_bucket_cap_star_pairs(spark):
    """A large identical-doc cluster must NOT go through the quadratic
    band self-join: over-cap buckets emit star pairs (min-doc hub), so a
    1.2k-doc cluster yields 1,199 pairs, not ~719k — while staying fully
    connected through the hub for downstream union-find."""
    from pyspark.sql import functions as F

    from information_retrieval_spark.ops import dedup

    n_dup = 1200
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text) for i in range(n_dup)]
    rows += [(n_dup + i, f"totally unrelated document number {i} "
                         f"with its own distinct words {i * 7}")
             for i in range(5)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_pairs(d).collect()
    cluster = {(r.a, r.b) for r in pairs if r.a < n_dup and r.b < n_dup}
    assert cluster == {(0, i) for i in range(1, n_dup)}
    # nothing bridges the identical cluster and the unrelated tail
    assert not any(r.a < n_dup <= r.b for r in pairs)
    # sub-cap path still does exact all-pairs: 3 identical docs -> 3 pairs
    small = spark.createDataFrame(
        [(i, text) for i in range(3)], "doc_id long, text string"
    )
    got_small = {(r.a, r.b) for r in dedup.minhash_pairs(small).collect()}
    assert got_small == {(0, 1), (0, 2), (1, 2)}


def test_jaccard_hot_shingle_anti_join_is_broadcast(spark):
    """The df-cap must be applied by broadcasting the HOT shingle list as
    a left-anti join (broadcasting the kept vocabulary is the 100 TB
    mistake), and hot shingles must not contribute to the intersection."""
    from information_retrieval_spark.ops import dedup

    d = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(2)],
        "doc_id long, text string",
    )
    plan = dedup.jaccard_pairs(d)._jdf.queryExecution().toString()
    assert "LeftAnti" in plan
    # the broadcast hint must sit on the anti-join's build (hot) side
    assert "ResolvedHint" in plan or "BroadcastHashJoin" in plan


def test_user_knn_lsh_recall_and_plan(spark):
    """The SRP-bucketed user kNN must (a) reach ≥0.8 recall of the exact
    all-pairs top-5 and (b) key its candidate self-join on (tbl, bucket) —
    an equi hash/merge join, never the O(U²) nested loop of the exact
    path."""
    from information_retrieval_spark.ops import recsys

    exact = {}
    for r in recsys.q_user_knn(spark, SF).collect():
        exact.setdefault(r.user_id, set()).add(r.neighbor_id)
    approx = {}
    for r in recsys.q_user_knn_lsh(spark, SF).collect():
        approx.setdefault(r.user_id, set()).add(r.neighbor_id)
    hits = sum(len(exact[u] & approx.get(u, set())) for u in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    assert recall >= 0.8, f"LSH user-knn recall collapsed: {recall}"

    plan = recsys.q_user_knn_lsh(spark, SF)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    # the only nested loops allowed are broadcast CROSS joins against the
    # one-row centering-means frame; the exact path's all-pairs join shows
    # up as a non-Cross BroadcastNestedLoopJoin and must not appear here
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    n_scalar_cross = plan.count("BroadcastNestedLoopJoin BuildRight, Cross")
    assert n_bnlj == n_scalar_cross, plan[:2000]


def test_purity_confusion_consistent(spark):
    """A9: confusion matrix sums to N; purity equals the recomputed
    sum-of-cluster-maxima over N and lies in (1/K..1]."""
    from information_retrieval_spark.ops import ml

    rows = ml.q_purity(spark, SF).collect()
    n_total = sum(r.n for r in rows)
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert n_total == n_vecs
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r.n)
    want = sum(max(v) for v in by_cluster.values()) / n_total
    assert rows[0].purity_r == pytest.approx(want, abs=1e-6)
    assert len({r.purity_r for r in rows}) == 1
    n_labels = len({r.label for r in rows})
    # purity is at least the majority-label share of each cluster
    assert 1.0 / n_labels <= rows[0].purity_r <= 1.0


def test_plsa_topics_invariants(spark):
    """G4 analogue: every doc gets exactly one main topic, probabilities
    are valid, the fit is deterministic, and the model actually
    discriminates (not all docs collapse into one topic)."""
    from information_retrieval_spark.ops import ml

    rows = ml.q_plsa_topics(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    for r in rows:
        assert 0 <= r.main_topic < ml.N_TOPICS
        # the arg-max topic of a T-topic distribution has mass >= 1/T
        assert 1.0 / ml.N_TOPICS - 1e-6 <= r.p_r <= 1.0 + 1e-6
    assert len({r.main_topic for r in rows}) >= 2
    again = {(r.doc_id, r.main_topic, r.p_r)
             for r in ml.q_plsa_topics(spark, SF).collect()}
    assert {(r.doc_id, r.main_topic, r.p_r) for r in rows} == again


def test_cluster_topics_matches_bruteforce(spark):
    """G4 1-3gram feature space: the per-cluster top-5 n-gram ranking must
    equal a pure-Python CountVectorizer-style recount (total occurrences
    of every 1/2/3-token shingle over the cluster's docs, ties
    ngram-ascending)."""
    import re

    from information_retrieval_spark.ops import ml

    assign = {r.vec_id: r.cluster for r in ml.q_kmeans(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    counts = {}
    for r in docs:
        k = assign[r.doc_id]
        toks = [w for w in re.split(r"[^a-z0-9]+", r.text.lower()) if w]
        for n in (1, 2, 3):
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                counts[(k, g)] = counts.get((k, g), 0) + 1
    want = {}
    for k in set(assign.values()):
        top = sorted(
            ((g, c) for (kk, g), c in counts.items() if kk == k),
            key=lambda gc: (-gc[1], gc[0]),
        )[: ml.TOPIC_TOP]
        for rank, (g, c) in enumerate(top, 1):
            want[(k, rank)] = (g, c)
    got = {
        (r.cluster, r.rank): (r.ngram, r.cnt)
        for r in ml.q_cluster_topics(spark, SF).collect()
    }
    assert got == want
    # bigram/trigram features exist in the counted space (whether one
    # reaches the top-5 is data-dependent — unigram counts dominate)
    assert any(" " in g for (_, g) in counts)


def test_mlt_excludes_seed_and_ranks_dense(spark):
    """More-like-this: a seed never appears in its own result list, every
    seed yields a full ranked list (1..k dense), and scores are valid
    cosines in (0, 1]."""
    from information_retrieval_spark.ops import ir_direct

    rows = ir_direct.q_mlt_topk(spark, SF).collect()
    by_q = {}
    for r in rows:
        assert r.doc_id != r.query_id
        assert 0.0 < r.score_r <= 1.0 + 1e-6
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert set(by_q) == set(ir_direct.MLT_SEEDS)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, ir_direct.TOP_K + 1))


def test_facets_partition_the_candidate_set(spark):
    """Facet counts per query must sum to that query's candidate-set size
    (facets partition the candidates — no doc double-counted or lost)."""
    from information_retrieval_spark.ops import ir_direct

    cand = {}
    for r in ir_direct.q_candidates(spark, SF).collect():
        cand[r.query_id] = cand.get(r.query_id, 0) + 1
    fsum = {}
    for r in ir_direct.q_facets(spark, SF).collect():
        assert r.n_docs > 0
        fsum[r.query_id] = fsum.get(r.query_id, 0) + r.n_docs
    assert fsum == cand


def test_suggest_matches_bruteforce_and_pushes_prefix(spark):
    """Autocomplete: per-prefix top-10 completions by (df desc, term asc)
    must equal a pure-Python recount, and the prefix predicate must reach
    the scan as StartsWith (sargable — no nested-loop prefix join)."""
    import re

    from information_retrieval_spark.ops import ir_direct

    df_count = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        for t in set(w for w in re.split(r"[^a-z0-9]+", r.text.lower()) if w):
            df_count[t] = df_count.get(t, 0) + 1
    want = {}
    for p in ir_direct.SUGGEST_PREFIXES:
        top = sorted(
            ((t, c) for t, c in df_count.items() if t.startswith(p)),
            key=lambda tc: (-tc[1], tc[0]),
        )[: ir_direct.SUGGEST_K]
        for rank, (t, c) in enumerate(top, 1):
            want[(p, rank)] = (t, c)
    got = {
        (r.prefix, r.rank): (r.term, r.df)
        for r in ir_direct.q_suggest(spark, SF).collect()
    }
    assert got == want
    plan = (
        ir_direct.q_suggest(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "StartsWith(term" in plan or "StartsWith(text" in plan, plan[:2000]


def test_embedding_dups_finds_mirrors(spark):
    """Every mirror copy (an exact duplicate vector) must be recovered as
    a (v, v+OFFSET) pair with cosine 1.0 — exact duplicates always share
    every SRP bucket, so LSH candidate generation cannot miss them."""
    from information_retrieval_spark.ops import similarity

    rows = similarity.q_embedding_dups(spark, SF).collect()
    pairs = {(r.a, r.b): r.sim_r for r in rows}
    for v in range(similarity.N_MIRROR):
        key = (v, v + similarity.MIRROR_OFFSET)
        assert key in pairs, f"missed exact duplicate {key}"
        assert pairs[key] == pytest.approx(1.0, abs=1e-6)
    for (a, b), s in pairs.items():
        assert similarity.DUP_TAU - 1e-6 <= s <= 1.0 + 1e-6
        assert a < b


def _golden_jpeg(
    w: int,
    h: int,
    ncomp: int = 3,
    progressive: bool = False,
    extra_segments: bytes = b"",
) -> bytes:
    """Hand-built JPEG: SOI, APP0/JFIF, optional extra marker segments
    (to exercise the chain walk), then SOF0/SOF2."""
    import struct as s

    app0 = b"\xff\xe0" + s.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01" \
        + b"\x00" + s.pack(">HH", 1, 1) + b"\x00\x00"
    comps = (b"\x01\x22\x00\x02\x11\x01\x03\x11\x01" if ncomp == 3
             else b"\x01\x11\x00")
    sof = (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + s.pack(">H", 8 + 3 * ncomp) + b"\x08" + s.pack(">HH", h, w) \
        + bytes([ncomp]) + comps
    return b"\xff\xd8" + app0 + extra_segments + sof + b"opaque body"


def test_decode_jpeg_golden_images():
    """JPEG SOF decoder against hand-built marker chains: baseline and
    progressive, color and grayscale, and a chain with interleaved COM /
    DQT segments the walker must skip."""
    import struct as s

    from information_retrieval_spark.ops.multimodal import decode_jpeg_header

    assert decode_jpeg_header(_golden_jpeg(640, 480)) == (640, 480, 3)
    assert decode_jpeg_header(_golden_jpeg(31, 17, ncomp=1)) == (31, 17, 1)
    assert decode_jpeg_header(_golden_jpeg(5, 9, progressive=True)) == (5, 9, 3)
    com = b"\xff\xfe" + s.pack(">H", 2 + 11) + b"a comment!!"
    dqt = b"\xff\xdb" + s.pack(">H", 2 + 65) + b"\x00" + bytes(64)
    assert decode_jpeg_header(
        _golden_jpeg(1024, 768, extra_segments=com + dqt)
    ) == (1024, 768, 3)
    import pytest as pt

    with pt.raises(ValueError):
        decode_jpeg_header(b"\xff\xd8\xff\xd9")  # EOI, no frame
    with pt.raises(ValueError):
        decode_jpeg_header(b"not a jpeg")
    with pt.raises(ValueError):  # misaligned marker chain
        decode_jpeg_header(b"\xff\xd8" + b"\x00\x00\x00\x00")


def test_multimodal_jpeg_rows_decode_end_to_end(spark):
    """JPEG rows in media_table (doc_id%6==3, odd doc_id//6) carry real
    SOI/APP0/SOF chains: the Spark pipeline's decoded dims must equal an
    independent driver-side re-parse AND the table's metadata columns."""
    from information_retrieval_spark.ops.multimodal import (
        decode_jpeg_header,
        extract_features,
        media_table,
    )

    sf = "/root/testdata/sf0.001"
    media = media_table(spark, sf).filter(
        "doc_id % 6 = 3 AND (doc_id DIV 6) % 2 = 1"
    )
    rows = {r.doc_id: r for r in media.collect()}
    assert rows, "fixture must contain JPEG rows"
    feats = {
        r.doc_id: r
        for r in extract_features(media).collect()
    }
    seen_markers = set()
    for did, r in rows.items():
        w, h, c = decode_jpeg_header(bytes(r.payload))
        assert (w, h) == (r.width, r.height)
        assert c in (1, 3)
        f = feats[did]
        assert (f.dec_width, f.dec_height, f.dec_channels) == (w, h, c)
        assert f.dec_sample_rate is None and f.dec_bits is None
        seen_markers.add(bytes(r.payload)[20:22])
    # the fixture exercises BOTH frame types
    assert seen_markers == {b"\xff\xc0", b"\xff\xc2"}


def test_user_knn_exact_guard(spark, monkeypatch):
    """The exact O(U²) path must be unreachable by accident at scale: with
    the cap forced below sf0.001's user count it raises and names the LSH
    path; at the default cap it still runs (the battery contract)."""
    from information_retrieval_spark.ops import recsys

    monkeypatch.setenv("IR_EXACT_KNN_MAX_USERS", "3")
    try:
        recsys.q_user_knn(spark, SF)
    except ValueError as e:
        assert "user_knn_lsh" in str(e)
    else:
        raise AssertionError("guard did not trip at cap=3")
    monkeypatch.delenv("IR_EXACT_KNN_MAX_USERS")
    assert recsys.q_user_knn(spark, SF).limit(1).count() == 1
