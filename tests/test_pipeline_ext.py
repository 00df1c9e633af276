"""Behavioral tests for the training-data-pipeline extensions:
IVF ANN structural/recall contract, SimHash banding losslessness,
and the multimodal binary plumbing (Arrow batch shape, parquet
round-trip of binary payloads, stub gating)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_standalone_scripts_spark.operators.dedup_ext import (
    ANN_K,
    N_QUERIES,
    q_ann_ivf,
    q_cosine_neardup_pairs,
    simhash_fingerprints,
)
from data_pipeline_standalone_scripts_spark.operators.llm import (
    _dot,
    _norm_sq,
    _vec_double,
)
from data_pipeline_standalone_scripts_spark.sources.multimodal import (
    media_table,
)
from data_pipeline_standalone_scripts_spark.tables import load


def _exact_topk(spark, sf_dir, k=ANN_K, n_queries=N_QUERIES):
    """Brute-force cosine top-k per query — ground truth for recall."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), _vec_double().alias("qv")
    )
    v = _vec_double()
    cos = _dot(v, F.col("qv")) / (F.sqrt(_norm_sq(v)) * F.sqrt(_norm_sq(F.col("qv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round(cos, 6).alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def test_ann_ivf_structure_and_recall(spark, sf_med):
    """q_ann_ivf: k rows per query, no self-matches, similarities
    bounded by the exact top-1, and recall vs brute force above the
    floor measured on this corpus (uniform-random vectors make ANN
    recall modest by construction; the floor guards regressions, not
    state-of-the-art recall)."""
    rows = q_ann_ivf(spark, sf_med).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for qid, rs in by_q.items():
        assert len(rs) == ANN_K, (qid, len(rs))
        assert all(r["vec_id"] != qid for r in rs)

    exact = _exact_topk(spark, sf_med).collect()
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(
        len(exact_by_q[q] & {r["vec_id"] for r in rs}) for q, rs in by_q.items()
    )
    recall = hits / (N_QUERIES * ANN_K)
    assert recall >= 0.2, f"IVF recall collapsed: {recall:.2f}"

    # approximate similarities can never exceed the exact best
    best_exact = {r["query_id"]: r["cos_sim"] for r in exact if r["rn"] == 1}
    for qid, rs in by_q.items():
        assert max(r["cos_sim"] for r in rs) <= best_exact[qid] + 1e-9


def test_ann_ivf_deterministic(spark, sf_med):
    a = sorted(map(tuple, q_ann_ivf(spark, sf_med).collect()))
    b = sorted(map(tuple, q_ann_ivf(spark, sf_med).collect()))
    assert a == b


def test_cosine_pairs_symmetric_ground_truth(spark, sf_small):
    """Top-pair list is ordered, deduped, and within [-1, 1]."""
    rows = q_cosine_neardup_pairs(spark, sf_small).collect()
    assert rows, "top-k pair list empty"
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)
    assert all(r["vec_a"] < r["vec_b"] for r in rows)
    assert len({(r["vec_a"], r["vec_b"]) for r in rows}) == len(rows)


def test_simhash_band_join_is_lossless(spark, sf_small):
    """The banded candidate join must find EVERY pair at Hamming ≤ 5
    (pigeonhole over 6 bands) — compare against brute force over the
    materialized fingerprints."""
    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(spark, sf_small).collect()}
    ids = sorted(fps)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 5
    }
    from data_pipeline_standalone_scripts_spark.operators.dedup_ext import (
        q_simhash_neardup,
    )

    banded = {(r["doc_a"], r["doc_b"]) for r in q_simhash_neardup(spark, sf_small).collect()}
    assert banded == brute


def test_simhash_wide_band_join_is_lossless(spark, sf_small):
    """X50: the 6×20-bit banded join over the 120-bit sketch must find
    EVERY pair at Hamming ≤ 5 (same pigeonhole), each exactly once —
    compare against brute force over the materialized two-half
    fingerprints."""
    from data_pipeline_standalone_scripts_spark.operators.dedup_ext import (
        q_simhash_wide,
        simhash_wide_fingerprints,
    )

    fps = {
        r["doc_id"]: (r["sh_lo"], r["sh_hi"])
        for r in simhash_wide_fingerprints(spark, sf_small).collect()
    }
    ids = sorted(fps)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a][0] ^ fps[b][0]).count("1")
        + bin(fps[a][1] ^ fps[b][1]).count("1")
        <= 5
    }
    rows = q_simhash_wide(spark, sf_small).collect()
    banded = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert banded == brute
    assert len(rows) == len(banded)  # lowest-band emission: no dup rows
    assert all(r["hamming"] <= 5 for r in rows)


def test_media_table_binary_roundtrip(spark, sf_small, tmp_path):
    """Binary payloads survive a parquet write/read byte-for-byte, and
    headers agree with the typed meta struct."""
    media = media_table(spark, sf_small)
    path = str(tmp_path / "media.parquet")
    media.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.schema["payload"].dataType.typeName() == "binary"
    orig = {r["media_id"]: r for r in media.collect()}
    rows = back.collect()
    assert len(rows) == len(orig)
    for r in rows:
        o = orig[r["media_id"]]
        assert bytes(r["payload"]) == bytes(o["payload"])
        if r["kind"] == "image":
            import struct as st

            w, h = st.unpack(">II", bytes(r["payload"])[:8])
            assert w == r["meta"]["declared_width"]
            assert h == r["meta"]["declared_height"]
        else:
            import struct as st

            (nf,) = st.unpack(">I", bytes(r["payload"])[:4])
            assert nf == r["meta"]["n_frames"]
            assert len(bytes(r["payload"])) == 8 + 4 * nf


def test_avi_mjpeg_round_trip():
    """The AVI payloads are REAL RIFF containers: demux returns the
    exact frame bytes that were muxed, every frame decodes through
    the X44 JPEG codec to the arithmetic tile raster, and malformed
    containers raise loud ValueErrors (never IndexError)."""
    import numpy as np
    import pytest

    from data_pipeline_standalone_scripts_spark.sources.multimodal import (
        _avi_frame_tiles,
        avi_demux_mjpeg,
        avi_encode_mjpeg,
        jpeg_decode_pixels,
        jpeg_encode_tiles,
    )

    for doc_id, n_chars in [(0, 88), (7, 292), (12, 359)]:
        nf = 3 + doc_id % 6
        frames = [
            jpeg_encode_tiles(_avi_frame_tiles(doc_id, n_chars, f))
            for f in range(nf)
        ]
        th, tw = _avi_frame_tiles(doc_id, n_chars, 0).shape
        payload = avi_encode_mjpeg(frames, 8 * tw, 8 * th)
        uspf, n, w, h, out = avi_demux_mjpeg(payload)
        assert (uspf, n, w, h) == (83333, nf, 8 * tw, 8 * th)
        assert out == frames
        for f, fb in enumerate(out):
            img = jpeg_decode_pixels(fb)
            expect = np.kron(
                _avi_frame_tiles(doc_id, n_chars, f),
                np.ones((8, 8), dtype=np.uint8),
            )
            assert (img == expect).all()
    # malformed containers fail loudly
    for bad in (b"", b"RIFF\x00\x00\x00\x00AVI ", b"RIFX" + payload[4:],
                payload[:30]):
        with pytest.raises(ValueError):
            avi_demux_mjpeg(bad)
    # header/movi frame-count mismatch is detected
    tampered = bytearray(payload)
    import struct as st

    # avih dwTotalFrames is the 5th DWORD of the avih payload; find it
    i = payload.index(b"avih") + 8
    st.pack_into("<I", tampered, i + 16, 99)
    with pytest.raises(ValueError):
        avi_demux_mjpeg(bytes(tampered))


def test_wav_payloads_open_with_stdlib_wave(spark, sf_small):
    """The WAV payloads are REAL RIFF/PCM files: the standard-library
    ``wave`` module (an independent reader) must open them and agree
    with q_wav_decode's parsed parameters and samples."""
    import io
    import wave

    import numpy as np

    from data_pipeline_standalone_scripts_spark.sources.multimodal import wav_table

    rows = wav_table(spark, sf_small).limit(20).collect()
    assert rows
    for r in rows:
        with wave.open(io.BytesIO(bytes(r["payload"]))) as wf:
            assert wf.getnchannels() == 1
            assert wf.getsampwidth() == 2
            assert wf.getframerate() == 8000
            n = wf.getnframes()
            assert n == 800 + r["media_id"] % 800
            samples = np.frombuffer(wf.readframes(n), dtype="<i2").astype(np.int64)
        i = np.arange(n, dtype=np.int64)
        expect = (7 * r["media_id"] + 13 * i) % 4001 - 2000
        assert (samples == expect).all()


def test_pgm_payloads_are_standard_netpbm(spark, sf_small):
    """The PGM payloads parse with an independent minimal netpbm
    reader (regex header split, not the operator's parser) and the
    raster matches the generator formula byte-for-byte."""
    import re

    import numpy as np

    from data_pipeline_standalone_scripts_spark.sources.multimodal import pgm_table

    rows = pgm_table(spark, sf_small).limit(20).collect()
    assert rows
    for r in rows:
        p = bytes(r["payload"])
        m = re.match(rb"P5\s+(\d+)\s+(\d+)\s+(\d+)\s", p)
        assert m, "header is not canonical netpbm"
        w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
        assert maxval == 255
        raster = np.frombuffer(p, dtype=np.uint8, offset=m.end())
        assert raster.size == w * h
        did = r["media_id"]
        expect = (
            np.arange(w, dtype=np.int64)[None, :]
            + 31 * np.arange(h, dtype=np.int64)[:, None]
            + 7 * did
        ) % 256
        assert (raster.reshape(h, w) == expect).all()


def test_fft_lowpass_parseval_and_determinism(spark, sf_small):
    """Low-pass output energy must be positive, no greater than input
    energy (Parseval: zeroing bins only removes energy), ratio in
    (0, 1]; two runs identical."""
    from data_pipeline_standalone_scripts_spark.operators.reference_analogs import (
        q_fft_lowpass,
    )

    rows = q_fft_lowpass(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r["energy_in"] > 0
        assert 0 < r["energy_out"] <= r["energy_in"] + 1e-9
        assert 0 < r["ratio"] <= 1.0 + 1e-9
    again = q_fft_lowpass(spark, sf_small).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_evolutionary_sweep_improves_and_deterministic(spark, sf_small):
    """Best score per generation must be non-decreasing ((μ+λ)
    elitism: parents survive unmutated), and the whole trajectory
    deterministic."""
    from data_pipeline_standalone_scripts_spark.operators.reference_analogs import (
        EVO_GENERATIONS,
        q_evolutionary_sweep,
    )

    rows = q_evolutionary_sweep(spark, sf_small).collect()
    best = {}
    for r in rows:
        best[r["gen"]] = max(best.get(r["gen"], float("-inf")), r["score"])
    assert set(best) == set(range(EVO_GENERATIONS))
    for g in range(1, EVO_GENERATIONS):
        assert best[g] >= best[g - 1] - 1e-9, (g, best)
    again = q_evolutionary_sweep(spark, sf_small).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_haar_denoise_energy_and_determinism(spark, sf_small):
    """Orthonormal Haar: thresholding only removes energy; zeroed
    count within [0, 56] (3 levels ⇒ 32+16+8 detail coeffs);
    deterministic."""
    from data_pipeline_standalone_scripts_spark.operators.reference_analogs import (
        q_haar_denoise,
    )

    rows = q_haar_denoise(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r["energy_in"] > 0
        assert 0 <= r["energy_out"] <= r["energy_in"] + 1e-6
        assert 0 <= r["n_zeroed"] <= 56
    again = q_haar_denoise(spark, sf_small).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ann_signlsh_structure_recall_determinism(spark, sf_med):
    """Sign-LSH ANN: ≤k rows per query (bucket candidates may be
    scarce), similarities bounded by exact best, nonzero overlap with
    exact top-10 in aggregate, deterministic."""
    from data_pipeline_standalone_scripts_spark.operators.dedup_ext import (
        q_ann_signlsh,
    )

    rows = q_ann_signlsh(spark, sf_med).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) <= set(range(N_QUERIES))
    for qid, rs in by_q.items():
        assert len(rs) <= ANN_K
        assert all(r["vec_id"] != qid for r in rs)

    exact = _exact_topk(spark, sf_med).collect()
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(
        len(exact_by_q.get(q, set()) & {r["vec_id"] for r in rs})
        for q, rs in by_q.items()
    )
    assert hits >= 1, "sign-LSH candidates share nothing with exact top-k"

    again = q_ann_signlsh(spark, sf_med).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_connected_components_chain_and_singletons(spark):
    """Multi-hop propagation: a 6-node path (0-1-2-...-5) must collapse
    to cluster 0 even though nodes 0 and 5 never share an edge — the
    corpus's clique-like clusters converge in 1 hop and would not catch
    a broken propagation loop. Plus two singletons and a 2-cycle."""
    from data_pipeline_standalone_scripts_spark.operators.dedup_ext import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    undirected = [(i, i + 1) for i in range(5)] + [(8, 9)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in undirected] + [(b, a) for a, b in undirected],
        "src long, dst long",
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 6: 6, 7: 7, 8: 8, 9: 8}


def test_dedup_clusters_consistent_with_pairs(spark, sf_small):
    """Every verified near-dup pair must land in one cluster; exactly
    one keep=true doc per cluster, and it is the min doc_id."""
    from data_pipeline_standalone_scripts_spark.registry import REGISTRY

    out = REGISTRY["q_dedup_clusters"].fn(spark, sf_small).collect()
    cid = {r.doc_id: r.cluster_id for r in out}
    from data_pipeline_standalone_scripts_spark.operators.llm import q_minhash_lsh

    for p in q_minhash_lsh(spark, sf_small).select("doc_a", "doc_b").collect():
        assert cid[p.doc_a] == cid[p.doc_b]
    import collections

    members = collections.defaultdict(list)
    keeps = collections.defaultdict(list)
    for r in out:
        members[r.cluster_id].append(r.doc_id)
        if r.keep:
            keeps[r.cluster_id].append(r.doc_id)
    for c, docs in members.items():
        assert keeps[c] == [min(docs)] and c == min(docs)


def test_connected_components_random_graphs_match_union_find(spark):
    """Randomized cross-check: label propagation on Spark must equal a
    pure-Python union-find on arbitrary graphs (chains, forests, dense
    blobs) — seeds fixed for reproducibility."""
    import random

    from data_pipeline_standalone_scripts_spark.operators.dedup_ext import (
        connected_components,
    )

    rng = random.Random(42)
    n = 60
    edges_u = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges_u:
        parent[find(a)] = find(b)
    expected = {i: min(j for j in range(n) if find(j) == find(i)) for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edges_u if a != b]
        + [(b, a) for a, b in edges_u if a != b],
        "src long, dst long",
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert got == expected


def test_doc_chunks_reconstruct_document(spark, sf_small):
    """Overlap-chunking invariant: dropping the 8-token overlap from
    every chunk after the first and concatenating reconstructs the
    original token stream exactly."""
    from data_pipeline_standalone_scripts_spark.operators.textpipe import (
        CHUNK_STRIDE,
    )
    from data_pipeline_standalone_scripts_spark.registry import REGISTRY
    from data_pipeline_standalone_scripts_spark.tables import load

    import data_pipeline_standalone_scripts_spark as engine

    engine.load_all_operators()
    chunks = REGISTRY["q_doc_chunk"].fn(spark, sf_small).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load(spark, sf_small, "documents").select("doc_id", "text").collect()
    }
    from collections import defaultdict

    per_doc = defaultdict(list)
    for r in chunks:
        per_doc[r.doc_id].append(r)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        # every chunk is exactly the doc's token slice it claims to be
        for r in rows:
            toks = r.chunk_text.split(" ") if r.chunk_text else []
            assert toks == docs[doc_id][r.start_tok - 1 : r.start_tok - 1 + r.n_chunk_tokens]
        # coverage: last chunk must reach the end of the doc
        last = rows[-1]
        assert last.start_tok - 1 + last.n_chunk_tokens == len(docs[doc_id])
        # stride: consecutive chunks start CHUNK_STRIDE apart
        for a, b in zip(rows, rows[1:]):
            assert b.start_tok - a.start_tok == CHUNK_STRIDE


def test_pack_sequences_offsets_consistent(spark, sf_small):
    """Within each source shard (doc_id order): offset/pack arithmetic
    must chain exactly — next doc's exclusive cumsum = previous's plus
    its length; entropy of the packing is irrelevant, the bookkeeping
    must be airtight."""
    from data_pipeline_standalone_scripts_spark.operators.textpipe import PACK_BUDGET
    from data_pipeline_standalone_scripts_spark.registry import REGISTRY

    import data_pipeline_standalone_scripts_spark as engine

    engine.load_all_operators()
    rows = REGISTRY["q_pack_sequences"].fn(spark, sf_small).collect()
    from collections import defaultdict

    shards = defaultdict(list)
    for r in rows:
        shards[r.source].append(r)
    for _, rs in shards.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.pack_id == cum // PACK_BUDGET
            assert r.offset_in_pack == cum % PACK_BUDGET
            assert r.crosses_boundary == (cum % PACK_BUDGET + r.n_tokens > PACK_BUDGET)
            cum += r.n_tokens


def test_token_entropy_bounds(spark, sf_small):
    """0 ≤ H ≤ log2(n_distinct) with equality only in degenerate cases."""
    import math

    from data_pipeline_standalone_scripts_spark.registry import REGISTRY

    # per-term micro-rounding accumulates up to n_distinct * 5e-7
    import data_pipeline_standalone_scripts_spark as engine

    engine.load_all_operators()
    for r in REGISTRY["q_token_entropy"].fn(spark, sf_small).collect():
        assert -1e-4 <= r.entropy <= math.log2(r.n_distinct) + 1e-4


def test_cdc_upsert_counts(spark, sf_small):
    """Survivor accounting: kept + updated == snapshot − deleted;
    inserted == insert-rule matches; no deleted key survives."""
    from pyspark.sql import functions as F

    from data_pipeline_standalone_scripts_spark.registry import REGISTRY
    from data_pipeline_standalone_scripts_spark.tables import load

    import data_pipeline_standalone_scripts_spark as engine

    engine.load_all_operators()
    o = load(spark, sf_small, "orders")
    k = F.col("o_orderkey")
    n_total = o.count()
    n_del = o.filter(k % 100 == 7).count()
    n_upd = o.filter((k % 10 == 3) & (k % 100 != 7)).count()
    n_ins = o.filter(k % 50 == 1).count()
    out = REGISTRY["q_cdc_upsert"].fn(spark, sf_small)
    by_src = {r.src: r.n for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src.get("updated", 0) == n_upd
    assert by_src.get("inserted", 0) == n_ins
    assert by_src.get("kept", 0) == n_total - n_del - n_upd
    assert out.filter((F.col("o_orderkey") % 100 == 7) & (F.col("o_orderkey") < 10_000_000)).count() == 0


def test_vocab_coverage_invariants(spark, sf_small):
    """X45: per-lang token counts must sum to the corpus token count,
    OOV is a proper subset, and the most frequent corpus token is
    always IN vocabulary (so coverage responds to the vocab cut)."""
    import pyspark.sql.functions as F

    import data_pipeline_standalone_scripts_spark as engine

    engine.load_all_operators()
    from data_pipeline_standalone_scripts_spark.registry import REGISTRY
    from data_pipeline_standalone_scripts_spark.tables import load

    r = REGISTRY["q_vocab_coverage"].fn(spark, sf_small).toPandas()
    assert (r.n_oov <= r.n_tokens).all()
    assert ((r.oov_rate >= 0) & (r.oov_rate < 1)).all()
    d = load(spark, sf_small, "documents")
    total = d.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    assert int(r.n_tokens.sum()) == int(total)


def test_dedup_eval_confusion_consistency(spark, sf_small):
    """X46: the confusion counts must be internally consistent
    (tp <= both sides, fp/fn complements). SimHash at Hamming<=5 is
    PRECISION-biased against Jaccard>=0.8 truth (it approximates
    cosine, not Jaccard) — the eval op exists to measure exactly that:
    precision ~0.95, recall ~0.3 on this corpus."""
    import data_pipeline_standalone_scripts_spark as engine

    engine.load_all_operators()
    from data_pipeline_standalone_scripts_spark.registry import REGISTRY

    r = REGISTRY["q_dedup_eval"].fn(spark, sf_small).toPandas().iloc[0]
    assert r.tp <= r.n_pred and r.tp <= r.n_truth
    assert r.fp == r.n_pred - r.tp and r.fn == r.n_truth - r.tp
    assert r.precision >= 0.8  # tight radius: few false pairs
    assert 0 < r.recall < 1  # and a real, measured miss rate
