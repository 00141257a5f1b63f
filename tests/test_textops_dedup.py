"""Training-data operators: dedup, similarity, text analysis, multimodal."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )


DUP_CORPUS = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "the quick brown fox jumps over the lazy dog again and again today",  # exact dup of 0
    "the quick brown fox jumps over the lazy dog again and again tonight",  # near dup
    "completely different text about ray data pipelines and arrow batches",
    "ray data pipelines and arrow batches are completely different text about",  # shuffled words
    "short",
    "",
]


def test_exact_dedup(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import exact_dedup

    out = exact_dedup(_docs_ds(DUP_CORPUS)).to_pandas()
    assert len(out) == len(DUP_CORPUS) - 1  # one exact dup removed
    assert 0 in set(out["doc_id"]) and 1 not in set(out["doc_id"])  # min id kept


def test_corpus_clean_gate_then_dedup(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.corpus import corpus_clean

    good = "alpha beta gamma delta " * 6  # 24 tokens, alnum-heavy
    corpus = [
        good,
        good,  # exact dup of 0 — dropped (min doc_id kept)
        "short text",  # < min_tokens — gated
        "!!! ??? ... " * 30,  # low alnum ratio — gated
        good + "epsilon",  # distinct survivor
    ]
    out = corpus_clean(
        _docs_ds(corpus), min_tokens=20, min_alnum_ratio=0.7
    ).to_pandas()
    assert sorted(out["doc_id"]) == [0, 4]
    assert set(out.columns) == {"doc_id", "content_hash", "n_tokens"}
    assert out.set_index("doc_id")["n_tokens"][0] == 24

    # a batch where EVERY row is gated must not poison the schema
    empty = corpus_clean(_docs_ds(["tiny", "x y z"]), min_tokens=20).to_pandas()
    assert len(empty) == 0


def test_minhash_lsh_finds_near_dups(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import (
        jaccard_ngrams,
        minhash_lsh_pairs,
    )

    out = minhash_lsh_pairs(_docs_ds(DUP_CORPUS), threshold=0.5).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs  # exact dup (jaccard 1.0)
    assert (0, 2) in pairs and (1, 2) in pairs  # near dup
    # verified jaccard values are the exact kernel's
    row = out[(out.doc_a == 0) & (out.doc_b == 2)].iloc[0]
    assert abs(row["jaccard"] - jaccard_ngrams(DUP_CORPUS[0], DUP_CORPUS[2])) < 1e-6  # output rounded to 6
    # all reported pairs truly pass the threshold (no false positives survive)
    for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"]):
        assert jaccard_ngrams(DUP_CORPUS[a], DUP_CORPUS[b]) >= 0.5


def test_minhash_vs_bruteforce_recall(ray_session):
    """On a corpus with seeded near-dups, LSH at t=0.5 finds every pair whose
    true Jaccard is well above threshold (16 bands × 8 rows ⇒ ~99% @ 0.7)."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import (
        jaccard_ngrams,
        minhash_lsh_pairs,
    )

    rng = np.random.default_rng(5)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    base = [" ".join(rng.choice(words, 30)) for _ in range(20)]
    corpus = []
    for t in base:
        corpus.append(t)
        toks = t.split()
        toks[rng.integers(0, len(toks))] = "mutated"
        corpus.append(" ".join(toks))  # high-jaccard partner
    out = minhash_lsh_pairs(_docs_ds(corpus), threshold=0.5).to_pandas()
    found = set(zip(out["doc_a"], out["doc_b"]))
    for i in range(0, len(corpus), 2):
        if jaccard_ngrams(corpus[i], corpus[i + 1]) >= 0.7:
            assert (i, i + 1) in found


def test_simhash_near_dup_properties(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import simhash64

    out = simhash64(_docs_ds(DUP_CORPUS)).to_pandas().set_index("doc_id")["simhash"]
    h = out.to_dict()
    assert h[0] == h[1]  # identical text → identical simhash
    ham = bin(np.uint64(h[0]) ^ np.uint64(h[2])).count("1")
    ham_far = bin(np.uint64(h[0]) ^ np.uint64(h[3])).count("1")
    assert ham < ham_far  # near dup closer than unrelated


def test_fingerprint_deterministic(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import fingerprint

    a = fingerprint(_docs_ds(DUP_CORPUS)).to_pandas()
    b = fingerprint(_docs_ds(DUP_CORPUS)).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert a.loc[0, "fingerprint"] == a.loc[1, "fingerprint"]


def test_lang_id_heuristic(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import lang_id

    texts = [
        "the cat and the dog in a house for it is that",
        "der Hund und die Katze ist ein zu den nicht von",
        "le chat et la maison les des un une est que pour",
        "el perro la casa los las es un una que por para",
        "这是 一个 中文 文本 数据",
    ]
    out = lang_id(_docs_ds(texts)).to_pandas().sort_values("doc_id")
    assert list(out["lang_pred"]) == ["en", "de", "fr", "es", "zh"]


def test_token_count_and_stats_empty_and_unicode(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import text_stats, token_count

    texts = ["", "  ", "a b  c", "hello, world! 42"]
    tc = token_count(_docs_ds(texts)).to_pandas().sort_values("doc_id")
    assert list(tc["n_tokens"]) == [0, 0, 3, 3]
    assert list(tc["n_subtokens"]) == [0, 0, 3, 5]  # hello , world ! 42
    st = text_stats(_docs_ds(texts)).to_pandas().sort_values("doc_id")
    assert list(st["n_chars"]) == [0, 2, 6, 16]
    assert st.loc[2, "avg_token_len"] == 1.0


def test_ann_topk_exact(ray_session):
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.similarity import ann_topk

    rng = np.random.default_rng(2)
    n, dim = 200, 16
    M = rng.standard_normal((n, dim)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.array(list(M), type=pa.list_(pa.float32())),
            }
        )
    )
    out = ann_topk(ds, [0, 5], k=3).to_pandas()
    # oracle
    Mn = M.astype(np.float64)
    Mn /= np.linalg.norm(Mn, axis=1, keepdims=True)
    for q in (0, 5):
        cos = Mn @ Mn[q]
        cos[q] = -np.inf
        top = np.argsort(-np.round(cos, 6), kind="stable")[:3]
        got = out[out.query_id == q].sort_values("rank")["vec_id"].to_numpy()
        assert np.array_equal(got, top)


def test_ann_ivf_recall(ray_session):
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.similarity import ann_topk, ann_topk_ivf

    rng = np.random.default_rng(4)
    n, dim = 400, 16
    M = rng.standard_normal((n, dim)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.array(list(M), type=pa.list_(pa.float32())),
            }
        )
    )
    exact = ann_topk(ds, [1], k=10).to_pandas()
    approx = ann_topk_ivf(ds, [1], k=10, n_cells=8, nprobe=4).to_pandas()
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.5  # nprobe=4 of 8 cells


def test_multimodal_actor_pool_stages(ray_session):
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.multimodal import (
        FrameSampleStage,
        ImageResizeStage,
        decode_features,
        synth_media_table,
    )

    media = rd.from_arrow(synth_media_table(30))
    feats = decode_features(media, concurrency=2).to_pandas()
    assert len(feats) == 30 and {"media_id", "px_mean", "px_std"} == set(feats.columns)
    feats2 = decode_features(rd.from_arrow(synth_media_table(30)), concurrency=2).to_pandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        feats2.sort_values("media_id").reset_index(drop=True),
    )  # deterministic real decode

    # thumbnails: image rows only (10 of 30), real PPM re-encode roundtrip
    from subgraph_isomorphism_pregel_ray.pipelines.multimodal import decode_ppm

    thumbs = media.map_batches(
        ImageResizeStage, batch_format="pyarrow", batch_size=16, concurrency=2,
        fn_constructor_kwargs={"out_w": 8, "out_h": 6},
    ).to_pandas()
    assert len(thumbs) == 10
    assert all(decode_ppm(t).shape == (6, 8, 3) for t in thumbs["thumb"])

    frames = media.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas()
    assert len(frames) == 10 * 3  # video rows only: 30 frames / every 10
    assert frames.groupby("media_id").size().eq(3).all()


def test_dedup_groups_resolution(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import dedup_groups

    out = dedup_groups(_docs_ds(DUP_CORPUS), threshold=0.5).to_pandas()
    assert len(out) == len(DUP_CORPUS)
    by_doc = out.set_index("doc_id")
    # docs 0,1,2 form one near-dup group; 3,4 another; 5,6 singletons
    assert by_doc.loc[0, "group"] == by_doc.loc[1, "group"] == by_doc.loc[2, "group"]
    assert by_doc.loc[3, "group"] == by_doc.loc[4, "group"]
    assert by_doc.loc[5, "group"] != by_doc.loc[6, "group"]
    # canonical member = min doc_id of each group; exactly one keep per group
    assert bool(by_doc.loc[0, "keep"]) and not by_doc.loc[1, "keep"]
    assert out.groupby("group")["keep"].sum().eq(1).all()


def test_doc_repetition_known_ratios(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import doc_repetition

    corpus = [
        "a a a a",            # 4 tokens, 1 distinct, top=4/4, bigrams: aa x3 -> 1 distinct
        "w x y z",            # all distinct
        "p q p q p",          # 5 tokens {p:3,q:2}; bigrams pq,qp,pq,qp -> 2 distinct of 4
        "",                   # empty -> zeros
        "solo",               # 1 token, no bigrams
    ]
    out = (
        doc_repetition(_docs_ds(corpus)).to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "dup_token_ratio"] == 3 / 4
    assert out.loc[0, "top_token_ratio"] == 1.0
    assert out.loc[0, "dup_bigram_ratio"] == 2 / 3
    assert out.loc[1, "dup_token_ratio"] == 0.0
    assert out.loc[1, "dup_bigram_ratio"] == 0.0
    assert out.loc[2, "top_token_ratio"] == 3 / 5
    assert out.loc[2, "dup_bigram_ratio"] == 2 / 4
    assert (out.loc[3] == 0).all()
    assert out.loc[4, "n_tokens"] == 1 and out.loc[4, "dup_bigram_ratio"] == 0.0


def test_contamination_overlap(ray_session):
    """doc 0 is the benchmark (0 % 37 == 0); doc 37 would be too but ids are
    small here. Non-benchmark docs scored by distinct-trigram overlap."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import contamination

    corpus = [
        "alpha beta gamma delta epsilon",          # benchmark doc (id 0)
        "alpha beta gamma zeta eta",               # shares exactly 1 trigram
        "alpha beta gamma delta epsilon extra",    # 4 trigrams, 3 in benchmark
        "totally unrelated words here now",        # 0 overlap
        "xy yz",                                   # < 3 tokens -> 0 grams
    ]
    out = (
        contamination(_docs_ds(corpus), bench_mod=37)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert 0 not in out.index  # benchmark docs excluded from scoring
    assert out.loc[1, "n_grams"] == 3 and out.loc[1, "n_hit"] == 1
    assert out.loc[2, "n_grams"] == 4 and out.loc[2, "n_hit"] == 3
    assert out.loc[3, "n_hit"] == 0
    assert out.loc[4, "n_grams"] == 0 and out.loc[4, "contamination_ratio"] == 0.0


def test_unigram_quality_numpy_parity(ray_session):
    """Engine result == a direct numpy replay of the definition, and is
    invariant to batch size (the bucket shuffle must not change sums)."""
    from collections import Counter

    from subgraph_isomorphism_pregel_ray.pipelines.textops import unigram_quality

    rng = np.random.default_rng(7)
    vocab = ["tok%d" % i for i in range(40)]
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
        for _ in range(50)
    ]
    corpus.append("")  # empty doc: must simply be absent from the output
    out = (
        unigram_quality(_docs_ds(corpus)).to_pandas().set_index("doc_id").sort_index()
    )
    toks = [t.split() for t in corpus]
    cf = Counter(w for tt in toks for w in tt)
    T = sum(cf.values())
    assert len(out) == 50  # empty doc dropped
    for d in [0, 7, 49]:
        tt = toks[d]
        n = len(tt)
        num = sum(cf[w] for w in tt)
        hap = sum(1 for w in tt if cf[w] == 1)
        assert out.loc[d, "n_tokens"] == n
        assert out.loc[d, "mean_relfreq"] == num / (n * T)
        assert out.loc[d, "hapax_ratio"] == hap / n


def test_neighbor_sample_cap_and_determinism(ray_session):
    """Every src keeps min(degree, k) neighbors; ranks are 1..m; the chosen
    set is a pure function of the edges — invariant to partitioning."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import neighbor_sample

    rng = np.random.default_rng(3)
    src = rng.integers(0, 30, size=400).astype(np.int64)
    dst = rng.integers(0, 30, size=400).astype(np.int64)
    keep = src != dst
    edges = pa.table({"src": src[keep], "dst": dst[keep]})
    # dedup directed edges (neighbor_sample assumes a distinct edge set)
    import pandas as pd

    e = edges.to_pandas().drop_duplicates().reset_index(drop=True)
    deg = e.groupby("src").size()

    outs = []
    for blocks in (1, 7):
        ds = rd.from_pandas(e).repartition(blocks)
        out = (
            neighbor_sample(ds, k=5)
            .to_pandas()
            .sort_values(["src", "rnk"])
            .reset_index(drop=True)
        )
        outs.append(out)
    assert outs[0].equals(outs[1])  # partition-invariant
    got = outs[0].groupby("src").size()
    for s, d in deg.items():
        assert got.get(s, 0) == min(d, 5)
    assert (outs[0].groupby("src")["rnk"].min() == 1).all()
    assert (outs[0].groupby("src")["rnk"].max() == outs[0].groupby("src").size()).all()


def test_chunk_documents_reconstruction(ray_session):
    """Chunks rejoin to the space-normalized doc; sizes are window-capped."""
    from subgraph_isomorphism_pregel_ray.pipelines.corpus import chunk_documents

    corpus = [
        " ".join("t%d" % i for i in range(47)),  # 47 tokens -> 3 chunks of 20/20/7
        "a b",
        "",
    ]
    out = (
        chunk_documents(_docs_ds(corpus), window=20)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    assert list(d0["n_tokens"]) == [20, 20, 7]
    assert " ".join(d0["chunk_text"]) == corpus[0]
    assert list(out[out.doc_id == 1]["chunk_text"]) == ["a b"]
    assert 2 not in set(out["doc_id"])  # empty doc yields no chunks


def test_pack_sequences_prefix_and_invariance(ray_session):
    """seq_id/seq_offset replay the exclusive token prefix sum in doc_id
    order, at any partitioning."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.corpus import pack_sequences

    rng = np.random.default_rng(11)
    corpus = [" ".join(["w"] * int(n)) for n in rng.integers(0, 40, size=60)]
    outs = []
    for blocks in (1, 9):
        ds = _docs_ds(corpus).repartition(blocks)
        outs.append(
            pack_sequences(ds, seq_len=64)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
    lens = np.array([len(t.split()) for t in corpus], dtype=np.int64)
    prefix = np.cumsum(lens) - lens
    assert (outs[0]["n_tokens"].to_numpy() == lens).all()
    assert (outs[0]["seq_id"].to_numpy() == prefix // 64).all()
    assert (outs[0]["seq_offset"].to_numpy() == prefix % 64).all()


def test_redact_pii_replacements(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import redact_pii

    corpus = [
        "contact me at alice.smith+spam@example.co.uk or bob@test.org today",
        "server at 192.168.0.1 and backup 10.0.0.255 are down",
        "email first: a@b.io then host 127.0.0.1 mixed",
        "nothing sensitive here",
        "",
    ]
    out = (
        redact_pii(_docs_ds(corpus)).to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "clean_text"] == "contact me at <EMAIL> or <EMAIL> today"
    assert out.loc[0, "n_emails"] == 2 and out.loc[0, "n_ips"] == 0
    assert out.loc[1, "clean_text"] == "server at <IP> and backup <IP> are down"
    assert out.loc[1, "n_ips"] == 2
    assert out.loc[2, "clean_text"] == "email first: <EMAIL> then host <IP> mixed"
    assert out.loc[3, "clean_text"] == corpus[3]
    assert out.loc[4, "clean_text"] == ""


def test_curate_corpus_reason_ladder(ray_session):
    """One doc per verdict, incl. the duplicate path and first-failing-gate
    precedence (a short AND repetitive doc reads 'short')."""
    from subgraph_isomorphism_pregel_ray.pipelines.corpus import curate_corpus

    good = " ".join("longword%02d" % i for i in range(30))
    # doc 0 is always a benchmark doc (0 % m == 0); max_contamination=2.0
    # disables that gate so this test isolates the other four verdicts
    corpus = [
        good,                                   # 0: ok (kept, min id of its group)
        "too short",                            # 1: short (also repetitive-ish)
        "!!! ??? " * 10,                        # 2: alnum (20 tokens, low alnum)
        " ".join(["repeatedword"] * 25),        # 3: repetitive (dup ratio 0.96)
        good,                                   # 4: duplicate of 0
    ]
    out = (
        curate_corpus(_docs_ds(corpus), max_contamination=2.0)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out["reason"]) == ["ok", "short", "alnum", "repetitive", "duplicate"]
    assert list(out["keep"]) == [True, False, False, False, False]


def test_curate_corpus_contamination_gate(ray_session):
    """A non-benchmark doc that is a near-copy of the benchmark doc is
    rejected as contaminated; the benchmark doc itself skips the gate."""
    from subgraph_isomorphism_pregel_ray.pipelines.corpus import curate_corpus

    bench = " ".join("benchword%02d" % i for i in range(40))
    near_copy = bench + " tailword1 tailword2"
    clean = " ".join("cleanword%02d" % i for i in range(40))
    corpus = [bench, near_copy, clean]  # doc 0 is benchmark (0 % 37 == 0)
    out = (
        curate_corpus(_docs_ds(corpus))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "reason"] == "ok"  # benchmark doc skips the gate
    assert out.loc[1, "reason"] == "contaminated" and not out.loc[1, "keep"]
    assert out.loc[2, "reason"] == "ok"


def test_knn_graph_vs_numpy(ray_session):
    """k-NN graph == direct numpy all-pairs replay; no driver fold, each
    vector ranked fully inside its own batch."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.similarity import knn_graph
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away

    rng = np.random.default_rng(9)
    n, dim, k = 60, 8, 4
    M = rng.normal(size=(n, dim)).astype(np.float64)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": [row.astype(np.float32).tolist() for row in M],
            }
        )
    ).repartition(5)
    out = (
        knn_graph(emb, k=k)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    Mf = M.astype(np.float32).astype(np.float64)  # storage dtype roundtrip
    Mn = Mf / np.linalg.norm(Mf, axis=1, keepdims=True)
    cos6 = round_half_away(Mn @ Mn.T, 6)
    for v in range(n):
        c = cos6[v].copy()
        ids = np.arange(n)
        mask = ids != v
        order = np.lexsort((ids[mask], -c[mask]))[:k]
        exp = ids[mask][order]
        got = out[out.vec_id == v]["nbr_id"].to_numpy()
        assert np.array_equal(got, exp), v
    assert out.groupby("vec_id").size().eq(k).all()


def test_ppm_pcm_codec_roundtrip(ray_session):
    """The numpy codecs are real: encode→decode is byte/array-exact, and
    the area-mean resize averages exact pixel blocks."""
    from subgraph_isomorphism_pregel_ray.pipelines.multimodal import (
        decode_pcm,
        decode_ppm,
        decode_ppm_stream,
        encode_pcm,
        encode_ppm,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    stream = b"".join(encode_ppm(img) for _ in range(4))
    fr = decode_ppm_stream(stream)
    assert len(fr) == 4 and all(np.array_equal(f, img) for f in fr)
    pcm = rng.integers(-32768, 32768, 777).astype(np.int16)
    assert np.array_equal(decode_pcm(encode_pcm(pcm)), pcm)


def test_write_clean_corpus_resumable(ray_session, tmp_path):
    """End-to-end: curation verdicts -> join-back -> resumable hive shards;
    a re-run skips every sealed shard and the kept set matches the verdict
    table exactly."""
    import ray.data as rd
    import pyarrow.dataset as pads

    from subgraph_isomorphism_pregel_ray.pipelines.corpus import (
        curate_corpus,
        write_clean_corpus,
    )

    good = [" ".join("tokenword%02d_%d" % (j, i) for j in range(25)) for i in range(12)]
    bad = ["too short", "!!! ??? " * 10]
    corpus = good + bad
    docs = _docs_ds(corpus).repartition(3)
    out = str(tmp_path / "clean")

    s1 = write_clean_corpus(docs, out, num_shards=4, max_contamination=2.0)
    assert s1["kept"] == len(good)
    back = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    assert sorted(back["doc_id"]) == list(range(len(good)))

    s2 = write_clean_corpus(docs, out, num_shards=4, max_contamination=2.0)
    assert s2["kept"] == len(good)
    assert s2.get("skipped", s2.get("shards_skipped", 0)) and not s2.get(
        "written", s2.get("shards_written", 1)
    )  # all shards sealed -> nothing rewritten


def test_collocations_vs_counter(ray_session):
    """Engine PMI top-k == a direct Counter replay (score, order, cut), at
    any partitioning."""
    from collections import Counter

    rng = np.random.default_rng(13)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 25))) for _ in range(40)
    ]
    corpus += ["alpha beta " * 10] * 3  # a strong collocation
    from subgraph_isomorphism_pregel_ray.pipelines.textops import collocations_topk

    outs = []
    for blocks in (1, 6):
        ds = _docs_ds(corpus).repartition(blocks)
        outs.append(
            collocations_topk(ds, k=10, min_count=3).to_pandas().reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
    toks = [t.split() for t in corpus]
    uc = Counter(w for tt in toks for w in tt)
    bc = Counter((tt[j], tt[j + 1]) for tt in toks for j in range(len(tt) - 1))
    T, B = sum(uc.values()), sum(bc.values())
    exp = sorted(
        (
            (-(c * T * T) / (B * uc[a] * uc[b]), a, b, c)
            for (a, b), c in bc.items()
            if c >= 3
        ),
    )[:10]
    got = outs[0]
    for i, (negscore, a, b, c) in enumerate(exp):
        assert got.loc[i, "w1"] == a and got.loc[i, "w2"] == b
        assert got.loc[i, "pair_cnt"] == c
        assert got.loc[i, "score"] == -negscore


def test_heavy_hitters_zipf_exact_and_pruned(ray_session):
    """Skewed corpus with vocab ≫ the MG counter budget: the sketch pass
    must actually prune (k = 2·denom = 8 counters per batch vs 400+ distinct
    tokens), yet the verified output is EXACTLY the Counter oracle's."""
    from collections import Counter

    from subgraph_isomorphism_pregel_ray.pipelines.textops import heavy_hitters

    rng = np.random.default_rng(7)
    vocab = [f"w{i:04d}" for i in range(400)]
    # 2 true heavy hitters (30% / 25% of mass) over a long uniform tail
    texts = [
        " ".join(
            ["hot1"] * 18 + ["hot2"] * 15 + ["hot3"] * 12
            + rng.choice(vocab, size=15).tolist()
        )
        for _ in range(80)
    ]
    texts.append("")  # empty row must not break tokenization
    ds = _docs_ds(texts)

    denom = 4  # tiny: k = 8 counters per batch → MG prune definitely fires
    out = heavy_hitters(ds, denom=denom).to_pandas()

    cnt = Counter(w for t in texts for w in t.split())
    n = sum(cnt.values())
    thr = (n + denom - 1) // denom
    expect = sorted(
        ((w, c) for w, c in cnt.items() if c >= thr), key=lambda x: (-x[1], x[0])
    )
    assert [w for w, _ in expect] == ["hot1", "hot2"]  # the planted hitters
    got = list(zip(out["token"].tolist(), out["cnt"].tolist()))
    assert got == expect

    # zipf-tail-only corpus: NO token reaches N/4 — exercises the
    # empty-candidate early-out of the sketch pass
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()
    flat = [" ".join(rng.choice(vocab, size=60, p=p).tolist()) for _ in range(80)]
    none = heavy_hitters(_docs_ds(flat), denom=denom)
    assert none.count() == 0


def test_heavy_hitters_empty_and_threshold_edge(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import heavy_hitters

    empty = heavy_hitters(_docs_ds(["", "   "]), denom=10)
    assert empty.count() == 0
    assert [f.name for f in empty.schema().base_schema] == ["token", "cnt"]

    # uniform corpus: every token sits exactly AT the ceil threshold
    ds = _docs_ds(["a b c d"] * 5)  # each token count 5, N=20, denom=4 → thr=5
    out = heavy_hitters(ds, denom=4).to_pandas()
    assert out["token"].tolist() == ["a", "b", "c", "d"]
    assert out["cnt"].tolist() == [5, 5, 5, 5]


def test_train_val_test_split_stable_and_batch_invariant(ray_session):
    """Split is a pure function of doc_id: identical at any batch size,
    fractions near 80/10/10, and stable under pre-sampling (no document
    drifts between splits when the corpus is subsampled first)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        stratified_sample,
        train_val_test_split,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table("/root/testdata/sf0.001", "documents",
                      columns=["doc_id", "lang"])
    full = {}
    for bs in (16, 512):
        out = (
            train_val_test_split(docs.map_batches(lambda t: t, batch_size=bs))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        full[bs] = out
    assert (full[16]["split"].values == full[512]["split"].values).all()
    frac = full[512]["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9 and frac["val"] < 0.2 and frac["test"] < 0.2
    # sample first, then split: every surviving doc keeps its assignment
    sampled = train_val_test_split(
        stratified_sample(docs, rates={"en": 0.25})
    ).to_pandas().set_index("doc_id")["split"]
    base = full[512].set_index("doc_id")["split"]
    assert (base.loc[sampled.index] == sampled).all()


def test_doc_cross_entropy_vs_brute(ray_session):
    """Cross-entropy == single-process Counter recomputation with the same
    whitespace tokens (repeats weighted, empty docs dropped)."""
    import collections
    import math

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        _tokens,
        doc_cross_entropy,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    docs = read_table(sf, "documents", columns=["doc_id", "text"])
    got = doc_cross_entropy(docs).to_pandas().set_index("doc_id")
    raw = docs.to_pandas()
    corpus = collections.Counter()
    per_doc = {}
    for did, text in zip(raw["doc_id"], raw["text"]):
        tt = _tokens(text)
        if tt:
            per_doc[int(did)] = tt
            corpus.update(tt)
    N = sum(corpus.values())
    assert len(got) == len(per_doc)
    for did, tt in per_doc.items():
        exp = sum(-math.log(corpus[t] / N) for t in tt) / len(tt)
        assert got.loc[did, "n_tokens"] == len(tt)
        assert abs(got.loc[did, "cross_entropy"] - exp) < 1e-6, did


def test_oov_rate_vs_counter_brute(ray_session):
    """oov_rate == a Python Counter replay of the top-k cut + membership,
    including the (cnt DESC, token ASC) tie-break and the empty doc."""
    from collections import Counter

    from subgraph_isomorphism_pregel_ray.pipelines.textops import oov_rate

    out = oov_rate(_docs_ds(DUP_CORPUS), k=5).to_pandas().set_index("doc_id")
    c = Counter()
    for t in DUP_CORPUS:
        c.update(t.split())
    vocab = {
        tok for tok, _n in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    }
    for i, t in enumerate(DUP_CORPUS):
        toks = t.split()
        n_oov = sum(1 for x in toks if x not in vocab)
        assert out.loc[i, "n_tokens"] == len(toks)
        assert out.loc[i, "n_oov"] == n_oov
        exp_rate = round(n_oov / max(len(toks), 1), 6)
        assert abs(out.loc[i, "oov_rate"] - exp_rate) < 1e-12
    assert out["n_oov"].sum() > 0  # the cut actually excludes tokens


def test_dup_span_pairs_scalar_reference(ray_session):
    """dup_span_pairs == pure-python window-set intersection counts, at two
    block layouts (partition invariance), with short docs excluded."""
    import itertools

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import dup_span_pairs

    boiler = "This standard licence block is included verbatim in many files. "
    texts = [
        boiler * 3 + "document one talks about graphs and rivers at length",
        "document two, unrelated prologue text, then " + boiler * 3,
        boiler + "short tail",
        "no shared spans here at all; entirely original prose about owls "
        "and their surprisingly quiet wing feathers in the night forest",
        "tiny",  # < span_len → contributes no windows
        boiler * 2,  # exact subset of 0/1's boilerplate run
    ]
    L, K = 40, 5
    wins = {
        i: {t[j : j + L] for j in range(len(t) - L + 1)}
        for i, t in enumerate(texts)
        if len(t) >= L
    }
    ref = {}
    for a, b in itertools.combinations(sorted(wins), 2):
        n = len(wins[a] & wins[b])
        if n >= K:
            ref[(a, b)] = n
    assert ref, "corpus must actually contain duplicated spans"
    assert 4 not in {d for pair in ref for d in pair}

    for blocks in (1, 4):
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": np.arange(len(texts), dtype=np.int64),
                    "text": texts,
                }
            )
        ).repartition(blocks)
        out = dup_span_pairs(ds, span_len=L, min_shared=K).to_pandas()
        got = {
            (int(r.doc_a), int(r.doc_b)): int(r.n_shared)
            for r in out.itertuples()
        }
        assert got == ref, f"blocks={blocks}"


def test_dup_span_pairs_empty_and_threshold(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import dup_span_pairs

    # all docs below span_len → zero rows (same len-only contract as the
    # other pair ops in test_text_and_event_ops_on_empty_tables)
    out = dup_span_pairs(_docs_ds(["a", "bb", ""]), span_len=40).to_pandas()
    assert len(out) == 0

    # threshold cut: two docs sharing exactly one window
    t = "x" * 39 + "QZ"  # windows: x*39+Q (pos 0), x*38+QZ (pos 1)
    docs = ["A" + t, "B" + t]  # share the two t-interior windows only
    shared = len(
        {docs[0][i : i + 40] for i in range(len(docs[0]) - 39)}
        & {docs[1][i : i + 40] for i in range(len(docs[1]) - 39)}
    )
    got = dup_span_pairs(_docs_ds(docs), span_len=40, min_shared=1).to_pandas()
    assert len(got) == 1 and int(got["n_shared"][0]) == shared
    none = dup_span_pairs(
        _docs_ds(docs), span_len=40, min_shared=shared + 1
    ).to_pandas()
    assert len(none) == 0


# ---------------------------------------------------------------------------
def _winnow_reference(text, k, w):
    """Scalar winnowing reference: rolling hash, per-window rightmost min."""
    B = 1099511628211
    cps = [ord(c) for c in text]
    if len(cps) < k:
        return set()
    hs = []
    for j in range(len(cps) - k + 1):
        h = 0
        for i in range(k):
            h = (h + cps[j + i] * pow(B, k - 1 - i, 1 << 64)) % (1 << 64)
        hs.append(h)
    sel = set()
    if len(hs) < w:
        mn = min(hs)
        j = max(i for i, h in enumerate(hs) if h == mn)
        return {(j + 1, mn)}
    for ws in range(len(hs) - w + 1):
        window = hs[ws : ws + w]
        mn = min(window)
        j = ws + max(i for i, h in enumerate(window) if h == mn)
        sel.add((j + 1, mn))
    return sel


@pytest.mark.parametrize("k,w", [(4, 5), (8, 12), (3, 2)])
def test_winnow_vs_scalar_reference(ray_session, k, w):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import winnow_batch

    rng = np.random.default_rng(5)
    texts = [
        "".join(rng.choice(list("abcde "), size=n))
        for n in [0, k - 1, k, k + w - 2, k + w - 1, 60, 200]
    ]
    got = winnow_batch(
        pa.table({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}),
        k=k,
        w=w,
    ).to_pandas()
    for did, t in enumerate(texts):
        exp = {
            (p, h - (1 << 64) if h >= (1 << 63) else h)
            for p, h in _winnow_reference(t, k, w)
        }
        g = got[got.doc_id == did]
        assert set(zip(g.pos, g.fp)) == exp, f"doc {did} len {len(t)}"


def test_winnow_guarantees(ray_session):
    """Paper properties: shared substrings ≥ w+k−1 chars share a
    fingerprint; consecutive selected positions are ≤ w apart."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import winnow_batch

    k, w = 8, 12
    shared = "this exact licence block is repeated verbatim across documents"
    a = "prefix one two three " + shared + " and then diverges completely"
    b = "a different opening sentence here " + shared + " with another tail"
    got = winnow_batch(
        pa.table({"doc_id": np.array([0, 1], dtype=np.int64), "text": [a, b]}),
        k=k,
        w=w,
    ).to_pandas()
    fp0 = set(got[got.doc_id == 0].fp)
    fp1 = set(got[got.doc_id == 1].fp)
    assert len(shared) >= w + k - 1
    assert fp0 & fp1, "shared substring must yield a shared fingerprint"
    for did, t in [(0, a), (1, b)]:
        pos = np.sort(got[got.doc_id == did].pos.to_numpy())
        assert pos[0] <= w  # density: a fingerprint within the first window
        assert (np.diff(pos) <= w).all()


def test_winnow_dup_pairs_vs_scalar(ray_session):
    """Pair counts must equal the scalar winnow-set intersection; exact
    dups share every fingerprint; unrelated docs share none."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import winnow_dup_pairs

    k, w = 10, 6
    base = "the quick brown fox jumps over the lazy dog while the band plays on"
    texts = [
        base + " in the summer rain",
        base + " in the summer rain",          # exact dup of 0
        base + " during a winter storm",        # shares the long prefix
        "zq xv jk wp mn bt unrelated gibberish tokens entirely elsewhere",
        "",
    ]
    got = (
        winnow_dup_pairs(_docs_ds(texts), k=k, w=w, min_shared=2)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    sets = [
        {fp for _, fp in _winnow_reference(t, k, w)} for t in texts
    ]
    exp = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            n = len(sets[a] & sets[b])
            if n >= 2:
                exp.append((a, b, n))
    assert list(map(tuple, got.values)) == exp
    assert (0, 1, len(sets[0])) in exp  # exact dup shares the full set


def test_winnow_dup_pairs_threshold_and_empty(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import winnow_dup_pairs

    texts = ["completely different alpha", "another beta text entirely"]
    assert len(winnow_dup_pairs(_docs_ds(texts), k=8, w=4, min_shared=1).to_pandas()) == 0
    assert len(winnow_dup_pairs(_docs_ds([]), k=8, w=4).to_pandas()) == 0


def test_countmin_sketch_properties(ray_session):
    """est == scalar CountMin replay; est ≥ cnt always; with a wide sketch
    (no collisions among few tokens) est == cnt exactly."""
    from collections import Counter

    from subgraph_isomorphism_pregel_ray.functions.hashing import md5_lower64
    from subgraph_isomorphism_pregel_ray.pipelines.textops import countmin_topk

    texts = [
        "apple banana apple cherry",
        "banana apple date elderberry fig",
        "apple banana banana grape",
        "",
    ]
    true = Counter(t for x in texts for t in x.split())

    def scalar_cm(d, width):
        cm = np.zeros((d, width), dtype=np.int64)
        for tok, c in true.items():
            for r in range(d):
                cm[r][int(md5_lower64(np.array([f"{r}:{tok}"], dtype=object))[0] % np.uint64(width))] += c
        return cm

    # tiny width forces collisions → overestimates, still = scalar replay
    got = countmin_topk(_docs_ds(texts), k=10, d=3, width=4).to_pandas()
    cm = scalar_cm(3, 4)
    for _, row in got.iterrows():
        cells = [int(md5_lower64(np.array([f"{r}:{row.token}"], dtype=object))[0] % np.uint64(4)) for r in range(3)]
        assert row.est == min(cm[r][c] for r, c in enumerate(cells))
        assert row.est >= row.cnt == true[row.token]
    assert (got.est > got.cnt).any()  # collisions actually happened at width 4

    # wide sketch: 7 tokens into 4096 cells × 4 rows → no collision, est exact
    wide = countmin_topk(_docs_ds(texts), k=10, d=4, width=4096).to_pandas()
    assert (wide.est == wide.cnt).all()
    # vocab_topk total order: cnt desc then token asc
    assert list(wide.token[:2]) == ["apple", "banana"]


def test_nb_classifier_vs_scalar(ray_session):
    """Engine NB must equal the dense scalar computation (incl. empty-doc
    prior-only scoring and label-asc tie-break on rounded scores)."""
    import math
    from collections import Counter

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.textops import nb_classifier

    texts = [
        ("apple banana apple", "fruit"),
        ("banana cherry banana date", "fruit"),
        ("wrench hammer bolt", "tool"),
        ("hammer bolt bolt screwdriver", "tool"),
        ("apple hammer", "fruit"),
        ("", "tool"),          # empty doc → prior-only score
        ("zebra quark", "tool"),  # all-unseen-in-fruit tokens
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": [t for t, _ in texts],
                "source": [s for _, s in texts],
            }
        )
    )
    got = (
        nb_classifier(ds, label_col="source")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # dense scalar replay
    labels = sorted({s for _, s in texts})
    cnt = {s: Counter() for s in labels}
    for t, s in texts:
        cnt[s].update(t.split())
    vocab = {w for c in cnt.values() for w in c}
    tot = {s: sum(cnt[s].values()) for s in labels}
    prior = Counter(s for _, s in texts)
    for did, (t, _) in enumerate(texts):
        scores = []
        for s in labels:
            sc = math.log(prior[s] / len(texts)) - len(t.split()) * math.log(
                tot[s] + len(vocab)
            )
            for w, k in Counter(t.split()).items():
                sc += k * math.log(cnt[s][w] + 1)
            scores.append(float(round_half_away(np.array([sc]), 6)[0]))
        best = int(np.argmax(scores))
        assert got.loc[did, "pred"] == labels[best], did
        assert got.loc[did, "score"] == scores[best], did
    # the empty doc took the max-prior label (tool: 4 docs vs 3)
    assert got.loc[5, "pred"] == "tool"


def test_lang_by_source_crosstab(ray_session):
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import lang_by_source

    texts = [
        ("the cat and the dog in a house for it is that", "crawlA"),
        ("der Hund und die Katze ist ein zu den nicht von", "crawlA"),
        ("the dog is a good dog it is", "crawlB"),
        ("le chat et la maison les des un une est que pour", "crawlB"),
        ("这是 一个 中文 文本 数据", "crawlB"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": [t for t, _ in texts],
                "source": [s for _, s in texts],
            }
        )
    )
    got = lang_by_source(ds).to_pandas().sort_values(["source", "lang_pred"])
    exp = [("crawlA", "de", 1), ("crawlA", "en", 1), ("crawlB", "en", 1),
           ("crawlB", "fr", 1), ("crawlB", "zh", 1)]
    assert list(map(tuple, got.values)) == exp


def test_shingle_containment_directional(ray_session):
    """A short doc quoted verbatim inside a long one: containment
    short→long ≈ 1 while long→short is small; values equal the scalar
    set computation."""
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import shingle_containment

    quote = "to be or not to be that is the question"
    texts = [
        quote,
        "a long preamble about something else entirely precedes " + quote +
        " and then a long discussion follows with many more words after it",
        "completely unrelated zebra quark text with nothing shared at all",
    ]
    k = 5
    got = (
        shingle_containment(_docs_ds(texts), k=k, threshold=0.9)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )

    def sset(t):
        return {t[i : i + k] for i in range(max(1, len(t) - k + 1))} if len(t) >= k else {t}

    s0, s1 = sset(texts[0]), sset(texts[1])
    inter = len(s0 & s1)
    c01 = inter / len(s0)
    assert c01 >= 0.9  # the quote is (nearly) fully contained
    assert len(got) == 1  # only short→long passes at 0.9
    row = got.iloc[0]
    assert (row.src, row.dst, row.n_shared) == (0, 1, inter)
    assert row.containment == round_half_away(np.array([c01]), 6)[0]


def test_dup_rate_by_source(ray_session):
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import dup_rate_by_source

    texts = [
        ("same text", "dirty"), ("same text", "dirty"), ("same text", "dirty"),
        ("other", "dirty"),
        ("a", "clean"), ("b", "clean"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": [t for t, _ in texts],
                "source": [s for _, s in texts],
            }
        )
    )
    got = dup_rate_by_source(ds).to_pandas().set_index("source")
    assert got.loc["dirty", "n_docs"] == 4 and got.loc["dirty", "n_unique"] == 2
    assert got.loc["dirty", "dup_rate"] == 0.5
    assert got.loc["clean", "dup_rate"] == 0.0


def test_embedding_label_centroids(ray_session):
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        embedding_label_centroids,
    )

    rng = np.random.default_rng(9)
    n, dim = 60, 8
    M = rng.standard_normal((n, dim)).astype(np.float32)
    lab = rng.integers(0, 3, n).astype(np.int32)
    ds = rd.from_arrow(
        pa.table(
            {
                "embedding": pa.array(list(M), type=pa.list_(pa.float32())),
                "label": lab,
            }
        )
    )
    got = (
        embedding_label_centroids(ds)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    assert len(got) == 3 * dim
    for l in range(3):
        exp = round_half_away(M[lab == l].astype(np.float64).mean(axis=0), 6)
        g = got[got.label == l]
        assert (g.n == (lab == l).sum()).all()
        np.testing.assert_allclose(g.centroid.values, exp, atol=1e-9)


def test_curriculum_buckets_ordering(ray_session):
    """Bucket boundaries respect the (cross_entropy, doc_id) order and
    tiles are balanced; bucket 1 holds the lowest-perplexity docs."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import curriculum_buckets

    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table("/root/testdata/sf0.001", "documents", columns=["doc_id", "text"])
    got = curriculum_buckets(docs, k=4).to_pandas()
    got = got.sort_values(["cross_entropy", "doc_id"]).reset_index(drop=True)
    assert (np.diff(got.bucket) >= 0).all()  # monotone along the order
    sizes = got.bucket.value_counts()
    assert sizes.max() - sizes.min() <= 1
    assert got.bucket.iloc[0] == 1 and got.bucket.iloc[-1] == 4


def test_zipf_slope_vs_polyfit(ray_session):
    """Slope/intercept equal numpy polyfit over the ranked vocab; a
    Zipf-distributed synthetic corpus fits slope ≈ −1."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import zipf_slope

    rng = np.random.default_rng(13)
    # build a corpus whose word frequencies follow 1/rank
    vocab = [f"w{i}" for i in range(1, 201)]
    weights = np.array([1.0 / r for r in range(1, 201)])
    weights /= weights.sum()
    toks = rng.choice(vocab, size=20000, p=weights)
    texts = [" ".join(toks[i : i + 50]) for i in range(0, len(toks), 50)]
    got = zipf_slope(_docs_ds(texts)).to_pandas()

    u, c = np.unique(toks, return_counts=True)
    order = np.lexsort((u, -c))
    ranks = np.arange(1, len(u) + 1)
    slope, intercept = np.polyfit(np.log(ranks), np.log(c[order].astype(float)), 1)
    assert abs(got.slope[0] - slope) < 1e-6
    assert abs(got.intercept[0] - intercept) < 1e-6
    assert -1.2 < got.slope[0] < -0.8  # Zipfian corpus diagnosed as such
    assert got.n_types[0] == len(u) and got.n_tokens[0] == len(toks)


def test_duplicate_ngram_fraction_hand_case(ray_session):
    """doc0/doc1 exact dups -> frac 1.0 both; doc2 shares a prefix run of
    5-grams with them; doc3 unique -> 0.0; short/empty docs emit no row."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        _space_tokens,
        _word_ngrams_unique,
        duplicate_ngram_fraction,
    )

    out = (
        duplicate_ngram_fraction(_docs_ds(DUP_CORPUS), n=5, num_buckets=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1, 2, 3, 4]  # "short"/"" dropped
    assert out.loc[0, "dup_frac"] == 1.0 and out.loc[1, "dup_frac"] == 1.0
    # every doc's fraction equals the brute-force share of its distinct
    # grams that appear in any OTHER doc
    grams = {
        i: _word_ngrams_unique(_space_tokens(t), 5)
        for i, t in enumerate(DUP_CORPUS)
        if len(_space_tokens(t)) >= 5
    }
    for i, gi in grams.items():
        others = set().union(*(set(g) for j, g in grams.items() if j != i))
        exp = round(sum(g in others for g in gi) / len(gi), 6)
        assert out.loc[i, "n_grams"] == len(gi)
        assert abs(out.loc[i, "dup_frac"] - exp) < 1e-12, i


def test_tfidf_cosine_pairs_brute_force_replay(ray_session):
    """Engine pairs == a scalar numpy TF-IDF replay (same formula, same
    integer weight scaling), including df pruning and the tau cutoff."""
    import itertools

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.hashing import md5_lower64
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        tfidf_cosine_pairs,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(6, 20)))
        for _ in range(30)
    ]
    texts[5] = texts[3]          # identical pair -> cos 1.0
    texts[9] = texts[3] + " w0"  # near-identical
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(30), pa.int64()),
                  "text": pa.array(texts)})
    )
    got = (
        tfidf_cosine_pairs(docs, n_docs=30, n=3, min_df=2, max_df=10,
                           tau=0.2, num_buckets=4)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )

    # scalar replay
    tf = []
    for t in texts:
        toks = [x for x in t.split(" ") if x]
        grams = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
        h = md5_lower64(np.asarray(grams, dtype=object))
        uh, cnt = np.unique(h, return_counts=True)
        tf.append(dict(zip(uh.tolist(), cnt.tolist())))
    df = {}
    for d in tf:
        for h in d:
            df[h] = df.get(h, 0) + 1
    w = [
        {h: int(round_half_away(np.float64(c) * np.log(30.0 / df[h]) * 10000.0, 0))
         for h, c in d.items() if 2 <= df[h] <= 10}
        for d in tf
    ]
    exp = []
    for a, b in itertools.combinations(range(30), 2):
        shared = set(w[a]) & set(w[b])
        if not shared:
            continue
        dp = sum(w[a][h] * w[b][h] for h in shared)
        na = sum(v * v for v in w[a].values())
        nb = sum(v * v for v in w[b].values())
        c = round_half_away(np.float64(dp) / np.sqrt(np.float64(na) * np.float64(nb)), 6)
        if c >= 0.2:
            exp.append((a, b, float(c)))
    exp = sorted(exp)
    assert len(got) == len(exp) and len(exp) >= 2
    assert [tuple(r) for r in got.itertuples(index=False)] == exp
    ident = got.query("doc_a == 3 and doc_b == 5")
    assert len(ident) == 1 and ident.iloc[0]["cos"] == 1.0


def test_source_gram_overlap_counts_distinct_shared_grams(ray_session):
    """Pair counts = distinct shared n-grams, deduped across docs of the
    same source; non-overlapping sources absent."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        source_gram_overlap,
    )

    shared = "a b c d e"           # one 5-gram, in srcA (twice) and srcB
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(
                    [
                        shared + " x y z",   # srcA: grams incl 'a b c d e'
                        shared,              # srcA again (dedup per source)
                        shared + " q r",     # srcB
                        "p q r s t u v w",   # srcC: no overlap with anyone
                        "totally different words here now",  # srcB
                    ]
                ),
                "source": pa.array(["srcA", "srcA", "srcB", "srcC", "srcB"]),
            }
        )
    )
    got = source_gram_overlap(docs, n=5, num_buckets=4).to_pandas()
    got = got.set_index(["source_a", "source_b"])["n_shared"]
    # srcA/srcB share exactly the grams of `shared` text: 'a b c d e' is
    # the only 5-gram both contain (srcB doc2's grams: 'a b c d e',
    # 'b c d e q', 'c d e q r'; srcA doc0's: 'a b c d e', 'b c d e x', ...)
    assert got.loc[("srcA", "srcB")] == 1
    assert ("srcA", "srcC") not in got.index
    assert ("srcB", "srcC") not in got.index


def test_source_kl_scalar_replay_and_zero(ray_session):
    """KL equals the scalar replay; a source with the corpus distribution
    scores ~0 and still appears in the output."""
    import math

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.textops import source_kl

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(
                    ["a a b", "a a b", "a b b", "b b a"]  # srcX skews to b
                ),
                "source": pa.array(["same", "same", "skew", "skew"]),
            }
        )
    )
    got = source_kl(docs, num_buckets=4).to_pandas().set_index("source")
    # scalar replay
    texts = {"same": "a a b a a b".split(), "skew": "a b b b b a".split()}
    corpus = [t for v in texts.values() for t in v]
    n = len(corpus)
    import collections

    ct = collections.Counter(corpus)
    for s, toks in texts.items():
        cs = collections.Counter(toks)
        nsl = len(toks)
        kl = sum(
            (c * 1.0 / nsl) * math.log((c * 1.0 / nsl) / (ct[t] * 1.0 / n))
            for t, c in cs.items()
        )
        assert got.loc[s, "kl"] == round_half_away(np.array([kl]), 6)[0]
        assert got.loc[s, "n_tokens"] == nsl
    # both sources present even when a KL lands at exactly 0
    assert set(got.index) == {"same", "skew"}
    assert got.loc["skew", "kl"] > 0


def test_knn_label_vote_clusters(ray_session):
    """Two tight clusters with distinct labels -> perfect leave-one-out
    accuracy; a deliberately mislabeled point is outvoted."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.similarity import knn_label_vote

    rng = np.random.default_rng(3)
    a = rng.normal([5, 0, 0], 0.05, size=(10, 3))
    b = rng.normal([0, 5, 0], 0.05, size=(10, 3))
    vecs = np.vstack([a, b]).astype(np.float32)
    labels = np.array([0] * 10 + [1] * 10, np.int32)
    labels[7] = 1  # mislabeled point inside cluster A
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        )
    )
    got = knn_label_vote(emb, k=5).to_pandas().set_index("vec_id")
    # the mislabeled point's neighbors all vote 0 -> pred 0, marked wrong
    assert got.loc[7, "pred_label"] == 0
    assert not got.loc[7, "correct"]
    others = got.drop(index=7)
    assert others["correct"].all()


def test_pii_density_by_source_counts(ray_session):
    """Email counted before IP (no double-count of the host), rate =
    docs-with-any-PII / docs."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        pii_density_by_source,
    )

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(
                    [
                        "mail me at a@b.com and 1.2.3.4",  # 1 email, 1 ip
                        "x@y0.12.13.14.org stays one email",  # host NOT an ip
                        "clean text",
                        "no pii here either",
                    ]
                ),
                "source": pa.array(["s1", "s1", "s1", "s2"]),
            }
        )
    )
    got = pii_density_by_source(docs).to_pandas().set_index("source")
    assert got.loc["s1", "n_emails"] == 2
    assert got.loc["s1", "n_ips"] == 1
    assert got.loc["s1", "docs_with_pii"] == 2
    assert round(got.loc["s1", "pii_rate"], 6) == round(2 / 3, 6)
    assert got.loc["s2", "docs_with_pii"] == 0
    assert got.loc["s2", "pii_rate"] == 0.0


def test_ngram_novelty_first_occurrence_wins(ray_session):
    """The lowest doc_id owns a shared gram; later copies are not novel."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import ngram_novelty

    shared = "a b c d e"
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 20, 30], pa.int64()),
                "text": pa.array(
                    [
                        shared,                       # doc 10: 1 gram, novel
                        shared + " f",                # doc 20: 2 grams, 1 novel
                        "q r s t u v",                # doc 30: all novel
                    ]
                ),
            }
        )
    )
    got = ngram_novelty(docs, n=5, num_buckets=4).to_pandas().set_index("doc_id")
    assert got.loc[10, "n_grams"] == 1 and got.loc[10, "n_novel"] == 1
    assert got.loc[20, "n_grams"] == 2 and got.loc[20, "n_novel"] == 1
    assert got.loc[20, "novelty"] == 0.5
    assert got.loc[30, "novelty"] == 1.0


def test_cosine_histogram_known_geometry(ray_session):
    """Orthogonal + identical + opposite vectors land in the expected
    bins; total pair count = C(n,2)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        cosine_histogram,
    )

    vecs = np.array(
        [[1, 0, 0], [1, 0, 0], [0, 1, 0], [-1, 0, 0]], np.float32
    )
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(4), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        )
    )
    got = cosine_histogram(emb).to_pandas().set_index("bin")["n_pairs"]
    # pairs: (0,1) cos 1 -> bin 19; (0,2),(1,2) cos 0 -> bin 10;
    # (0,3),(1,3) cos -1 -> bin 0; (2,3) cos 0 -> bin 10
    assert got.sum() == 6
    assert got.loc[19] == 1
    assert got.loc[10] == 3
    assert got.loc[0] == 2


def test_doclen_histogram_buckets(ray_session):
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import doclen_histogram

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(
                    [
                        " ".join(["w"] * 10),    # bucket 0
                        " ".join(["w"] * 63),    # bucket 0 (boundary below)
                        " ".join(["w"] * 64),    # bucket 1 (boundary at)
                        "",                       # 0 tokens -> bucket 0
                    ]
                ),
            }
        )
    )
    got = doclen_histogram(docs).to_pandas().set_index("len_bucket")
    assert got.loc[0, "n_docs"] == 3
    assert got.loc[1, "n_docs"] == 1
    assert got.loc[1, "bucket_lo"] == 64


def test_split_leakage_detects_cross_split_dups(ray_session):
    """Same text planted in a train doc and a test doc -> one
    (test, train) leakage row; unique texts are silent."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import split_leakage

    def bucket(i):
        return ((i % 2**31) * 2654435761 + 40503) % 2**31 % 100

    train_id = next(i for i in range(1000) if bucket(i) < 80)
    test_id = next(i for i in range(1000) if bucket(i) >= 90)
    other_train = next(
        i for i in range(1000) if bucket(i) < 80 and i != train_id
    )
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    [train_id, test_id, other_train], pa.int64()
                ),
                "text": pa.array(
                    ["leaked text body", "leaked text body", "unique text"]
                ),
            }
        )
    )
    got = split_leakage(docs, num_buckets=4).to_pandas()
    assert len(got) == 1
    assert tuple(got.iloc[0]) == ("test", "train", 1)
    # clean corpus -> empty frame with the right schema
    clean = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "text": pa.array(["a", "b"])}
        )
    )
    empty = split_leakage(clean, num_buckets=4).to_pandas()
    assert len(empty) == 0
    assert list(empty.columns) == ["split_a", "split_b", "n_shared_texts"]


def test_lexical_diversity_scalar_replay(ray_session):
    """TTR/avg-len computed per doc; empty docs are omitted (oracle
    parity with SQL unnest)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        lexical_diversity,
    )

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["a bb a ccc", "x", ""]),
            }
        )
    )
    got = (
        lexical_diversity(docs).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == [1, 2]  # empty doc 3 omitted
    # doc 1: tokens a,bb,a,ccc -> 4 tokens, 3 types, lens 1+2+1+3=7
    assert got.loc[0, "n_tokens"] == 4
    assert got.loc[0, "n_types"] == 3
    assert got.loc[0, "ttr"] == 0.75
    assert got.loc[0, "avg_token_len"] == 1.75
    assert got.loc[1, "ttr"] == 1.0
    assert got.loc[1, "avg_token_len"] == 1.0


def test_hapax_stats_scalar_replay(ray_session):
    """Hapax counts fold exactly across batches: vocabulary {a,bb,ccc},
    counts {a:3, bb:1, ccc:2} -> 2 of 3 types... bb is the only hapax."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import hapax_stats

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a bb a ccc", "a ccc"]),
            }
        )
    )
    got = hapax_stats(docs).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["n_tokens_total"] == 6
    assert r["n_vocab"] == 3
    assert r["n_hapax"] == 1
    assert abs(r["hapax_fraction"] - 0.333333) < 1e-12
    assert abs(r["hapax_token_share"] - 0.166667) < 1e-12


def test_lang_source_chi2_formula(ray_session):
    """2x2 crosstab with known marginals: cells (en,a)=2 (en,b)=1
    (fr,a)=1 -> total 4, rows en=3 fr=1, cols a=3 b=1.
    (en,a): exp=9/4=2.25, contrib=(2*4-9)^2/(4*3*3)=1/36."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        lang_source_chi2,
    )

    docs = rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "en", "fr"]),
                "source": pa.array(["a", "a", "b", "a"]),
            }
        )
    )
    got = (
        lang_source_chi2(docs).to_pandas()
        .sort_values(["lang", "source"]).reset_index(drop=True)
    )
    assert len(got) == 3
    ena = got[(got["lang"] == "en") & (got["source"] == "a")].iloc[0]
    assert ena["observed"] == 2
    assert ena["expected"] == 2.25
    assert abs(ena["contrib"] - round(1 / 36, 6)) < 1e-12
    frb_absent = got[(got["lang"] == "fr") & (got["source"] == "b")]
    assert len(frb_absent) == 0  # unobserved cells are not emitted


def test_lang_log_odds_prefers_exclusive_token(ray_session):
    """A token appearing ONLY in lang 'en' must out-z a token shared
    across langs; z-scores replay the scalar Monroe formula."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import lang_log_odds

    docs = rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "fr", "fr"]),
                "text": pa.array(
                    ["shared exclusive shared", "exclusive shared",
                     "shared autre", "shared autre autre"]
                ),
            }
        )
    )
    got = lang_log_odds(docs, k=2).to_pandas()
    en = got[got["lang"] == "en"].sort_values("z", ascending=False)
    assert en.iloc[0]["token"] == "exclusive"
    # scalar replay for 'exclusive' in en: y=2, yw=2, n_en=5, n_fr=5,
    # N=10, V=3
    y, yw, nl, N, V = 2, 2, 5, 10, 3
    yj = yw - y
    a = (y + 1) / (nl + V - y - 1)
    b = (yj + 1) / ((N - nl) + V - yj - 1)
    z = (np.log(a) - np.log(b)) / np.sqrt(1 / (y + 1) + 1 / (yj + 1))
    assert abs(en.iloc[0]["z"] - round(z, 6)) < 1e-9


def test_rrf_fusion_formula(ray_session):
    """Doc in both lists gets 1/(60+r1)+1/(60+r2); single-system docs get
    one term and rank -1 for the missing system."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import rrf_fusion

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "hash join stream hash join",   # matches all 3 terms
                        "hash hash hash only here",     # bm25-heavy on hash
                        "nothing relevant at all",
                    ]
                ),
            }
        )
    )
    got = rrf_fusion(docs, ("hash", "join", "stream"), k=2).to_pandas()
    assert 3 not in set(got["doc_id"])
    d1 = got[got["doc_id"] == 1].iloc[0]
    assert d1["bm25_rank"] > 0 and d1["search_rank"] > 0
    expect = 1 / (60 + d1["bm25_rank"]) + 1 / (60 + d1["search_rank"])
    assert abs(d1["rrf"] - round(expect, 6)) < 1e-12


def test_readability_by_source_vs_scalar_reference():
    """Flesch panel partial-sum fold equals a direct per-doc scalar replay."""
    import re

    import numpy as np
    import ray.data as rd
    import pyarrow as pa

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        readability_by_source,
    )
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away

    rng = np.random.default_rng(7)
    words = ["the", "syllable", "xyz", "Ba!", "queueing", "a.b?c", ""]
    rows = []
    for i in range(120):
        n = int(rng.integers(0, 12))
        rows.append(
            {
                "source": f"s{int(rng.integers(3))}",
                "text": " ".join(rng.choice(words, n).tolist()),
            }
        )
    ds = rd.from_arrow(
        pa.table(
            {
                "source": [r["source"] for r in rows],
                "text": [r["text"] for r in rows],
            }
        )
    ).repartition(5)
    got = readability_by_source(ds).to_pandas().sort_values("source")

    vre = re.compile(r"[aeiouyAEIOUY]+")
    agg = {}
    for r in rows:
        toks = [x for x in r["text"].split(" ") if x]
        if not toks:
            continue
        t = r["text"]
        ns = max(1, t.count(".") + t.count("!") + t.count("?"))
        a = agg.setdefault(r["source"], [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(toks)
        a[2] += ns
        a[3] += len(vre.findall(t))
    assert sorted(agg) == got["source"].tolist()
    for _, row in got.iterrows():
        nd, nw, ns, ny = agg[row["source"]]
        assert (row["n_docs"], row["n_words"], row["n_sentences"], row["n_syllables"]) == (nd, nw, ns, ny)
        wps = float(round_half_away(np.array([nw / ns]), 6)[0])
        spw = float(round_half_away(np.array([ny / nw]), 6)[0])
        assert row["words_per_sentence"] == wps
        assert row["syllables_per_word"] == spw
        assert row["flesch"] == float(
            round_half_away(np.array([206.835 - 1.015 * wps - 84.6 * spw]), 6)[0]
        )


def test_heaps_law_curve_vs_brute_force():
    """Decile vocabulary-growth curve equals a sequential scan; output is
    partition-count invariant and all-integer."""
    import numpy as np
    import ray.data as rd
    import pyarrow as pa

    from subgraph_isomorphism_pregel_ray.pipelines.textops import heaps_law_curve

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    doc_ids = rng.permutation(500)[:73]  # non-contiguous ids
    texts = [
        " ".join(rng.choice(vocab, int(rng.integers(0, 9))).tolist())
        for _ in doc_ids
    ]
    tbl = pa.table({"doc_id": doc_ids.astype("int64"), "text": texts})

    def brute(n_buckets=10):
        order = np.argsort(doc_ids)
        n = len(doc_ids)
        out, seen, nd, occ, vres = [], set(), 0, 0, []
        cuts = [(n * b) // n_buckets for b in range(1, n_buckets + 1)]
        ci = 0
        for rank, j in enumerate(order, start=1):
            nd += 1
            toks = [x for x in texts[j].split(" ") if x]
            occ += len(toks)
            seen.update(toks)
            while ci < n_buckets and rank == cuts[ci]:
                out.append((ci + 1, nd, occ, len(seen)))
                ci += 1
        return out

    expect = brute()
    for parts in (1, 7):
        got = (
            heaps_law_curve(rd.from_arrow(tbl).repartition(parts))
            .to_pandas()
            .sort_values("bucket")
        )
        rows = list(
            zip(got["bucket"], got["n_docs_cum"], got["tokens_cum"], got["vocab_cum"])
        )
        assert [tuple(int(x) for x in r) for r in rows] == expect


def test_token_freq_spectrum_and_doclen_percentiles_vs_scalar():
    """Spectrum and per-lang order-stat percentiles equal brute-force
    replays; both partition-count invariant."""
    from collections import Counter

    import numpy as np
    import ray.data as rd
    import pyarrow as pa

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        doclen_percentiles_by_lang,
        token_freq_spectrum,
    )

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab, int(rng.integers(0, 30))).tolist())
        for _ in range(90)
    ]
    langs = rng.choice(["en", "de", "zh"], 90).tolist()
    tbl = pa.table(
        {
            "doc_id": np.arange(90, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )

    cnt = Counter(w for t in texts for w in t.split(" ") if w)
    spec = Counter(min(c, 11) for c in cnt.values())
    occ = Counter()
    for c in cnt.values():
        occ[min(c, 11)] += c
    for parts in (1, 6):
        got = (
            token_freq_spectrum(rd.from_arrow(tbl).repartition(parts))
            .to_pandas()
            .sort_values("occur_cap")
        )
        assert got["n_types"].tolist() == [spec.get(c, 0) for c in range(1, 12)]
        assert got["n_occurrences"].tolist() == [occ.get(c, 0) for c in range(1, 12)]

    got = (
        doclen_percentiles_by_lang(rd.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("lang")
    )
    for _, row in got.iterrows():
        lens = sorted(len(t) for t, l in zip(texts, langs) if l == row["lang"])
        assert row["n_docs"] == len(lens)
        for p in (25, 50, 75, 90, 99):
            r = max(1, (len(lens) * p) // 100)
            assert row[f"p{p}"] == lens[r - 1], (row["lang"], p)


def test_lang_confusion_matches_lang_id_rollup():
    """Confusion matrix equals a per-doc lang_id rollup (alignment check)."""
    from collections import Counter

    import numpy as np
    import ray.data as rd
    import pyarrow as pa

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        lang_confusion,
        lang_id_batch,
    )

    texts = [
        "the cat is in the hat for it",
        "der hund ist ein und das nicht",
        "le chat et la vie des un",
        "no stopwords here xyzzy",
        "中文文本",
        "",
    ] * 7
    langs = (["en", "de", "fr", "en", "zh", "de"] * 7)
    tbl = pa.table(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": langs,
        }
    )
    pred = lang_id_batch(tbl)["lang_pred"].to_pylist()
    expect = Counter(zip(langs, pred))
    got = lang_confusion(rd.from_arrow(tbl).repartition(5)).to_pandas()
    assert Counter(
        {(r["lang"], r["lang_pred"]): r["n_docs"] for _, r in got.iterrows()}
    ) == expect


def test_sentence_dedup_c4_semantics():
    """Global first-occurrence sentence dedup: duplicated segments vanish
    everywhere but their smallest (doc_id, pos); structural (space-only)
    segments always survive; reassembly is byte-exact; partition-count
    invariant."""
    import numpy as np
    import ray.data as rd
    import pyarrow as pa

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import sentence_dedup

    docs = {
        10: "unique alpha.the cookie banner.body text one",
        11: "the cookie banner.body text two..trailing",
        12: "body text two.the cookie banner. .unique omega.",
        13: "",
        14: " . . ",
    }
    tbl = pa.table(
        {
            "doc_id": np.array(sorted(docs), np.int64),
            "text": [docs[k] for k in sorted(docs)],
        }
    )

    def brute():
        first = {}
        for d in sorted(docs):
            for i, s in enumerate(docs[d].split("."), start=1):
                if s.strip(" ") == "":
                    continue
                first.setdefault(s, (d, i))
        out = {}
        for d in sorted(docs):
            segs = docs[d].split(".")
            kept = [
                s
                for i, s in enumerate(segs, start=1)
                if s.strip(" ") == "" or first[s] == (d, i)
            ]
            n_part = sum(1 for s in segs if s.strip(" ") != "")
            n_rm = sum(
                1
                for i, s in enumerate(segs, start=1)
                if s.strip(" ") != "" and first[s] != (d, i)
            )
            out[d] = (".".join(kept), n_part - n_rm, n_rm)
        return out

    expect = brute()
    assert expect[11][2] == 1 and expect[12][2] == 2  # the path is exercised
    for parts in (1, 4):
        got = (
            sentence_dedup(rd.from_arrow(tbl).repartition(parts))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert got.index.tolist() == sorted(docs)
        for d in sorted(docs):
            row = got.loc[d]
            assert (row["clean_text"], int(row["n_kept"]), int(row["n_removed"])) == expect[d], d


def test_gopher_quality_by_source_vs_scalar_reference():
    """Gopher-rule flag sums equal a direct per-doc scalar replay,
    including zero-word docs, sub-threshold word counts, long/short mean
    word length, non-alpha tokens and case-folded stop-word hits."""
    import re

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        STOPWORDS,
        gopher_quality_by_source,
    )

    rng = np.random.default_rng(11)
    words = ["the", "The", "and", "OF", "to", "123", "$$$", "zz",
             "abcdefghijklmn", "ok", "supercalifragilistic"]
    rows = []
    for _ in range(200):
        n = int(rng.integers(0, 60))
        rows.append(
            {
                "source": f"s{int(rng.integers(4))}",
                "text": " ".join(rng.choice(words, n).tolist()),
            }
        )
    ds = rd.from_arrow(
        pa.table(
            {
                "source": [r["source"] for r in rows],
                "text": [r["text"] for r in rows],
            }
        )
    ).repartition(7)
    got = (
        gopher_quality_by_source(ds, min_words=25, max_words=40)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )

    alpha = re.compile(r"[a-zA-Z]")
    stopset = set(STOPWORDS["en"])
    agg = {}
    for r in rows:
        toks = r["text"].split()
        nw = len(toks)
        a = agg.setdefault(r["source"], [0, 0, 0, 0, 0, 0])
        a[0] += 1
        if nw == 0:
            a[1] += 1
            continue
        sumlen = sum(len(w) for w in toks)
        f_wc = nw < 25 or nw > 40
        f_mwl = sumlen < 4 * nw or sumlen > 10 * nw
        f_al = 5 * sum(1 for w in toks if alpha.search(w)) < 4 * nw
        f_st = len(stopset.intersection(w.lower() for w in toks)) < 2
        a[1] += f_wc
        a[2] += f_mwl
        a[3] += f_al
        a[4] += f_st
        a[5] += not (f_wc or f_mwl or f_al or f_st)
    assert sorted(agg) == got["source"].tolist()
    cols = ["n_docs", "fail_word_count", "fail_mean_word_len",
            "fail_alpha_frac", "fail_stopwords", "n_pass"]
    for _, row in got.iterrows():
        assert [row[c] for c in cols] == agg[row["source"]]
    # every rule must actually fire somewhere in this fixture
    sums = got[cols[1:]].sum()
    assert (sums > 0).all(), sums


def test_length_filter_sweep_vs_scalar_reference():
    """Threshold sweep counts equal a direct per-doc replay, including
    empty docs, custom thresholds and multi-block inputs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        length_filter_sweep,
    )

    rng = np.random.default_rng(5)
    texts = [
        " ".join(f"w{j}" for j in range(int(rng.integers(0, 30))))
        for _ in range(300)
    ]
    texts[0] = ""
    texts[1] = "   "
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(9)
    th = (1, 5, 12, 40)
    got = (
        length_filter_sweep(ds, thresholds=th)
        .to_pandas()
        .sort_values("threshold")
        .reset_index(drop=True)
    )
    nw = [len(t.split()) for t in texts]
    assert got["threshold"].tolist() == sorted(th)
    for _, row in got.iterrows():
        t = row["threshold"]
        assert row["n_docs_pass"] == sum(1 for n in nw if n >= t)
        assert row["tokens_retained"] == sum(n for n in nw if n >= t)
    # threshold 40 > every doc → zero row must survive exactly
    assert got.iloc[-1]["n_docs_pass"] == 0


def test_incremental_dedup_anti_join_semantics():
    """New docs sharing text with the old snapshot are dropped; dups
    WITHIN the new snapshot both survive (pure anti-join, == NOT EXISTS)."""
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import incremental_dedup

    old = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 2, 4], pa.int64()),
                "source": ["a", "a", "b"],
                "text": ["alpha", "beta", "gamma"],
            }
        )
    ).repartition(2)
    new = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 3, 5, 7], pa.int64()),
                "source": ["a", "b", "b", "c"],
                "text": ["alpha", "delta", "delta", "gamma"],
            }
        )
    ).repartition(3)
    got = (
        incremental_dedup(old, new, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 1 (alpha) and 7 (gamma) collide with old; both 3 and 5 (delta) survive
    assert got["doc_id"].tolist() == [3, 5]
    assert got["source"].tolist() == ["b", "b"]


def test_temperature_mixture_vs_scalar_reference():
    """Shares and pow-alpha scores equal a direct per-source replay of
    exact int token sums."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import temperature_mixture

    rows = {
        "s0": ["one two three", "four five"],
        "s1": ["a b c d e f g h i j"] * 3,
        "s2": [""],
    }
    src, txt = [], []
    for s, ts in rows.items():
        for t in ts:
            src.append(s)
            txt.append(t)
    ds = rd.from_arrow(pa.table({"source": src, "text": txt})).repartition(4)
    got = (
        temperature_mixture(ds, alpha=0.3)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    n = {s: sum(len(t.split()) for t in ts) for s, ts in rows.items()}
    N = sum(n.values())
    assert got["source"].tolist() == sorted(rows)
    for r in got.itertuples():
        assert int(r.n_tokens) == n[r.source]
        share = n[r.source] / float(N)
        assert abs(r.token_share - round(share, 6)) < 1e-12
        assert abs(r.sampling_score - round(share**0.3, 6)) < 1e-12
    # temperature flattens: the small source's score share exceeds its raw share
    small = got.set_index("source")
    assert (
        small.loc["s0", "sampling_score"] / got["sampling_score"].sum()
        > small.loc["s0", "token_share"]
    )


def test_tokenizer_fertility_vs_scalar_reference():
    """Per-lang word/piece sums equal a direct _BPE_RE replay; fertility
    is the division of the exact sums."""
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        _BPE_RE,
        tokenizer_fertility,
    )

    rows = [
        ("en", "hello world this-is hyphen"),
        ("en", "a b2c three4 !"),
        ("zh", "数据 图形 café übung"),
        ("zh", "x9y"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {"lang": [r[0] for r in rows], "text": [r[1] for r in rows]}
        )
    ).repartition(3)
    got = (
        tokenizer_fertility(ds)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    exp = {}
    for lang, t in rows:
        w, p = exp.get(lang, (0, 0))
        exp[lang] = (w + len(t.split()), p + len(_BPE_RE.findall(t)))
    assert got["lang"].tolist() == sorted(exp)
    for r in got.itertuples():
        w, p = exp[r.lang]
        assert (int(r.n_words), int(r.n_pieces)) == (w, p)
        assert abs(r.fertility - round(p / w, 6)) < 1e-12
    # the zh fixture has multi-piece words → fertility strictly > 1
    assert got.set_index("lang").loc["zh", "fertility"] > 1.0


def test_vocab_coverage_curve_vs_scalar_reference():
    """Coverage at each k equals a direct Counter replay with the
    (cnt DESC, token ASC) total order, across multiple blocks."""
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        vocab_coverage_curve,
    )

    rng = np.random.default_rng(3)
    vocab = [f"w{i:02d}" for i in range(40)]
    weights = np.arange(40, 0, -1, dtype=np.float64)
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 30)), p=weights))
        for _ in range(200)
    ] + [""]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(7)
    ks = (3, 10, 100)
    got = (
        vocab_coverage_curve(ds, ks=ks)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    c = Counter()
    for t in texts:
        c.update(t.split())
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    assert got["k"].tolist() == list(ks)
    for r in got.itertuples():
        cov = sum(n for _, n in ranked[: int(r.k)])
        assert int(r.covered_tokens) == cov
        assert abs(r.coverage - round(cov / total, 6)) < 1e-12
    # k=3 must be a strict subset of the mass; k=100 covers everything
    assert got.iloc[0]["coverage"] < 1.0 and got.iloc[-1]["coverage"] == 1.0


def test_incremental_dedup_bloom_parity():
    """The broadcast-bloom prefilter path returns EXACTLY the plain
    anti-join's rows (false positives resolved downstream, negatives
    bypassing the exchange), at a bloom size small enough to force
    false positives."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import incremental_dedup

    rng = np.random.default_rng(17)
    old_texts = [f"old doc {i} " + "x" * int(rng.integers(1, 9)) for i in range(120)]
    new_texts = [f"new doc {i}" for i in range(150)] + old_texts[::3]
    old = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(old_texts)), pa.int64()),
                "source": ["o"] * len(old_texts),
                "text": old_texts,
            }
        )
    ).repartition(4)
    new = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    range(1000, 1000 + len(new_texts)), pa.int64()
                ),
                "source": ["n"] * len(new_texts),
                "text": new_texts,
            }
        )
    ).repartition(5)

    plain = (
        incremental_dedup(old, new)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 256 bits for 120 hashes → heavy false-positive rate, exercising the
    # exact downstream resolve; 1<<16 → near-zero FP, exercising bypass
    for bits in (256, 1 << 16):
        bloom = (
            incremental_dedup(old, new, bloom_bits=bits)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert bloom["doc_id"].tolist() == plain["doc_id"].tolist(), bits
        assert bloom["source"].tolist() == plain["source"].tolist(), bits
    # sanity: every re-crawled doc was dropped, every novel one kept
    assert plain["doc_id"].tolist() == list(range(1000, 1150))


def test_shard_balance_vs_scalar_reference():
    """Per-shard doc counts and utf-8 byte sums equal a direct
    md5_lower64-replay, including multi-byte (non-ASCII) texts."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.hashing import md5_lower64
    from subgraph_isomorphism_pregel_ray.pipelines.textops import shard_balance

    texts = [f"doc number {i}" for i in range(300)] + ["café 数据", "übung"]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(6)
    got = (
        shard_balance(ds, num_shards=8)
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    sh = (md5_lower64(np.asarray(texts, dtype=object)) % np.uint64(8)).astype(int)
    exp_docs = {s: 0 for s in set(sh)}
    exp_bytes = {s: 0 for s in set(sh)}
    for s, t in zip(sh, texts):
        exp_docs[s] += 1
        exp_bytes[s] += len(t.encode("utf-8"))
    assert got["shard"].tolist() == sorted(exp_docs)
    for r in got.itertuples():
        assert (int(r.n_docs), int(r.n_bytes)) == (
            exp_docs[r.shard],
            exp_bytes[r.shard],
        )
    # non-ASCII fixture must make bytes > codepoints somewhere
    assert got["n_bytes"].sum() > sum(len(t) for t in texts)
