"""BPE trainer/encoder tests — the driver records bpe_merges rows-only
(iterative data-dependent fixpoint, not SQL-expressible), so these pytest
oracles ARE the correctness gate: a hand-traced merge sequence, the
overlapping-pair counting convention, tie-break determinism, and
encode/train consistency.
"""

import numpy as np
import pyarrow as pa

import ray.data as rd

from subgraph_isomorphism_pregel_ray.pipelines.bpe import (
    bpe_encode_counts,
    bpe_train,
    word_histogram,
)


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_bpe_hand_traced_merges(ray_session):
    # words: ab x3 (two in doc0, one in doc1), abc x1
    # round 1: pairs (a,b): 3+1=4, (b,c): 1 -> merge (a,b) n=4
    # round 2: abc is now [ab, c] -> pair (ab, c): 1 -> merge (ab, c) n=1
    docs = _docs(["ab ab", "ab abc"])
    m = bpe_train(docs, n_merges=5)
    got = list(zip(m["rank"], m["left"], m["right"], m["n"]))
    assert got == [(1, "a", "b", 4), (2, "ab", "c", 1)]


def test_bpe_overlapping_pairs_counted(ray_session):
    # 'aaa': adjacent positions (a,a) twice (overlap counted pre-merge);
    # after the merge, left-to-right non-overlap -> [aa, a]
    docs = _docs(["aaa"])
    m = bpe_train(docs, n_merges=1)
    assert list(zip(m["left"], m["right"], m["n"])) == [("a", "a", 2)]
    enc = bpe_encode_counts(docs, m).to_pandas()
    assert enc["n_tokens_bpe"].iloc[0] == 2  # [aa, a]


def test_bpe_tiebreak_lexicographic(ray_session):
    # (a,b) and (c,d) both have count 1 -> the smaller pair merges first
    docs = _docs(["ab cd"])
    m = bpe_train(docs, n_merges=2)
    assert (m["left"].iloc[0], m["right"].iloc[0]) == ("a", "b")
    assert (m["left"].iloc[1], m["right"].iloc[1]) == ("c", "d")


def test_bpe_encode_respects_rank_order(ray_session):
    # merges learned on a skewed corpus: 'ab' merges before 'bc'; encoding
    # 'abc' must apply the LOWEST-rank merge first -> [ab, c], 2 tokens
    docs = _docs(["ab ab ab bc"])
    m = bpe_train(docs, n_merges=2)
    assert (m["left"].iloc[0], m["right"].iloc[0]) == ("a", "b")
    enc = bpe_encode_counts(_docs(["abc"]), m).to_pandas()
    assert enc["n_tokens_bpe"].iloc[0] == 2


def test_word_histogram_counts(ray_session):
    hist = (
        word_histogram(_docs(["x y x", "  y  ", ""]))
        .to_pandas()
        .set_index("word")["n"]
        .to_dict()
    )
    assert hist == {"x": 2, "y": 2}


def test_bpe_sf_corpus_deterministic_and_consistent(ray_session):
    # real sf0.001 documents: same merges on two runs; token counts shrink
    # monotonically vs. character counts and never below word counts
    import pyarrow.parquet as pq

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    docs = rd.from_arrow(t)
    m1 = bpe_train(docs, n_merges=16)
    m2 = bpe_train(rd.from_arrow(t), n_merges=16)
    assert m1.equals(m2)
    enc = bpe_encode_counts(docs, m1).to_pandas().set_index("doc_id")
    words = {
        int(d): len([x for x in s.lower().split(" ") if x])
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    chars = {
        int(d): sum(len(x) for x in s.lower().split(" ") if x)
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    for d, row in enc.iterrows():
        assert words[d] <= row["n_tokens_bpe"] <= chars[d]


# ---- Hypothesis property: trainer core vs an independent naive impl -------

from hypothesis import given, settings
from hypothesis import strategies as st

from subgraph_isomorphism_pregel_ray.pipelines.bpe import train_from_histogram


def _naive_train(words, counts, n_merges):
    """Independent reference: dict-of-tuples, O(V*L^2) per round, written
    without the production helpers."""
    vocab = {tuple(w): int(c) for w, c in zip(words, counts)}
    out = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for seq, c in vocab.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (l, r), n = best
        out.append((rank, l, r, n))
        new_vocab = {}
        for seq, c in vocab.items():
            merged, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(seq[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return out


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=8),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_bpe_trainer_matches_naive(pairs, n_merges):
    # dedupe words (histogram semantics), keep first count
    seen = {}
    for w, c in pairs:
        seen.setdefault(w, c)
    words, counts = list(seen), [seen[w] for w in seen]
    got = train_from_histogram(words, counts, n_merges)
    want = _naive_train(words, counts, n_merges)
    assert got == want


# ---- bigram LM + mixture weights (same file: text training-data ops) ------


def test_bigram_cross_entropy_hand_case(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        bigram_cross_entropy,
    )

    # corpus bigrams: "a b" x2 (docs 0,1), "b a" x1, left-counts: a->3? no:
    # doc0 = "a b a": bigrams (a b), (b a); doc1 = "a b": (a b).
    # c(a b)=2, c(b a)=1; c_left(a)=2, c_left(b)=1
    # doc0: H = -(1/2)(ln(2/2) + ln(1/1)) = 0; doc1: H = -ln(2/2) = 0
    got = (
        bigram_cross_entropy(_docs(["a b a", "a b", "x"]))
        .to_pandas()
        .set_index("doc_id")
    )
    assert 2 not in got.index  # single-token doc dropped
    assert got.loc[0, "n_bigrams"] == 2 and got.loc[0, "bigram_cross_entropy"] == 0.0
    assert got.loc[1, "n_bigrams"] == 1 and got.loc[1, "bigram_cross_entropy"] == 0.0


def test_bigram_cross_entropy_rare_transition_scores_higher(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        bigram_cross_entropy,
    )

    # from 'b' the corpus transitions to 'a' and to 'c' equally often ->
    # p(c|b) = 1/2, while p(b|a) = 1 -> doc 3 ("b c") scores higher than
    # the deterministic-transition docs
    docs = _docs(["a b", "a b", "b a", "b c"])
    got = bigram_cross_entropy(docs).to_pandas().set_index("doc_id")
    assert got.loc[0, "bigram_cross_entropy"] == 0.0  # -ln(2/2)
    assert abs(got.loc[3, "bigram_cross_entropy"] - 0.693147) < 1e-6  # -ln(1/2)


def test_source_mixture_weights_uniform_target(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        source_mixture_weights,
    )

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["w w w", "w", "", ]),
                "source": pa.array(["web", "web", "books"]),
            }
        )
    )
    got = source_mixture_weights(ds).set_index("source")
    # web: 4 tokens (share 1.0), books: 0 tokens -> weight 0 by convention
    assert got.loc["web", "n_tokens"] == 4
    assert got.loc["web", "token_share"] == 1.0
    assert got.loc["web", "weight"] == 0.5  # (1/2)/1.0
    assert got.loc["books", "weight"] == 0.0
