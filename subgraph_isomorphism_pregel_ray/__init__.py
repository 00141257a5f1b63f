"""subgraph_isomorphism_pregel_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch re-expression (NOT a port) of the capabilities of the reference
system ``ninotreve/subgraph-isomorphism-pregel`` (ICDE 2022, Pregel+/MPI/C++;
see /root/repo/SURVEY.md for the full structural analysis) as idiomatic Ray
Data pipelines:

* ``functions/`` — pure scalar/vectorized kernels (url hashing, HTML→text/href
  extraction, text statistics). No Ray imports; shared by pipelines and test
  oracles so extraction is byte-identical per url.
* ``sources/``  — deterministic synthetic pages generator (FIXTURES.md F1) and
  parquet table readers with column pruning.
* ``stages/``   — stateless ``map_batches`` stages (extraction, edge explode,
  partial aggregation) operating on zero-copy Arrow batches.
* ``state/``    — per-partition CSR adjacency (Arrow/numpy tensors), the
  vertex "programs" (PageRank, connected components, label propagation,
  triangle counting, subgraph-isomorphism matching) as pure-numpy superstep
  functions, and the Ray actor that hosts one partition's state.
* ``pipelines/``— graph build (hash-partitioned edge table → CSR blocks), the
  BSP superstep driver with checkpoint/resume + lineage metrics, and the
  user-facing algorithm entry points, plus the training-data operators
  (dedup, similarity search, text analysis, multimodal stubs).

Scale notes (the engine is designed for a multi-node cluster streaming ~100 TB
through the object store; tests run single-node):

* every wide step is keyed on ``part = hash64(vid) % P`` and that one
  partitioning is reused across edge build, message exchange and checkpoints;
* message exchange between partition actors is an explicit all-to-all through
  the object store (``num_returns=P`` remote calls), pre-aggregated per
  destination partition inside the sender (the combiner the reference left
  disabled, ``src/utils/vecs.h:101-125``);
* the pages scan prunes columns at the read and drops ``html`` immediately
  after extraction so shuffles only move ``(hash, edge)`` integers.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import subgraph_isomorphism_pregel_ray` cheap)."""
    _API = {
        "pagerank": "pipelines.algorithms",
        "connected_components": "pipelines.algorithms",
        "label_propagation": "pipelines.algorithms",
        "triangle_count": "pipelines.algorithms",
        "pagerank_dataset": "pipelines.algorithms",
        "cc_dataset": "pipelines.algorithms",
        "build_engine": "pipelines.algorithms",
        "match_count": "pipelines.match",
        "match_per_root": "pipelines.match",
        "match_embeddings": "pipelines.match",
        "candidate_stats": "pipelines.match",
        "build_plan": "pipelines.match",
        "BSPEngine": "pipelines.bsp",
        "partition_graph": "pipelines.build_graph",
        "symmetrize": "pipelines.build_graph",
        "exact_dedup": "pipelines.dedup",
        "corpus_clean": "pipelines.corpus",
        "vocab_topk": "pipelines.textops",
        "sort_with_ordinal": "stages.sort",
        "minhash_lsh_pairs": "pipelines.dedup",
        "ngram_jaccard_pairs": "pipelines.dedup",
        "simhash_dup_pairs": "pipelines.dedup",
        "embedding_dup_pairs": "pipelines.dedup",
        "dedup_groups": "pipelines.dedup",
        "ann_topk": "pipelines.similarity",
        "ann_topk_ivf": "pipelines.similarity",
        "build_ivf_index": "pipelines.similarity",
        "copurchase_edges": "pipelines.relational",
        "events_asof_prior": "pipelines.relational",
        "events_quantiles": "pipelines.relational",
        "clustering_coefficient": "pipelines.algorithms",
        "assortativity": "pipelines.algorithms",
        "personalized_pagerank": "pipelines.algorithms",
        "random_walks": "pipelines.algorithms",
        "strong_copurchase_edges": "pipelines.relational",
    }
    if name in _API:
        import importlib

        mod = importlib.import_module(f".{_API[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(name)
