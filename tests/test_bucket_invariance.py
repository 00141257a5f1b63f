"""Partition-count invariance: every bucketed exchange op must be exactly
invariant to num_buckets (the 'would this hold at 1000x the data' check —
bucket counts change at scale, results must not)."""

import numpy as np
import pandas as pd
import pytest

from subgraph_isomorphism_pregel_ray.pipelines.relational import (
    bloom_filtered_revenue,
    customer_order_histogram,
    fk_integrity,
    large_volume_orders,
    order_priority_semi,
    promo_revenue,
    sales_opportunity,
    shipping_priority_topk,
    small_qty_revenue,
    succ_inout_correlation,
    succ_reciprocity,
    waiting_suppliers,
)

SF = "/root/testdata/sf0.001"


def _canon(out):
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize(
    "fn",
    [
        order_priority_semi,
        customer_order_histogram,
        small_qty_revenue,
        large_volume_orders,
        shipping_priority_topk,
        waiting_suppliers,
        sales_opportunity,
        succ_reciprocity,
        succ_inout_correlation,
        fk_integrity,
        promo_revenue,
        bloom_filtered_revenue,
    ],
    ids=lambda f: f.__name__,
)
def test_bucket_count_invariant(ray_session, fn):
    a = _canon(fn(SF, num_buckets=4))
    b = _canon(fn(SF, num_buckets=57))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize(
    "fn",
    [
        # session additions: every new bucketed exchange must be
        # partition-count invariant too
        "late_shipment_rate",
        "nation_market_share",
        "supplier_variety",
        "min_cost_supplier",
        "bulk_suppliers",
        "basket_lift",
        "succ_triad_motifs",
        "local_bridges",
        "important_parts_value",
    ],
)
def test_bucket_count_invariant_session_ops(ray_session, fn):
    import subgraph_isomorphism_pregel_ray.pipelines.relational as R

    f = getattr(R, fn)
    a = _canon(f(SF, num_buckets=4))
    b = _canon(f(SF, num_buckets=57))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("fn", ["tfidf_cosine_pairs", "source_gram_overlap",
                                "source_kl", "ngram_novelty", "split_leakage"])
def test_bucket_count_invariant_text_ops(ray_session, fn):
    import pyarrow.parquet as pq

    import subgraph_isomorphism_pregel_ray.pipelines.textops as T
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    f = getattr(T, fn)

    def run(nb):
        docs = read_table(SF, "documents", columns=["doc_id", "text", "source"])
        if fn == "tfidf_cosine_pairs":
            n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
            return f(docs, n, num_buckets=nb)
        return f(docs, num_buckets=nb)

    pd.testing.assert_frame_equal(_canon(run(4)), _canon(run(57)))


@pytest.mark.parametrize(
    "fn",
    [
        # round-2 late-session additions
        "frequent_triples",
        "etype_cooccur_lift",
        "weekly_churn",
        "weekly_stickiness",
        "user_acquisition_curve",
    ],
)
def test_bucket_count_invariant_round2_ops(ray_session, fn):
    import subgraph_isomorphism_pregel_ray.pipelines.relational as R

    f = getattr(R, fn)
    a = _canon(f(SF, num_buckets=4))
    b = _canon(f(SF, num_buckets=57))
    pd.testing.assert_frame_equal(a, b)


def test_bucket_count_invariant_late_events(ray_session):
    """late_events buckets are hash-top-bits ranges: 16 vs 64 ranges must
    produce identical late rows."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import late_events

    a = _canon(late_events(SF, num_buckets=16))
    b = _canon(late_events(SF, num_buckets=64))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize(
    "fn",
    [
        "bounce_rate_daily",
        "user_hour_entropy",
        "customer_order_gaps",
        "cohort_ltv",
        "survival_km",
        "markov_stationary",
    ],
)
def test_bucket_count_invariant_late_round2_ops(ray_session, fn):
    import subgraph_isomorphism_pregel_ray.pipelines.relational as R

    f = getattr(R, fn)
    a = _canon(f(SF, num_buckets=4))
    b = _canon(f(SF, num_buckets=57))
    pd.testing.assert_frame_equal(a, b)
