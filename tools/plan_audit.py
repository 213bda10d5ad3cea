"""Plan audit: dump physical-plan evidence for the headline queries.

Reproduces the PLANS.md spot checks: for each audited query, print the
formatted plan plus a one-line summary of the properties we require —
pushed filters, read schema width, exchange count, single-partition
exchanges, whole-stage-codegen coverage, Python workers.

Usage: python tools/plan_audit.py [query ...]   (default: audit set)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2gtfs_spark.plans import queries as Q
from osm2gtfs_spark.session import build_session

AUDIT = [
    "q1_pricing_summary",
    "knn_snap",
    "tile_coverage",
    "cell_encode",
    "minhash_lsh_pairs",
    "simhash_near_dup",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_components",
    "salted_agg",
    "replicated_salted_join",
    "adaptive_cell_split",
    # round-3 additions
    "line_dedup_c4",
    "pii_scrub",
    "decontaminate",
    "media_decode_meta_real",
    "embedding_near_dup",
    # round-4 additions
    "inverted_index",
    "tfidf_topk",
    "bm25_topk",
    "url_canonical_filter",
    "dup_span_scrub",
    "quality_filter_composite",
    "dedup_keeper_corpus",
    "embedding_quantize",
    # round-5 additions
    "morton_cell_encode",
    "polyline_cell_coverage",
    "cell_compact",
    "span_sequence_check",
    "grouped_quantiles",
    "topk_per_group",
    "minhash_fast_pairs",
    "corpus_prep_packed",
    "snap_to_polyline",
    # round-5 continuation: interleaved-span family
    "span_offset_repair",
    "media_asset_dedup",
    "pack_interleaved_chunks",
    "segment_intersection_join",
    "dwell_detect_runs",
    "turn_classification",
    "corridor_match_routes",
    "idw_grid_interpolation",
    "od_matrix_flows",
    "headway_profile",
    "space_time_match_events",
    "mixture_sample_corpus",
    "route_overlap_jaccard",
    "focal_cell_smoothing",
    "zonal_stats_polygons",
    "bigram_fluency_score",
    # round-5 third session
    "gi_star_hotspots",
    "tile_pyramid",
    "grid_voronoi_alloc",
    "network_reach_cost",
    "chunk_text_overlap",
    "polygon_fill_cells",
    "flow_pagerank",
    "tile_quadkeys",
    "interleaved_chunk_spans",
    "tile_snapshot_diff",
    "cell_anomaly_windows",
    "flow_rose_cells",
    "distinct_sketch_buckets",
    "speed_map_cells",
    "mobility_pipeline_composed",
    "media_context_pairs",
    "moran_i_global",
    "locf_gap_fill",
    "media_frame_sample",
    "cell_type_gini",
    "quadkey_tile_rollup",
    "bilinear_splat_density",
    "grid_flow_field",
    "cdc_apply_changeset",
    "histogram_quantiles_scale",
    "heavy_hitters_keys",
    # geofence_stream / tile_pyramid_ingest excluded: the gates drain a
    # streaming query at construction (same exclusion as the other
    # streaming gates)
    # raster_region_extract / grid_dbscan_clusters excluded: plan
    # construction executes the CC rounds and the emitted plan covers
    # only the post-CC tail
]


def summarize(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "single_partition_exchanges": len(
            re.findall(r"Exchange SinglePartition|Arguments: SinglePartition", plan)
        ),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan)[:2],
        "read_schemas": [
            s[:80] for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)[:3]
        ],
        "codegen_spans": len(re.findall(r"WholeStageCodegen", plan)),
        "python_evals": len(re.findall(r"(BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas)", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct|BroadcastNestedLoop", plan)),
    }


def main() -> None:
    names = sys.argv[1:] or AUDIT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = build_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        s = summarize(plan)
        print(f"== {name}: {s}")
        if os.environ.get("PLAN_AUDIT_FULL"):
            df.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
