"""Per-query bench regression diff: join two BENCH_r{N}.json files and
print the delta for every query, annotated with whether the entry's part
set changed between the rounds (from the PARTS_CHANGED table below, which
mirrors SURVEY.md §2.4's round-composition notes).

Usage:
    python tools/bench_diff.py BENCH_r04.json BENCH_r05.json [threshold]

Queries whose wall moved more than *threshold* (default 1.4x) in either
direction and whose parts did NOT change are flagged REGRESSION/SPEEDUP —
those are the rows that need an explanation (methodology, environment, or
a real plan change); moves on entries with changed parts are expected.
"""

from __future__ import annotations

import json
import sys

#: rounds in which an entry's part composition changed (new sub-queries
#: folded in, or parts moved between entries) — a wall move across that
#: boundary is expected, not a regression. Keep appending per round.
PARTS_CHANGED: dict[str, list[int]] = {
    # round 4 folded 16 new oracle parts into existing entries
    "s_stats": [4, 5, 6, 7, 8],     # r4 +bins+outliers; r5 fused, +mad
                                    # +spearman; r6 +anova +mannwhitney
                                    # +kendall +winsor +cramer +auc +kappa;
                                    # r7 +psi +targetenc +bootstrap
                                    # +theilsen +mahala, shared slim
                                    # checkpoint; r8 rank family split OUT
                                    # into s_stats_rank (-6 parts)
    "s_stats_rank": [8],            # NEW entry r8: spearman/mannwhitney/
                                    # kendall/auc/mutualinfo/theilsen moved
                                    # from s_stats, +wpct
    "s_pivot_unpivot": [8],         # NEW entry r8: merges the retired
                                    # s_pivot + s_unpivot entries
    "s_skew_udaf": [4, 5],          # r4 +grouped_map; r5 +skewreport
    "s_merge_upsert": [4, 5],       # r4 +scd2+incr+diff; r5 +pit+apply
    "s_window_range_trailing": [4, 5, 6, 7],  # r4 +zscore; r5 +ewma
                                    # +distinct7 +rollmed; r6 +acf; r7 +holt
    "s_time_rollup": [4, 6, 7],     # r4 +resample; r6 +linear; r7 +seasonal
    "s_funnel": [4, 5],             # r4 +retention; r5 +attribution
    "s_approx_sketches": [4, 5],    # r4 +theta+kll+freq; r5 +setops
    "x_dedup": [4, 5],              # r4 +spans+selfspans; r5 +keepbest
    "x_embed_neardup": [4, 5],      # r4 +semdedup; r5 sqrt(n) centroids + norms
    "x_hash_sampling": [4, 5, 6],   # r4 +weighted; r5 +mix+pergroup
                                    # +negatives; r6 +kfold
    "x_curation_scrub": [4, 6, 7],  # r4 +expect; r6 +blocklist; r7 +url
                                    # +urldedup +domcap +tempw +tempsamp
    "s_source_roundtrip": [4, 5],   # r4 +zorder; r5 +checksum
    "x_cosine_search": [5, 7],      # r5 +ann_lsh; r7 +recall
    "x_probes_rows_only": [5, 6],   # r5 -ann_lsh; r6 entry RETIRED
    "x_cluster_assign": [5],        # kmeans_fit input persist
    "x_bm25": [5],                  # +phrase +postings +snippets
    "x_ngram_jaccard": [5, 6, 7],   # r5 +editdist +simhash(md5) +containment;
                                    # r6 editdist default -> FastSS deletion;
                                    # r7 +linkage
    "s_group_sets": [5],            # +gsets
    "x_text_stats": [5],            # +unigram-nll, +bigram-nll columns
    "s_join_semi_anti": [5],        # +bloom
    "s_sessionize": [5],            # +transitions +islands +paths
    "r_summary_all": [5, 6, 7],     # r5 +hist +profile +benford; r6 +hist2d;
                                    # r7 +fk
    "x_embed_quantize": [5, 6],     # r5 +pq; r6 +jlproj
    "x_term_weights": [5, 6],       # r5 +colloc; r6 +tfcos
    "x_dedup_clusters": [5, 7],     # r5 +pagerank +triangles; r7 +bfs
    "r_construct_roundtrips": [6],  # +rename
    "r_map_mutate": [6],            # +na_fill +na_drop +na_replace
    "s_range_joins": [6],           # +overlap
    "x_chunk_pack": [6],            # +chunk_sent
    "s_layout_prune": [6, 7, 8],    # NEW entry r6 (zprune/hprune/compact/
                                    # partitioned — replaces the retired
                                    # x_probes_rows_only slot); r7 +snapshot;
                                    # r8 +snapprune (stats-pruned time travel)
    "st_stateful": [7, 8],          # r7 first round on the bench clock;
                                    # r8 +holt (second real stream)
    "st_dedup": [7],                # first round on the bench clock
}


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4

    def load(p):
        with open(p) as f:
            d = json.load(f)
        # driver-recorded BENCH_r{N}.json wraps bench.py's JSON line
        # under "parsed"; a raw bench.py line has "queries" at top level
        if "parsed" in d and isinstance(d["parsed"], dict):
            d = d["parsed"]
        return d.get("queries", {}), d.get("value")

    def round_of(p):
        import re
        m = re.search(r"r(\d+)", p)
        return int(m.group(1)) if m else None

    old_q, old_total = load(old_path)
    new_q, new_total = load(new_path)
    new_round = round_of(new_path)

    rows = []
    for name in sorted(set(old_q) | set(new_q)):
        a, b = old_q.get(name), new_q.get(name)
        if a is None or b is None:
            rows.append((name, a, b, None, "added" if a is None
                         else "removed"))
            continue
        if a <= 0 or b <= 0:
            rows.append((name, a, b, None, "FAILED run"))
            continue
        ratio = b / a
        changed = (new_round is not None
                   and new_round in PARTS_CHANGED.get(name, []))
        note = "parts-changed" if changed else ""
        if not changed and ratio >= threshold:
            note = "REGRESSION"
        elif not changed and ratio <= 1 / threshold:
            note = "SPEEDUP"
        rows.append((name, a, b, ratio, note))

    width = max(len(r[0]) for r in rows)
    print(f"{'query':<{width}} {'old':>8} {'new':>8} {'ratio':>7}  note")
    for name, a, b, ratio, note in rows:
        fa = f"{a:.2f}" if isinstance(a, float) else "-"
        fb = f"{b:.2f}" if isinstance(b, float) else "-"
        fr = f"{ratio:.2f}x" if ratio else "-"
        print(f"{name:<{width}} {fa:>8} {fb:>8} {fr:>7}  {note}")
    if old_total and new_total:
        print(f"\ntotal: {old_total:.1f}s -> {new_total:.1f}s "
              f"({new_total / old_total:.2f}x)")


if __name__ == "__main__":
    main()
