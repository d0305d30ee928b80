#!/usr/bin/env python3
"""Machine-checked TPC-DS coverage map (the registry_diff discipline
applied to the reference's TPC-DS book).

The reference ships its TPC-DS queries as test coverage
(apache-impala-4.1.0/testdata/workloads/tpcds/queries/tpcds-q*.test).
This script closes that book the way registry_diff.py closes the
builtin-function registry: every reference query number must be either
COVERED by a `ds_q<N>_*` entry in the repo's inventory, or DECLARED
below as a TEMPLATE DUPLICATE of a covered shape (same plan template on
a different channel/dim — TPC-DS reuses ~15 plan templates across its
99 queries by design). An unmapped reference query, a template row
whose target is not covered, or a stale template row (its query gained
its own entry, or left the reference set) fails the audit (exit 1).

Usage: python3 dev/tpcds_coverage.py [refQueriesDir]
"""
import sys, os, re, glob

REF_DIR = (sys.argv[1] if len(sys.argv) > 1 else
           "/root/reference/apache-impala-4.1.0/testdata/workloads/tpcds/queries")
REPO_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "src", "main", "scala", "graft", "operators")

# qN -> (covering qN, why the plan template is the same)
DECLARED_TEMPLATES = {
    8:  (19, "zip-prefix dim filter + store join revenue — the q19 brand/geo membership-filter aggregate on another dim column"),
    11: (4,  "customer year-over-year growth ratio across two channels — q4's 4-way grain self-join with one fewer channel (ds_q4_growth_ratio)"),
    12: (98, "30-day class revenue share via window sum ratio — q98's body on the web channel (ds_q98_class_share)"),
    15: (19, "catalog sales by zip band with OR'd membership arms — the q19/q45 membership-filter aggregate"),
    16: (94, "EXISTS + NOT EXISTS distinct-count shipping — q94's body on the catalog channel (ds_q94_unreturned_orders)"),
    18: (27, "average measure profile under a demographics rollup — q27's rollup-profile body (ds_q27_rollup_profile)"),
    20: (98, "class revenue share over a date window — the q98/q12 window-share template (ds_q98_class_share)"),
    25: (17, "3-way sales/returns/re-purchase chain across date windows — q17's stats chain with sum instead of stddev (ds_q17_stats_chain)"),
    26: (7,  "demographic average profile — q7's body on the catalog channel (ds_q7_avg_profile)"),
    30: (81, "customer return share vs 1.2x state average — q81's body on the web channel (ds_q81 entry)"),
    41: (45, "dim-only item lookup under an OR'd attribute-combination EXISTS — the q45 disjunctive-membership template restricted to the dim"),
    48: (13, "disjunctive (demographic x band) arms feeding one aggregate — q13's OR-arm body without the averages (ds_q13_band_averages)"),
    50: (62, "sales-to-return latency day-band pivot — q62's ship-latency band template (ds_q62_ship_latency)"),
    52: (42, "brand revenue by year topN — q42/q3's body (ds_q42 entry)"),
    55: (42, "manager brand revenue topN — same q42/q3 template"),
    56: (33, "three-channel aggregate union over an item list — q33's union battery (ds_q33_class_union)"),
    57: (47, "call-center monthly deviation from yearly average with lag/lead — q47's body on another dim (ds_q47_moving_avg)"),
    60: (33, "three-channel union over an item list — the q33/q56 template"),
    63: (53, "manager monthly revenue vs moving average — q53's body (ds_q53 entry)"),
    69: (10, "demographic profile gated by EXISTS / NOT EXISTS channel arms — q10's body (ds_q10_or_exists)"),
    71: (76, "brand revenue by hour unioned across three channels — the q76 channel-union template (ds_q76_channel_union)"),
    73: (34, "basket line-count band joined back to customers — q34's body with a different band (ds_q34_basket)"),
    74: (4,  "customer year-over-year ratio across two channels — q4's template (ds_q4_growth_ratio)"),
    77: (5,  "per-channel sales/returns full-outer rollup — q5's channel-rollup body (ds_q5_channel_rollup)"),
    79: (34, "store baskets per (customer, city) with demographic gates — the q34/q73 basket template plus dim filters"),
    80: (40, "channel rollup with returns netted out of revenue — q40's netting inside q5's rollup (ds_q40_returns_netting + ds_q5_channel_rollup)"),
    82: (37, "price-band + inventory item listing — q37's body on the store channel (ds_q37_partband_window)"),
    83: (33, "three-way returns union over a date-IN subquery — the q33/q56 union battery with a date list"),
    84: (85, "customer lookup through an income-band dim join chain — q85's profile-join template (ds_q85_return_profile)"),
    86: (36, "margin rollup with rank within parent — q36's body without the store dim (ds_q36_margin_rank); the rank-within-rollup mechanics also live in ds_q70_rollup_rank"),
    89: (47, "monthly brand deviation from the yearly average — the q47/q57/q63 deviation template"),
    92: (6,  "ext-discount vs 1.3x correlated per-item average — q6's above-average correlated-scalar template (ds_q6_above_avg_price)"),
    96: (90, "count of sales in a time-of-day band — q90's time-ratio template, single band (ds_q90_time_ratio)"),
    99: (62, "catalog shipping latency day-bands — q62's body on another channel (ds_q62_ship_latency)"),
}


def ref_queries():
    qs = set()
    for f in glob.glob(os.path.join(REF_DIR, "tpcds-q*.test")):
        m = re.match(r"tpcds-q(\d+)[ab]?\.test$", os.path.basename(f))
        if m:
            qs.add(int(m.group(1)))
    return qs


def covered_queries():
    qs = set()
    for f in glob.glob(os.path.join(REPO_SRC, "Tpcds*.scala")):
        for m in re.finditer(r'"ds_q(\d+)[a-z_]*"\s*->', open(f).read()):
            qs.add(int(m.group(1)))
    return qs


def main():
    ref = ref_queries()
    cov = covered_queries()
    if not ref:
        print(f"tpcds coverage: no reference queries under {REF_DIR}")
        return 1
    problems = []
    unmapped = sorted(ref - cov - set(DECLARED_TEMPLATES))
    if unmapped:
        problems.append(f"UNMAPPED reference queries (cover or declare): {unmapped}")
    stale_covered = sorted(q for q in DECLARED_TEMPLATES if q in cov)
    if stale_covered:
        problems.append(f"STALE template rows (now covered by their own entry): {stale_covered}")
    stale_gone = sorted(q for q in DECLARED_TEMPLATES if q not in ref)
    if stale_gone:
        problems.append(f"STALE template rows (not in the reference set): {stale_gone}")
    bad_target = sorted(q for q, (t, _) in DECLARED_TEMPLATES.items() if t not in cov)
    if bad_target:
        problems.append(f"template rows whose TARGET is not covered: {bad_target}")
    for p in problems:
        print(f"tpcds coverage: {p}")
    if not problems:
        extra = sorted(cov - ref)
        print(f"tpcds coverage: OK — reference {len(ref)} queries: "
              f"{len(ref & cov)} covered by own entries, "
              f"{len(DECLARED_TEMPLATES)} declared template duplicates; "
              f"repo also covers {extra} beyond the 4.1.0 plain set "
              f"(decimal_v2/3.3.0 variants and TPC-DS-spec shapes)")
    return 0 if not problems else 1


if __name__ == "__main__":
    sys.exit(main())
