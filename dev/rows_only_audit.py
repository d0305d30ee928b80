#!/usr/bin/env python3
"""Machine-checked registry of the rows-only (no-oracle) queries.

Every `SparkEntry.queries` entry without an `oracleSql` twin gets only a
rows>0 check from the driver — a weaker gate — so the set must never
grow silently. This script cross-checks the ACTUAL no-oracle set (the
Verify outDir's result dirs minus oracle_sql.json's keys) against the
DECLARED table below, which states for each entry WHY no DuckDB oracle
is possible. An undeclared rows-only entry, or a stale declaration,
fails the audit (exit 1). dev/check.py runs this after every diff;
run standalone as: python3 dev/rows_only_audit.py [outDir]

Reason categories:
  approx-estimator   sketch/estimator output depends on internal hash /
                     register / compaction state, not a portable value
  seeded-rng         sampling driven by an engine-local seeded RNG
  float-centroid     k-means style training — IEEE float reduction
                     order differs across engines per run topology
  sequential-argmin  inherently order-dependent greedy loop (training
                     merges, bin packing) not expressible as SQL
  codec              engine-local binary/string codec of a sketch/index
  env                engine-identity introspection by definition
  fake-codec         multimodal decode path with a deterministic FAKE
                     codec (libs absent); DuckDB has nothing to replay
                     — pinned-value specs check the values instead
"""
import sys, os, glob, json

# name -> (category, why no oracle; what checks it instead)
DECLARED = {
    "agg_approx_ndv":       ("approx-estimator", "HLL ndv() estimate; error-bound property spec (SketchSpec)"),
    "agg_cpc_ndv":          ("approx-estimator", "CPC sketch estimate; error-bound property spec"),
    "agg_histogram":        ("approx-estimator", "equi-depth histogram bounds depend on sample/merge order; invariants spec'd"),
    "agg_hll_sketch":       ("codec",            "HLL register-state string; round-trip + merge specs"),
    "agg_kll_quantile":     ("approx-estimator", "KLL quantile estimate; rank-error property spec"),
    "agg_kll_rank":         ("approx-estimator", "KLL rank estimate; rank-error property spec"),
    "agg_sample":           ("seeded-rng",       "reservoir sample; membership+size property spec"),
    "agg_sampled_ndv":      ("approx-estimator", "estimator over a seeded row sample"),
    "agg_sketch_str":       ("codec",            "sketch serialized form is engine-local; round-trip spec"),
    "dedup_semantic":       ("float-centroid",   "SemDeDup k-means cells (IEEE reduction order); planted-collapse spec"),
    "fn_env":               ("env",              "version()/current_database() are engine identity by definition"),
    "mm_audio_decode":      ("fake-codec",       "deterministic fake PCM decode; pinned-value spec (PipelineSpec)"),
    "mm_audio_frames":      ("fake-codec",       "frame windows over fake PCM; pinned-value spec"),
    "mm_image_decode":      ("fake-codec",       "deterministic fake image decode; pinned-value spec"),
    "mm_image_phash":       ("fake-codec",       "perceptual hash over fake decode; pinned-value spec"),
    "mm_image_resize":      ("fake-codec",       "resize over fake decode; pinned-value spec"),
    "mm_video_decode":      ("fake-codec",       "frame-sample over fake video; pinned-value spec"),
    "pipe_bpe_merges":      ("sequential-argmin","BPE training = sequential argmax merge loop; pinned-merges spec"),
    "pipe_bpe_tokenize":    ("sequential-argmin","tokenization under the trained (non-SQL) merge list; pinned spec"),
    "pipe_pack_bfd":        ("sequential-argmin","best-fit-decreasing packing is order-dependent; capacity/coverage spec"),
    "pipe_token_fertility": ("float-centroid",   "fertility under the TRAINED unigram vocab; P63b pins an analytic vocab and IS oracle-checked"),
    "pipe_unigram_tokenize":("float-centroid",   "unigram EM training (float likelihood loop); pinned-vocab spec"),
    "rel_tablesample":      ("seeded-rng",       "TABLESAMPLE draws from the engine's seeded RNG; bounds spec"),
    "sample_weighted":      ("seeded-rng",       "A-ES weighted reservoir keys are engine-local; distribution spec"),
    "sim_ivf_persisted":    ("float-centroid",   "IVF centroids are float k-means output; recall property spec"),
    "sim_ivf_topk":         ("float-centroid",   "IVF probe against float centroids; recall vs brute-force spec"),
    "sim_pq_persisted":     ("float-centroid",   "PQ codebooks are float k-means output; recall property spec"),
    "sim_pq_topk":          ("float-centroid",   "PQ ADC scan recall vs brute force; property spec"),
    "stats_table_incremental": ("approx-estimator", "incremental HLL-NDV merge; exact twin stats_table IS oracle-checked"),
    "stats_table_ndv":      ("approx-estimator", "HLL column NDV; exact twin stats_table IS oracle-checked"),
}


def audit(out_dir):
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    if not os.path.exists(oracle_path):
        print(f"rows-only audit: no {oracle_path} (run Verify first)")
        return 1
    oracle = set(json.load(open(oracle_path)))
    actual = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
              if os.path.isdir(d)} - oracle
    undeclared = sorted(actual - set(DECLARED))
    stale = sorted(set(DECLARED) - actual)
    ok = not undeclared and not stale
    if undeclared:
        print(f"rows-only audit: UNDECLARED no-oracle entries (add an oracle "
              f"or declare WHY none is possible): {undeclared}")
    if stale:
        print(f"rows-only audit: STALE declarations (entry gone or now "
              f"oracle-checked — delete the row): {stale}")
    if ok:
        cats = {}
        for _, (c, _r) in DECLARED.items():
            cats[c] = cats.get(c, 0) + 1
        print(f"rows-only audit: OK — {len(DECLARED)} declared "
              f"({', '.join(f'{c}={n}' for c, n in sorted(cats.items()))})")
    return 0 if ok else 1


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
    sys.exit(audit(out))
