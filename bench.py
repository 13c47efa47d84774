#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:

  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "pipeline": {triples_per_sec, pages_per_sec, ...},
   "scaling": {local8_docs_per_sec, local32_docs_per_sec, efficiency}}

- headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  on local[$SPARK_GRAFT_CPUS];
- pipeline = end-to-end KG construction (extract → mentions → link → canon →
  triples → counts, with lineage) on a deterministic synthetic pages table;
- scaling = the fused tokenize→encode→GP-decode mention stage over the SAME
  parquet input at local[8] vs local[32] (sandbox stand-in for N vs 4N
  executors); efficiency = T_8 / (4 · T_32) per BASELINE.md. Disable with
  SPARK_GRAFT_SCALING=0.
"""

from __future__ import annotations

import os

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import json  # noqa: E402
import shutil  # noqa: E402
import subprocess  # noqa: E402
import sys  # noqa: E402
import tempfile  # noqa: E402
import time  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "triples_flagship",
    "ner_mentions",
    "ner_model_gp",
    "entity_disambiguation",
    "entity_pmi_edges",
    "doc_boilerplate",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_est",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "neardup_embedding_cosine",
    "ann_topk",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_ivf_nprobe2",
    "ivf_assign",
    "ivf_kmeans_train",
    "train_grad_step",
    "doc_splits",
    "top_terms_tfidf",
    "corpus_curation",
    "doc_winnow_fingerprint",
    "doc_containment",
    "doc_quality_adaptive",
    "vocab_edit_pairs",
    "table_profile",
    "graph_pagerank",
    "graph_pagerank_weighted",
    "graph_ppr",
    "graph_triangles",
    "graph_related",
    "graph_pred_stats",
    "graph_metapaths",
    "kg_negatives",
    "entity_embeddings",
    "entity_related_embedding",
    "multimodal_features",
    "multimodal_image_dims",
    "benchmark_contamination",
    "source_stats",
    "source_balance",
    "doc_nfc",
    "doc_repetition",
    "graph_export_ntriples",
    "sketch_distinct_users",
    "sketch_value_quantiles",
    "doc_quality",
    "doc_lang_id",
    "q1_pricing_summary",
    "join_shuffle_revenue",
    "join_broadcast",
    "window_rank",
    "events_sessions",
    "rollup_events",
]

SCALING_PAGES = 24_000
SCALING_CORES = (2, 8, 32)  # two N→4N pairs: 2→8 and 8→32
PIPELINE_PAGES = 8_000


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # warm the session INCLUDING python workers (spawn + package import),
    # so the first measured query isn't charged the one-time worker boot
    entry_mod.q_ner_mentions(spark, sf_dir).count()
    out: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _rep in range(2):  # best-of-2: the host shows 1.3-3x CPU steal
            from entity_extractor_by_pointer_spark.cache import release_all

            release_all()  # operators register persists in the cache module
            spark.catalog.clearCache()  # operators persist intermediates
            # (shingle tables, vector norms); don't let one query's cache
            # residue charge memory pressure to the next query's timing
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
    return out


def run_pipeline(spark, n_pages: int) -> dict[str, float]:
    """Best-of-2, same as the headline queries: the first pipeline run in a
    session pays one-time JIT/codegen for the whole write path (~2x wall on
    this host), which is amortized noise for a long-running ingest, not
    throughput."""
    from entity_extractor_by_pointer_spark.plans.pipeline import KgPipeline
    from entity_extractor_by_pointer_spark.sources.pages import generate_pages

    pages = generate_pages(spark, n_pages, partitions=64)
    best = None
    for rep in range(2):
        workdir = tempfile.mkdtemp(prefix="kgbench_")
        try:
            from entity_extractor_by_pointer_spark.cache import release_all

            release_all()
            spark.catalog.clearCache()
            t0 = time.time()
            pipe = KgPipeline(spark, workdir, f"bench{rep}")
            pipe.run(pages)
            wall = time.time() - t0
            m = {
                r["key"]: r["value"]
                for r in pipe.writer.read_metrics().where("stage = 'pipeline'").collect()
            }
            cand = {
                "pages": n_pages,
                "wall_sec": round(wall, 2),
                "triples": int(m["triples"]),
                "triples_per_sec": round(m["triples"] / wall, 1),
                "pages_per_sec": round(n_pages / wall, 1),
            }
            if best is None or cand["wall_sec"] < best["wall_sec"]:
                best = cand
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    return best


def _mentions_worker(master: str, pages_path: str) -> None:
    """Subprocess entry: time the mention stage at a given parallelism."""
    from entity_extractor_by_pointer_spark.functions.model import NerConfig
    from entity_extractor_by_pointer_spark.operators.mentions import detect_mentions
    from entity_extractor_by_pointer_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-{master}", master=master)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(pages_path)
    n_docs = df.count()  # warms the scan + session
    # logit_bias −8 ⇒ ~10 spans per 1000 docs: a trained model's output is
    # sparse, so the benchmark measures the tokenize→encode→score→decode
    # compute, not pathological random-weight span serialization
    cfg = NerConfig(
        classes=["person", "location", "organization"], model_type="gp", logit_bias=-8.0
    )
    # warm the python workers (spawn + numpy/model import + model build)
    # so the timed section measures steady-state throughput, not JIT costs
    detect_mentions(df.limit(2048).repartition(64), cfg).count()
    t0 = time.time()
    n_spans = detect_mentions(df, cfg).count()
    dt = time.time() - t0
    print(json.dumps({"seconds": dt, "docs": n_docs, "spans": n_spans}))
    spark.stop()


def run_scaling(pages_path: str) -> dict:
    """Mention-stage throughput at three parallelism levels (best of 2 runs
    each — the sandbox VM is noisy) → two N→4N strong-scaling pairs.

    Note on interpretation (see BASELINE.md): this single VM throttles
    per-core speed as occupancy rises (pure-CPU spin loses ~14% from 8→32
    procs) and caps aggregate memory bandwidth, so local core-scaling is a
    LOWER BOUND on multi-executor scaling, where each executor brings its
    own memory channels. A no-Spark multiprocessing control of the same
    numpy kernel shows the same plateau — the Spark layer itself adds no
    scaling penalty.
    """
    res: dict[int, float] = {}
    docs = spans = None
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
    for cores in SCALING_CORES:
        best = None
        for _rep in range(reps):  # best-of-N: the sandbox host shows heavy
            # co-tenant CPU-steal variance (2-4x between adjacent runs)
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--mentions-worker",
                    f"local[{cores}]",
                    pages_path,
                ],
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            payload = json.loads(proc.stdout.strip().splitlines()[-1])
            best = payload if best is None or payload["seconds"] < best["seconds"] else best
        res[cores] = best["seconds"]
        docs, spans = best["docs"], best["spans"]
    out = {"docs": docs, "spans": spans}
    for cores in SCALING_CORES:
        out[f"local{cores}_sec"] = round(res[cores], 2)
        out[f"local{cores}_docs_per_sec"] = round(docs / res[cores], 1)
    out["efficiency_2_to_8"] = round(res[2] / (4 * res[8]), 3)
    out["efficiency_8_to_32"] = round(res[8] / (4 * res[32]), 3)
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--mentions-worker":
        _mentions_worker(sys.argv[2], sys.argv[3])
        return

    from entity_extractor_by_pointer_spark.session import get_spark
    from entity_extractor_by_pointer_spark.sources.pages import generate_pages

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = run_headline(spark, sf_dir)
    pipeline = run_pipeline(spark, PIPELINE_PAGES)

    scaling = None
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        scale_dir = tempfile.mkdtemp(prefix="kgscale_") + "/pages"
        # long pages (~150-200 tokens) so the L² head work dominates and the
        # measurement reflects the compute core, not row plumbing
        generate_pages(
            spark, SCALING_PAGES, partitions=64, min_sents=10, extra_sents=5
        ).write.parquet(scale_dir)
        spark.stop()  # free all cores for the subprocess runs
        try:
            scaling = run_scaling(scale_dir)
        finally:
            shutil.rmtree(os.path.dirname(scale_dir), ignore_errors=True)
    else:
        spark.stop()

    # per-query ratio vs the LATEST recorded round (regression visibility;
    # <1.0 = faster than last round). Anchoring to round 1 stopped being
    # informative once most queries post-dated it.
    vs_prev: dict[str, float] | None = None
    prev_round = None
    here = os.path.dirname(os.path.abspath(__file__))
    import re as _re

    rounds = sorted(
        int(m.group(1))
        for f in os.listdir(here)
        if (m := _re.fullmatch(r"BENCH_r(\d+)\.json", f))
    )
    if rounds:
        prev_round = rounds[-1]
        try:
            with open(os.path.join(here, f"BENCH_r{prev_round:02d}.json")) as f:
                rec = json.load(f)
            prev = (rec.get("parsed") or {}).get("queries")
            if not prev:
                # driver records sometimes carry only a TRUNCATED "tail"
                # string of the JSON line (parsed: null) — recover the
                # per-query seconds from it. Scan ONLY the substring before
                # the ratio section ('"vs_r'): keys whose seconds were cut
                # off reappear there as ratios, and picking those up would
                # fabricate phantom 10x regressions
                seconds_part = rec.get("tail", "").split('"vs_r')[0]
                prev = {}
                for k, v in _re.findall(
                    r'"([a-z0-9_]+)": ([0-9]+\.[0-9]+)', seconds_part
                ):
                    prev.setdefault(k, float(v))
            vs_prev = {
                k: round(v / prev[k], 2) for k, v in queries.items() if prev.get(k)
            }
        except (OSError, json.JSONDecodeError, KeyError, ZeroDivisionError):
            vs_prev = None

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "queries": queries,
        f"vs_r{prev_round:02d}" if prev_round else "vs_prev": vs_prev,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pipeline": pipeline,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
