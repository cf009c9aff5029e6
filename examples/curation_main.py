"""End-to-end corpus curation CLI: the full training-data pass, composed
from the package's operators.

    python examples/curation_main.py <sf_dir> <out_dir>
    python examples/curation_main.py /root/testdata/sf0.001 /tmp/corpus_out

Stages (each a module this repo ships, here simply composed):
1. score + filter   — quality floor, langid agreement (operators/curation)
2. exact dedup      — canonical doc per sha256 (operators/dedup pattern)
3. scrub            — blocklist-term removal (operators/textops)
4. LM scoring       — unigram mean log-prob floor (operators/textops)
5. mixture sampling — per-lang deterministic Bernoulli (operators/curation)
6. decontamination  — drop docs overlapping the held-out eval set's
                      3-gram shingles (operators/curation)
7. repetition floor — drop mostly-repeated documents (operators/textops)
8. span floor       — drop docs whose 5-gram spans are mostly copies of
                      other documents (operators/dedup span coverage)
9. train/val fold   — deterministic md5-prefix split (operators/curation)
10. sequence packing — greedy first-fit into 512-token bins (operators/curation)
11. write           — parquet partitioned by split (sources/partitioned),
                      then small-file compaction (sources/maintenance)

Prints the per-lang funnel and the output layout. The two frames that feed
multiple actions (the LM scores and the filtered corpus) are persisted;
everything else stays lazy so Catalyst fuses the scan-side stages.
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir, out_dir = argv

    from pyspark.sql import functions as F

    from clusterindices_spark.operators.curation import (
        hash_split,
        pack_greedy,
        q_curation_pipeline,
    )
    from clusterindices_spark.session import get_spark
    from clusterindices_spark.sources.fixtures import load_table
    from clusterindices_spark.sources.maintenance import compact_path, data_files
    from clusterindices_spark.sources.partitioned import write_partitioned

    spark = get_spark("corpus-curation")
    spark.sparkContext.setLogLevel("ERROR")

    print("== curation funnel (per lang) ==")
    for r in q_curation_pipeline(spark, sf_dir).orderBy("lang").collect():
        print(
            f"  {r['lang']}: {r['n_docs']} docs -> quality_ok {r['n_quality_ok']}"
            f" -> langid_ok {r['n_langid_ok']} -> retained {r['n_retained']}"
            f" ({r['n_tokens_retained']} tokens)"
        )

    from clusterindices_spark.operators.curation import (
        q_curation_sample_stratified,
    )
    from clusterindices_spark.operators.textops import (
        q_text_scrub_blocklist,
        q_text_unigram_logprob,
    )

    docs = load_table(spark, sf_dir, "documents")

    # LM-score floor: drop the lowest-scoring tail (bottom ~5% by mean
    # unigram log-prob — out-of-distribution documents). persist: the
    # logprob pipeline (explode → vocab groupBy → join) feeds two actions
    # (the quantile and the semi-join) and must not replay per action
    lp = (
        q_text_unigram_logprob(spark, sf_dir)
        .select("doc_id", "avg_logprob")
        .persist()
    )
    floor = lp.approxQuantile("avg_logprob", [0.05], 0.001)[0]
    keep_ids = lp.where(F.col("avg_logprob") >= floor).select("doc_id")
    print(f"== LM floor: avg_logprob >= {floor:.4f} ==")

    # mixture rebalancing: deterministic per-lang Bernoulli keep
    sampled_ids = q_curation_sample_stratified(spark, sf_dir).select("doc_id")

    # eval-set decontamination: anti-join the corpus against train docs
    # sharing any 3-gram shingle with the held-out set
    from clusterindices_spark.operators.curation import q_curation_decontaminate

    contaminated = q_curation_decontaminate(spark, sf_dir).select("doc_id")
    n_contaminated = contaminated.count()
    print(f"== decontamination: dropping {n_contaminated} overlapping docs ==")

    # repetition floor: drop documents that are mostly one repeated 2-gram
    from clusterindices_spark.operators.textops import q_text_repetition_stats

    rep_ok = (
        q_text_repetition_stats(spark, sf_dir)
        .where(F.col("dup_2gram_frac") <= 0.9)
        .select("doc_id")
    )

    # cross-document span floor (Lee et al. 2022): drop documents whose
    # token 5-gram spans are mostly copies of other documents — catches
    # boilerplate/mirror content that whole-document dedup keeps
    from clusterindices_spark.operators.dedup import q_dedup_span_coverage

    span_ok = (
        q_dedup_span_coverage(spark, sf_dir)
        .where(
            F.col("dup_frac").isNull() | (F.col("dup_frac") <= 0.8)
        )
        .select("doc_id")
    )
    n_span_dropped = docs.join(span_ok, "doc_id", "left_anti").count()
    print(f"== span floor: dropping {n_span_dropped} mostly-duplicated docs ==")

    # blocklist scrub: the cleaned text REPLACES the raw text so every
    # downstream stage (token counts, bin packing, the written corpus)
    # describes the text actually shipped
    scrubbed = q_text_scrub_blocklist(spark, sf_dir).select(
        "doc_id", "clean_text", "n_removed"
    )

    docs = (
        docs.join(keep_ids, "doc_id", "left_semi")
        .join(sampled_ids, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .join(rep_ok, "doc_id", "left_semi")
        .join(span_ok, "doc_id", "left_semi")
        .join(scrubbed, "doc_id")
        .drop("text")
        .withColumnRenamed("clean_text", "text")
        .persist()  # feeds count, packing, fold, and the final write
    )
    n_kept = docs.count()
    lp.unpersist()
    print(f"== after LM floor + mixture sampling: {n_kept} docs ==")

    packed = pack_greedy(docs)
    folds = hash_split(docs)
    corpus = (
        docs.join(packed.select("doc_id", "grp", "bin", "n_tokens"), "doc_id")
        .join(folds.select("doc_id", "split"), "doc_id")
        .select(
            "doc_id", "lang", "text", "n_removed",
            "n_tokens", "grp", "bin", "split",
        )
    )
    # pipeline accounting rides the write action itself (df.observe):
    # the counters are computed by the same job that writes the corpus —
    # no second pass over the data, which at 100 TB is the difference
    # between free metrics and doubling the pipeline cost
    from pyspark.sql import Observation

    obs = Observation("corpus_metrics")
    corpus = corpus.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens").alias("tokens"),
        F.max("bin").alias("max_bin"),
    )
    write_partitioned(corpus, out_dir, ["split"])
    m = obs.get
    print(
        f"== observed on the write: {m['rows']} rows, {m['tokens']} tokens,"
        f" max bin {m['max_bin']} =="
    )
    n_before = len(data_files(out_dir))
    n_after = compact_path(spark, out_dir, target_file_bytes=64 << 20)
    print(f"== wrote {out_dir} (files: {n_before} -> {n_after} after compaction) ==")
    for d in sorted(pathlib.Path(out_dir).glob("split=*")):
        n = spark.read.parquet(str(d)).count()
        print(f"  {d.name}: {n} rows")

    # --- r6: mixture budgeting + importance weights --------------------
    from clusterindices_spark.operators.curation import (
        q_curation_dsir_weights,
        q_curation_waterfill_budget,
    )

    print("== token-budget waterfilling (50% budget, max-min fair) ==")
    for r in (
        q_curation_waterfill_budget(spark, sf_dir)
        .orderBy(F.col("tokens").desc())
        .limit(6)
        .collect()
    ):
        cap = " CAPPED" if r["capped"] else ""
        print(
            f"  {r['source']:>6}: {r['tokens']:>8} tokens ->"
            f" {r['allocated']:>10.1f}{cap}"
        )

    dsir = q_curation_dsir_weights(spark, sf_dir)
    kept = dsir.where(F.col("keep")).count()
    total = dsir.count()
    print(
        f"== DSIR importance resampling: {kept}/{total} docs look"
        f" target-language-like =="
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
