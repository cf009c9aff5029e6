"""Text-analysis operators for training-data pipelines (SURVEY.md §2C +
task north star: language-ID, quality scoring, token counting, TF-IDF,
document fingerprinting). All pure Catalyst expressions over ``documents``;
every key is oracle-checked (the heuristics are deterministic rule systems,
so both engines must agree exactly).

Scale: each operator is scan → per-row HOF work → at most one low-cardinality
shuffle (by lang, or by term for the DF counts). TF-IDF shuffles by term —
the one genuinely wide shuffle here; at 100 TB pre-aggregate per partition
(map-side combine handles it) and consider frequency-capping the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clusterindices_spark.functions.aggregates import SQL_ROUND6
from clusterindices_spark.functions.text import (
    SQL_FINGERPRINT,
    SQL_FOLD_LOWER,
    SQL_TOKENS,
    fold_lower,
    rolling_fingerprint,
    tokens,
)
from clusterindices_spark.sources.fixtures import fan_out, load_table

# tiny built-in stopword/marker lexicons (deterministic rule system — the
# synthetic corpus is shared-vocabulary word soup, so these are exercised as
# an engine operator, not a linguistic claim)
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "and", "of", "to", "is", "a"),
    "es": ("el", "la", "los", "y", "de", "que"),
    "fr": ("le", "la", "les", "et", "de", "est"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")


def _with_tokens(d: DataFrame, fan: bool = False) -> DataFrame:
    # fan=True normalizes input parallelism (fixtures.fan_out) for consumers
    # doing heavy scan-stage work before any shuffle (unigram logprob's
    # per-token fold). The explode→groupBy ops shuffle immediately, which
    # already spreads the work — there the extra exchange measured net-loss.
    # Kept for the SINGLE-PASS scan-shaped keys (langid/quality/scrub),
    # whose plan contract is a pushdown scan with zero exchanges; the
    # multi-pass token consumers use _toks_pinned below.
    if fan:
        d = fan_out(d)
    return d.withColumn("toks", tokens(F.col("text")))


def _toks_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One tokenized generation (doc_id, lang, source, toks) shared by the
    LM-scoring family (unigram/bigram logprob, heldout, pmi) — the keys
    that walk the corpus three to four times per query (vocab agg + totals
    + scoring join, pmi adds two plan-build driver counts) AND carried a
    fan_out round-robin exchange on every pass. The pin tokenizes and
    spreads once per session; every pass afterwards is a cache scan.

    Scope pinned by isolated A/B (r13, min-of-4 at sf0.1): the pin wins
    only where it replaces repeated fan-exchange+tokenize passes
    (unigram 1.28→0.81 s, bigram 1.66→1.33 s, pmi 1.58→1.12 s); for the
    plain-scan keys the cached array<string> decode costs as much as
    re-tokenizing (rake 1.42→2.04 s, js_divergence 0.82→1.11 s REGRESSED),
    so single-scan-shaped keys stay on _with_tokens. Same one-generation
    machinery and fixtures-immutable assumption as the dedup family's
    ngram_exploded pin; at 100 TB this is the standard tokenize-once
    materialization (disk-backed)."""
    from clusterindices_spark.functions.pins import repin

    d = fan_out(load_table(spark, sf_dir, "documents"))
    return repin(
        "text_toks",
        d.select(
            "doc_id", "lang", "source", tokens(F.col("text")).alias("toks")
        ),
    )


def q_text_tokens_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    ex = d.select("lang", "doc_id", F.explode("toks").alias("tok"))
    return ex.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
        F.round(F.count(F.lit(1)) / F.countDistinct("doc_id"), 6).alias(
            "avg_tokens_per_doc"
        ),
    )


def q_text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per doc; idf = ln(N/df); deterministic
    (rounded score desc, term asc) ranking."""
    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_total") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


def _marker_score(lang: str):
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(F.col("toks"), lambda t: t.isin(*markers)))


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID with alphabetical-priority tie-break —
    a deterministic rule cascade (identical CASE chain in the oracle)."""
    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id",
        "lang",
        *[_marker_score(lg).alias(f"s_{lg}") for lg in LANG_MARKERS],
    )
    s = {lg: F.col(f"s_{lg}") for lg in LANG_MARKERS}
    pred = (
        F.when(s["de"] >= F.greatest(s["en"], s["es"], s["fr"], s["zh"]), "de")
        .when(s["en"] >= F.greatest(s["es"], s["fr"], s["zh"]), "en")
        .when(s["es"] >= F.greatest(s["fr"], s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    return scored.select("doc_id", "lang", pred.alias("pred_lang"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score from length / token-shape / stopword signals,
    the standard pre-training quality-filter shape. All three rounds use the
    floor-based stable form: the weighted sum lands exactly on .xxxxxx5
    boundaries (0.4284375 observed at sf0.1) where engine round() halves
    disagree."""
    from clusterindices_spark.functions.aggregates import round6_stable

    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    n_toks = F.size("toks")
    sum_len = F.aggregate(
        F.col("toks"), F.lit(0), lambda acc, t: acc + F.length(t)
    )
    n_stop = F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS)))
    avg_tok_len = round6_stable(sum_len / F.nullif(n_toks, F.lit(0)))
    stop_ratio = round6_stable(n_stop / F.nullif(n_toks, F.lit(0)))
    score = round6_stable(
        F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.5
        + stop_ratio * 0.3
        + F.least(avg_tok_len / F.lit(10.0), F.lit(1.0)) * 0.2
    )
    return d.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        avg_tok_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


# GPT-2-ish pre-tokenizer shape (lowercased corpus): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs. Kept to syntax
# that Java regex (Spark) and RE2 (DuckDB) interpret identically.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways a data pipeline needs it: cheap whitespace
    count (budget estimates) and a BPE-ish regex count (closer to real
    tokenizer cost, still pure scan-side expression work — no UDF, no
    vocab)."""
    d = load_table(spark, sf_dir, "documents")
    low = fold_lower(F.col("text"))
    bpe = F.regexp_extract_all(low, F.lit(BPE_ISH_PATTERN), 0)
    n_bpe = F.size(bpe)
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(
            F.length("text") / F.nullif(n_bpe.cast("double"), F.lit(0.0)), 6
        ).alias("chars_per_token"),
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", rolling_fingerprint(F.col("text")).alias("fingerprint")
    )


# boilerplate/blocklist scrub: terms stripped before training (the
# HTML-boilerplate / contraband-term removal shape). Token-level HOF filter
# instead of regex so both engines share one tokenizer and no regex-dialect
# coupling; stays inside whole-stage codegen.
BLOCKLIST = ("customer", "spark", "the", "a")


def q_text_scrub_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip blocklisted tokens from each document; report the cleaned text
    and how much was removed. Pure scan-side expression work — zero
    shuffles at any scale, and the filter composes with downstream
    tokenized ops without re-tokenizing."""
    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    kept = F.filter(F.col("toks"), lambda t: ~t.isin(*BLOCKLIST))
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring: mean unigram log-probability per
    document under the corpus's own MLE unigram model (the classic
    perplexity-filter shape for training-data curation — low scores flag
    out-of-distribution documents).

    Determinism: ln() differs between the JVM and libm in the last ulp
    (measured 43/1999 fixture-range values), so each token's logprob is
    floor-scaled to BIGINT micros before the per-doc sum — a 1-ulp ln
    disagreement only flips a micro when ln(p)*1e6+0.5 sits within ~1e-9
    of an integer.

    fan=True: the tokenize + explode feeding both the vocab count and the
    scoring join is scan-stage work (measured ~0.2 s win at sf0.1).

    Scale: vocabulary counts shuffle by term (map-side combined, vocab ≪
    corpus); scoring joins the exploded corpus to the broadcast vocab.
    At 100 TB the vocab (even millions of terms) still broadcasts; the
    per-doc agg shuffles by doc_id — the same key the explode preserved,
    so AQE coalesces it tightly."""
    d = _toks_pinned(spark, sf_dir)
    ex = d.select("doc_id", F.explode("toks").alias("term"))
    vocab = ex.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    total = ex.agg(F.count(F.lit(1)).alias("n_total"))
    lp_micros = F.floor(
        F.log(F.col("tc") / F.col("n_total")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("bigint")
    scored = ex.join(F.broadcast(vocab), "term").crossJoin(F.broadcast(total))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(lp_micros).alias("lp_sum_micros"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("lp_sum_micros")
                / F.col("n_tokens")
                / F.lit(1000000.0)
            ).alias("avg_logprob"),
        )
    )


def q_text_lm_heldout_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out LM quality scoring — the CCNet/KenLM filtering setup in
    miniature: train an add-one-smoothed unigram model on the EVEN doc_ids,
    score the ODD doc_ids against it. Unlike text_unigram_logprob (which
    scores the corpus under its own MLE model), held-out scoring measures
    out-of-distribution-ness: a document whose vocabulary the training
    half never saw scores poorly, which is exactly the filter signal.
    Emits per-doc n_tokens, OOV count, and the smoothed mean logprob
    (floor-micro'd per token, order-free sums — the ln-ulp device).

    Smoothing: p(t) = (c(t)+1)/(N+V) with V = train vocab size + 1 (the
    unseen bucket), so OOV tokens get exactly 1/(N+V) in both engines.

    Scale: train-half vocab shuffles by term (map-side combined) and then
    BROADCASTS; scoring is a left join of the exploded score half against
    it — corpus never shuffles except the final doc_id agg."""
    d = _toks_pinned(spark, sf_dir)
    train = d.where(F.col("doc_id") % 2 == 0)
    score = d.where(F.col("doc_id") % 2 == 1)
    tex = train.select(F.explode("toks").alias("term"))
    vocab = tex.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    consts = tex.agg(
        F.count(F.lit(1)).alias("n_train"),
        F.countDistinct("term").alias("v_train"),
    )
    sex = score.select("doc_id", F.explode("toks").alias("term"))
    joined = sex.join(F.broadcast(vocab), "term", "left").crossJoin(
        F.broadcast(consts)
    )
    denom = (F.col("n_train") + F.col("v_train") + 1).cast("double")
    p = (F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double") / denom
    lp_micros = F.floor(F.log(p) * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("tc").isNull().cast("bigint")).alias("n_oov"),
            F.sum(lp_micros).alias("lp_sum_micros"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (
                F.col("lp_sum_micros") / F.col("n_tokens") / F.lit(1e6)
            ).alias("avg_logprob"),
        )
    )


def q_text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled lang × predicted lang counts
    with each cell's share of its labeled row — the QA report that tells
    you WHICH languages the classifier confuses before you trust its
    routing (per-lang accuracy is the diagonal). Composes the langid rule
    cascade with the contingency shape; one scan, one (lang, pred) agg."""
    from clusterindices_spark.functions.aggregates import round6_stable
    from pyspark.sql import Window as W

    pred = q_text_langid(spark, sf_dir)
    counts = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = W.partitionBy("lang")
    return counts.select(
        "lang",
        "pred_lang",
        "n",
        round6_stable(
            F.col("n") / F.sum("n").over(row_tot)
        ).alias("row_frac"),
    )


def q_text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals per document (the Gopher/MassiveText
    rule family: heavily repetitious documents are low-quality training
    data): duplicate-token fraction (1 − distinct/total), most-frequent-token
    share, and duplicate word-2-gram fraction.

    Determinism: each ratio is ONE division of two integers, identical in
    both engines; 6dp via round6_stable (floor form) because n-token
    denominators that are high powers of two land ratios exactly on
    .xxxxxx5 half-boundaries where ROUND conventions differ.

    Scale: the fraction columns are pure scan-side HOF work (zero shuffle);
    the top-token share is one explode + (doc_id, tok) count with map-side
    combine — shuffle keyed by the same doc_id the final agg reuses."""
    from clusterindices_spark.functions.aggregates import round6_stable

    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    n = F.size("toks")
    n2 = F.greatest(n - 1, F.lit(0))
    z = F.arrays_zip(
        F.slice("toks", 1, n2).alias("w1"), F.slice("toks", 2, n2).alias("w2")
    )
    grams = F.transform(z, lambda s: F.concat_ws(" ", s["w1"], s["w2"]))
    base = d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("nd"),
        n2.alias("n_2g"),
        F.size(F.array_distinct(grams)).alias("nd2"),
    )
    ex = d.select("doc_id", F.explode("toks").alias("tok"))
    top = (
        ex.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    frac = lambda num, den: F.when(  # noqa: E731
        den > 0, round6_stable(num.cast("double") / den)
    ).otherwise(F.lit(0.0))
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        frac(F.col("n_tokens") - F.col("nd"), F.col("n_tokens")).alias(
            "dup_token_frac"
        ),
        frac(F.coalesce(F.col("top_c"), F.lit(0)), F.col("n_tokens")).alias(
            "top_token_share"
        ),
        frac(F.col("n_2g") - F.col("nd2"), F.col("n_2g")).alias(
            "dup_2gram_frac"
        ),
    )


# PII scrub: redact emails / phone numbers / IPv4 addresses before training.
# The synthetic corpus carries no real PII, so each doc PLANTS deterministic
# PII derived from doc_id (emails on ~2/3 of docs, phones on 1/2, an IP on
# every doc) and then scrubs it — the oracle replays the same plant+scrub, so
# a regex that over- or under-matches breaks counts AND the redacted text
# hash. Patterns stay inside the syntax Java regex (Spark) and RE2 (DuckDB)
# interpret identically: character classes + bounded quantifiers, no
# lookaround, no backrefs. Scan-side expression work only — zero shuffles.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\+[0-9]{1,2}-555-[0-9]{4}"
PII_IP = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and redact planted PII. Replacement order matters and is pinned
    (email → phone → IP): the IP pattern is a sub-language of neither other
    pattern on the planted grammar, but ordering removes any ambiguity if a
    future pattern overlaps."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    email = F.concat(
        F.lit(" user"), s(did), F.lit("@mail"), s(did % 7), F.lit(".example.com")
    )
    phone = F.concat(
        F.lit(" +"), s(did % 89 + 1), F.lit("-555-"),
        F.lpad(s(did % 10000), 4, "0"),
    )
    ip = F.concat(
        F.lit(" "), s(did % 200 + 10), F.lit("."), s((did * 7) % 256),
        F.lit("."), s((did * 13) % 256), F.lit("."), s(did % 254 + 1),
    )
    planted = F.concat(
        F.col("text"),
        F.when(did % 3 < 2, email).otherwise(F.lit("")),
        F.when(did % 2 == 0, phone).otherwise(F.lit("")),
        ip,
    )
    red = F.regexp_replace(planted, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    red = F.regexp_replace(red, PII_IP, "<IP>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(planted, F.lit(PII_EMAIL), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(planted, F.lit(PII_PHONE), 0)).alias(
            "n_phones"
        ),
        F.size(F.regexp_extract_all(planted, F.lit(PII_IP), 0)).alias("n_ips"),
        red.alias("redacted"),
    )


def q_text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of each source's unigram distribution
    from the full-corpus distribution — the data-mixture drift diagnostic
    (which sources are lexically out-of-distribution; what a new crawl
    shifts). JSD = ½Σ p·log2(p/m) + ½Σ q·log2(q/m), m = (p+q)/2, summed
    over the GLOBAL vocabulary (q > 0 everywhere; absent source terms
    contribute the q-side only), bounded in [0,1] with log2.

    Determinism: each term's contribution is floored to BIGINT nanos
    before the per-source sum (the ln-micros device at 1e9 — term
    contributions are sub-1 magnitudes, and integer sums are order-free).
    Scale: grid = vocab × sources (bounded by |V|·S, sources broadcast);
    the per-(source,term) counts join the grid on term — one shuffle by
    term, then a |sources|-row agg."""
    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    ex = d.select("source", F.explode("toks").alias("term"))
    st = ex.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c_st"))
    src = ex.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    vocab = ex.groupBy("term").agg(F.count(F.lit(1)).alias("c_t"))
    total = ex.agg(F.count(F.lit(1)).alias("n_all"))
    grid = (
        vocab.crossJoin(F.broadcast(src))
        .join(st, ["source", "term"], "left")
        .crossJoin(F.broadcast(total))
    )
    p = F.coalesce(F.col("c_st"), F.lit(0)) / F.col("n_s")
    q = F.col("c_t") / F.col("n_all")
    m = (p + q) / F.lit(2.0)
    term_p = F.when(
        p > 0, p * F.log(2.0, p / m) * F.lit(0.5)
    ).otherwise(F.lit(0.0))
    term_q = q * F.log(2.0, q / m) * F.lit(0.5)
    nanos = F.floor((term_p + term_q) * F.lit(1e9) + F.lit(0.5)).cast(
        "bigint"
    )
    return (
        grid.groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_vocab_terms"),
            (F.sum(nanos) / F.lit(1e9)).alias("jsd_bits"),
        )
        .select("source", "n_tokens", "n_vocab_terms", "jsd_bits")
    )


def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the rank–frequency curve: OLS slope/intercept/R²
    of ln(freq) on ln(rank) — natural corpora sit near slope −1, and a
    flat or broken slope flags synthetic/spammy vocabularies (the
    corpus-health check next to vocab_stats). Determinism: ln values are
    floor-micro'd 6dp doubles (the ln device), then every regression sum
    runs in DECIMAL(38,12) — exact, order-free — so the OLS arithmetic
    starts from bit-identical sums in both engines. One term shuffle for
    counts, then the RANGE-PARTITIONED global rank (VERDICT r4 item 4 —
    the previous single-partition window serialized a 100 M-term
    vocabulary through one task; functions/ranking.py ranks with parallel
    local sorts + P-row broadcast offsets), a 1-row result."""
    from clusterindices_spark.functions.aggregates import round6_stable
    from clusterindices_spark.functions.ranking import ranked as _gl_ranked

    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    vocab = d.select(F.explode("toks").alias("term")).groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    pts = _gl_ranked(
        vocab,
        [F.col("cnt").desc(), F.col("term")],
        tag="zipf_fit",
        rank_col="rk",
    ).select(
        r6(F.log(F.col("rk").cast("double"))).alias("x"),
        r6(F.log(F.col("cnt").cast("double"))).alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    # nullif: a single-term vocabulary (1-doc corpus, fuzz seed 103030)
    # zeroes the OLS denominators — ANSI Spark raises where DuckDB's x/0
    # is NULL; the degenerate fit is NULL on both sides
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) / F.nullif(
        (n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0)
    )
    return s.select(
        F.col("n").alias("n_terms"),
        # slope is negative: floor-based round6_stable is non-negative-only,
        # so round the magnitude and restore the sign
        (-round6_stable(-slope)).alias("zipf_slope"),
        round6_stable(intercept).alias("intercept"),
        round6_stable(r2).alias("r2"),
    )


def q_text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus vocabulary profile: vocab size, total token
    occurrences, hapax count (corpus frequency 1 — the Zipf tail that
    dominates vocab growth), hapax share, and the modal token.

    Modal-token tie-break pinned as max(struct(cnt, token)) — the
    lexicographically LARGEST token among equal counts — because struct/
    row comparison orders identically in Spark and DuckDB (arg_max's
    tie-break is unspecified in both engines, so it is not used).

    Scale: explode → (lang, token) count with map-side combine (the
    vocab-sized shuffle), then a lang-group fold — the same two-shuffle
    topology as tfidf; no token list ever collects."""
    from clusterindices_spark.functions.aggregates import round6_stable

    d = load_table(spark, sf_dir, "documents")
    tok = fan_out(d).select(
        "lang", F.explode(tokens(F.col("text"))).alias("token")
    )
    per_tok = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    top = F.max(F.struct(F.col("cnt").alias("cnt"), F.col("token").alias("token")))
    return per_tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("cnt").cast("bigint").alias("total_tokens"),
        F.sum((F.col("cnt") == 1).cast("int")).cast("bigint").alias("n_hapax"),
        round6_stable(
            F.sum((F.col("cnt") == 1).cast("int"))
            / F.count(F.lit(1)).cast("double")
        ).alias("hapax_share"),
        top["token"].alias("top_token"),
        top["cnt"].alias("top_count"),
    )


BIGRAM_LAMBDA = 0.75  # interpolation weight on the bigram MLE term


def q_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order LM quality scoring: mean interpolated bigram
    log-probability per document, P(w2|w1) = λ·c(w1,w2)/c(w1) +
    (1−λ)·c(w2)/N — the standard Jelinek–Mercer backoff that keeps unseen
    continuations finite. Extends text_unigram_logprob's tier: a document
    of in-vocabulary words in IMPLAUSIBLE ORDER scores low here while the
    unigram filter passes it.

    Same determinism device as the unigram key: per-position logprobs are
    floor-scaled to BIGINT micros before the per-doc sum (ln differs
    between JVM and libm in the last ulp). Docs under 2 tokens carry no
    bigram and drop from the result (the unigram key's 0-token rule).

    Scale: bigram counts shuffle by (w1,w2) with map-side combine (bigram
    vocab ≪ corpus positions); unigram vocab broadcasts; the per-doc agg
    shuffles by the explode-preserved doc_id."""
    d = _toks_pinned(spark, sf_dir)
    n_b = F.greatest(F.size("toks") - 1, F.lit(0))
    z = F.arrays_zip(
        F.slice("toks", 1, n_b).alias("w1"), F.slice("toks", 2, n_b).alias("w2")
    )
    big = d.select("doc_id", F.explode(z).alias("s")).select(
        "doc_id", F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2")
    )
    ex = d.select(F.explode("toks").alias("term"))
    vocab = ex.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    total = ex.agg(F.count(F.lit(1)).alias("n_total"))
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc"))
    p = F.lit(BIGRAM_LAMBDA) * (
        F.col("bc").cast("double") / F.col("c1").cast("double")
    ) + F.lit(1.0 - BIGRAM_LAMBDA) * (
        F.col("c2").cast("double") / F.col("n_total").cast("double")
    )
    lp_micros = F.floor(F.log(p) * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
    scored = (
        big.join(bc, ["w1", "w2"])
        .join(
            F.broadcast(vocab.select(F.col("term").alias("w1"), F.col("tc").alias("c1"))),
            "w1",
        )
        .join(
            F.broadcast(vocab.select(F.col("term").alias("w2"), F.col("tc").alias("c2"))),
            "w2",
        )
        .crossJoin(F.broadcast(total))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(lp_micros).alias("lp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("lp") / F.col("n_bigrams") / F.lit(1000000.0)).alias(
                "avg_bigram_logprob"
            ),
        )
    )


def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap gibberish /
    encoding-noise detector in LLM data-curation stacks (natural prose
    sits near ~4 bits/char; base64 blobs, repeated filler, and binary
    spills fall far outside that band).

    Determinism: each character class's term (c/n)·log2(n/c) is floored to
    BIGINT micros BEFORE the per-doc sum (the unigram-logprob ln policy —
    integer sums are order-free, and a last-ulp log disagreement only
    flips a micro when the scaled term sits within ~1e-9 of an integer).

    Scale: split('') explodes ~chars rows, counted map-side-combined by
    (doc_id, ch) then re-aggregated by doc_id — both shuffles share the
    doc_id prefix so AQE keeps them thin; no joins, no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    )
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.withColumn(
        "n", F.sum("c").over(Window.partitionBy("doc_id"))
    )
    term_micros = F.floor(
        (F.col("c") / F.col("n"))
        * F.log(2.0, F.col("n") / F.col("c"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        per_doc.groupBy("doc_id")
        .agg(
            F.max("n").alias("n_chars"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
            (F.sum(term_micros) / F.lit(1000000.0)).alias("entropy_bits"),
        )
        .select("doc_id", "n_chars", "n_distinct_chars", "entropy_bits")
    )


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability profile per document — the classic Flesch-reading-ease
    shape re-based on deterministic proxies (the fixture corpus is
    unpunctuated word soup, so sentences are fixed 15-token pseudo-spans
    and syllables are vowel-group counts, min 1/word — the standard
    heuristic when no dictionary is available). Emits the raw components
    too (mean word length, ≥7-char long-word share, syllables/word) since
    curation rules usually threshold those directly (Gopher-style).

    Parity notes: vowel groups via two regexp_replace passes (collapse
    [aeiou]+ → 'V', strip non-V, count) — Spark replaces globally by
    default, DuckDB needs the explicit 'g' flag; the Flesch arithmetic is
    the same double-op sequence in both engines, then round6_stable
    (signed-safe, see functions/aggregates.py).

    Scale: tokenize scan-side, one doc_id-keyed shuffle for the per-token
    aggregation — no joins, no windows."""
    from clusterindices_spark.functions.aggregates import round6_stable

    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    ex = d.where(F.size("toks") > 0).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    vgroups = F.length(
        F.regexp_replace(
            F.regexp_replace(F.col("tok"), "[aeiou]+", "V"), "[^V]", ""
        )
    )
    per_tok = ex.select(
        "doc_id",
        F.length("tok").alias("tok_len"),
        F.greatest(F.lit(1), vgroups).alias("syl"),
        (F.length("tok") >= 7).cast("int").alias("is_long"),
    )
    agg = per_tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("tok_len").alias("sum_len"),
        F.sum("syl").alias("sum_syl"),
        F.sum("is_long").alias("n_long"),
    )
    n_sent = F.ceil(F.col("n_tokens") / F.lit(15.0)).cast("bigint")
    wps = F.col("n_tokens").cast("double") / n_sent.cast("double")
    spw = F.col("sum_syl").cast("double") / F.col("n_tokens").cast("double")
    flesch = (
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        round6_stable(
            F.col("sum_len").cast("double") / F.col("n_tokens")
        ).alias("avg_word_len"),
        round6_stable(
            F.col("n_long").cast("double") / F.col("n_tokens")
        ).alias("long_word_frac"),
        round6_stable(spw).alias("syllables_per_word"),
        round6_stable(flesch).alias("flesch_ease"),
    )


def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental n-gram novelty per document: the fraction of a doc's
    DISTINCT word bigrams that first appear in the corpus at this doc_id
    (first-seen = min doc_id over the whole corpus; ingestion-order proxy).
    This is the data-pruning signal that separates documents contributing
    new n-gram mass from documents restating earlier ones — near-dup tails
    and boilerplate score near 0 novelty even when no dedup tier pairs
    them. Docs under 2 tokens carry no bigram and drop (the bigram-LM
    convention).

    Determinism: novelty is a count ratio of exact integers; min(doc_id)
    is order-free; distinct-per-doc bigrams make the ratio insensitive to
    within-doc repetition. round6_stable for the one division.

    Scale: bigram explode → groupBy(bigram) min(doc_id) (map-side
    combined, bigram vocab ≪ corpus positions), then an equi join of the
    per-doc distinct bigrams back on the SAME bigram key (AQE reuses the
    shuffle layout), then a doc_id agg. No broadcast of data-scale frames;
    at 100 TB the first-seen table shards by bigram like any vocab."""
    from clusterindices_spark.functions.aggregates import round6_stable

    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    n_b = F.greatest(F.size("toks") - 1, F.lit(0))
    z = F.arrays_zip(
        F.slice("toks", 1, n_b).alias("w1"), F.slice("toks", 2, n_b).alias("w2")
    )
    bgs = F.array_distinct(
        F.transform(z, lambda s: F.concat_ws(" ", s["w1"], s["w2"]))
    )
    ex = d.select("doc_id", F.explode(bgs).alias("bg"))
    first = ex.groupBy("bg").agg(F.min("doc_id").alias("first_doc"))
    return (
        ex.join(first, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("bigint").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_distinct_bigrams",
            "n_novel",
            round6_stable(
                F.col("n_novel") / F.col("n_distinct_bigrams")
            ).alias("novel_frac"),
        )
    )


RAKE_TOP_K = 3


def q_text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) per document: candidate
    phrases are the maximal stopword-free token runs, each word scores
    degree/frequency over the doc's own phrases (degree = Σ length of the
    phrases it occurs in, with multiplicity), a phrase scores the sum of
    its words' scores, and the top-3 phrases per doc are emitted — the
    classic unsupervised keyword tagger, here as a pure DataFrame rule
    system.

    Determinism: word scores floor to BIGINT micros BEFORE the per-phrase
    sum (deg/freq is one integer division — exact same double in both
    engines); ranking orders by the INTEGER micro score desc then phrase
    asc, so ties cannot flip between engines. The r14 `grouped` pin is a
    persist of an intermediate — values unchanged (oracle hash re-gated).

    Scale: every shuffle is doc_id-keyed (running stopword counter
    window, phrase agg, word-stats agg, score join, top-k window) — the
    explode preserves the key, AQE keeps the chain thin, and no global
    structure exists at all (RAKE is per-doc by construction)."""
    from clusterindices_spark.functions.aggregates import round6_stable
    from clusterindices_spark.functions.pins import repin

    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    ex = d.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    ).withColumn("is_stop", F.col("tok").isin(*STOPWORDS))
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # r14 (guide §5): `grouped` is referenced by THREE consumers (phrases,
    # occ, the pscore join) — the executed plan ran the scan+tokenize+
    # posexplode chain twice and the running-stopword window FOUR times
    # (ReusedExchange covered only 2 of 4 references; plans/r14). Pinning
    # the flat (doc_id, pos, tok, grp) frame computes it once; unlike the
    # r13 token-pin A/B (REGRESSED: cached array<string> decode ≈
    # re-tokenize), the pinned columns here are scalar, so the cache read
    # is cheap. Isolated interleaved A/B in plans/r14 + OPTIMIZATION_r14.md.
    grouped = repin(
        "rake_grouped",
        ex.withColumn(
            "grp", F.sum(F.col("is_stop").cast("int")).over(w_run)
        )
        .where(~F.col("is_stop"))
        .select("doc_id", "pos", "tok", "grp"),
    )
    phrases = grouped.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("plen"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("phrase"),
    )
    occ = grouped.join(phrases.select("doc_id", "grp", "plen"), ["doc_id", "grp"])
    wstats = occ.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    wscore = wstats.select(
        "doc_id",
        "tok",
        F.floor(
            F.col("deg") / F.col("freq") * F.lit(1e6) + F.lit(0.5)
        ).cast("bigint").alias("ws_micros"),
    )
    pscore = (
        grouped.join(wscore, ["doc_id", "tok"])
        .groupBy("doc_id", "grp")
        .agg(F.sum("ws_micros").alias("score_micros"))
        .join(phrases.select("doc_id", "grp", "phrase"), ["doc_id", "grp"])
        .groupBy("doc_id", "phrase")
        .agg(F.max("score_micros").alias("score_micros"))
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("score_micros").desc(), F.col("phrase")
    )
    return (
        pscore.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= RAKE_TOP_K)
        .select(
            "doc_id",
            F.col("rn").alias("rank"),
            "phrase",
            round6_stable(F.col("score_micros") / F.lit(1e6)).alias("score"),
        )
    )


def q_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term burstiness (Fano factor / VMR of per-document counts,
    zeros included): content words CLUMP — absent from most docs, heavy
    in a few (VMR ≫ 1) — while function words spread evenly (VMR ≈ 1,
    the Poisson floor). The corpus-linguistics signal that separates
    topical vocabulary from glue even in a frequency-matched corpus,
    and a drift alarm when a term's burstiness jumps (template injection
    concentrates mass).

    Exactness: counts are integers, so VMR = (N·Σc² − S²)/(N·S) needs NO
    micro-quantization anywhere — the two divisions at the end are the
    only floats (identical sequence both engines, then round6).
    BOUND (int64, pinned r9): S² and N·Σc² stay exact while a term's
    corpus-wide count S < ~3.0e9 AND n_docs·Σc² < 2⁶³; past either,
    Spark ANSI-errors LOUDLY (tests/test_int64_bounds.py). A term with
    3e9 occurrences is ~30× the full English Wikipedia's "the".

    Scale: one explode → (doc, term) agg → term agg (both map-side
    combined), 1-row doc-count broadcast; zeros never materialize (they
    enter through the closed form)."""
    from clusterindices_spark.functions.aggregates import round6_stable

    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    per = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    j = stats.crossJoin(F.broadcast(n_docs))
    mean = F.col("s") / F.col("n_docs")
    vmr = (
        (F.col("n_docs") * F.col("s2") - F.col("s") * F.col("s"))
        / (F.col("n_docs") * F.col("s"))
    )
    return j.select(
        "term",
        "df",
        F.col("s").alias("total_count"),
        round6_stable(mean).alias("mean_per_doc"),
        round6_stable(vmr).alias("vmr"),
    )


CODE_KEYWORD_RE = (
    r"\b(def|class|return|import|function|var|let|const|void|public"
    r"|static|struct|elif|lambda)\b"
)
CODE_SYMBOL_RE = r"[{}()\[\];=<>]"
CODE_SCORE_THRESHOLD = 0.5


def q_text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose heuristic — the standard routing filter in front of a
    pre-training mixture (code gets its own dedup/quality lane): per doc,
    structural-symbol density, indented-line ratio, and code-keyword hits
    fold into a weighted score. Everything is counting + regex on the scan
    side (regexes kept to the Java↔RE2 common subset, the BPE_ISH
    convention); the agg is per-doc, so the operator is embarrassingly
    parallel at any scale.

    Ratios are floor-micro rounded BEFORE weighting (they are also output
    columns), and the score is rounded once more — the text_quality
    half-boundary discipline."""
    from clusterindices_spark.functions.aggregates import round6_stable

    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    symbol_count = n_chars - F.length(
        F.regexp_replace("text", CODE_SYMBOL_RE, "")
    )
    lines = F.split("text", "\n")
    n_lines = F.size(lines)
    indent_lines = F.size(
        F.filter(
            lines, lambda l: l.startswith("  ") | l.startswith("\t")
        )
    )
    kw_hits = F.regexp_count("text", F.lit(CODE_KEYWORD_RE))
    sym_density = round6_stable(
        symbol_count / F.nullif(n_chars.cast("double"), F.lit(0.0))
    )
    indent_ratio = round6_stable(
        indent_lines / F.nullif(n_lines.cast("double"), F.lit(0.0))
    )
    score = round6_stable(
        F.least(sym_density * 20.0, F.lit(1.0)) * 0.4
        + F.least(indent_ratio * 4.0, F.lit(1.0)) * 0.3
        + F.least(kw_hits / F.lit(5.0), F.lit(1.0)) * 0.3
    )
    return d.select(
        "doc_id",
        n_lines.cast("bigint").alias("n_lines"),
        indent_lines.cast("bigint").alias("indent_lines"),
        symbol_count.cast("bigint").alias("symbol_count"),
        kw_hits.cast("bigint").alias("keyword_hits"),
        sym_density.alias("symbol_density"),
        indent_ratio.alias("indent_ratio"),
        score.alias("code_score"),
        (score >= CODE_SCORE_THRESHOLD).alias("is_code"),
    )


BPE_ROUNDS = 5
BPE_REPLACE_PASSES = 4  # space-delimited replace skips alternating
# occurrences (the scan resumes past the consumed trailing space); each
# pass halves the skipped chain, 4 passes cover tokens far beyond the
# corpus's max token length


def _bpe_merge_once(seq_col, pair: str, merged: str):
    s = F.concat(F.lit(" "), seq_col, F.lit(" "))
    for _ in range(BPE_REPLACE_PASSES):
        s = F.replace(s, F.lit(f" {pair} "), F.lit(f" {merged} "))
    return F.trim(s)


def q_text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge training, the tokenizer-construction
    surface, in miniature: words split to space-joined characters + the
    ``</w>`` end marker, then {rounds} greedy merge rounds — each round
    counts adjacent symbol pairs WEIGHTED BY WORD FREQUENCY, merges the
    most frequent pair corpus-wide (ties → lexicographically smallest,
    via TakeOrdered), and rewrites every word. Output = the learned merge
    table (round, pair, merged, weighted count) — exactly what a BPE
    tokenizer persists.

    This is the canonical BPE trick that makes training scale: rounds run
    over the VOCABULARY (distinct words × frequency), never the corpus —
    one corpus-scale vocab agg up front (then eagerly localCheckpointed:
    the unrolled rounds would otherwise replay the corpus agg per round,
    the k-core lineage lesson), and every round is V-row work. The winning
    pair per round is a driver-side literal (TakeOrdered over the tiny
    pair table — the MMR statically-unrolled idiom), and the returned
    merge table is the sanctioned collect-then-local-relation shape.

    Merging uses plain (non-regex) replace on space-delimited symbol
    strings, applied {passes}×: a single left-to-right pass skips
    alternating occurrences because the match consumes the trailing
    delimiter — both engines share that scan rule, and the oracle replays
    the identical pass count, so the gate pins the exact semantics."""
    from pyspark.sql import Row

    d = _with_tokens(load_table(spark, sf_dir, "documents"))
    vocab = (
        d.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.concat(
                F.array_join(F.split("w", ""), " "), F.lit(" </w>")
            ).alias("seq"),
        )
        .localCheckpoint(eager=True)
    )
    words = vocab
    merges = []
    for r in range(1, BPE_ROUNDS + 1):
        toks = F.split("seq", " ")
        n_p = F.greatest(F.size(toks) - 1, F.lit(0))
        z = F.arrays_zip(
            F.slice(toks, 1, n_p).alias("a"), F.slice(toks, 2, n_p).alias("b")
        )
        pairs = (
            words.select("freq", F.explode(z).alias("s"))
            .select(
                "freq",
                F.concat_ws(" ", F.col("s.a"), F.col("s.b")).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.col("cnt").desc(), F.col("pair")).limit(1).first()
        if best is None:
            # empty corpus / no adjacent pairs left: the oracle's scalar
            # subqueries produce no merge rows — stop emitting rounds
            # instead of crashing on best["pair"] (r9 hostile empty gate)
            break
        merged = best["pair"].replace(" ", "")
        merges.append(
            Row(
                round=r,
                pair=best["pair"],
                merged=merged,
                cnt=int(best["cnt"]),
            )
        )
        words = words.select(
            "freq", _bpe_merge_once(F.col("seq"), best["pair"], merged).alias("seq")
        )
    return spark.createDataFrame(
        merges, "round INT, pair STRING, merged STRING, cnt BIGINT"
    )


def _bpe_oracle_sql() -> str:
    """Generated iterative-CTE oracle: each round re-derives the pair
    table from the previous words CTE, picks the same (cnt DESC, pair)
    winner via scalar subqueries, and rewrites words with the identical
    {passes}-pass delimited replace."""
    toks = SQL_TOKENS.format(col="text")
    blocks = [
        f"""
w0 AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS freq,
         array_to_string(string_split(w, ''), ' ') || ' </w>' AS seq
  FROM (SELECT unnest({toks}) AS w FROM documents)
  GROUP BY w
)"""
    ]
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"w{r - 1}"
        rep = "' ' || seq || ' '"
        for _ in range(BPE_REPLACE_PASSES):
            rep = (
                f"replace({rep}, ' ' || (SELECT pair FROM b{r}) || ' ', "
                f"' ' || (SELECT merged FROM b{r}) || ' ')"
            )
        # split ONCE into a toks column before the pair lambda: a
        # string_split(seq, ...) INSIDE list_transform re-splits the whole
        # seq per element — O(L²) per word, ~20 min on a wave-4 200KB
        # monster doc (50k-symbol word) where the hoisted form is O(L)
        # and runs in seconds (fuzz wave-4 seed 104006)
        blocks.append(
            f"""
p{r} AS MATERIALIZED (
  SELECT p AS pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT freq,
           unnest(list_transform(range(len(toks) - 1),
             i -> toks[i+1] || ' ' || toks[i+2])) AS p
    FROM (SELECT freq, string_split(seq, ' ') AS toks FROM {prev})
  ) GROUP BY p
),
b{r} AS MATERIALIZED (
  SELECT pair, replace(pair, ' ', '') AS merged, cnt
  FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT freq, trim({rep}) AS seq FROM {prev}
)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {r} AS round, pair, merged, cnt FROM b{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return "WITH " + ",".join(blocks) + "\n" + selects


PMI_MIN_COUNT = 5


def q_text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information for every adjacent
    bigram seen ≥{min} times — PMI = log₂((n_ab/N)/((n_a/U)(n_b/U)))
    separates true collocations (PMI ≫ 0) from chance co-occurrence
    (PMI ≈ 0), the classic phrase-discovery signal feeding tokenizer /
    vocabulary construction. The min-count floor is what keeps PMI from
    degenerating on hapax pairs (a 1-count bigram of two rare words gets
    an enormous PMI by construction).

    Determinism: counts are exact; the double ratio is computed in the
    IDENTICAL op order on both engines, and log₂ is floor-micro rounded
    (the ln-in-last-ulp convention of bigram_logprob).

    Scale: bigram counts shuffle by (w1,w2) with map-side combine; the
    unigram vocab and the two 1-row totals broadcast; everything after
    the count agg is bigram-vocab-scale, never corpus-scale."""
    from clusterindices_spark.functions.aggregates import round6_stable

    d = _toks_pinned(spark, sf_dir)
    n_b = F.greatest(F.size("toks") - 1, F.lit(0))
    z = F.arrays_zip(
        F.slice("toks", 1, n_b).alias("w1"),
        F.slice("toks", 2, n_b).alias("w2"),
    )
    big = d.select(F.explode(z).alias("s")).select(
        F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2")
    )
    ex = d.select(F.explode("toks").alias("term"))
    vocab = ex.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    bc = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= PMI_MIN_COUNT)
    )
    # driver-side scalar totals (the hour_of_week convention): a 1-row
    # global agg would plan as Exchange SinglePartition + a BNLJ attach
    nb = big.count()
    ut = ex.count()
    x = (F.col("n_ab").cast("double") / F.lit(float(nb))) / (
        (F.col("c1").cast("double") / F.lit(float(ut)))
        * (F.col("c2").cast("double") / F.lit(float(ut)))
    )
    return (
        bc.join(
            F.broadcast(
                vocab.select(F.col("term").alias("w1"), F.col("tc").alias("c1"))
            ),
            "w1",
        )
        .join(
            F.broadcast(
                vocab.select(F.col("term").alias("w2"), F.col("tc").alias("c2"))
            ),
            "w2",
        )
        .select(
            "w1",
            "w2",
            "n_ab",
            "c1",
            "c2",
            round6_stable(F.log2(x)).alias("pmi"),
        )
    )


QUERIES = {
    "text_bpe_train_merges": q_text_bpe_train_merges,
    "text_pmi_bigrams": q_text_pmi_bigrams,
    "text_code_detect": q_text_code_detect,
    "text_burstiness": q_text_burstiness,
    "text_rake_keywords": q_text_rake_keywords,
    "text_ngram_novelty": q_text_ngram_novelty,
    "text_lm_heldout_score": q_text_lm_heldout_score,
    "text_lang_confusion": q_text_lang_confusion,
    "text_readability": q_text_readability,
    "text_js_divergence": q_text_js_divergence,
    "text_zipf_fit": q_text_zipf_fit,
    "text_entropy": q_text_entropy,
    "text_vocab_stats": q_text_vocab_stats,
    "text_bigram_logprob": q_text_bigram_logprob,
    "text_tokens_stats": q_text_tokens_stats,
    "text_tfidf_topterms": q_text_tfidf_topterms,
    "text_langid": q_text_langid,
    "text_quality": q_text_quality,
    "text_fingerprint": q_text_fingerprint,
    "text_token_count": q_text_token_count,
    "text_scrub_blocklist": q_text_scrub_blocklist,
    "text_unigram_logprob": q_text_unigram_logprob,
    "text_repetition_stats": q_text_repetition_stats,
    "text_pii_scrub": q_text_pii_scrub,
}

_TOKS = SQL_TOKENS.format(col="text")
_R6_HAPAX = SQL_ROUND6.format(
    x="SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE)"
)
_R6_AVG = SQL_ROUND6.format(x="(sum_len / NULLIF(n_tokens, 0))")
_R6_STOP = SQL_ROUND6.format(x="(n_stop / NULLIF(n_tokens, 0))")


_R6_DUPTOK = SQL_ROUND6.format(x="(CAST(n_tokens - nd AS DOUBLE) / n_tokens)")
_R6_TOPSHARE = SQL_ROUND6.format(x="(CAST(COALESCE(top_c, 0) AS DOUBLE) / n_tokens)")
_R6_DUP2G = SQL_ROUND6.format(x="(CAST(n_2g - nd2 AS DOUBLE) / n_2g)")


def _sql_markers(lang: str) -> str:
    lst = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter(toks, t -> t IN ({lst})))"


_SQL_STOP = ", ".join(f"'{s}'" for s in STOPWORDS)

_R6_SYMD = SQL_ROUND6.format(
    x="symbol_count / NULLIF(CAST(n_chars AS DOUBLE), 0)"
)
_R6_INDR = SQL_ROUND6.format(
    x="indent_lines / NULLIF(CAST(n_lines AS DOUBLE), 0)"
)
_R6_CODE_SCORE = SQL_ROUND6.format(
    x=(
        "least(symbol_density * 20.0, 1.0) * 0.4"
        " + least(indent_ratio * 4.0, 1.0) * 0.3"
        " + least(kw_hits / 5.0, 1.0) * 0.3"
    )
)

ORACLES = {
    "text_bpe_train_merges": _bpe_oracle_sql(),
    "text_pmi_bigrams": f"""
WITH toks AS (SELECT doc_id, {SQL_TOKENS.format(col="text")} AS toks FROM documents),
big AS (
  SELECT unnest(list_transform(range(greatest(len(toks) - 1, 0)),
                               i -> toks[i+1])) AS w1,
         unnest(list_transform(range(greatest(len(toks) - 1, 0)),
                               i -> toks[i+2])) AS w2
  FROM toks
),
uni AS (SELECT unnest(toks) AS term FROM toks),
vocab AS (SELECT term, COUNT(*) AS tc FROM uni GROUP BY term),
bc AS (
  SELECT w1, w2, COUNT(*) AS n_ab FROM big GROUP BY w1, w2
  HAVING COUNT(*) >= {PMI_MIN_COUNT}
),
tot AS (
  SELECT (SELECT COUNT(*) FROM big) AS nb,
         (SELECT COUNT(*) FROM uni) AS ut
)
SELECT b.w1, b.w2,
       CAST(b.n_ab AS BIGINT) AS n_ab,
       CAST(v1.tc AS BIGINT) AS c1,
       CAST(v2.tc AS BIGINT) AS c2,
       {SQL_ROUND6.format(x="log2((CAST(b.n_ab AS DOUBLE) / t.nb) / ((CAST(v1.tc AS DOUBLE) / t.ut) * (CAST(v2.tc AS DOUBLE) / t.ut)))")}
         AS pmi
FROM bc b
JOIN vocab v1 ON b.w1 = v1.term
JOIN vocab v2 ON b.w2 = v2.term
CROSS JOIN tot t
""",
    "text_code_detect": f"""
WITH s AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '{CODE_SYMBOL_RE}', '', 'g'))
           AS symbol_count,
         string_split(text, chr(10)) AS lines,
         len(regexp_extract_all(text, '{CODE_KEYWORD_RE}')) AS kw_hits
  FROM documents
),
t AS (
  SELECT doc_id, n_chars, symbol_count, kw_hits,
         len(lines) AS n_lines,
         len(list_filter(lines, x -> x LIKE '  %' OR x LIKE chr(9) || '%'))
           AS indent_lines
  FROM s
),
r AS (
  SELECT doc_id, n_lines, indent_lines, symbol_count, kw_hits,
         {_R6_SYMD} AS symbol_density,
         {_R6_INDR} AS indent_ratio
  FROM t
)
SELECT doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(indent_lines AS BIGINT) AS indent_lines,
       CAST(symbol_count AS BIGINT) AS symbol_count,
       CAST(kw_hits AS BIGINT) AS keyword_hits,
       symbol_density,
       indent_ratio,
       {_R6_CODE_SCORE} AS code_score,
       {_R6_CODE_SCORE} >= {CODE_SCORE_THRESHOLD} AS is_code
FROM r
""",
    "text_readability": f"""
WITH tk AS (
  SELECT doc_id, unnest({SQL_TOKENS.format(col="text")}) AS tok
  FROM documents WHERE len({SQL_TOKENS.format(col="text")}) > 0
),
per AS (
  SELECT doc_id,
         length(tok) AS tok_len,
         greatest(1, length(regexp_replace(
             regexp_replace(tok, '[aeiou]+', 'V', 'g'), '[^V]', '', 'g')))
           AS syl,
         CASE WHEN length(tok) >= 7 THEN 1 ELSE 0 END AS is_long
  FROM tk
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(tok_len) AS BIGINT) AS sum_len,
         CAST(SUM(syl) AS BIGINT) AS sum_syl,
         CAST(SUM(is_long) AS BIGINT) AS n_long
  FROM per GROUP BY doc_id
),
m AS (
  SELECT doc_id, n_tokens, sum_len, sum_syl, n_long,
         CAST(n_tokens AS DOUBLE)
           / CAST(CAST(ceil(n_tokens / 15.0) AS BIGINT) AS DOUBLE) AS wps,
         CAST(sum_syl AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS spw
  FROM agg
)
SELECT doc_id, n_tokens,
       {SQL_ROUND6.format(x="CAST(sum_len AS DOUBLE) / n_tokens")} AS avg_word_len,
       {SQL_ROUND6.format(x="CAST(n_long AS DOUBLE) / n_tokens")} AS long_word_frac,
       {SQL_ROUND6.format(x="spw")} AS syllables_per_word,
       {SQL_ROUND6.format(x="206.835 - 1.015 * wps - 84.6 * spw")} AS flesch_ease
FROM m
""",
    "text_zipf_fit": f"""
WITH vocab AS (
  SELECT term, COUNT(*) AS cnt
  FROM (SELECT unnest({SQL_TOKENS.format(col="text")}) AS term FROM documents)
  GROUP BY term
),
pts AS (
  SELECT floor(ln(CAST(row_number() OVER (ORDER BY cnt DESC, term) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS x,
         floor(ln(CAST(cnt AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS y
  FROM vocab
),
s AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,12))) AS sx,
         SUM(CAST(y AS DECIMAL(38,12))) AS sy,
         SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
         SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,12))) AS syy
  FROM pts
),
d AS (
  SELECT n,
         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
         CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
  FROM s
)
SELECT n AS n_terms,
       -(floor(-((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)) * 1000000.0 + 0.5) / 1000000.0) AS zipf_slope,
       {SQL_ROUND6.format(x="(syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)) * sxd) / nd")} AS intercept,
       {SQL_ROUND6.format(x="(nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd) / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))")} AS r2
FROM d
""",
    "text_js_divergence": f"""
WITH ex AS (SELECT source, unnest({SQL_TOKENS.format(col="text")}) AS term FROM documents),
st AS (SELECT source, term, COUNT(*) AS c_st FROM ex GROUP BY source, term),
src AS (SELECT source, COUNT(*) AS n_s FROM ex GROUP BY source),
vocab AS (SELECT term, COUNT(*) AS c_t FROM ex GROUP BY term),
tot AS (SELECT COUNT(*) AS n_all FROM ex),
grid AS (
  SELECT s.source, v.term, v.c_t, s.n_s,
         COALESCE(st.c_st, 0) AS c_st, (SELECT n_all FROM tot) AS n_all
  FROM vocab v CROSS JOIN src s
  LEFT JOIN st ON st.source = s.source AND st.term = v.term
),
terms AS (
  SELECT source, n_s,
         CAST(floor((
           -- ln(x)/ln(2), NOT native log2(): the Spark side computes
           -- F.log(2.0, x) = ln(x)/ln(2), and a last-ulp disagreement with
           -- DuckDB's log2 could flip a floored nano term at an integer
           -- boundary (ADVICE r4) — same formulation on both sides bounds it
           CASE WHEN c_st > 0
                THEN (CAST(c_st AS DOUBLE) / n_s)
                     * (ln((CAST(c_st AS DOUBLE) / n_s)
                            / ((CAST(c_st AS DOUBLE) / n_s
                                + CAST(c_t AS DOUBLE) / n_all) / 2.0)) / ln(2.0)) * 0.5
                ELSE 0.0 END
           + (CAST(c_t AS DOUBLE) / n_all)
             * (ln((CAST(c_t AS DOUBLE) / n_all)
                    / ((CAST(c_st AS DOUBLE) / n_s
                        + CAST(c_t AS DOUBLE) / n_all) / 2.0)) / ln(2.0)) * 0.5
         ) * 1e9 + 0.5) AS BIGINT) AS nanos
  FROM grid
)
SELECT source,
       CAST(MAX(n_s) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_vocab_terms,
       CAST(SUM(nanos) AS DOUBLE) / 1e9 AS jsd_bits
FROM terms
GROUP BY source
""",
    "text_entropy": """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
counts AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
per AS (
  SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM counts
)
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_chars,
       COUNT(*) AS n_distinct_chars,
       -- ln/ln(2) matches Spark's F.log(2.0, x) formulation (ADVICE r4)
       CAST(SUM(CAST(floor((CAST(c AS DOUBLE) / n)
                           * (ln(CAST(n AS DOUBLE) / c) / ln(2.0))
                           * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS entropy_bits
FROM per
GROUP BY doc_id
""",
    "text_vocab_stats": f"""
WITH tok AS (SELECT lang, unnest({_TOKS}) AS token FROM documents),
per_tok AS (SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY lang, token)
SELECT lang,
       COUNT(*) AS vocab_size,
       CAST(SUM(cnt) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       {_R6_HAPAX} AS hapax_share,
       MAX(struct_pack(cnt := cnt, token := token)).token AS top_token,
       MAX(struct_pack(cnt := cnt, token := token)).cnt AS top_count
FROM per_tok
GROUP BY lang
""",
    "text_tokens_stats": f"""
WITH tok AS (SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents)
SELECT lang,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_tokens,
       COUNT(DISTINCT tok) AS n_distinct_tokens,
       ROUND(COUNT(*) / COUNT(DISTINCT doc_id), 6) AS avg_tokens_per_doc
FROM tok GROUP BY lang
""",
    "text_tfidf_topterms": f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
total AS (SELECT COUNT(*) AS n_total FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, ROUND(tf.tf * ln(total.n_total / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN total
)
SELECT doc_id, term, tfidf FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
) WHERE rn <= 3
""",
    "text_lm_heldout_score": f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tex AS (SELECT unnest(toks) AS term FROM d WHERE doc_id % 2 = 0),
vocab AS MATERIALIZED (SELECT term, COUNT(*) AS tc FROM tex GROUP BY term),
consts AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS v_train
  FROM tex
),
sex AS (SELECT doc_id, unnest(toks) AS term FROM d WHERE doc_id % 2 = 1),
j AS (
  SELECT s.doc_id, v.tc, c.n_train, c.v_train
  FROM sex s LEFT JOIN vocab v USING (term) CROSS JOIN consts c
),
lp AS (
  SELECT doc_id, tc,
         CAST(floor(ln((CAST(COALESCE(tc, 0) + 1 AS DOUBLE))
                       / CAST(n_train + v_train + 1 AS DOUBLE)) * 1e6 + 0.5)
              AS BIGINT) AS lp_micros
  FROM j
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN tc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(lp_micros) AS DOUBLE) / COUNT(*) / 1e6 AS avg_logprob
FROM lp GROUP BY doc_id
""",
    "text_lang_confusion": f"""
WITH tok AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
scored AS (
  SELECT doc_id, lang,
         {_sql_markers('de')} AS s_de,
         {_sql_markers('en')} AS s_en,
         {_sql_markers('es')} AS s_es,
         {_sql_markers('fr')} AS s_fr,
         {_sql_markers('zh')} AS s_zh
  FROM tok
),
pred AS (
  SELECT lang,
         CASE WHEN s_de >= GREATEST(s_en, s_es, s_fr, s_zh) THEN 'de'
              WHEN s_en >= GREATEST(s_es, s_fr, s_zh) THEN 'en'
              WHEN s_es >= GREATEST(s_fr, s_zh) THEN 'es'
              WHEN s_fr >= s_zh THEN 'fr'
              ELSE 'zh' END AS pred_lang
  FROM scored
),
counts AS (
  SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY lang, pred_lang
)
SELECT lang, pred_lang, n,
       {SQL_ROUND6.format(x="CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY lang)")} AS row_frac
FROM counts
""",
    "text_langid": f"""
WITH tok AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
scored AS (
  SELECT doc_id, lang,
         {_sql_markers('de')} AS s_de,
         {_sql_markers('en')} AS s_en,
         {_sql_markers('es')} AS s_es,
         {_sql_markers('fr')} AS s_fr,
         {_sql_markers('zh')} AS s_zh
  FROM tok
)
SELECT doc_id, lang,
       CASE WHEN s_de >= GREATEST(s_en, s_es, s_fr, s_zh) THEN 'de'
            WHEN s_en >= GREATEST(s_es, s_fr, s_zh) THEN 'en'
            WHEN s_es >= GREATEST(s_fr, s_zh) THEN 'es'
            WHEN s_fr >= s_zh THEN 'fr'
            ELSE 'zh' END AS pred_lang
FROM scored
""",
    "text_quality": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         list_sum(list_transform(toks, t -> len(t))) AS sum_len,
         len(list_filter(toks, t -> t IN ({_SQL_STOP}))) AS n_stop
  FROM tok
)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       {_R6_AVG} AS avg_token_len,
       {_R6_STOP} AS stopword_ratio,
       {SQL_ROUND6.format(x=f"LEAST(n_tokens / 100.0, 1.0) * 0.5 + {_R6_STOP} * 0.3 + LEAST({_R6_AVG} / 10.0, 1.0) * 0.2")} AS quality_score
FROM m
""",
    "text_fingerprint": f"""
SELECT doc_id, {SQL_FINGERPRINT.format(col='text')} AS fingerprint
FROM documents
""",
    "text_token_count": f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all({SQL_FOLD_LOWER.format(col='text')}, '{BPE_ISH_PATTERN.replace("'", "''")}')) AS INT)
         AS n_bpe_tokens,
       ROUND(length(text) / NULLIF(CAST(len(regexp_extract_all({SQL_FOLD_LOWER.format(col='text')}, '{BPE_ISH_PATTERN.replace("'", "''")}')) AS DOUBLE), 0.0), 6)
         AS chars_per_token
FROM documents
""",
    "text_scrub_blocklist": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(toks) - len(list_filter(toks,
            t -> t NOT IN ({", ".join(f"'{b}'" for b in BLOCKLIST)}))) AS INT)
         AS n_removed,
       -- DuckDB array_to_string([]) is NULL, Spark array_join is '':
       -- coalesce only when the doc tokenized (NULL text stays NULL)
       CASE WHEN toks IS NULL THEN NULL ELSE
         COALESCE(array_to_string(list_filter(toks,
            t -> t NOT IN ({", ".join(f"'{b}'" for b in BLOCKLIST)})), ' '), '')
       END AS clean_text
FROM t
""",
    "text_burstiness": f"""
WITH per AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
  GROUP BY doc_id, term
),
st AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM per GROUP BY term
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT term, df, s AS total_count,
       {SQL_ROUND6.format(x="s / CAST(n_docs AS DOUBLE)")} AS mean_per_doc,
       {SQL_ROUND6.format(x="(n_docs * s2 - s * s) / CAST(n_docs * s AS DOUBLE)")}
         AS vmr
FROM st CROSS JOIN nd
""",
    "text_rake_keywords": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
ex AS (
  SELECT doc_id,
         unnest(range(len(toks))) AS pos,
         unnest(toks) AS tok
  FROM t),
g AS (
  SELECT doc_id, pos, tok,
         (tok IN ({", ".join(f"'{s}'" for s in STOPWORDS)})) AS is_stop,
         CAST(SUM(CASE WHEN tok IN ({", ".join(f"'{s}'" for s in STOPWORDS)})
                  THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS grp
  FROM ex),
words AS MATERIALIZED (SELECT doc_id, grp, pos, tok FROM g WHERE NOT is_stop),
phrases AS MATERIALIZED (
  SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS plen,
         string_agg(tok, ' ' ORDER BY pos) AS phrase
  FROM words GROUP BY doc_id, grp),
wstats AS (
  SELECT w.doc_id, w.tok,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(p.plen) AS BIGINT) AS deg
  FROM words w JOIN phrases p USING (doc_id, grp)
  GROUP BY w.doc_id, w.tok),
wscore AS (
  SELECT doc_id, tok,
         CAST(floor(deg / freq * 1000000.0 + 0.5) AS BIGINT) AS ws
  FROM wstats),
ps AS (
  SELECT w.doc_id, w.grp, CAST(SUM(s.ws) AS BIGINT) AS sm
  FROM words w JOIN wscore s ON s.doc_id = w.doc_id AND s.tok = w.tok
  GROUP BY w.doc_id, w.grp),
pp AS (
  SELECT p.doc_id, p.phrase, MAX(ps.sm) AS sm
  FROM ps JOIN phrases p USING (doc_id, grp)
  GROUP BY p.doc_id, p.phrase),
r AS (
  SELECT doc_id, phrase, sm,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY sm DESC, phrase) AS rn
  FROM pp)
SELECT doc_id, CAST(rn AS INT) AS rank, phrase,
       {SQL_ROUND6.format(x="sm / 1000000.0")} AS score
FROM r WHERE rn <= {RAKE_TOP_K}
""",
    "text_ngram_novelty": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id,
             list_distinct(list_transform(range(greatest(len(toks) - 1, 0)),
                           i -> toks[i+1] || ' ' || toks[i+2])) AS bgs
      FROM t),
ex AS MATERIALIZED (SELECT doc_id, unnest(bgs) AS bg FROM g),
fs AS (SELECT bg, MIN(doc_id) AS first_doc FROM ex GROUP BY bg)
SELECT e.doc_id,
       COUNT(*) AS n_distinct_bigrams,
       CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       {SQL_ROUND6.format(x="CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)")}
         AS novel_frac
FROM ex e JOIN fs f USING (bg)
GROUP BY e.doc_id
""",
    "text_repetition_stats": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, toks,
       list_transform(range(greatest(len(toks) - 1, 0)),
                      i -> toks[i+1] || ' ' || toks[i+2]) AS g2
      FROM t),
base AS (SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS nd,
                len(g2) AS n_2g, len(list_distinct(g2)) AS nd2
         FROM g),
ex AS (SELECT doc_id, unnest(toks) AS tok FROM t),
top AS (SELECT doc_id, MAX(c) AS top_c FROM
        (SELECT doc_id, tok, COUNT(*) AS c FROM ex GROUP BY doc_id, tok)
        GROUP BY doc_id)
SELECT b.doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       CASE WHEN n_tokens > 0 THEN {_R6_DUPTOK} ELSE 0.0 END AS dup_token_frac,
       CASE WHEN n_tokens > 0 THEN {_R6_TOPSHARE} ELSE 0.0 END AS top_token_share,
       CASE WHEN n_2g > 0 THEN {_R6_DUP2G} ELSE 0.0 END AS dup_2gram_frac
FROM base b LEFT JOIN top USING (doc_id)
""",
    "text_bigram_logprob": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(greatest(len(toks) - 1, 0)), i -> toks[i+1])) AS w1,
         unnest(list_transform(range(greatest(len(toks) - 1, 0)), i -> toks[i+2])) AS w2
  FROM tok
),
ex AS (SELECT unnest(toks) AS term FROM tok),
vocab AS (SELECT term, COUNT(*) AS tc FROM ex GROUP BY term),
tot AS (SELECT COUNT(*) AS n_total FROM ex),
bc AS (SELECT w1, w2, COUNT(*) AS bc FROM big GROUP BY w1, w2)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CAST(floor(ln(
           {BIGRAM_LAMBDA} * (CAST(bc.bc AS DOUBLE) / CAST(v1.tc AS DOUBLE))
           + {1.0 - BIGRAM_LAMBDA} * (CAST(v2.tc AS DOUBLE) / CAST(t.n_total AS DOUBLE))
         ) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / COUNT(*) / 1000000.0 AS avg_bigram_logprob
FROM big b
JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
JOIN vocab v1 ON v1.term = b.w1
JOIN vocab v2 ON v2.term = b.w2
CROSS JOIN tot t
GROUP BY b.doc_id
""",
    "text_unigram_logprob": f"""
WITH ex AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
vocab AS (SELECT term, COUNT(*) AS tc FROM ex GROUP BY term),
tot AS (SELECT COUNT(*) AS n_total FROM ex)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CAST(floor(ln(CAST(tc AS DOUBLE) / n_total) * 1000000.0 + 0.5)
                     AS BIGINT)) AS DOUBLE)
         / COUNT(*) / 1000000.0 AS avg_logprob
FROM ex JOIN vocab USING (term) CROSS JOIN tot
GROUP BY doc_id
""",
}

# text_pii_scrub oracle: replays the deterministic plant, then the same
# pattern cascade. DuckDB's regexp_replace is first-match-only without the
# 'g' flag (Spark's replaces all) — 'g' keeps the semantics identical even
# though the plant emits at most one instance of each PII class per doc.
# Built with .format (not an f-string): the email pattern's {2,} quantifier
# would read as a replacement field.
ORACLES["text_pii_scrub"] = """
WITH p AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 < 2
                 THEN ' user' || CAST(doc_id AS VARCHAR) || '@mail'
                      || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' +' || CAST(doc_id % 89 + 1 AS VARCHAR) || '-555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || ' ' || CAST(doc_id % 200 + 10 AS VARCHAR)
         || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
         || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
         || '.' || CAST(doc_id % 254 + 1 AS VARCHAR) AS planted
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(planted, '{email}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(planted, '{phone}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(planted, '{ip}')) AS INT) AS n_ips,
       regexp_replace(
         regexp_replace(
           regexp_replace(planted, '{email}', '<EMAIL>', 'g'),
           '{phone}', '<PHONE>', 'g'),
         '{ip}', '<IP>', 'g') AS redacted
FROM p
""".format(email=PII_EMAIL, phone=PII_PHONE, ip=PII_IP)
