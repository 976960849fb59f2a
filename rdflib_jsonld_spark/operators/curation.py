"""Dataset-curation operators for LLM training pipelines.

Three first-class curation stages a 100-TB corpus pipeline runs after
dedup (operators/dedup.py) and quality stats (operators/textstats.py):

- **benchmark decontamination** — flag training documents sharing word
  n-grams with an evaluation/benchmark set (the GPT-3/PaLM-style 13-gram
  overlap rule; Brown et al. 2020 §C, public methodology). The benchmark
  side is tiny (eval suites ≍ 10^5-10^6 grams) → broadcast semi-join
  against the corpus gram stream; past a bounded probe threshold the
  hint is dropped (same pattern as linking.canonicalize_quads).
- **repetition scoring** — within-document duplicate n-gram fractions
  (the Gopher repetition filters; Rae et al. 2021 §A1.1, public
  methodology): ``dup_frac`` = 1 − distinct/total n-grams and
  ``top_frac`` = most-frequent-gram share, per document.
- **deterministic hash splits** — train/val/test assignment from a
  seeded md5 of the document id: reproducible across engines, runs and
  partitionings (no sampling shuffle — a pure narrow projection), the
  property that matters when 10^12 rows must land in the SAME split on
  every rerun.
- **PII detection + scrubbing** — regex detection counts and
  typed-token masking for emails / phone numbers / IPv4 addresses /
  SSN-shaped ids (the C4/Dolma-style pre-training redaction pass;
  public methodology — Raffel et al. 2020 §2.2 filters, Soldaini et
  al. 2024 Dolma §4). Patterns are RE2-compatible (no lookarounds) so
  the DuckDB oracle runs the IDENTICAL expressions; detection is a
  narrow projection (zero shuffle), masking a sequential
  ``regexp_replace`` chain in a documented fixed order.

All stages are JVM-side column algebra (split/slice/explode/aggregate)
— no Python in the hot path; every operator is oracle-checked in DuckDB
via the driver contract (doc_decontam_flags, doc_repetition_scores,
doc_split_counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_ngrams


def _ngram_stream(docs: DataFrame, id_col: str, text_col: str,
                  n: int) -> DataFrame:
    """(id, gram) with duplicates kept — word_ngrams minus the distinct
    (repetition scoring needs multiplicities)."""
    words = docs.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("w"))
    return words.select(
        id_col,
        F.explode(F.transform(
            F.sequence(F.lit(0), F.greatest(F.size("w") - n, F.lit(0))),
            lambda i: F.array_join(F.slice("w", i + 1, n), " "),
        )).alias("gram"))


def benchmark_ngram_set(bench: DataFrame, n: int = 13,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Distinct word-n-gram set of the benchmark/eval corpus (one
    ``gram`` column). Materialize/persist this when flagging multiple
    corpora against the same benchmark."""
    return word_ngrams(bench, id_col, text_col, n).select("gram").distinct()


def flag_contaminated(docs: DataFrame, bench_grams: DataFrame,
                      n: int = 13, id_col: str = "doc_id",
                      text_col: str = "text",
                      broadcast_threshold: int = 5_000_000) -> DataFrame:
    """Per-document benchmark-overlap flags: (id, n_hits, contaminated)
    for every input document, where ``n_hits`` counts DISTINCT document
    n-grams that occur in the benchmark set.

    Plan shape: corpus grams (narrow explode, never shuffled as text) ⋈
    benchmark grams. The benchmark side broadcasts below
    ``broadcast_threshold`` grams (bounded limit-probe, no full count),
    so the corpus side never shuffles at all; past it the join degrades
    to a gram-keyed shuffle — still |grams|, never all-pairs."""
    grams = word_ngrams(docs, id_col, text_col, n)  # distinct per doc
    bg = bench_grams.select("gram").distinct()
    probe = bg.limit(broadcast_threshold + 1).count()
    if probe <= broadcast_threshold:
        bg = F.broadcast(bg)
    hits = (grams.join(bg, "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))
    return (docs.select(id_col).distinct()
            .join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"))
            .withColumn("contaminated", F.col("n_hits") > 0))


def repetition_scores(docs: DataFrame, n: int = 3,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition measures per document:

    - ``total_grams``  — word-n-gram occurrences (with duplicates);
    - ``dup_frac``     — 1 − distinct/total (0 for gram-free docs);
    - ``top_frac``     — share held by the most frequent n-gram.

    One narrow explode + two hash aggregations, all JVM; at scale the
    (id, gram) shuffle key is unskewed because every group is bounded by
    its own document length."""
    per_gram = (_ngram_stream(docs, id_col, text_col, n)
                .groupBy(id_col, "gram")
                .agg(F.count(F.lit(1)).alias("c")))
    return (per_gram.groupBy(id_col)
            .agg(F.sum("c").alias("total"),
                 F.count(F.lit(1)).alias("n_distinct"),
                 F.max("c").alias("top"))
            .select(
                id_col,
                F.col("total").cast("long").alias("total_grams"),
                F.round(1 - F.col("n_distinct") / F.col("total"), 6)
                .alias("dup_frac"),
                F.round(F.col("top") / F.col("total"), 6)
                .alias("top_frac")))


def assign_splits(docs: DataFrame,
                  splits: list[tuple[str, float]] = (
                      ("train", 0.9), ("val", 0.05), ("test", 0.05)),
                  id_col: str = "doc_id", seed: str = "v1",
                  buckets: int = 1_000_000) -> DataFrame:
    """Append a deterministic ``split`` column: md5(id ‖ 0x1F ‖ seed)
    hashed into ``buckets``, thresholded by the cumulative split
    weights. Engine-independent (md5 is md5 everywhere — the DuckDB
    oracle reproduces the assignment bit-for-bit), partitioning-
    independent, and a pure narrow projection: re-running on a
    reshuffled 10^12-row corpus yields the identical assignment with
    zero shuffle. Changing ``seed`` re-rolls every assignment."""
    weights = [w for _, w in splits]
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {sum(weights)}")
    bucket = (
        F.conv(F.substring(
            F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                              F.lit(seed))), 1, 8), 16, 10)
        .cast("bigint") % buckets)
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.withColumn("split", expr)


# ---------------------------------------------------------------------------
# PII detection + scrubbing
# ---------------------------------------------------------------------------

#: Detection patterns, in SCRUB ORDER (email before ipv4 so dotted
#: digits inside a local part are claimed by the email rule first;
#: ssn before phone so a "+"-less digit-dash id is not half-eaten).
#: All RE2-compatible: character classes + \b only, no lookarounds —
#: the same literal pattern strings run in Spark (Java regex) and
#: DuckDB (RE2) with identical match semantics.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{7,15}\b",
}


def pii_counts(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               patterns: dict[str, str] | None = None) -> DataFrame:
    """Per-document PII detection counts: one ``n_<class>`` column per
    pattern, each counted INDEPENDENTLY on the raw text (a span matched
    by two classes counts in both — detection is a reporting surface,
    scrub order is what resolves overlaps). Pure narrow projection:
    no shuffle, no Python — ``regexp_count`` is JVM codegen."""
    pats = patterns if patterns is not None else PII_PATTERNS
    return docs.select(
        id_col,
        *[F.regexp_count(F.col(text_col), F.lit(p)).cast("long")
          .alias(f"n_{name}") for name, p in pats.items()])


def scrub_pii(docs: DataFrame, text_col: str = "text",
              out_col: str | None = None,
              patterns: dict[str, str] | None = None,
              token_fmt: str = "<{}>") -> DataFrame:
    """Mask every PII match with a typed token (``<EMAIL>``, ``<SSN>``,
    ``<IPV4>``, ``<PHONE>`` by default), applying the patterns in dict
    order — the order is part of the contract (see PII_PATTERNS).
    Idempotent: tokens contain no digits or ``@``, so a second pass
    matches nothing. Narrow projection, zero shuffle at any scale."""
    pats = patterns if patterns is not None else PII_PATTERNS
    col = F.col(text_col)
    for name, p in pats.items():
        col = F.regexp_replace(col, p, token_fmt.format(name.upper()))
    return docs.withColumn(out_col or text_col, col)


# ---------------------------------------------------------------------------
# weighted source mixing
# ---------------------------------------------------------------------------

def _split_bucket(id_col: str, seed: str, buckets: int):
    """The shared deterministic bucket: md5(id ‖ 0x1F ‖ seed) → [0, buckets).
    Same construction as assign_splits, so mixing and splitting draw from
    INDEPENDENT hash streams only when their seeds differ — callers pass
    distinct seeds (documented; identical seeds would correlate the two
    Bernoulli streams)."""
    return (F.conv(F.substring(
        F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                          F.lit(seed))), 1, 8), 16, 10)
        .cast("bigint") % buckets)


def sample_mixture(docs: DataFrame, rates: dict[str, float],
                   source_col: str = "source", id_col: str = "doc_id",
                   default_rate: float = 0.0, seed: str = "mix-v1",
                   buckets: int = 1_000_000) -> DataFrame:
    """Deterministic per-source subsampling: keep a document iff its
    seeded md5 bucket falls under ``rates[source] · buckets``
    (sources absent from ``rates`` use ``default_rate``).

    This is the mixture-weights stage of a pre-training pipeline (the
    multinomial source-weighting of Lample & Conneau 2019 §3.1 /
    GPT-3-style corpus weighting — public methodology) made
    REPRODUCIBLE: the kept set is a pure function of (id, seed, rates),
    independent of partitioning and execution order — a narrow
    zero-shuffle projection, identical on every rerun of a 10^12-row
    corpus. Rates must be in [0, 1]: epoch-style oversampling (>1×) is
    a dataloader concern, not a filter; the operator rejects it loudly.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1]")
    bucket = _split_bucket(id_col, seed, buckets)
    thresh = None
    for s, r in sorted(rates.items()):
        cond = F.col(source_col) == s
        lim = F.lit(int(round(r * buckets)))
        thresh = F.when(cond, lim) if thresh is None \
            else thresh.when(cond, lim)
    thresh = F.lit(int(round(default_rate * buckets))) if thresh is None \
        else thresh.otherwise(F.lit(int(round(default_rate * buckets))))
    return docs.where(bucket < thresh)


def temperature_rates(counts: dict[str, int], temperature: float = 2.0,
                      target_fraction: float = 0.5) -> dict[str, float]:
    """Driver-side helper: per-source keep-rates from corpus counts via
    temperature-scaled multinomial weights (q_s ∝ c_s^(1/T), Lample &
    Conneau 2019 §3.1), scaled so the expected kept total is
    ``target_fraction`` of the corpus, with per-source rates capped at 1
    and the excess redistributed over uncapped sources (water-filling,
    deterministic iteration order). Pure arithmetic over a dict of
    counts — the counts come from one tiny groupBy().count() collect."""
    if not counts:
        return {}
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    total = sum(counts.values())
    target = target_fraction * total
    weights = {s: c ** (1.0 / temperature) for s, c in counts.items()}
    rates: dict[str, float] = {}
    live = dict(weights)
    remaining = target
    # water-filling: sources whose proportional share exceeds their size
    # get rate 1; their surplus re-spreads over the rest
    while live:
        wsum = sum(live.values())
        capped = {s for s in live
                  if remaining * live[s] / wsum >= counts[s]}
        if not capped:
            for s in live:
                rates[s] = remaining * live[s] / wsum / counts[s]
            break
        for s in sorted(capped):
            rates[s] = 1.0
            remaining -= counts[s]
            del live[s]
        remaining = max(remaining, 0.0)
    return rates


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   shards: int = 1024, id_col: str = "doc_id",
                   text_col: str = "text",
                   seed: str = "pack-v1") -> DataFrame:
    """Concat-and-chunk packing manifest: which fixed-length training
    sequences each document lands in.

    The classic pre-training input pipeline concatenates documents and
    slices the token stream every ``seq_len`` tokens (GPT-style packing
    — Brown et al. 2020 §2.1, public methodology). A single global
    concatenation is a one-partition bottleneck at 10^12 docs, so the
    corpus is first sharded by a seeded md5 of the id (deterministic,
    partitioning-independent) and each shard packs independently — the
    parallel unit a real dataloader consumes (shard = worker file).

    Per document the manifest gives its shard, deterministic position,
    token offset, and first/last sequence index within the shard
    (``floor(offset / seq_len)`` / ``floor((offset + n_tokens - 1) /
    seq_len)``), plus whether it straddles a sequence boundary. ONE
    shuffle (by shard, for the per-shard ordered cumulative sum); token
    counts are the whitespace convention of textstats.with_token_counts.
    Empty documents carry zero tokens and never straddle.
    """
    if seq_len <= 0 or shards <= 0:
        raise ValueError("seq_len and shards must be positive")
    from pyspark.sql import Window
    c = F.col(text_col)
    ws = F.size(F.split(F.trim(c), r"\s+"))
    n_tok = F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(ws) \
        .cast("long")
    shard = _split_bucket(id_col, seed, shards).alias("shard")
    base = docs.select(F.col(id_col), shard, n_tok.alias("n_tokens"))
    w = Window.partitionBy("shard").orderBy(id_col)
    off = (F.coalesce(F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
    # materialize the cumsum ONCE, then derive the spans from the column
    # (inlining `off` three times leaves 3 identical window expressions
    # in the Window operator — same pass, triple the evaluation)
    out = base.withColumn("tok_offset", off).select(
        id_col, "shard", "n_tokens", "tok_offset",
        F.floor(F.col("tok_offset") / seq_len).cast("long")
        .alias("first_seq"),
        F.floor((F.col("tok_offset")
                 + F.greatest(F.col("n_tokens") - 1, F.lit(0)))
                / seq_len).cast("long").alias("last_seq"))
    return out.withColumn(
        "straddles",
        (F.col("n_tokens") > 0)
        & (F.col("first_seq") != F.col("last_seq")))


# ---------------------------------------------------------------------------
# chat-transcript rendering (training-document assembly)
# ---------------------------------------------------------------------------

def render_chat_documents(transcripts: DataFrame,
                          turn_fmt: str = "%s: %s",
                          sep: str = "\n\n",
                          conv_col: str = "conv_id",
                          turn_col: str = "turn_idx",
                          role_col: str = "role",
                          text_col: str = "text") -> DataFrame:
    """Assemble one training document per conversation: turns rendered
    as ``turn_fmt % (role, text)`` and joined by ``sep`` in stable
    ``turn_idx`` order → ``(conv_id, n_turns, doc_text)``.

    This is the transcripts→pre-training-text step of the pipeline (the
    per-row invariant the north rule names — "per-turn text equality
    under stable turn ordering" — IS this operator's correctness
    property). One hash aggregate keyed on the conversation id:
    ``sort_array(collect_list(struct(turn_idx, …)))`` gives the stable
    order WITHOUT a window (no second shuffle, no skewed
    partition-by-conversation sort at 10^12 turns); rendering is
    whole-stage-codegen string algebra.
    """
    packed = F.sort_array(F.collect_list(F.struct(
        F.col(turn_col).alias("i"),
        F.col(role_col).alias("r"),
        F.col(text_col).alias("t"))))
    return (transcripts.groupBy(conv_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_turns"),
                 F.array_join(
                     F.transform(packed,
                                 lambda s: F.format_string(
                                     turn_fmt, s["r"], s["t"])),
                     sep).alias("doc_text")))


# ---------------------------------------------------------------------------
# C4-style line/document heuristics
# ---------------------------------------------------------------------------

def c4_quality_flags(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     min_words_per_line: int = 5,
                     min_kept_lines: int = 3) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020 §2.2, public
    methodology) as one zero-shuffle projection of per-document flags:

    - ``n_lines`` / ``n_kept_lines`` — a line is KEPT when it ends in
      terminal punctuation (``.`` ``!`` ``?`` ``"``) and has at least
      ``min_words_per_line`` whitespace words;
    - ``has_lorem_ipsum`` / ``has_brace`` — the placeholder-text and
      source-code markers C4 drops documents for;
    - ``keep`` — ≥ ``min_kept_lines`` kept lines and neither marker.

    Returns flags rather than filtering so pipelines can audit the
    would-drop set (join it back, sample it) before committing — the
    same report-first posture as SHACL validation.
    """
    c = F.col(text_col)
    lines = F.split(c, "\n")
    kept = F.filter(
        lines,
        lambda ln: F.trim(ln).rlike('[.!?"]$')
        & (F.size(F.filter(F.split(F.trim(ln), r"\s+"),
                           lambda w: w != "")) >= min_words_per_line))
    lower = F.lower(c)
    out = docs.select(
        id_col,
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        lower.contains("lorem ipsum").alias("has_lorem_ipsum"),
        c.contains("{").alias("has_brace"))
    return out.withColumn(
        "keep",
        (F.col("n_kept_lines") >= min_kept_lines)
        & ~F.col("has_lorem_ipsum") & ~F.col("has_brace"))


# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------

#: the Gopher "must contain 2 of" stop words (Rae et al. 2021 §A1.1,
#: public methodology).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_symbol_ratio: float = 0.1,
                         max_bullet_frac: float = 0.9,
                         max_ellipsis_frac: float = 0.3,
                         min_alpha_frac: float = 0.8,
                         min_stop_hits: int = 2) -> DataFrame:
    """The Gopher document-quality rules (Rae et al. 2021 §A1.1, public
    methodology) as one zero-shuffle projection of per-document flags:

    - ``ok_words`` — whitespace word count in [min_words, max_words];
    - ``ok_mean_len`` — mean word length in [3, 10] characters;
    - ``ok_symbol`` — (count('#') + count('...')) / words ≤ 0.1;
    - ``ok_bullet`` — ≤ 90% of lines start with a bullet (``- * •``);
    - ``ok_ellipsis`` — ≤ 30% of lines end with ``...`` / ``…``;
    - ``ok_alpha`` — ≥ 80% of words contain an alphabetic character;
    - ``ok_stop`` — at least 2 distinct Gopher stop words occur as words;
    - ``keep`` — all of the above.

    Same report-first posture as :func:`c4_quality_flags`: flags, not a
    filter, so the would-drop set stays auditable. All arithmetic is
    count/count double division — bit-identical in the DuckDB contract
    oracle (doc_gopher_flags). Every expression is JVM whole-stage
    codegen; nothing shuffles.
    """
    c = F.col(text_col)
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    n_words_d = F.greatest(n_words, F.lit(1)).cast("double")
    total_wchars = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w).cast("long"))
    mean_wlen = total_wchars.cast("double") / n_words_d
    n_hash = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    n_ellipsis = (F.length(c)
                  - F.length(F.regexp_replace(c, r"\.\.\.", ""))) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words_d
    lines = F.split(c, "\n")
    n_lines_d = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike("^[-*•] "))) \
        .cast("double") / n_lines_d
    ellipsis_frac = F.size(F.filter(
        lines,
        lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"))) \
        .cast("double") / n_lines_d
    alpha_frac = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]"))).cast("double") / n_words_d
    def _has(sw: str):
        # NB: a default-arg lambda (lambda w, s=s: ...) reads as 2-ary to
        # PySpark's higher-order-function binding — close over sw instead.
        return F.exists(words, lambda w: w == F.lit(sw)).cast("int")

    stop_hits = None
    for s in GOPHER_STOPWORDS:
        hit = _has(s)
        stop_hits = hit if stop_hits is None else stop_hits + hit
    out = docs.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("ok_words"),
        ((mean_wlen >= min_mean_word_len)
         & (mean_wlen <= max_mean_word_len)).alias("ok_mean_len"),
        (symbol_ratio <= max_symbol_ratio).alias("ok_symbol"),
        (bullet_frac <= max_bullet_frac).alias("ok_bullet"),
        (ellipsis_frac <= max_ellipsis_frac).alias("ok_ellipsis"),
        (alpha_frac >= min_alpha_frac).alias("ok_alpha"),
        (stop_hits >= min_stop_hits).alias("ok_stop"))
    return out.withColumn(
        "keep",
        F.col("ok_words") & F.col("ok_mean_len") & F.col("ok_symbol")
        & F.col("ok_bullet") & F.col("ok_ellipsis") & F.col("ok_alpha")
        & F.col("ok_stop"))


# ---------------------------------------------------------------------------
# Per-source caps
# ---------------------------------------------------------------------------

def cap_per_source(docs: DataFrame, cap: int, id_col: str = "doc_id",
                   group_col: str = "source",
                   seed: str = "cap-v1") -> DataFrame:
    """RefinedWeb-style per-source/per-domain cap (Penedo et al. 2023,
    public methodology): keep at most ``cap`` documents per ``group_col``
    value, chosen by seeded-md5 order of the id (ties broken by id).

    The kept set is a pure function of (id, group, seed) — reproducible
    across runs, partitionings and engines, like assign_splits. One
    shuffle (the window partition on the group key).

    Scale posture: groups are domains — many and individually small, so
    the per-group window parallelizes across reducers; a pathologically
    hot group is bounded by AQE skew splitting on the exchange, and
    since only ranks ≤ cap survive, a pre-aggregation that drops groups
    already under the cap (count ≤ cap ⇒ keep all, no rank needed) can
    shortcut the window for the long tail — the window ranks only the
    over-cap groups. That refinement is left to the caller's pipeline;
    the operator keeps the single canonical window.
    """
    from pyspark.sql import Window
    order = F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                              F.lit(seed)))
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col))
    return (docs.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= cap).drop("_rk"))


# ---------------------------------------------------------------------------
# URL canonicalization / URL-level dedup / domain filtering
# ---------------------------------------------------------------------------

# RFC 3986-shaped split: scheme :// authority path ?query #fragment.
# RE2-compatible (no lookarounds) so the DuckDB oracle runs the
# IDENTICAL pattern — the pii_counts convention.
_URL_PARTS = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
# tracking params stripped during canonicalization (C4/RefinedWeb-style
# URL normalization; Penedo et al. 2023 §3.1, public methodology)
_TRACKER_PARAM = r"^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"


def canonical_url(url_col) -> "F.Column":
    """Canonical form of a URL column: lowercased scheme + host,
    ``www.`` prefix and default port (``:80`` http / ``:443`` https)
    stripped, trailing path slashes removed, tracking query params
    (``utm_*``/``fbclid``/``gclid``/``ref``) dropped (remaining params
    keep their order), fragment discarded. A value that doesn't parse
    as ``scheme://...`` falls back to ``lower(trim(url))`` — it still
    dedups exactly. Pure narrow projection (zero shuffle)."""
    u = F.trim(url_col)
    scheme = F.lower(F.regexp_extract(u, _URL_PARTS, 1))
    host = F.lower(F.regexp_extract(u, _URL_PARTS, 2))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "https", F.regexp_replace(host, r":443$", "")) \
        .when(scheme == "http", F.regexp_replace(host, r":80$", "")) \
        .otherwise(host)
    path = F.regexp_replace(F.regexp_extract(u, _URL_PARTS, 3),
                            r"/+$", "")
    q_parts = F.filter(
        F.split(F.regexp_extract(u, _URL_PARTS, 4), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKER_PARAM))
    query = F.when(F.size(q_parts) > 0,
                   F.concat(F.lit("?"), F.array_join(q_parts, "&"))) \
        .otherwise(F.lit(""))
    return F.when(scheme == "",
                  F.lower(u)) \
        .otherwise(F.concat(scheme, F.lit("://"), host, path, query))


def url_domain(url_col) -> "F.Column":
    """The canonical host of a URL column (port stripped entirely —
    the RefinedWeb blocklists are host-level)."""
    u = F.trim(url_col)
    host = F.lower(F.regexp_extract(u, _URL_PARTS, 2))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":[0-9]+$", "")


def url_dedup(docs: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Canonicalized-URL first-occurrence dedup (the C4/CCNet URL-level
    pass; Raffel et al. 2020 §2.2 / Wenzek et al. 2020, public
    methodology): keep exactly one document per canonical URL — the one
    with the smallest id. Adds ``canon_url`` to the survivors.

    Scale posture: the shuffle key is ``md5(canon_url)`` (16 bytes,
    practically collision-free at 10^12 URLs where a 64-bit key would
    collide thousands of times) — document text never shuffles; the
    winner is ``min(struct(id))`` under one map-side-combining hash agg
    and the survivor set comes back via a semi-join on the id (the
    corpus-dedup first-occurrence pattern, dedup.py)."""
    canon = docs.withColumn("canon_url", canonical_url(F.col(url_col)))
    winners = (canon
               .select(F.md5("canon_url").alias("_uk"), F.col(id_col))
               .groupBy("_uk")
               .agg(F.min(F.struct(id_col)).alias("_w"))
               .select(F.col(f"_w.{id_col}").alias(id_col)))
    return canon.join(winners, id_col, "left_semi")


def domain_filter(docs: DataFrame, blocklist: list[str],
                  url_col: str = "url", id_col: str = "doc_id",
                  cap: int | None = None,
                  seed: str = "cap-v1") -> DataFrame:
    """Domain-level curation (RefinedWeb §3.1, public methodology):
    drop documents whose canonical host matches the blocklist (exact
    host or any-subdomain suffix: ``b`` blocks ``b`` and ``*.b``), then
    optionally cap survivors per domain via ``cap_per_source`` (seeded,
    deterministic). Adds ``domain``.

    The blocklist here is a plan literal (fine to ~10^4 entries); a
    million-entry blocklist should instead be a broadcast anti-join on
    ``domain`` — same semantics, one line at the call site."""
    blocked = sorted({b.lower().lstrip(".") for b in blocklist})
    dom = docs.withColumn("domain", url_domain(F.col(url_col)))
    if blocked:
        lits = F.array(*[F.lit(b) for b in blocked])
        hit = F.exists(
            lits, lambda b: (F.col("domain") == b)
            | F.col("domain").endswith(F.concat(F.lit("."), b)))
        dom = dom.filter(~hit)
    if cap is not None:
        dom = cap_per_source(dom, cap, id_col=id_col,
                             group_col="domain", seed=seed)
    return dom
