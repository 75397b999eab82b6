"""Tokenizer-vocabulary training as a distributed operator: byte-pair
encoding (BPE) merge learning over the corpus word distribution — the
data-side half of training a tokenizer, which a 100 TB pretraining
pipeline runs BEFORE it can count a single token.

Each merge step is one aggregate + one broadcast + one column rewrite:
count adjacent symbol pairs weighted by word frequency, pick the most
frequent pair (ties: lexicographic), rewrite every word's symbol
sequence with the pair fused. Three steps are unrolled (the k-means /
PageRank pattern for fixed-iteration algorithms); production would loop
with a checkpoint per iteration.

Cross-engine determinism: symbol sequences are separator-joined strings
(chr(31) — the corpus alphabet is [a-z ]), so the merge rewrite is the
engines' built-in leftmost-non-overlapping ``replace`` — identical
semantics in Spark (Java String.replace) and DuckDB — and exactly BPE's
leftmost-first merge order. All outputs are integers.

No reference counterpart (SURVEY.md §1.4: the reference's only text
operation is whitespace/letter tokenization); north-star text-pipeline
addition alongside text_bpe_token_count (which APPLIES a fixed regex
tokenizer; this LEARNS one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

_BPE_BOUND = 300  # doc slice (bounded oracle work)
_BPE_STEPS = 3
_SEP = "\x1f"

# ---- oracle (unrolled CTE chain) -----------------------------------------


def _oracle() -> str:
    s = f"""
    WITH words AS (
      SELECT w, count(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < {_BPE_BOUND})
      WHERE w <> '' GROUP BY w),
    s0 AS (
      SELECT cnt, chr(31) || regexp_replace(w, '(.)', '\\1' || chr(31), 'g')
               AS seq
      FROM words)"""
    for k in range(1, _BPE_STEPS + 1):
        j = k - 1
        s += f""",
    p{k} AS (
      SELECT (pr).a AS a, (pr).b AS b, CAST(sum(cnt) AS BIGINT) AS pc
      FROM (
        SELECT cnt, unnest(list_transform(range(len(arr) - 1),
               i -> struct_pack(a := arr[i+1], b := arr[i+2]))) AS pr
        FROM (SELECT cnt, list_filter(string_split(seq, chr(31)),
                     x -> x <> '') AS arr FROM s{j})
        WHERE len(arr) >= 2)
      GROUP BY 1, 2),
    t{k} AS (SELECT a, b, pc FROM p{k} ORDER BY pc DESC, a, b LIMIT 1),
    s{k} AS (
      SELECT cnt, replace(seq, chr(31) || t.a || chr(31) || t.b || chr(31),
                          chr(31) || t.a || t.b || chr(31)) AS seq
      FROM s{j} CROSS JOIN t{k} t),
    m{k} AS (
      SELECT {k} AS step, t.a AS sym_a, t.b AS sym_b, t.pc AS pair_count,
             (SELECT CAST(sum(cnt * (len(string_split(seq, chr(31))) - 2))
                      AS BIGINT) FROM s{k}) AS corpus_tokens_after
      FROM t{k} t)"""
    union = " UNION ALL ".join(f"SELECT * FROM m{k}" for k in range(1, _BPE_STEPS + 1))
    return s + f"\n    {union}"


_ARR = f"filter(split(seq, '{_SEP}'), x -> x <> '')"
_PAIRS = (
    "transform(sequence(0, size(arr) - 2),"
    " i -> struct(arr[i] as a, arr[i+1] as b))"
)


def _initial_state(words: DataFrame) -> DataFrame:
    """(w, cnt, seq): separator-joined char symbols per vocabulary word.

    ``localCheckpoint`` (eager), not persist+count (r13 optimization,
    guide §3.3/§5): persist materializes the rows but leaves the full
    logical plan in place, so each unrolled merge step's plan embedded
    the whole history and the final 3-step query optimized a
    14,317-line tree (most of vocab_bpe_merges' wall time was Catalyst,
    not data).  Checkpointing truncates lineage to the vocabulary-sized
    materialized state — the per-iteration checkpoint production BPE
    training would do anyway."""
    return words.select(
        "w",
        "cnt",
        F.concat(
            F.lit(_SEP), F.regexp_replace("w", "(.)", "$1" + _SEP)
        ).alias("seq"),
    ).localCheckpoint()


def _apply_merge(state: DataFrame, top: DataFrame) -> DataFrame:
    """Fuse the (broadcast 1-row) top pair in every word's symbol string
    via leftmost-non-overlapping replace; lineage-truncated per step
    (see _initial_state)."""
    return (
        state.crossJoin(F.broadcast(top))
        .select(
            "w",
            "cnt",
            F.expr(
                f"replace(seq, concat('{_SEP}', a, '{_SEP}', b, '{_SEP}'),"
                f" concat('{_SEP}', a, b, '{_SEP}'))"
            ).alias("seq"),
        )
        .localCheckpoint()
    )


def _learn(spark: SparkSession, sf_dir: str):
    """Shared learning chain: returns (final state (w, cnt, seq),
    [(top_df, tokens_after_df), ...] per step)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("doc_id") < _BPE_BOUND
    )
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    state = _initial_state(words)
    steps = []
    for _ in range(_BPE_STEPS):
        pairs = (
            state.withColumn("arr", F.expr(_ARR))
            .filter(F.expr("size(arr) >= 2"))
            .select("cnt", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").cast("bigint").alias("pc"))
        )
        top = pairs.orderBy(F.desc("pc"), "a", "b").limit(1).localCheckpoint()
        merged = _apply_merge(state, top)
        tokens_after = merged.agg(
            F.sum(F.col("cnt") * (F.size(F.split("seq", _SEP)) - F.lit(2)))
            .cast("bigint")
            .alias("corpus_tokens_after")
        )
        steps.append((top, tokens_after))
        state = merged
    return state, steps


@query("vocab_bpe_merges", oracle=_oracle())
def vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 3 BPE merges from the corpus word distribution;
    emit (step, sym_a, sym_b, pair_count, corpus_tokens_after) — the
    merge table a tokenizer trainer would persist, plus the corpus
    token count after each fusion (the compression curve).

    Scale: the word-frequency table (one map-side-combinable groupBy)
    is the ONLY pass over raw text; every merge step then runs on the
    word distribution (vocabulary-sized, not corpus-sized — the classic
    BPE trick). Per step: one pair-count aggregate, a 1-row top-pair
    broadcast, and a JVM ``replace`` rewrite. State between steps is
    lineage-truncated via localCheckpoint per iteration (exactly what
    production would do)."""
    _state, steps = _learn(spark, sf_dir)
    merge_rows = []
    for k, (top, tokens_after) in enumerate(steps, start=1):
        merge_rows.append(
            top.crossJoin(F.broadcast(tokens_after)).select(
                F.lit(k).alias("step"),
                F.col("a").alias("sym_a"),
                F.col("b").alias("sym_b"),
                F.col("pc").alias("pair_count"),
                "corpus_tokens_after",
            )
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


# ---- apply the learned merges corpus-wide --------------------------------
_APPLY_N_OUT = 100  # per-doc report slice


def _apply_oracle() -> str:
    s = f"""
    WITH words AS (
      SELECT w, count(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < {_BPE_BOUND})
      WHERE w <> '' GROUP BY w),
    s0 AS (
      SELECT w, cnt,
             chr(31) || regexp_replace(w, '(.)', '\\1' || chr(31), 'g') AS seq
      FROM words)"""
    for k in range(1, _BPE_STEPS + 1):
        j = k - 1
        s += f""",
    p{k} AS (
      SELECT (pr).a AS a, (pr).b AS b, CAST(sum(cnt) AS BIGINT) AS pc
      FROM (
        SELECT cnt, unnest(list_transform(range(len(arr) - 1),
               i -> struct_pack(a := arr[i+1], b := arr[i+2]))) AS pr
        FROM (SELECT cnt, list_filter(string_split(seq, chr(31)),
                     x -> x <> '') AS arr FROM s{j})
        WHERE len(arr) >= 2)
      GROUP BY 1, 2),
    t{k} AS (SELECT a, b FROM p{k} ORDER BY pc DESC, a, b LIMIT 1),
    s{k} AS (
      SELECT w, cnt,
             replace(seq, chr(31) || t.a || chr(31) || t.b || chr(31),
                     chr(31) || t.a || t.b || chr(31)) AS seq
      FROM s{j} CROSS JOIN t{k} t)"""
    return s + f""",
    vocab AS (
      SELECT w, CAST(len(string_split(seq, chr(31))) - 2 AS BIGINT)
               AS n_after
      FROM s{_BPE_STEPS}),
    dw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < {_APPLY_N_OUT})
      WHERE w <> '')
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(dw.w)) AS BIGINT) AS tokens_before,
           CAST(sum(v.n_after) AS BIGINT) AS tokens_after,
           round(CAST(sum(v.n_after) AS BIGINT) * 1.0
                 / CAST(sum(length(dw.w)) AS BIGINT), 4) AS compression
    FROM dw JOIN vocab v ON v.w = dw.w
    GROUP BY doc_id
    """


@query("vocab_bpe_apply", oracle=_apply_oracle())
def vocab_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the 3 learned BPE merges corpus-wide and report per-doc
    token accounting (chars-as-tokens before, fused symbols after, and
    the compression ratio) — the learn→apply loop of a real tokenizer
    deployment in one engine pass.

    Scale: tokenization happens on the VOCABULARY (word → fused symbol
    count, computed once by the shared learning chain), then documents
    just join that broadcastable word table — no document ever re-runs
    the merge rewrite. The per-doc reduce collapses on the doc-clustered
    explode output. Works because BPE with end-of-word boundaries (this
    construction) is a pure word-level function."""
    state, _steps = _learn(spark, sf_dir)
    vocab = state.select(
        "w",
        (F.size(F.split("seq", _SEP)) - F.lit(2)).cast("bigint").alias(
            "n_after"
        ),
    )
    docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("doc_id") < _APPLY_N_OUT
    )
    dw = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    return (
        dw.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("w")).cast("bigint").alias("tokens_before"),
            F.sum("n_after").cast("bigint").alias("tokens_after"),
            F.round(
                F.sum("n_after").cast("bigint")
                * 1.0
                / F.sum(F.length("w")).cast("bigint"),
                4,
            ).alias("compression"),
        )
    )


def _roundtrip_oracle() -> str:
    # reuse the learn chain (s0..sN) from the apply oracle, then check
    # losslessness + census the symbol inventory
    learn = _apply_oracle().split(",\n    vocab AS")[0]
    return f"""{learn},
    rt AS (
      SELECT w, cnt, replace(seq, chr(31), '') AS decoded,
             list_filter(string_split(seq, chr(31)), x -> x <> '') AS syms
      FROM s{_BPE_STEPS})
    SELECT CAST(count(*) AS BIGINT) AS n_vocab_words,
           CAST(sum(CASE WHEN decoded = w THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lossless,
           CAST(count(*) - sum(CASE WHEN decoded = w THEN 1 ELSE 0 END)
                AS BIGINT) AS n_corrupted,
           (count(*) = sum(CASE WHEN decoded = w THEN 1 ELSE 0 END))
             AS all_lossless,
           (SELECT CAST(count(DISTINCT s) AS BIGINT)
            FROM (SELECT unnest(syms) AS s FROM rt)) AS n_symbols,
           (SELECT CAST(max(length(s)) AS BIGINT)
            FROM (SELECT unnest(syms) AS s FROM rt)) AS max_symbol_len
    FROM rt
    """


@query("vocab_bpe_roundtrip", oracle=_roundtrip_oracle())
def vocab_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer integrity gate: decode every vocabulary word's fused
    BPE sequence (concatenate symbols, drop separators) and verify it
    reproduces the original word EXACTLY — the losslessness property a
    merge-rewrite bug (separator collision, partial replace) would
    break silently while token counts still look plausible.  Also
    censuses the symbol inventory (distinct symbols, longest symbol)
    the learned merges induce.

    Scale: runs on the VOCABULARY (one row per distinct word), never
    the corpus — the same reduction the apply op uses; the decode is a
    per-row string expression."""
    state, _steps = _learn(spark, sf_dir)
    rt = state.select(
        "w",
        F.regexp_replace("seq", _SEP, "").alias("decoded"),
        F.filter(F.split("seq", _SEP), lambda x: x != "").alias("syms"),
    )
    ok = F.sum(F.when(F.col("decoded") == F.col("w"), 1).otherwise(0)).cast(
        "long"
    )
    stats = rt.agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab_words"),
        ok.alias("n_lossless"),
        (F.count(F.lit(1)) - ok).cast("long").alias("n_corrupted"),
        (F.count(F.lit(1)) == ok).alias("all_lossless"),
    )
    syms = (
        rt.select(F.explode("syms").alias("s"))
        .agg(
            F.countDistinct("s").alias("n_symbols"),
            F.max(F.length("s")).cast("long").alias("max_symbol_len"),
        )
    )
    return stats.crossJoin(F.broadcast(syms))
