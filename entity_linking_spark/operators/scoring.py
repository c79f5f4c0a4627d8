"""Pairwise scoring: batched similarity over candidate pairs.

The reference scores each (mention, candidate) with a BERT pair
classifier and sorts by probability (entity_sort/service_main.py:145-172,
el_models.py:52-95). Our batch equivalent scores each candidate *page*
pair with a fused similarity — entity-evidence overlap + embedding
cosine + mention string similarity — computed entirely JVM-side or in
Arrow-batched pandas UDFs:

  ent_score   strongest shared entity evidence: for each doc, each
              candidate entity is supported with weight 1/n_ids (alias
              ambiguity prior, analog of the reference's entity_to_ids
              fan-out + rank); pair score = max over shared entities of
              min(support_a, support_b).
  cos_score   cosine of deterministic hash-embeddings of the full text
              (bi-encoder stand-in, SURVEY §2.10) — catches near-dup
              pages whose alias evidence was mangled.
  name_score  0.5*Jaro-Winkler + 0.5*normalized-Levenshtein over the
              docs' representative mention strings (the north rule's
              Jaro-Winkler + Levenshtein + cosine blend).

  fused = max(ent_score, cos when cos >= dup_threshold, ...) — see
  ``score_pairs``. A pair is an edge when fused >= threshold.

Shuffle inventory: two hash joins (pair -> per-doc features) on url —
both shuffle on the pair key, which is uniform by construction. Feature
tables are small projections (url, entity supports / embedding) so the
join input is pruned to exactly the needed columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StructField, StructType

from entity_linking_spark.functions.strings import jaro_winkler
from entity_linking_spark.functions.vectors import hash_embed_udf

_PAIR_SCORES_T = StructType(
    [
        StructField("cos", DoubleType()),
        StructField("name", DoubleType()),
    ]
)


@pandas_udf(_PAIR_SCORES_T)
def _pair_scores_udf(
    vec_a: pd.Series, vec_b: pd.Series, m_a: pd.Series, m_b: pd.Series
) -> pd.DataFrame:
    """Both similarity kernels in ONE Arrow pass: batched cosine as a
    single einsum over the stacked [batch, dim] matrices, Jaro-Winkler
    per short mention string. A struct-returning UDF is materialized
    once per row — unlike a Catalyst expression, it cannot be inlined
    and re-evaluated at every downstream reference."""
    n = len(vec_a)
    cos = np.zeros(n)
    mask = vec_a.notna() & vec_b.notna()
    if mask.any():
        ma = np.stack([np.asarray(v, dtype=np.float32) for v in vec_a[mask]])
        mb = np.stack([np.asarray(v, dtype=np.float32) for v in vec_b[mask]])
        na = np.maximum(np.linalg.norm(ma, axis=1), 1e-12)
        nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-12)
        cos[np.flatnonzero(mask.to_numpy())] = (
            np.einsum("ij,ij->i", ma, mb) / (na * nb)
        )
    # Jaro-Winkler half of the name blend (no JVM builtin exists); the
    # Levenshtein half runs JVM-side via F.levenshtein in score_pairs — a
    # pure-Python O(len^2) DP per pair measured 2-3x slower on the whole
    # scoring stage at 3.7M pairs. Representative mentions come from a
    # bounded alias vocabulary, so (m_a, m_b) pairs repeat heavily across
    # a batch — a batch-local memo turns most rows into a dict hit
    # instead of an O(len^2) scan.
    memo: dict[tuple[str, str], float] = {}

    def jw(x, y) -> float:
        if not (isinstance(x, str) and isinstance(y, str)):
            return 0.0
        key = (x, y)
        v = memo.get(key)
        if v is None:
            v = memo[key] = jaro_winkler(x, y)
        return v

    name = np.fromiter(
        (jw(x, y) for x, y in zip(m_a, m_b)), dtype=np.float64, count=n
    )
    return pd.DataFrame({"cos": cos, "name": name})

MATCH_THRESHOLD = 0.75
DUP_COSINE_THRESHOLD = 0.92
STRONG_SUPPORT = 0.9  # support 1/n_ids above this = unambiguous alias
# The threshold sits ABOVE the maximum blend score reachable from
# ambiguous-alias evidence alone (support 1/2 -> 0.55*0.5 + 0.25 + 0.20
# ceiling ≈ 0.72): two pages sharing only a collision alias (e.g. the
# reference's one-alias-many-ids entity_to_ids rows) must not link, no
# matter how similar their top mentions look — blocking already
# guarantees shared keys, so name similarity is not independent evidence.


def entity_support(candidates: DataFrame) -> DataFrame:
    """Per (url, subject_id): support = max over its aliases of 1/n_ids."""
    return candidates.groupBy("url", "subject_id").agg(
        F.max(1.0 / F.col("n_ids")).alias("support")
    )


def doc_features(
    docs_tokens: DataFrame,
    candidates: DataFrame,
    embeddings: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(supports, embeddings, top mention) per url — pruned feature tables.

    ``supports`` carries each doc's candidate-entity evidence as a MAP
    column (subject_id -> support). Candidate fan-out per doc is already
    bounded upstream (ambiguity cap at the alias join), so the map is a
    handful of entries — and shipping it once per pair side lets
    score_pairs compute shared-entity evidence with a JVM map
    intersection instead of an extra pair-table join + re-aggregation
    (two full exchanges of the pair table saved)."""
    supports = (
        entity_support(candidates)
        .groupBy("url")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("subject_id", "support"))
            ).alias("smap")
        )
    )
    # ``embeddings``: a precomputed (url, vec) encodings table — the
    # reference's write-once-reuse contract (eval_biencoder_.py:305-341);
    # the pipeline passes its checkpointed s1b_embeddings stage here so a
    # resumed run never re-encodes. Fallbacks: the fused-s1 vec column,
    # else encode from tokens in-plan.
    if embeddings is None:
        if "vec" in docs_tokens.columns:  # fused s1 already embedded each doc
            embeddings = docs_tokens.select("url", "vec")
        else:
            embeddings = docs_tokens.select(
                "url", hash_embed_udf(F.col("tokens")).alias("vec")
            )
    # representative mention: longest mention per doc (longest-alias-wins,
    # reference el_process.py:65 ordering)
    w = Window.partitionBy("url").orderBy(
        F.length("mention").desc(), F.col("mention")
    )
    top_mention = (
        candidates.select("url", "mention")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("url", "mention")
    )
    return supports, embeddings, top_mention


def score_pairs(
    pairs: DataFrame,
    supports: DataFrame,
    embeddings: DataFrame,
    top_mention: DataFrame,
    salt_factor: int | str | None = None,
    hot_threshold: int | None = None,
) -> DataFrame:
    """Fused pair scores: (url_a, url_b, ent_score, cos_score, name_score,
    score).

    ``salt_factor``: when a viral page appears in a disproportionate share
    of candidate pairs (hot url key), the pair->feature joins can run
    salted (operators/skew.py) so the hot key spreads over many reducers.
      None (default)  — plain joins; blocking's stop-key caps bound the
                        per-key fan-out and AQE skew-join splits residue.
      "auto"          — adaptive_salted_join: an exact key-frequency pass
                        finds keys hotter than ``hot_threshold`` and
                        salts ONLY those (uniform corpora pay ~nothing;
                        the frequency agg is map-side-combined so its
                        shuffle is #hot-ish keys, not #pairs).
      int N           — unconditional N-way salting of the whole join
                        (the round-2 escape hatch; kept for callers that
                        already know their skew profile).
    """
    # merge ALL per-url features once (small joins on the 1:1 url key), so
    # the big pair table is joined exactly twice (a-side, b-side). The
    # shared-entity evidence is a JVM map intersection over the two
    # support maps — the round-1 design joined the pair table to an
    # exploded supports table and re-aggregated, costing two more full
    # exchanges of the pair table.
    per_url = embeddings.join(top_mention.hint("shuffle_hash"), "url", "left").join(
        supports.hint("shuffle_hash"), "url", "left"
    )
    fa = per_url.select(
        F.col("url").alias("url_a"), F.col("vec").alias("vec_a"),
        F.col("mention").alias("m_a"), F.col("smap").alias("smap_a"),
    )
    fb = per_url.select(
        F.col("url").alias("url_b"), F.col("vec").alias("vec_b"),
        F.col("mention").alias("m_b"), F.col("smap").alias("smap_b"),
    )

    if salt_factor == "auto":
        from entity_linking_spark.operators import skew

        ht = hot_threshold if hot_threshold is not None else skew.DEFAULT_HOT_THRESHOLD
        # both hot sets come from the RAW pair table: the feature joins
        # are 1:1 per url, so url_b multiplicity after the first join
        # equals its multiplicity in pairs — computing the second hot
        # set there would re-evaluate the first join just to count keys
        feat = skew.adaptive_salted_join(
            skew.adaptive_salted_join(
                pairs, fa, "url_a", salt_cols=["url_b"], hot_threshold=ht, how="left"
            ),
            fb, "url_b", salt_cols=["url_a"], hot_threshold=ht, how="left",
            hot_keys_df=skew.hot_keys(pairs, "url_b", ht),
        )
    elif salt_factor:
        from entity_linking_spark.operators.skew import salted_join

        feat = salted_join(
            salted_join(
                pairs, fa, "url_a", salt_cols=["url_b"], n_salts=salt_factor,
                how="left",
            ),
            fb, "url_b", salt_cols=["url_a"], n_salts=salt_factor, how="left",
        )
    else:
        feat = (
            pairs.join(fa.hint("shuffle_hash"), "url_a", "left")
            .join(fb.hint("shuffle_hash"), "url_b", "left")
        )

    # ent_score = max over shared candidate entities of min(support_a,
    # support_b) — pure Column expressions (map_filter + try_element_at),
    # whole-stage codegen, no shuffle.
    shared = F.map_filter(
        F.col("smap_a"), lambda k, v: F.map_contains_key(F.col("smap_b"), k)
    )
    ent_expr = F.array_max(
        F.transform(
            F.map_entries(shared),
            lambda e: F.least(e["value"], F.try_element_at(F.col("smap_b"), e["key"])),
        )
    )
    ent_score = F.when(
        F.col("smap_a").isNotNull() & F.col("smap_b").isNotNull(),
        F.coalesce(ent_expr, F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    feat = feat.withColumn("ent_score", ent_score)
    # name similarity = mean of Jaro-Winkler and normalized Levenshtein —
    # the specified blend. JW rewards shared prefixes (title variants),
    # Levenshtein penalizes mid-string edits JW forgives; both are 1.0 on
    # equal mentions so exact alias matches keep full weight. Levenshtein
    # is Spark's JVM builtin (whole-stage codegen); only JW needs Python.
    lev_sim = F.when(
        F.col("m_a").isNotNull() & F.col("m_b").isNotNull(),
        1.0
        - F.levenshtein("m_a", "m_b")
        / F.greatest(F.length("m_a"), F.length("m_b"), F.lit(1)),
    ).otherwise(F.lit(0.0))
    feat = (
        feat
        .withColumn("_ps", _pair_scores_udf("vec_a", "vec_b", "m_a", "m_b"))
        .withColumn("cos_score", F.col("_ps.cos"))
        .withColumn("name_score", 0.5 * F.col("_ps.name") + 0.5 * lev_sim)
    )
    # fusion: unambiguous shared entity is decisive; near-identical text
    # (near-dup page) is decisive; otherwise a weighted blend.
    fused = F.greatest(
        F.when(F.col("ent_score") >= F.lit(STRONG_SUPPORT), F.col("ent_score")).otherwise(
            F.lit(0.0)
        ),
        F.when(
            F.col("cos_score") >= F.lit(DUP_COSINE_THRESHOLD), F.col("cos_score")
        ).otherwise(F.lit(0.0)),
        F.col("ent_score") * 0.55 + F.col("cos_score") * 0.25 + F.col("name_score") * 0.20,
    )
    return feat.select(
        "url_a", "url_b", "ent_score", "cos_score", "name_score", fused.alias("score")
    )


def match_edges(scored: DataFrame, threshold: float = MATCH_THRESHOLD) -> DataFrame:
    """Edges of the linkage graph (reference analog: candidates whose
    pair-classifier prob clears the decision, service_main.py:170-172)."""
    return scored.where(F.col("score") >= threshold).select("url_a", "url_b")
