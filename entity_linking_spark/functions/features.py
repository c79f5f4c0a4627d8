"""Per-mention feature building: F4 context quota split + F5 candidate rep.

Clean-room re-expression of the reference's two core feature functions
(reference: entity_candidate/biencoder/data_process_.py:44-70 for the
context-window quota split with borrowed budget, and :87-119 for the
candidate representation assembly; special tags from common/params.py:
16-18). These fed BERT tensors in the reference; here they emit token
lists/strings from Arrow-batched pandas UDFs so downstream scorers (or a
model server) consume columns, never per-row Python in the plan.

Semantics preserved exactly, including the quota arithmetic:

  left_quota  = (max_seq_length - len(mention_tokens)) // 2 - 1
  right_quota = max_seq_length - len(mention_tokens) - left_quota - 2
  borrow: an under-full side donates its slack to an over-full one.

The reference's Python slice quirk (``left[-q:]`` with ``q == 0`` keeps
the WHOLE left context) is reproduced deliberately — byte-parity over
prettiness; callers should keep max_seq_length large enough that quotas
stay positive.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from entity_linking_spark.functions.normalize import basic_tokenize

# Public BLINK special tags (reference common/params.py:16-18).
ENT_START_TAG = "[unused1]"
ENT_END_TAG = "[unused2]"
ENT_TITLE_TAG = "[unused3]"
CLS_TOKEN = "[CLS]"
SEP_TOKEN = "[SEP]"

DEFAULT_MAX_SEQ = 32


def split_context_quota(
    left_tokens: list[str],
    mention_len: int,
    right_tokens: list[str],
    max_seq_length: int,
) -> tuple[int, int]:
    """F4 quota arithmetic: returns (left_quota, right_quota) after the
    borrowed-budget adjustment (data_process_.py:57-67)."""
    left_quota = (max_seq_length - mention_len) // 2 - 1
    right_quota = max_seq_length - mention_len - left_quota - 2
    left_add, right_add = len(left_tokens), len(right_tokens)
    if left_add <= left_quota:
        if right_add > right_quota:
            right_quota += left_quota - left_add
    else:
        if right_add <= right_quota:
            left_quota += right_quota - right_add
    return left_quota, right_quota


def get_context_representation(
    context_left: str,
    mention: str,
    context_right: str,
    max_seq_length: int = DEFAULT_MAX_SEQ,
) -> list[str]:
    """F4: [CLS] left-tail [unused1] mention [unused2] right-head [SEP]."""
    mention_tokens = [ENT_START_TAG] + basic_tokenize(mention or "") + [ENT_END_TAG]
    left = basic_tokenize(context_left or "")
    right = basic_tokenize(context_right or "")
    lq, rq = split_context_quota(left, len(mention_tokens), right, max_seq_length)
    # NOTE: left[-lq:] with lq == 0 keeps ALL of left — reference behavior.
    return [CLS_TOKEN] + left[-lq:] + mention_tokens + right[:rq] + [SEP_TOKEN]


def get_candidate_representation(
    candidate_title: str | None,
    candidate_desc: str,
    max_seq_length: int = DEFAULT_MAX_SEQ,
) -> list[str]:
    """F5: [CLS] title [unused3] desc [SEP], truncated to max-2 tokens."""
    cand_tokens = basic_tokenize(str(candidate_desc))
    if candidate_title is not None:
        cand_tokens = basic_tokenize(str(candidate_title)) + [ENT_TITLE_TAG] + cand_tokens
    cand_tokens = cand_tokens[: max_seq_length - 2]
    return [CLS_TOKEN] + cand_tokens + [SEP_TOKEN]


def make_context_repr_udf(max_seq_length: int = DEFAULT_MAX_SEQ):
    """Arrow-batched UDF: (context_left, mention, context_right) -> tokens."""

    @pandas_udf(ArrayType(StringType()))
    def context_repr_udf(
        left: pd.Series, mention: pd.Series, right: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                get_context_representation(l, m, r, max_seq_length)
                for l, m, r in zip(left, mention, right)
            ]
        )

    return context_repr_udf


def make_candidate_repr_udf(max_seq_length: int = DEFAULT_MAX_SEQ):
    """Arrow-batched UDF: (title, desc) -> candidate tokens."""

    @pandas_udf(ArrayType(StringType()))
    def candidate_repr_udf(title: pd.Series, desc: pd.Series) -> pd.Series:
        return pd.Series(
            [
                get_candidate_representation(t, d or "", max_seq_length)
                for t, d in zip(title, desc)
            ]
        )

    return candidate_repr_udf
