"""Deterministic CJK-capable tokenizer — the engine's IK-analyzer stand-in.

The reference registers a Chinese word-segmentation UDTF (``IKUtil.java:19-34``
smart-mode IK analyzer; ``KwSplit.java:17-25``) and explodes it with
``LATERAL TABLE`` for the search-keyword DWS app. Spark-first that is a
(Pandas) UDF returning ``array<string>`` + ``explode``.

SURVEY §7.4 flags the hard requirement: segmentation must be *deterministic
across runs* for oracle hashing — so instead of a version-floating library the
dictionary is vendored in-module and the algorithm is plain forward maximum
matching (FMM):

- whitespace-delimited ASCII tokens pass through unchanged (so this is a
  strict superset of ``functions.tokenize`` on ASCII corpora);
- CJK runs are segmented greedily longest-match-first against the dictionary;
  unmatched CJK characters come out as single-character tokens (IK smart-mode
  behavior for out-of-vocabulary text).

A production deployment swaps DICT for a full lexicon file shipped with the
job (same algorithm, same determinism); jieba et al. would slot in only if
the dict+version were frozen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Minimal e-commerce-flavoured lexicon (the reference's domain): extend freely,
# determinism only requires the file to be versioned with the job.
DICT: frozenset[str] = frozenset(
    {
        "手机", "苹果", "苹果手机", "小米", "小米手机", "电视", "电视机",
        "洗衣机", "冰箱", "空调", "笔记本", "笔记本电脑", "电脑", "平板",
        "耳机", "蓝牙", "蓝牙耳机", "充电器", "数据线", "口红", "香水",
        "图书", "搜索", "关键词", "购物", "下单", "支付", "收藏", "评论",
    }
)
_MAX_WORD = max(len(w) for w in DICT)


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿" or "㐀" <= ch <= "䶿"


def fmm_segment(run: str) -> list[str]:
    """Forward maximum matching over one CJK run."""
    out: list[str] = []
    i = 0
    while i < len(run):
        for ln in range(min(_MAX_WORD, len(run) - i), 1, -1):
            if run[i : i + ln] in DICT:
                out.append(run[i : i + ln])
                i += ln
                break
        else:
            out.append(run[i])
            i += 1
    return out


def segment_text(text: str | None) -> list[str]:
    """Tokenize mixed ASCII/CJK text deterministically."""
    if not text:
        return []
    tokens: list[str] = []
    for piece in text.split():
        buf = ""
        cjk = ""
        for ch in piece:
            if _is_cjk(ch):
                if buf:
                    tokens.append(buf)
                    buf = ""
                cjk += ch
            else:
                if cjk:
                    tokens.extend(fmm_segment(cjk))
                    cjk = ""
                buf += ch
        if buf:
            tokens.append(buf)
        if cjk:
            tokens.extend(fmm_segment(cjk))
    return tokens


@F.pandas_udf(ArrayType(StringType()))
def tokenize_cjk(texts: pd.Series) -> pd.Series:  # pragma: no cover - thin wrapper
    return texts.map(segment_text)


def register_udf(spark) -> None:
    """Register for SQL use — the ``createTemporarySystemFunction`` analogue
    (DwsTrafficSourceKeywordPageViewWindow.java:36): after this,
    ``SELECT ... LATERAL VIEW explode(kw_split(keywords)) t AS keyword``
    is the reference's LATERAL TABLE(KwSplit(...)) verbatim."""
    spark.udf.register("kw_split", tokenize_cjk)
