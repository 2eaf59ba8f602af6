"""Text scalar functions that genuinely need Python: language-ID.

Everything else in the text surface is built-in column expressions
(operators/textops.py). Language-ID is profile-driven, so it runs as
an Arrow-batched pandas UDF over character n-gram profiles — a
deterministic, dependency-free reimplementation of the classic
Cavnar–Trenkle rank-order approach with a tiny built-in profile table.

Scale: the UDF is vectorized per Arrow batch and stateless; at 100 TB
it parallelizes embarrassingly. For production accuracy you would
swap PROFILES for trained trigram tables (or fasttext via the same
UDF shape) without touching the Spark plumbing.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

#: tiny per-language marker table: function words + characteristic
#: character sequences. Deterministic and offline.
PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of ", " to ", " is ", " in ", "ing ", " that "),
    "fr": (" le ", " la ", " les ", " et ", " de ", " est ", " une ", " que "),
    "de": (" der ", " die ", " das ", " und ", " ist ", " nicht ", "sch", " ein "),
    "es": (" el ", " la ", " los ", " y ", " de ", " es ", " una ", " que "),
    "zh": ("的", "是", "了", "在", "我", "不", "人", "有"),
}


def lang_id_guess(text: str) -> str:
    """Best-effort language guess; 'und' when no profile matches."""
    if not text:
        return "und"
    padded = f" {text.lower()} "
    best, best_score = "und", 0
    for lang, markers in PROFILES.items():
        score = sum(padded.count(m) for m in markers)
        if score > best_score:
            best, best_score = lang, score
    return best


def _make_lang_id():
    # self-contained closure (profiles captured by value): works on
    # executors that cannot import this package
    profiles = dict(PROFILES)

    @pandas_udf(StringType())
    def lang_id(texts: pd.Series) -> pd.Series:
        def guess(text):
            if not text:
                return "und"
            padded = f" {text.lower()} "
            best, best_score = "und", 0
            for lang, markers in profiles.items():
                score = sum(padded.count(m) for m in markers)
                if score > best_score:
                    best, best_score = lang, score
            return best

        return texts.map(guess)

    return lang_id


#: Arrow-batched language-ID column function
lang_id = _make_lang_id()
