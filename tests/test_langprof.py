"""Trigram-profile language ID (spiderspark/langprof.py).

Three contracts:
1. Kernel ↔ oracle parity: ``langid_series`` and ``langid_oracle_sql`` are
   the same decision procedure — bit-exact on adversarial inputs (quotes,
   newlines, astral codepoints, CJK mixes), not just on happy-path text.
2. Accuracy: on a labeled eval set DISJOINT from the training snippets the
   profile kernel must beat the retired marker-word heuristic (the VERDICT
   r06 item-5 "measurably better" bar) and clear an absolute floor.
3. Determinism: the pinned profile table rebuilds identically.
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from spiderspark.langprof import (
    LANGS,
    PROFILE_ROWS,
    _build_profile_rows,
    langid_oracle_sql,
    langid_series,
)

# labeled sentences NOT present in langprof._TRAINING (checked below)
EVAL = [
    ("en", "it was a bright cold day in april and the clocks were striking thirteen"),
    ("en", "students often study together before their final exams"),
    ("en", "please close the window before you leave the room tonight"),
    ("en", "my favorite meal is breakfast with eggs and fresh bread"),
    ("en", "the library opens early on weekdays but stays closed on sunday"),
    ("de", "sie hat gesagt dass wir morgen kommen werden"),
    ("de", "im sommer fahren viele familien ans meer oder in die berge"),
    ("de", "das neue gebäude wurde letztes jahr fertiggestellt"),
    ("de", "wir treffen uns jeden donnerstag im kleinen café an der ecke"),
    ("de", "ohne fleiß kein preis sagt man bei uns zu hause"),
    ("fr", "nous pensons que lire est important"),
    ("fr", "je voudrais une tasse de café et un croissant s'il vous plaît"),
    ("fr", "cette année nous irons à la montagne plutôt qu'à la mer"),
    ("fr", "il pleut souvent en automne mais le paysage reste magnifique"),
    ("fr", "mon frère travaille dans une petite librairie près du marché"),
    ("es", "hola buenos dias quiero comer algo ahora mismo por favor"),
    ("es", "mi hermana trabaja en una pequeña tienda cerca del mercado"),
    ("es", "llueve mucho en otoño pero el paisaje sigue siendo hermoso"),
    ("es", "me encanta caminar por la ciudad cuando cae la tarde"),
    ("es", "siempre desayunamos juntos antes de ir al trabajo"),
    ("zh", "今天的天气非常好我们一起去公园散步吧"),
    ("zh", "这本书的内容很有意思值得一读"),
    ("und", ""),
    ("und", "zzz qqq 12345 ----"),
]

# the retired round-1..6 heuristic, kept here only as the accuracy baseline
_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "es", "de"),
}


def _marker_baseline(texts: pd.Series) -> list[str]:
    out = []
    for t in texts.fillna(""):
        lo = t.lower()
        sc = {
            lang: sum(
                len(re.findall(rf"\b{m}\b", lo, flags=re.ASCII)) for m in ms
            )
            for lang, ms in _MARKERS.items()
        }
        best = max(sc.values())
        lang = "und" if best == 0 else next(l for l in _MARKERS if sc[l] == best)
        if len(re.findall(r"[一-鿿]", t)) > 0.2 * max(len(t), 1):
            lang = "zh"
        out.append(lang)
    return out


def _sql_predict(texts: pd.Series) -> list[str]:
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", pdf)
    out = (
        con.execute(langid_oracle_sql())
        .df()
        .set_index("doc_id")["lang_pred"]
    )
    return [out.loc[i] for i in range(len(texts))]


def test_eval_set_disjoint_from_training():
    from spiderspark.langprof import _TRAINING

    blob = " ".join(_TRAINING.values()).lower()
    for _, sent in EVAL:
        if sent:
            assert sent.lower() not in blob


def test_profile_beats_marker_baseline():
    texts = pd.Series([t for _, t in EVAL])
    gold = [l for l, _ in EVAL]
    prof = list(langid_series(texts))
    mark = _marker_baseline(texts)
    acc_prof = sum(a == b for a, b in zip(prof, gold))
    acc_mark = sum(a == b for a, b in zip(mark, gold))
    assert acc_prof > acc_mark, (acc_prof, acc_mark)
    assert acc_prof >= 22, list(zip(gold, prof))


def test_kernel_sql_parity_on_eval():
    texts = pd.Series([t for _, t in EVAL] + [None])
    assert list(langid_series(texts)) == _sql_predict(texts)


def test_kernel_sql_parity_adversarial():
    texts = pd.Series(
        [
            "it's a 'quoted' — string; with punctuation!!",
            "o'connor said don't and won't",
            "mixed 中文 and english words 在一起",
            "中" * 3,
            "ab",            # shorter than one trigram
            "\t\n  \x0b ",   # whitespace only
            "ÉÈÊ ÀÂÇ ÙÛÏ",   # case-fold path
            "naïve façade déjà vu",
            "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕥𝕖𝕩𝕥",  # astral plane (one codepoint each side)
            "das la the el le",  # cross-language gram soup
        ]
    )
    assert list(langid_series(texts)) == _sql_predict(texts)


@settings(max_examples=1, deadline=None, derandomize=True)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), max_codepoint=0x2FFFF
            ),
            max_size=60,
        ),
        min_size=40,
        max_size=40,
    )
)
def test_kernel_sql_parity_random(batch):
    texts = pd.Series(batch)
    assert list(langid_series(texts)) == _sql_predict(texts)


def test_profile_table_pinned_and_deterministic():
    assert _build_profile_rows() == PROFILE_ROWS
    assert all(
        isinstance(g, str) and l in LANGS and isinstance(w, int) and w != 0
        for g, l, w in PROFILE_ROWS
    )
    # emitted in (gram, LANGS-index) order, so the VALUES list (and thus
    # the oracle SQL text) is byte-stable across rebuilds
    assert PROFILE_ROWS == sorted(
        PROFILE_ROWS, key=lambda r: (r[0], LANGS.index(r[1]))
    )


# --- vectorized kernel ≡ reference kernel -----------------------------------

from spiderspark.langprof import _langid_series_ref  # noqa: E402


def test_vectorized_equals_reference_adversarial():
    texts = pd.Series(
        [t for _, t in EVAL]
        + [
            None, "", "ab", "中" * 3, "\x00\x01\x02", "𝔘𝔫𝔦 astral 𝕥𝕖𝕩𝕥",
            "mixed 中文 and english 在一起", " \t\n\x0b ", "a" * 5000,
        ]
    )
    assert list(langid_series(texts)) == list(_langid_series_ref(texts))


@settings(max_examples=3, deadline=None, derandomize=True)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), max_codepoint=0x2FFFF
                ),
                max_size=120,
            ),
        ),
        min_size=60,
        max_size=60,
    )
)
def test_vectorized_equals_reference_random(batch):
    texts = pd.Series(batch, dtype="object")
    assert list(langid_series(texts)) == list(_langid_series_ref(texts))
