"""Deterministic character-trigram language identification.

Cavnar–Trenkle-style n-gram profiling (the public textcat method:
character n-gram statistics of a small training corpus form a per-language
profile; a document is scored against each profile) re-expressed so the
whole decision procedure is *closed-form checkable* by the driver's DuckDB
oracle (VERDICT r06 item 5):

- **One pinned profile table.** ``PROFILE_ROWS`` — ``(gram, lang, weight)``
  triples — is built at import time as a pure function of the embedded
  training snippets below (self-composed sentences, no external data).
  The engine kernel consumes the rows as a dict; the oracle consumes the
  *same rows* inlined as a SQL ``VALUES`` list (``langid_sql_ctes``), so
  there is a single source of truth and no filesystem dependency in the
  driver's DuckDB process.
- **Integer weights, integer scores.** ``w = round(S·c_l/total_l) −
  round(S·c_all/total_all)`` with S = 10^6 — the per-language relative
  frequency *excess* of the gram, quantized. Document score per language is
  a sum of int64 terms, so Spark and DuckDB agree bit-exactly regardless of
  summation order (no float argmax flips near ties).
- **Same normalization both sides**: ``lower(coalesce(text,''))``; trigrams
  are every (overlapping) 3-codepoint substring — ``substr(s, i, 3)`` for
  i ∈ 1..len−2 in SQL, ``s[i:i+3]`` in the kernel.
- **Decision rule** (identical CASE / numpy): CJK-codepoint share > 20% →
  ``zh``; all five scores ≤ 0 → ``und``; else first-maximum in the fixed
  order en, de, fr, es, zh.

Scale: the engine path is a single Arrow-batched pandas kernel — zero
shuffle, no explode; at 100 TB it is a map-only stage. The relational
explode+join restatement exists only as the oracle.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd

LANGS: tuple[str, ...] = ("en", "de", "fr", "es", "zh")

_SCALE = 1_000_000
_TOP_K = 400  # grams per language kept in the profile (by count, then gram)

# Self-composed training snippets (deterministic, embedded — no external
# corpus). A few everyday sentences per language is enough for trigram
# statistics to separate these five languages.
_TRAINING: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog. a small team of "
        "engineers wrote this system with great care and it should work "
        "well for everyone who needs it. we think that reading books in "
        "the evening is one of the best things a person can do. there "
        "were many people waiting for the early train this morning. she "
        "said that the weather would probably be much better next week. "
        "nothing in the old house had changed since their last visit. "
        "could you please tell me how to get to the station from here. "
        "the children play in the garden while their parents prepare "
        "dinner. next year we are going to travel along the whole coast. "
        "i would like to book a table for two people this evening. it "
        "was a bright cold morning and the streets were still empty."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund. ein "
        "kleines team von ingenieuren hat dieses system mit großer "
        "sorgfalt geschrieben und es sollte für alle gut funktionieren. "
        "wir glauben, dass es eines der schönsten dinge ist, abends "
        "bücher zu lesen. heute morgen warteten viele menschen auf den "
        "frühen zug. sie sagte, dass das wetter nächste woche "
        "wahrscheinlich viel besser werden würde. nichts in dem alten "
        "haus hatte sich seit ihrem letzten besuch verändert. können "
        "sie mir bitte sagen, wie ich von hier zum bahnhof komme. die "
        "kinder spielen im garten, während ihre eltern das abendessen "
        "vorbereiten. nächstes jahr werden wir an der ganzen küste "
        "entlang reisen. ich möchte gerne einen tisch für zwei personen "
        "für heute abend reservieren. es war ein heller kalter morgen "
        "und die straßen waren noch leer."
    ),
    "fr": (
        "le renard brun et rapide saute par dessus le chien paresseux. "
        "une petite équipe d'ingénieurs a écrit ce système avec beaucoup "
        "de soin et il devrait bien fonctionner pour tout le monde. nous "
        "pensons que lire des livres le soir est l'une des meilleures "
        "choses qu'une personne puisse faire. il y avait beaucoup de "
        "gens qui attendaient le premier train ce matin. elle a dit que "
        "le temps serait probablement bien meilleur la semaine "
        "prochaine. rien dans la vieille maison n'avait changé depuis "
        "leur dernière visite. pouvez vous me dire comment aller à la "
        "gare depuis ici. les enfants jouent dans le jardin pendant que "
        "leurs parents préparent le dîner. l'année prochaine nous "
        "allons voyager le long de toute la côte. je voudrais réserver "
        "une table pour deux personnes ce soir. c'était un matin clair "
        "et froid et les rues étaient encore vides. nous pensons que "
        "cette idée est très intéressante et que tout le monde devrait "
        "pouvoir la comprendre sans effort."
    ),
    "es": (
        "el zorro marrón y rápido salta sobre el perro perezoso. un "
        "pequeño equipo de ingenieros escribió este sistema con mucho "
        "cuidado y debería funcionar bien para todos. creemos que leer "
        "libros por la noche es una de las mejores cosas que una persona "
        "puede hacer. había mucha gente esperando el primer tren esta "
        "mañana. ella dijo que el tiempo probablemente sería mucho mejor "
        "la próxima semana. nada en la vieja casa había cambiado desde "
        "su última visita. puede decirme por favor cómo llegar a la "
        "estación desde aquí. los niños juegan en el parque todas las "
        "tardes después de la escuela. el año que viene vamos a viajar "
        "por toda la costa. me gustaría reservar una mesa para dos "
        "personas esta noche. era una mañana clara y fría y las calles "
        "todavía estaban vacías."
    ),
    "zh": (
        "敏捷的棕色狐狸跳过了懒惰的狗。一个小型工程师团队精心编写了这个系统，"
        "它应该对每个人都有用。我们认为晚上读书是一个人能做的最好的事情之一。"
        "今天早上有很多人在等早班火车。她说下周天气可能会好得多。"
        "自从他们上次来访以来，老房子里什么都没有改变。"
    ),
}

_CJK_RE = re.compile(r"[一-鿿]")


def _trigram_counts(s: str) -> Counter:
    return Counter(s[i : i + 3] for i in range(len(s) - 2))


def _build_profile_rows() -> list[tuple[str, str, int]]:
    """(gram, lang, weight) rows — the pinned profile table.

    Selection: per language, the _TOP_K most frequent trigrams of its
    (lowercased) training snippet, ties broken by gram; the table covers
    the union of selections. A row is emitted for every (selected gram,
    language) pair the language actually contains, with the quantized
    relative-frequency-excess weight; zero weights are dropped.
    """
    counts = {l: _trigram_counts(_TRAINING[l].lower()) for l in LANGS}
    totals = {l: sum(c.values()) for l, c in counts.items()}
    all_counts: Counter = Counter()
    for c in counts.values():
        all_counts.update(c)
    total_all = sum(totals.values())

    selected: set[str] = set()
    for l in LANGS:
        top = sorted(counts[l].items(), key=lambda kv: (-kv[1], kv[0]))[:_TOP_K]
        selected.update(g for g, _ in top)

    rows: list[tuple[str, str, int]] = []
    for g in sorted(selected):
        base = round(_SCALE * all_counts[g] / total_all)
        for l in LANGS:
            c = counts[l].get(g, 0)
            if c == 0:
                continue
            w = round(_SCALE * c / totals[l]) - base
            if w != 0:
                rows.append((g, l, w))
    return rows


PROFILE_ROWS: list[tuple[str, str, int]] = _build_profile_rows()

# gram -> int64 weight vector in LANGS order (the engine-side view)
_LANG_IDX = {l: i for i, l in enumerate(LANGS)}
PROFILE: dict[str, np.ndarray] = {}
for _g, _l, _w in PROFILE_ROWS:
    PROFILE.setdefault(_g, np.zeros(len(LANGS), dtype=np.int64))[_LANG_IDX[_l]] += _w


def _langid_series_ref(text: pd.Series) -> pd.Series:
    """REFERENCE kernel: per-document trigram Counter against the PROFILE
    dict — the direct transcription of the decision rule. Kept as the
    property-test oracle for the vectorized kernel below (and it is what
    the DuckDB SQL restatement mirrors most literally)."""
    s = text.fillna("").astype(str)
    out = []
    for t in s:
        tl = t.lower()
        vec = np.zeros(len(LANGS), dtype=np.int64)
        for g, n in _trigram_counts(tl).items():
            w = PROFILE.get(g)
            if w is not None:
                vec += n * w
        n_cjk = len(_CJK_RE.findall(tl))
        if n_cjk > 0.2 * max(len(tl), 1):
            out.append("zh")
        elif vec.max() <= 0:
            out.append("und")
        else:
            out.append(LANGS[int(np.argmax(vec))])
    return pd.Series(out, index=s.index, dtype="object")


# vectorized-lookup view of PROFILE: a trigram of codepoints (each
# < 0x110000 < 2^21) packs injectively into one int64 key; the weight
# matrix is row-aligned with the sorted key array
_GRAM_KEYS: np.ndarray
_GRAM_W: np.ndarray


def _build_gram_key_table() -> tuple[np.ndarray, np.ndarray]:
    keys = np.array(
        [
            (ord(g[0]) << 42) | (ord(g[1]) << 21) | ord(g[2])
            for g in PROFILE
        ],
        dtype=np.int64,
    )
    w = np.stack(list(PROFILE.values())).astype(np.int64)
    order = np.argsort(keys)
    return keys[order], w[order]


_GRAM_KEYS, _GRAM_W = _build_gram_key_table()


def langid_series(text: pd.Series) -> pd.Series:
    """The production kernel: bit-identical to :func:`_langid_series_ref`
    (property-pinned) but vectorized over the WHOLE Arrow batch — one
    utf-32 decode, one trigram-key array, one searchsorted lookup, and
    per-language bincount accumulation; no per-character Python. Integer
    scoring end-to-end, so summation order still cannot flip a decision.
    """
    s = text.fillna("").astype(str)
    n_docs = len(s)
    if n_docs == 0:
        return pd.Series([], index=s.index, dtype="object")
    lowered = [t.lower() for t in s]
    lens = np.fromiter(
        (len(t) for t in lowered), dtype=np.int64, count=n_docs
    )
    scores = np.zeros((n_docs, len(LANGS)), dtype=np.int64)
    cjk = np.zeros(n_docs, dtype=np.int64)
    if lens.sum():
        cps = np.frombuffer(
            "".join(lowered).encode("utf-32-le", errors="surrogatepass"),
            dtype="<u4",
        ).astype(np.int64)
        ends = np.cumsum(lens)
        doc_of_char = np.repeat(np.arange(n_docs), lens)
        is_cjk = (cps >= 0x4E00) & (cps <= 0x9FFF)
        cjk = np.bincount(
            doc_of_char[is_cjk], minlength=n_docs
        ).astype(np.int64)
        if len(cps) >= 3:
            keys = (cps[:-2] << 42) | (cps[1:-1] << 21) | cps[2:]
            kdoc = doc_of_char[:-2]
            # a trigram starting at char p is in-document iff p+2 is
            # still before its document's end offset
            in_doc = (np.arange(len(keys)) + 2) < ends[kdoc]
            keys, kdoc = keys[in_doc], kdoc[in_doc]
            pos = np.minimum(
                np.searchsorted(_GRAM_KEYS, keys), len(_GRAM_KEYS) - 1
            )
            hit = _GRAM_KEYS[pos] == keys
            kdoc, rows = kdoc[hit], pos[hit]
            # per-language weighted bincount; float64 accumulation is
            # exact here (|score| ≤ n_grams · 10^6 ≪ 2^53 for any batch
            # under the Arrow 2 GB record limit)
            for j in range(len(LANGS)):
                scores[:, j] = np.bincount(
                    kdoc,
                    weights=_GRAM_W[rows, j].astype(np.float64),
                    minlength=n_docs,
                ).astype(np.int64)
    pred = np.array(LANGS, dtype=object)[np.argmax(scores, axis=1)]
    pred[scores.max(axis=1) <= 0] = "und"
    pred[cjk > 0.2 * np.maximum(lens, 1)] = "zh"
    return pd.Series(pred, index=s.index, dtype="object")


# ---------------------------------------------------------------------------
# DuckDB oracle restatement (one source of truth: PROFILE_ROWS)
# ---------------------------------------------------------------------------


def _sql_quote(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def langid_sql_ctes(table: str = "documents") -> str:
    """CTE block computing per-doc integer scores for ``table(doc_id, text)``.

    Exposes ``docs(doc_id, text, s)`` and ``scores(doc_id, en..zh, cjk)``;
    compose with :func:`langid_sql_case` for the decision.
    """
    values = ", ".join(
        f"({_sql_quote(g)}, {_sql_quote(l)}, {w})" for g, l, w in PROFILE_ROWS
    )
    per_lang = ", ".join(
        f"coalesce(sum(CASE WHEN p.lang = '{l}' THEN p.w ELSE 0 END), 0) AS {l}"
        for l in LANGS
    )
    return (
        f"profile AS (SELECT * FROM (VALUES {values}) AS t(gram, lang, w)), "
        f"docs AS (SELECT doc_id, text, lower(coalesce(text, '')) AS s FROM {table}), "
        "grams AS (SELECT d.doc_id, substr(d.s, CAST(u.i AS INTEGER), 3) AS gram "
        "FROM docs d, unnest(range(1, greatest(length(d.s) - 1, 1))) AS u(i)), "
        "gram_scores AS (SELECT g.doc_id, " + per_lang + " "
        "FROM grams g JOIN profile p USING (gram) GROUP BY g.doc_id), "
        "scores AS (SELECT d.doc_id, "
        + ", ".join(f"coalesce(gs.{l}, 0) AS {l}" for l in LANGS)
        + r", len(regexp_extract_all(d.s, '[一-鿿]')) AS cjk, length(d.s) AS slen "
        "FROM docs d LEFT JOIN gram_scores gs USING (doc_id))"
    )


def langid_sql_case() -> str:
    """The decision CASE over a ``scores`` row — byte-for-byte the kernel's
    rule: CJK share > 20% → zh; all ≤ 0 → und; else first max in en,de,fr,
    es,zh order."""
    g = ", ".join(LANGS)
    firstmax = " ".join(
        f"WHEN {l} >= greatest({', '.join(m for m in LANGS[i + 1:])}) THEN '{l}'"
        for i, l in enumerate(LANGS[:-1])
    )
    return (
        f"CASE WHEN cjk > 0.2 * greatest(slen, 1) THEN 'zh' "
        f"WHEN greatest({g}) <= 0 THEN 'und' "
        f"{firstmax} ELSE '{LANGS[-1]}' END"
    )


def langid_oracle_sql(table: str = "documents") -> str:
    return (
        f"WITH {langid_sql_ctes(table)} "
        f"SELECT doc_id, {langid_sql_case()} AS lang_pred FROM scores"
    )
