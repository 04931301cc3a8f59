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
    "FROZEN_ROMANCE",
    "FROZEN_CYRILLIC",
    "HELDOUT_SENTENCES",
    "HELDOUT_SENTENCES_CYRILLIC",
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
    s = _normalize_py(text)
    return [s[i : i + n] for i in range(len(s) - n + 1)]


@dataclass(frozen=True)
class LangIdModel:
    """Frozen portable model: language codes in tie-break (ASC) order,
    per-language gram→logp profiles and OOV log-probabilities — plain
    dyadic floats, engine-independent."""

    langs: tuple[str, ...]
    profiles: Mapping[str, Mapping[str, float]]
    oov: Mapping[str, float]
    n: int = 2

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

    def classify_py(self, text: str) -> str:
        scores = self.score_py(text)
        return max(sorted(scores), key=lambda l: scores[l])

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
        langs=tuple(sorted(snippets)), profiles=profiles, oov=oov, n=n
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


def classify_language(
    df: DataFrame,
    model: LangIdModel = None,
    text_col: str = "text",
    out_col: str = "langid_pred",
    score_col: str | None = None,
) -> DataFrame:
    """Adds `out_col` = argmax-language (ties -> language code ASC)
    and optionally `score_col` = the winning score. One broadcast of
    the one-row model frame, one let-bound gram array per row, |langs|
    folds over it — map-only at any scale. A document with no letters
    scores every language all-OOV; gate on text.dominant_script first
    (the CCNet ordering: script route, then in-script langid)."""
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
#: pure counting + dyadic quantization over module constants)
FROZEN_ROMANCE = train_langid(_TRAIN_SNIPPETS)


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

FROZEN_CYRILLIC = train_langid(_TRAIN_SNIPPETS_CYRILLIC)
