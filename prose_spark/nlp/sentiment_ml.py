"""Sentiment ML path — Maxent classifier, feature extractors, GIS trainer
(SURVEY.md §2.G G6-G9, G12 and §2.I I6).

Behavioral spec: tsawler/prose —

- rich feature extractor: sentiment_features.go:114-508 with the
  per-language word lists :658-1248 (ported verbatim as data);
- simple training features: model.go:243-476; the prediction-time twin in
  sentiment.go:300-540 recomputes the SAME features over WHITESPACE-split
  words rather than PTB tokens — a train/predict asymmetry we replicate
  (see ``predict_sentence_score``);
- Maxent predict with stable softmax: sentiment.go:885-1009;
- score combination: sentiment.go:798-868 (lexicon weight 0.4, ML 0.6;
  an empty side passes the other through unchanged);
- GIS trainer: model.go:479-766, including the float-stringify quirk:
  every float feature value is rendered with "%.6f" and the
  "(name)-(value)-(label)" STRING triple is the maxent key, so
  real-valued features act as binary indicators of exact value strings
  (model.go:743, sentiment.go:906).

Documented deviation: the reference's Trainer.TrainSentimentClassifier
(training.go:431-480) builds rich-feature encodings but calls the NER
``encode`` which leaves all weights zero — the returned model is
unfitted. Our ``train_sentiment_classifier`` runs the real GIS fit on
the same rich features instead.

Dominant-class tie-break: Go iterates its probability map in random
order with a strict ``>`` (sentiment.go:967), so exact ties are
nondeterministic there; we iterate classes in the fixed order of
sentiment.go:946 for reproducibility.
"""

from __future__ import annotations

import gzip
import json
import math

import numpy as np

CLASSES = ("strong_negative", "negative", "neutral", "positive",
           "strong_positive")

# -- word lists for the simple features (model.go:264-283, 407-410) ---------

STRONG_POS_WORDS = frozenset((
    "amazing", "excellent", "outstanding", "brilliant", "perfect",
    "fantastic", "awesome", "superb", "magnificent", "exceptional", "love",
    "adore", "incredible", "phenomenal", "extraordinary", "spectacular",
    "wonderful", "marvelous", "fabulous", "sensational", "stunning",
    "breathtaking", "flawless", "impeccable", "divine", "sublime",
    "exquisite", "astounding", "remarkable", "thrilled", "ecstatic",
    "overjoyed", "delighted", "best", "greatest", "finest", "ultimate",
    "supreme",
))
WEAK_POS_WORDS = frozenset((
    "good", "nice", "okay", "fine", "decent", "adequate", "satisfactory",
    "reasonable", "solid", "fair", "acceptable", "pleasant", "comfortable",
    "suitable", "workable", "functional",
))
STRONG_NEG_WORDS = frozenset((
    "terrible", "awful", "horrible", "disgusting", "atrocious", "appalling",
    "pathetic", "useless", "worthless", "hate", "despise", "abysmal",
    "dreadful", "ghastly", "hideous", "revolting", "repulsive", "vile",
    "despicable", "detestable", "loathe", "abhor", "worst", "nightmare",
    "disaster", "catastrophe", "garbage", "trash", "junk", "crap", "shit",
    "hell", "damn",
))
WEAK_NEG_WORDS = frozenset((
    "bad", "poor", "disappointing", "mediocre", "subpar", "inferior",
    "lacking", "flawed", "unsatisfactory", "inadequate", "unacceptable",
    "problematic", "deficient", "faulty",
))
INTENSIFIER_WORDS = frozenset((
    "very", "extremely", "incredibly", "absolutely", "totally",
    "completely", "utterly", "quite", "really", "truly", "highly",
    "deeply", "super", "so", "too", "way",
))
SUPERLATIVE_WORDS = frozenset((
    "most", "least", "best", "worst", "greatest", "smallest", "biggest",
    "highest", "lowest", "finest", "ultimate", "maximum", "minimum",
))


def extract_simple_features(words: list[str]) -> dict[str, float]:
    """Simple sentiment features over token TEXTS
    (model.go:243-476 == sentiment.go:319-540; the two call sites differ
    only in where `words` come from: PTB document tokens at training
    time, whitespace-split sentence text at prediction time)."""
    features: dict[str, float] = {}

    word_counts: dict[str, int] = {}
    for w in words:
        lw = w.lower()
        if len(lw) > 2:
            word_counts[lw] = word_counts.get(lw, 0) + 1
    for w, c in word_counts.items():
        features["word:" + w] = float(c)

    sp = wp = sn = wn = 0
    for w in words:
        lw = w.lower()
        if lw in STRONG_POS_WORDS:
            sp += 1
        if lw in WEAK_POS_WORDS:
            wp += 1
        if lw in STRONG_NEG_WORDS:
            sn += 1
        if lw in WEAK_NEG_WORDS:
            wn += 1

    features["strong_pos_count"] = float(sp)
    features["weak_pos_count"] = float(wp)
    features["strong_neg_count"] = float(sn)
    features["weak_neg_count"] = float(wn)
    features["pos_count"] = float(sp + wp)
    features["neg_count"] = float(sn + wn)

    total = float(sp + wp + sn + wn)
    if total > 0:
        features["strong_sentiment_ratio"] = (sp + sn) / total

    if sn > 0 and wn == 0 and sp == 0:
        features["pure_strong_negative"] = 1.0
    if sp > 0 and wp == 0 and sn == 0:
        features["pure_strong_positive"] = 1.0
    if wn > 0 and sn == 0 and sp == 0:
        features["pure_weak_negative"] = 1.0
    if wp > 0 and sp == 0 and sn == 0:
        features["pure_weak_positive"] = 1.0

    if sn > wn and sn > 0:
        features["strong_neg_dominant"] = 1.0
    if sp > wp and sp > 0:
        features["strong_pos_dominant"] = 1.0
    if wn > sn and wn > 0:
        features["weak_neg_dominant"] = 1.0
    if wp > sp and wp > 0:
        features["weak_pos_dominant"] = 1.0

    if sn > 1:
        features["multiple_strong_negative"] = float(sn)
    if sp > 1:
        features["multiple_strong_positive"] = float(sp)

    if sn + wn > 0:
        features["strong_neg_ratio"] = sn / float(sn + wn)
    if sp + wp > 0:
        features["strong_pos_ratio"] = sp / float(sp + wp)
    if sp == 0 and wp == 0 and sn == 0 and wn == 0:
        features["no_sentiment_words"] = 1.0

    features["length"] = float(len(words))

    exclam = quest = caps = 0
    for w in words:
        if "!" in w:
            exclam += 1
        if "?" in w:
            quest += 1
        if len(w) > 2 and w == w.upper() and w.lower() != w:
            caps += 1
    features["exclamations"] = float(exclam)
    features["questions"] = float(quest)
    features["all_caps_words"] = float(caps)

    multi_exclam = intens = superl = 0
    for w in words:
        if w.count("!") > 1:
            multi_exclam += 1
        lw = w.lower()
        if lw in INTENSIFIER_WORDS:
            intens += 1
        if lw in SUPERLATIVE_WORDS:
            superl += 1
    features["multi_exclamations"] = float(multi_exclam)
    features["intensifiers"] = float(intens)
    features["superlatives"] = float(superl)

    full = " ".join(words)
    upper = full.upper()
    if "!!!" in upper:
        features["triple_exclamation"] = 1.0
    if "NEVER" in upper or "ALWAYS" in upper:
        features["absolute_language"] = 1.0
    lower = full.lower()
    if "can't believe" in lower or "cannot believe" in lower:
        features["disbelief_expression"] = 1.0

    if words:
        density = total / len(words)
        features["sentiment_density"] = density
        if density > 0.3:
            features["high_sentiment_density"] = 1.0

    return features


# -- rich feature extractor (sentiment_features.go) --------------------------

# per-language indicator lists (sentiment_features.go:658-1248)
_POSITIVE_IND = {
    "en": frozenset("good great excellent love best happy wonderful amazing"
                    " perfect beautiful fantastic awesome".split()),
    "es": frozenset("bueno excelente maravilloso fantástico mejor feliz"
                    " hermoso perfecto amor genial increíble estupendo".split()),
    "fr": frozenset("bon excellent merveilleux fantastique meilleur heureux"
                    " beau parfait amour génial incroyable magnifique".split()),
    "de": frozenset("gut ausgezeichnet wunderbar fantastisch besser"
                    " glücklich schön perfekt liebe großartig unglaublich"
                    " herrlich".split()),
    "ja": frozenset("良い いい 素晴らしい すごい 大好き 嬉しい 美しい 完璧 最高"
                    " 楽しい 優秀 立派".split()),
}
_NEGATIVE_IND = {
    "en": frozenset("bad terrible awful hate worst sad horrible disgusting"
                    " poor disappointing fail wrong".split()),
    "es": frozenset("malo terrible horrible odio peor triste feo"
                    " decepcionante pobre fallar mal disgusto".split()),
    "fr": frozenset("mauvais terrible horrible déteste pire triste laid"
                    " décevant pauvre échouer mal dégoûtant".split()),
    "de": frozenset("schlecht schrecklich furchtbar hasse schlechter traurig"
                    " hässlich enttäuschend arm versagen falsch ekelhaft".split()),
    "ja": frozenset("悪い ひどい 嫌い 悲しい つまらない 最悪 残念 怖い 嫌 失敗"
                    " 間違い 不快".split()),
}
_INTENSIFIERS = {
    "en": frozenset("very extremely absolutely totally really so quite"
                    " incredibly".split()),
    "es": frozenset("muy extremadamente absolutamente totalmente realmente"
                    " tan bastante increíblemente".split()),
    "fr": frozenset("très extrêmement absolument totalement vraiment si"
                    " assez incroyablement".split()),
    "de": frozenset("sehr extrem absolut total wirklich so ziemlich"
                    " unglaublich".split()),
    "ja": frozenset("とても すごく 非常に 本当に かなり めちゃくちゃ 超 完全に".split()),
}
_DIMINISHERS = {
    "en": frozenset("slightly somewhat rather fairly barely hardly scarcely"
                    " marginally".split()),
    "es": frozenset("ligeramente algo bastante apenas casi poco escasamente"
                    " marginalmente".split()),
    "fr": frozenset(["légèrement", "quelque peu", "plutôt", "assez",
                     "à peine", "presque", "peu", "marginalement"]),
    "de": frozenset("leicht etwas ziemlich kaum fast wenig knapp"
                    " marginal".split()),
    "ja": frozenset("少し ちょっと やや わずかに あまり そんなに それほど"
                    " たいして".split()),
}
_JOY = {
    "en": frozenset("happy joy cheerful delighted pleased glad joyful"
                    " elated".split()),
    "es": frozenset("feliz alegría alegre encantado contento gozoso jubiloso"
                    " eufórico".split()),
    "fr": frozenset("heureux joie joyeux ravi content gai réjoui"
                    " euphorique".split()),
    "de": frozenset("glücklich freude fröhlich erfreut zufrieden froh"
                    " freudig euphorisch".split()),
    "ja": frozenset("嬉しい 楽しい 喜び 幸せ 満足 興奮 陽気 明るい".split()),
}
_ANGER = {
    "en": frozenset("angry mad furious rage annoyed irritated frustrated"
                    " upset".split()),
    "es": frozenset("enojado furioso rabia ira molesto irritado frustrado"
                    " enfadado".split()),
    "fr": frozenset(["en colère", "furieux", "rage", "colère", "agacé",
                     "irrité", "frustré", "contrarié"]),
    "de": frozenset("wütend verrückt böse zorn verärgert gereizt frustriert"
                    " aufgebracht".split()),
    "ja": frozenset("怒り 腹立つ イライラ ムカつく 憤慨 激怒 不満 苛立ち".split()),
}
_FEAR = {
    "en": frozenset("afraid scared frightened terrified anxious nervous"
                    " worried panic".split()),
    "es": frozenset("miedo asustado aterrorizado ansioso nervioso preocupado"
                    " pánico temor".split()),
    "fr": frozenset("peur effrayé terrifié anxieux nerveux inquiet panique"
                    " crainte".split()),
    "de": frozenset("angst erschrocken verängstigt ängstlich nervös besorgt"
                    " panik furcht".split()),
    "ja": frozenset("怖い 恐怖 不安 心配 緊張 恐れ びくびく 驚く".split()),
}
_SADNESS = {
    "en": frozenset("sad depressed miserable gloomy unhappy sorrowful"
                    " melancholy dejected".split()),
    "es": frozenset("triste deprimido miserable sombrío infeliz doliente"
                    " melancólico abatido".split()),
    "fr": frozenset("triste déprimé misérable sombre malheureux affligé"
                    " mélancolique abattu".split()),
    "de": frozenset("traurig deprimiert elend düster unglücklich betrübt"
                    " melancholisch niedergeschlagen".split()),
    "ja": frozenset("悲しい 憂鬱 落ち込む 淋しい 寂しい 悲哀 失望 絶望".split()),
}
_SURPRISE = {
    "en": frozenset("surprised amazed astonished shocked stunned startled"
                    " unexpected sudden".split()),
    "es": frozenset("sorprendido asombrado atónito conmocionado aturdido"
                    " sobresaltado inesperado repentino".split()),
    "fr": frozenset("surpris étonné stupéfait choqué abasourdi sursauté"
                    " inattendu soudain".split()),
    "de": frozenset("überrascht erstaunt verblüfft schockiert betäubt"
                    " erschrocken unerwartet plötzlich".split()),
    "ja": frozenset("驚く びっくり 衝撃 意外 突然 予想外 まさか 驚き".split()),
}
_NEGATIONS = {
    "en": frozenset(["not", "no", "never", "neither", "nor", "cannot",
                     "can't", "won't", "don't", "doesn't", "didn't",
                     "isn't", "aren't", "wasn't", "weren't", "without"]),
    "es": frozenset("no nunca jamás ni sin nada nadie ningún ninguna"
                    " tampoco".split()),
    "fr": frozenset("ne pas non jamais rien personne aucun aucune ni"
                    " sans".split()),
    "de": frozenset("nicht nein kein keine niemals nie nichts niemand"
                    " nirgends ohne".split()),
    "ja": frozenset("ない いない ではない じゃない しない できない わからない だめ"
                    " いけない なし 決して 全然".split()),
}
_MODAL_VERBS = {
    "en": frozenset("can could may might must shall should will would"
                    " ought".split()),
    "es": frozenset("poder podría puede puedo deber debería debe querer"
                    " quisiera querría".split()),
    "fr": frozenset("pouvoir pourrait peut peux devoir devrait doit vouloir"
                    " voudrait veut".split()),
    "de": frozenset("können könnte kann mag müssen sollte soll wollen würde"
                    " will".split()),
    "ja": frozenset("できる かもしれない だろう でしょう はず べき たい 欲しい".split()),
}
_DISCOURSE = {
    "en": frozenset("however therefore moreover furthermore although"
                    " nevertheless consequently meanwhile indeed actually"
                    " basically obviously".split()),
    "es": frozenset(["sin embargo", "por lo tanto", "además", "asimismo",
                     "aunque", "no obstante", "consecuentemente",
                     "mientras tanto", "de hecho", "realmente",
                     "básicamente", "obviamente"]),
    "fr": frozenset(["cependant", "par conséquent", "de plus", "en outre",
                     "bien que", "néanmoins", "donc", "pendant ce temps",
                     "en effet", "actuellement", "fondamentalement",
                     "évidemment"]),
    "de": frozenset(["jedoch", "deshalb", "außerdem", "darüber hinaus",
                     "obwohl", "dennoch", "folglich", "inzwischen",
                     "tatsächlich", "eigentlich", "grundsätzlich",
                     "offensichtlich"]),
    "ja": frozenset("しかし だから それで また でも ところが つまり 実際".split()),
}
_SUBJECTIVE = {
    "en": frozenset("think believe feel seems appears maybe perhaps probably"
                    " possibly might could would".split()),
    "es": frozenset(["creo", "pienso", "siento", "parece", "aparece",
                     "quizás", "tal vez", "probablemente", "posiblemente",
                     "podría", "puede", "sería"]),
    "fr": frozenset("pense crois sens semble paraît peut-être probablement"
                    " possiblement pourrait peut serait semblerait".split()),
    "de": frozenset("denke glaube fühle scheint erscheint vielleicht"
                    " wahrscheinlich möglicherweise könnte kann würde"
                    " vermutlich".split()),
    "ja": frozenset("思う 考える 感じる ようだ みたい たぶん おそらく"
                    " かもしれない".split()),
}
_CONJUNCTIONS = frozenset("and or but because although while since unless if"
                          " when where whereas".split())


def _lang(d: dict, lang: str) -> frozenset:
    return d.get(lang, d["en"])


_LANG_JSON_KEYS = {"en": "english", "es": "spanish", "fr": "french",
                   "de": "german", "ja": "japanese"}


def load_external_feature_words(path: str, lang: str = "en") -> dict[str, set]:
    """External word lists for the rich feature extractor
    (newSentimentFeatureExtractorWithExternal / loadLanguageWords,
    sentiment_features.go:33-111): category -> lowercase word set, read
    from the EXTERNAL-LEXICON-GUIDE.md JSON schema. Pass the result as
    ``extract_rich_features(..., external=...)``."""
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    langs = data.get("languages") or {}
    sect = langs.get(_LANG_JSON_KEYS.get(lang, lang)) \
        or langs.get(lang) or {}
    out: dict[str, set] = {}
    for cat in ("positive", "negative", "intensifiers", "diminishers",
                "negations"):
        words = set()
        for e in sect.get(cat) or []:
            w = e.get("word") if isinstance(e, dict) else e
            if w:
                words.add(w.lower())
        out[cat] = words
    return out


def _is_word(text: str) -> bool:
    return any(c.isalpha() for c in text)


def _is_punct(text: str) -> bool:
    if not text:
        return False
    import unicodedata

    return all(unicodedata.category(c)[0] in ("P", "S") for c in text)


def _is_all_caps(text: str) -> bool:
    has_letter = False
    for c in text:
        if c.isalpha():
            has_letter = True
            if not c.isupper():
                return False
    return has_letter


def _is_elongated(text: str) -> bool:
    if len(text) < 3:
        return False
    count = 1
    for i in range(1, len(text)):
        if text[i] == text[i - 1]:
            count += 1
            if count >= 3:
                return True
        else:
            count = 1
    return False


def _contains_emoji(text: str) -> bool:
    for c in text:
        r = ord(c)
        if (0x1F600 <= r <= 0x1F64F or 0x1F300 <= r <= 0x1F5FF
                or 0x1F680 <= r <= 0x1F6FF or 0x2600 <= r <= 0x26FF
                or 0x2700 <= r <= 0x27BF):
            return True
    return False


def extract_rich_features(tokens: list[dict], lang: str = "en",
                          external: dict[str, set] | None = None,
                          ngram_size: int = 3) -> dict[str, float]:
    """Rich ML feature extraction over annotate()-style token dicts
    (text, tag) — sentiment_features.go:114-508. ``external`` optionally
    extends the positive/negative/intensifier/diminisher/negation lists
    (category -> word set, sentiment_features.go:72-111)."""
    ext = external or {}
    features: dict[str, float] = {}
    n = len(tokens)
    texts = [t["text"] for t in tokens]
    lowers = [s.lower() for s in texts]
    tags = [t.get("tag", "") or "" for t in tokens]

    # n-grams (:141-168)
    for lw in lowers:
        features["unigram:" + lw] = 1.0
    for i in range(n - 1):
        features["bigram:" + lowers[i] + "_" + lowers[i + 1]] = 1.0
    if ngram_size >= 3:
        for i in range(n - 2):
            features["trigram:" + lowers[i] + "_" + lowers[i + 1] + "_"
                     + lowers[i + 2]] = 1.0
    # char n-grams (:171-196); len() in Go is BYTE length — match via utf-8
    for lw in lowers:
        b = lw.encode("utf-8")
        if len(b) < 3 or not _is_word(lw):
            continue
        features["prefix2:" + b[:2].decode("utf-8", "surrogateescape")] = 1.0
        features["prefix3:" + b[:3].decode("utf-8", "surrogateescape")] = 1.0
        features["suffix2:" + b[-2:].decode("utf-8", "surrogateescape")] = 1.0
        features["suffix3:" + b[-3:].decode("utf-8", "surrogateescape")] = 1.0

    # POS patterns (:199-249)
    pos_counts: dict[str, int] = {}
    for tg in tags:
        if tg:
            pos_counts[tg] = pos_counts.get(tg, 0) + 1
    if n:
        for tg, c in pos_counts.items():
            features["pos_ratio:" + tg] = c / n
    for i in range(n - 1):
        if tags[i] and tags[i + 1]:
            features["pos_bigram:" + tags[i] + "_" + tags[i + 1]] = 1.0
        if tags[i].startswith("JJ") and tags[i + 1].startswith("NN"):
            features["adj_noun:" + lowers[i] + "_" + lowers[i + 1]] = 1.0
            features["has_adj_noun"] = 1.0
        if tags[i].startswith("VB") and tags[i + 1].startswith("RB"):
            features["verb_adv:" + lowers[i] + "_" + lowers[i + 1]] = 1.0
            features["has_verb_adv"] = 1.0
        if tags[i].startswith("RB") and tags[i + 1].startswith("JJ"):
            features["adv_adj:" + lowers[i] + "_" + lowers[i + 1]] = 1.0
            features["has_adv_adj"] = 1.0

    # lexical features (:252-318)
    exclam = quest = caps = elong = emoji = 0
    for s in texts:
        if s == "!":
            exclam += 1
        if s == "?":
            quest += 1
        if _is_all_caps(s) and len(s) > 1:
            caps += 1
        if _is_elongated(s):
            elong += 1
            features["has_elongated"] = 1.0
        if _contains_emoji(s):
            emoji += 1
    if n > 0:
        features["exclamation_ratio"] = exclam / n
        features["question_ratio"] = quest / n
        features["caps_ratio"] = caps / n
        features["elongated_ratio"] = elong / n
        features["emoji_ratio"] = emoji / n
    if exclam > 0:
        features["has_exclamation"] = 1.0
    if exclam > 2:
        features["multiple_exclamations"] = 1.0
    if quest > 0:
        features["has_question"] = 1.0
    if caps > 0:
        features["has_caps"] = 1.0
    if emoji > 0:
        features["has_emoji"] = 1.0
    features["token_count"] = float(n)
    features["token_count_log"] = math.log(n + 1)
    word_lens = [len(s.encode("utf-8")) for s in texts if _is_word(s)]
    features["avg_word_length"] = (
        sum(word_lens) / len(word_lens) if word_lens else 0.0
    )

    # syntactic features (:321-372)
    negation_set = _lang(_NEGATIONS, lang) | set(ext.get("negations", ()))
    modal_set = _lang(_MODAL_VERBS, lang)
    neg_c = comp_c = sup_c = modal_c = 0
    for lw, tg in zip(lowers, tags):
        if lw in negation_set:
            neg_c += 1
        if tg == "JJR":
            comp_c += 1
        if tg == "JJS":
            sup_c += 1
        if tg == "MD" or lw in modal_set:
            modal_c += 1
    features["negation_count"] = float(neg_c)
    features["comparative_count"] = float(comp_c)
    features["superlative_count"] = float(sup_c)
    features["modal_count"] = float(modal_c)
    if neg_c > 0:
        features["has_negation"] = 1.0
    if comp_c > 0:
        features["has_comparative"] = 1.0
    if sup_c > 0:
        features["has_superlative"] = 1.0
    if modal_c > 0:
        features["has_modal"] = 1.0
    # syntactic complexity (:615-656)
    if n:
        uniq = {lw for lw, s in zip(lowers, texts) if _is_word(s)}
        punct_c = sum(1 for s in texts if _is_punct(s))
        conj_c = sum(1 for lw in lowers if lw in _CONJUNCTIONS)
        complexity = (len(uniq) / n) * 0.5 + (punct_c / n) * 0.3 \
            + (conj_c / n) * 0.2
        features["syntactic_complexity"] = min(1.0, complexity)
    else:
        features["syntactic_complexity"] = 0.0

    # semantic features (:375-434)
    pos_set = _lang(_POSITIVE_IND, lang) | set(ext.get("positive", ()))
    neg_set = _lang(_NEGATIVE_IND, lang) | set(ext.get("negative", ()))
    int_set = _lang(_INTENSIFIERS, lang) | set(ext.get("intensifiers", ()))
    dim_set = _lang(_DIMINISHERS, lang) | set(ext.get("diminishers", ()))
    pw = nw = iw = dw = 0
    for lw in lowers:
        if lw in pos_set:
            pw += 1
        if lw in neg_set:
            nw += 1
        if lw in int_set:
            iw += 1
        if lw in dim_set:
            dw += 1
    if n > 0:
        features["pos_word_ratio"] = pw / n
        features["neg_word_ratio"] = nw / n
        features["intensifier_ratio"] = iw / n
        features["diminisher_ratio"] = dw / n
    if pw > 0:
        features["has_positive"] = 1.0
    if nw > 0:
        features["has_negative"] = 1.0
    if pw > 0 and nw > 0:
        features["has_mixed"] = 1.0
    if iw > 0:
        features["has_intensifier"] = 1.0
    if dw > 0:
        features["has_diminisher"] = 1.0

    # emotion categories (:437-464)
    for lw in lowers:
        if lw in _lang(_JOY, lang):
            features["has_joy_words"] = 1.0
        if lw in _lang(_ANGER, lang):
            features["has_anger_words"] = 1.0
        if lw in _lang(_FEAR, lang):
            features["has_fear_words"] = 1.0
        if lw in _lang(_SADNESS, lang):
            features["has_sadness_words"] = 1.0
        if lw in _lang(_SURPRISE, lang):
            features["has_surprise_words"] = 1.0

    # style features (:467-508)
    punct_counts: dict[str, int] = {}
    for s in texts:
        if _is_punct(s):
            punct_counts[s] = punct_counts.get(s, 0) + 1
    if n > 0:
        for p, c in punct_counts.items():
            features["punct_" + p + "_ratio"] = c / n
    disc = 0
    for lw in lowers:
        if lw in _lang(_DISCOURSE, lang):
            disc += 1
            features["has_discourse_marker"] = 1.0
    features["discourse_marker_count"] = float(disc)
    subj = 0
    for lw in lowers:
        if lw in _lang(_SUBJECTIVE, lang):
            subj += 1
            features["has_subjective"] = 1.0
    features["subjective_count"] = float(subj)

    return features


# -- Maxent classifier (sentiment.go:885-1009, extract.go:205-218) -----------

def fmt6(v: float) -> str:
    """Go's fmt.Sprintf("%%.6f", v) — the float-stringify quirk
    (model.go:743, sentiment.go:906)."""
    return f"{v:.6f}"


class MaxentSentiment:
    """Binary-indicator maximum-entropy sentiment classifier over
    stringified (name)-(value)-(label) keys."""

    def __init__(self, labels: list[str], mapping: dict[str, int],
                 weights: np.ndarray, cardinality: int):
        self.labels = list(labels)
        self.mapping = mapping
        self.weights = np.asarray(weights, dtype=np.float64)
        self.cardinality = cardinality

    # -- predict (sentiment.go:885-1009) ------------------------------------

    def predict(self, features: dict[str, float]) -> dict:
        string_feats = [(name, fmt6(val)) for name, val in features.items()]
        w = self.weights
        nw = len(w)
        mapping = self.mapping
        class_scores: dict[str, float] = {}
        max_score = -math.inf
        for label in self.labels:
            s = 0.0
            for name, val in string_feats:
                idx = mapping.get(f"{name}-{val}-{label}")
                if idx is not None and idx < nw:
                    s += w[idx]
            class_scores[label] = s
            if s > max_score:
                max_score = s
        probs: dict[str, float] = {}
        total = 0.0
        for label, s in class_scores.items():
            e = math.exp(s - max_score)  # stable softmax
            probs[label] = e
            total += e
        for label in probs:
            probs[label] /= total
        for cls in CLASSES:
            probs.setdefault(cls, 0.0)
        total = sum(probs.values())
        if total > 0:
            for cls in probs:
                probs[cls] /= total
        dominant, max_prob = "neutral", 0.0
        for cls in CLASSES:  # deterministic order (see module docstring)
            if probs[cls] > max_prob:
                max_prob = probs[cls]
                dominant = cls
        polarity = (probs["strong_positive"] * 1.0 + probs["positive"] * 0.5
                    - probs["strong_negative"] * 1.0 - probs["negative"] * 0.5)
        intensity = (probs["strong_positive"] + probs["strong_negative"]
                     + 0.5 * (probs["positive"] + probs["negative"]))
        return {
            "polarity": polarity,
            "intensity": intensity,
            "confidence": max_prob,
            "dominant": dominant,
            "scores": {c: probs[c] for c in CLASSES},
            "subjectivity": 1.0 - probs["neutral"],
        }

    def predict_label(self, features: dict[str, float]) -> str:
        """Argmax raw score — Trainer.predictSentiment
        (training.go:566-595)."""
        best, best_s = "", -math.inf
        string_feats = [(n, fmt6(v)) for n, v in features.items()]
        for label in self.labels:
            s = 0.0
            for name, val in string_feats:
                idx = self.mapping.get(f"{name}-{val}-{label}")
                if idx is not None and idx < len(self.weights):
                    s += self.weights[idx]
            if s > best_s:
                best_s = s
                best = label
        return best

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        w = [None if math.isinf(x) else x for x in self.weights.tolist()]
        blob = {
            "labels": self.labels,
            "mapping": self.mapping,
            "weights": w,
            "cardinality": self.cardinality,
        }
        with gzip.open(path, "wt", encoding="utf-8") as f:
            json.dump(blob, f)

    @classmethod
    def load(cls, path: str) -> "MaxentSentiment":
        with gzip.open(path, "rt", encoding="utf-8") as f:
            return cls._from_blob(json.load(f))

    @classmethod
    def load_bytes(cls, data: bytes) -> "MaxentSentiment":
        """Load from gzipped-JSON bytes (zip-safe artifact path)."""
        return cls._from_blob(json.loads(gzip.decompress(data)))

    @classmethod
    def _from_blob(cls, blob: dict) -> "MaxentSentiment":
        w = np.array(
            [-math.inf if x is None else x for x in blob["weights"]],
            dtype=np.float64,
        )
        return cls(blob["labels"], blob["mapping"], w, blob["cardinality"])


# -- GIS trainer (model.go:479-766) ------------------------------------------

def train_gis(corpus: list[tuple[dict[str, str], str]],
              max_iter: int = 100) -> MaxentSentiment:
    """Generalized Iterative Scaling over stringified features —
    vectorized re-derivation of model.go:543-713 (empirical counts
    :479-496, expected counts :499-540, encoding + cardinality
    :668-713). Matches the reference's update rule, unattested -inf
    weights, +1 pseudocounts, and the every-10-iterations convergence
    check (avg |delta| < 0.0005 after iter 30)."""
    labels: list[str] = []
    for _, lab in corpus:
        if lab not in labels:
            labels.append(lab)
    mapping: dict[str, int] = {}
    for feats, lab in corpus:
        for name, val in feats.items():
            key = f"{name}-{val}-{lab}"
            if key not in mapping:
                mapping[key] = len(mapping)
    for lab in labels:
        key = f"__BIAS__-1-{lab}"
        if key not in mapping:
            mapping[key] = len(mapping)
    # cardinality = max active features per example + 1 bias (model.go:698-705)
    cardinality = max((len(f) + 1 for f, _ in corpus), default=1)
    corpus = [({**f, "__BIAS__": "1"}, lab) for f, lab in corpus]

    n_rows = len(mapping) + 1  # +1: GIS correction slot (model.go:480)
    n_ex = len(corpus)
    n_lab = len(labels)

    # flat (example, feature-id) index arrays per label
    ex_label = np.array([labels.index(lab) for _, lab in corpus],
                        dtype=np.int64)
    flat_ids: list[np.ndarray] = []
    flat_ex: list[np.ndarray] = []
    emp = np.zeros(n_rows)
    for li, lab in enumerate(labels):
        ids_per_ex = [
            np.array(
                [mapping[k] for name, val in feats.items()
                 if (k := f"{name}-{val}-{lab}") in mapping],
                dtype=np.int64,
            )
            for feats, _ in corpus
        ]
        flat_ids.append(
            np.concatenate(ids_per_ex) if ids_per_ex else
            np.empty(0, dtype=np.int64)
        )
        flat_ex.append(
            np.repeat(np.arange(n_ex),
                      [len(a) for a in ids_per_ex]).astype(np.int64)
        )
        sel = ex_label[flat_ex[li]] == li  # empirical: own label only
        np.add.at(emp, flat_ids[li][sel], 1.0)

    unattested = emp == 0.0
    log_emp = np.where(emp > 0, np.log(np.maximum(emp, 1e-300)), emp)

    weights = np.zeros(n_rows)
    weights[unattested] = -math.inf
    c_inv = 1.0 / cardinality

    for it in range(max_iter):
        w_eff = np.where(np.isneginf(weights), 0.0, weights)
        # per-example, per-label scores
        scores = np.zeros((n_ex, n_lab))
        for li in range(n_lab):
            scores[:, li] = np.bincount(
                flat_ex[li], weights=w_eff[flat_ids[li]], minlength=n_ex
            )
        # exp without max-shift, as model.go:517 does
        ex = np.exp(scores)
        probs = ex / ex.sum(axis=1, keepdims=True)
        est = np.zeros(n_rows)
        for li in range(n_lab):
            np.add.at(est, flat_ids[li], probs[flat_ex[li], li])
        est[unattested] += 1.0
        log_est = np.where(est > 0, np.log(np.maximum(est, 1e-300)), est)
        delta = (log_emp - log_est) * c_inv
        finite = ~np.isneginf(weights)
        weights[finite] += delta[finite]
        if it > 0 and it % 10 == 0:
            avg_delta = np.abs(delta[finite]).sum() / n_rows
            if avg_delta < 0.0005 and it > 30:
                break

    return MaxentSentiment(labels, mapping, weights, cardinality)


def train_sentiment_model(
    data: list[tuple[str, str]], max_iter: int = 100
) -> MaxentSentiment | None:
    """(text, label) pairs -> trained Maxent model via SIMPLE features
    over PTB tokens — sentimentModelFromData (model.go:716-766) /
    UsingSentiment (model.go:48-52)."""
    if not data:
        return None
    from prose_spark.nlp.tokenizer import tokenize

    corpus = []
    for text, label in data:
        feats = extract_simple_features(tokenize(text))
        corpus.append(({k: fmt6(v) for k, v in feats.items()}, label))
    return train_gis(corpus, max_iter=max_iter)


def train_sentiment_classifier(
    data: list[tuple[str, str, str]] | list[tuple[str, str]],
    validation_split: float = 0.0,
    max_iter: int = 100,
) -> tuple[MaxentSentiment | None, dict]:
    """Trainer.TrainSentimentClassifier (training.go:431-480): rich
    features per example; optional tail-split validation. Deviation from
    the reference (documented in the module docstring): we GIS-fit the
    weights instead of returning the zero-weight `encode` output."""
    if not data:
        return None, {}
    rows = [(d[0], d[1], d[2] if len(d) > 2 else "en") for d in data]
    split = (
        int(len(rows) * (1.0 - validation_split))
        if validation_split > 0 else len(rows)
    )
    train_rows, valid_rows = rows[:split], rows[split:]

    from prose_spark.operators.annotate import AnnotateConfig, annotate_document

    cfg = AnnotateConfig(segment=True, tag=True, extract=False)

    def rich_corpus_entry(text, lang):
        _, tokens, _ = annotate_document(text, cfg)
        feats = extract_rich_features(tokens, lang)
        return {k: fmt6(v) for k, v in feats.items()}

    corpus = [
        (rich_corpus_entry(t, lg), lab) for t, lab, lg in train_rows
    ]
    model = train_gis(corpus, max_iter=max_iter)

    metrics = {"epochs": 1, "converged": True, "accuracy": 1.0}
    if valid_rows:
        correct = sum(
            model.predict_label(
                extract_rich_features(
                    annotate_document(t, cfg)[1], lg
                )
            ) == lab
            for t, lab, lg in valid_rows
        )
        metrics["accuracy"] = correct / len(valid_rows)
    return model, metrics


# -- score combination (sentiment.go:798-868) --------------------------------

def combine_scores(score1: dict | None, score2: dict | None,
                   weight2: float) -> dict:
    """Weighted merge of two sentiment score dicts; an empty side
    (confidence 0 or no class scores) passes the other through."""
    from prose_spark.nlp.sentiment import _classify_polarity

    if not score1 or score1.get("confidence", 0) == 0 \
            or not score1.get("scores"):
        return score2
    if not score2 or score2.get("confidence", 0) == 0 \
            or not score2.get("scores"):
        return score1
    w1 = 1.0 - weight2
    combined = {
        "polarity": score1["polarity"] * w1 + score2["polarity"] * weight2,
        "intensity": score1["intensity"] * w1 + score2["intensity"] * weight2,
        "confidence": score1["confidence"] * w1
        + score2["confidence"] * weight2,
        "subjectivity": score1.get("subjectivity", 0.0) * w1
        + score2.get("subjectivity", 0.0) * weight2,
    }
    combined["dominant"] = _classify_polarity(
        combined["polarity"], combined["intensity"]
    )
    all_classes = set(score1["scores"]) | set(score2["scores"])
    scores = {
        c: score1["scores"].get(c, 0.0) * w1
        + score2["scores"].get(c, 0.0) * weight2
        for c in all_classes
    }
    total = sum(scores.values())
    if total > 0:
        scores = {c: p / total for c, p in scores.items()}
        max_prob = 0.0
        for c in CLASSES:  # deterministic order
            if c in scores and scores[c] > max_prob:
                max_prob = scores[c]
                combined["dominant"] = c
    combined["scores"] = scores
    return combined


def predict_sentence_score(model: MaxentSentiment,
                           token_texts: list[str]) -> dict:
    """ML score for one sentence — replicates the reference's
    prediction-time feature path (sentiment.go:300-324): token texts are
    re-joined with spaces and WHITESPACE-split (not PTB-tokenized), then
    fed to the simple feature extractor."""
    words = " ".join(token_texts).split()
    return model.predict(extract_simple_features(words))
